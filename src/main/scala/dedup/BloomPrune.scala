package dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.dedupbridge.{columnExpr, exprColumn}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning: shrink the big side of an equi-join to the
  * rows whose key MIGHT appear on the small side, before any shuffle.
  *
  * This is the semi-join-reduction Spark itself injects as "runtime row
  * level filtering" (`spark.sql.optimizer.runtime.bloomFilter.enabled`),
  * made explicit and composable: Spark's injected variant fires only on
  * selective-filter shuffle joins it can prove beneficial, and never
  * across separately-planned jobs (our incremental index is built in one
  * job, probed in another). The probe reuses Spark's own
  * [[BloomFilterMightContain]] expression, so the filter runs inside
  * WholeStageCodegen directly on top of the scan — corpus rows in
  * non-matching buckets die map-side and never reach the join exchange.
  *
  * Exactness: a Bloom filter has false positives but NO false negatives,
  * so the pruned big side is a SUPERSET of the rows that can match; the
  * exact equi-join downstream removes the false positives. End-to-end
  * results are bit-identical with pruning on or off (BloomPruneSpec pins
  * this; the oracle-backed q_cross_pairs / q_incremental_fuzzy driver rows
  * run with pruning ON).
  *
  * Size regime (why this wins at 100 TB): for incremental fuzzy dedup the
  * small side is the BATCH's band keys — b bands × |batch| rows. At a
  * 10-M-doc batch and fpp 0.01 that is a ~300 MB filter embedded once per
  * stage, pruning a 10^12-row corpus band index down to ~|true bucket
  * collisions| + fpp·|corpus| rows before the exchange. At 10^9+ batch
  * docs raise fpp (each 10× fpp saves ~2.1 bits/key) or shard the probe by
  * key range; below ~10 MB the filter is cheaper than the Exchange it
  * replaces by orders of magnitude.
  */
object BloomPrune {

  /** Build a Bloom filter over the long values of `key` in one scan —
    * `treeAggregate`, map-side partial filters merged up a tree, no
    * shuffle (same build shape as `IncrementalDedup.buildBloom`). Null
    * keys are skipped (a null join key matches nothing in an equi-join).
    * `expectedItems < 0` counts first; pass a known size to skip. */
  def buildLong(df: DataFrame, key: Column,
      expectedItems: Long = -1L, fpp: Double = 0.01): BloomFilter = {
    import df.sparkSession.implicits._
    val keys = df.select(key.cast("long").as("k")).where(col("k").isNotNull).as[Long]
    val n = if (expectedItems >= 0) expectedItems else keys.count()
    keys.rdd.treeAggregate(BloomFilter.create(math.max(n, 1L), fpp))(
      (f, v) => { f.putLong(v); f },
      (a, b) => { a.mergeInPlace(b); a })
  }

  /** Codegen'd membership probe: Spark's own runtime-filter expression
    * over the serialized filter as a foldable binary literal — the exact
    * shape the optimizer's injected bloom probe takes after its subquery
    * executes. Plan-embedded (shipped once per stage, not per row); for
    * filters beyond broadcast-literal comfort (~GB) use a key-range shard
    * per probe instead. */
  def mightContainLong(bf: BloomFilter, key: Column): Column = {
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out)
      out.toByteArray
    }
    exprColumn(BloomFilterMightContain(
      Literal(bytes, BinaryType), columnExpr(key.cast("long"))))
  }

  /** `big` reduced to rows whose `bigKey` might appear among `smallKey`
    * values of `small` — a map-side superset prune that preserves exact
    * equi-join results downstream. */
  def prune(big: DataFrame, bigKey: Column, small: DataFrame, smallKey: Column,
      expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    val bf = buildLong(small, smallKey, expectedItems, fpp)
    big.where(mightContainLong(bf, bigKey))
  }
}
