package dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-budget shard assignment — the step after dedup in a training-data
  * pipeline: pack the kept documents, in a deterministic global order, into
  * numbered shards of ~`budget` tokens each so that downstream training
  * readers get fixed-size, reproducible inputs.
  *
  * Semantics (exactly SQL-replicable, which is what the DuckDB oracle
  * checks): order rows by ascending id; `shard(row) = exclusivePrefixSum
  * (weight) / budget` (integer division). A document straddling a budget
  * boundary stays whole in the shard where it starts — shards overshoot by
  * at most one document, never split one.
  *
  * Scale shape: the naive formulation is `sum(weight) OVER (ORDER BY id)` —
  * a single-partition window, the same anti-pattern `Ids.orderedIds` avoids
  * (one task sorts 10¹² rows). This is the identical two-pass fix: range
  * partition by id, per-partition weight sums (O(partitions) rows to the
  * driver — metadata, not data), broadcast exclusive offsets, then one
  * mapPartitions pass carries the running sum. Two narrow shuffles
  * (range exchange + the tiny count agg), no window, no skew (range
  * partitioning balances by id distribution).
  *
  * The reference has no sharding stage (its chunked sink,
  * fuzzy_spark2.py:302-332, balances ROW counts per file); token-budget
  * packing is what its users script around the output.
  */
object Shards {

  /** (idCol, weight, shard) for every input row. `weight` must be
    * non-negative; null weights count as 0 (the row still occupies a slot
    * in its shard). Deterministic across partition layouts, parallelism,
    * and reruns — assignment depends only on (id, weight) pairs. */
  def assignByBudget(
      df: DataFrame,
      idCol: String,
      weight: Column,
      budget: Long,
      partitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val p = math.max(1,
      if (partitions > 0) partitions else spark.sparkContext.defaultParallelism)
    // localCheckpoint pins the range boundaries: the RangePartitioner's
    // sampled split points must be the SAME for the per-partition sum pass
    // and the emit pass, or the broadcast offsets line up with the wrong
    // partitions (same reasoning as Ids.orderedIds).
    val sorted = df
      .select(col(idCol).cast("long").as("k"),
        coalesce(weight.cast("long"), lit(0L)).as("w"))
      .repartitionByRange(p, col("k"))
      .sortWithinPartitions(col("k"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val sums = sorted.groupBy(col("pid")).agg(sum(col("w")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = new Array[Long](sums.map(_._1).maxOption.getOrElse(-1) + 2)
    var acc = 0L
    sums.foreach { case (pid, s) => offsets(pid) = acc; acc += s }
    val bc = spark.sparkContext.broadcast(offsets)
    val b = budget
    sorted.select(col("k"), col("w"), col("pid")).as[(Long, Long, Int)]
      .mapPartitions { it =>
        var running = -1L // initialized from the first row's pid
        it.map { case (k, w, pid) =>
          if (running < 0L) running = bc.value(pid)
          val shard = running / b
          running += w
          (k, w, shard)
        }
      }
      .toDF(idCol, "weight", "shard")
  }

  /** Per-shard packing report: document count and total weight. */
  def shardStats(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("weight")).as("sum_weight"))

  /** Quality-STRATIFIED shard assignment: rank documents by
    * (quality desc, id asc) and deal them round-robin — `shard = rank %
    * nShards` — so every shard receives an (almost) equal count AND the
    * same quality mix (head, middle and tail of the distribution in equal
    * measure). This is the training-order prep that prevents per-shard
    * quality drift: a reader consuming shards in any order sees a
    * stationary quality distribution ([[assignByBudget]] balances token
    * BUDGETS; this balances the quality marginal).
    *
    * Scale shape: the naive `row_number() OVER (ORDER BY quality)` is a
    * single-partition window; this is the same two-pass fix as
    * [[Ids.orderedIds]] — range partition by (quality desc, id),
    * per-partition counts (O(partitions) driver rows), broadcast
    * exclusive offsets, one mapPartitions rank pass. Deterministic for
    * any partition layout; exactly SQL-replayable
    * (row_number − 1 mod nShards). Output: (id, qrank, shard). */
  def stratifiedShards(
      df: DataFrame,
      idCol: String,
      quality: Column,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val spark = df.sparkSession
    import spark.implicits._
    val p = math.max(1, spark.sparkContext.defaultParallelism)
    // localCheckpoint pins the range boundaries (same reason as
    // Ids.orderedIds: a re-planned exchange would re-sample them)
    val sorted = df
      .select(col(idCol).cast("long").as("id"), quality.cast("long").as("q"))
      .repartitionByRange(p, col("q").desc, col("id"))
      .sortWithinPartitions(col("q").desc, col("id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val counts = sorted.groupBy(col("pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = new Array[Long](counts.map(_._1).maxOption.getOrElse(-1) + 2)
    var acc = 0L
    counts.foreach { case (pid, n) => offsets(pid) = acc; acc += n }
    val bc = spark.sparkContext.broadcast(offsets)
    val n = nShards.toLong
    sorted.select(col("id"), col("pid")).as[(Long, Int)]
      .mapPartitions { it =>
        var i = 0L
        it.map { case (id, pid) =>
          val r = bc.value(pid) + i
          i += 1
          (id, r, r % n)
        }
      }
      .toDF(idCol, "qrank", "shard")
  }

  /** Fixed-window training chunks: split each document's whitespace
    * tokens into windows of `window` tokens advancing by
    * `window − overlap` (the standard context-length prep — long pages
    * become several training rows, the overlap preserving cross-boundary
    * context). The LAST window keeps whatever remains (≥1 token; a
    * final window fully contained in the previous one is not emitted).
    * Pure Catalyst — sequence + transform + posexplode, zero shuffle,
    * whole-stage codegen — and exactly replayable in SQL (the oracle
    * rebuilds every chunk string by slicing the same token list).
    * Output: (id, chunk_idx, n_chunk_tokens, chunk). Empty/null docs
    * yield no rows. */
  def chunkDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      overlap: Int = 0): DataFrame = {
    require(window > 0 && overlap >= 0 && overlap < window,
      "need window > 0 and 0 <= overlap < window")
    val stride = window - overlap
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= lit(""))
    val n = size(toks)
    // chunk starts: 0, stride, 2·stride, … while start < n and the
    // window still adds at least one NEW token (start + overlap < n —
    // equivalently the previous window did not already reach the end)
    val nChunks = when(n <= 0, lit(0))
      .otherwise(greatest(lit(1), ceil((n - lit(overlap)).cast("double") / stride).cast("int")))
    docs
      .select(col(idCol).as("id"), toks.as("__toks"), nChunks.as("__nc"))
      .where(col("__nc") > 0)
      .select(col("id"), posexplode(transform(
        sequence(lit(0), col("__nc") - 1),
        i => slice(col("__toks"), i * stride + 1, lit(window)))))
      .select(col("id"), col("pos").as("chunk_idx"),
        size(col("col")).cast("long").as("n_chunk_tokens"),
        array_join(col("col"), " ").as("chunk"))
  }
}
