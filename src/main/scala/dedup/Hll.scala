package dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog approx-distinct for corpus-scale cardinality metrics
  * ("how many distinct tokens / shingles / urls in 10¹² docs") — the one
  * audit where exact `count(distinct)` is the wrong plan at scale: it
  * shuffles every distinct value, while an HLL sketch is 512 integers.
  *
  * Design goals over `approx_count_distinct` (which would also work, and
  * remains the built-in alternative):
  *   1. DETERMINISTIC + ENGINE-PORTABLE: the hash is md5 (the repo's
  *      auditable-sampling discipline, Sampling.hashUnit) and the
  *      register math is integer-only (`length(bin(w))` for the leading-
  *      zero rank — no floats anywhere in the sketch), so any SQL engine
  *      recomputes the EXACT register table; the driver oracle gates it.
  *   2. MERGEABLE: registers merge by max — per-shard sketches union
  *      without re-reading data (the cross-month corpus-growth audit).
  *
  * Estimation (the only floating-point step) is driver-side over the 512
  * integers: standard HLL alpha·m²/Σ2^(−M_j) with linear counting below
  * 2.5m (Flajolet et al. 2007, "HyperLogLog: the analysis of a
  * near-optimal cardinality estimation algorithm"). Standard error
  * 1.04/√512 ≈ 4.6%.
  *
  * Hash layout: h = first 15 hex chars of md5 (60 bits — fits a signed
  * long in both engines); bucket = top P bits, w = low 51 bits, rank
  * ρ = leading zeros of w within 51 bits, plus 1 (1..52).
  */
object Hll {

  val P = 9 // 2^9 = 512 registers
  val M: Int = 1 << P
  private val WBits = 60 - P // 51

  /** 60-bit md5-derived hash as a Catalyst column (engine-portable: the
    * DuckDB oracle computes the identical value). */
  def hash60(value: Column): Column =
    conv(substring(md5(value), 1, 15), 16, 10).cast("long")

  /** The sketch as a DataFrame: (bucket, max_rho), one row per OCCUPIED
    * register (absent bucket = register 0). One partial-aggregating
    * groupBy on a ≤512-value key — map-side combine collapses any input
    * volume to ≤512 rows per task; no distinct, no wide shuffle (HLL
    * register max is idempotent, duplicates are free). */
  def registers(df: DataFrame, value: Column): DataFrame = {
    val h = hash60(value)
    val bucket = shiftright(h, WBits)
    val w = h.bitwiseAND((1L << WBits) - 1L)
    val rho = when(w === 0L, lit(WBits + 1))
      .otherwise(lit(WBits + 1) - length(bin(w)))
    df.select(bucket.as("bucket"), rho.cast("long").as("rho"))
      .where(col("bucket").isNotNull) // null values carry no information
      .groupBy(col("bucket"))
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Merge two register tables (sketch union): per-bucket max. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("bucket"))
      .agg(max(col("max_rho")).as("max_rho"))

  /** Cardinality estimate from a collected register table — driver-side
    * float math over ≤512 integers (the sketch itself stays exact). */
  def estimate(regs: Map[Long, Long]): Double = {
    val alpha = 0.7213 / (1.0 + 1.079 / M) // alpha_m for m >= 128
    var z = 0.0
    var zeros = 0
    var j = 0
    while (j < M) {
      val r = regs.getOrElse(j.toLong, 0L)
      z += math.pow(2.0, -r.toDouble)
      if (r == 0L) zeros += 1
      j += 1
    }
    val raw = alpha * M.toDouble * M.toDouble / z
    if (raw <= 2.5 * M && zeros > 0) M.toDouble * math.log(M.toDouble / zeros)
    else raw
  }

  /** Convenience: estimate straight from a DataFrame column. */
  def approxDistinct(df: DataFrame, value: Column): Double =
    estimate(registers(df, value).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap)
}
