package dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded buffer for the min-N-per-key aggregator: ascending ids,
  * `used ≤ capacity`. */
case class MinNBuf(ids: Array[Long], used: Int)

/** Corpus sampling operators. The load-bearing one is the per-domain
  * document cap — Common-Crawl-style corpora are dominated by a few hosts
  * (forums, e-commerce templates), and the standard webtext remedy is
  * "keep at most N pages per registrable domain" before training.
  *
  * Scale shape: the naive `row_number() OVER (PARTITION BY domain)` puts a
  * hot domain's 10^8 rows into ONE window task. Instead a bounded typed
  * Aggregator keeps only the N smallest ids per key, so partial (map-side)
  * aggregation ships ≤N ids per domain per task — the same defense as
  * Ann's TopKAgg (Ann.scala) and the salted star edges: per-task cost is
  * O(N), never O(domain size).
  */
object Sampling {

  /** Keeps the n smallest longs seen, ascending, in-place. Deterministic:
    * min-by-id is order- and partition-layout-independent. */
  private class MinNAgg(n: Int) extends Aggregator[Long, MinNBuf, Seq[Long]] {
    def zero: MinNBuf = MinNBuf(new Array[Long](n), 0)
    private def insert(buf: MinNBuf, id: Long): MinNBuf = {
      val n0 = buf.used
      val ids = buf.ids
      if (n0 >= n && id >= ids(n0 - 1)) buf
      else {
        var lo = 0
        var hi = n0
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (id < ids(mid)) hi = mid else lo = mid + 1
        }
        val newN = math.min(n0 + 1, n)
        val shift = newN - 1 - lo
        if (shift > 0) System.arraycopy(ids, lo, ids, lo + 1, shift)
        ids(lo) = id
        if (newN == n0) buf else MinNBuf(ids, newN)
      }
    }
    def reduce(buf: MinNBuf, id: Long): MinNBuf = insert(buf, id)
    def merge(a: MinNBuf, b: MinNBuf): MinNBuf = {
      var r = a
      var i = 0
      while (i < b.used) { r = insert(r, b.ids(i)); i += 1 }
      r
    }
    def finish(buf: MinNBuf): Seq[Long] = (0 until buf.used).map(buf.ids(_))
    def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MinNBuf]()
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** `(key, id)` rows keeping at most `n` per key — the n smallest ids
    * (deterministic representative rule, like every min-id choice in this
    * engine). Null keys are dropped. One shuffle, ≤n rows per key per map
    * task after partial aggregation. */
  def capPerKey(df: DataFrame, keyCol: Column, idCol: Column, n: Int): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    val agg = udaf(new MinNAgg(n))
    df.select(keyCol.as("key"), idCol.cast("long").as("id"))
      .where(col("key").isNotNull)
      .groupBy(col("key"))
      .agg(agg(col("id")).as("kept"))
      .select(col("key"), explode(col("kept")).as("id"))
  }

  /** Keep at most `maxPerDomain` pages per registrable domain (min-id
    * rule); full payload passes through via a semi-join on the id. */
  def domainCap(pages: DataFrame, urlCol: String, idCol: String,
      maxPerDomain: Int): DataFrame = {
    val keptIds = capPerKey(pages, UrlOps.domain(col(urlCol)), col(idCol), maxPerDomain)
      .select(col("id").as(idCol))
    pages.join(keptIds, Seq(idCol), "left_semi")
  }

  /** Re-crawl resolution: one row per key — the row with the maximum
    * `order` value (e.g. keep the NEWEST crawl of each url: key = url,
    * order = struct(warc_ts, md5(text)) — callers must make `order` total
    * per key or ties pick an arbitrary survivor). One narrow shuffle with
    * map-side partial `max_by`: a url crawled 10⁶ times reaches its
    * reducer as one pre-combined row per map task — never a hot-key window
    * partition (the same defense as capPerKey). */
  def latestPerKey(df: DataFrame, key: Column, order: Column): DataFrame = {
    val cols = df.columns
    df.groupBy(key.as("__k"))
      .agg(max_by(struct(cols.map(col): _*), order).as("__r"))
      .select(cols.map(c => col(s"__r.$c")): _*)
  }

  // ------------------------------------------- deterministic hash sampling
  /** Uniform hash of a stable text key onto [0, 2^32): the first 8 hex
    * chars of md5 — chosen over xxhash64 because every SQL engine can
    * recompute it (the DuckDB oracle does), so a sampling decision is
    * auditable outside Spark. Null key → null (dropped by hashSample). */
  def hashUnit(keyText: Column): Column =
    conv(substring(md5(keyText), 1, 8), 16, 10).cast("long")

  /** Deterministic Bernoulli sample: keep a row iff
    * hashUnit(keyText) < floor(rate · 2^32). Zero shuffle, zero RNG state —
    * the decision is a pure projection of the row, so it is reproducible
    * across reruns, partition layouts and engines, and DOWNSAMPLING IS
    * MONOTONE: the rows kept at rate r' < r are a subset of those kept at
    * r (the property ad-hoc `rand()` sampling lacks; reruns of rand()
    * resample everything). `rate` may be a per-row column (per-language /
    * per-source rates via element_at on a map literal, or any expression);
    * rows with null rate or null key are dropped. */
  def hashSample(df: DataFrame, keyText: Column, rate: Column): DataFrame =
    df.where(hashUnit(keyText) < (rate * lit(4294967296.0)).cast("long"))

  /** Per-key keep-rates for temperature resampling (the multilingual
    * rebalance of mC4/XLM-R: sampling probability ∝ (n_k/N)^alpha with
    * alpha < 1 upweighting rare keys). Rates are water-filled so the
    * expected kept total is `targetFraction · N` even when some keys
    * saturate at rate 1: r_k = min(1, c · n_k^(alpha-1)), c found by
    * bisection on the monotone total. alpha = 1 degenerates to uniform
    * targetFraction for every key. Driver-side math over O(#keys) counts —
    * pair with [[hashSample]] via a map-literal rate column. */
  def temperatureRates(
      counts: Map[String, Long],
      alpha: Double,
      targetFraction: Double): Map[String, Double] = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction in (0,1], got $targetFraction")
    val n = counts.values.map(_.toDouble).sum
    if (n == 0) return counts.map { case (k, _) => k -> 0.0 }
    val target = targetFraction * n
    def kept(c: Double): Double =
      counts.values.map(v => math.min(1.0, c * math.pow(v.toDouble, alpha - 1)) * v).sum
    var lo = 0.0
    var hi = 1.0
    while (kept(hi) < target && hi < 1e18) hi *= 2 // all rates saturate → 1.0
    var i = 0
    while (i < 200) { val mid = (lo + hi) / 2; if (kept(mid) < target) lo = mid else hi = mid; i += 1 }
    counts.map { case (k, v) =>
      k -> math.min(1.0, hi * math.pow(v.toDouble, alpha - 1))
    }
  }

  /** Token-budget MIXTURE rates (the Pile/Dolma "data mixing" knob):
    * given per-source token counts `tokens`, target mixing weights
    * `weightsPpm` (parts-per-million; need not sum to 10⁶ — only ratios
    * matter), and a total `tokenBudget`, return per-source keep-rates in
    * INTEGER ppm such that expected sampled tokens land on the budget
    * split by the weights. Water-filled: a source too small for its
    * weight share saturates at rate 10⁶ (keep everything) and its unmet
    * share redistributes over the rest by renormalized weights —
    * iterated to fixpoint (≤ #sources rounds).
    *
    * All arithmetic is EXACT integer math (BigInt internally, one
    * canonical division per source:
    * `r = (B·w·10⁶) div (ΣW·T)`), so the same formula replayed in SQL —
    * the DuckDB oracle does — reproduces the rates bit-for-bit; no
    * float-boundary docs. Driver-side over O(#sources) counts; pair with
    * [[hashUnit]]: keep iff hashUnit·10⁶ < ppm·2³². Empty sources rate
    * 10⁶ (vacuously keep all of nothing). */
  def mixtureRatesPpm(tokens: Map[String, Long], weightsPpm: Map[String, Long],
                      tokenBudget: Long): Map[String, Long] = {
    require(tokens.keySet == weightsPpm.keySet, "tokens/weights key mismatch")
    require(weightsPpm.values.forall(_ >= 0) && tokens.values.forall(_ >= 0),
      "weights and token counts must be non-negative")
    val keys = tokens.keySet
    val M = BigInt(1000000)
    // zero-token sources are saturated from the start: they can't supply
    // their share, so their weight must not dilute the redistribution
    var sat = keys.filter(s => tokens(s) == 0L)
    var rates = Map.empty[String, Long]
    var changed = true
    while (changed) {
      changed = false
      val b2 = BigInt(tokenBudget) - sat.iterator.map(s => BigInt(tokens(s))).sum
      val w2 = (keys -- sat).iterator.map(s => BigInt(weightsPpm(s))).sum
      rates = keys.iterator.map { s =>
        if (sat(s) || tokens(s) == 0L) s -> 1000000L
        else if (b2 <= 0 || w2 <= 0) s -> 0L
        else {
          val r = (b2 * weightsPpm(s) * M) / (w2 * tokens(s))
          s -> r.min(M).toLong
        }
      }.toMap
      val newSat = keys.filter { s =>
        !sat(s) && tokens(s) > 0L && rates(s) >= 1000000L
      }
      if (newSat.nonEmpty) { sat ++= newSat; changed = true }
    }
    rates
  }
}
