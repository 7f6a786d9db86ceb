package dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weakly-supervised bag-of-words document classifier — the
  * "fasttext-style model-based filter" of webtext pipelines (CCNet trains
  * an LM on Wikipedia to rank crawl docs; GPT-3/LLaMA train a linear
  * classifier with in-domain pages as positives and raw Common Crawl as
  * negatives, then keep docs the model scores in-domain). This is the
  * sandbox-honest equivalent: a multinomial Naive Bayes over whitespace
  * tokens, trained distributed on any boolean teacher column (a quality
  * gate, a language flag, a curated-domain flag), scored as one
  * zero-shuffle broadcast scan.
  *
  * Everything is INTEGER fixed-point so the driver's DuckDB oracle can
  * replay training AND scoring bit-exactly (same trick as
  * [[TextAnalysis.bm25TopK]]): the per-token log-likelihood ratio
  * ln((c⁺+1)/(T⁺+V)) − ln((c⁻+1)/(T⁻+V)) is approximated in whole bits as
  *
  *   w(t) = bitLen(max(1, (min(c⁺(t)+1, 2²²) · 2⁴⁰) / (T⁺+V)))
  *        − bitLen(max(1, (min(c⁻(t)+1, 2²²) · 2⁴⁰) / (T⁻+V)))
  *
  * with bitLen(x) = 64 − numberOfLeadingZeros(x) = DuckDB
  * `length(bin(x))`. The 2²² count clamp keeps the product inside a
  * signed 64-bit long for any corpus size (beyond ~4M occurrences a
  * token's evidence saturates — at that point its ratio estimate has long
  * converged); the max(1, …) guard keeps bitLen's domain positive when
  * T+V outgrows the 2⁴⁰ scale (weights then degrade toward 0 together,
  * never diverge between engine and oracle). Out-of-vocabulary tokens get
  * the same formula with c=0.
  *
  * Scale shape: training is ONE partial-agg shuffle of (token → two
  * counts) with per-partition HashMap pre-combine, top-`vocabK` rows
  * collected (bounded by construction); scoring is a zero-shuffle
  * mapPartitions scan probing two broadcast sorted arrays — the exact
  * [[TextAnalysis.rareTokenStats]] template, so it holds at 100 TB as
  * long as vocabK · 16 bytes broadcasts (default 2²⁰ ≈ 16 MB).
  */
object NbClassifier {

  /** Trained model: vocab token hashes (sorted, for binary search),
    * per-token bit-weights aligned to `hashes`, and the OOV bit-weight. */
  final case class NbModel(hashes: Array[Long], weights: Array[Long], oov: Long)

  private val Scale = 1L << 40
  private val CountClamp = 1L << 22

  private[dedup] def bitLen(x: Long): Long =
    64L - java.lang.Long.numberOfLeadingZeros(x)

  private[dedup] def tokenWeight(cPos: Long, cNeg: Long, tpv: Long, tnv: Long): Long =
    bitLen(math.max(1L, math.min(cPos + 1L, CountClamp) * Scale / tpv)) -
      bitLen(math.max(1L, math.min(cNeg + 1L, CountClamp) * Scale / tnv))

  /** Train on `docs` with a boolean teacher column. One narrow shuffle:
    * per-partition (token → (pos, neg)) HashMap pre-combine, global sum,
    * top-`vocabK` by total count (count desc, token asc — the
    * deterministic tie-break every top-K in this repo uses). */
  def train(docs: DataFrame, textCol: String, labelCol: String,
      vocabK: Int = 1 << 20): NbModel = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select(col(textCol).cast("string"), col(labelCol).cast("boolean"))
      .as[(String, Boolean)]
      .mapPartitions { it =>
        val h = new java.util.HashMap[String, Array[Long]]()
        it.foreach { case (t, pos) =>
          if (t != null) {
            val ts = t.split("\\s+")
            var i = 0
            while (i < ts.length) {
              if (ts(i).nonEmpty) {
                val a = h.computeIfAbsent(ts(i), _ => new Array[Long](2))
                if (pos) a(0) += 1L else a(1) += 1L
              }
              i += 1
            }
          }
        }
        scala.jdk.CollectionConverters.MapHasAsScala(h).asScala.iterator
          .map { case (t, a) => (t, a(0), a(1)) }
      }
      .toDF("t", "cp", "cn")
      .groupBy(col("t"))
      .agg(sum(col("cp")).as("cp"), sum(col("cn")).as("cn"))
    val top = counts
      .orderBy((col("cp") + col("cn")).desc, col("t").asc)
      .limit(vocabK)
      .as[(String, Long, Long)]
      .collect()
    val v = top.length.toLong
    val tpv = top.iterator.map(_._2).sum + v
    val tnv = top.iterator.map(_._3).sum + v
    val entries = top.map { case (t, cp, cn) =>
      (Hashes.xxh64Str(t), tokenWeight(cp, cn, tpv, tnv))
    }.sortBy(_._1)
    NbModel(entries.map(_._1), entries.map(_._2),
      tokenWeight(0L, 0L, tpv, tnv))
  }

  /** (n_tokens, score_bits) of one doc against the broadcast arrays. */
  private def docScore(t: String, hs: Array[Long], ws: Array[Long],
      oov: Long): (Long, Long) = {
    var nTok = 0L
    var s = 0L
    if (t != null) {
      val ts = t.split("\\s+")
      var i = 0
      while (i < ts.length) {
        if (ts(i).nonEmpty) {
          nTok += 1
          val j = java.util.Arrays.binarySearch(hs, Hashes.xxh64Str(ts(i)))
          s += (if (j >= 0) ws(j) else oov)
        }
        i += 1
      }
    }
    (nTok, s)
  }

  /** Score every doc: `n_tokens`, `score_bits` (Σ per-occurrence
    * bit-weights — positive means "looks like the positive class"), and
    * `pred` (= score_bits > 0). Zero-shuffle broadcast probe. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: NbModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bcH = spark.sparkContext.broadcast(model.hashes)
    val bcW = spark.sparkContext.broadcast(model.weights)
    val oov = model.oov
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val hs = bcH.value
        val ws = bcW.value
        it.map { case (id, t) =>
          val (nTok, s) = docScore(t, hs, ws, oov)
          (id, nTok, s, s > 0L)
        }
      }
      .toDF(idCol, "n_tokens", "score_bits", "pred")
  }

  /** Keep the rows the model scores positive — payload schema passes
    * through untouched (a filtering predicate, not a projection; no id
    * column needed, no join, zero shuffle). The pipeline's
    * `--nb-quality` gate. */
  def keepPositive(docs: DataFrame, textCol: String, model: NbModel): DataFrame = {
    val bcH = docs.sparkSession.sparkContext.broadcast(model.hashes)
    val bcW = docs.sparkSession.sparkContext.broadcast(model.weights)
    val oov = model.oov
    val positive = udf { (t: String) => docScore(t, bcH.value, bcW.value, oov)._2 > 0L }
    docs.where(positive(col(textCol).cast("string")))
  }

  /** Train-then-score convenience (teacher column consumed, not output). */
  def trainAndScore(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, vocabK: Int = 1 << 20): DataFrame =
    score(docs, idCol, textCol, train(docs, textCol, labelCol, vocabK))
}
