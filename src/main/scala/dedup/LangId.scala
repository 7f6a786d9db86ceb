package dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Character-n-gram rank-profile language identification — Cavnar &
  * Trenkle 1994, "N-Gram-Based Text Categorization" (the public method
  * behind classic langid tools; TextCat lineage).
  *
  * The reference pipeline has no language-ID stage (its per-language runs
  * assume a `lang` column exists — `semantic dedup
  * multi-gpu/master_lang_split.py:130-148`); a Common-Crawl-scale corpus
  * has to *produce* that column first. `TextAnalysis.langIdUdf` is the
  * zero-training stopword heuristic; this is the trained counterpart:
  *
  *   - `fit`: one distributed pass — explode docs into (lang, gram)
  *     counts, keep each language's top-`profileSize` grams by frequency
  *     (rank ties broken lexicographically for determinism). The model is
  *     tiny (langs × profileSize strings), collected to the driver the
  *     way any fitted spark.ml model is.
  *   - `predict`: profiles ride to executors inside the function closure
  *     (one broadcast, not per row); each doc builds its own rank profile
  *     and takes the argmin of the out-of-place distance — sum over doc
  *     grams of |docRank − langRank|, missing grams costing
  *     `profileSize`. No shuffle: embarrassingly parallel scoring.
  *
  * Grams are 1..maxN chars over `_`-padded tokens (word-boundary marking
  * per the paper), from the first `sampleChars` chars of the doc — langid
  * converges within a few hundred chars, so scoring cost per doc is O(1)
  * at any document length (the 100-TB-relevant property).
  */
object LangId {

  final case class Model(
      maxN: Int,
      profileSize: Int,
      sampleChars: Int,
      langs: Array[String],
      // rank maps aligned with langs: gram -> rank (0 = most frequent)
      profiles: Array[Map[String, Int]])
      extends Serializable

  /** 1..maxN char grams of one token padded as `_tok_` (C&T §4.1). */
  private[dedup] def tokenGrams(tok: String, maxN: Int): Iterator[String] = {
    val padded = "_" + tok + "_"
    for {
      n <- (1 to maxN).iterator
      i <- (0 to padded.length - n).iterator
      g = padded.substring(i, i + n)
      if g != "_" // bare boundary marker carries no signal
    } yield g
  }

  private[dedup] def docGramCounts(
      text: String, maxN: Int, sampleChars: Int): collection.Map[String, Int] = {
    val m = new scala.collection.mutable.HashMap[String, Int]()
    if (text != null) {
      val sample = if (text.length > sampleChars) text.substring(0, sampleChars) else text
      TextNorm.tokenize(sample).iterator.filter(_.nonEmpty).foreach { tok =>
        tokenGrams(tok, maxN).foreach(g => m.update(g, m.getOrElse(g, 0) + 1))
      }
    }
    m
  }

  /** Rank profile of one doc: grams ordered by (count desc, gram asc). */
  private def docProfile(
      text: String, maxN: Int, profileSize: Int, sampleChars: Int): Array[String] =
    docGramCounts(text, maxN, sampleChars).toArray
      .sortBy { case (g, c) => (-c, g) }
      .take(profileSize)
      .map(_._1)

  /** One aggregation pass over labeled docs → per-language rank profiles.
    * Deterministic at any partitioning (counts are exact, ties ordered). */
  def fit(
      docs: DataFrame,
      langCol: String = "lang",
      textCol: String = "text",
      maxN: Int = 3,
      profileSize: Int = 300,
      sampleChars: Int = 512): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val gramCounts = docs
      .select(col(langCol).as("lang"), col(textCol).as("text"))
      .as[(String, String)]
      .flatMap { case (lang, text) =>
        docGramCounts(text, maxN, sampleChars).iterator
          .map { case (g, c) => (lang, g, c.toLong) }
      }
      .toDF("lang", "gram", "c")
      .groupBy("lang", "gram").agg(sum("c").as("n"))
    val ranked = gramCounts
      .withColumn("rank",
        row_number().over(
          Window.partitionBy("lang").orderBy(col("n").desc, col("gram").asc)) - 1)
      .where(col("rank") < profileSize)
      .select("lang", "gram", "rank")
      .as[(String, String, Int)]
      .collect() // langs × profileSize rows — a model, not data
    val byLang = ranked.groupBy(_._1).toSeq.sortBy(_._1)
    Model(
      maxN, profileSize, sampleChars,
      byLang.map(_._1).toArray,
      byLang.map { case (_, rows) => rows.map(r => r._2 -> r._3).toMap }.toArray)
  }

  /** Out-of-place distance of a doc profile to each language; argmin
    * (ties to the alphabetically first language, "und" for empty docs). */
  def predictUdf(model: Model, text: Column): Column = {
    // ship the profiles once per executor, not once per task closure
    val bc = org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(model)
    val f = udf { (text: String) =>
      val m = bc.value
      val prof = docProfile(text, m.maxN, m.profileSize, m.sampleChars)
      if (prof.isEmpty) "und"
      else {
        var best = "und"
        var bestD = Long.MaxValue
        var l = 0
        while (l < m.langs.length) {
          val ranks = m.profiles(l)
          var d = 0L
          var i = 0
          while (i < prof.length) {
            d += math.abs(ranks.getOrElse(prof(i), m.profileSize) - i)
            i += 1
          }
          if (d < bestD) { bestD = d; best = m.langs(l) }
          l += 1
        }
        best
      }
    }
    f(text)
  }

  /** docs(textCol) → docs + `pred_lang` via a fitted model. */
  def predict(docs: DataFrame, model: Model, textCol: String = "text"): DataFrame =
    docs.withColumn("pred_lang", predictUdf(model, col(textCol)))
}
