package dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-language dup-pair recall report — the counterpart of the
  * reference's per-language recall benchmark (semantic dedup
  * multi-gpu/Indic Languages Benchmark/Readme.md:9-58: recall per 23
  * languages × model × ε). The reference splits the corpus by language
  * first (master_lang_split.py) and reports recall within each split; we
  * do the same over the multi-language synthetic page table: per language,
  * run the full verified fuzzy pipeline and score found dup pairs against
  * a brute-force exact-Jaccard ≥ t oracle computed from raw text.
  *
  * Truth is *within-language* pairs, matching the reference's protocol (a
  * cross-language near-dup is invisible to any per-language pipeline, the
  * reference's included).
  *
  * Usage: runMain dedup.RecallReport [nDocs] — prints a markdown table.
  */
object RecallReport {

  case class LangStats(
      lang: String,
      docs: Long,
      truthPairs: Long,
      foundPairs: Long,
      recall: Double,
      refPairs: Long,
      refFound: Long,
      refRecall: Double,
      verifiedPrecision: Double)

  /** Per-language recall/precision of the verified pipeline at `cfg` over
    * the n-doc synthetic page table. Small-scale only (brute-force truth
    * is O(docs² per language)).
    *
    * Two recall columns, two roles:
    *   - `recall` vs the brute-force exact-Jaccard truth — informational.
    *     A pair at similarity s is banded with prob 1−(1−s^r)^b (≈0.77 at
    *     s=0.70 for (25,10)), so raw truth recall on a small split is
    *     dominated by borderline-pair coin flips, not engine quality.
    *   - `refRecall` vs the true pairs the REFERENCE semantics (identical
    *     signatures/banding, no verification — fuzzy_spark2.py:620-623)
    *     co-assigns — the north-rule criterion ("dup-pair recall ≥0.99 vs
    *     the reference at identical shingle/signature config") and the
    *     gated column: any true pair the reference finds that we drop is
    *     an engine bug (lost bucket, bad salting, over-eager verify). */
  def perLangRecall(spark: SparkSession, n: Long, cfg: DedupConfig): Seq[LangStats] = {
    import spark.implicits._
    // the 12-language / 12-script table (round 4; was 4 Latin-alphabet
    // langs) — cluster-keyed languages keep every dup class monolingual,
    // real non-Latin scripts exercise the tokenizer/shingler per script
    val pages = Synth.multiScriptPages(spark, n)
      .select(col("url"), col("text"), col("lang"))
      .cache()
    val langs = pages.select("lang").distinct().as[String].collect().sorted
    val out = langs.map { lang =>
      val docs = pages.where(col("lang") === lang)
        .select(xxhash64(col("url")).as("id"), col("text"))
      val rows = docs.as[(Long, String)].collect()
      // brute-force truth: exact shingle-Jaccard >= threshold, integer math
      val sh = rows.map { case (id, t) =>
        id -> TextNorm.shingleHashes(t, cfg.ngram, cfg.minLength)
      }.filter(_._2.nonEmpty)
      val truth = scala.collection.mutable.Set[(Long, Long)]()
      val thNum = math.round(cfg.threshold * 10).toInt
      var i = 0
      while (i < sh.length) {
        var j = i + 1
        while (j < sh.length) {
          val (inter, uni) = VerifyPairs.jaccardCounts(sh(i)._2, sh(j)._2)
          if (inter.toLong * 10 >= uni.toLong * thNum)
            truth += ((math.max(sh(i)._1, sh(j)._1), math.min(sh(i)._1, sh(j)._1)))
          j += 1
        }
        i += 1
      }
      val res = FuzzyDedup.run(docs.toDF(), cfg)
      val assign = res.assignments.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val found = truth.count { case (a, b) => assign(a) == assign(b) }
      // reference-mode twin: identical signatures/banding, no verification
      val refAssign = FuzzyDedup.run(docs.toDF(), cfg.copy(verify = false))
        .assignments.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val refTrue = truth.filter { case (a, b) => refAssign(a) == refAssign(b) }
      val refFound = refTrue.count { case (a, b) => assign(a) == assign(b) }
      // precision of the verify gate: every emitted verified edge is a true pair
      val shMap = sh.toMap
      val edges = res.edges.select("src", "dst").as[(Long, Long)].collect()
      val tp = edges.count { case (s, d) =>
        val (inter, uni) = VerifyPairs.jaccardCounts(shMap(s), shMap(d))
        inter.toLong * 10 >= uni.toLong * thNum
      }
      LangStats(lang, rows.length.toLong, truth.size.toLong, found.toLong,
        if (truth.isEmpty) 1.0 else found.toDouble / truth.size,
        refTrue.size.toLong, refFound.toLong,
        if (refTrue.isEmpty) 1.0 else refFound.toDouble / refTrue.size,
        if (edges.isEmpty) 1.0 else tp.toDouble / edges.length)
    }
    pages.unpersist()
    out.toSeq
  }

  def markdown(stats: Seq[LangStats], cfg: DedupConfig, n: Long): String = {
    val sb = new StringBuilder
    sb.append(s"| lang | docs | truth pairs | found | recall | ref pairs | ref recall (gated) | verify precision |\n")
    sb.append(s"|---|---|---|---|---|---|---|---|\n")
    stats.foreach { s =>
      sb.append(f"| ${s.lang} | ${s.docs} | ${s.truthPairs} | ${s.foundPairs} | ${s.recall}%.4f " +
        f"| ${s.refPairs} | ${s.refRecall}%.4f | ${s.verifiedPrecision}%.4f |\n")
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 4000L
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig(numPerm = 250, ngram = 5, minLength = 5,
      threshold = 0.7, saltBuckets = 8, verify = true)
    val stats = perLangRecall(spark, n, cfg)
    println(s"Per-language dup-pair recall, $n synthetic pages, reference config " +
      s"(threshold ${cfg.threshold}, ngram ${cfg.ngram}, numPerm ${cfg.numPerm}, verified):\n")
    println(markdown(stats, cfg, n))
    spark.stop()
  }
}
