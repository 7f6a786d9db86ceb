package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: headline queries on SPARK_GRAFT_SF_DIR, one JSON
  * line on stdout. Headline set = the operators with scale-relevant plans;
  * the two O(n^2) brute-force correctness baselines
  * (q_ngram_jaccard_pairs, q_embed_dedup) are excluded by design — their
  * scale path is the LSH variants (q_fuzzy_assign, q_ann_lsh).
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q_fuzzy_assign", // flagship MinHash-LSH + verify + CC
    "q_simhash_assign",
    "q_suffix_assign",
    "q_exact_kept",
    "q_cc_chain",
    "q_ann_topk",
    "q_ann_lsh",
    "q_lsh_bands",
    "q_token_stats",
    "q_quality",
    "q_minlen_filter",
    "q_dup_rank",
    "q_lang_id",
    "q_fingerprint",
    "q_token_bpe",
    "q_binary_meta")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val results = headline.filter(SparkEntry.queries.contains).map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val fuzzySec = results.toMap.getOrElse("q_fuzzy_assign", Double.NaN)
    val docsPerSec = if (fuzzySec > 0) nDocs / fuzzySec else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","docs":$nDocs,"fuzzy_docs_per_sec":${f"$docsPerSec%.1f"}}""")
    spark.stop()
  }
}
