package dedup

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling measurement (BASELINE.md protocol): the same
  * deterministic synthetic corpus + config at local[N] and local[4N],
  * shuffle partitions ∝ cores; reports docs/sec at both levels and
  * efficiency = (throughputB / throughputA) / 4. Gate: ≥ 0.8.
  *
  * This evidences the north_rule N→4N executor scaling criterion in a
  * single-host sandbox: all parallelism-sensitive choices (shuffle
  * partitions, salted aggregation, no driver-side loops) are the same ones
  * that govern multi-executor scaling; a real cluster swaps
  * `--master local[N]` for `--num-executors`.
  *
  * Usage: runMain dedup.ScalingBench [nDocs] [coresA] [coresB]
  */
object ScalingBench {

  private def runOnce(cores: Int, nDocs: Long, cfg: DedupConfig): (Double, Long, Long) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val docs = {
        import spark.implicits._
        Synth.corpus(spark, nDocs, cfg.seed)
          .map(d => (Hashes.xxh64Str(d.url), d.text))
          .toDF("id", "text")
      }
      // warm the JVM/codegen once on a small slice, untimed
      FuzzyDedup.assignments(docs.limit(500), cfg).count()
      val t0 = System.nanoTime()
      val res = FuzzyDedup.run(docs, cfg)
      val n = res.assignments.count()
      val removed = res.assignments
        .where(org.apache.spark.sql.functions.col("id") =!=
          org.apache.spark.sql.functions.col("component")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, n, removed)
    } finally {
      spark.stop()
      // allow a fresh master for the next run in the same JVM
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 40000L
    val coresA = if (args.length > 1) args(1).toInt else 8
    val coresB = if (args.length > 2) args(2).toInt else 32
    val cfg = DedupConfig(numPerm = 250, ngram = 5, minLength = 5,
      threshold = 0.7, saltBuckets = 16, verify = true)
    val (secA, nA, remA) = runOnce(coresA, nDocs, cfg)
    val (secB, nB, remB) = runOnce(coresB, nDocs, cfg)
    require(nA == nB && remA == remB,
      s"parallelism changed results: ($nA,$remA) vs ($nB,$remB)")
    val thA = nDocs / secA
    val thB = nDocs / secB
    val eff = (thB / thA) / (coresB.toDouble / coresA)
    println(f"""{"docs":$nDocs,"removed":$remA,"coresA":$coresA,"coresB":$coresB,""" +
      f""""secA":$secA%.2f,"secB":$secB%.2f,"docsPerSecA":$thA%.1f,"docsPerSecB":$thB%.1f,""" +
      f""""speedup":${thB / thA}%.3f,"efficiency":$eff%.3f}""")
  }
}
