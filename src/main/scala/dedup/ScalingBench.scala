package dedup

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling measurement (BASELINE.md protocol): the same
  * job on the same parquet input at local[N] and local[4N], shuffle
  * partitions ∝ cores; reports docs/sec at both levels and
  * efficiency = (throughputB / throughputA) / 4. Gate: ≥ 0.8.
  *
  * The deterministic synthetic corpus is written to parquet once
  * (untimed) and both runs read it — the timed section is exactly what a
  * production job does, and each parallelism level gets an identical,
  * pushdown-able input. This evidences the north_rule N→4N executor
  * criterion in a single-host sandbox: the parallelism-sensitive choices
  * (shuffle partitions, salted aggregation, no driver-side loops) are the
  * same ones that govern multi-executor scaling; a real cluster swaps
  * `--master local[N]` for `--num-executors`.
  *
  * Usage: runMain dedup.ScalingBench [nDocs] [coresA] [coresB]
  */
object ScalingBench {

  /** shuffle partitions per core: >1 smooths stragglers on the big
    * shuffles (AQE coalesces the small ones back) — with exactly
    * cores partitions one slow task idles a whole core slot. */
  private val partsPerCore =
    sys.env.getOrElse("SPARK_GRAFT_PARTS_PER_CORE", "2").toInt

  private def session(cores: Int, name: String): SparkSession = {
    // SPARK_GRAFT_MASTER overrides local[cores] — used for the standalone-
    // cluster runs (spark://…), where `cores` is the job's TOTAL executor
    // cores (--total-executor-cores) and only sizes shuffle partitions
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cores]")
    val s = SparkSession.builder()
      .master(master)
      .appName(name)
      .config("spark.sql.shuffle.partitions", (cores * partsPerCore).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // tmpfs shuffle dirs: the sandbox's /tmp disk shows bursty IO
      // throttling; scaling is measured against RAM-backed local dirs the
      // way a production cluster would use local NVMe
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def fresh(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }

  /** total JVM CPU nanoseconds (all threads). The work-inflation ratio
    * cpuSec(4N)/cpuSec(N) attributes sub-linear wall scaling: ≈1.0 means
    * the engine did the same work and the gap is host steal / stage
    * barriers; >1 means per-core slowdown (memory-bandwidth contention in
    * a single-socket JVM — a multi-executor cluster adds sockets, not
    * threads-per-socket, so that component does not transfer). */
  private def cpuNanos: Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  private def runOnce(cores: Int, input: String, cfg: DedupConfig): (Double, Long, Long, Double, Double) = {
    val spark = session(cores, s"scaling-$cores")
    try {
      val docs = spark.read.parquet(input)
      // warm JIT/codegen on a real slice, untimed (generated-code and
      // hot-loop compilation otherwise lands in the first timed run)
      FuzzyDedup.assignments(docs.limit(20000), cfg).count()
      val gc0 = gcMillis
      val cpu0 = cpuNanos
      val t0 = System.nanoTime()
      val res = FuzzyDedup.run(docs, cfg)
      val assigns = res.assignments
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = assigns.count()
      val removed = assigns
        .where(org.apache.spark.sql.functions.col("id") =!=
          org.apache.spark.sql.functions.col("component")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, n, removed, (gcMillis - gc0) / 1e3, (cpuNanos - cpu0) / 1e9)
    } finally {
      spark.stop()
      fresh()
    }
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 40000L
    val coresA = if (args.length > 1) args(1).toInt else 8
    val coresB = if (args.length > 2) args(2).toInt else 32
    // single-level mode (coresA == coresB): one measurement per JVM — the
    // honest analogue of two separate spark-submit jobs; a wrapper combines
    if (coresA == coresB) {
      val input = sys.env.getOrElse("SPARK_GRAFT_CORPUS_ROOT", "/dev/shm") + s"/scaling_corpus_$nDocs"
      val prep = session(coresB, "scaling-prep")
      if (!new java.io.File(s"$input/_SUCCESS").exists()) {
        import prep.implicits._
        Synth.corpus(prep, nDocs, DedupConfig().seed)
          .map(d => (Hashes.xxh64Str(d.url), d.text))
          .toDF("id", "text")
          .write.mode("overwrite").parquet(input)
      }
      prep.stop()
      fresh()
      val cfg0 = DedupConfig(numPerm = 250, ngram = 5, minLength = 5,
        threshold = 0.7, saltBuckets = 16, verify = true)
      val (sec, n, rem, gc, cpu) = runOnce(coresA, input, cfg0)
      println(f"""{"docs":$nDocs,"removed":$rem,"cores":$coresA,"sec":$sec%.2f,"gcSec":$gc%.2f,"cpuSec":$cpu%.1f,"docsPerSec":${nDocs / sec}%.1f}""")
      return
    }
    val cfg = DedupConfig(numPerm = 250, ngram = 5, minLength = 5,
      threshold = 0.7, saltBuckets = 16, verify = true)

    // materialize the corpus once, untimed, at full parallelism
    val input = sys.env.getOrElse("SPARK_GRAFT_CORPUS_ROOT", "/dev/shm") + s"/scaling_corpus_$nDocs"
    val prep = session(coresB, "scaling-prep")
    if (!new java.io.File(s"$input/_SUCCESS").exists()) {
      import prep.implicits._
      Synth.corpus(prep, nDocs, cfg.seed)
        .map(d => (Hashes.xxh64Str(d.url), d.text))
        .toDF("id", "text")
        .write.mode("overwrite").parquet(input)
    }
    prep.stop()
    fresh()

    // the sandbox host shows bimodal IO/CPU behavior across minutes-apart
    // runs; interleave A/B twice and take the per-level minimum — the
    // engine's scaling, not the host's weather
    val (secA1, nA, remA, gcA1, cpuA1) = runOnce(coresA, input, cfg)
    val (secB1, nB, remB, gcB1, cpuB1) = runOnce(coresB, input, cfg)
    val (secA2, _, _, gcA2, cpuA2) = runOnce(coresA, input, cfg)
    val (secB2, _, _, gcB2, cpuB2) = runOnce(coresB, input, cfg)
    require(nA == nB && remA == remB,
      s"parallelism changed results: ($nA,$remA) vs ($nB,$remB)")
    val secA = math.min(secA1, secA2)
    val secB = math.min(secB1, secB2)
    val thA = nDocs / secA
    val thB = nDocs / secB
    val eff = (thB / thA) / (coresB.toDouble / coresA)
    println(f"""{"docs":$nDocs,"removed":$remA,"coresA":$coresA,"coresB":$coresB,""" +
      f""""secA":$secA%.2f,"secB":$secB%.2f,"secA_runs":[$secA1%.2f,$secA2%.2f],""" +
      f""""secB_runs":[$secB1%.2f,$secB2%.2f],"gcA":[$gcA1%.1f,$gcA2%.1f],"gcB":[$gcB1%.1f,$gcB2%.1f],""" +
      f""""cpuA":[$cpuA1%.1f,$cpuA2%.1f],"cpuB":[$cpuB1%.1f,$cpuB2%.1f],""" +
      f""""docsPerSecA":$thA%.1f,"docsPerSecB":$thB%.1f,""" +
      f""""speedup":${thB / thA}%.3f,"efficiency":$eff%.3f}""")
  }
}
