package dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the flagship pipeline — finds where wall time goes
  * at a given parallelism. Usage: runMain dedup.ProfileBench <nDocs> <cores>
  */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args(0).toLong
    val cores = args(1).toInt
    val input = sys.env.getOrElse("SPARK_GRAFT_CORPUS_ROOT", "/dev/shm") + s"/scaling_corpus_$nDocs"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("profile")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      // scan splits bound the narrow phases' parallelism (see
      // ScalingBench.session) — size them for the core count, not 128 MB
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", (16L << 20).toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig(numPerm = 250, ngram = 5, minLength = 5,
      threshold = 0.7, saltBuckets = 16, verify = true)

    def cpuNanos: Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
        case _ => 0L
      }

    def phase[T](name: String)(f: => T): T = {
      val c0 = cpuNanos
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (cpuNanos - c0) / 1e9
      // cpu/wall = busy cores during the phase; cpu inflation across
      // parallelism levels = per-core slowdown (bandwidth contention)
      println(f"[profile] $name%-16s $wall%8.2f s  cpu $cpu%8.2f s  (${cpu / wall}%4.1f cores busy)")
      r
    }

    val docs = spark.read.parquet(input)
    phase("scan")(docs.count())
    val shingles = Lsh.shingleSets(docs, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    phase("shingles")(shingles.count())
    val bands = Lsh.bandKeys(shingles, cfg)
    phase("signatures+bands")(bands.count())
    val candidates = phase("star_edges") {
      val c = Lsh.starEdges(bands, cfg.saltBuckets)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count()
      c
    }
    val verified = phase("verify") {
      val v = VerifyPairs.verifyJaccard(candidates, shingles, cfg.threshold)
        .select(col("src"), col("dst"))
        .localCheckpoint(false)
      v.count()
      v
    }
    val comps = phase("cc")(ConnectedComponents.runAdaptive(verified))
    phase("assign") {
      ConnectedComponents.assignAll(docs.select(col("id")), comps).count()
    }
    spark.stop()
  }
}
