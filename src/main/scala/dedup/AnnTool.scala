package dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** spark-submit entry point for the similarity-search family — the
  * serving-side counterpart of [[Pipeline]] (which owns dedup). Operates
  * on a parquet of embeddings `(id: long, vec: array<float>)` (column
  * names configurable).
  *
  * Modes:
  *   - `index`: int8-quantize the vectors ([[Ann.quantizeInt8]]) and
  *     write the 4×-smaller index parquet `(id, qvec binary, maxabs)` —
  *     build once, query many times.
  *   - `topk`: exact top-k neighbors for the ids in `--query-path` (a
  *     parquet with an `id` column): int8 shortlist over `--index` (or
  *     quantized on the fly) then exact float cosine re-rank
  *     ([[Ann.int8RerankTopK]] composition, but against a prebuilt
  *     index); writes `(qid, rank, neighbor_id, sim)`.
  *   - `dedup`: embedding near-dup components at `--threshold` via
  *     multi-probe sign-LSH + exact cosine verify + connected components
  *     ([[Ann.cosineDedupLsh]]); writes `(id, component)`.
  *   - `explain --pair a,b`: semantic pair forensics
  *     ([[Audit.explainVecPair]]) — exact cosine, sign-LSH buckets, and
  *     whether the pair is reachable at `--probe` radius; prints the
  *     report instead of writing parquet.
  *
  * Usage:
  *   spark-submit --class dedup.AnnTool <jar> \
  *     --mode index|topk|dedup --vectors <parquet> --output <dir> \
  *     [--id-col id] [--vec-col vec] [--dim 64]
  *     [--index <dir>] [--query-path <parquet>] [--k 10] [--shortlist 100]
  *     [--threshold 0.95] [--nbits 8] [--probe 2] [--bucket-cap 4096]
  */
object AnnTool {

  case class Args(
      mode: String = "",
      vectors: String = "",
      output: String = "",
      idCol: String = "id",
      vecCol: String = "vec",
      dim: Int = 64,
      index: String = "",
      queryPath: String = "",
      k: Int = 10,
      shortlist: Int = 100,
      threshold: Double = 0.95,
      nbits: Int = 8,
      probe: Int = 2,
      bucketCap: Int = 4096,
      pair: Option[(Long, Long)] = None)

  def parse(argv: Array[String]): Args = {
    var a = Args()
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "--mode" => a = a.copy(mode = argv(i + 1)); i += 2
        case "--vectors" => a = a.copy(vectors = argv(i + 1)); i += 2
        case "--output" => a = a.copy(output = argv(i + 1)); i += 2
        case "--id-col" => a = a.copy(idCol = argv(i + 1)); i += 2
        case "--vec-col" => a = a.copy(vecCol = argv(i + 1)); i += 2
        case "--dim" => a = a.copy(dim = argv(i + 1).toInt); i += 2
        case "--index" => a = a.copy(index = argv(i + 1)); i += 2
        case "--query-path" => a = a.copy(queryPath = argv(i + 1)); i += 2
        case "--k" => a = a.copy(k = argv(i + 1).toInt); i += 2
        case "--shortlist" => a = a.copy(shortlist = argv(i + 1).toInt); i += 2
        case "--threshold" => a = a.copy(threshold = argv(i + 1).toDouble); i += 2
        case "--nbits" => a = a.copy(nbits = argv(i + 1).toInt); i += 2
        case "--probe" => a = a.copy(probe = argv(i + 1).toInt); i += 2
        case "--bucket-cap" => a = a.copy(bucketCap = argv(i + 1).toInt); i += 2
        case "--pair" =>
          val parts = argv(i + 1).split(",")
          require(parts.length == 2 && parts.forall(_.matches("-?\\d+")),
            s"--pair wants 'a,b' (two ids), got '${argv(i + 1)}'")
          a = a.copy(pair = Some((parts(0).toLong, parts(1).toLong))); i += 2
        case other => throw new IllegalArgumentException(s"unknown argument: $other")
      }
    }
    require(Set("index", "topk", "dedup", "explain")(a.mode),
      "--mode must be index, topk, dedup or explain")
    require(a.vectors.nonEmpty, "--vectors is required")
    require(a.output.nonEmpty || a.mode == "explain", "--output is required")
    require(a.mode != "topk" || a.queryPath.nonEmpty,
      "--mode topk needs --query-path (parquet with an `id` column)")
    require(a.mode != "explain" || a.pair.nonEmpty,
      "--mode explain needs --pair a,b")
    require(a.shortlist >= a.k, "--shortlist must be >= --k")
    a
  }

  private def loadVectors(spark: SparkSession, a: Args): DataFrame =
    spark.read.parquet(a.vectors)
      .select(col(a.idCol).cast("long").as("id"), col(a.vecCol).as("vec"))

  def run(spark: SparkSession, a: Args): DataFrame = a.mode match {
    case "index" =>
      Ann.quantizeInt8(loadVectors(spark, a))
    case "topk" =>
      val v = loadVectors(spark, a)
      val qz =
        if (a.index.nonEmpty) spark.read.parquet(a.index)
          .select(col("id").cast("long").as("id"), col("qvec"))
        else Ann.quantizeInt8(v).select(col("id"), col("qvec"))
      val qids = spark.read.parquet(a.queryPath).select(col("id"))
      Ann.int8RerankTopKIndexed(v, qz, qids, a.k, a.shortlist)
    case "dedup" =>
      Ann.cosineDedupLsh(loadVectors(spark, a), a.threshold, a.dim,
        a.nbits, seed = 42L, a.probe, a.bucketCap)
  }

  /** The explain mode's report (separate from [[run]]: it returns a
    * scalar report, not a DataFrame). */
  def explain(spark: SparkSession, a: Args): Audit.VecPairReport = {
    val (x, y) = a.pair.get
    Audit.explainVecPair(loadVectors(spark, a), x, y,
      a.threshold, a.dim, a.nbits, seed = 42L, a.probe)
  }

  def main(argv: Array[String]): Unit = {
    val a = parse(argv)
    // spark-submit injects spark.master; standalone runs fall back to local
    val builder0 = SparkSession.builder()
    val builder =
      if (sys.props.contains("spark.master")) builder0
      else builder0.master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
    val spark = builder
      .appName(s"ann-${a.mode}")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS",
          Runtime.getRuntime.availableProcessors().toString))
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (a.mode == "explain") println(Audit.render(explain(spark, a)))
    else {
      val t0 = System.nanoTime()
      run(spark, a).write.mode("overwrite").parquet(a.output)
      val n = spark.read.parquet(a.output).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"mode=${a.mode} rows=$n wall=$wall%.1fs -> ${a.output}")
    }
    spark.stop()
  }
}
