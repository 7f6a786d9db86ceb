package dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column, plus embedding-cosine near-dup detection.
  *
  * Brute-force cosine is the correctness baseline (pure Catalyst:
  * zip_with + aggregate, whole-stage-codegen'd, double math for oracle
  * parity); the scale path buckets vectors with a random-hyperplane LSH
  * (Charikar STOC'02) so each query only scans its bucket.
  */
object Ann {

  /** dot(a, b) in double precision, as a Catalyst column. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k cosine neighbors for each query vector. The corpus side
    * is broadcast when small (the usual shape: few queries patterns / big
    * corpus is handled by flipping sides); norms are precomputed so the
    * cross join only does the dot product. */
  def bruteForceTopK(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame,  // (id, vec)
      k: Int): DataFrame = {
    val q = queries.select(col("qid"), col("qvec"), l2norm(col("qvec")).as("qn"))
    val c = corpus.select(col("id"), col("vec"), l2norm(col("vec")).as("cn"))
    val scored = q.join(c, col("qid") =!= col("id"))
      .withColumn("sim", dot(col("qvec"), col("vec")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("sim"))
  }

  /** Deterministic random hyperplanes: bit b of the bucket = sign of
    * dot(vec, h_b) where h_b[d] derives from xxh64(seed, b, d) — no RNG
    * state, identical at any parallelism. */
  private def hyperplane(seed: Long, bit: Int, dim: Int): Array[Double] = {
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      val h = Hashes.xxh64Long(bit.toLong << 32 | d.toLong, seed)
      // map 64 uniform bits to roughly N(0,1) via sum of 4 uniforms (CLT)
      var s = 0.0
      var i = 0
      while (i < 4) {
        s += ((h >>> (i * 16)) & 0xFFFFL).toDouble / 65535.0 - 0.5
        i += 1
      }
      v(d) = s
      d += 1
    }
    v
  }

  /** (id, vec) → (id, bucket) random-hyperplane LSH bucket (nbits wide). */
  def signBuckets(vectors: DataFrame, dim: Int, nbits: Int, seed: Long): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val planes = Array.tabulate(nbits)(b => hyperplane(seed, b, dim))
    vectors.select(col("id").cast("long"), col("vec")).as[(Long, Array[Float])]
      .map { case (id, vec) =>
        var bucket = 0L
        var b = 0
        while (b < nbits) {
          val p = planes(b)
          var s = 0.0
          var d = 0
          val n = math.min(dim, vec.length)
          while (d < n) { s += vec(d) * p(d); d += 1 }
          if (s > 0) bucket |= (1L << b)
          b += 1
        }
        (id, bucket)
      }
      .toDF("id", "bucket")
  }

  /** LSH-bucketed approximate top-k: each vector only scores against its
    * own bucket. Bucket count 2^nbits bounds the per-task pair fan-out;
    * multi-probe (flipping one bit) would raise recall — kept single-probe
    * as the documented scale path demo. */
  def lshTopK(vectors: DataFrame, dim: Int, k: Int, nbits: Int, seed: Long): DataFrame = {
    val buckets = signBuckets(vectors, dim, nbits, seed)
    val v = vectors.select(col("id").cast("long").as("id"), col("vec"))
      .join(buckets, "id")
    val a = v.select(col("bucket"), col("id").as("qid"), col("vec").as("qvec"))
    val b = v.select(col("bucket"), col("id"), col("vec"))
    val scored = a.join(b, Seq("bucket")).where(col("qid") =!= col("id"))
      .withColumn("sim", cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("sim"))
  }

  /** Embedding-cosine near-dup assignments: pairs with cosine ≥ threshold
    * become edges; components resolve with the shared large-star/small-star
    * pass; every vector gets (id, component). Brute-force pair generation
    * here (correctness baseline); the LSH-bucketed variant generates
    * candidate pairs the same way at scale. */
  def cosineDedupAssignments(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = vectors.select(col("id").cast("long").as("src"), col("vec").as("va"))
    val b = vectors.select(col("id").cast("long").as("dst"), col("vec").as("vb"))
    val edges = a.join(b, col("src") > col("dst"))
      .where(cosine(col("va"), col("vb")) >= lit(threshold))
      .select(col("src"), col("dst"))
    val comps = ConnectedComponents.runAdaptive(edges)
    ConnectedComponents.assignAll(
      vectors.select(col("id").cast("long").as("id")), comps)
  }
}
