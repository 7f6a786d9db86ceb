package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** AnnTool CLI: arg validation and the three modes end-to-end on a tiny
  * planted corpus, including the build-once/query-many index path. */
class AnnToolSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def vec(seed: Long, dim: Int = 16): Array[Float] =
    Array.tabulate(dim) { d =>
      val h = Hashes.xxh64Long(seed * 977 + d, 3L)
      (((h >>> 18) & 0xFFFF).toFloat / 65535f) - 0.5f
    }

  test("parse: validation and unknown-arg rejection") {
    intercept[IllegalArgumentException] { AnnTool.parse(Array("--mode", "nope",
      "--vectors", "v", "--output", "o")) }
    intercept[IllegalArgumentException] { AnnTool.parse(Array("--mode", "topk",
      "--vectors", "v", "--output", "o")) } // missing --query-path
    intercept[IllegalArgumentException] { AnnTool.parse(Array("--mode", "index",
      "--vectors", "v", "--output", "o", "--bogus", "x")) }
    intercept[IllegalArgumentException] { AnnTool.parse(Array("--mode", "topk",
      "--vectors", "v", "--output", "o", "--query-path", "q",
      "--k", "10", "--shortlist", "5")) }
    val a = AnnTool.parse(Array("--mode", "dedup", "--vectors", "v",
      "--output", "o", "--threshold", "0.9", "--dim", "32"))
    assert(a.threshold === 0.9 && a.dim === 32)
    intercept[IllegalArgumentException] { AnnTool.parse(Array("--mode", "explain",
      "--vectors", "v")) } // missing --pair
    intercept[IllegalArgumentException] { AnnTool.parse(Array("--mode", "explain",
      "--vectors", "v", "--pair", "1;2")) }
    val e = AnnTool.parse(Array("--mode", "explain", "--vectors", "v",
      "--pair", "3,9", "--dim", "16"))
    assert(e.pair === Some((3L, 9L)))
  }

  test("explain mode reports the engine-true semantic verdict") {
    val dir = java.nio.file.Files.createTempDirectory("anntool-ex").toString
    val base = vec(42)
    Seq((1L, base),
      (2L, Array.tabulate(16)(d => base(d) + 0.004f * vec(5)(d))),
      (3L, vec(911))).toDF("id", "vec")
      .write.mode("overwrite").parquet(s"$dir/v.parquet")
    val r = AnnTool.explain(spark, AnnTool.parse(Array("--mode", "explain",
      "--vectors", s"$dir/v.parquet", "--pair", "1,2",
      "--threshold", "0.95", "--dim", "16")))
    assert(r.aboveThreshold && r.reachable)
    val r2 = AnnTool.explain(spark, AnnTool.parse(Array("--mode", "explain",
      "--vectors", s"$dir/v.parquet", "--pair", "1,3",
      "--threshold", "0.95", "--dim", "16")))
    assert(!r2.aboveThreshold)
  }

  test("index → topk → dedup modes run end-to-end; indexed == on-the-fly") {
    val dir = java.nio.file.Files.createTempDirectory("anntool").toString
    // 10 clusters × 3 near-identical + 30 singles
    val rows = (0 until 30).map { i =>
      val base = vec(i / 3)
      (i.toLong, Array.tabulate(16)(d => base(d) + 0.005f * vec(1000L + i)(d)))
    } ++ (30 until 60).map(i => (i.toLong, vec(5000L + i)))
    rows.toDF("id", "vec").write.mode("overwrite").parquet(s"$dir/vecs.parquet")
    Seq(0L, 3L, 30L).toDF("id").write.mode("overwrite")
      .parquet(s"$dir/queries.parquet")

    // index mode (run(), like PipelineSpec does — main() is the same code
    // plus session bootstrap, smoke-driven via runMain at verify time)
    AnnTool.run(spark, AnnTool.parse(Array("--mode", "index",
      "--vectors", s"$dir/vecs.parquet", "--output", s"$dir/ignored")))
      .write.mode("overwrite").parquet(s"$dir/index")
    val idx = spark.read.parquet(s"$dir/index")
    assert(idx.count() === 60)
    assert(idx.columns.toSet === Set("id", "qvec", "maxabs"))

    // topk against the prebuilt index == topk quantizing on the fly
    val a = AnnTool.run(spark, AnnTool.parse(Array("--mode", "topk",
      "--vectors", s"$dir/vecs.parquet", "--index", s"$dir/index",
      "--query-path", s"$dir/queries.parquet", "--output", s"$dir/o1",
      "--k", "2", "--shortlist", "10")))
      .select("qid", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val b = AnnTool.run(spark, AnnTool.parse(Array("--mode", "topk",
      "--vectors", s"$dir/vecs.parquet",
      "--query-path", s"$dir/queries.parquet", "--output", s"$dir/o2",
      "--k", "2", "--shortlist", "10")))
      .select("qid", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(a === b)
    assert(a.map(_._1) === Set(0L, 3L, 30L))
    // clustered queries find their cluster mates first
    val top1of0 = a.find(r => r._1 == 0L && r._2 == 1).get._3
    assert(Set(1L, 2L).contains(top1of0))

    // dedup mode: each planted cluster lands in one component
    val comps = AnnTool.run(spark, AnnTool.parse(Array("--mode", "dedup",
      "--vectors", s"$dir/vecs.parquet", "--output", s"$dir/o3",
      "--threshold", "0.95", "--dim", "16", "--nbits", "6")))
      .as[(Long, Long)].collect().toMap
    assert(comps.size === 60)
    (0 until 10).foreach { c =>
      val members = (c * 3 until c * 3 + 3).map(i => comps(i.toLong)).toSet
      assert(members.size === 1, s"cluster $c split: $members")
    }
  }
}
