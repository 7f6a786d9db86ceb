package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic-dedup family: per-cell prune semantics vs a local brute-force
  * oracle, and the KMeans path end-to-end. */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  /** deterministic pseudo-random unit-ish vector */
  private def vec(seed: Long, dim: Int): Array[Float] = {
    Array.tabulate(dim) { d =>
      val h = Hashes.xxh64Long(seed * 1024 + d, 7L)
      (((h >>> 16) & 0xFFFF).toFloat / 65535f) - 0.5f
    }
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dp = 0.0; var na = 0.0; var nb = 0.0; var d = 0
    while (d < a.length) {
      dp += a(d).toDouble * b(d); na += a(d).toDouble * a(d); nb += b(d).toDouble * b(d); d += 1
    }
    dp / math.sqrt(na * nb)
  }

  /** clustered corpus: 5 cells × 20 members; member = cell base + noise,
    * so intra-cell cosines are high and ordered scanning prunes most. */
  private def corpus(n: Int = 100, dim: Int = 16): Seq[(Long, Array[Float], Long)] =
    (0 until n).map { i =>
      val cell = i % 5
      val base = vec(cell.toLong, dim)
      val noise = vec(1000L + i, dim)
      val v = Array.tabulate(dim)(d => base(d) + 0.15f * noise(d))
      (i.toLong, v, cell.toLong)
    }

  test("pruneWithinCells matches the local brute-force oracle") {
    import spark.implicits._
    val rows = corpus()
    val df = rows.toDF("id", "vec", "cell")
      .withColumn("ord", col("id").cast("double"))
    val got = SemDedup.pruneWithinCells(df, 0.9)
      .select("id", "removed").as[(Long, Boolean)].collect().toMap
    // oracle: scan each cell in id order, removed iff max cosine to ANY
    // earlier member >= threshold
    rows.groupBy(_._3).foreach { case (_, members) =>
      val sorted = members.sortBy(_._1)
      sorted.zipWithIndex.foreach { case ((id, v, _), i) =>
        val expect = (0 until i).exists(j => cosine(sorted(j)._2, v) >= 0.9)
        assert(got(id) === expect, s"id $id")
      }
    }
  }

  test("pruneWithinCells: first member of a cell is never removed; " +
    "threshold 1.01 removes nothing; -1.01 removes all but firsts") {
    import spark.implicits._
    val df = corpus().toDF("id", "vec", "cell")
      .withColumn("ord", col("id").cast("double"))
    val none = SemDedup.pruneWithinCells(df, 1.01)
    assert(none.where(col("removed")).count() === 0)
    val all = SemDedup.pruneWithinCells(df, -1.01)
    assert(all.where(!col("removed")).count() === 5) // one survivor per cell
  }

  test("maxCell cap: overflow members compare against the first cap anchors only") {
    import spark.implicits._
    // one cell of 10 identical vectors: with cap 3 every member after the
    // first still matches an anchor -> same result as uncapped here
    val v = vec(1L, 8)
    val df = (0 until 10).map(i => (i.toLong, v, 0L)).toDF("id", "vec", "cell")
      .withColumn("ord", col("id").cast("double"))
    val capped = SemDedup.pruneWithinCells(df, 0.99, maxCell = 3)
    assert(capped.where(col("removed")).count() === 9)
  }

  test("semDedupKMeans: k cells, deterministic under a fixed seed, prunes " +
    "planted duplicates, kept+removed partitions the corpus") {
    import spark.implicits._
    val rows = corpus(150, 16)
    val df = rows.map { case (id, v, _) => (id, v) }.toDF("id", "vec")
    val r1 = SemDedup.semDedupKMeans(df, k = 5, eps = 0.2, seed = 42L)
    val r2 = SemDedup.semDedupKMeans(df, k = 5, eps = 0.2, seed = 42L)
    val removed = r1.pruned.where(col("removed")).count()
    assert(removed > 0, "planted near-identical members should prune")
    assert(r1.kept.count() + removed === 150)
    assert(r1.assignments.select("cell").distinct().count() <= 5)
    // determinism: same seed -> identical removal set
    val s1 = r1.pruned.where(col("removed")).select("id").as[Long].collect().sorted.toSeq
    val s2 = r2.pruned.where(col("removed")).select("id").as[Long].collect().sorted.toSeq
    assert(s1 === s2)
  }

  test("sinkByCell writes hive-partitioned cell=N directories") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cells").toString + "/out"
    val df = corpus(40).map { case (id, v, cell) => (id, cell) }.toDF("id", "cell")
    SemDedup.sinkByCell(df, "cell", dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cell=")).sorted
    assert(dirs.toSeq === (0 until 5).map(c => s"cell=$c"))
    assert(spark.read.parquet(dir).count() === 40)
  }

  test("eps monotonicity: larger eps (lower sim threshold) removes at least as much") {
    import spark.implicits._
    val df = corpus(100, 16).map { case (id, v, _) => (id, v) }.toDF("id", "vec")
    val loose = SemDedup.semDedupKMeans(df, k = 5, eps = 0.5, seed = 42L)
      .pruned.where(col("removed")).count()
    val tight = SemDedup.semDedupKMeans(df, k = 5, eps = 0.05, seed = 42L)
      .pruned.where(col("removed")).count()
    assert(loose >= tight)
  }
}
