package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Embedding stage: the real plumbing (broadcast model, batched
  * mapPartitions, schema contract) must be deterministic at any batch
  * size / partition layout; the semantic pipeline flag must commit its
  * stages and fold pruned ids into kept. */
class EmbeddingSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private val cfg = DedupConfig(idCol = "id", textCol = "text")

  private def corpus(n: Long) = {
    import spark.implicits._
    Synth.corpus(spark, n, 42L).map(d => (Hashes.xxh64Str(d.url), d.text))
      .toDF("id", "text")
  }

  test("embed: batch-size and partition-layout invariant; unit-norm; text-keyed") {
    val docs = corpus(300)
    def vecs(df: org.apache.spark.sql.DataFrame, batch: Int): Map[Long, Seq[Float]] =
      Embedding.embed(df, cfg, dim = 32, batchSize = batch).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val a = vecs(docs, 7)
    val b = vecs(docs.repartition(13), 512)
    assert(a === b, "embedding must not depend on batching or partitioning")
    // unit norm (or zero for empty text)
    a.values.foreach { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-4 || n == 0.0)
    }
    // identical text => identical vector (the synth corpus has exact-dup classes)
    val byText = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val dupPair = byText.groupBy(_._2).values.find(_.size >= 2).map(_.keys.take(2).toSeq)
    assert(dupPair.nonEmpty, "synth corpus should contain exact dups")
    val Seq(i1, i2) = dupPair.get
    assert(a(i1) === a(i2))
  }

  test("tfidfEmbed: hand-computed idf weights and cosine ordering") {
    import spark.implicits._
    // "common" appears in all 4 docs; rare words in one or two. With the
    // IDF downweighting, a pair sharing a RARE word must score higher
    // cosine than a pair sharing only the common word.
    val docs = Seq(
      (1L, "common rare1 rare1 rare1"),
      (2L, "common rare1 rare1 rare1"),
      (3L, "common other3"),
      (4L, "common other4")).toDF("id", "text")
    val dim = 512 // large: no lane collisions among the 5 words (verified below)
    val lanes = Seq("common", "rare1", "other3", "other4").map(Embedding.lane(_, dim, cfg.seed))
    assert(lanes.distinct.size === lanes.size, "test needs collision-free lanes")
    val v = Embedding.tfidfEmbed(docs, cfg, dim = dim).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum // unit vectors
    assert(math.abs(cos(v(1L), v(2L)) - 1.0) < 1e-5, "identical docs -> cosine 1")
    assert(cos(v(1L), v(3L)) < cos(v(1L), v(2L)))
    // docs 3,4 share only the corpus-wide word: idf = ln(5/5)+1 = 1 on that
    // lane vs ln(5/2)+1 on other lanes — hand-check the exact cosine
    val idfCommon = math.log(5.0 / 5.0) + 1.0
    val idfRare = math.log(5.0 / 2.0) + 1.0
    val expected34 = (idfCommon * idfCommon) / (idfCommon * idfCommon + idfRare * idfRare)
    assert(math.abs(cos(v(3L), v(4L)) - expected34) < 1e-5)
    // unit-norm everywhere
    v.values.foreach { a =>
      assert(math.abs(math.sqrt(a.map(x => x.toDouble * x).sum) - 1.0) < 1e-4)
    }
  }

  test("tfidfEmbed: batch/partition invariant; null and empty text yield zero vectors") {
    import spark.implicits._
    val docs = corpus(200).unionByName(
      Seq((900001L, null.asInstanceOf[String]), (900002L, "")).toDF("id", "text"))
    def vecs(df: org.apache.spark.sql.DataFrame, batch: Int): Map[Long, Seq[Float]] =
      Embedding.tfidfEmbed(df, cfg, dim = 32, batchSize = batch).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val a = vecs(docs, 5)
    val b = vecs(docs.repartition(17), 1024)
    assert(a === b)
    assert(a(900001L).forall(_ == 0f) && a(900002L).forall(_ == 0f))
  }

  test("weightsEmbed: golden forward equals a hand-computed " +
      "mean-pool → linear head → L2 matmul") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("weights").toString
    // vocab: 2-dim one-hot word vectors; head: W=[[2,0],[0,2]], b=[1,-1]
    Seq(("hello", Array(1f, 0f)), ("world", Array(0f, 1f)))
      .toDF("token", "vec").write.parquet(s"$dir/vocab")
    Seq((0, Array(2f, 0f), 1f), (1, Array(0f, 2f), -1f))
      .toDF("row", "w", "b").write.parquet(s"$dir/head")
    val enc = Embedding.loadWeightEncoder(spark, dir)
    assert(enc.dim === 2)
    val docs = Seq(
      (1L, "hello world"), // mean [.5,.5] → W·x+b [2,0]   → [1,0]
      (2L, "hello"),       // mean [1,0]  → [3,-1] → /√10
      (3L, "oov only"),    // no hits → zero vector, head NOT applied
      (4L, null.asInstanceOf[String]),
      (5L, "HELLO, Hello; world!") // tokenizer lowercases + splits punct:
      ).toDF("id", "text") //   mean [2/3,1/3] → [7/3,-1/3] → /‖·‖
    val v = Embedding.weightsEmbed(docs, cfg, enc, batchSize = 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def close(a: Array[Float], b: Array[Double]): Boolean =
      a.length == b.length && a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-6 }
    assert(close(v(1L), Array(1.0, 0.0)))
    val n2 = math.sqrt(10.0)
    assert(close(v(2L), Array(3.0 / n2, -1.0 / n2)))
    assert(v(3L).forall(_ == 0f) && v(4L).forall(_ == 0f))
    val (h5x, h5y) = (7.0 / 3.0, -1.0 / 3.0)
    val n5 = math.sqrt(h5x * h5x + h5y * h5y)
    assert(close(v(5L), Array(h5x / n5, h5y / n5)))
    // head-less layout: pure mean-pool + L2
    val dir2 = java.nio.file.Files.createTempDirectory("weights2").toString
    Seq(("hello", Array(3f, 4f))).toDF("token", "vec").write.parquet(s"$dir2/vocab")
    val enc2 = Embedding.loadWeightEncoder(spark, dir2)
    val v2 = Embedding.weightsEmbed(Seq((9L, "hello hello")).toDF("id", "text"), cfg, enc2)
      .collect().map(r => r.getSeq[Float](1).toArray).head
    assert(close(v2, Array(0.6, 0.8)))
  }

  test("pipeline --semantic --embed-weights: weights encoder drives the " +
      "embeddings stage; config hash isolates it from the tfidf checkpoint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wepipe").toString
    // token vectors rich enough that synth texts embed non-trivially:
    // 16-dim deterministic pseudo-random unit rows for the top synth words
    val rnd = new scala.util.Random(3)
    val toks = (0 until 400).map(i => s"w$i") ++ Seq("the", "and", "of", "a")
    toks.map { t => (t, Array.fill(16)(rnd.nextGaussian().toFloat)) }
      .toDF("token", "vec").write.parquet(s"$dir/weights/vocab")
    val argv = Array("--synth", "300", "--output", s"$dir/out",
      "--semantic", "--embed-weights", s"$dir/weights",
      "--sem-k", "8", "--num-perm", "64", "--salt", "4")
    val (kept, _) = Pipeline.run(spark, Pipeline.parse(argv))
    assert(kept.count() > 0)
    val emb = spark.read.parquet(s"$dir/out/embeddings/data")
    assert(emb.select("vec").head().getSeq[Float](0).length === 16,
      "embeddings stage must carry the weights encoder's dim, not --sem-dim")
    // exact-dup synth texts must still embed identically (pure function)
    val withText = Pipeline.parse(argv)
    val texts = Synth.pages(spark, 300, withText.cfg.seed).toDF()
      .select(xxhash64(col("url")).as("id"), col("text"))
    val joined = emb.join(texts, "id")
      .select(col("text"), col("vec").cast("string").as("v"))
      .distinct().groupBy("text").count().where(col("count") > 1).count()
    assert(joined === 0L, "same text must embed to the same vector")
    // re-exporting DIFFERENT weights into the SAME path must invalidate
    // the embeddings checkpoint — the config fingerprint covers the weight
    // FILES (name|size|mtime), not the path string. Rerun with 8-dim
    // vectors: a stale resume would still read 16-dim embeddings.
    toks.map { t => (t, Array.fill(8)(rnd.nextGaussian().toFloat)) }
      .toDF("token", "vec").write.mode("overwrite").parquet(s"$dir/weights/vocab")
    val (kept2, _) = Pipeline.run(spark, Pipeline.parse(argv))
    assert(kept2.count() > 0)
    assert(spark.read.parquet(s"$dir/out/embeddings/data")
      .select("vec").head().getSeq[Float](0).length === 8,
      "re-exported weights must recompute embeddings, not resume stale ones")
    // --embed-weights without --semantic is rejected loudly
    val err = intercept[IllegalArgumentException] {
      Pipeline.parse(Array("--synth", "10", "--output", dir,
        "--embed-weights", s"$dir/weights"))
    }
    assert(err.getMessage.contains("--semantic"))
  }

  test("pipeline --semantic: embed/prune stages commit; pruned ids leave kept") {
    val out = java.nio.file.Files.createTempDirectory("sempipe").toString
    val args = Pipeline.Args(synth = 400, output = out,
      semantic = true, semK = 8, semEps = 0.05, semDim = 32)
    val (kept, _) = Pipeline.run(spark, args)
    assert(new java.io.File(s"$out/embeddings/_MANIFEST.json").exists())
    assert(new java.io.File(s"$out/sem_pruned/_MANIFEST.json").exists())
    val keptIds = kept.select(col("id")).collect().map(_.getLong(0)).toSet
    val removed = spark.read.parquet(s"$out/sem_pruned/data")
      .where(col("removed")).select(col("id")).collect().map(_.getLong(0)).toSet
    assert(removed.nonEmpty, "exact-dup texts embed identically -> cosine 1 -> pruned")
    assert(keptIds.intersect(removed).isEmpty, "semantic-pruned ids must not be kept")
    // resumes: second run reuses every stage (identical results)
    val (kept2, _) = Pipeline.run(spark, args)
    assert(kept2.select(col("id")).collect().map(_.getLong(0)).toSet === keptIds)
  }
}
