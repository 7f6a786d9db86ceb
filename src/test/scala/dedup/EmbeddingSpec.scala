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
