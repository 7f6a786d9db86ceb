package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Smoke + semantic checks of the driver-contract queries on sf0.001/sf0.01.
  * The authoritative correctness gate is the driver's DuckDB compare; these
  * assert the invariants the oracle SQL relies on. */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf001 = "/root/testdata/sf0.001"
  private val sf01 = "/root/testdata/sf0.01"

  test("entry: flagship dedup returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle-parity precondition: documents texts are [a-z0-9 ]-only, so \\W == ' '") {
    val bad = spark.read.parquet(s"$sf01/documents.parquet")
      .where(col("text").rlike("[^a-z0-9 ]")).count()
    assert(bad === 0L, "oracle SQL assumes space-only separators")
  }

  test("every query runs on sf0.001 and returns a deterministic schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf001)
      val n = df.count()
      assert(n >= 0, s"$name failed")
      info(f"$name%-24s rows=$n cols=${df.columns.mkString(",")}")
    }
  }

  test("every query has an oracle and vice versa (20/20 goal: no no_oracle rows)") {
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
  }

  test("q_fuzzy_assign finds exactly the brute-force trigram-Jaccard clusters (sf0.01)") {
    // the LSH+verify pipeline must agree with q_ngram_jaccard_pairs-derived
    // clusters — this is the in-engine version of the DuckDB oracle
    val pairs = SparkEntry.queries("q_ngram_jaccard_pairs")(spark, sf01)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length >= 20, s"expected planted near-dup pairs, got ${pairs.length}")
    val assign = SparkEntry.queries("q_fuzzy_assign")(spark, sf01)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recall: every true pair shares a component
    pairs.foreach { case (a, b) =>
      assert(assign(a) === assign(b), s"pair ($a,$b) not clustered")
    }
    // precision: docs sharing a component must appear in the pair graph
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val clustered = assign.filter { case (id, c) => c != id }.keySet ++
      assign.values.toSet.filter(c => assign.exists { case (i, cc) => cc == c && i != c })
    val falsePos = assign.groupBy(_._2).filter(_._2.size > 1).values.flatten.map(_._1)
      .filterNot(inPairs.contains)
    assert(falsePos.isEmpty, s"docs clustered without a true pair: $falsePos")
  }

  test("q_cc_chain component equals min doc_id per (lang, source) group") {
    val d = spark.read.parquet(s"$sf01/documents.parquet")
    val expect = d.select(col("doc_id"),
        min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("lang"), col("source")))
          .as("component"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("q_cc_chain")(spark, sf01)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
  }

  test("q_exact queries: all sf0.01 texts are distinct so nothing is removed") {
    val n = spark.read.parquet(s"$sf01/documents.parquet").count()
    assert(SparkEntry.queries("q_exact_kept")(spark, sf01).count() === n)
    assert(SparkEntry.queries("q_exact_dedup_rep")(spark, sf01).count() === n)
  }

  test("q_sim_histogram: deciles >= 7 sum to exactly the >=0.7 pair count") {
    // integer-exact cross-gate: decile >= 7 <=> inter*10 >= uni*7 <=> the
    // q_ngram_jaccard_pairs predicate, so the two independent plans must
    // agree on the mass above 0.7
    val hist = SparkEntry.queries("q_sim_histogram")(spark, sf01)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist.nonEmpty, "expected planted near-dup pairs in the histogram")
    assert(hist.keys.forall(d => d >= 5L && d <= 10L))
    val above07 = hist.filter(_._1 >= 7L).values.sum
    val pairs07 = SparkEntry.queries("q_ngram_jaccard_pairs")(spark, sf01).count()
    assert(above07 === pairs07)
  }

  test("q_dedup_summary: per-lang accounting reconciles with the kept set") {
    val rows = SparkEntry.queries("q_dedup_summary")(spark, sf01).collect()
    val nDocs = spark.read.parquet(s"$sf01/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    // texts are all distinct at sf0.01 (asserted above), so zero exact dups
    assert(rows.map(_.getAs[Long]("n_exact_dup")).sum === 0L)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_fuzzy_dup") + r.getAs[Long]("n_kept")
        === r.getAs[Long]("n_docs"))
    }
    val keptTotal = rows.map(_.getAs[Long]("n_kept")).sum
    assert(keptTotal === SparkEntry.queries("q_fuzzy_kept")(spark, sf01).count())
  }

  test("q_cross_lang_dup: planted xx-route copies surface as multi-lang components") {
    val rows = SparkEntry.queries("q_cross_lang_dup")(spark, sf01).collect()
    assert(rows.nonEmpty, "planted copies must create multi-lang components")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_langs") >= 2L)
      assert(r.getAs[Long]("n_docs") >= r.getAs[Long]("n_langs"))
    }
    // every component holding a planted copy (id >= offset) must be here:
    // copies are byte-identical to their original, so each copy's component
    // is multi-lang by construction
    val d = spark.read.parquet(s"$sf01/documents.parquet")
    val nCopies = d.where(col("doc_id") % 7 === 0 &&
      (regexp_count(lower(col("text")), lit("(?U)\\W")) + 1) >= 5).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum >= 2L * rows.length)
    assert(nCopies > 0L)
  }

  test("q_ann_topk: 3 neighbors per query, no self-matches") {
    val df = SparkEntry.queries("q_ann_topk")(spark, sf01).cache()
    val perQuery = df.groupBy(col("vec_id")).count().select("count")
      .distinct().collect().map(_.getLong(0)).toSeq
    assert(perQuery === Seq(3L))
    assert(df.where(col("vec_id") === col("neighbor_id")).count() === 0L)
  }
}
