package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import dedup._

/** Driver contract — one query per implemented operator family from
  * SURVEY.md §2, over the driver-provided tables at
  * /root/testdata/sf&lt;N&gt;/(documents|embeddings).parquet.
  *
  * Coverage map (SURVEY.md §2 ids → query):
  *   S1 scan, P1 projection ............ every query
  *   A1/F5 exact dedup (md5 + min rep) . q_exact_dedup_rep
  *   J4/C7 anti-join removal ........... q_exact_kept, q_fuzzy_kept
  *   P2/F1 min-length filter ........... q_minlen_filter
  *   A6 group metrics .................. q_token_stats
  *   F2/V1 n-gram shingles + exact Jaccard ... q_ngram_jaccard_pairs
  *   C6 large-star/small-star CC ....... q_cc_chain (chain graph forces
  *                                       O(log n) rounds; SQL oracle)
  *   C1/C3/C4/A3-salted/V1/C6/C7 ....... q_fuzzy_assign / q_fuzzy_kept
  *                                       (flagship MinHash-LSH pipeline)
  *   C2/V2 SimHash + hamming ........... q_simhash_assign (rows-only)
  *   C3 banding keys ................... q_lsh_bands (rows-only)
  *   C8 suffix/winnowing stage ......... q_suffix_assign (rows-only)
  *   A8 window rank .................... q_dup_rank
  *   ANN brute force / LSH ............. q_ann_topk / q_ann_lsh
  *   embedding-cosine near-dup ......... q_embed_dedup
  *   text analysis ..................... q_quality, q_lang_id,
  *                                       q_fingerprint, q_token_bpe
  *
  * Non-SQL-expressible ops (MinHash signatures, SimHash, winnowing) have no
  * oracleSql and are verified in the ScalaTest suite against brute-force /
  * planted-ground-truth oracles instead (SURVEY.md §5).
  */
object SparkEntry {

  private def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Flagship config for the driver tables: documents carry trigram-level
    * near-dups (planted), so ngram=3; the rest is reference default
    * (threshold 0.7, min_length 5, num_perm 250, seed 42,
    * fuzzy_spark2.py:353-361). */
  private val docCfg = DedupConfig(
    idCol = "doc_id", textCol = "text",
    ngram = 3, minLength = 5, numPerm = 250, threshold = 0.7,
    seed = 42L, saltBuckets = 8, verify = true)

  /** Whitespace token count matching the DuckDB oracle's
    * len(string_split(text, ' ')) on this corpus (texts are [a-z0-9 ], so
    * unicode \W ≡ ' '); implemented with the engine tokenizer. */
  private val nTokens = udf { (text: String) =>
    if (text == null) 0L else TextNorm.tokenCount(text).toLong
  }

  /** Sorted-distinct word-trigram strings (engine shingler, string form for
    * exact oracle parity). */
  private val triGrams = udf { (text: String) =>
    if (text == null) Array.empty[String]
    else TextNorm.wordShingles(TextNorm.tokenize(text), 3, 5).toArray.distinct.sorted
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * full MinHash-LSH + verify + CC dedup, returning kept documents. */
  def entry(spark: SparkSession): DataFrame =
    FuzzyDedup.kept(documents(spark, "/root/testdata/sf0.001"), docCfg)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------------------------------------------------- exact dedup
    "q_exact_dedup_rep" -> ((s, dir) => {
      documents(s, dir)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("group_n"))
    }),
    "q_exact_kept" -> ((s, dir) => {
      ExactDedup.kept(documents(s, dir), idCol = "doc_id", textCol = "text")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    }),
    // -------------------------------------------------------------- filters
    "q_minlen_filter" -> ((s, dir) => {
      documents(s, dir)
        .select(col("doc_id"), nTokens(col("text")).as("n_tokens"))
        .where(col("n_tokens") >= 5)
    }),
    "q_token_stats" -> ((s, dir) => {
      documents(s, dir)
        .groupBy(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(nTokens(col("text"))).as("sum_tokens"),
          sum(length(col("text")).cast("long")).as("sum_chars"))
    }),
    // ------------------------------------------------- n-gram exact Jaccard
    "q_ngram_jaccard_pairs" -> ((s, dir) => {
      val g = documents(s, dir)
        .where(nTokens(col("text")) >= 5)
        .select(col("doc_id"), triGrams(col("text")).as("g"))
      val a = g.select(col("doc_id").as("id_a"), col("g").as("ga"))
      val b = g.select(col("doc_id").as("id_b"), col("g").as("gb"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("inter", size(array_intersect(col("ga"), col("gb"))).cast("long"))
        .withColumn("uni", (size(col("ga")) + size(col("gb"))).cast("long") - col("inter"))
        .where(col("inter") * 10 >= col("uni") * 7)
        .select(col("id_a"), col("id_b"), col("inter"), col("uni"))
    }),
    // ------------------------------------------------- connected components
    "q_cc_chain" -> ((s, dir) => {
      val d = documents(s, dir)
      val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
      val edges = d
        .select(col("doc_id").as("src"), lead(col("doc_id"), 1).over(w).as("dst"))
        .where(col("dst").isNotNull)
      val comps = ConnectedComponents.run(edges)
      ConnectedComponents.assignAll(d.select(col("doc_id").as("id")), comps)
    }),
    // --------------------------------------------------- flagship MinHash-LSH
    "q_fuzzy_assign" -> ((s, dir) =>
      FuzzyDedup.assignments(documents(s, dir), docCfg)),
    "q_fuzzy_kept" -> ((s, dir) => {
      FuzzyDedup.kept(documents(s, dir), docCfg)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    }),
    // ----------------------------------------------------- SimHash (no SQL)
    "q_simhash_assign" -> ((s, dir) => {
      val d = documents(s, dir)
      val sh = Lsh.shingleSets(d, docCfg)
      val edges = SimHash.verifiedEdges(sh, docCfg.copy(hammingK = 3))
      val comps = ConnectedComponents.runAdaptive(edges.select(col("src"), col("dst")))
      ConnectedComponents.assignAll(d.select(col("doc_id").as("id")), comps)
    }),
    "q_lsh_bands" -> ((s, dir) => {
      Lsh.bandKeys(Lsh.shingleSets(documents(s, dir), docCfg), docCfg).toDF()
    }),
    // ------------------------------------------------ suffix stage (no SQL)
    "q_suffix_assign" -> ((s, dir) => {
      val d = documents(s, dir)
      val edges = SuffixDedup.verifiedEdges(d, docCfg.copy(suffixMinRun = 120))
      val comps = ConnectedComponents.runAdaptive(edges.select(col("src"), col("dst")))
      ConnectedComponents.assignAll(d.select(col("doc_id").as("id")), comps)
    }),
    // ------------------------------------------------------------ window A8
    "q_dup_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      documents(s, dir)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 2)
        .select(col("lang"), col("source"), col("doc_id"), col("rnk"))
    }),
    // ------------------------------------------------------------------ ANN
    "q_ann_topk" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val q = e.where(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      Ann.bruteForceTopK(q, c, 3)
        .select(col("qid").as("vec_id"), col("rank").cast("long").as("rnk"),
          col("neighbor_id"))
    }),
    "q_ann_lsh" -> ((s, dir) => {
      val e = embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Ann.lshTopK(e, dim = 64, k = 3, nbits = 8, seed = 42L)
        .select(col("qid").as("vec_id"), col("rank").cast("long").as("rnk"),
          col("neighbor_id"))
    }),
    "q_embed_dedup" -> ((s, dir) => {
      val e = embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Ann.cosineDedupAssignments(e, 0.95)
    }),
    // -------------------------------------------------------- text analysis
    "q_quality" -> ((s, dir) => {
      TextAnalysis.qualityFeatures(documents(s, dir), "text")
        .select(col("doc_id"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("n_distinct_tokens").cast("long").as("n_distinct_tokens"),
          col("n_digits").cast("long").as("n_digits"),
          col("is_short").cast("long").as("is_short"))
    }),
    "q_lang_id" -> ((s, dir) => {
      documents(s, dir)
        .select(col("doc_id"), TextAnalysis.langIdUdf(col("text")).as("pred_lang"))
    }),
    "q_fingerprint" -> ((s, dir) => {
      documents(s, dir)
        .select(col("doc_id"), TextAnalysis.fingerprintUdf(col("text")).as("fp"))
    }),
    "q_token_bpe" -> ((s, dir) => {
      documents(s, dir)
        .select(col("doc_id"), TextAnalysis.tokenCountBpe(col("text")).cast("long").as("n_bpe"))
    }),
    // ------------------------------------------- multimodal binary column
    // (documents has no binary column; utf-8-encoding text stands in for
    // the html payload — the typed binary plumbing is what's exercised)
    "q_binary_meta" -> ((s, dir) => {
      val bin = documents(s, dir)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin"))
      Multimodal.describeBinary(bin, "doc_id", "bin")
        .select(col("id").as("doc_id"), col("n_bytes"), col("magic"))
    })
  )

  /** DuckDB-equivalent SQL per query (driver runs these on the same parquet
    * tables at sf0.01 and hash-compares). Texts in `documents` are
    * [a-z0-9 ]-only, so the engine tokenizer (unicode \W, empties kept)
    * coincides with string_split(text, ' ') — asserted in the test-suite.
    * All numeric outputs are BIGINT on both sides; no float columns are
    * oracle-compared (ANN outputs ranks, not sims). */
  def oracleSql: Map[String, String] = Map(
    "q_exact_dedup_rep" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS group_n
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q_exact_kept" ->
      """SELECT doc_id, lang, source, n_chars FROM
        |(SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS k FROM documents)
        |WHERE doc_id = k""".stripMargin,
    "q_minlen_filter" ->
      """SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
        |FROM documents WHERE len(string_split(text, ' ')) >= 5""".stripMargin,
    "q_token_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        |sum(len(string_split(text, ' ')))::BIGINT AS sum_tokens,
        |sum(length(text))::BIGINT AS sum_chars
        |FROM documents GROUP BY lang, source""".stripMargin,
    "q_ngram_jaccard_pairs" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5),
        |grams AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
        |  FROM toks),
        |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.g, b.g))::BIGINT AS inter,
        |  (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))::BIGINT AS uni
        |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, inter, uni FROM pairs WHERE inter * 10 >= uni * 7""".stripMargin,
    "q_cc_chain" ->
      """SELECT doc_id AS id, min(doc_id) OVER (PARTITION BY lang, source) AS component
        |FROM documents""".stripMargin,
    // the trigram-Jaccard>=0.7 graph on this corpus is a disjoint union of
    // cliques (planted near-dup clusters), so component = min(neighbors+self)
    "q_fuzzy_assign" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5),
        |grams AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
        |  FROM toks),
        |pairs AS (SELECT a.doc_id AS ia, b.doc_id AS ib FROM grams a JOIN grams b
        |  ON a.doc_id < b.doc_id
        |  AND len(list_intersect(a.g, b.g)) * 10 >=
        |      (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) * 7),
        |nbrs AS (SELECT ia AS id, ib AS nb FROM pairs UNION ALL SELECT ib, ia FROM pairs),
        |comp AS (SELECT id, min(nb) AS mn FROM nbrs GROUP BY id)
        |SELECT d.doc_id AS id, least(coalesce(c.mn, d.doc_id), d.doc_id) AS component
        |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id""".stripMargin,
    "q_fuzzy_kept" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5),
        |grams AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
        |  FROM toks),
        |pairs AS (SELECT a.doc_id AS ia, b.doc_id AS ib FROM grams a JOIN grams b
        |  ON a.doc_id < b.doc_id
        |  AND len(list_intersect(a.g, b.g)) * 10 >=
        |      (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) * 7),
        |nbrs AS (SELECT ia AS id, ib AS nb FROM pairs UNION ALL SELECT ib, ia FROM pairs),
        |comp AS (SELECT id, min(nb) AS mn FROM nbrs GROUP BY id)
        |SELECT d.doc_id, d.lang, d.source, d.n_chars
        |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
        |WHERE coalesce(c.mn, d.doc_id) >= d.doc_id""".stripMargin,
    "q_dup_rank" ->
      """SELECT lang, source, doc_id, rnk FROM
        |(SELECT lang, source, doc_id,
        |  row_number() OVER (PARTITION BY lang, source
        |                     ORDER BY n_chars DESC, doc_id ASC) AS rnk
        | FROM documents)
        |WHERE rnk <= 2""".stripMargin,
    "q_ann_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |scored AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |  list_cosine_similarity(a.v, b.v) AS sim
        |  FROM e a JOIN e b ON a.vec_id != b.vec_id WHERE a.vec_id < 50),
        |ranked AS (SELECT vec_id, neighbor_id,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS rnk
        |  FROM scored)
        |SELECT vec_id, rnk, neighbor_id FROM ranked WHERE rnk <= 3""".stripMargin,
    "q_embed_dedup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |nb AS (SELECT a.vec_id AS id, min(b.vec_id) AS mn FROM e a JOIN e b
        |  ON a.vec_id != b.vec_id AND list_cosine_similarity(a.v, b.v) >= 0.95
        |  GROUP BY a.vec_id)
        |SELECT e.vec_id AS id, least(coalesce(nb.mn, e.vec_id), e.vec_id) AS component
        |FROM e LEFT JOIN nb ON e.vec_id = nb.id""".stripMargin,
    // texts are ascii ([a-z0-9 ]) so utf-8 byte length == char length; no
    // magic prefix matches -> constant 'bin'
    "q_binary_meta" ->
      """SELECT doc_id, length(text)::BIGINT AS n_bytes, 'bin' AS magic
        |FROM documents""".stripMargin,
    "q_quality" ->
      """SELECT doc_id,
        |len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens,
        |len(list_distinct(string_split_regex(trim(text), '\s+')))::BIGINT AS n_distinct_tokens,
        |(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::BIGINT AS n_digits,
        |(len(string_split_regex(trim(text), '\s+')) < 5)::BIGINT AS is_short
        |FROM documents""".stripMargin
  )
}
