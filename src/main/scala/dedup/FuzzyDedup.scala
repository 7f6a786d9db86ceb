package dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The flagship MinHash-LSH near-dup pipeline (reference fuzzy_spark2.py
  * end-to-end trace, SURVEY.md §3.1), Spark-first:
  *
  *   docs → shingle sets (typed mapPartitions, min-length filter inside)
  *        → MinHash lanes → LSH band keys → salted star edges
  *        → exact-Jaccard verification (north_rule; reference skips it)
  *        → large-star/small-star connected components
  *        → assignment (component = min id; uniques = self)
  *        → kept = representative filter via left-anti join.
  *
  * Everything stays in Dataset/DataFrame land — predicate pushdown, column
  * pruning and AQE all apply (the reference's `.rdd.flatMap` drop defeats
  * them, fuzzy_spark2.py:607-619).
  *
  * Topology note: candidates are *star* edges (bucket member → bucket min),
  * linear in bucket size — a hot bucket never materializes quadratic pairs.
  * Verification prunes star edges, so a pair (b,c) whose shared buckets are
  * all hubbed by a non-duplicate smaller id could be lost; with r ≈ 10
  * agreeing lanes per bucket a false-positive hub needs jaccard^10-level
  * collisions (~1e-5) — the recall gate (≥0.99) absorbs it and the
  * test-suite measures it against a brute-force oracle.
  */
object FuzzyDedup {

  case class Result(
      shingles: org.apache.spark.sql.Dataset[DocShingles],
      candidates: DataFrame, // (src, dst) LSH star edges
      edges: DataFrame,      // verified (or pass-through) edges
      assignments: DataFrame // (id, component) for every doc that passed min-length
  )

  /** Run candidate generation + verification + clustering. `extraEdges`
    * lets the SimHash / suffix stages feed the same component resolution
    * (SURVEY.md §7 slices 3-4). */
  def run(docs: DataFrame, cfg: DedupConfig, extraEdges: Seq[DataFrame] = Nil): Result = {
    // shingle sets are read by banding and twice by verification — persist
    // once (the reference's persist(DISK_ONLY) at fuzzy_spark2.py:576)
    val shingles = Lsh.shingleSets(docs, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // groupEdgesBatched honors cfg.bandsPerPass (banding memory envelope);
    // one-shot banding when 0
    val candidates = Lsh.groupEdgesBatched(shingles, cfg)
    val verified =
      if (cfg.verify) VerifyPairs.verifyJaccard(candidates, shingles, cfg.threshold)
        .select(col("src"), col("dst"))
      else candidates
    val allEdges = extraEdges.foldLeft(verified) { (acc, e) =>
      acc.unionByName(e.select(col("src"), col("dst")))
    }
    val components = ConnectedComponents.runAdaptive(allEdges)
    // runAdaptive is eager (localCheckpoint + count materialize the whole
    // edge pipeline), so the shingle cache has served its last read here —
    // release it instead of leaking one cache per run (VERDICT #8)
    shingles.unpersist(blocking = false)
    val ids = docs.select(col(cfg.idCol).cast("long").as("id"))
    val assignments = ConnectedComponents.assignAll(ids, components)
    Result(shingles, candidates, verified, assignments)
  }

  /** (id, component) for every doc in `docs`. */
  def assignments(docs: DataFrame, cfg: DedupConfig): DataFrame =
    run(docs, cfg).assignments

  /** Rows kept: one representative (the min id) per duplicate cluster,
    * plus all uniques — reference keep-null-or-self filter + anti-join
    * (fuzzy_spark2.py:692-697, fuzzy multi gpu/removal.py:19-36). */
  def kept(docs: DataFrame, cfg: DedupConfig): DataFrame = {
    val removal = assignments(docs, cfg)
      .where(col("id") =!= col("component"))
      .select(col("id").as(cfg.idCol))
    docs.join(removal, Seq(cfg.idCol), "left_anti")
  }

  /** QUALITY-WEIGHTED representative selection: given cluster assignments
    * (id, component) and a numeric quality score per doc, the kept id per
    * cluster is the argmax of (quality, then MIN id as the deterministic
    * tie-break) — "keep the best copy", the production alternative to the
    * reference's arbitrary min-id rule (a near-dup cluster's members
    * differ in truncation, boilerplate and extraction quality; min-id
    * throws that information away).
    *
    * Input `scored`: (id, quality) — quality any numeric column (token
    * count, Gopher/char-LM score, PageRank of the host…). Returns one row
    * per component: (component, keep_id, quality, group_n).
    *
    * Scale shape: a single partial-aggregating groupBy on component —
    * max_by/count combine map-side, so the 10M-member boilerplate cluster
    * costs one reduce key, never a window over its rows and never a
    * collect. (min_by over (-quality, id) = highest quality, then lowest
    * id; quality is cast to double for the negation so any numeric input
    * column works.) */
  def bestRepresentatives(assign: DataFrame, scored: DataFrame): DataFrame = {
    val joined = assign.select(col("id"), col("component"))
      .join(scored.select(col("id"), col("quality").cast("double").as("q")), "id")
    joined.groupBy("component")
      .agg(
        min_by(col("id"), struct((-col("q")).as("nq"), col("id"))).as("keep_id"),
        max(col("q")).as("quality"),
        count(lit(1)).as("group_n"))
  }

  /** SOFT dedup: duplicate-aware reweighting instead of removal. Every
    * doc keeps a training weight 1/|its cluster| in integer ppm (one
    * canonical truncating division, SQL-replayable) — a cluster of m
    * near-identical pages contributes ~one doc's worth of gradient in
    * aggregate while keeping its internal variation available, the
    * retain-and-downweight alternative the hard `kept` rule discards
    * (cf. SoftDedup-style duplicate-aware sampling; the reference has
    * removal only). Input: (id, component) from [[assignments]].
    * Returns (id, component, csize, weight_ppm).
    *
    * Scale shape: one partial-aggregating groupBy on component (the
    * 10M-member boilerplate cluster is one reduce key) and an
    * AQE-skew-splittable equi-join back — never a window over cluster
    * members. */
  def softWeights(assign: DataFrame): DataFrame = {
    val sizes = assign.groupBy(col("component"))
      .agg(count(lit(1)).as("csize"))
    assign.select(col("id"), col("component"))
      .join(sizes, "component")
      .withColumn("weight_ppm", expr("1000000 DIV csize"))
      .select(col("id"), col("component"), col("csize"), col("weight_ppm"))
  }
}
