package dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via global-frequency token ordering +
  * prefix filtering — the recall-1.0 complement of the MinHash-LSH path.
  *
  * The reference finds near-dup pairs probabilistically (MinHash banding,
  * fuzzy_spark2.py:607-623; measured flagship recall 0.998). This operator
  * returns EVERY pair with Jaccard ≥ t, guaranteed, without an all-pairs
  * join — the AllPairs/PPJoin family (Bayardo et al., WWW'07 "Scaling Up
  * All Pairs Similarity Search"; Vernica et al., SIGMOD'10 gives the
  * MapReduce shape re-expressed here as DataFrame ops):
  *
  *   1. one `groupBy(token)` pass computes document frequencies;
  *   2. each doc's distinct tokens are ordered by (df asc, token asc) — a
  *      single global total order, rarest first;
  *   3. prefix filter: if jaccard(a,b) ≥ t then |a∩b| ≥ ⌈t·|a|⌉ (union ⊇ a),
  *      so the first |a| − ⌈t·|a|⌉ + 1 ordered tokens of a and the
  *      corresponding prefix of b must share at least one token — docs are
  *      joined only on PREFIX tokens, which are by construction the rarest
  *      in the corpus (a stopword shared by every doc sorts to the END of
  *      every list and never generates a candidate);
  *   4. length filter: min(|a|,|b|) ≥ t·max(|a|,|b|) or jaccard < t;
  *   5. surviving candidates verify with exact (inter, uni) counts.
  *
  * All thresholds are integer-exact (×10^6 rationals, like VerifyPairs):
  * the prefix length uses α = ⌈num·len / 10^6⌉ via integer DIV, and the
  * verify predicate is inter·10^6 ≥ num·uni — no float boundary anywhere,
  * so results are bit-identical to a brute-force oracle.
  *
  * Scale shape (100 TB): shuffles are all narrow and keyed — df count
  * (token), ordering join (token) + re-group (id), prefix equi-join
  * (token), verify joins (id). No cartesian anywhere; candidate volume is
  * Σ_prefix-token df², concentrated on rare tokens. The inherent cost
  * floor is the TRUE output: a cluster of m mutual near-dups yields m²/2
  * pairs no matter the algorithm — so since round 4, `pairs`,
  * `containmentPairs` and `dropContained` COLLAPSE byte-identical token
  * sets to one representative first (the exact-dedup-first composition
  * this paragraph always prescribed), run the join over distinct variants
  * only, and expand group members back algebraically (identical sets have
  * identical similarity to everything, so the expansion is exact, not a
  * heuristic). Residual hot prefix tokens are handled by AQE skew-join
  * splitting, and `dfCap` optionally drops tokens above a df ceiling from
  * JOIN KEYS only (they stay in the sets for verification): with t and max
  * doc length L, a token with df > cap can only be a prefix token of docs
  * where it ranks among the rarest — capping trades bounded recall for a
  * hard candidate bound and is OFF by default (exactness is this
  * operator's contract). With the round-4 collapse, df counts DISTINCT
  * VARIANTS (reps), not raw docs — the stable definition under exact-dup
  * inflation — and identical-set pairs are immune to the cap entirely
  * (they come from the collapse, not the token join).
  */
object SSJoin {

  /** tokSets(id, toks) → (id, toks, len): distinct tokens ordered by the
    * global (document-frequency asc, token asc) total order. Token type is
    * any orderable Spark type (string, int, long). */
  def orderedTokenSets(tokSets: DataFrame): DataFrame = {
    val ex = tokSets
      .select(col("id").cast("long").as("id"),
        explode(array_distinct(col("toks"))).as("tok"))
    val df = ex.groupBy("tok").agg(count(lit(1)).as("df"))
    ex.join(df, "tok")
      .groupBy("id")
      .agg(transform(
        array_sort(collect_list(struct(col("df"), col("tok")))),
        x => x.getField("tok")).as("toks"))
      .withColumn("len", size(col("toks")))
  }

  private def prefixed(ordered: DataFrame, threshold: Double): DataFrame = {
    val num = math.round(threshold * 1000000L)
    // α = ⌈num·len / 10^6⌉ by integer arithmetic; prefix p = len − α + 1.
    // num ≤ 10^6 ⇒ α ≤ len ⇒ p ≥ 1: every non-empty set emits a prefix.
    ordered
      .withColumn("p",
        (col("len") - expr(s"($num * len + 999999) DIV 1000000") + 1).cast("int"))
      .select(col("id"), col("len"), explode(slice(col("toks"), lit(1), col("p"))).as("tok"))
  }

  /** Candidate (id_a < id_b) pairs after prefix + length filtering — a
    * provable SUPERSET of the true ≥-threshold pairs (prefix-filter
    * theorem), exposed for tests and candidate-volume audits. Operates on
    * the raw (uncollapsed) sets. */
  def candidates(tokSets: DataFrame, threshold: Double, dfCap: Long = 0L): DataFrame =
    candidatesFromOrdered(orderedTokenSets(tokSets), threshold, dfCap)

  private def candidatesFromOrdered(
      ordered: DataFrame, threshold: Double, dfCap: Long): DataFrame = {
    val num = math.round(threshold * 1000000L)
    val pre0 = prefixed(ordered, threshold)
    val pre =
      if (dfCap <= 0L) pre0
      else {
        // df recomputed over prefix rows only is NOT the corpus df; join
        // the true df back instead (ordered.toks are already distinct, so
        // one count per (doc, token) — the same df the ordering used).
        val df = ordered.select(explode(col("toks")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("df"))
        pre0.join(df.where(col("df") <= dfCap).select("tok"), Seq("tok"))
      }
    val a = pre.select(col("id").as("id_a"), col("len").as("la"), col("tok"))
    val b = pre.select(col("id").as("id_b"), col("len").as("lb"), col("tok"))
    a.join(b, Seq("tok"))
      .where(col("id_a") < col("id_b"))
      // length filter: jaccard ≥ t needs min(la,lb)·10^6 ≥ num·max(la,lb)
      .where(least(col("la"), col("lb")) * 1000000L >=
        lit(num) * greatest(col("la"), col("lb")))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  // ------------------------------------------------------------------------
  // Exact-duplicate pre-collapse (the dedup-first composition).
  // ------------------------------------------------------------------------

  /** `reps`: (id, toks) — one row per DISTINCT token set, id = min member
    * id, toks sorted-distinct. `members`: (id, gid, gcnt, glen) — every
    * input doc with its group representative, group size and set size. */
  private[dedup] case class Collapsed(reps: DataFrame, members: DataFrame)

  /** Group docs by their exact (sorted-distinct) token set, as a
    * partial-aggregated `groupBy` plus a hash-keyed join-back — NOT a
    * window over the set key. A `Window.partitionBy(ktoks)` has no
    * map-side combine and no AQE skew splitting, so at web scale the most
    * common identical sets (empty pages, boilerplate templates, 10⁶-10⁸
    * members each) would land every member row WITH its full token array
    * on a single window task. Here each map task emits at most one row
    * per distinct set into the groupBy shuffle (bounded reduce-side fan-in
    * = #map tasks per group), and the members join-back runs on the 8-byte
    * xxhash64 of the set — an equi-join AQE can skew-split — with
    * membership confirmed by exact array equality so a hash collision can
    * never merge distinct sets. The collapse stays exact for any token
    * type, and still turns m identical docs into 1 join participant. */
  private[dedup] def collapseExact(tokSets: DataFrame): Collapsed = {
    val sets = tokSets.select(col("id").cast("long").as("id"),
      array_sort(array_distinct(col("toks"))).as("ktoks"))
    val groups = sets
      .groupBy(col("ktoks"))
      .agg(min(col("id")).as("gid"), count(lit(1)).as("gcnt"))
      .withColumn("kh", xxhash64(col("ktoks")))
    val members = sets
      .withColumn("kh", xxhash64(col("ktoks")))
      .join(groups.select(col("kh"), col("ktoks").as("gtoks"),
        col("gid"), col("gcnt")), Seq("kh"))
      .where(col("ktoks") === col("gtoks"))
      .select(col("id"), col("gid"), col("gcnt"),
        size(col("ktoks")).cast("long").as("glen"))
    Collapsed(
      reps = groups.select(col("gid").as("id"), col("ktoks").as("toks")),
      members = members)
  }

  /** Jaccard pairs over already-distinct sets (rep ids): (id_a < id_b,
    * inter, uni). The ordered-token exchange is one canonicalized subtree
    * consumed three times (prefix, verify-a, verify-b) — Spark's
    * ReuseExchange computes it once per stage run. Candidate side
    * (16 B/row) is the hash-build side, sets stream past (same build-side
    * argument as VerifyPairs.verifyJaccard). */
  private def pairsCore(repSets: DataFrame, threshold: Double): DataFrame = {
    val num = math.round(threshold * 1000000L)
    val ordered = orderedTokenSets(repSets)
    val cand = candidatesFromOrdered(ordered, threshold, dfCap = 0L)
    val s1 = ordered.select(col("id").as("id_a"), col("toks").as("ta"))
    val s2 = ordered.select(col("id").as("id_b"), col("toks").as("tb"))
    cand.hint("shuffle_hash").join(s1, "id_a")
      .hint("shuffle_hash").join(s2, "id_b")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("uni",
        (size(col("ta")) + size(col("tb"))).cast("long") - col("inter"))
      .where(col("inter") * 1000000L >= lit(num) * col("uni"))
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"))
  }

  /** Every pair with jaccard ≥ threshold, as (id_a < id_b, inter, uni) —
    * exact counts, bit-identical to brute force (SSJoinSpec pins this;
    * the q_ngram_jaccard_pairs driver row runs this plan against DuckDB's
    * brute-force recomputation). Since round 4 the join itself runs over
    * DISTINCT sets only; members of an identical-set group are expanded
    * back exactly (cross-group pairs inherit the rep pair's (inter, uni);
    * within-group pairs have jaccard 1 with inter = uni = |set|, and a
    * non-empty set qualifies at any threshold ≤ 1). */
  def pairs(tokSets: DataFrame, threshold: Double): DataFrame = {
    val num = math.round(threshold * 1000000L)
    val c = collapseExact(tokSets)
    val rp = pairsCore(c.reps, threshold)
    expandMembers(c, rp, num, Seq("inter", "uni"), symmetric = true)
  }

  /** Expand rep-level pairs back to the members of identical-set groups —
    * the one expansion rule shared by [[pairs]], [[containmentPairs]] and
    * [[containmentAnalysis]]. For a SYMMETRIC measure (jaccard) the member
    * pair is re-normalized id_a < id_b (rep ids satisfy gid_a < gid_b but
    * member ids need the swap; the carried columns are symmetric so it is
    * free) and within-group pairs emit each unordered pair once; for a
    * DIRECTIONAL measure (containment) the (a in b) orientation is kept
    * verbatim and within-group ordered pairs emit both directions. `carry`
    * = the measure columns that ride the rep pair unchanged; within-group
    * pairs set every carry column to glen (identical non-empty sets:
    * inter = uni = len_a = |set|, qualifying at any threshold ≤ 1). */
  private def expandMembers(c: Collapsed, rp: DataFrame, num: Long,
      carry: Seq[String], symmetric: Boolean): DataFrame = {
    val ma = c.members.select(col("gid").as("id_a"), col("id").as("ma"))
    val mb = c.members.select(col("gid").as("id_b"), col("id").as("mb"))
    val (ca, cb) =
      if (symmetric) (least(col("ma"), col("mb")), greatest(col("ma"), col("mb")))
      else (col("ma"), col("mb"))
    val cross = rp.join(ma, "id_a").join(mb, "id_b")
      .select(ca.as("id_a") +: cb.as("id_b") +: carry.map(col): _*)
    val within = c.members
      .where(col("gcnt") > 1 && col("glen") > 0 && lit(num) <= 1000000L)
    val cond = if (symmetric) col("ma") < col("mb") else col("ma") =!= col("mb")
    val wpairs = within.select(col("gid"), col("id").as("ma"), col("glen"))
      .join(within.select(col("gid"), col("id").as("mb")), "gid")
      .where(cond)
      .select(col("ma").as("id_a") +: col("mb").as("id_b") +:
        carry.map(name => col("glen").as(name)): _*)
    cross.unionByName(wpairs)
  }

  /** Containment pairs over already-distinct sets (rep ids), WITH both
    * lengths: (id_a, id_b, inter, len_a, len_b). len_b rides along for
    * free (the verify join already holds tb) so `dropContained` never
    * re-runs the ordering stage for the b side. */
  private def containmentPairsCore(
      repSets: DataFrame, threshold: Double, dfCap: Long): DataFrame = {
    val num = math.round(threshold * 1000000L)
    val ordered = orderedTokenSets(repSets)
    val pre0 = prefixed(ordered, threshold)
    val idx0 = ordered.select(col("id").as("id_b"), explode(col("toks")).as("tok"))
    val (pre, idx) =
      if (dfCap <= 0L) (pre0, idx0)
      else {
        val ok = ordered.select(explode(col("toks")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("df"))
          .where(col("df") <= dfCap).select("tok")
        (pre0.join(ok, Seq("tok")), idx0.join(ok, Seq("tok")))
      }
    val cand = pre.select(col("id").as("id_a"), col("tok"))
      .join(idx, Seq("tok"))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val s1 = ordered.select(col("id").as("id_a"), col("toks").as("ta"))
    val s2 = ordered.select(col("id").as("id_b"), col("toks").as("tb"))
    cand.hint("shuffle_hash").join(s1, "id_a")
      .hint("shuffle_hash").join(s2, "id_b")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("len_a", size(col("ta")).cast("long"))
      .withColumn("len_b", size(col("tb")).cast("long"))
      .where(col("inter") * 1000000L >= lit(num) * col("len_a"))
      .select(col("id_a"), col("id_b"), col("inter"), col("len_a"), col("len_b"))
  }

  /** Exact CONTAINMENT-similarity join: every ordered pair (a, b) with
    * |a∩b| / |a| ≥ threshold, a ≠ b — "a is (mostly) contained in b".
    *
    * This is the asymmetric predicate Jaccard-based dedup structurally
    * misses: a 200-token wire story quoted verbatim inside a 5,000-token
    * page has containment 1.0 but Jaccard ≈ 0.04 — invisible to MinHash
    * banding at any useful threshold (the reference has no counterpart;
    * its suffix stage catches only EXACT long runs). Same prefix-filter
    * argument as `pairs`: I ≥ ⌈t·|a|⌉ forces a's
    * (|a| − ⌈t·|a|⌉ + 1)-prefix to intersect a∩b ⊆ b, so a's prefix
    * tokens are joined against the FULL token index of the corpus (no
    * length filter — sizes legitimately differ wildly; no prefix on the
    * b side — containment puts no lower bound on |a∩b|/|b|).
    *
    * Skew note: the index side carries every (token, doc) row, so a
    * stopword-heavy PROBE prefix meets a stopword's full df. df ordering
    * makes that rare (a stopword enters a prefix only when a doc has
    * almost nothing rarer); `dfCap` bounds the worst case by dropping
    * tokens with df > cap from the JOIN only — recall then degrades only
    * for probe docs whose prefix is entirely corpus-hot, the honest
    * trade at 10¹² docs. Exact-dup groups are collapsed before the join
    * and expanded exactly after it (identical sets ⇒ identical
    * containment both ways). Output (id_a, id_b, inter, len_a). */
  def containmentPairs(
      tokSets: DataFrame, threshold: Double, dfCap: Long = 0L): DataFrame = {
    val num = math.round(threshold * 1000000L)
    val c = collapseExact(tokSets)
    val rp = containmentPairsCore(c.reps, threshold, dfCap)
    // containment is directional and constant across identical-set members
    expandMembers(c, rp, num, Seq("inter", "len_a"), symmetric = false)
  }

  /** CONTAINMENT dedup (subset/quote removal): drop every doc that is
    * ≥ threshold contained in ANY other doc that is strictly larger, or
    * equal-sized with a smaller id (the deterministic tie-break that also
    * resolves mutual containment = near-identical sets). The "any other
    * doc" rule is deliberate — containment is not transitive at a
    * threshold, so dropping against surviving containers only would be
    * order-dependent; this form is deterministic and matches the common
    * subset-removal semantics. Returns the kept ids.
    *
    * Round 4: computed entirely at the collapsed-group level — the drop
    * rule decomposes exactly over identical-set groups (every non-min
    * member of a group drops against its own min; a whole group drops if
    * any strictly-larger container pair exists; for equal-size cross-group
    * pairs a member drops iff the smallest qualifying foreign member id —
    * which IS that group's gid — is below its own id), so the expensive
    * join runs once over distinct variants and the b-side length comes
    * from the pairs themselves (no second ordering pass). */
  def dropContained(tokSets: DataFrame, threshold: Double, dfCap: Long = 0L): DataFrame = {
    val num = math.round(threshold * 1000000L)
    val c = collapseExact(tokSets)
    val rp = containmentPairsCore(c.reps, threshold, dfCap)
    dropContainedFromPairs(tokSets, c, rp, num)
  }

  /** Drop rule over precomputed rep-level pairs — lets a pipeline stage
    * that already materialized `containmentPairsCore` output (via
    * [[containmentAnalysis]]) derive the kept set without replaying the
    * join. */
  private def dropContainedFromPairs(
      tokSets: DataFrame, c: Collapsed, repPairs: DataFrame, num: Long): DataFrame = {
    // any strictly-larger container ⇒ the whole group of a drops
    val dropAll = repPairs.where(col("len_b") > col("len_a"))
      .select(col("id_a").as("gid")).distinct()
    val d1 = c.members.join(dropAll, "gid").select(col("id"))
    // equal-size cross-group: member a drops iff min foreign member id
    // (= gid_b) over qualifying groups < id_a
    val eqMin = repPairs.where(col("len_b") === col("len_a"))
      .groupBy("id_a").agg(min(col("id_b")).as("minb"))
      .withColumnRenamed("id_a", "gid")
    val d2 = c.members.join(eqMin, "gid")
      .where(col("minb") < col("id")).select(col("id"))
    // within-group: identical non-empty sets ⇒ everything but the min drops
    val d3 = c.members
      .where(col("gcnt") > 1 && col("glen") > 0 && lit(num) <= 1000000L &&
        col("id") =!= col("gid"))
      .select(col("id"))
    val drops = d1.unionByName(d2).unionByName(d3).distinct()
    tokSets.select(col("id")).join(drops, Seq("id"), "left_anti")
  }

  /** One-pass containment stage for the pipeline: returns (pairs, kept)
    * sharing a single collapse + prefix-join subtree — the composition the
    * scale doc prescribes (exact-dedup first, one join, both outputs). */
  def containmentAnalysis(
      tokSets: DataFrame, threshold: Double, dfCap: Long = 0L): (DataFrame, DataFrame) = {
    val num = math.round(threshold * 1000000L)
    val c = collapseExact(tokSets)
    val rp = containmentPairsCore(c.reps, threshold, dfCap)
      .localCheckpoint(eager = false)
    (expandMembers(c, rp, num, Seq("inter", "len_a"), symmetric = false),
      dropContainedFromPairs(tokSets, c, rp, num))
  }

  /** Exact fuzzy-dedup assignments: the flagship's shingle sets through the
    * exact join instead of MinHash banding — recall 1.0 by construction,
    * same output contract as FuzzyDedup.assignments (id, component=min of
    * cluster). The drop-in for corpora where the 0.002 LSH miss rate is
    * unacceptable (e.g. benchmark decontamination). */
  def assignments(docs: DataFrame, cfg: DedupConfig): DataFrame = {
    val spark = docs.sparkSession
    val tokSets = Lsh.shingleSets(docs, cfg).toDF()
      .select(col("id"), col("shingles").as("toks"))
    val edges = pairs(tokSets, cfg.threshold)
      .select(greatest(col("id_a"), col("id_b")).as("src"),
        least(col("id_a"), col("id_b")).as("dst"))
    val comps = ConnectedComponents.runAdaptive(edges)
    ConnectedComponents.assignAll(
      docs.select(col(cfg.idCol).cast("long").as("id")), comps)
  }
}
