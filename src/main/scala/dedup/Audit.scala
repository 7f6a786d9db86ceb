package dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pair-level dedup forensics: the "why were these two pages merged (or
  * not)?" tool a corpus owner reaches for when auditing a dedup run.
  * Answers with the ENGINE'S OWN numbers — the report is computed by the
  * same `Lsh.shingleSets` / `Lsh.bandKeys` / `SimHash.simhash64` /
  * `VerifyPairs.jaccardCounts` code the pipeline ran, so it can never
  * disagree with the pipeline about what happened.
  *
  * Scale shape: the two-row slice is an `isin` filter that pushes to the
  * parquet scan (no full read), and everything after is O(2 docs) — the
  * one sanctioned "collect" class, like `optimalParam` driver math.
  */
object Audit {

  /** All the numbers that decide a pair's fate, engine-true.
    *
    * @param jaccardPermille exact ⌊1000·|∩|/|∪|⌋ (integer, no float drift)
    * @param aboveThreshold  the verify gate's own integer-exact predicate
    * @param sharedBands     LSH bands where the two docs share a bucket —
    *                        0 means banding alone would NEVER candidate
    *                        them (they could still meet through SimHash,
    *                        suffix, or a chain of intermediates in CC)
    * @param hamming         64-bit SimHash fingerprint distance
    */
  case class PairReport(
      idA: Long, idB: Long,
      inter: Int, uni: Int, jaccardPermille: Int,
      aboveThreshold: Boolean,
      sharedBands: Int, totalBands: Int,
      hamming: Int)

  def explainPair(docs: DataFrame, a: Long, b: Long, cfg: DedupConfig): PairReport = {
    require(a != b, "explainPair needs two distinct ids")
    val spark = docs.sparkSession
    import spark.implicits._
    val two = docs.where(col(cfg.idCol).isin(a, b))
    val rows = Lsh.shingleSets(two, cfg).collect()
    // an id carried by several distinct contents (re-crawled url / hash
    // collision) would make the report nondeterministic — the same hazard
    // the pipeline's collision audit fails fast on; do the same here
    rows.groupBy(_.id).foreach { case (id, rs) =>
      require(rs.map(_.shingles.toSeq).distinct.length == 1,
        s"doc id $id carries ${rs.length} rows with distinct content " +
          "(re-crawled url or id collision) — resolve recrawls or re-key first")
    }
    val sets = rows.map(d => d.id -> d.shingles).toMap
    require(sets.contains(a) && sets.contains(b),
      s"both docs must exist and pass the min-length filter; " +
        s"eligible ids found: ${sets.keySet.toSeq.sorted.mkString(",")}")
    val (inter, uni) = VerifyPairs.jaccardCounts(sets(a), sets(b))
    val num = math.round(cfg.threshold * 1000000L)
    val bandRows = Lsh.bandKeys(
      spark.createDataset(Seq(DocShingles(a, sets(a)), DocShingles(b, sets(b)))), cfg)
      .collect()
    val byBand = bandRows.groupBy(_.band)
    val shared = byBand.values.count { rows =>
      rows.length == 2 && rows(0).bucket == rows(1).bucket
    }
    val ha = SimHash.simhash64(sets(a), cfg.seed)
    val hb = SimHash.simhash64(sets(b), cfg.seed)
    PairReport(
      idA = math.min(a, b), idB = math.max(a, b),
      inter = inter, uni = uni,
      jaccardPermille = if (uni == 0) 0 else ((inter.toLong * 1000L) / uni).toInt,
      aboveThreshold = inter.toLong * 1000000L >= num * uni.toLong,
      sharedBands = shared, totalBands = cfg.bandsRows._1,
      hamming = java.lang.Long.bitCount(ha ^ hb))
  }

  /** Pretty one-liner for logs/CLI. */
  def render(r: PairReport): String =
    f"pair(${r.idA},${r.idB}): jaccard=${r.jaccardPermille / 1000.0}%.3f " +
      f"(${r.inter}/${r.uni}) ${if (r.aboveThreshold) ">=" else "<"} threshold; " +
      f"bands ${r.sharedBands}/${r.totalBands} shared; simhash hamming ${r.hamming}"

  /** Semantic-pair forensics — the embedding-space twin of [[PairReport]],
    * engine-true via the same [[Ann]] primitives the semantic paths run.
    *
    * @param cosine          exact double cosine (what the verify stage
    *                        compares against the threshold)
    * @param bucketHamming   sign-LSH bucket distance in bits — candidates
    *                        are generated iff ≤ probeRadius, so
    *                        `reachable` says whether the LSH path could
    *                        have found this pair at all
    */
  case class VecPairReport(
      idA: Long, idB: Long,
      cosine: Double, aboveThreshold: Boolean,
      bucketA: Long, bucketB: Long, bucketHamming: Int,
      probeRadius: Int, reachable: Boolean)

  def explainVecPair(vectors: DataFrame, a: Long, b: Long,
      threshold: Double, dim: Int, nbits: Int = 8, seed: Long = 42L,
      probeRadius: Int = 2): VecPairReport = {
    require(a != b, "explainVecPair needs two distinct ids")
    val spark = vectors.sparkSession
    import spark.implicits._
    val rows = vectors
      .select(col("id").cast("long").as("id"), col("vec"))
      .where(col("id").isin(a, b))
      .as[(Long, Array[Float])].collect().toMap
    require(rows.contains(a) && rows.contains(b),
      s"both vectors must exist; found ids: ${rows.keySet.toSeq.sorted.mkString(",")}")
    val planes = Ann.hyperplanes(seed, nbits, dim)
    val ba = Ann.bucketOf(rows(a), planes, dim)
    val bb = Ann.bucketOf(rows(b), planes, dim)
    val ham = java.lang.Long.bitCount(ba ^ bb)
    var dp = 0.0; var na = 0.0; var nb = 0.0
    val va = rows(a); val vb = rows(b)
    val n = math.min(va.length, vb.length)
    var i = 0
    while (i < n) {
      dp += va(i).toDouble * vb(i); na += va(i).toDouble * va(i)
      nb += vb(i).toDouble * vb(i); i += 1
    }
    val cos = if (na == 0.0 || nb == 0.0) -1.0 else dp / math.sqrt(na * nb)
    VecPairReport(
      idA = math.min(a, b), idB = math.max(a, b),
      cosine = cos, aboveThreshold = cos >= threshold,
      bucketA = ba, bucketB = bb, bucketHamming = ham,
      probeRadius = probeRadius, reachable = ham <= probeRadius)
  }

  /** Pretty one-liner for the semantic report. */
  def render(r: VecPairReport): String =
    f"vecpair(${r.idA},${r.idB}): cosine=${r.cosine}%.4f " +
      f"${if (r.aboveThreshold) ">=" else "<"} threshold; " +
      f"buckets ${r.bucketA}%x vs ${r.bucketB}%x (hamming ${r.bucketHamming}, " +
      f"probe radius ${r.probeRadius} -> ${if (r.reachable) "reachable" else "NOT reachable"})"
}
