package dedup

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** 64-bit SimHash fingerprints + banded candidate generation (north_rule;
  * the reference only cites simhash-py/simhash-cpp as inspiration,
  * README.md:24 — no implementation exists there, so this is from the
  * public algorithm: Charikar, "Similarity estimation techniques from
  * rounding algorithms", STOC'02).
  *
  * Each shingle hash is remixed to 64 bits (xxh64 of its 4 LE bytes) and
  * votes ±1 per bit position; the fingerprint's bit i is the vote sign.
  * Candidates: the fingerprint is cut into `blocks` contiguous blocks — by
  * pigeonhole, two fingerprints within hamming distance k < blocks share at
  * least one exact block, so grouping per (block, bits) finds every pair
  * within radius blocks−1. Groups reuse the salted star-edge machinery
  * (Lsh.starEdges); pairs are then *exactly* verified with
  * bit_count(xor) ≤ k (VerifyPairs.verifyHamming).
  */
object SimHash {

  def simhash64(shingles: Array[Int], seed: Long): Long = {
    val votes = new Array[Int](64)
    var j = 0
    while (j < shingles.length) {
      val h = Hashes.xxh64Long(shingles(j).toLong & 0xFFFFFFFFL, seed)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  /** shingle sets → (id, fp) fingerprints. */
  def fingerprints(shingles: Dataset[DocShingles], seed: Long): DataFrame = {
    val spark = shingles.sparkSession
    import spark.implicits._
    shingles
      .map(ds => (ds.id, simhash64(ds.shingles, seed)))
      .toDF("id", "fp")
  }

  /** (id, fp) → banded candidate keys: `blocks` bands, block b =
    * the b-th 64/blocks-bit slice. Guarantees recall 1.0 for hamming ≤
    * blocks−1 (pigeonhole). */
  def bandKeys(fps: DataFrame, blocks: Int): Dataset[BandKey] = {
    val spark = fps.sparkSession
    import spark.implicits._
    require(64 % blocks == 0, s"blocks must divide 64, got $blocks")
    val width = 64 / blocks
    val mask = if (width == 64) -1L else (1L << width) - 1L
    fps.select(col("id").cast("long"), col("fp").cast("long")).as[(Long, Long)]
      .flatMap { case (id, fp) =>
        (0 until blocks).map { b =>
          BandKey(id, b, (fp >>> (b * width)) & mask)
        }
      }
  }

  /** Pigeonhole band count for a hamming-≤ k guarantee: k+1 blocks (a
    * pair within hamming k shares at least one untouched block), rounded
    * up to the next divisor of 64 so blocks tile the fingerprint exactly.
    * The ONE policy for every 64-bit fingerprint family (text SimHash,
    * image dHash, audio energy hash). */
  def blocksFor(hammingK: Int): Int =
    math.max(2, hammingK + 1) match {
      case b if 64 % b == 0 => b
      case b => Seq(4, 8, 16, 32).find(_ >= b).getOrElse(64)
    }

  /** Full SimHash dedup candidate+verify pass: docs' shingle sets →
    * verified edges with hamming ≤ k. */
  def verifiedEdges(
      shingles: Dataset[DocShingles],
      cfg: DedupConfig): DataFrame = {
    val blocks = blocksFor(cfg.hammingK)
    val fps = fingerprints(shingles, cfg.seed).localCheckpoint()
    val cand = Lsh.groupEdges(bandKeys(fps, blocks), cfg.saltBuckets,
      cfg.allPairsCap, cfg.chainEdges)
    VerifyPairs.verifyHamming(cand, fps, cfg.hammingK)
  }
}
