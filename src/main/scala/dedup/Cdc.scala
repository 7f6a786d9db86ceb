package dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) dedup — the STORAGE-level dedup family
  * (gear rolling hash, the FastCDC/LBFS lineage): chunk every blob at
  * content-determined boundaries, key chunks by content, and account
  * per-blob how many chunk-bytes are duplicates of chunks seen earlier
  * in the corpus. This is the layer BELOW document dedup: two crawl
  * snapshots of a site, or a corpus stored twice with small edits, share
  * most chunks even when no document-level pass fires — a chunk store
  * (or a dedup-aware object store) would keep one copy. The operator
  * answers "how much storage does this corpus actually need?" the same
  * way q_dedup_summary answers it for documents.
  *
  * Hash design (deliberately SQL-replayable, the q_sim_histogram
  * discipline): gear(b) = ((b+1) · 2654435761) mod 2³², rolled as
  * h ← (2h + gear(b)) mod 2³². The shift-by-one forgets bytes older
  * than 32 positions, so chunking is self-synchronizing: after ≥32
  * shared bytes, identical content produces identical boundaries
  * regardless of what preceded it — the property that makes CDC find
  * shifted duplicates where fixed-size blocks cannot. A boundary falls
  * AFTER byte i when (h_i mod 2^maskBits) = 0, giving 2^maskBits-byte
  * expected chunks.
  *
  * Scale shape (100 TB): chunking is one zero-shuffle mapPartitions pass
  * (explode to one row per chunk, 16 bytes + offsets); first-occurrence
  * accounting is ONE partial-agg groupBy(chunkKey) — a chunk repeated
  * 10⁹ times pre-combines map-side — and an equi-join back on the key
  * (AQE absorbs hot-chunk skew). No window over a global order, no
  * driver-side state. Reference has no counterpart (its unit is the
  * document); standard in the storage literature (LBFS SOSP'01, FastCDC
  * ATC'16 — public papers, algorithm re-derived here).
  */
object Cdc {

  /** SQL-replayable gear value for one byte. */
  @inline private[dedup] def gearOf(b: Int): Long =
    (((b & 0xFF) + 1).toLong * 2654435761L) & 0xFFFFFFFFL

  /** Chunk (offset, length) list for one blob. `minSize`/`maxSize` bound
    * chunk sizes for production use (a pathological blob whose every
    * position is a boundary, or none); with the defaults the boundary
    * rule is the pure hash condition — stateless given the h sequence,
    * which is what the DuckDB oracle replays. Empty input → no chunks. */
  def boundaries(bytes: Array[Byte], maskBits: Int,
                 minSize: Int = 1, maxSize: Int = Int.MaxValue): Seq[(Int, Int)] = {
    require(maskBits >= 1 && maskBits <= 30, s"maskBits out of range: $maskBits")
    if (bytes == null || bytes.isEmpty) return Seq.empty
    val mask = (1L << maskBits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = ((h << 1) + gearOf(bytes(i))) & 0xFFFFFFFFL
      val len = i - start + 1
      if (((h & mask) == 0L && len >= minSize) || len >= maxSize) {
        out += ((start, len))
        start = i + 1
        // h is NOT reset: self-synchronization comes from the 32-shift
        // forgetting horizon, and the oracle's h recursion stays
        // boundary-independent
      }
      i += 1
    }
    if (start < bytes.length) out += ((start, bytes.length - start))
    out.toSeq
  }

  /** Per-chunk (offset, length, xxh64-of-content) for one blob. */
  def chunkHashes(bytes: Array[Byte], maskBits: Int,
                  minSize: Int = 1, maxSize: Int = Int.MaxValue): Seq[(Int, Int, Long)] =
    boundaries(bytes, maskBits, minSize, maxSize).map { case (off, len) =>
      (off, len,
        Hashes.xxh64(java.util.Arrays.copyOfRange(bytes, off, off + len), 0L))
    }

  /** Corpus-level chunk-dedup accounting over a binary column: one row
    * per input row —
    * `(id, n_chunks, n_bytes, dup_chunks, dup_bytes)` where a chunk is a
    * DUP iff an identical-content chunk occurs earlier in the corpus
    * order (first occurrence = lexicographic min (id, offset) — the
    * engine-wide deterministic-representative rule). `dup_bytes / sum
    * n_bytes` is the storage dedup ratio a chunk store would realize.
    * Null/empty blobs yield a 0-chunk row. */
  def chunkStats(df: DataFrame, idCol: String, binCol: String, maskBits: Int,
                 minSize: Int = 1, maxSize: Int = Int.MaxValue): DataFrame = {
    val chunks = chunkRows(df, idCol, binCol, maskBits, minSize, maxSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val real = chunks.where(col("off") >= 0)
    // first occurrence per chunk content: one partial-agg shuffle
    val firsts = real.groupBy(col("key"))
      .agg(min(struct(col("id"), col("off"))).as("first"))
    val marked = real.join(firsts, Seq("key"))
      .withColumn("dup",
        !(col("first.id") === col("id") && col("first.off") === col("off")))
    val stats = marked.groupBy(col("id")).agg(
      count(lit(1)).as("n_chunks"),
      sum(col("len")).cast("long").as("n_bytes"),
      sum(when(col("dup"), 1L).otherwise(0L)).as("dup_chunks"),
      sum(when(col("dup"), col("len").cast("long")).otherwise(0L)).as("dup_bytes"))
    // rows whose blob was empty/null keep a zero row
    val empties = chunks.where(col("off") < 0).select(
      col("id"), lit(0L).as("n_chunks"), lit(0L).as("n_bytes"),
      lit(0L).as("dup_chunks"), lit(0L).as("dup_bytes"))
    // eager localCheckpoint (one row per blob — small) so the chunk cache
    // can be RELEASED here instead of leaking one persist per call (the
    // FuzzyDedup.run discipline); callers get a lineage-free result
    val out = stats.unionByName(empties).localCheckpoint()
    chunks.unpersist(blocking = false)
    out
  }

  /** One row per chunk of the blob column: `(id, off, len, key)`;
    * empty/null blobs emit a sentinel `(id, -1, 0, 0)` row so accounting
    * keeps them. The shared exploded substrate of [[chunkStats]] and
    * [[newChunkStats]]. */
  private def chunkRows(df: DataFrame, idCol: String, binCol: String,
      maskBits: Int, minSize: Int, maxSize: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("bin"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bin) =>
          if (bin == null || bin.isEmpty) Iterator((id, -1, 0, 0L))
          else chunkHashes(bin, maskBits, minSize, maxSize).iterator
            .map { case (off, len, k) => (id, off, len, k) }
        }
      }
      .toDF("id", "off", "len", "key")
  }

  /** Distinct chunk-key index of a corpus — build once, persist next to
    * the corpus, reuse for every incremental batch ([[newChunkStats]]).
    * One zero-shuffle chunking pass + one distinct. */
  def chunkIndex(df: DataFrame, idCol: String, binCol: String, maskBits: Int,
                 minSize: Int = 1, maxSize: Int = Int.MaxValue): DataFrame =
    chunkRows(df, idCol, binCol, maskBits, minSize, maxSize)
      .where(col("off") >= 0).select(col("key")).distinct()

  /** INCREMENTAL chunk accounting — "how much of this new crawl is
    * storage-new vs the existing corpus": per batch blob,
    * `(id, n_chunks, n_bytes, dup_chunks, dup_bytes)` where dup = the
    * chunk's content already exists in `corpusIndex` (a [[chunkIndex]]
    * built at the SAME maskBits/minSize/maxSize — chunking must align or
    * self-synchronization does nothing).
    *
    * Scale shape (the [[IncrementalDedup.newDocs]] discipline): a Bloom
    * filter over the corpus keys prunes provably-new chunks MAP-SIDE, so
    * only suspects (true dups + fpp·|batch chunks|) reach the confirm
    * semi-join against the index — false positives never inflate the
    * counts. The suspect/confirmed joins carry NO explicit broadcast
    * hints: the suspect set scales with the number of distinct duplicate
    * chunks in the batch (unbounded by fpp — a heavy-duplicate batch is
    * the common case this operator targets), and AQE never demotes an
    * explicit hint, so hinting would turn that case into a broadcast-limit
    * failure. Unhinted, AQE broadcasts small suspect sets and replans
    * heavy ones as shuffles.
    *
    * `expectedItems` sizes the Bloom filter without a counting scan of
    * the (potentially corpus-scale) index — callers who persisted the
    * index usually know its cardinality; when absent (≤0) one count()
    * pass runs. */
  def newChunkStats(corpusIndex: DataFrame, batch: DataFrame,
      idCol: String, binCol: String, maskBits: Int,
      minSize: Int = 1, maxSize: Int = Int.MaxValue,
      fpp: Double = 0.01, expectedItems: Long = 0L): DataFrame = {
    val spark = batch.sparkSession
    val chunks = chunkRows(batch, idCol, binCol, maskBits, minSize, maxSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val real = chunks.where(col("off") >= 0)
    val nIdx = math.max(if (expectedItems > 0) expectedItems else corpusIndex.count(), 1L)
    val bf = corpusIndex.stat.bloomFilter("key", nIdx, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    val might = udf { (k: Long) => bc.value.mightContainLong(k) }
    val suspects = real.where(might(col("key"))).select(col("key")).distinct()
    val confirmed = corpusIndex
      .join(suspects, Seq("key"), "left_semi")
      .distinct()
      .withColumn("__dup", lit(true))
    val marked = real.join(confirmed, Seq("key"), "left")
    val stats = marked.groupBy(col("id")).agg(
      count(lit(1)).as("n_chunks"),
      sum(col("len")).cast("long").as("n_bytes"),
      sum(when(col("__dup"), 1L).otherwise(0L)).as("dup_chunks"),
      sum(when(col("__dup"), col("len").cast("long")).otherwise(0L)).as("dup_bytes"))
    val empties = chunks.where(col("off") < 0).select(
      col("id"), lit(0L).as("n_chunks"), lit(0L).as("n_bytes"),
      lit(0L).as("dup_chunks"), lit(0L).as("dup_bytes"))
    val out = stats.unionByName(empties).localCheckpoint()
    chunks.unpersist(blocking = false)
    bc.destroy()
    out
  }
}
