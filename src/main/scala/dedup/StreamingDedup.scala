package dedup

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming dedup — the ingest-time counterpart of the batch
  * pipeline for a continuously arriving page stream (Common-Crawl dumps
  * land as a stream of WARC batches; the reference processes them as
  * snapshots, its incremental variant is the seen-set loop in
  * fuzzy single gpu/dedup.py:61-75 — state = everything seen so far).
  *
  * Streaming semantics vs batch:
  *   - batch picks the min-id representative of each duplicate CLUSTER
  *     (global connected components); a stream cannot see the future, so
  *     the representative is the FIRST-SEEN member (by event time, doc id
  *     tie-break) — the reference's own seen-set semantics. A later doc
  *     similar to an earlier one is flagged against that earlier doc.
  *   - state is bounded by the watermark: bucket state expires
  *     `watermark` after the last event time that touched it, exactly the
  *     horizon inside which `dropDuplicatesWithinWatermark` guarantees
  *     exact dedup. At 10¹²-doc scale unbounded seen-sets are impossible;
  *     the watermark is the honest contract ("duplicates within N days of
  *     each other are caught").
  *
  * Two operators:
  *   - [[exactKept]]: content-hash dedup via
  *     `dropDuplicatesWithinWatermark` — Spark's own bounded-state
  *     streaming dedup, state = one row per distinct content key in the
  *     watermark horizon (batch twin: A1/A2 ExactDedup).
  *   - [[fuzzyMatches]]: incremental MinHash-LSH. Each doc's full
  *     signature is computed ONCE (the same `Lsh.signature` +
  *     `Hashes.xxh64Ints` band buckets as the batch path, so streaming
  *     and batch agree on candidate buckets), fanned out to its
  *     `numBands` bucket keys, and matched per bucket against the
  *     first-seen representative held in `flatMapGroupsWithState` state.
  *     Similarity is the matching-lane fraction of the two signatures —
  *     the unbiased MinHash estimate of Jaccard over numPerm=250 lanes
  *     (±~0.03 at 250 lanes; the stream cannot re-read the earlier doc's
  *     shingles for an exact verify without unbounded state, so the
  *     estimator IS the verification, at the reference's own fidelity —
  *     it trusts bucket equality alone, buckets_edges.py:54).
  *
  * Scale shape: state per bucket = rep id + numPerm ints (~1 KB at 250
  * perms), keyed state partitioned by bucket hash across executors; the
  * per-batch shuffle is the same salted-width banding shuffle as batch
  * (numBands rows per doc). No per-batch collect, no driver state.
  */
object StreamingDedup {

  /** One (bucket, doc) probe: the doc's full signature rides along so the
    * bucket's stateful matcher can estimate Jaccard against the rep. */
  case class Probe(bucket: Long, id: Long, ts: java.sql.Timestamp, sig: Array[Int])

  /** Per-bucket state: first-seen representative and its signature. */
  case class BucketState(repId: Long, repTs: Long, sig: Array[Int])

  /** A flagged near-duplicate: `id` arrived after `dupOf` and shares a
    * band bucket with estimated Jaccard ≥ threshold. */
  case class Match(id: Long, ts: java.sql.Timestamp, dupOf: Long, estJaccard: Double)

  /** Exact streaming dedup: first occurrence of each content key within
    * the watermark horizon passes, later byte-identical copies drop.
    * Emits the full payload row (batch twin: ExactDedup.kept). */
  def exactKept(
      pages: DataFrame,
      tsCol: String = "warc_ts",
      textCol: String = "text",
      watermark: String = "10 minutes"): DataFrame =
    pages
      .withColumn("content_key", xxhash64(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_key")
      .drop("content_key")

  /** Append stream of near-duplicate flags: one row per (id, dupOf, band
    * bucket) where `id` shares that bucket with the earlier-seen `dupOf`
    * at estimated Jaccard ≥ cfg.threshold. A doc in no emitted row is
    * novel (the stream analogue of `id === component`).
    *
    * A pair found in several bands is emitted once per matching band —
    * always within ONE micro-batch (all probes of a doc travel together),
    * never across batches. Spark's global-watermark correctness checker
    * rejects a chained stateful `dropDuplicatesWithinWatermark` after
    * flatMapGroupsWithState, so uniqueness is the consumer's one-liner:
    * `.dropDuplicates("id","dupOf")` inside `foreachBatch`, or a batch
    * distinct downstream (what [[fuzzyMatchesBatch]] does).
    *
    * `ttlMs` must be ≥ the watermark delay: bucket state older than the
    * watermark can never match (rows that old no longer arrive), so it
    * times out and is removed.
    */
  def fuzzyMatches(
      pages: DataFrame,
      cfg: DedupConfig,
      tsCol: String = "warc_ts",
      watermark: String = "10 minutes",
      ttlMs: Long = 10L * 60L * 1000L): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val (nb, r) = cfg.bandsRows
    val (pa, pb) = Hashes.permutations(nb * r, cfg.seed)
    val ngram = cfg.ngram
    val minLen = cfg.minLength
    val threshold = cfg.threshold

    val probes = pages
      .select(col(cfg.idCol).cast("long").as("id"),
        col(tsCol).cast("timestamp").as("ts"), col(cfg.textCol).as("text"))
      .as[(Long, java.sql.Timestamp, String)]
      .mapPartitions { it =>
        val scratch = new Array[Byte](r * 4)
        it.flatMap { case (id, ts, text) =>
          val sh =
            if (text == null) Array.emptyIntArray
            else TextNorm.shingleHashes(text, ngram, minLen)
          if (sh.isEmpty || ts == null) Iterator.empty
          else {
            val sig = Lsh.signature(sh, pa, pb)
            (0 until nb).iterator.map { band =>
              Probe(Hashes.xxh64Ints(sig, band * r, (band + 1) * r, band.toLong, scratch),
                id, ts, sig)
            }
          }
        }
      }
      .withWatermark("ts", watermark)

    val matcher =
      (bucket: Long, rows: Iterator[Probe], state: GroupState[BucketState]) => {
        if (state.hasTimedOut) { state.remove(); Iterator.empty[Match] }
        else {
          // deterministic within-batch order: event time, then doc id
          val docs = rows.toArray.sortBy(p => (p.ts.getTime, p.id))
          val out = scala.collection.mutable.ArrayBuffer.empty[Match]
          var st = state.getOption.orNull
          var maxTs = 0L
          docs.foreach { p =>
            if (p.ts.getTime > maxTs) maxTs = p.ts.getTime
            if (st == null) st = BucketState(p.id, p.ts.getTime, p.sig)
            else if (st.repId != p.id) {
              var m = 0; var i = 0
              val n = math.min(p.sig.length, st.sig.length)
              while (i < n) { if (p.sig(i) == st.sig(i)) m += 1; i += 1 }
              val est = m.toDouble / n
              if (est >= threshold) out += Match(p.id, p.ts, st.repId, est)
            }
          }
          if (st != null) {
            state.update(st)
            // expire the bucket once the watermark passes last-touch + ttl
            state.setTimeoutTimestamp(maxTs + ttlMs)
          }
          out.iterator
        }
      }

    probes
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(matcher)
      .toDF()
  }

  /** Batch-mode twin of [[fuzzyMatches]] for testing and backfill: the
    * identical probe generation and first-seen-rep matching, executed on
    * a static DataFrame via groupByKey+flatMapGroups (no state, each
    * bucket sees all its docs at once). Guarantees: same buckets, same
    * estimator, same (ts, id) ordering as the stream — so a streamed run
    * over the same rows emits the same match SET for any batch slicing
    * that is event-time monotonic (later micro-batches carry later
    * timestamps; out-of-order slicings can elect a different first-seen
    * rep, the inherent stream/batch divergence of seen-set semantics). */
  def fuzzyMatchesBatch(
      pages: DataFrame,
      cfg: DedupConfig,
      tsCol: String = "warc_ts"): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val (nb, r) = cfg.bandsRows
    val (pa, pb) = Hashes.permutations(nb * r, cfg.seed)
    val ngram = cfg.ngram
    val minLen = cfg.minLength
    val threshold = cfg.threshold
    pages
      .select(col(cfg.idCol).cast("long").as("id"),
        col(tsCol).cast("timestamp").as("ts"), col(cfg.textCol).as("text"))
      .as[(Long, java.sql.Timestamp, String)]
      .mapPartitions { it =>
        val scratch = new Array[Byte](r * 4)
        it.flatMap { case (id, ts, text) =>
          val sh =
            if (text == null) Array.emptyIntArray
            else TextNorm.shingleHashes(text, ngram, minLen)
          if (sh.isEmpty || ts == null) Iterator.empty
          else {
            val sig = Lsh.signature(sh, pa, pb)
            (0 until nb).iterator.map { band =>
              Probe(Hashes.xxh64Ints(sig, band * r, (band + 1) * r, band.toLong, scratch),
                id, ts, sig)
            }
          }
        }
      }
      .groupByKey(_.bucket)
      .flatMapGroups { (_: Long, rows: Iterator[Probe]) =>
        val docs = rows.toArray.sortBy(p => (p.ts.getTime, p.id))
        if (docs.isEmpty) Iterator.empty
        else {
          val rep = docs.head
          docs.iterator.drop(1).flatMap { p =>
            var m = 0; var i = 0
            val n = math.min(p.sig.length, rep.sig.length)
            while (i < n) { if (p.sig(i) == rep.sig(i)) m += 1; i += 1 }
            val est = m.toDouble / n
            if (est >= threshold && p.id != rep.id) Some(Match(p.id, p.ts, rep.id, est))
            else None
          }
        }
      }
      .toDF()
      .dropDuplicates("id", "dupOf")
  }
}
