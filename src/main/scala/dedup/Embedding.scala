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

  /** The batched-forward contract every encoder shares: one call per
    * fixed-size batch, one vector per row (the embedding.py:194 loop
    * shape). Implementations are broadcast once per executor. */
  sealed trait Encoder extends Serializable {
    def dim: Int
    def encodeBatch(texts: Array[String]): Array[Array[Float]]
  }

  /** The broadcast "weights": per-lane projection seeds. A real swap-in
    * would carry serialized model weights here instead. */
  final case class FakeEncoder(dim: Int, seed: Long) extends Encoder {
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
      encoder: Encoder,
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
          val vecs = enc match {
            case f: FakeEncoder if w != null =>
              Embedding.tfidfBatch(texts, f.dim, f.seed, w)
            case e => e.encodeBatch(texts)
          }
          batch.iterator.zipWithIndex.map { case ((id, _), i) => (id, vecs(i)) }
        }
      }(Encoders.product[(Long, Array[Float])])
      .toDF("id", "vec")
  }

  // -------------------------------------------------- weights-from-file
  /** REAL neural-style encoder over EXPORTED weights — no stand-in math
    * anywhere once a weights directory exists: tokenize (the engine's
    * `(?U)\W` lowercasing tokenizer — export vocab lowercased), look each
    * token up in the word-embedding matrix, MEAN-POOL the hits, apply the
    * optional linear head `W·x + b`, L2-normalize. That is the classic
    * mean-of-word-vectors sentence encoder (fastText/word2vec export, or
    * the input-embedding + projection layers of a distilled transformer);
    * with real exported weights dropped into the parquet layout below it
    * produces real model embeddings with ZERO code change — the gap the
    * sandbox forces is only that no real weights ship here (no torch/onnx,
    * no model zoo; reference runs sentence-transformers at
    * `semantic dedup single gpu/embedding.py:194`).
    *
    * Texts with no vocab hit embed as the zero vector (the head is NOT
    * applied — a bias would cluster every empty doc at one fake point);
    * downstream cosine stages already treat zero vectors as
    * similar-to-nothing (Ann null-sim filter). */
  final case class WeightEncoder(
      vocab: java.util.HashMap[String, Array[Float]],
      dimIn: Int,
      head: Array[Array[Float]], // head(r) = row r of W, length dimIn
      bias: Array[Float]) // length head.length
      extends Encoder {
    def dim: Int = if (head == null) dimIn else head.length
    def encodeBatch(texts: Array[String]): Array[Array[Float]] = {
      val out = new Array[Array[Float]](texts.length)
      var r = 0
      while (r < texts.length) {
        val t = texts(r)
        val pooled = new Array[Float](dimIn)
        var hits = 0
        if (t != null) {
          val toks = TextNorm.tokenize(t)
          var i = 0
          while (i < toks.length) {
            val w = vocab.get(toks(i))
            if (w != null) {
              var d = 0
              while (d < dimIn) { pooled(d) += w(d); d += 1 }
              hits += 1
            }
            i += 1
          }
        }
        val v =
          if (hits == 0) new Array[Float](dim)
          else {
            val inv = 1f / hits
            var d = 0
            while (d < dimIn) { pooled(d) *= inv; d += 1 }
            if (head == null) pooled
            else {
              val h = new Array[Float](head.length)
              var o = 0
              while (o < head.length) {
                val row = head(o)
                var s = if (bias == null) 0.0 else bias(o).toDouble
                var d2 = 0
                while (d2 < dimIn) { s += row(d2).toDouble * pooled(d2); d2 += 1 }
                h(o) = s.toFloat
                o += 1
              }
              h
            }
          }
        var s = 0.0
        var d = 0
        while (d < v.length) { s += v(d).toDouble * v(d); d += 1 }
        if (s > 0) {
          val inv = (1.0 / math.sqrt(s)).toFloat
          d = 0
          while (d < v.length) { v(d) *= inv; d += 1 }
        }
        out(r) = v
        r += 1
      }
      out
    }
  }

  /** Load an exported weights directory:
    *   - `<path>/vocab`  parquet (token: string, vec: array<float>) —
    *     the word-embedding matrix, one row per vocab token (lowercase);
    *   - `<path>/head`   parquet (row: int, w: array<float>, b: float),
    *     OPTIONAL — a linear projection applied after mean-pooling.
    * The vocab collects to the driver and broadcasts (1M × 300-dim floats
    * ≈ 1.2 GB — the same once-per-executor weights residency a GPU
    * encoder needs; shard the corpus, not the vocab, beyond that). */
  def loadWeightEncoder(
      spark: org.apache.spark.sql.SparkSession, path: String): WeightEncoder = {
    val vocabRows = spark.read.parquet(s"$path/vocab")
      .select(col("token"), col("vec"))
      .collect()
    require(vocabRows.nonEmpty, s"empty weights vocab at $path/vocab")
    val dimIn = vocabRows.head.getAs[scala.collection.Seq[Float]]("vec").length
    val vocab = new java.util.HashMap[String, Array[Float]](vocabRows.length * 2)
    vocabRows.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("vec").toArray
      require(v.length == dimIn, "ragged vocab vectors")
      vocab.put(r.getString(0), v)
    }
    val headPath = new org.apache.hadoop.fs.Path(s"$path/head")
    val fs = headPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(headPath)) WeightEncoder(vocab, dimIn, null, null)
    else {
      val rows = spark.read.parquet(s"$path/head")
        .select(col("row").cast("int"), col("w"), col("b").cast("float"))
        .collect()
        .sortBy(_.getInt(0))
      require(rows.nonEmpty, s"empty head at $path/head")
      val head = rows.map(_.getAs[scala.collection.Seq[Float]]("w").toArray)
      require(head.forall(_.length == dimIn), "head width must equal vocab dim")
      val bias = rows.map(_.getFloat(2))
      WeightEncoder(vocab, dimIn, head, bias)
    }
  }

  /** docs → (id, vec) through exported weights: the `--embed-weights`
    * pipeline path. Same batched-broadcast plumbing as every encoder. */
  def weightsEmbed(
      docs: DataFrame,
      cfg: DedupConfig,
      encoder: WeightEncoder,
      batchSize: Int = 256): DataFrame =
    encodeWith(docs, cfg, encoder, batchSize)

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
