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
  * The MODEL ITSELF is a documented stand-in (this sandbox ships no
  * torch/onnx runtime): a seeded random-projection bag-of-tokens — each
  * token hashes to a lane set via the broadcast projection seeds, vectors
  * are L2-normalized. It is deterministic at any parallelism and shares
  * the real model's algebraic shape (same-text ⇒ same vector;
  * token-overlap ⇒ cosine similarity), which is what the downstream
  * stages' tests need. Swapping in a real encoder replaces ONLY
  * `FakeEncoder.encodeBatch`.
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
      batchSize: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(FakeEncoder(dim, cfg.seed))
    docs
      .select(col(cfg.idCol).cast("long").as("id"), col(cfg.textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val enc = bc.value
        it.grouped(batchSize).flatMap { batch =>
          val vecs = enc.encodeBatch(batch.iterator.map(_._2).toArray)
          batch.iterator.zipWithIndex.map { case ((id, _), i) => (id, vecs(i)) }
        }
      }(Encoders.product[(Long, Array[Float])])
      .toDF("id", "vec")
  }
}
