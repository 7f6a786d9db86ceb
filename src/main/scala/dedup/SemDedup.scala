package dedup

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Semantic dedup (the reference's third capability family): embedding →
  * coarse clusters → per-cluster pairwise-cosine prune.
  *
  * Reference trace (semantic dedup single gpu/clustering.py:98-206 fits
  * KMeans and assigns nearest_cent; semdedup.py:205-237 sorts each cluster
  * and removes any document whose max cosine similarity to an *earlier*
  * document in the sort order is ≥ 1 − ε; batched at
  * semdedup.py:143-168). Spark-first re-expression:
  *
  *   - clustering = `spark.ml.clustering.KMeans` (Lloyd, seeded) — or any
  *     precomputed cell column (IVF label), which keeps the prune step
  *     oracle-checkable;
  *   - the prune is a per-cell `flatMapGroups`: each cell is sorted and
  *     scanned with an upper-triangular max — O(|cell|²·d) inside one
  *     task, the same work shape as the reference's per-cluster batches.
  *     Cells are capped (`maxCell`): beyond the cap the scan compares
  *     against the first `maxCell` anchors only (the reference's batching
  *     bounds memory, not work; ours bounds both and degrades gracefully
  *     on degenerate clusters).
  *
  * Scale note: cells ≈ n/k rows; k is chosen so cells fit one task
  * (reference default k=1000 over 10⁸ docs → 10⁵-row cells). The groupBy
  * is one shuffle on the cell id; no all-pairs join ever materializes.
  */
object SemDedup {

  /** Encoder row types — must be public for generated code to access. */
  case class Cell(cell: Long, id: Long, ord: Double, vec: Array[Float])
  case class Pruned(id: Long, removed: Boolean, maxSimPrev: Double)

  /** Per-cell prune: scan cell members in (ord asc, id asc) order; a member
    * is removed iff its max cosine to any earlier member ≥ simThreshold
    * (reference ε semantics: simThreshold = 1 − ε). */
  def pruneWithinCells(
      vectors: DataFrame, // (id, vec, cell, ord)
      simThreshold: Double,
      maxCell: Int = 65536): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors
      .select(col("cell").cast("long"), col("id").cast("long"),
        col("ord").cast("double"), col("vec"))
      .as[Cell]
      .groupByKey(_.cell)
      .flatMapGroups { (_, it) =>
        val members = it.toArray.sortBy(c => (c.ord, c.id))
        val n = members.length
        val dim = if (n == 0) 0 else members(0).vec.length
        // normalize once; cosine = dot of unit vectors
        val unit = new Array[Array[Double]](n)
        var i = 0
        while (i < n) {
          val v = members(i).vec
          var s = 0.0
          var d = 0
          while (d < v.length) { s += v(d).toDouble * v(d); d += 1 }
          val inv = if (s > 0) 1.0 / math.sqrt(s) else 0.0
          val u = new Array[Double](v.length)
          d = 0
          while (d < v.length) { u(d) = v(d) * inv; d += 1 }
          unit(i) = u
          i += 1
        }
        val anchors = math.min(n, maxCell)
        val out = new Array[Pruned](n)
        i = 0
        while (i < n) {
          var maxSim = Double.NegativeInfinity
          var j = 0
          val stop = math.min(i, anchors)
          while (j < stop) {
            val a = unit(i); val b = unit(j)
            var s = 0.0
            var d = 0
            val m = math.min(a.length, b.length)
            while (d < m) { s += a(d) * b(d); d += 1 }
            if (s > maxSim) maxSim = s
            j += 1
          }
          out(i) = Pruned(members(i).id, i > 0 && maxSim >= simThreshold,
            if (i == 0) -2.0 else maxSim)
          i += 1
        }
        out.iterator
      }(Encoders.product[Pruned])
      .toDF("id", "removed", "max_sim_prev")
  }

  case class Result(assignments: DataFrame, pruned: DataFrame, kept: DataFrame)

  /** Hive-partitioned sink by cluster cell (reference S8:
    * `to_parquet(partition_on="nearest_cent")`, semantic dedup single
    * gpu/clustering.py:328-341) — downstream per-cluster readers prune to
    * one directory. */
  def sinkByCell(df: DataFrame, cellCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(cellCol)
      .option("compression", "snappy").parquet(path)

  /** Full KMeans semantic dedup: fit k centroids (seeded Lloyd via
    * spark.ml), assign cells, order each cell by distance-to-centroid
    * descending ("hard" mode, reference semdedup.py:205-210) then id, and
    * prune at cosine ≥ 1 − eps. */
  def semDedupKMeans(
      vectors: DataFrame, // (id, vec)
      k: Int,
      eps: Double,
      seed: Long = 42L,
      maxIter: Int = 20): Result = {
    val ml = vectors
      .select(col("id").cast("long").as("id"), col("vec"))
      .withColumn("features", org.apache.spark.ml.functions.array_to_vector(col("vec")))
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("cell")
    val model = km.fit(ml)
    val centers = model.clusterCenters.map(_.toArray)
    val bc = vectors.sparkSession.sparkContext.broadcast(centers)
    val dist = udf { (cell: Int, vec: Seq[Float]) =>
      val c = bc.value(cell)
      var s = 0.0
      var d = 0
      val m = math.min(c.length, vec.length)
      while (d < m) { val x = vec(d) - c(d); s += x * x; d += 1 }
      math.sqrt(s)
    }
    val assigned = model.transform(ml)
      .select(col("id"), col("vec"), col("cell").cast("long").as("cell"),
        // negative distance => descending distance order under ord-asc scan
        negate(dist(col("cell"), col("vec"))).as("ord"))
    val pruned = pruneWithinCells(assigned, 1.0 - eps)
    val kept = vectors.join(
      pruned.where(col("removed")).select(col("id")), Seq("id"), "left_anti")
    Result(assigned.select(col("id"), col("cell")), pruned, kept)
  }
}
