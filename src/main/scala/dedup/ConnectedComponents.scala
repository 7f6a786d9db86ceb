package dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame-native connected components via alternating large-star /
  * small-star rounds (Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SoCC'14 — public algorithm).
  *
  * The reference resolves clusters with GraphFrames WCC
  * (fuzzy_spark2.py:669-671), iterative min-label propagation
  * (clustering_spark.py:84-171) or cuGraph
  * (fuzzy multi gpu/connected_components_multi.py:213-268); GraphFrames is
  * not on this classpath and the north_rule mandates the DataFrame
  * large-star/small-star formulation, so this is hand-rolled:
  *
  *   largeStar: every node's strictly-larger neighbors link to
  *              min(Γ(u) ∪ {u});
  *   smallStar: every node's ≤ neighbors (and the node) link to its
  *              smallest neighbor.
  *
  * Both rounds are min-aggregations (map-side combinable) plus an
  * equi-join — no collect_list, so a degree-10^6 hub never materializes a
  * single giant array; AQE skew-join splits the join side. Each round is
  * `localCheckpoint`ed to truncate lineage (the reference leans on
  * GraphFrames' internal checkpointing, fuzzy_spark2.py:526); convergence
  * is an exact edge-set fingerprint (count + bit_xor of edge hashes), not
  * the reference's distinct-cluster-count heuristic which can converge
  * falsely (clustering_spark.py:151-157; SURVEY.md §7 risk 1).
  *
  * Converges in O(log n) rounds; `maxIter` is an assertion, not a knob.
  */
object ConnectedComponents {

  /** Normalize: src > dst, no self-loops, distinct. */
  private def normalize(e: DataFrame): DataFrame =
    e.select(
        greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()

  private def largeStar(e: DataFrame): DataFrame = {
    val nbr = e.select(col("src").as("u"), col("dst").as("v"))
      .union(e.select(col("dst").as("u"), col("src").as("v")))
    val mins = nbr.groupBy(col("u")).agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    // no distinct here: duplicate edges don't change any min-aggregation,
    // and smallStar's terminal distinct dedups the round's output — one
    // fewer shuffle per round
    nbr.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("src"), col("m").as("dst"))
  }

  private def smallStar(e: DataFrame): DataFrame = {
    // invariant: e is oriented src > dst
    val nbr = e.select(col("src").as("u"), col("dst").as("v"))
    val mins = nbr.groupBy(col("u")).agg(min(col("v")).as("m"))
    nbr.join(mins, "u")
      .select(col("v").as("src"), col("m").as("dst"))
      .union(mins.select(col("u").as("src"), col("m").as("dst")))
      .where(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("src"), least(col("src"), col("dst")).as("dst"))
      .distinct()
  }

  /** (count, xor-of-edge-hashes) — an exact set fingerprint for the
    * convergence test (edges are distinct, so xor is collision-safe up to
    * hash collisions across *sets*, vanishing at 64 bits). */
  private def fingerprint(e: DataFrame): (Long, Long) = {
    val row = e.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L)).as("x")).head()
    (row.getLong(0), row.getLong(1))
  }

  /** edges → (id, component) for every vertex present in `edges`;
    * component = min id of the component. Isolated docs (no edges) are the
    * caller's concern (left-join + coalesce to self, reference
    * fuzzy_spark2.py:692-697). */
  def run(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    // lazy localCheckpoint: the fingerprint action both materializes the
    // round's edge set (truncating lineage) and computes the convergence
    // check in ONE job — an eager checkpoint would pay a second pass
    var e = normalize(edges).localCheckpoint(false)
    var fp = fingerprint(e)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val nfp = fingerprint(next)
      converged = nfp == fp
      e = next
      fp = nfp
      iter += 1
    }
    require(converged || iter < maxIter,
      s"connected components did not converge in $maxIter rounds")
    // at fixpoint every edge is (member, componentMin)
    e.select(col("src").as("id"), col("dst").as("component"))
      .union(e.select(col("dst").as("id"), col("dst").as("component")))
      .groupBy(col("id")).agg(min(col("component")).as("component"))
  }

  /** Size-adaptive execution — the same idea as AQE's broadcast-vs-SMJ
    * choice: a candidate-edge set under `localMax` rows runs as a single-
    * task union-find ON AN EXECUTOR (one job, no iteration latency; never
    * a driver collect), anything larger takes the distributed large-star/
    * small-star loop. At 10^12 docs the edge set is billions of rows and
    * always routes to the loop; at bench scales the iterative loop's
    * per-round latency would otherwise dominate wall time as pure serial
    * cost. Both paths produce identical assignments (property-tested). */
  def runAdaptive(edges: DataFrame, localMax: Long = 5000000L, maxIter: Int = 50): DataFrame = {
    val e = normalize(edges).localCheckpoint(false)
    if (e.count() <= localMax) runLocal(e) else run(e, maxIter)
  }

  /** Single-task union-find (path-halving) with min-id relabeling. */
  private[dedup] def runLocal(normalized: DataFrame): DataFrame = {
    val spark = normalized.sparkSession
    import spark.implicits._
    normalized.select(col("src"), col("dst")).as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = new java.util.HashMap[Long, Long]()
        def find(x0: Long): Long = {
          var x = x0
          var p = parent.getOrDefault(x, x)
          while (p != x) {
            val gp = parent.getOrDefault(p, p)
            parent.put(x, gp)
            x = gp
            p = parent.getOrDefault(x, x)
          }
          x
        }
        it.foreach { case (a, b) =>
          parent.putIfAbsent(a, a)
          parent.putIfAbsent(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) {
            if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
          }
        }
        // roots are already component minima (unions always point to the
        // smaller root), so find(x) is the component min
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size())
        val keys = parent.keySet().iterator()
        while (keys.hasNext) {
          val k = keys.next()
          out += ((k, find(k)))
        }
        out.iterator
      }
      .toDF("id", "component")
  }

  /** Attach components to a doc table: docs without any duplicate edge get
    * component = own id (reference J1+P3, fuzzy_spark2.py:681-697). */
  def assignAll(docIds: DataFrame, assignments: DataFrame): DataFrame = {
    docIds.join(assignments, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }
}
