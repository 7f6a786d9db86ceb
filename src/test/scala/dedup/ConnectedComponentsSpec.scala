package dedup

import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  /** brute-force union-find oracle */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("single edge, triangle, self-loop, duplicate edges") {
    assert(ccOf(Seq((2L, 1L))) === Map(1L -> 1L, 2L -> 1L))
    assert(ccOf(Seq((2L, 1L), (3L, 1L), (3L, 2L), (2L, 2L), (1L, 2L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("long chain needs multiple rounds and still resolves to the min") {
    val chain = (1L until 200L).map(i => (i + 1, i))
    val got = ccOf(chain)
    assert(got === (1L to 200L).map(_ -> 1L).toMap)
  }

  test("random graphs match union-find oracle (property)") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 5) {
      val n = 50 + trial * 40
      val edges = (1 to n).map { _ =>
        (rnd.nextInt(120).toLong + 1, rnd.nextInt(120).toLong + 1)
      }.filter(e => e._1 != e._2)
      val expect = ufComponents(edges)
      val got = ccOf(edges)
      assert(got === expect, s"trial $trial")
    }
  }

  test("partition-layout invariance: same assignments at 1 and 16 partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val edges = (1 to 300).map(_ => (rnd.nextInt(400).toLong, rnd.nextInt(400).toLong))
      .filter(e => e._1 != e._2)
    val df1 = edges.toDF("src", "dst").repartition(1)
    val df16 = edges.toDF("src", "dst").repartition(16)
    val a = ConnectedComponents.run(df1).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = ConnectedComponents.run(df16).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("assignAll: isolated docs get self-component") {
    import spark.implicits._
    val comps = ConnectedComponents.run(Seq((2L, 1L)).toDF("src", "dst"))
    val all = ConnectedComponents.assignAll(Seq(1L, 2L, 3L).toDF("id"), comps)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("local union-find path and distributed loop produce identical assignments") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 3) {
      val edges = (1 to 200).map(_ => (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
        .filter(e => e._1 != e._2)
      val df = edges.toDF("src", "dst")
      val dist = ConnectedComponents.run(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val local = ConnectedComponents.runAdaptive(df, localMax = Long.MaxValue)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val forced = ConnectedComponents.runAdaptive(df, localMax = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local === dist, s"trial $trial local vs distributed")
      assert(forced === dist, s"trial $trial forced-distributed")
    }
  }

  test("empty edge set converges immediately") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(ConnectedComponents.run(empty).count() === 0L)
  }
}
