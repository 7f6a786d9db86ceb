package dedup

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class CheckpointStoreSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("stage commits manifest with per-partition metrics; reuse skips compute") {
    import spark.implicits._
    val root = Files.createTempDirectory("ckpt").toString
    val store = new CheckpointStore(spark, root, "cfgA")
    var computed = 0
    val df1 = store.stage("s1") { computed += 1; (1 to 100).toDF("x").repartition(4) }
    assert(computed === 1)
    assert(df1.count() === 100)
    val m = store.manifest("s1").get
    assert(m("rows") === 100L)
    assert(m("config_hash") === "cfgA")
    assert(m("partitions").asInstanceOf[Int] >= 1)
    // same config: reuse, no recompute
    val store2 = new CheckpointStore(spark, root, "cfgA")
    val df2 = store2.stage("s1") { computed += 1; (1 to 5).toDF("x") }
    assert(computed === 1)
    assert(df2.count() === 100)
    // changed config: recompute
    val store3 = new CheckpointStore(spark, root, "cfgB")
    val df3 = store3.stage("s1") { computed += 1; (1 to 5).toDF("x") }
    assert(computed === 2)
    assert(df3.count() === 5)
  }

  test("pipeline resume: delete downstream stage -> only it recomputes; result identical") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("pipe").toString
    val args = Pipeline.Args(
      synth = 400L, output = root, simhash = false, suffix = false,
      cfg = DedupConfig(numPerm = 64, saltBuckets = 4))
    val (_, assign1) = Pipeline.run(spark, args)
    val a1 = assign1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // wipe the components + downstream manifests; upstream stays committed
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    Seq("components", "assignments", "kept").foreach { s =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/$s"), true)
    }
    // track whether shingles stage recomputes by manifest snapshot identity
    val store = new CheckpointStore(spark, root, args.cfg.configHash)
    assert(store.isCommitted("shingles"), "upstream must remain committed")

    val (_, assign2) = Pipeline.run(spark, args)
    val a2 = assign2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a2 === a1, "resumed run must produce byte-identical assignments")
  }

  test("lineage is recorded in stage order") {
    val root = Files.createTempDirectory("lin").toString
    import spark.implicits._
    val store = new CheckpointStore(spark, root, "h")
    store.stage("a") { Seq(1).toDF("x") }
    store.stage("b") { Seq(2).toDF("x") }
    val m = store.manifest("b").get
    assert(m("lineage") === List("a"))
  }
}
