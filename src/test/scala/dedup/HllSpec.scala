package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class HllSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  /** Independent register computation: JDK MessageDigest md5, no Spark. */
  private def refRegisters(values: Seq[String]): Map[Long, Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    values.foldLeft(Map.empty[Long, Long]) { (acc, v) =>
      val hex = md.digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
      md.reset()
      val h = java.lang.Long.parseLong(hex.take(15), 16)
      val bucket = h >>> 51
      val w = h & ((1L << 51) - 1L)
      val rho = if (w == 0L) 52L else 52L - (64 - java.lang.Long.numberOfLeadingZeros(w))
      acc.updated(bucket, math.max(acc.getOrElse(bucket, 0L), rho))
    }
  }

  private def sketch(values: Seq[String]): Map[Long, Long] =
    Hll.registers(values.toDF("v"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("registers match an independent JDK-MD5 computation bit-exactly") {
    val vs = (0 until 3000).map(i => s"value_$i") ++ Seq("", " ", "日本語", "héllo")
    assert(sketch(vs) === refRegisters(vs))
  }

  test("duplicates are free: register table is a pure function of the distinct set") {
    val vs = (0 until 500).map(i => s"dup_$i")
    assert(sketch(vs ++ vs ++ vs.take(100)) === sketch(vs))
  }

  test("merge == sketch of the union (per-shard sketches union by max)") {
    val a = (0 until 800).map(i => s"a_$i")
    val b = (300 until 1200).map(i => s"a_$i") // overlapping
    val merged = Hll.merge(
        Hll.registers(a.toDF("v"), col("v")),
        Hll.registers(b.toDF("v"), col("v")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === sketch((a ++ b).distinct))
  }

  test("estimate accuracy: within ~3 sigma (14%) across magnitudes; linear counting small-n") {
    for (n <- Seq(100, 1000, 20000, 120000)) {
      val est = Hll.estimate(refRegisters((0 until n).map(i => s"card${n}_$i")))
      val err = math.abs(est - n) / n
      assert(err < 0.14, f"n=$n est=$est%.0f err=$err%.3f")
    }
    // tiny range: linear counting regime
    val est10 = Hll.estimate(refRegisters((0 until 10).map(i => s"tiny_$i")))
    assert(math.abs(est10 - 10) <= 2, s"linear counting at n=10 gave $est10")
  }

  test("approxDistinct end-to-end on a DataFrame with nulls and duplicates") {
    val df = ((0 until 5000).map(i => s"w${i % 2000}") :+ null).toDF("v")
    val est = Hll.approxDistinct(df, col("v"))
    assert(math.abs(est - 2000) / 2000 < 0.14, s"est=$est")
  }
}
