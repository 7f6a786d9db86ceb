package dedup

import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("sniffMagic recognizes common containers") {
    assert(Multimodal.sniffMagic(Array(0x89.toByte, 'P', 'N', 'G').map(_.toByte)) === "png")
    assert(Multimodal.sniffMagic(Array(0xFF.toByte, 0xD8.toByte, 0, 0)) === "jpeg")
    assert(Multimodal.sniffMagic("GIF89a".getBytes) === "gif")
    assert(Multimodal.sniffMagic("%PDF-1.4".getBytes) === "pdf")
    assert(Multimodal.sniffMagic("<!DOCTYPE html><html>".getBytes) === "html")
    assert(Multimodal.sniffMagic("plain words".getBytes) === "bin")
    assert(Multimodal.sniffMagic(Array.emptyByteArray) === "empty")
    assert(Multimodal.sniffMagic(null) === "empty")
  }

  test("decodeStub: deterministic normalized 16-bin histogram") {
    val b = "hello world".getBytes
    val f1 = Multimodal.decodeStub(b)
    val f2 = Multimodal.decodeStub(b)
    assert(f1.toSeq === f2.toSeq)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
    assert(Multimodal.decodeStub(Array.emptyByteArray).toSeq === Seq.fill(16)(0f))
  }

  test("sampleChunks bounds output") {
    val bytes = Array.tabulate[Byte](1000)(_.toByte)
    val chunks = Multimodal.sampleChunks(bytes, 100, 3)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length == 100))
    assert(Multimodal.sampleChunks(Array[Byte](1, 2), 100, 3).isEmpty)
  }

  test("describeBinary: schema and per-row metadata over a DataFrame") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "hello"), (2L, "<html><body>x</body></html>"))
      .toDF("id", "text")
      .select(col("id"), encode(col("text"), "UTF-8").as("bin"))
    val out = Multimodal.describeBinary(df, "id", "bin")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) === ((5L, "bin")))
    assert(out(2L)._2 === "html")
    val schema = Multimodal.describeBinary(df, "id", "bin").schema
    assert(schema.fieldNames.toSeq === Seq("id", "n_bytes", "magic", "features"))
  }
}
