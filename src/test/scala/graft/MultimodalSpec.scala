package graft

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.MediaBlob
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("feature extraction: checksum, length, stub frame dims") {
    val blobs = Seq(MediaBlob(1L, "abc".getBytes("UTF-8"))).toDS()
    val f = MultimodalOps.extractFeatures(blobs).collect().head
    assert(f.byte_len == 3L)
    assert(f.checksum == "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
    assert(f.frame_w == ('a'.toInt % 64) + 1)
    assert(f.frame_h == ('b'.toInt % 64) + 1)
  }

  test("empty blob gets defaults, pipeline survives") {
    val blobs = Seq(MediaBlob(2L, Array.emptyByteArray)).toDS()
    val f = MultimodalOps.extractFeatures(blobs).collect().head
    assert(f.byte_len == 0L && f.frame_w == 1 && f.frame_h == 1)
  }

  test("binary column round-trips through the full query") {
    val out = MultimodalOps.q35Multimodal(spark, Sf)
    assert(out.count() == Tables.documents(spark, Sf).count())
    assert(out.columns.toSet ==
      Set("doc_id", "byte_len", "checksum", "frame_w", "frame_h"))
  }
}
