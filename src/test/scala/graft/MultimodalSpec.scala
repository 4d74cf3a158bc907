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

  test("q209 format census equals a local magic-byte replay; bytes " +
      "count the 2-byte header; per-source mix sums to ~1e6") {
    import org.apache.spark.sql.functions._
    val got = MultimodalOps.q209FormatCensus(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val docs = Tables.documents(spark, Sf)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map { r =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hexd = md.digest(r.getLong(0).toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val fmt = Seq("jpeg", "png", "riff")(
          Integer.parseInt(hexd.substring(0, 1), 16) % 3)
        (r.getString(1), fmt,
          r.getString(2).getBytes("UTF-8").length.toLong + 2)
      }
    val expect = docs.groupBy(t => (t._1, t._2)).map { case (k, v) =>
      val n = docs.count(_._1 == k._1).toLong
      k -> ((v.size.toLong, v.map(_._3).sum,
        (2000000L * v.size + n) / (2 * n)))
    }
    assert(got == expect && got.nonEmpty)
    got.keys.map(_._1).foreach { src =>
      val s = got.filter(_._1._1 == src).values.map(_._3).sum
      assert(math.abs(s - 1000000L) <= 3, s"$src: $s")
    }
  }
}
