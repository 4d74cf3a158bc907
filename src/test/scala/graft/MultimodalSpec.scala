package graft

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.MediaBlob
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("BMP decoder parses a hand-assembled canonical 1×1 24-bit file") {
    // 54-byte header + one row (3 pixel bytes + 1 stride pad)
    val px = Array[Byte](10, 20, 30)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte)
    val bmp = Array[Byte]('B', 'M') ++ le32(58) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(1) ++ le32(1) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(4) ++ le32(2835) ++ le32(2835) ++ le32(0) ++
      le32(0) ++ px ++ Array[Byte](0)
    val f = MultimodalOps.decode(MediaBlob(7L, bmp))
    assert(f.fmt == "bmp" && f.width == Some(1) && f.height == Some(1))
    assert(f.byte_len == 58L && f.n_units == 1L)
    assert(f.mean_e2 == 2000L) // rhu(100·60, 3)
  }

  test("PPM decoder parses a hand-assembled canonical P6 file") {
    val ppm = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6)
    val f = MultimodalOps.decode(MediaBlob(8L, ppm))
    assert(f.fmt == "ppm" && f.width == Some(2) && f.height == Some(1))
    assert(f.n_units == 2L)
    assert(f.mean_e2 == 350L) // rhu(100·21, 6)
  }

  test("WAV decoder parses a hand-assembled canonical PCM-16 file") {
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte)
    // samples +256 and −512
    val wav = "RIFF".getBytes ++ le32(40) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(44100) ++ le32(88200) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(4) ++ le16(256) ++ le16(-512 & 0xffff)
    val f = MultimodalOps.decode(MediaBlob(9L, wav))
    assert(f.fmt == "wav" && f.rate == Some(44100) && f.n_units == 2L)
    assert(f.width.isEmpty && f.height.isEmpty)
    assert(f.mean_e2 == 38400L) // rhu(100·(256+512), 2)
  }

  test("synthesize → decode round-trip matches the closed form for " +
      "all three formats") {
    val payload = "hello multimodal world".getBytes("UTF-8")
    val l = payload.length
    // force each format via ids picked by their md5 first digit
    val byFmt = (0L to 60L).map(id => MultimodalOps.formatPick(id) -> id)
      .toMap
    // BMP
    val fb = MultimodalOps.decode(
      MediaBlob(byFmt(0), MultimodalOps.synthBmp(payload)))
    val w = (l % 31) + 1; val h = math.max(1, (l + 3 * w - 1) / (3 * w))
    val bsum = payload.map(_ & 0xff).map(_.toLong).sum
    assert(fb.fmt == "bmp" && fb.width == Some(w) && fb.height == Some(h))
    assert(fb.byte_len == 54L + ((3 * w + 3) / 4) * 4 * h)
    assert(fb.mean_e2 == (2 * 100 * bsum + 3L * w * h) / (2 * 3L * w * h))
    // PPM
    val fp = MultimodalOps.decode(
      MediaBlob(byFmt(1), MultimodalOps.synthPpm(payload)))
    assert(fp.fmt == "ppm" && fp.width == Some(w) && fp.height == Some(h))
    assert(fp.byte_len ==
      9L + w.toString.length + h.toString.length + 3L * w * h)
    assert(fp.mean_e2 == fb.mean_e2)
    // WAV
    val fw = MultimodalOps.decode(
      MediaBlob(byFmt(2), MultimodalOps.synthWav(payload)))
    val asum = payload.map(b => math.abs((b & 0xff) - 128).toLong).sum
    assert(fw.fmt == "wav" && fw.rate == Some(8000) && fw.n_units == l)
    assert(fw.byte_len == 44L + 2L * l)
    assert(fw.mean_e2 == (2 * 100 * asum * 256 + l) / (2L * l))
  }

  test("unknown container degrades, pipeline survives") {
    val blobs = Seq(MediaBlob(2L, Array[Byte](1, 2, 3))).toDS()
    val f = MultimodalOps.extractFeatures(blobs).collect().head
    assert(f.fmt == "unknown" && f.byte_len == 3L && f.n_units == 0L)
  }

  test("binary column round-trips through the full query; all three " +
      "formats appear; decode is deterministic") {
    val out = MultimodalOps.q35Multimodal(spark, Sf)
    assert(out.count() == Tables.documents(spark, Sf).count())
    assert(out.columns.toSeq == Seq("doc_id", "fmt", "byte_len",
      "width", "height", "rate", "n_units", "mean_e2"))
    val fmts = out.select("fmt").distinct().collect()
      .map(_.getString(0)).toSet
    assert(fmts == Set("bmp", "ppm", "wav"))
    val a = out.collect().map(_.toSeq).toSet
    val b = MultimodalOps.q35Multimodal(spark, Sf).collect()
      .map(_.toSeq).toSet
    assert(a == b)
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
