package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Real javax.imageio decode path: planted PNG/JPEG fixtures must come
  * back with their true width/height/channels/format; non-image and
  * corrupt payloads must degrade to nulls (never throw mid-scan). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  /** JDK-encoded fixture bytes with known dims. */
  private def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 31 + y * 7) & 0xFFFFFF)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private def assets(rows: Seq[(Long, Array[Byte])]) =
    Multimodal.fromBinary(
      rows.toDF("id", "bytes"), "id", col("bytes"), "image")

  test("decodeImageMeta reads true dims/channels/format for planted PNG and JPEG") {
    val out = Multimodal.decodeImageMeta(assets(Seq(
        1L -> encode("png", 37, 21),
        2L -> encode("jpg", 64, 48))))
      .orderBy("asset_id").collect()
    assert(out(0) === Row(1L, "image", 37, 21, 3, "png"))
    assert(out(1) === Row(2L, "image", 64, 48, 3, "jpeg"))
  }

  test("decodeImageMeta nulls out non-image, corrupt, and null payloads") {
    val corruptPng = encode("png", 8, 8).take(12) // truncated inside IHDR
    val out = Multimodal.decodeImageMeta(assets(Seq(
        1L -> "plain text bytes".getBytes("UTF-8"),
        2L -> corruptPng,
        3L -> null)))
      .orderBy("asset_id").collect()
    out.foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) &&
        r.isNullAt(5), s"expected all-null meta, got $r")
    }
  }

  test("describe surfaces real header meta alongside the fingerprint") {
    val png = encode("png", 5, 9)
    val out = Multimodal.describe(assets(Seq(7L -> png))).collect()(0)
    assert(out.getAs[Long]("payload_bytes") === png.length.toLong)
    assert(out.getAs[Int]("width") === 5)
    assert(out.getAs[Int]("height") === 9)
    assert(out.getAs[Int]("channels") === 3)
    assert(out.getAs[String]("img_format") === "png")
  }

  test("perceptualHash: engine hash over REAL decoded PNG bytes equals " +
    "an independent driver-side recomputation from the planted pixel " +
    "formula; identical images hash identically; corrupt payload nulls") {
    val s = spark
    import s.implicits._
    val ids = Seq(3L, 7L, 40L, 41L, 100L)
    val assets = Multimodal.synthPngAssets(
      ids.toDF("doc_id"), "doc_id",
      lit(1) + pmod(col("doc_id"), lit(13)),
      lit(1) + pmod(col("doc_id") * 3, lit(11)))
    val got = Multimodal.perceptualHash(assets).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent reference straight from the generator arithmetic —
    // never touches a PNG byte
    def ref(id: Long): Long = {
      val w = (1 + id % 13).toInt; val h = (1 + (id * 3) % 11).toInt
      def luma(xs: Int, cy: Int): Long = {
        val v = (id * 31 + (cy * h / 8) * 17 + xs * 7) & 0xFFFFFF
        299 * ((v >> 16) & 255) + 587 * ((v >> 8) & 255) + 114 * (v & 255)
      }
      (for { cy <- 0 until 8; cx <- 0 until 7
        if luma((cx + 1) * w / 8, cy) > luma(cx * w / 8, cy) }
        yield 1L << (cy * 7 + cx)).sum
    }
    ids.foreach(id => assert(got(id) == ref(id), s"id=$id"))
    // determinism: re-encoding the same id yields the same hash
    val again = Multimodal.perceptualHash(Multimodal.synthPngAssets(
        Seq(7L).toDF("doc_id"), "doc_id",
        lit(1) + pmod(col("doc_id"), lit(13)),
        lit(1) + pmod(col("doc_id") * 3, lit(11))))
      .collect().head.getLong(1)
    assert(again == got(7L))
    // corrupt payload → null, never a throw mid-scan
    val bad = Multimodal.perceptualHash(
      Seq((1L, "image", Array[Byte](1, 2, 3)))
        .toDF("asset_id", "media_type", "payload")).collect().head
    assert(bad.isNullAt(1))
  }

  test("synthPngAssets round-trips through the real decoder at per-row dims") {
    val df = Seq(0L, 1L, 25L, 499L).toDF("doc_id")
    val out = Multimodal.decodeImageMeta(Multimodal.synthPngAssets(
        df, "doc_id",
        lit(1) + pmod(col("doc_id"), lit(13)),
        lit(1) + pmod(col("doc_id") * 3, lit(11))))
      .orderBy("asset_id").collect()
    for (r <- out) {
      val id = r.getLong(0)
      assert(r.getInt(2) === 1 + (id % 13).toInt, s"width for id=$id")
      assert(r.getInt(3) === 1 + (id * 3 % 11).toInt, s"height for id=$id")
      assert(r.getInt(4) === 3)
      assert(r.getString(5) === "png")
    }
  }

  test("wavStats: REAL WAV round-trip — decoded PCM aggregates equal " +
    "the hand-computed sample recipe; corrupt and non-WAV payloads " +
    "are dropped") {
    val s = spark
    import s.implicits._
    val ids = Seq(3L, 10L)
    val assets = Multimodal.synthWavAssets(
      ids.toDF("doc_id"), "doc_id", lit(5))
    // the payload is a genuine RIFF container, not raw PCM
    val payload = assets.filter(col("asset_id") === 3L)
      .select(col("payload")).collect().head.getAs[Array[Byte]](0)
    assert(new String(payload.take(4), "US-ASCII") === "RIFF")
    val out = Multimodal.wavStats(assets).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    ids.foreach { id =>
      val samples = (0 until 5).map(i => ((id * 31 + i * 7) % 2003) - 1001)
      assert(out(id) === ((8000L, 5L, samples.sum,
        samples.map(v => v * v).sum, samples.map(math.abs).max)),
        s"id=$id")
    }
    // corrupt/alien payloads: quarantine-dropped, never a wrong row
    val junk = Seq(
      (100L, "audio", Array[Byte](1, 2, 3)),
      (101L, "audio", null.asInstanceOf[Array[Byte]]))
      .toDF("asset_id", "media_type", "payload")
    assert(Multimodal.wavStats(junk).count() === 0L)
  }
}
