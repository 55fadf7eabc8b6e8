package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MediaKernels
import graft.operators.Multimodal

/** Pins the media-decoder DROP-IN BOUNDARY: a real decoder is exactly one
  * `Array[Byte] => MediaMeta` function behind `Multimodal.decodeMetaWith`;
  * the meta schema and every downstream plan (`resizePlan`,
  * `frameSamplePlan`) are decoder-independent. Two proofs:
  *   1. swapping in a decoder that computes the stub's function reproduces
  *      the codegen'd stub path byte-identically, composed plans included;
  *   2. swapping in an actual header decoder (PNG IHDR / GIF screen
  *      descriptor parsing — real public-format parsing, no codec libs)
  *      yields exact real dimensions and the SAME plan shapes downstream.
  */
class MultimodalContractSpec extends SparkSpec {

  // the stub's math exposed as a drop-in Decoder: what "replace only the
  // decode function" means, executed through the partition-batched path
  private val stubAsDecoder: Multimodal.Decoder = { payload =>
    val r = MediaKernels.decode(payload)
    Multimodal.MediaMeta(
      r.getLong(0),
      r.getUTF8String(1).toString,
      r.getUTF8String(2).toString,
      r.getInt(3),
      r.getInt(4),
      r.getLong(5)
    )
  }

  private def payloads: DataFrame = {
    import spark.implicits._
    Seq(
      // jpeg magic -> image; mp4-ish magic -> video; garbage -> unknown
      ("a", Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte) ++ Array.fill[Byte](60)(7)),
      ("b", Array[Byte](0x00, 0x00, 0x00, 0x18) ++ "ftypmp42".getBytes("UTF-8") ++ Array.fill[Byte](40)(3)),
      ("c", "not a media file at all".getBytes("UTF-8")),
      ("d", null.asInstanceOf[Array[Byte]]),
      ("e", Array.emptyByteArray)
    ).toDF("id", "payload")
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case v => v
    }).toSeq.sortBy(_.head.asInstanceOf[String])

  test("partition-batched decoder path reproduces the stub path byte-identically, composed plans included") {
    val viaStub = Multimodal.decodeMeta(payloads, "id", "payload")
    val viaBoundary = Multimodal.decodeMetaWith(payloads, "payload", stubAsDecoder)

    assert(viaBoundary.schema == viaStub.schema, "meta schema must be decoder-path-independent")
    assert(rows(viaBoundary.select("id", "meta.*")) == rows(viaStub.select("id", "meta.*")))

    // the downstream plans consume EITHER path unchanged — same code, same
    // output (this is the composition guarantee a real decoder relies on)
    assert(rows(Multimodal.resizePlan(viaBoundary, "id")) == rows(Multimodal.resizePlan(viaStub, "id")))
    assert(
      rows(Multimodal.frameSamplePlan(viaBoundary, "id", everyMs = 250L)) ==
        rows(Multimodal.frameSamplePlan(viaStub, "id", everyMs = 250L))
    )
  }

  test("a real header decoder drops in: exact PNG/GIF dimensions, plans compose unchanged") {
    import spark.implicits._
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    // PNG: 8-byte signature, 4-byte IHDR length, "IHDR", then w/h big-endian
    def png(w: Int, h: Int): Array[Byte] =
      Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++
        be32(13) ++ "IHDR".getBytes("UTF-8") ++ be32(w) ++ be32(h)
    // GIF: "GIF89a" then w/h little-endian
    def gif(w: Int, h: Int): Array[Byte] =
      "GIF89a".getBytes("UTF-8") ++
        Array((w & 0xff).toByte, ((w >> 8) & 0xff).toByte, (h & 0xff).toByte, ((h >> 8) & 0xff).toByte)

    val df = Seq(
      ("png_wide", png(1024, 512)),
      ("png_tall", png(100, 4000)),
      ("gif_small", gif(64, 48)),
      ("not_media", "plain text".getBytes("UTF-8"))
    ).toDF("id", "payload")

    val decoded = Multimodal.decodeMetaWith(df, "payload", Multimodal.headerDecoder)
    val meta = decoded
      .select("id", "meta.kind", "meta.width", "meta.height")
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(meta("png_wide") == (("image", 1024, 512)), "real PNG IHDR dims")
    assert(meta("png_tall") == (("image", 100, 4000)))
    assert(meta("gif_small") == (("image", 64, 48)), "real GIF screen-descriptor dims")
    assert(meta("not_media")._1 == "unknown")

    // the UNCHANGED resizePlan computes real geometry over the real decoder
    val plan = Multimodal
      .resizePlan(decoded, "id")
      .collect()
      .map(r => r.getString(0) -> ((r.getInt(3), r.getInt(4))))
      .toMap
    assert(plan("png_wide") == ((256, 128)), "1024x512 fits 256-box at (256,128)")
    assert(plan("png_tall") == ((6, 256)), "100x4000 scales by 256/4000 -> floor(6.4)=6")
    assert(plan("gif_small") == ((64, 48)), "already inside the box: no upscale")
    assert(!plan.contains("not_media"), "non-images are excluded from the resize plan")
  }
}
