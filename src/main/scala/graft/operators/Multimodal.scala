package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract /
  * frame-sample run as partition-batched transforms so a real decoder
  * (JNI/ffi image lib) drops in without changing the dataflow.
  *
  * The decode kernel itself is STUBBED — this container ships no image or
  * audio codecs — as a clearly-marked deterministic fake that derives
  * metadata from the byte stream. Everything around it (schema, batch
  * shape, partitioning, null-safety) is real and tested.
  */
object Multimodal {

  /** Typed metadata produced by the (stubbed) decoder. */
  final case class MediaMeta(
      n_bytes: Long,
      magic: String, // first-4-bytes hex, the usual container sniff
      kind: String, // image | audio | video | unknown
      width: Int, // STUB: derived deterministically from content bytes
      height: Int, // STUB
      duration_ms: Long // STUB; 0 for images
  )

  /** STUB decoder: deterministic fake in place of a real codec. A real
    * implementation replaces ONLY this function (same signature): parse the
    * container, return true dimensions/duration.
    */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    if (payload == null || payload.isEmpty) return MediaMeta(0L, "", "unknown", 0, 0, 0L)
    val magic = payload.take(4).map("%02x".format(_)).mkString
    val kind = magic match {
      case m if m.startsWith("ffd8") => "image" // jpeg
      case m if m.startsWith("8950") => "image" // png
      case m if m.startsWith("4949") || m.startsWith("4d4d") => "image" // tiff
      case m if m.startsWith("6674") || m.startsWith("0000") => "video" // mp4-ish
      case m if m.startsWith("4f67") || m.startsWith("fff1") => "audio" // ogg/aac
      case _ => "unknown"
    }
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < math.min(payload.length, 256)) { h = (h ^ (payload(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    val w = 64 + math.floorMod(h, 1024).toInt
    val ht = 64 + math.floorMod(h >>> 16, 1024).toInt
    val dur = if (kind == "video" || kind == "audio") 1000L + math.floorMod(h >>> 24, 600000L) else 0L
    MediaMeta(payload.length.toLong, magic, kind, w, ht, dur)
  }

  /** Decode a binary column into typed metadata — a single row-local
    * codegen'd expression (graft.functions.DecodeMeta): the meta struct is
    * a pure function of the payload bytes, so adding it costs ZERO
    * exchanges (the previous mapPartitions + join-back paid a full shuffle
    * to attach a column computed from the same row). All input columns are
    * carried through.
    */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.withColumn("meta", graft.functions.MediaFunctions.decode_meta(col(payloadCol)))

  /** Deterministic frame sampling plan for video payloads: emits
    * (id, frame_idx, ts_ms) rows at `everyMs` spacing from the decoded
    * duration — the real frame extractor consumes this plan per partition.
    */
  def frameSamplePlan(meta: DataFrame, idCol: String, everyMs: Long = 1000L): DataFrame =
    meta
      .where(col("meta.kind") === "video" && col("meta.duration_ms") > 0)
      .select(
        col(idCol),
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))).as("ts_ms")
      )
      .withColumn("frame_idx", (col("ts_ms") / everyMs).cast("long"))

  /** STUB feature extraction: fixed-width deterministic feature vector per
    * payload (a real model runs here, batch-shaped exactly the same).
    */
  def featurizeStub(df: DataFrame, idCol: String, payloadCol: String, dim: Int = 16): DataFrame =
    df.select(
      col(idCol),
      transform(
        sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col(payloadCol), i), lit(1000)) - 500.0) / 500.0
      ).as("features")
    )
}
