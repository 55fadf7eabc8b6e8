package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
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

  /** Decode a binary column into typed metadata — a single row-local
    * codegen'd expression (graft.functions.DecodeMeta): the meta struct is
    * a pure function of the payload bytes, so adding it costs ZERO
    * exchanges (the previous mapPartitions + join-back paid a full shuffle
    * to attach a column computed from the same row). All input columns are
    * carried through.
    */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    // null payloads decode like empty ones (n_bytes=0, kind=unknown), never
    // to a null struct — consumers read meta.* unconditionally
    df.withColumn(
      "meta",
      graft.functions.MediaFunctions.decode_meta(
        coalesce(col(payloadCol), lit(Array.emptyByteArray))
      )
    )

  /** Deterministic frame sampling plan for video payloads: emits
    * (id, frame_idx, ts_ms) rows at `everyMs` spacing from the decoded
    * duration — the real frame extractor consumes this plan per partition.
    */
  def frameSamplePlan(meta: DataFrame, idCol: String, everyMs: Long = 1000L): DataFrame =
    meta
      .where(col("meta.kind") === "video" && col("meta.duration_ms") > 0)
      .select(
        col(idCol),
        // half-open [0, duration): a stream of duration_ms has no frame AT
        // t = duration_ms, so the plan must not ask the extractor for one
        // (the where-guard above ensures duration_ms - 1 >= 0)
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs))).as("ts_ms")
      )
      .withColumn("frame_idx", (col("ts_ms") / everyMs).cast("long"))

  /** Aspect-preserving resize plan for image payloads: emits
    * (id, width, height, out_w, out_h, scale) rows fitting each decoded
    * image into a `maxW` x `maxH` box without upscaling — the real pixel
    * resampler consumes this plan per partition (same contract as
    * `frameSamplePlan`: the geometry math is the product path; only the
    * pixel kernel is external). Non-images and zero-dimension payloads are
    * excluded — there is nothing to resample.
    */
  def resizePlan(meta: DataFrame, idCol: String, maxW: Int = 256, maxH: Int = 256): DataFrame =
    meta
      .where(col("meta.kind") === "image" && col("meta.width") > 0 && col("meta.height") > 0)
      .select(
        col(idCol),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        least(
          lit(maxW.toDouble) / col("meta.width"),
          lit(maxH.toDouble) / col("meta.height"),
          lit(1.0)
        ).as("scale")
      )
      .select(
        col(idCol),
        col("width"),
        col("height"),
        // floor + clamp-to-1: a 10000x1 banner scaled into a 256-box must
        // not round its short side to zero pixels
        greatest(floor(col("width") * col("scale")), lit(1L)).cast("int").as("out_w"),
        greatest(floor(col("height") * col("scale")), lit(1L)).cast("int").as("out_h"),
        col("scale")
      )

  /** THE drop-in boundary, stated as a type: a real media decoder is ONE
    * function `Array[Byte] => MediaMeta` — nothing else in the dataflow
    * changes. `decodeMetaWith` runs it partition-batched and produces a
    * `meta` struct with the EXACT schema of the stub path
    * (graft.functions.MediaKernels.metaType), so `resizePlan`,
    * `frameSamplePlan` and every other meta consumer compose unchanged
    * over either path (MultimodalContractSpec pins both facts).
    */
  type Decoder = Array[Byte] => MediaMeta

  /** Decoded metadata as a plain value — the return type of the drop-in
    * decoder. Field names/types mirror `MediaKernels.metaType` 1:1.
    */
  final case class MediaMeta(
      nBytes: Long,
      magic: String,
      kind: String,
      width: Int,
      height: Int,
      durationMs: Long
  )

  /** `decodeMeta` with a caller-supplied REAL decoder: the same contract
    * (null payload decodes like empty, all input columns carried through,
    * identical `meta` schema) executed as a partition-batched transform —
    * a JNI/ffi codec context initializes once per partition inside the
    * `mapPartitions` closure, amortized over the partition's rows. Use the
    * default `decodeMeta` for the codegen'd stub; use this when an actual
    * codec is on the classpath.
    */
  def decodeMetaWith(df: DataFrame, payloadCol: String, decoder: Decoder): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val outSchema = df.schema.add("meta", graft.functions.MediaKernels.metaType, nullable = false)
    df.mapPartitions { it =>
      // a real decoder's expensive init (codec tables, native context)
      // belongs HERE — once per partition, not per row
      it.map { r =>
        val payload = r.get(idx) match {
          case b: Array[Byte] => b
          case _ => Array.emptyByteArray
        }
        val m = decoder(payload)
        Row.fromSeq(r.toSeq :+ Row(m.nBytes, m.magic, m.kind, m.width, m.height, m.durationMs))
      }
    }(Encoders.row(outSchema))
  }

  /** A REAL (if minimal) metadata decoder — pure-JVM parsing of public
    * container headers, no codec libraries: PNG IHDR (big-endian w/h at
    * bytes 16..23), GIF logical screen descriptor (little-endian w/h at
    * bytes 6..9). Anything else sniffs kind from magic bytes with zero
    * dimensions. Exists to PROVE the drop-in boundary with an actual
    * decoder in the spec — and is usable as-is for PNG/GIF corpora.
    */
  val headerDecoder: Decoder = { payload =>
    if (payload == null || payload.isEmpty) MediaMeta(0L, "", "unknown", 0, 0, 0L)
    else {
      val magic = payload.take(4).map("%02x".format(_)).mkString
      def u8(i: Int): Int = payload(i) & 0xff
      def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      if (magic.startsWith("8950") && payload.length >= 24)
        MediaMeta(payload.length.toLong, magic, "image", be32(16), be32(20), 0L)
      else if (magic.startsWith("4749") && payload.length >= 10)
        MediaMeta(payload.length.toLong, magic, "image", le16(6), le16(8), 0L)
      else MediaMeta(payload.length.toLong, magic, "unknown", 0, 0, 0L)
    }
  }

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
