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
