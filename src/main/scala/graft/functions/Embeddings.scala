package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding storage/compute transforms as pure built-in column
  * expressions (codegen'd, row-local, zero exchanges): L2 normalization
  * and symmetric int8 quantization — at 100 TB of embeddings the int8
  * form is 4x less storage and shuffle, and cosine on L2-normalized
  * vectors is a plain dot product.
  *
  * Quantization rounds with floor(x/scale + 0.5) EXPLICITLY (not the
  * engine's round()): Java Math.round and SQL round() disagree on
  * negative halves, so the explicit floor form is the contract both the
  * engine and the DuckDB oracle replay bit-for-bit.
  */
object EmbeddingFunctions {

  /** L2-normalized copy of an array<float|double> column; the zero vector
    * stays zero (no NaN).
    */
  def l2Normalize(v: Column): Column = {
    val d = transform(v, x => x.cast("double"))
    val norm = sqrt(aggregate(d, lit(0.0), (acc, x) => acc + x * x))
    when(norm === 0.0, d).otherwise(transform(d, x => x / norm))
  }

  /** Symmetric int8 quantization: scale = max|x| / 127, q_i =
    * clamp(floor(x_i/scale + 0.5), -127, 127). Returns
    * struct(scale: double, q: array<tinyint>); an all-zero vector gets
    * scale 0 and zero codes. Reconstruction error is <= scale/2 per
    * coordinate by construction.
    */
  def quantizeInt8(v: Column): Column = {
    val d = transform(v, x => x.cast("double"))
    val scale = array_max(transform(d, x => abs(x))) / 127.0
    struct(
      scale.as("scale"),
      transform(
        d,
        x =>
          when(scale === 0.0, lit(0))
            .otherwise(greatest(lit(-127), least(lit(127), floor(x / scale + 0.5).cast("int"))))
            .cast("byte")
      ).as("q")
    )
  }

  /** Inverse of [[quantizeInt8]]: array<double> with per-coordinate error
    * <= scale/2 vs the original.
    */
  def dequantizeInt8(qv: Column): Column =
    transform(qv.getField("q"), q => q.cast("double") * qv.getField("scale"))
}
