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
    * stays zero (no NaN). The norm is bound ONCE per row via aggregate's
    * finish lambda — referencing the reduction inside the per-element
    * transform would re-run the O(n) sum for every element (O(n^2)/row).
    */
  def l2Normalize(v: Column): Column = {
    val d = transform(v, x => x.cast("double"))
    aggregate(
      d,
      lit(0.0),
      (acc, x) => acc + x * x,
      acc => when(acc === 0.0, d).otherwise(transform(d, x => x / sqrt(acc)))
    )
  }

  /** Symmetric int8 quantization: scale = max|x| / 127, q_i =
    * clamp(floor(x_i/scale + 0.5), -127, 127). Returns
    * struct(scale: double, q: array<tinyint>); an all-zero vector gets
    * scale 0 and zero codes. Reconstruction error is <= scale/2 per
    * coordinate by construction.
    */
  def quantizeInt8(v: Column): Column = {
    val d = transform(v, x => x.cast("double"))
    // max|x| reduces once and binds in the finish lambda (same O(n)/row
    // reasoning as l2Normalize); inside the element lambda `scale` is a
    // bound-variable reference, not a re-evaluated reduction
    aggregate(
      d,
      lit(0.0),
      (m, x) => greatest(m, abs(x)),
      m => {
        val scale = m / 127.0
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
    )
  }

  /** Inverse of [[quantizeInt8]]: array<double> with per-coordinate error
    * <= scale/2 vs the original.
    */
  def dequantizeInt8(qv: Column): Column =
    transform(qv.getField("q"), q => q.cast("double") * qv.getField("scale"))
}
