package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; the quadratic cross join is
  * the scale ceiling). Scale path: sign-LSH (random-hyperplane) bucketing —
  * candidates share a bucket, the quadratic term shrinks to bucket-local
  * joins; recall is tuned by bits/tables. Hyperplanes are derived from a
  * deterministic hash so results are reproducible with no stored model.
  */
object SimilaritySearch {

  /** Cosine similarity between two array<double> columns (in index order —
    * deterministic summation; native codegen kernel).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.SimilarityFunctions.dense_cosine(a, b)

  /** `bits`-bit sign-LSH bucket id: bit p = sign of the dot product with a
    * pseudo-random hyperplane h_p, where h_p[i] = scaled hash(i, p).
    */
  def hyperplaneBucket(v: Column, bits: Int, seed: Int = 0): Column = {
    val bitCols = (0 until bits).map { p =>
      val proj = aggregate(
        zip_with(
          v,
          transform(
            sequence(lit(0), size(v) - 1),
            i => (pmod(xxhash64(i, lit(p + seed * 10007)), lit(1000)) - 500.0) / 500.0
          ),
          (x, h) => x * h
        ),
        lit(0.0),
        (acc, x) => acc + x
      )
      when(proj >= 0, lit(1)).otherwise(lit(0)).cast("string")
    }
    concat(bitCols: _*)
  }

  /** Exact brute-force cosine top-k: for each query row, the k nearest
    * corpus rows. Broadcast the smaller (query) side; the corpus streams.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor"), col(vecCol).cast("array<double>").as("cv"))
    val scored = c
      .join(broadcast(q), lit(true))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("neighbor").asc)
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select("qid", "rk", "neighbor", "cos")
  }

  /** LSH-bucketed ANN top-k: queries only meet corpus rows in the same
    * bucket (one equi-join instead of a cross join). `tables` independent
    * hash tables trade compute for recall; results are deduped across
    * tables before ranking.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 8,
      tables: Int = 2
  ): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor"), col(vecCol).cast("array<double>").as("cv"))
    def keyed(df: DataFrame, vec: String): DataFrame = {
      val keys = (0 until tables).map(t => concat(lit(s"t$t:"), hyperplaneBucket(col(vec), bits, seed = t)))
      df.withColumn("key", explode(array(keys: _*)))
    }
    val candidates = keyed(q, "qv")
      .join(keyed(c, "cv"), "key")
      .select("qid", "qv", "neighbor", "cv")
      .dropDuplicates("qid", "neighbor")
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("neighbor").asc)
    candidates
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select("qid", "rk", "neighbor", "cos")
  }
}
