package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocking-quality metrics — the standard ER evaluation of a candidate-
  * generation scheme (reduction ratio / pairs completeness / pairs quality;
  * textbook form, e.g. Christen's record-linkage survey) — computed WITHOUT
  * materializing candidate pairs:
  *
  *   - candidates          = sum over blocks of C(n, 2), from block-size
  *                           counts only — the quadratic volume is computed,
  *                           never built
  *   - reduction_ratio     = 1 - candidates / C(N, 2)
  *   - pairs_completeness  = covered gold positives / gold positives
  *                           (covered = the two members share >= 1 key)
  *   - pairs_quality       = covered / candidates
  *
  * This is the number a corpus operator reads BEFORE paying for a scoring
  * run: completeness bounds achievable recall, candidates bounds the join
  * bill. Scale shape: one map-side-combinable groupBy(key) count for block
  * sizes; coverage is two keyed joins of the gold set (small by definition)
  * against the key table; the scalars combine via 1-row cross-joins.
  */
object BlockingEval {

  def metricsDf(
      keys: DataFrame,
      gold: DataFrame,
      urlCol: String = "url",
      keyCol: String = "key"
  ): DataFrame = {
    val k = keys.select(col(urlCol).as("u"), col(keyCol).as("k")).distinct()
    val cand = k
      .groupBy("k")
      .agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(expr("n * (n - 1) DIV 2")), lit(0L)).as("candidates"))
    // N = docs that emitted at least one key: keyless docs can never pair,
    // so they belong in neither the numerator nor the C(N,2) denominator
    val nDocs = k.select("u").distinct().agg(count(lit(1)).as("n_docs"))
    val goldPos = (
      if (gold.columns.contains("label")) gold.where(col("label")).select("url_a", "url_b")
      else gold.select("url_a", "url_b")
    ).distinct()
    val goldCnt = goldPos.agg(count(lit(1)).as("gold_pairs"))
    val covered = goldPos
      .join(k.select(col("u").as("url_a"), col("k")), "url_a")
      .join(k.select(col("u").as("url_b"), col("k")), Seq("url_b", "k"), "left_semi")
      .select("url_a", "url_b")
      .distinct()
      .agg(count(lit(1)).as("covered"))
    cand
      .crossJoin(nDocs)
      .crossJoin(goldCnt)
      .crossJoin(covered)
      .select(
        col("n_docs"),
        col("candidates"),
        col("gold_pairs"),
        col("covered"),
        when(col("n_docs") < 2, 1.0)
          .otherwise(
            round(lit(1.0) - col("candidates") / expr("n_docs * (n_docs - 1) DIV 2"), 6)
          )
          .as("reduction_ratio"),
        when(col("gold_pairs") === 0, 1.0)
          .otherwise(round(col("covered") / col("gold_pairs"), 6))
          .as("pairs_completeness"),
        when(col("candidates") === 0, 1.0)
          .otherwise(round(col("covered") / col("candidates"), 6))
          .as("pairs_quality")
      )
  }
}
