package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Threshold-sweep precision/recall over scored candidate pairs — the
  * operating-point picker every probabilistic linker needs next to the
  * fixed-threshold decision rule (reference decides at one LLM-confidence
  * cutoff, lion_linker/lion_linker.py:969; Splink-style workflows instead
  * sweep the match-weight axis and read the PR trade-off).
  *
  * Semantics: a pair is predicted MATCH at threshold t iff score >= t.
  * Scores are quantized to `granularity` buckets (bucket = floor(score *
  * granularity), pure double arithmetic — no decimal rounding modes), so
  * the sweep is ONE aggregation down to at most granularity+2 rows plus a
  * window over that bounded frame. The corpus-sized pair set is touched
  * exactly once; the single-partition window runs on <= a few hundred rows
  * by construction, never on data-sized input — the 100 TB shape.
  *
  * Output, one row per observed bucket, descending-threshold cumulative:
  * (thr_bucket, tp, fp, fn, precision, recall, f1) with thr_bucket BIGINT
  * (threshold = thr_bucket / granularity).
  */
object PrCurve {

  def sweep(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String,
      granularity: Int = 100
  ): DataFrame = {
    require(granularity > 0, s"granularity must be positive, got $granularity")
    val bucket = floor(col(scoreCol) * granularity).cast("long")
    val perBucket = scored
      .where(col(scoreCol).isNotNull)
      .groupBy(bucket.as("thr_bucket"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"),
        count(lit(1)).as("n")
      )
    // cumulative from the highest threshold down; the frame is bounded by
    // granularity, so the unpartitioned window is a constant-size merge
    val byThr = Window.orderBy(col("thr_bucket").desc)
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perBucket
      .withColumn("tp", sum(col("pos")).over(byThr))
      .withColumn("fp", sum(col("n") - col("pos")).over(byThr))
      .withColumn("total_pos", sum(col("pos")).over(all))
      .select(
        col("thr_bucket"),
        col("tp"),
        col("fp"),
        (col("total_pos") - col("tp")).as("fn"),
        round(col("tp").cast("double") / greatest(col("tp") + col("fp"), lit(1L)), 6)
          .as("precision"),
        round(col("tp").cast("double") / greatest(col("total_pos"), lit(1L)), 6).as("recall"),
        round(
          lit(2.0) * col("tp").cast("double") /
            greatest(lit(2L) * col("tp") + col("fp") + (col("total_pos") - col("tp")), lit(1L)),
          6
        ).as("f1")
      )
  }

  /** Average precision over the same descending-threshold sweep:
    * AP = sum_i (recall_i - recall_{i-1}) * precision_i. One row:
    * (total_pos, n_thresholds, ap). Same bounded-window shape as [[sweep]].
    */
  def averagePrecision(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String,
      granularity: Int = 100
  ): DataFrame = {
    val curve = sweep(scored, scoreCol, labelCol, granularity)
    val byThr = Window.orderBy(col("thr_bucket").desc)
    curve
      .withColumn("prev_recall", coalesce(lag(col("recall"), 1).over(byThr), lit(0.0)))
      .agg(
        max(col("tp") + col("fn")).as("total_pos"),
        count(lit(1)).as("n_thresholds"),
        round(sum((col("recall") - col("prev_recall")) * col("precision")), 6).as("ap")
      )
  }

  /** Operating-point pick from a [[sweep]]: the max-F1 row, ties broken
    * toward the HIGHER threshold (the more precise of two equal-F1
    * points). Returns (threshold, precision, recall, f1) with threshold =
    * thr_bucket / granularity. Driver-side max over the ≤granularity-row
    * sweep frame — nothing data-sized moves.
    */
  def bestThreshold(sweepDf: DataFrame, granularity: Int = 100): (Double, Double, Double, Double) = {
    require(granularity > 0, s"granularity must be positive, got $granularity")
    val rows = sweepDf.select("thr_bucket", "precision", "recall", "f1").collect()
    require(rows.nonEmpty, "bestThreshold on an empty sweep (no non-null scores)")
    val best = rows.maxBy(r => (r.getDouble(3), r.getLong(0)))
    (best.getLong(0).toDouble / granularity, best.getDouble(1), best.getDouble(2), best.getDouble(3))
  }
}
