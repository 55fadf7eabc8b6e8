package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probability-calibration evaluation for scored pairs: reliability bins,
  * expected / maximum calibration error (ECE / MCE, Naeini et al. AAAI'15)
  * and the Brier score. A probabilistic linker (Fellegi–Sunter posteriors,
  * [[graft.operators.FellegiSunter]]) is only as decision-ready as its
  * calibration — a threshold of 0.8 means "4:1 odds" only if p≈0.8 pairs
  * are matches ~80% of the time. The reference trusts its LLM confidence
  * verbatim (the decision cutoff at lion_linker/lion_linker.py:969);
  * this operator is the audit that trust needs.
  *
  * Semantics (equal-width binning, the standard reliability diagram):
  * bin(p) = min(floor(p·bins), bins−1) — p = 1.0 falls in the top bin;
  * null scores are dropped. Per bin: n, mean predicted probability
  * (Σp/n), empirical match rate (positives/n), and the absolute gap.
  * ECE = Σ_b (n_b/N)·|rate_b − mean_p_b|; MCE = max_b of the gap;
  * Brier = Σ(p − y)² / N.
  *
  * Scale shape: ONE aggregation of the pair set down to ≤ bins rows
  * (map-side partial combine; bins is a constant), then constant-size
  * arithmetic. The summary is a second pass folded into the SAME
  * aggregated frame (no extra scan of the data). Nothing corpus-sized is
  * collected, no window over data, no shuffle beyond the bins-row
  * hash-agg. At 10^12 pairs this is the cheapest eval in the suite.
  *
  * Determinism note for cross-engine oracles: all outputs are plain sums
  * and single divisions — when scores sit on a dyadic grid (k/2^m) the
  * per-bin sums are EXACT in any accumulation order, so the emitted
  * doubles are bit-identical across engines without rounding.
  */
object Calibration {

  /** Per-bin reliability table: (bin, n, sum_p, positives, mean_p,
    * frac_pos, abs_gap), one row per non-empty bin, bin ascending.
    */
  /** Null-handling contract: null SCORES are dropped (no bin); null LABELS
    * are counted as negatives (`when(y,1).otherwise(0)`) — on a partially
    * labeled pair set, filter `labelCol IS NOT NULL` upstream if unlabeled
    * pairs must not deflate frac_pos/ECE/Brier.
    */
  def reliability(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int = 10
  ): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val p = col(scoreCol).cast("double")
    val y = col(labelCol).cast("boolean")
    scored
      .where(p.isNotNull)
      .groupBy(least(floor(p * bins), lit(bins - 1)).cast("long").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(p).as("sum_p"),
        sum(when(y, 1L).otherwise(0L)).as("positives")
      )
      .select(
        col("bin"),
        col("n"),
        col("sum_p"),
        col("positives"),
        (col("sum_p") / col("n")).as("mean_p"),
        (col("positives").cast("double") / col("n")).as("frac_pos"),
        abs(col("positives").cast("double") / col("n") - col("sum_p") / col("n")).as("abs_gap")
      )
  }

  /** One-row calibration summary: (n, brier, ece, mce).
    *
    * ECE is accumulated as Σ_b |positives_b − sum_p_b| / N — algebraically
    * (n_b/N)·|rate − mean_p| with the n_b cancelled BEFORE any division,
    * so on grid-valued scores every addend is exact and the bin-order of
    * the final ≤ bins-row sum cannot change the result.
    */
  def metricsDf(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int = 10
  ): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val p = col(scoreCol).cast("double")
    val y = col(labelCol).cast("boolean")
    val perBin = scored
      .where(p.isNotNull)
      .groupBy(least(floor(p * bins), lit(bins - 1)).cast("long").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(p).as("sum_p"),
        sum(when(y, 1L).otherwise(0L)).as("pos"),
        sum((p - when(y, 1.0).otherwise(0.0)) * (p - when(y, 1.0).otherwise(0.0))).as("sq")
      )
    perBin
      .agg(
        sum("n").as("n"),
        sum("sq").as("sq_sum"),
        sum(abs(col("pos").cast("double") - col("sum_p"))).as("gap_sum"),
        max(abs(col("pos").cast("double") / col("n") - col("sum_p") / col("n"))).as("mce")
      )
      .select(
        col("n"),
        (col("sq_sum") / col("n")).as("brier"),
        (col("gap_sum") / col("n")).as("ece"),
        col("mce")
      )
  }
}
