package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Active-learning pair selection for training a linkage model — the
  * published loop (ALIAS: Sarawagi & Bhamidipaty, KDD 2002; also the
  * Magellan/dedupe.io workflow) that replaces the reference's
  * label-everything LLM pass with "label only the pairs the current model
  * is least sure about", re-estimate (e.g. FellegiSunter.emEstimate), and
  * repeat.
  */
object ActiveLearning {

  /** Uncertainty sample: the `k` candidate pairs whose posterior is
    * closest to 0.5 (maximum binary entropy), deterministic tie-break on
    * (id_a, id_b). Adds `uncertainty` = |p - 0.5|.
    *
    * Scale shape: orderBy+limit compiles to TakeOrderedAndProject —
    * per-partition top-k then a k*P-row driver merge, never a global sort;
    * k is the human labeling budget (small by definition).
    */
  def uncertaintyBatch(
      scored: DataFrame,
      pCol: String,
      k: Int,
      idA: String = "id_a",
      idB: String = "id_b"
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    scored
      .where(col(pCol).isNotNull)
      .withColumn("uncertainty", abs(col(pCol) - 0.5))
      .orderBy(col("uncertainty").asc, col(idA).asc, col(idB).asc)
      .limit(k)
  }

  /** Disagreement (query-by-committee, Freund et al. 1997) sample: the `k`
    * pairs where two scorers disagree the most — e.g. an EM-estimated
    * Fellegi-Sunter posterior vs a string-similarity score. Adds
    * `disagreement` = |p1 - p2|; same top-k shape as [[uncertaintyBatch]].
    */
  def committeeBatch(
      scored: DataFrame,
      p1Col: String,
      p2Col: String,
      k: Int,
      idA: String = "id_a",
      idB: String = "id_b"
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    scored
      .where(col(p1Col).isNotNull && col(p2Col).isNotNull)
      .withColumn("disagreement", abs(col(p1Col) - col(p2Col)))
      .orderBy(col("disagreement").desc, col(idA).asc, col(idB).asc)
      .limit(k)
  }
}
