package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise precision/recall/F1 of cluster assignments against gold pairs —
  * the ported evaluation harness (reference pattern: gold `title_QID` column
  * scored offline against `{col}_pred_id`,
  * /root/reference/tests/data/film_with_QIDs.csv + gt-exclusion
  * lion_linker/lion_linker.py:196,945,969).
  */
object PairwiseEval {

  final case class Metrics(tp: Long, fp: Long, fn: Long) {
    def precision: Double = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    def recall: Double = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
    def f1: Double =
      if (precision + recall == 0) 0.0 else 2 * precision * recall / (precision + recall)
  }

  /** All predicted same-cluster pairs (url_a < url_b) from an assignment
    * frame (url, cluster_id). Self-join within cluster; singleton clusters
    * emit nothing.
    */
  def predictedPairs(assignments: DataFrame): DataFrame = {
    val a = assignments.select(col("url").as("url_a"), col("cluster_id"))
    val b = assignments.select(col("url").as("url_b"), col("cluster_id"))
    a.join(b, "cluster_id").where(col("url_a") < col("url_b")).select("url_a", "url_b")
  }

  /** Global pairwise metrics: gold = (url_a, url_b [, label]) with
    * url_a < url_b; only label=true rows (or all rows if no label column)
    * count as gold-positive.
    */
  def metrics(assignments: DataFrame, gold: DataFrame): Metrics = {
    val pred = predictedPairs(assignments)
    // dedup: a gold pair listed under several block keys/strategies must
    // count once (the semi-join tp would, but a duplicated row inflates fn)
    val goldPos = (
      if (gold.columns.contains("label")) gold.where(col("label")).select("url_a", "url_b")
      else gold.select("url_a", "url_b")
    ).distinct()
    val tp = pred.join(goldPos, Seq("url_a", "url_b"), "left_semi").count()
    val fp = pred.join(goldPos, Seq("url_a", "url_b"), "left_anti").count()
    val fn = goldPos.join(pred, Seq("url_a", "url_b"), "left_anti").count()
    Metrics(tp, fp, fn)
  }

  /** `metrics` as ONE distributed job returning a 1-row frame
    * (tp, fp, fn, precision, recall, f1) — a single full-outer join + agg
    * instead of three separate count actions; the battery/production form
    * (the driver-side [[metrics]] stays for tests and small evals).
    */
  def metricsDf(assignments: DataFrame, gold: DataFrame): DataFrame = {
    val pred = predictedPairs(assignments).withColumn("p", lit(1))
    val goldPos =
      (if (gold.columns.contains("label")) gold.where(col("label")) else gold)
        .select("url_a", "url_b")
        // dedup before the full-outer join: a duplicated gold pair would
        // fan out the join and double-count tp/fn vs the semi-join form
        .distinct()
        .withColumn("g", lit(1))
    pred
      .join(goldPos, Seq("url_a", "url_b"), "full_outer")
      .agg(
        sum(when(col("p").isNotNull && col("g").isNotNull, 1L).otherwise(0L)).as("tp"),
        sum(when(col("p").isNotNull && col("g").isNull, 1L).otherwise(0L)).as("fp"),
        sum(when(col("p").isNull && col("g").isNotNull, 1L).otherwise(0L)).as("fn")
      )
      .select(
        col("tp"),
        col("fp"),
        col("fn"),
        when(col("tp") + col("fp") === 0, 1.0)
          .otherwise(round(col("tp") / (col("tp") + col("fp")), 6))
          .as("precision"),
        when(col("tp") + col("fn") === 0, 1.0)
          .otherwise(round(col("tp") / (col("tp") + col("fn")), 6))
          .as("recall"),
        when(col("tp") + col("fp") === 0 && col("tp") + col("fn") === 0, 1.0)
          .when(col("tp") === 0, 0.0)
          .otherwise(round(lit(2.0) * col("tp") / (lit(2) * col("tp") + col("fp") + col("fn")), 6))
          .as("f1")
      )
  }

  /** Per-blocking-key metrics (north rule: F1 within each blocking key).
    * Gold must carry `block_key`. Returns (block_key, tp, fp, fn, f1); FP
    * pairs are attributed to keys via the gold key of either member (min
    * key when a member appears under several) — predicted pairs with no
    * gold key on either member count under key '__unblocked__'.
    */
  def metricsPerKey(assignments: DataFrame, gold: DataFrame): DataFrame = {
    val pred = predictedPairs(assignments).withColumn("p", lit(1))
    val goldPos = gold
      .where(col("label"))
      .select("url_a", "url_b", "block_key")
      // dedup before the full-outer join, same guard as metrics/metricsDf:
      // a gold pair repeated (per-strategy union) would fan out the join
      // and double-count tp/fn for its key
      .distinct()
      .withColumn("g", lit(1))
    // member -> gold key map (bounded by |gold|, broadcastable): lets a
    // false-positive pair land on the block that actually produced it
    val urlKey = goldPos
      .select(col("url_a").as("u"), col("block_key"))
      .unionAll(goldPos.select(col("url_b").as("u"), col("block_key")))
      .groupBy("u")
      .agg(min("block_key").as("member_key"))
    pred
      .join(goldPos, Seq("url_a", "url_b"), "full_outer")
      .join(broadcast(urlKey.select(col("u").as("url_a"), col("member_key").as("k_a"))), Seq("url_a"), "left")
      .join(broadcast(urlKey.select(col("u").as("url_b"), col("member_key").as("k_b"))), Seq("url_b"), "left")
      .withColumn("block_key", coalesce(col("block_key"), col("k_a"), col("k_b"), lit("__unblocked__")))
      .groupBy("block_key")
      .agg(
        sum(when(col("p").isNotNull && col("g").isNotNull, 1L).otherwise(0L)).as("tp"),
        sum(when(col("p").isNotNull && col("g").isNull, 1L).otherwise(0L)).as("fp"),
        sum(when(col("p").isNull && col("g").isNotNull, 1L).otherwise(0L)).as("fn")
      )
      .withColumn("precision", when(col("tp") + col("fp") === 0, 1.0).otherwise(col("tp") / (col("tp") + col("fp"))))
      .withColumn("recall", when(col("tp") + col("fn") === 0, 1.0).otherwise(col("tp") / (col("tp") + col("fn"))))
      .withColumn(
        "f1",
        when(col("precision") + col("recall") === 0, 0.0)
          .otherwise(lit(2.0) * col("precision") * col("recall") / (col("precision") + col("recall")))
      )
  }
}
