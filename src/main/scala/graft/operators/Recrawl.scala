package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recrawl canonicalization over capture streams (url, warc_ts, text) —
  * the Common-Crawl-shaped input (north-rule schema) re-crawls the same
  * url across snapshots, so every corpus job needs a "which capture
  * counts" answer BEFORE any linkage or dedup math sees the table. The
  * reference never faces this (its inputs are per-task CSV uploads,
  * app/api/routes.py:244-337); at web scale it is the first operator in
  * the pipeline.
  *
  * `warc_ts` may be any orderable type (timestamp, epoch long, sortable
  * string) — the operators only compare it.
  */
object Recrawl {

  /** The newest capture per url: groupBy(url) + max(struct(ts, text)) —
    * ONE hash aggregation with map-side partial combine (no window, no
    * row_number, no secondary sort), so a url recrawled a million times
    * costs its partitions one running max each, not a million-row group
    * materialization. Ties on warc_ts break on the larger text
    * (lexicographic) — deterministic under re-partitioning by struct-max
    * totality.
    *
    * Output: (url, warc_ts, text) of the winning capture.
    */
  def latestSnapshot(
      pages: DataFrame,
      urlCol: String = "url",
      tsCol: String = "warc_ts",
      textCol: String = "text"
  ): DataFrame =
    pages
      .groupBy(col(urlCol).as("url"))
      .agg(max(struct(col(tsCol).as("ts"), col(textCol).as("text"))).as("w"))
      .select(col("url"), col("w.ts").as(tsCol), col("w.text").as(textCol))

  /** Per-url capture census: how often a url was crawled, how often its
    * text actually CHANGED, and the capture span — the stability signal
    * that decides refresh scheduling and whether a url's history is worth
    * versioned storage. `n_versions` counts distinct text contents
    * (hash-free: countDistinct on the raw text would shuffle documents —
    * a sha256 travels instead). One aggregation, one row per url.
    *
    * Output: (url, n_captures, n_versions, first_ts, last_ts, stable)
    * with stable = (n_versions == 1).
    */
  def changeCensus(
      pages: DataFrame,
      urlCol: String = "url",
      tsCol: String = "warc_ts",
      textCol: String = "text"
  ): DataFrame =
    pages
      .groupBy(col(urlCol).as("url"))
      .agg(
        count(lit(1)).as("n_captures"),
        countDistinct(sha2(col(textCol), 256)).as("n_versions"),
        min(col(tsCol)).as("first_ts"),
        max(col(tsCol)).as("last_ts")
      )
      .withColumn("stable", col("n_versions") === 1)
}
