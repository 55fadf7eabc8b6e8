package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Normalize
import graft.functions.SimilarityFunctions.simhash64

/** Streaming face of the engine (Structured Streaming): pages arrive as a
  * stream, blocking keys and fingerprints are emitted incrementally, and a
  * stateful first-seen-wins dedup assigns each page to its canonical —
  * the reference's queue-worker incrementality
  * (/root/reference/app/services/task_queue.py:56-75, SSE progress
  * routes.py:552-575) re-expressed as an incremental dataflow instead of a
  * polling loop.
  */
object StreamingDedup {

  /** Narrow (fully streaming-safe) enrichment: canonical url, content
    * fingerprint, blocking keys. No state, no shuffle.
    */
  def annotate(pages: DataFrame): DataFrame =
    pages
      .withColumn("canonical_url", Normalize.canonicalUrl(col("url")))
      .withColumn("fingerprint", simhash64(Normalize.tokensOf(col("text"))))

  final case class PageKeyed(key: String, url: String, ts: java.sql.Timestamp)
  final case class Assignment(url: String, key: String, canonical: String, is_first: Boolean)

  /** Stateful exact dedup by key (e.g. canonical url or content sha):
    * the first page seen for a key becomes canonical; later arrivals link
    * to it. State per key = the canonical url.
    *
    * `idleTimeout` (e.g. "30 days"): without it, state grows with DISTINCT
    * KEYS FOREVER — at web scale the state store itself becomes the
    * bottleneck. With it, a key idle longer than the TTL is evicted and a
    * later duplicate of an evicted key starts a new canonical: the dedup
    * horizon becomes the TTL, which is the standard trade for an unbounded
    * stream (exact forever-dedup belongs to the batch pipeline over the
    * accumulated corpus).
    */
  def dedupByKey(
      keyed: Dataset[PageKeyed],
      idleTimeout: Option[String] = None
  ): Dataset[Assignment] = {
    import keyed.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    keyed
      .groupByKey(_.key)
      .flatMapGroupsWithState[String, Assignment](
        OutputMode.Append(),
        timeoutConf
      ) { case (key, rows, state: GroupState[String]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          val sorted = rows.toSeq.sortBy(p => (p.ts.getTime, p.url))
          val out = scala.collection.mutable.ListBuffer.empty[Assignment]
          var canonical = state.getOption.orNull
          sorted.foreach { p =>
            if (canonical == null) {
              canonical = p.url
              state.update(canonical)
              out += Assignment(p.url, key, canonical, is_first = true)
            } else {
              out += Assignment(p.url, key, canonical, is_first = false)
            }
          }
          // refresh the TTL on every batch that touches the key (state is
          // always defined here: canonical was set above if absent)
          idleTimeout.foreach(state.setTimeoutDuration)
          out.iterator
        }
      }
  }

  /** Incremental linkage: a stream of new pages joined against the latest
    * batch clustering snapshot (stream-static join — the static side is a
    * (key, cluster_id) frame derived from a previous `LinkagePipeline.run`
    * output; Spark re-reads its source per micro-batch, so a refreshed
    * snapshot dir picks up new batch runs without restarting the query).
    * New pages that hit an existing block inherit its cluster; misses come
    * out with a null cluster_id = the to-re-cluster queue (the reference's
    * queue-worker pattern, task_queue.py:56-75, as a dataflow).
    */
  def incrementalLink(pages: DataFrame, clusterSnapshot: DataFrame): DataFrame = {
    val keyed = annotate(pages).withColumn("key", concat(lit("u:"), col("canonical_url")))
    val lookup = clusterSnapshot.select(col("key"), col("cluster_id"))
    keyed
      .join(lookup, Seq("key"), "left")
      .select(
        col("url"),
        col("key"),
        col("cluster_id"),
        col("cluster_id").isNotNull.as("linked"),
        col("fingerprint")
      )
  }

  /** The static side for `incrementalLink`, derived from a batch
    * predictions frame (url, cluster_id, ...): canonical-url block key ->
    * cluster id, deduped deterministically by min cluster_id.
    */
  def clusterSnapshot(predictions: DataFrame): DataFrame =
    predictions
      .select(concat(lit("u:"), Normalize.canonicalUrl(col("url"))).as("key"), col("cluster_id"))
      .groupBy("key")
      .agg(min("cluster_id").as("cluster_id"))

  /** Windowed near-dup candidate counting with a watermark: pages grouped
    * by simhash-chunk key (top 16 fingerprint bits — a content block, the
    * batch near-dup blocking analog) over event-time windows. Emits
    * per-block arrival counts for skew watching; canonical urls are
    * near-unique, so grouping by THEM would make every count ~1 and the
    * skew monitor vacuous.
    */
  def blockSizeCounts(pages: DataFrame, window: String = "1 minute", watermark: String = "2 minutes"): DataFrame =
    annotate(pages)
      .withWatermark("warc_ts", watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col("warc_ts"), window),
        shiftright(col("fingerprint"), 48).as("block_key")
      )
      .agg(count(lit(1)).as("n"))
}
