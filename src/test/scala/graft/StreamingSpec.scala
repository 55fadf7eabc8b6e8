package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{Assignment, PageKeyed}

class StreamingSpec extends SparkSpec {

  test("stateful first-seen-wins dedup across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PageKeyed]
    val q = StreamingDedup
      .dedupByKey(input.toDS())
      .writeStream
      .format("memory")
      .queryName("dedup_out")
      .outputMode("append")
      .start()

    // batch 1: two pages of key k1 (earliest ts wins), one of k2
    input.addData(
      PageKeyed("k1", "url-b", new Timestamp(2000)),
      PageKeyed("k1", "url-a", new Timestamp(1000)),
      PageKeyed("k2", "url-z", new Timestamp(1000))
    )
    q.processAllAvailable()
    // batch 2: a later k1 page links to the existing canonical via state
    input.addData(PageKeyed("k1", "url-c", new Timestamp(3000)))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_out").as[Assignment].collect()
    val k1 = out.filter(_.key == "k1")
    assert(k1.length == 3)
    assert(k1.forall(_.canonical == "url-a"), s"earliest ts wins: ${k1.mkString(",")}")
    assert(k1.count(_.is_first) == 1)
    assert(out.filter(_.key == "k2").head.is_first)
  }

  test("dedup with an idle-state TTL behaves identically within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // NOTE: under ProcessingTimeTimeout the engine keeps scheduling
    // timeout-check batches, so NEITHER processAllAvailable NOR
    // Trigger.AvailableNow ever terminates the query (measured: an
    // awaitTermination(60s) here times out, the hung run is killed by the
    // next start()'s "stopping existing query" path mid-state-commit, and
    // the survivor NPEs at session teardown — a minute of hidden hang plus
    // ERROR noise per suite run). So each run polls the parquet sink for
    // the expected row count and then stops the query itself; the
    // checkpoint still carries state across the restart (the resume check).
    val base = java.nio.file.Files.createTempDirectory("graft-ttl").toString
    val input = MemoryStream[PageKeyed]
    def runOnce(expectRows: Long): Unit = {
      val q = StreamingDedup
        .dedupByKey(input.toDS(), idleTimeout = Some("1 hour"))
        .writeStream
        .format("parquet") // memory sink can't recover from a checkpoint
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def sinkRows(): Long =
        scala.util.Try(spark.read.parquet(s"$base/out").count()).getOrElse(0L)
      while (sinkRows() < expectRows && System.nanoTime() < deadline)
        Thread.sleep(200)
      q.stop()
      assert(sinkRows() >= expectRows, s"sink never reached $expectRows rows")
    }
    // a TTL far beyond the test's runtime: same first-seen-wins semantics,
    // but the state store is bounded by keys idle < TTL instead of all
    // keys ever seen (the web-scale requirement)
    input.addData(
      PageKeyed("k1", "url-b", new Timestamp(2000)),
      PageKeyed("k1", "url-a", new Timestamp(1000))
    )
    runOnce(expectRows = 2)
    val first = spark.read.parquet(s"$base/out").as[Assignment].collect()
    assert(first.length == 2)
    assert(first.forall(_.canonical == "url-a"))
    assert(first.count(_.is_first) == 1)
    // second run resumes from the checkpoint: exactly one new row, linked
    // to the canonical REMEMBERED in TTL'd state across the restart
    input.addData(PageKeyed("k1", "url-c", new Timestamp(3000)))
    runOnce(expectRows = 3)
    val second = spark.read.parquet(s"$base/out").as[Assignment].collect()
    assert(second.length == 3)
    assert(second.toSet.contains(Assignment("url-c", "k1", "url-a", is_first = false)))
  }

  test("incremental linkage: stream-static join against a batch snapshot") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch snapshot: a previous clustering of two canonical pages
    val snapshot = StreamingDedup.clusterSnapshot(
      Seq(
        ("https://www.a.com/x", "c-1"),
        ("http://a.com/x?utm=1", "c-1"),
        ("https://b.com/y", "c-2")
      ).toDF("url", "cluster_id")
    )
    val input = MemoryStream[(String, Timestamp, String)]
    val pages = input.toDF().toDF("url", "warc_ts", "text")
    val q = StreamingDedup
      .incrementalLink(pages, snapshot)
      .writeStream
      .format("memory")
      .queryName("inc_link")
      .outputMode("append")
      .start()
    input.addData(
      ("http://a.com/x", new Timestamp(1000), "known page variant"), // hits c-1
      ("https://new.org/z", new Timestamp(2000), "never seen before") // miss
    )
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("inc_link").collect().map(r => r.getAs[String]("url") -> r).toMap
    assert(rows("http://a.com/x").getAs[String]("cluster_id") == "c-1")
    assert(rows("http://a.com/x").getAs[Boolean]("linked"))
    assert(rows("https://new.org/z").getAs[String]("cluster_id") == null)
    assert(!rows("https://new.org/z").getAs[Boolean]("linked"))
  }

  test("streaming annotate + windowed block counts run on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, String)]
    val pages = input.toDF().toDF("url", "warc_ts", "text")
    input.addData(
      ("http://a.com/x", new Timestamp(60000), "hello world text"),
      ("https://www.a.com/x", new Timestamp(61000), "hello world text"),
      ("http://b.com/y", new Timestamp(62000), "other text entirely")
    )
    // AvailableNow + awaitTermination, NOT processAllAvailable + stop: the
    // watermarked complete-mode agg schedules a follow-up no-data batch
    // (watermark advance) that stop() would interrupt mid-planning — the
    // engine logs a scary-but-benign INTERNAL_ERROR NPE on every suite run
    val q = StreamingDedup
      .blockSizeCounts(pages, window = "1 minute", watermark = "1 minute")
      .writeStream
      .format("memory")
      .queryName("block_counts")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "AvailableNow query must self-terminate")
    val rows = spark.table("block_counts").collect()
    // block key = top 16 simhash bits: the two identical-text pages share
    // a content block (count 2), the unrelated text lands elsewhere
    val counts = rows.map(r => r.getAs[Long]("block_key") -> r.getAs[Long]("n")).toMap
    assert(counts.values.sum === 3L)
    assert(counts.values.toSeq.sorted === Seq(1L, 2L), s"expected blocks {2,1}, got $counts")
  }
}
