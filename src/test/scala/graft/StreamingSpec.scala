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
    val q = StreamingDedup
      .blockSizeCounts(pages, window = "1 minute", watermark = "1 minute")
      .writeStream
      .format("memory")
      .queryName("block_counts")
      .outputMode("complete")
      .start()
    input.addData(
      ("http://a.com/x", new Timestamp(60000), "hello world text"),
      ("https://www.a.com/x", new Timestamp(61000), "hello world text"),
      ("http://b.com/y", new Timestamp(62000), "other text entirely")
    )
    q.processAllAvailable()
    val rows = spark.table("block_counts").collect()
    q.stop()
    val byKey = rows.map(r => r.getAs[String]("canonical_url") -> r.getAs[Long]("n")).toMap
    assert(byKey("a.com/x") == 2L)
    assert(byKey("b.com/y") == 1L)
  }
}
