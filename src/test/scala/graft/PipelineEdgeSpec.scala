package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.LinkagePipeline

/** Degenerate-input behavior of the flagship pipeline: a production run
  * over arbitrary web partitions WILL see empty splits, single-page
  * domains, and corpora where no pair clears the threshold — none of
  * these may throw or change the output contract.
  */
class PipelineEdgeSpec extends SparkSpec {

  private val outSchema = Seq("url", "cluster_id", "score", "status", "text", "seq")

  private def corpus(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("url", "text")
  }

  test("empty corpus yields an empty frame with the full prediction schema") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("url", StringType), StructField("text", StringType)))
    )
    val out = LinkagePipeline.run(empty)
    assert(out.columns.toSeq.sorted == outSchema.sorted)
    assert(out.count() === 0)
  }

  test("single document becomes its own nil singleton with seq 1") {
    val out = LinkagePipeline.run(corpus("http://a.example.com/x" -> "only page here")).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[String]("cluster_id") === "http://a.example.com/x")
    assert(r.getAs[String]("status") === "nil")
    assert(r.getAs[Long]("seq") === 1L)
  }

  test("no accepted edges: every doc is a nil singleton, seq stays dense") {
    // pairwise-dissimilar texts on distinct domains: no blocking key collides
    val out = LinkagePipeline
      .run(corpus(
        "http://a.example.com/1" -> "alpha bravo charlie delta",
        "http://b.example.org/2" -> "zulu yankee xray whiskey",
        "http://c.example.net/3" -> "lorem ipsum dolor sit amet"
      ))
      .collect()
    assert(out.length === 3)
    assert(out.forall(_.getAs[String]("status") == "nil"))
    assert(out.forall(r => r.getAs[String]("cluster_id") == r.getAs[String]("url")))
    assert(out.map(_.getAs[Long]("seq")).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("blank and null texts survive as nil singletons with text preserved") {
    val out = LinkagePipeline
      .run(corpus(
        "http://a.example.com/1" -> "",
        "http://a.example.com/2" -> "   ",
        "http://a.example.com/3" -> null
      ))
      .collect()
    assert(out.length === 3)
    assert(out.forall(_.getAs[String]("status") == "nil"))
    val byUrl = out.map(r => r.getAs[String]("url") -> r.getAs[String]("text")).toMap
    assert(byUrl("http://a.example.com/1") == "")
    assert(byUrl("http://a.example.com/2") == "   ")
    assert(byUrl("http://a.example.com/3") == null)
  }

  test("unicode urls and text link and round-trip byte-identically") {
    val t = "café résumé 日本語 😀 page content"
    val out = LinkagePipeline
      .run(corpus(
        "http://x.example.com/café?utm_source=a" -> t,
        "http://x.example.com/café" -> t
      ))
      .collect()
    assert(out.length === 2)
    assert(out.forall(_.getAs[String]("text") == t))
    // identical text + same canonical url => one cluster
    assert(out.map(_.getAs[String]("cluster_id")).distinct.length === 1)
    assert(out.forall(_.getAs[String]("status") == "linked"))
  }
}
