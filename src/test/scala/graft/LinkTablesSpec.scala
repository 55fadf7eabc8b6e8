package graft

import org.apache.spark.sql.functions._

import graft.operators.LinkTables
import graft.pipeline.LinkagePipeline

class LinkTablesSpec extends SparkSpec {
  import spark.implicits._

  test("candidatePairs emits cross-table pairs only, table-keyed orientation") {
    val ka = Seq(("a1", "k1"), ("a2", "k1"), ("a3", "k2")).toDF("url", "key")
    val kb = Seq(("b1", "k1"), ("b2", "k3")).toDF("url", "key")
    val got = LinkTables
      .candidatePairs(ka, kb)
      .select("url_a", "url_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    // a1-a2 (intra-A, same block) must NOT appear; url_a is always A-side
    assert(got === Set(("a1", "b1"), ("a2", "b1")))
  }

  test("run links matching rows across tables; oneToOne reduces to a matching") {
    def words(seed: Int): String =
      (0 until 40).map(i => f"w${(seed * 31 + i * 7) % 997}%03d").mkString(" ")
    // two A-rows near-duplicate ONE B-row: many-to-many keeps both links,
    // oneToOne keeps exactly one
    val a = Seq(
      ("a1", words(10)),
      ("a2", words(10).replaceFirst("w0", "x0")),
      ("a3", words(20))
    ).toDF("url", "text")
    val b = Seq(
      ("b1", words(10).replaceFirst("w1", "y1")),
      ("b2", words(30))
    ).toDF("url", "text")

    val links = LinkTables.run(a, b).cache()
    val pairs = links.select("url_a", "url_b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs === Set(("a1", "b1"), ("a2", "b1")), s"got $pairs")
    // intra-table near-dups (a1~a2) never link in link_only mode
    assert(!pairs.exists { case (x, y) => x.startsWith("a") && y.startsWith("a") })

    val one = LinkTables.run(a, b, oneToOne = true)
    val onePairs = one.select("url_a", "url_b").collect().map(r => (r.getString(0), r.getString(1)))
    assert(onePairs.length === 1 && onePairs(0)._2 === "b1")
    assert(one.columns.contains("round"))
  }

  test("oneToOne keeps links whose B-side url sorts BELOW the A-side (r5 orientation bug)") {
    def words(seed: Int): String =
      (0 until 40).map(i => f"w${(seed * 31 + i * 7) % 997}%03d").mkString(" ")
    // every B url ("0...") sorts below every A url ("z...") — with the old
    // table-keyed join-back in oneToOne this returned ZERO rows
    val a = Seq(("za1", words(10)), ("za2", words(20))).toDF("url", "text")
    val b = Seq(("0b1", words(10).replaceFirst("w1", "y1"))).toDF("url", "text")
    val one = LinkTables.run(a, b, oneToOne = true)
    val got = one.select("url_a", "url_b").collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("za1", "0b1")), s"got ${got.mkString(",")}")
  }

  test("CLI --link-to drives link_only end-to-end and writes the link frame") {
    def words(seed: Int): String =
      (0 until 40).map(i => f"w${(seed * 31 + i * 7) % 997}%03d").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft-linkto").toString
    Seq(("a1", words(10)), ("a2", words(20)))
      .toDF("url", "text").write.mode("overwrite").parquet(s"$tmp/a")
    Seq(("b1", words(10).replaceFirst("w0", "x0")), ("b2", words(30)))
      .toDF("url", "text").write.mode("overwrite").parquet(s"$tmp/b")
    graft.cli.Main.run(
      spark,
      Map("input" -> s"$tmp/a", "output" -> s"$tmp/links", "link-to" -> s"$tmp/b", "one-to-one" -> "true")
    )
    val links = spark.read.parquet(s"$tmp/links")
    assert(links.columns.toSeq === Seq("url_a", "url_b", "key", "score", "round"))
    val got = links.select("url_a", "url_b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a1", "b1")), s"got $got")
  }

  test("run refuses window passes (rank windows interleave the tables)") {
    val a = Seq(("a1", "x")).toDF("url", "text")
    val b = Seq(("b1", "y")).toDF("url", "text")
    intercept[IllegalArgumentException] {
      LinkTables.run(a, b, LinkagePipeline.Config(windowPasses = Seq(("url", 3))))
    }
  }
}
