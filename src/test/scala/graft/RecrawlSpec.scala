package graft

import org.apache.spark.sql.functions._

import graft.operators.Recrawl

class RecrawlSpec extends SparkSpec {
  import spark.implicits._

  private val caps = Seq(
    // u1: three captures, text changes on the last
    ("u1", 100L, "alpha"),
    ("u1", 200L, "alpha"),
    ("u1", 300L, "beta"),
    // u2: single capture
    ("u2", 50L, "gamma"),
    // u3: tied timestamps — the lexicographically larger text must win
    ("u3", 10L, "aa"),
    ("u3", 10L, "zz")
  ).toDF("url", "warc_ts", "text")

  test("latestSnapshot keeps the newest capture; ts ties break on larger text") {
    val got = Recrawl
      .latestSnapshot(caps)
      .orderBy("url")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === Seq(("u1", 300L, "beta"), ("u2", 50L, "gamma"), ("u3", 10L, "zz")))
  }

  test("latestSnapshot is partition-invariant (map-side max, no window)") {
    val a = Recrawl.latestSnapshot(caps.repartition(1)).orderBy("url").collect()
    val b = Recrawl.latestSnapshot(caps.repartition(7)).orderBy("url").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("changeCensus counts captures, distinct versions, span and stability") {
    val got = Recrawl
      .changeCensus(caps)
      .orderBy("url")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(
      got.toSeq === Seq(
        ("u1", 3L, 2L, 100L, 300L, false),
        ("u2", 1L, 1L, 50L, 50L, true),
        ("u3", 2L, 2L, 10L, 10L, false)
      )
    )
  }
}
