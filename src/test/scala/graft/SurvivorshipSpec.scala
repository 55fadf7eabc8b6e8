package graft

import graft.operators.Survivorship
import graft.operators.Survivorship._
import org.apache.spark.sql.Row

class SurvivorshipSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // (cluster, name, nick, ts, score)
    ("c1", "robert", "bob", 3L, 10L),
    ("c1", "robert", "rob", 1L, 7L),
    ("c1", "bob", null, 2L, 12L),
    ("c2", "alice", "ali", 5L, 1L),
    ("c2", null, null, 4L, 2L)
  ).toDF("cluster", "name", "nick", "ts", "score")

  test("mode / longest / latest / min / max pick the documented survivors") {
    val g = Survivorship
      .golden(
        rows,
        "cluster",
        Seq(
          Rule("name", Mode),
          Rule("name", Longest, as = "name_long"),
          Rule("nick", Latest("ts"), as = "nick_latest"),
          Rule("score", MinValue, as = "score_min"),
          Rule("score", MaxValue, as = "score_max")
        )
      )
      .orderBy("cluster")
      .collect()
    assert(g.length === 2)
    val c1 = g(0)
    // mode: robert (2 of 3); longest: robert (6 chars); latest nick: ts=3 → bob
    assert(c1 === Row("c1", 3L, "robert", "robert", "bob", 7L, 12L))
    val c2 = g(1)
    // null name never survives over alice; latest nick skips the null-nick ts=4 row
    assert(c2 === Row("c2", 2L, "alice", "alice", "ali", 1L, 2L))
  }

  test("mode ties break to the smallest value, independent of row order") {
    val df = Seq(("c", "zz"), ("c", "aa"), ("c", "zz"), ("c", "aa")).toDF("cluster", "v")
    val pick = Survivorship.golden(df, "cluster", Seq(Rule("v", Mode))).collect()(0)
    assert(pick.getString(2) === "aa")
    val pick2 = Survivorship
      .golden(df.repartition(7).sortWithinPartitions($"v".desc), "cluster", Seq(Rule("v", Mode)))
      .collect()(0)
    assert(pick2.getString(2) === "aa")
  }

  test("longest ties break to the smallest value; latest ts ties to the largest value") {
    val df = Seq(("c", "bb", 1L), ("c", "aa", 1L)).toDF("cluster", "v", "ts")
    val g = Survivorship
      .golden(df, "cluster", Seq(Rule("v", Longest, "l"), Rule("v", Latest("ts"), "t")))
      .collect()(0)
    assert(g.getString(2) === "aa" && g.getString(3) === "bb")
  }

  test("all-null field survives as null; singleton clusters pass through") {
    val df = Seq(("c", Option.empty[String]), ("d", Some("x"))).toDF("cluster", "v")
    val g = Survivorship.golden(df, "cluster", Seq(Rule("v", Mode))).orderBy("cluster").collect()
    assert(g(0) === Row("c", 1L, null) && g(1) === Row("d", 1L, "x"))
  }

  test("duplicate output names or n_members collisions are rejected") {
    intercept[IllegalArgumentException] {
      Survivorship.golden(rows, "cluster", Seq(Rule("name", Mode), Rule("name", Longest)))
    }
    intercept[IllegalArgumentException] {
      Survivorship.golden(rows, "cluster", Seq(Rule("name", Mode, as = "n_members")))
    }
  }
}
