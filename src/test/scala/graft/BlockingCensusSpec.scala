package graft

import graft.operators.Blocker

class BlockingCensusSpec extends SparkSpec {
  import spark.implicits._

  test("skew census: closed-form pair math, salt plan, (n desc, key) order, topN cut") {
    // k1: 7 docs (cap 3 -> 3 buckets: sizes 3,2,2 -> 3+1+1 = 5 capped pairs)
    // k2: 3 docs (at the cap -> unsalted, 3 pairs)
    // k3: 1 doc  (0 pairs)
    val keys = ((1 to 7).map(i => (s"u$i", "k1")) ++
      (1 to 3).map(i => (s"v$i", "k2")) :+ (("w1", "k3"))).toDF("url", "key")
    val rows = Blocker
      .skewCensus(keys, maxBlockSize = 3, topN = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length === 2) // topN cut drops k3
    assert(rows(0) === (("k1", 7L, 21L, 3L, 5L)))
    assert(rows(1) === (("k2", 3L, 3L, 1L, 3L)))
  }

  test("skew census ties break on key; capped == raw for unsalted blocks") {
    val keys = Seq(("a", "kb"), ("b", "kb"), ("c", "ka"), ("d", "ka")).toDF("url", "key")
    val rows = Blocker
      .skewCensus(keys, maxBlockSize = 10, topN = 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq === Seq(("ka", 2L, 1L, 1L, 1L), ("kb", 2L, 1L, 1L, 1L)))
  }
}
