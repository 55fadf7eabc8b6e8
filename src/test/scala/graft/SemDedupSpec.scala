package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two directions with in-group variation + one outlier
  private def vec(base: Array[Double], eps: Double, i: Int): Array[Double] =
    base.zipWithIndex.map { case (x, j) => x + (if (j == i % base.length) eps else 0.0) }

  private val gA = Array(1.0, 0.0, 0.0, 0.0)
  private val gB = Array(0.0, 1.0, 0.0, 0.0)
  private val rows: Seq[(Long, Array[Double])] =
    (0 until 4).map(i => (i.toLong, vec(gA, 0.01, i))) ++
      (0 until 4).map(i => (10L + i, vec(gB, 0.01, i))) :+ ((99L, Array(0.0, 0.0, 1.0, 0.0)))

  test("nList=1 (single cell): semdedup pairs equal brute-force pairs exactly") {
    val df = rows.toDF("vec_id", "v")
    val sem = Dedup
      .semDedupPairs(df, "vec_id", "v", tau = 0.95, nList = 1)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    val brute = Dedup
      .embeddingNearDup(df, "vec_id", "v", threshold = 0.95)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(sem === brute)
    // both in-group cliques found, outlier untouched, no cross-group pair
    assert(brute.contains((0L, 1L)) && brute.contains((10L, 11L)))
    assert(!brute.exists(p => p._1 == 99L || p._2 == 99L))
    assert(!brute.exists(p => p._1 < 10L && p._2 >= 10L))
  }

  test("cells only PRUNE: semdedup pairs are a subset of brute force (no false positives)") {
    val df = rows.toDF("vec_id", "v")
    val sem = Dedup
      .semDedupPairs(df, "vec_id", "v", tau = 0.95, nList = 3, maxIters = 10)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    val brute = Dedup
      .embeddingNearDup(df, "vec_id", "v", threshold = 0.95)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(sem.subsetOf(brute), s"false positives: ${sem.diff(brute)}")
  }

  test("exact copies always pair (same cell under any codebook), resolve keeps min id") {
    // eps 0.4 spreads in-group cosines to ~0.93 — at tau 0.99 the only
    // surviving pair is the planted exact copy (cos = 1)
    val spread: Seq[(Long, Array[Double])] =
      (0 until 4).map(i => (i.toLong, vec(gA, 0.4, i))) ++
        (0 until 4).map(i => (10L + i, vec(gB, 0.4, i)))
    val withCopy = spread ++ Seq((1000L, spread.head._2))
    val df = withCopy.toDF("vec_id", "v")
    val pairs = Dedup.semDedupPairs(df, "vec_id", "v", tau = 0.99, nList = 4)
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((0L, 1000L)))
    val resolved = Dedup
      .resolve(df.select(col("vec_id"), lit("").as("text")), pairs.select("id_a", "id_b"), "vec_id", "text")
      .where(!col("keep"))
      .select("vec_id", "canonical")
      .as[(Long, Long)]
      .collect()
      .toSeq
    assert(resolved === Seq((1000L, 0L)))
  }

  test("null/empty vectors are excluded from pairing, not crashed on") {
    val df = (rows ++ Seq((500L, null.asInstanceOf[Array[Double]]))).toDF("vec_id", "v")
    val n = Dedup.semDedupPairs(df, "vec_id", "v", tau = 0.95, nList = 3).count()
    assert(n >= 0L) // no NPE; null row contributes nothing
  }
}
