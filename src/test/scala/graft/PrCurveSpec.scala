package graft

import graft.eval.PrCurve
import org.apache.spark.sql.functions._

class PrCurveSpec extends SparkSpec {
  import spark.implicits._

  // scores: 0.9+ 0.9- 0.7+ 0.5- 0.5+ 0.1-  (+ = gold match)
  private val scored = Seq(
    (0.9, true), (0.9, false), (0.7, true), (0.5, false), (0.5, true), (0.1, false)
  ).toDF("score", "label")

  test("sweep: cumulative tp/fp per descending bucket, hand-computed") {
    val rows = PrCurve
      .sweep(scored, "score", "label", 10)
      .orderBy(col("thr_bucket").desc)
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .collect()
    // buckets 9,7,5,1 (0.7*10 rounds to exactly 7.0 in IEEE); total_pos = 3
    assert(rows.map(_._1).toSeq === Seq(9L, 7L, 5L, 1L))
    val b9 = rows(0)
    assert(b9._2 === 1L && b9._3 === 1L && b9._4 === 2L) // tp=1 fp=1 fn=2
    assert(b9._5 === 0.5 && math.abs(b9._6 - 1.0 / 3) < 1e-6)
    val b5 = rows(2)
    assert(b5._2 === 3L && b5._3 === 2L && b5._4 === 0L)
    assert(b5._5 === 0.6 && b5._6 === 1.0)
    assert(math.abs(b5._7 - 2.0 * 3 / (2 * 3 + 2 + 0)) < 1e-6)
    val b1 = rows(3)
    assert(b1._5 === 0.5 && b1._6 === 1.0) // all pairs predicted
  }

  test("sweep: null scores dropped; all-negative input keeps recall 0") {
    val neg = Seq((Some(0.8), false), (None, true)).toDF("score", "label")
    val rows = PrCurve.sweep(neg, "score", "label").collect()
    assert(rows.length === 1)
    assert(rows(0).getLong(1) === 0L && rows(0).getDouble(5) === 0.0)
  }

  test("averagePrecision: step-sum over the descending sweep") {
    val row = PrCurve
      .averagePrecision(scored, "score", "label", 10)
      .as[(Long, Long, Double)]
      .collect()(0)
    assert(row._1 === 3L && row._2 === 4L)
    // recall steps: 1/3 @ p=1/2, 2/3 @ p=2/3, 3/3 @ p=3/5, then 0-width step
    val expected = (1.0 / 3) * 0.5 + (1.0 / 3) * (2.0 / 3) + (1.0 / 3) * 0.6
    assert(math.abs(row._3 - expected) < 1e-3, s"ap=${row._3} vs $expected")
  }

  test("bestThreshold: max-F1 row, ties prefer the higher threshold") {
    import spark.implicits._
    // scores 0.9/0.8 positive, 0.2 negative: any threshold in (0.2, 0.8]
    // has F1=1; the picker must return the HIGHEST such bucket (0.8)
    val d = Seq((0.9, true), (0.8, true), (0.2, false)).toDF("score", "label")
    val (thr, p1, r1, f1) = graft.eval.PrCurve.bestThreshold(
      graft.eval.PrCurve.sweep(d, "score", "label", 100))
    assert(thr === 0.8 && p1 === 1.0 && r1 === 1.0 && f1 === 1.0)
    // degenerate: empty sweep refuses loudly
    intercept[IllegalArgumentException] {
      graft.eval.PrCurve.bestThreshold(
        graft.eval.PrCurve.sweep(d.where($"score" > 2), "score", "label", 100))
    }
  }
}
