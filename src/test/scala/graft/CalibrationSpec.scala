package graft

import org.apache.spark.sql.functions._

import graft.eval.Calibration
import graft.operators.FellegiSunter

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("perfect predictor: brier = 0, ece = 0, mce = 0") {
    val d = Seq((1.0, true), (0.0, false), (1.0, true), (0.0, false)).toDF("p", "y")
    val r = Calibration.metricsDf(d, "p", "y").as[(Long, Double, Double, Double)].collect()(0)
    assert(r === ((4L, 0.0, 0.0, 0.0)))
  }

  test("constant 0.5 on a balanced label: ece = 0, brier = 0.25") {
    val d = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false)).toDF("p", "y")
    val (n, brier, ece, mce) =
      Calibration.metricsDf(d, "p", "y").as[(Long, Double, Double, Double)].collect()(0)
    assert(n === 4L && brier === 0.25 && ece === 0.0 && mce === 0.0)
  }

  test("hand-computed two-bin case: ece is the n-weighted gap, mce the max gap") {
    // bin 1 (p=0.15): 2 rows, mean_p 0.15, rate 0.5 -> gap 0.35
    // bin 8 (p=0.85): 2 rows, mean_p 0.85, rate 1.0 -> gap 0.15
    val d = Seq((0.15, true), (0.15, false), (0.85, true), (0.85, true)).toDF("p", "y")
    val (n, brier, ece, mce) =
      Calibration.metricsDf(d, "p", "y").as[(Long, Double, Double, Double)].collect()(0)
    assert(n === 4L)
    assert(math.abs(ece - (0.5 * 0.35 + 0.5 * 0.15)) < 1e-12)
    assert(math.abs(mce - 0.35) < 1e-12)
    val expBrier = (0.85 * 0.85 + 0.15 * 0.15 + 2 * 0.15 * 0.15) / 4
    assert(math.abs(brier - expBrier) < 1e-12)
  }

  test("p = 1.0 clamps into the top bin; null scores are dropped") {
    val d = Seq(
      (Some(1.0), true),
      (Some(0.95), true),
      (None: Option[Double], true)
    ).toDF("p", "y")
    val bins = Calibration.reliability(d, "p", "y", bins = 10).orderBy("bin").collect()
    assert(bins.length === 1)
    assert(bins(0).getLong(0) === 9L && bins(0).getLong(1) === 2L)
    val (n, _, _, _) =
      Calibration.metricsDf(d, "p", "y").as[(Long, Double, Double, Double)].collect()(0)
    assert(n === 2L)
  }

  test("reliability bins partition the rows; gaps match the summary's mce") {
    val d = spark
      .range(1, 201)
      .select(
        (pmod(col("id") * 7, lit(17)).cast("double") / 16.0).as("p"),
        (pmod(col("id") * 5, lit(16)) < pmod(col("id") * 7, lit(17))).as("y")
      )
    val rel = Calibration.reliability(d, "p", "y").collect()
    assert(rel.map(_.getLong(1)).sum === 200L)
    val mceFromBins = rel.map(_.getDouble(6)).max
    val (_, _, _, mce) =
      Calibration.metricsDf(d, "p", "y").as[(Long, Double, Double, Double)].collect()(0)
    assert(mce === mceFromBins)
  }

  test("fs explain: step 0 is the prior, the last step's cum_p equals match_p") {
    val docs = Seq(
      (1L, "en", "a"),
      (2L, "en", "b"),
      (3L, "fr", "b"),
      (4L, "en", "a")
    ).toDF("id", "lang", "source")
    val pairs = Seq((1L, 2L), (1L, 4L), (2L, 3L)).toDF("id_a", "id_b")
    val scored = FellegiSunter.scorePairs(
      pairs,
      docs,
      "id",
      Seq(FellegiSunter.FieldParams("lang", 0.9), FellegiSunter.FieldParams("source", 0.7)),
      prior = 0.4
    )
    val exp = FellegiSunter.explain(scored, Seq("lang", "source"), prior = 0.4)
    // (fields + 1) rows per pair
    assert(exp.count() === 3L * 3L)
    val prior = exp.where(col("step") === 0).select("cum_p").as[Double].collect()
    assert(prior.forall(p => math.abs(p - 0.4) < 1e-12))
    val last = exp
      .where(col("step") === 2)
      .select(col("id_a"), col("id_b"), col("cum_p"))
    val joined = last
      .join(scored.select(col("id_a"), col("id_b"), col("match_p")), Seq("id_a", "id_b"))
      .select(abs(col("cum_p") - col("match_p")).as("d"))
      .as[Double]
      .collect()
    assert(joined.forall(_ < 1e-12))
    // running weights: step 1 cum equals its own weight
    val s1 = exp.where(col("step") === 1).select(abs(col("cum_weight") - col("weight")).as("d")).as[Double].collect()
    assert(s1.forall(_ < 1e-12))
  }
}
