package graft

import org.apache.spark.sql.functions._

import graft.operators.FellegiSunter
import graft.operators.FellegiSunter.FieldParams

class FellegiSunterSpec extends SparkSpec {
  import spark.implicits._

  // city: A,A,A,B,B,B -> u_city = (9+9)/36 = 0.5; u_A = u_B = 0.5
  // name: x,x,y,z,z,q -> u_name = (4+4+1+1)/36 = 10/36; u_x = u_z = 1/3, u_y = u_q = 1/6
  private def docs = Seq(
    (1L, "A", "x"),
    (2L, "A", "x"),
    (3L, "A", "y"),
    (4L, "B", "z"),
    (5L, "B", "z"),
    (6L, "B", "q"),
    (7L, "A", null)
  ).toDF("id", "city", "name")

  private val fields = Seq(FieldParams("city", 0.9), FieldParams("name", 0.8))

  test("uProbability and uTable: exact value-frequency arithmetic, nulls excluded") {
    assert(FellegiSunter.uProbability(docs.where($"id" <= 6), "city") === 0.5)
    assert(math.abs(FellegiSunter.uProbability(docs.where($"id" <= 6), "name") - 10.0 / 36) < 1e-15)
    // doc 7's null name is excluded from the name table entirely
    val tf = FellegiSunter.uTable(docs, "name").as[(String, Double)].collect().toMap
    assert(tf("x") === 2.0 / 6 && tf("y") === 1.0 / 6)
    assert(FellegiSunter.uProbability(docs.select($"id", lit(null).cast("string").as("z")), "z") === 0.0)
  }

  test("scorePairs: closed-form log-likelihood-ratio weights, TF adjustment, null = no evidence") {
    val six = docs.where($"id" <= 6)
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 7L)).toDF("id_a", "id_b")
    val got = FellegiSunter
      .scorePairs(pairs, docs, "id", fields, prior = 0.5)
      .select($"id_a", $"id_b", $"w_city", $"w_name", $"match_weight", $"match_p")
      .as[(Long, Long, Double, Double, Double, Double)]
      .collect()
      .map(r => (r._1, r._2) -> r)
      .toMap
    // u over ALL docs (incl. 7): city A:4,B:3 -> u_city = (16+9)/49; names over 6 non-null
    val uCity = 25.0 / 49
    val uName = 10.0 / 36
    val uvA = 4.0 / 7 // city A tf
    val uvX = 2.0 / 6
    val (_, _, wc12, wn12, mw12, p12) = got(1L -> 2L)
    assert(math.abs(wc12 - math.log(0.9 / uvA)) < 1e-12)
    assert(math.abs(wn12 - math.log(0.8 / uvX)) < 1e-12)
    assert(math.abs(mw12 - (wc12 + wn12)) < 1e-12)
    assert(math.abs(p12 - 1.0 / (1.0 + math.exp(-mw12))) < 1e-12) // prior 0.5 -> zero offset
    // (1,3): name disagrees -> global-u disagreement branch
    assert(math.abs(got(1L -> 3L)._4 - math.log((1.0 - 0.8) / (1.0 - uName))) < 1e-12)
    // (1,4): both disagree
    assert(math.abs(got(1L -> 4L)._3 - math.log((1.0 - 0.9) / (1.0 - uCity))) < 1e-12)
    // (1,7): name null on one side -> zero evidence, city still counts
    val (_, _, wc17, wn17, _, _) = got(1L -> 7L)
    assert(wn17 === 0.0 && math.abs(wc17 - math.log(0.9 / uvA)) < 1e-12)
    // rare-value agreement beats common-value agreement (the point of TF)
    val rare = FellegiSunter
      .scorePairs(Seq((3L, 3L)).toDF("id_a", "id_b"), docs, "id", Seq(FieldParams("name", 0.8)))
      .select($"w_name").as[Double].collect()(0)
    assert(rare > wn12, s"u_y=1/6 agreement ($rare) must outweigh u_x=1/3 agreement ($wn12)")
    // tfAdjust=false collapses agreement to the global u
    val noTf = FellegiSunter
      .scorePairs(pairs, docs, "id", fields, prior = 0.5, tfAdjust = false)
      .where($"id_a" === 1 && $"id_b" === 2)
      .select($"w_city").as[Double].collect()(0)
    assert(math.abs(noTf - math.log(0.9 / uCity)) < 1e-12)
    assert(six.count() === 6) // silence unused warning paths
  }

  test("scorePairs rejects degenerate parameters") {
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException](FellegiSunter.scorePairs(pairs, docs, "id", fields, prior = 0.0))
    intercept[IllegalArgumentException](FieldParams("city", 1.0))
    // constant column -> u = 1 -> refuse rather than emit ln(x/0)
    val const = docs.withColumn("k", lit("same"))
    intercept[IllegalArgumentException](
      FellegiSunter.scorePairs(pairs, const, "id", Seq(FieldParams("k", 0.9)))
    )
  }

  test("scoreLevels: first-match-wins gamma ladder, null level, closed-form weights") {
    import graft.operators.FellegiSunter.{Comparison, Level}
    val d = Seq(
      (1L, "robert", "A"),
      (2L, "robert", "A"),
      (3L, "roberto", "A"),
      (4L, "zzzz", "B"),
      (5L, null, "B")
    ).toDF("id", "name", "city")
    val nameCmp = Comparison(
      "name",
      Seq(
        Level("exact", (a, b) => a === b, m = 0.7, u = 0.001),
        Level("prefix4", (a, b) => substring(a, 1, 4) === substring(b, 1, 4), m = 0.2, u = 0.01),
        FellegiSunter.elseLevel(m = 0.1, u = 0.989)
      )
    )
    val cityCmp = Comparison(
      "city",
      Seq(Level("exact", (a, b) => a === b, m = 0.9, u = 0.5), FellegiSunter.elseLevel(0.1, 0.5))
    )
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("id_a", "id_b")
    val got = FellegiSunter
      .scoreLevels(pairs, d, "id", Seq(nameCmp, cityCmp), prior = 0.5)
      .select($"id_a", $"id_b", $"gamma_name", $"w_name", $"gamma_city", $"w_city", $"match_p")
      .as[(Long, Long, Int, Double, Int, Double, Double)]
      .collect()
      .map(r => (r._1, r._2) -> r)
      .toMap
    // (1,2): exact name -> gamma 2 (counted from else=0), w = ln(0.7/0.001)
    val (_, _, g12, w12, gc12, wc12, p12) = got(1L -> 2L)
    assert(g12 === 2 && math.abs(w12 - math.log(0.7 / 0.001)) < 1e-12)
    assert(gc12 === 1 && math.abs(wc12 - math.log(0.9 / 0.5)) < 1e-12)
    assert(math.abs(p12 - 1.0 / (1.0 + math.exp(-(w12 + wc12)))) < 1e-12)
    // (1,3): not exact, shares the 4-char prefix -> middle level
    assert(got(1L -> 3L)._3 === 1 && math.abs(got(1L -> 3L)._4 - math.log(0.2 / 0.01)) < 1e-12)
    // (1,4): else level on name AND city
    assert(got(1L -> 4L)._3 === 0 && math.abs(got(1L -> 4L)._4 - math.log(0.1 / 0.989)) < 1e-12)
    assert(got(1L -> 4L)._5 === 0)
    // (1,5): null name -> null level: gamma -1, zero evidence; city still scores
    assert(got(1L -> 5L)._3 === -1 && got(1L -> 5L)._4 === 0.0)
    assert(got(1L -> 5L)._5 === 0)
  }

  test("scoreLevels rejects degenerate configs") {
    import graft.operators.FellegiSunter.{Comparison, Level}
    intercept[IllegalArgumentException](Level("x", (a, b) => a === b, m = 1.0, u = 0.5))
    intercept[IllegalArgumentException](Comparison("f", Seq(FellegiSunter.elseLevel(0.5, 0.5))))
    intercept[IllegalArgumentException](
      FellegiSunter.scoreLevels(
        Seq((1L, 2L)).toDF("id_a", "id_b"),
        docs,
        "id",
        Seq(Comparison("city", Seq(Level("e", (a, b) => a === b, 0.9, 0.5), FellegiSunter.elseLevel(0.1, 0.5)))),
        prior = 1.0
      )
    )
  }

  test("emEstimate recovers planted match structure from agreement patterns") {
    // 40 matched pairs agree on both fields (pair-unique values); 60
    // unmatched pairs disagree on both. EM must find lambda ~ 0.4 and
    // separate m >> u on both fields.
    val matched = (0 until 40).flatMap { k =>
      Seq((1000L + 2 * k, s"c$k", s"n$k"), (1000L + 2 * k + 1, s"c$k", s"n$k"))
    }
    val unmatched = (0 until 60).flatMap { k =>
      Seq((3000L + 2 * k, s"uc${2 * k}", s"un${2 * k}"), (3000L + 2 * k + 1, s"uc${2 * k + 1}", s"un${2 * k + 1}"))
    }
    val d = (matched ++ unmatched).toDF("id", "city", "name")
    val pairs =
      ((0 until 40).map(k => (1000L + 2 * k, 1000L + 2 * k + 1)) ++
        (0 until 60).map(k => (3000L + 2 * k, 3000L + 2 * k + 1))).toDF("id_a", "id_b")
    val em = FellegiSunter.emEstimate(pairs, d, "id", Seq("city", "name"), iters = 30)
    assert(math.abs(em.lambda - 0.4) < 0.01, s"lambda=${em.lambda}")
    Seq("city", "name").foreach { f =>
      val (m, u) = em.fields(f)
      assert(m > 0.99 && u < 0.01, s"$f: m=$m u=$u")
    }
    // deterministic: the pattern table is partitioning-invariant
    val em2 = FellegiSunter.emEstimate(pairs.repartition(13), d.repartition(7), "id", Seq("city", "name"), iters = 30)
    assert(em === em2)

    // the closed loop: EM-estimated m feeds scorePairs, learned prior =
    // lambda; matched pairs must score near 1, unmatched near 0
    val scored = FellegiSunter
      .scorePairs(
        pairs,
        d,
        "id",
        Seq(FieldParams("city", em.fields("city")._1), FieldParams("name", em.fields("name")._1)),
        prior = em.lambda,
        tfAdjust = false
      )
      .select($"id_a", $"match_p")
      .as[(Long, Double)]
      .collect()
    val (matchedP, unmatchedP) = scored.partition(_._1 < 3000L)
    assert(matchedP.map(_._2).min > 0.99, s"min matched p = ${matchedP.map(_._2).min}")
    assert(unmatchedP.map(_._2).max < 0.01, s"max unmatched p = ${unmatchedP.map(_._2).max}")
  }
}
