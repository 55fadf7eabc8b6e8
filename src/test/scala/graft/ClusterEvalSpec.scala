package graft

import graft.eval.ClusterEval

class ClusterEvalSpec extends SparkSpec {
  import spark.implicits._

  private def metrics(
      pred: Seq[(String, String)],
      gold: Seq[(String, String)]
  ): (Long, Double, Double, Double, Double, Double, Double) =
    ClusterEval
      .metricsDf(pred.toDF("url", "cluster_id"), gold.toDF("url", "gold_id"))
      .as[(Long, Double, Double, Double, Double, Double, Double)]
      .collect()(0)

  test("hand-computed contingency: B3 = 11/15, V-measure from entropies") {
    // pred c1={1,2,3}, c2={4,5}; gold g1={1,2}, g2={3,4,5}
    val pred = Seq("1" -> "c1", "2" -> "c1", "3" -> "c1", "4" -> "c2", "5" -> "c2")
    val gold = Seq("1" -> "g1", "2" -> "g1", "3" -> "g2", "4" -> "g2", "5" -> "g2")
    val (n, p, r, f1, hom, com, v) = metrics(pred, gold)
    assert(n === 5L)
    assert(math.abs(p - 11.0 / 15) < 1e-6 && math.abs(r - 11.0 / 15) < 1e-6)
    assert(math.abs(f1 - 11.0 / 15) < 1e-6)
    val hG = -(0.4 * math.log(0.4) + 0.6 * math.log(0.6))
    val hGC = -(0.4 * math.log(2.0 / 3) + 0.2 * math.log(1.0 / 3) + 0.4 * math.log(1.0))
    val expectedHom = 1.0 - hGC / hG
    assert(math.abs(hom - expectedHom) < 1e-6, s"hom=$hom vs $expectedHom")
    assert(math.abs(com - expectedHom) < 1e-6) // symmetric in this example
    assert(math.abs(v - expectedHom) < 1e-6)
  }

  test("diagnostics: density, weakest link, singleton conventions") {
    // c1 = {a,b,c} chained by 2 edges of 3 possible -> density 2/3
    // c2 = {d} singleton -> 0 edges, null density/scores
    val assigns = Seq("a" -> "c1", "b" -> "c1", "c" -> "c1", "d" -> "c2").toDF("url", "cluster_id")
    val edges = Seq(("a", "b", 0.9), ("b", "c", 0.5)).toDF("urlA", "urlB", "score")
    val rows = graft.eval.ClusterEval
      .diagnostics(assigns, edges)
      .orderBy("cluster_id")
      .collect()
    assert(rows.length === 2)
    val c1 = rows(0)
    assert(c1.getString(0) === "c1" && c1.getLong(1) === 3L && c1.getLong(2) === 2L)
    assert(math.abs(c1.getDouble(3) - 2.0 / 3) < 1e-12)
    assert(c1.getDouble(4) === 0.5 && c1.getDouble(5) === 0.9)
    val c2 = rows(1)
    assert(c2.getString(0) === "c2" && c2.getLong(1) === 1L && c2.getLong(2) === 0L)
    assert(c2.isNullAt(3) && c2.isNullAt(4) && c2.isNullAt(5))
  }

  test("perfect clustering scores 1.0 everywhere; label names don't matter") {
    val pred = Seq("1" -> "a", "2" -> "a", "3" -> "b", "4" -> "b")
    val gold = Seq("1" -> "X", "2" -> "X", "3" -> "Y", "4" -> "Y")
    val (_, p, r, f1, hom, com, v) = metrics(pred, gold)
    assert(Seq(p, r, f1, hom, com, v).forall(_ === 1.0))
  }

  test("degenerate entropies follow the published convention") {
    // one gold class, two pred clusters: homogeneity 1 (nothing to violate),
    // completeness 0 (the class is fully split), v 0
    val pred = Seq("1" -> "a", "2" -> "a", "3" -> "b", "4" -> "b")
    val gold = Seq("1" -> "G", "2" -> "G", "3" -> "G", "4" -> "G")
    val (_, p, r, _, hom, com, v) = metrics(pred, gold)
    assert(hom === 1.0 && com === 0.0 && v === 0.0)
    assert(p === 1.0 && r === 0.5) // B3: pure clusters, each doc sees half its class
  }

  test("docs missing a gold label are excluded") {
    val pred = Seq("1" -> "a", "2" -> "a", "9" -> "zz")
    val gold = Seq("1" -> "X", "2" -> "X", "8" -> "Q")
    val (n, p, r, _, _, _, _) = metrics(pred, gold)
    assert(n === 2L && p === 1.0 && r === 1.0)
  }

  private def ari(pred: Seq[(String, String)], gold: Seq[(String, String)]): Double =
    ClusterEval
      .ariDf(pred.toDF("url", "cluster_id"), gold.toDF("url", "gold_id"))
      .as[(Long, Double)]
      .collect()(0)
      ._2

  test("ARI: hand-computed contingency (index 2, a=b=4, 10 pairs) = 1/6") {
    val pred = Seq("1" -> "c1", "2" -> "c1", "3" -> "c1", "4" -> "c2", "5" -> "c2")
    val gold = Seq("1" -> "g1", "2" -> "g1", "3" -> "g2", "4" -> "g2", "5" -> "g2")
    assert(math.abs(ari(pred, gold) - (2.0 - 1.6) / 2.4) < 1e-6)
  }

  test("ARI: perfect agreement 1.0; anti-correlated split goes negative") {
    val pred = Seq("1" -> "a", "2" -> "a", "3" -> "b", "4" -> "b")
    assert(ari(pred, Seq("1" -> "X", "2" -> "X", "3" -> "Y", "4" -> "Y")) === 1.0)
    // pred pairs {1,2},{3,4}; gold pairs {1,3},{2,4}: worse than chance
    assert(ari(pred, Seq("1" -> "X", "2" -> "Y", "3" -> "X", "4" -> "Y")) === -0.5)
  }

  test("ARI: degenerate partitions (all singletons both sides) score 1.0 by convention") {
    val pred = Seq("1" -> "a", "2" -> "b", "3" -> "c")
    val gold = Seq("1" -> "x", "2" -> "y", "3" -> "z")
    assert(ari(pred, gold) === 1.0)
    // single doc: zero pairs, same convention
    assert(ari(Seq("1" -> "a"), Seq("1" -> "x")) === 1.0)
  }
}
