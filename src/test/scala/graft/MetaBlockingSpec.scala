package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.MetaBlocking

/** Hand-computed blocking-graph example pinning every MetaBlocking stage.
  *
  * Block collection (before purge):
  *   k1:{d1,d2,d3}  k2:{d1,d2}  k3:{d3,d4}  k4:{d5,d6}  k6:{d4}
  *   k5:{d1..d6}  -- oversized, purged at cap 4
  *
  * Post-purge graph (|B| = 5 blocks; nb: d1,d2,d3,d4 -> 2, d5,d6 -> 1):
  *   (d1,d2) cbs=2 js=1.0   (d1,d3) cbs=1 js=1/3   (d2,d3) cbs=1 js=1/3
  *   (d3,d4) cbs=1 js=1/3   (d5,d6) cbs=1 js=1.0
  */
class MetaBlockingSpec extends SparkSpec {
  import spark.implicits._

  private def keysDf: DataFrame = {
    val rows =
      Seq("d1" -> "k1", "d2" -> "k1", "d3" -> "k1", "d1" -> "k2", "d2" -> "k2",
        "d3" -> "k3", "d4" -> "k3", "d5" -> "k4", "d6" -> "k4", "d4" -> "k6") ++
        (1 to 6).map(i => s"d$i" -> "k5")
    rows.toDF("url", "key")
  }

  private def edgeSet(df: DataFrame): Set[(String, String)] =
    df.select("url_a", "url_b").as[(String, String)].collect().toSet

  test("purge drops oversized blocks only") {
    val kept = MetaBlocking.purge(keysDf, 4)
    assert(kept.where($"key" === "k5").count() === 0)
    assert(kept.count() === 10)
    assert(kept.select("key").distinct().count() === 5) // k6 singleton survives
  }

  test("edges computes cbs, js, ecbs on the post-purge graph") {
    val e = MetaBlocking.edges(MetaBlocking.purge(keysDf, 4))
    val rows = e
      .select($"url_a", $"url_b", $"cbs", $"js", $"ecbs")
      .as[(String, String, Long, Double, Double)]
      .collect()
      .map(r => (r._1, r._2) -> r)
      .toMap
    assert(rows.keySet === Set("d1" -> "d2", "d1" -> "d3", "d2" -> "d3", "d3" -> "d4", "d5" -> "d6"))
    val (_, _, cbs12, js12, ecbs12) = rows("d1" -> "d2")
    assert(cbs12 === 2L && js12 === 1.0)
    assert(math.abs(ecbs12 - 2.0 * math.log(5.0 / 2) * math.log(5.0 / 2)) < 1e-12)
    val (_, _, cbs56, js56, ecbs56) = rows("d5" -> "d6")
    assert(cbs56 === 1L && js56 === 1.0)
    assert(math.abs(ecbs56 - math.log(5.0) * math.log(5.0)) < 1e-12)
    assert(math.abs(rows("d1" -> "d3")._4 - 1.0 / 3) < 1e-15)
  }

  test("wep keeps edges at or above the global mean weight") {
    val e = MetaBlocking.edges(MetaBlocking.purge(keysDf, 4))
    // js mean = (1 + 1/3 + 1/3 + 1/3 + 1)/5 = 0.6
    assert(edgeSet(MetaBlocking.wep(e, "js")) === Set("d1" -> "d2", "d5" -> "d6"))
  }

  test("wnp keeps an edge on either endpoint's local-mean vote") {
    val e = MetaBlocking.edges(MetaBlocking.purge(keysDf, 4))
    // d3's neighborhood mean is 1/3, so every 1/3 edge survives via d3/d4;
    // (d1,d2) and (d5,d6) survive their own endpoints' votes.
    assert(edgeSet(MetaBlocking.wnp(e, "js")) === edgeSet(e))
  }

  test("cnp retains each node's top-k with deterministic tie-break") {
    val e = MetaBlocking.edges(MetaBlocking.purge(keysDf, 4))
    // k=1: d3's three js=1/3 edges tie; neighbor-asc keeps (d3 -> d1) so the
    // surviving set is the union of every node's single best edge.
    assert(
      edgeSet(MetaBlocking.cnp(e, 1, "js")) ===
        Set("d1" -> "d2", "d1" -> "d3", "d3" -> "d4", "d5" -> "d6")
    )
    // k large: no pruning
    assert(edgeSet(MetaBlocking.cnp(e, 10, "js")) === edgeSet(e))
  }

  test("filterBlocks keeps each doc's smallest blocks, sizes from the input") {
    val kept = MetaBlocking.filterBlocks(MetaBlocking.purge(keysDf, 4), 0.5)
    val byUrl = kept.as[(String, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // d1: blocks k1(3), k2(2) -> keep ceil(0.5*2)=1 smallest: k2
    assert(byUrl("d1") === Set("k2"))
    assert(byUrl("d2") === Set("k2"))
    // d3: k1(3), k3(2) -> k3; d4: k3(2), k6(1) -> k6
    assert(byUrl("d3") === Set("k3"))
    assert(byUrl("d4") === Set("k6"))
    // d5/d6 have one block; max(1, ...) keeps it
    assert(byUrl("d5") === Set("k4") && byUrl("d6") === Set("k4"))
  }

  test("progressive: best-evidence-first rank, partitioning-invariant; recall@budget curve") {
    val e = MetaBlocking.edges(MetaBlocking.purge(keysDf, 4))
    def ranks(parts: Int) = MetaBlocking
      .progressive(e.repartition(parts), "js")
      .select("url_a", "url_b", "rank")
      .as[(String, String, Long)]
      .collect()
      .map(r => (r._1, r._2) -> r._3)
      .toMap
    val got = ranks(1)
    // js=1.0 edges first (cbs desc then id breaks the tie), then the 1/3 tier by id
    assert(got("d1" -> "d2") === 1L && got("d5" -> "d6") === 2L)
    assert(got("d1" -> "d3") === 3L && got("d2" -> "d3") === 4L && got("d3" -> "d4") === 5L)
    assert(ranks(7) === got, "progressive rank must be partitioning-invariant")
    val gold = Seq("d1" -> "d2", "d3" -> "d4", "d9" -> "d10").toDF("url_a", "url_b")
    val curve = MetaBlocking
      .progressiveRecall(MetaBlocking.progressive(e, "js"), gold, Seq(1L, 4L, 10L))
      .as[(Long, Long, Double)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(curve(1L) === ((1L, 0.333333))) // budget 1 reaches (d1,d2) only
    assert(curve(4L) === ((1L, 0.333333))) // (d3,d4) is rank 5
    assert(curve(10L) === ((2L, 0.666667))) // (d9,d10) is never reachable
  }

  test("filterBlocks rejects a ratio outside (0,1]") {
    intercept[IllegalArgumentException](MetaBlocking.filterBlocks(keysDf, 0.0))
    intercept[IllegalArgumentException](MetaBlocking.filterBlocks(keysDf, 1.5))
  }
}
