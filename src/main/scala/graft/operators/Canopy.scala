package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Canopy clustering (McCallum, Nigam & Ungar, KDD 2000) — the classic
  * cheap-distance pre-blocking: greedily pick centers in random order;
  * every point within the LOOSE threshold T1 of a center joins its canopy
  * (points may join several); every point within the TIGHT threshold T2 of
  * a center stops being a candidate center. Expensive comparisons then run
  * only within canopies.
  *
  * Graph form (how a Spark engine should receive it): the caller supplies
  * the T1 and T2 PAIR FRAMES (from any cheap predicate — equal key, banded
  * distance, shared token); this operator does the sequential-greedy part.
  * Center selection is exactly the greedy rank-order maximal independent
  * set on the T2 graph — "center iff no earlier-rank center within T2" is
  * the same recursion as KwikCluster's "pivot iff no earlier-rank pivot
  * neighbor" — so it reuses [[CorrelationClustering.pivot]]'s peeling
  * (deterministic (xxhash64, id) ranks, O(log n) rounds whp, exact
  * sequential equivalence proven by that operator's spec).
  *
  * Coverage contract: with T2 ⊆ T1 (tighter implies looser — the published
  * precondition) every point lands in >= 1 canopy; points uncovered under
  * a violating input become their own singleton canopy rather than
  * silently vanishing.
  *
  * Scale shape: peeling as in CorrelationClustering; membership is one
  * keyed join of the T1 edges against the (much smaller) center set plus
  * two anti-joins for isolated/uncovered backfill. Nothing collected.
  */
object Canopy {

  /** Canopy membership rows (id, canopy) — `canopy` is the center id;
    * multi-membership produces multiple rows per id. `nodes` must carry
    * every point in column `id` (points isolated in the T2 graph are
    * centers by definition; points missing from T1 too become singleton
    * canopies).
    */
  def canopies(
      nodes: DataFrame,
      t1Edges: DataFrame,
      t2Edges: DataFrame,
      maxRounds: Int = 60
  ): DataFrame = {
    val piv = CorrelationClustering.pivot(t2Edges, maxRounds)
    val t2Centers = piv.where(col("id") === col("pivot")).select("id")
    val isolated = nodes
      .select("id")
      .join(piv.select("id"), Seq("id"), "left_anti")
    val centers = t2Centers.union(isolated)
    val t1 = t1Edges
      .select(col("src").as("a"), col("dst").as("b"))
      .where(col("a") =!= col("b"))
    val oriented = t1.union(t1.select(col("b").as("a"), col("a").as("b")))
    val cren = centers.withColumnRenamed("id", "canopy")
    val member = centers
      .select(col("id"), col("id").as("canopy"))
      .union(
        oriented
          .join(cren, oriented("b") === cren("canopy"))
          .select(col("a").as("id"), col("canopy"))
      )
      .distinct()
    val uncovered = nodes
      .select("id")
      .join(member.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("canopy"))
    member.union(uncovered)
  }
}
