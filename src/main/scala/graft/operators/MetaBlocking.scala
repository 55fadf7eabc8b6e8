package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Meta-blocking: restructure a block collection into a weighted comparison
  * graph and prune low-evidence candidate pairs BEFORE any pairwise scoring
  * is paid for (Papadakis et al., "Meta-Blocking: Taking Entity Resolution to
  * the Next Level", TKDE 2014; block filtering from Papadakis et al., EDBT
  * 2016). This is the published answer to the problem the reference solves by
  * per-mention candidate truncation (/root/reference/lion_linker/
  * lion_linker.py:640-667 caps candidates per mention): instead of a blind
  * positional cap, pairs are ranked by co-occurrence evidence across the
  * whole block collection and pruned by a weight/cardinality rule.
  *
  * Pipeline shape (caller composes the stages):
  * {{{
  *   val kept   = MetaBlocking.filterBlocks(MetaBlocking.purge(keys, cap), 0.8)
  *   val edges  = MetaBlocking.edges(kept)
  *   val pruned = MetaBlocking.wep(edges, "js")   // or wnp / cnp
  * }}}
  *
  * 100 TB shape: `purge` removes the stop-word-like blocks that carry the
  * quadratic blow-up (a head-domain block of 10^6 docs is 5*10^11 pairs of
  * pure noise — the published observation is that oversized blocks have
  * near-zero precision). After purging, the per-block self-join in `edges`
  * is the same bounded equi-join as `Blocker.pairs`; every aggregation is
  * keyed (pair key, node key) with map-side partials; the only scalar
  * aggregates (`totalBlocks`, the WEP mean) are 1-row frames joined back via
  * a broadcastable cross join. The per-node windows in `filterBlocks`/`cnp`
  * partition by doc/node whose group size is bounded by the number of
  * blocking strategies (filter) or the post-purge node degree (cnp) — no
  * global window anywhere.
  */
object MetaBlocking {

  /** Block purging: drop blocks larger than `maxBlockSize` outright.
    *
    * Unlike `Blocker.saltOversized` (which splits oversized blocks to keep
    * some recall for the downstream scorer), meta-blocking's published
    * purging DISCARDS them: an oversized block's co-occurrence evidence is
    * ~0 bits per pair, and keeping it would let block-count weights be
    * dominated by noise. Singleton blocks are kept — they contribute no
    * pairs but still count toward a doc's block list for filtering/JS.
    */
  def purge(keys: DataFrame, maxBlockSize: Int): DataFrame = {
    val sizes = keys.groupBy("key").agg(count(lit(1)).as("block_n"))
    keys
      .join(sizes.where(col("block_n") > maxBlockSize), Seq("key"), "left_anti")
  }

  /** Block filtering (EDBT 2016): each doc keeps only its `ratio` smallest
    * blocks — small blocks are high-precision evidence, and dropping a doc
    * from a huge block removes its noisiest comparisons at zero recall cost
    * in practice (the paper's measured PC loss is <1% at ratio 0.8).
    *
    * Keeps `max(1, ceil(ratio * nBlocks(doc)))` blocks per doc, ranked by
    * (block size asc, key asc) — the key tie-break makes the kept set
    * deterministic. Block sizes are computed on the INPUT collection (the
    * published definition), not re-derived after filtering.
    */
  def filterBlocks(keys: DataFrame, ratio: Double): DataFrame = {
    require(ratio > 0.0 && ratio <= 1.0, s"ratio must be in (0,1], got $ratio")
    val sizes = keys.groupBy("key").agg(count(lit(1)).as("block_n"))
    val w = Window.partitionBy("url").orderBy(col("block_n").asc, col("key").asc)
    keys
      .join(sizes, Seq("key"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n_blocks", count(lit(1)).over(Window.partitionBy("url")))
      .where(col("rk") <= greatest(lit(1L), ceil(lit(ratio) * col("n_blocks"))))
      .select("url", "key")
  }

  /** The weighted blocking graph, materialized as its edge list: one row per
    * co-occurring doc pair with every published weight scheme the pruners
    * consume —
    *   - `cbs`  (Common Blocks Scheme): number of shared blocks;
    *   - `js`   (Jaccard Scheme): cbs / (|Ba| + |Bb| - cbs);
    *   - `ecbs` (Enhanced CBS): cbs * ln(|B|/|Ba|) * ln(|B|/|Bb|).
    *
    * |Ba| and |B| are counted over the INPUT collection (post-purge/filter —
    * whatever the caller passes), so weights and pruning thresholds see the
    * same graph. Output: (url_a, url_b, cbs, js, ecbs), canonically oriented
    * url_a < url_b.
    */
  def edges(keys: DataFrame): DataFrame = {
    // materialized once (the CC-iteration snapshot discipline): the deduped
    // key set feeds FOUR scans below (both pair-join sides, per-doc block
    // counts, total block count) and each un-materialized scan would replay
    // the caller's whole key-derivation + purge/filter chain
    val k = graft.util.Checkpoints.serializedLocal(
      keys.select(col("url"), col("key")).distinct()
    )
    val pairs = k
      .select(col("url").as("url_a"), col("key"))
      .join(k.select(col("url").as("url_b"), col("key")), Seq("key"))
      .where(col("url_a") < col("url_b"))
      .groupBy("url_a", "url_b")
      .agg(count(lit(1)).as("cbs"))
    val docBlocks = k.groupBy("url").agg(count(lit(1)).as("nb"))
    val totalBlocks = k.select(col("key")).distinct().agg(count(lit(1)).as("n_total"))
    // the weighted edge list is what every pruner consumes SEVERAL times
    // (wep: mean + filter; wnp: two incidence legs + the filter join;
    // cnp: two incidence legs + the keep semi-join) — materialize it once
    // so the pair self-join + weight joins never replay per consumer. The
    // frame is the meta-blocked candidate set, bounded by construction
    // (purge discards the quadratic head blocks before pairs ever form).
    graft.util.Checkpoints.serializedLocal(
      pairs
        .join(docBlocks.select(col("url").as("url_a"), col("nb").as("nb_a")), Seq("url_a"))
        .join(docBlocks.select(col("url").as("url_b"), col("nb").as("nb_b")), Seq("url_b"))
        .crossJoin(broadcast(totalBlocks))
        .select(
          col("url_a"),
          col("url_b"),
          col("cbs"),
          (col("cbs").cast("double") / (col("nb_a") + col("nb_b") - col("cbs"))).as("js"),
          (col("cbs").cast("double") *
            log(col("n_total").cast("double") / col("nb_a")) *
            log(col("n_total").cast("double") / col("nb_b"))).as("ecbs")
        )
    )
  }

  /** Weighted Edge Pruning: keep edges whose weight is >= the global mean
    * edge weight (the paper's threshold). One scalar aggregate, broadcast
    * back — no per-row driver work.
    */
  def wep(edges: DataFrame, weightCol: String = "js"): DataFrame = {
    val mean = edges.agg(avg(col(weightCol)).as("w_mean"))
    edges.crossJoin(broadcast(mean)).where(col(weightCol) >= col("w_mean")).drop("w_mean")
  }

  /** Weighted Node Pruning: keep an edge if its weight is >= the mean weight
    * of EITHER endpoint's neighborhood (the redefined/union WNP of EDBT
    * 2016 — each node votes, an edge survives on either vote). Node means
    * are one keyed aggregation over the undirected incidence list, joined
    * back on each endpoint.
    */
  def wnp(edges: DataFrame, weightCol: String = "js"): DataFrame = {
    val incid = edges
      .select(col("url_a").as("node"), col(weightCol).as("w"))
      .unionAll(edges.select(col("url_b").as("node"), col(weightCol).as("w")))
    val nodeMean = incid.groupBy("node").agg(avg("w").as("node_mean"))
    edges
      .join(nodeMean.select(col("node").as("url_a"), col("node_mean").as("mean_a")), Seq("url_a"))
      .join(nodeMean.select(col("node").as("url_b"), col("node_mean").as("mean_b")), Seq("url_b"))
      .where(col(weightCol) >= col("mean_a") || col(weightCol) >= col("mean_b"))
      .drop("mean_a", "mean_b")
  }

  /** Progressive (pay-as-you-go) resolution order (Whang et al., "Pay-As-
    * You-Go Entity Resolution", TKDE 2013): a deterministic global rank
    * over the weighted edges, best-evidence-first — (weight desc, cbs
    * desc, pair id) — so a downstream scorer processing pairs in `rank`
    * order maximizes early recall under any comparison budget. The rank is
    * the W5 two-phase range-partition sequence, NOT a global window (a
    * single-partition row_number over the pair set is a scale-killer).
    */
  def progressive(edges: DataFrame, weightCol: String = "js"): DataFrame =
    graft.util.DeterministicSeq
      .assign(
        edges.withColumn(
          "_ord",
          struct((-col(weightCol)).as("w"), (-col("cbs")).as("c"), col("url_a"), col("url_b"))
        ),
        "_ord"
      )
      .withColumnRenamed("seq", "rank")
      .drop("_ord")

  /** Recall@budget curve for a [[progressive]] order against a gold pair
    * set (oriented url_a < url_b): one row per budget with the gold pairs
    * reached within it. One aggregation over the ranked frame computes
    * every budget's hit count (conditional sums), then a `stack` unpivots —
    * nothing corpus-sized is collected; the only driver action is the gold
    * count (the recall denominator).
    */
  def progressiveRecall(ranked: DataFrame, gold: DataFrame, budgets: Seq[Long]): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_ >= 1), s"budgets must be >= 1: $budgets")
    val goldTotal = math.max(gold.count(), 1L)
    val g = gold.select(col("url_a"), col("url_b"), lit(1L).as("_g"))
    val j = ranked.join(g, Seq("url_a", "url_b"), "left")
    val sums = budgets.map(b =>
      sum(when(col("rank") <= b && col("_g").isNotNull, 1L).otherwise(0L)).as(s"h$b")
    )
    j.agg(sums.head, sums.tail: _*)
      .select(
        expr(
          s"stack(${budgets.size}, " +
            budgets.map(b => s"CAST($b AS BIGINT), h$b").mkString(", ") +
            ") AS (budget, gold_hits)"
        )
      )
      .select(
        col("budget"),
        col("gold_hits"),
        round(col("gold_hits") / lit(goldTotal.toDouble), 6).as("recall")
      )
  }

  /** Cardinality Node Pruning: each node retains its top-`k` edges by
    * (weight desc, neighbor asc — deterministic tie-break); an edge survives
    * if either endpoint retains it. The per-node window's group size is the
    * node's post-purge degree, bounded by (#blocks containing it) * cap.
    */
  def cnp(edges: DataFrame, k: Int, weightCol: String = "js"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val incid = edges
      .select(col("url_a").as("node"), col("url_b").as("other"), col(weightCol).as("w"))
      .unionAll(edges.select(col("url_b").as("node"), col("url_a").as("other"), col(weightCol).as("w")))
    val w = Window.partitionBy("node").orderBy(col("w").desc, col("other").asc)
    val kept = incid
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(
        least(col("node"), col("other")).as("url_a"),
        greatest(col("node"), col("other")).as("url_b")
      )
      .distinct()
    edges.join(kept, Seq("url_a", "url_b"), "left_semi")
  }
}
