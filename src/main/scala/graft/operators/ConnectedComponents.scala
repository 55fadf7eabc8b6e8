package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive clustering over match edges via the alternating
  * large-star / small-star algorithm (Kiveris et al., "Connected Components
  * in MapReduce and Beyond", SoCC'14) expressed as DataFrame self-joins.
  *
  * The reference has no explicit clustering — its clusters are implicit in
  * the per-cell predicted KB ids (/root/reference/lion_linker/
  * lion_linker.py:1113); within-corpus linkage generalizes that to the
  * transitive closure of above-threshold pairs (SURVEY.md J8).
  *
  * Scale notes:
  *  - node ids are compacted to dense longs (DeterministicSeq ordered by
  *    url: numeric min == lexicographic-min url) before iterating — every
  *    star round shuffles the full edge set, and 8-byte ids cut that
  *    volume ~5x vs url strings; cluster ids map back to component-min
  *    urls at the end, fully data-derived (deterministic across
  *    parallelism levels).
  *  - every iteration ends in `localCheckpoint` to truncate lineage —
  *    without it the plan doubles per iteration; callers that need durable
  *    resume pass a `snapshot` hook that writes/rereads Parquet instead.
  *  - convergence = (count, xor-of-hashes) signature equality, two scans max.
  *  - giant-component skew: both stars shuffle by node; the heavy node (the
  *    component min) is exactly what AQE skew-split handles; edges are
  *    deduped each round to keep |E| <= n-1 after the first rounds.
  */
object ConnectedComponents {

  /** One large-star round: for every node u (over symmetrized edges), link
    * every strictly-larger neighbor to m = min(N(u) ∪ {u}).
    */
  private[graft] def largeStar(edges: DataFrame): DataFrame = {
    // NOT a shared explicit repartition: forcing the aggregation and the
    // join probe onto one repartition(col("src")) exchange was measured
    // 16% faster on a deep skewless chain (one fewer stage barrier per
    // round; BENCH.md R5.0) — but REPARTITION_BY_COL exchanges are
    // ineligible for AQE's skew-join split (ENSURE_REQUIREMENTS only),
    // and the giant-component hub is EXACTLY the hot key that split
    // exists for. A barrier saved on chains is not worth a one-task
    // serialization point on web-scale components; the second exchange
    // here is partial-aggregated (≈|V| rows, not |E|) and cheap.
    val sym = edges
      .select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
    val mins = sym.groupBy("src").agg(least(min(col("dst")), col("src")).as("m"))
    sym
      .join(mins, "src")
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .where(col("src") =!= col("dst"))
    // no terminal distinct: small-star's min-aggregations are duplicate-
    // insensitive and its own terminal distinct dedups the round's output,
    // so deduping here would spend a full extra shuffle per iteration to
    // save only the duplicate share of small-star's shuffle volume
    // (star-shaped intermediates duplicate little; measured a wash at
    // sf0.1 chain graphs and one fewer exchange in the executed plan)
  }

  /** One small-star round: orient edges (big -> small); for every node u
    * link all smaller neighbors and u itself to m = min of them.
    */
  private[graft] def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("src"), col("dst")).as("u"),
      least(col("src"), col("dst")).as("v")
    )
    // no shared repartition here either: a high-id hub is hot on the u
    // side (it collects one row per neighbor), so the join needs its
    // skew-split eligibility — see largeStar's note
    val mins = oriented.groupBy("u").agg(min(col("v")).as("m"))
    val relink = oriented
      .join(mins, "u")
      .select(col("v").as("src"), col("m").as("dst"))
    val self = mins.select(col("u").as("src"), col("m").as("dst"))
    relink
      .unionAll(self)
      .where(col("src") =!= col("dst"))
      .distinct()
  }

  private def signature(edges: DataFrame): (Long, BigDecimal) = {
    // decimal(38,0) sum: overflow-proof under ANSI mode (Spark 4 default)
    val row = edges
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")), lit(0)).as("h")
      )
      .collect()(0)
    (row.getLong(0), BigDecimal(row.getDecimal(1)))
  }

  /** Snapshot + convergence signature in ONE action: the (count, hash-sum)
    * signature rides the checkpoint job itself via `df.observe`, replacing
    * the per-iteration second scan of the checkpointed edge set. Falls back
    * to the explicit scan if the snapshot implementation happens not to
    * drive the observation (defensive — localCheckpoint and parquet writes
    * both do).
    */
  private def snapshotWithSignature(
      edges: DataFrame,
      snapshot: DataFrame => DataFrame
  ): (DataFrame, (Long, BigDecimal)) = {
    val obs = org.apache.spark.sql.Observation()
    val observed = edges.observe(
      obs,
      count(lit(1)).as("n"),
      coalesce(sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")), lit(java.math.BigDecimal.ZERO)).as("h")
    )
    val ccLog = sys.env.contains("GRAFT_CC_LOG")
    val ts0 = if (ccLog) System.nanoTime() else 0L
    val out = snapshot(observed)
    val ts1 = if (ccLog) System.nanoTime() else 0L
    // the observation listener fires async after the snapshot's action;
    // bounded shared poll (graft.util.Observations), then fall back to the
    // explicit scan if the snapshot impl didn't drive the observation
    val m = graft.util.Observations.getWithin(obs)
    if (ccLog)
      println(
        f"[cc]   snapshot ${(ts1 - ts0) / 1e9}%.3f s, obs-wait ${(System.nanoTime() - ts1) / 1e9}%.3f s"
      )
    val sig =
      if (m.nonEmpty) (m("n").asInstanceOf[Long], BigDecimal(m("h").asInstanceOf[java.math.BigDecimal]))
      else signature(out)
    (out, sig)
  }

  /** Node-id compaction: urls -> dense longs via the deterministic seq
    * operator, ordered by url — so numeric min over ids IS lexicographic
    * min over urls and the cluster_id contract survives the mapping. CC
    * iterations then shuffle and compare 8-byte longs instead of ~60-byte
    * url strings (~5x less shuffle volume per round, and every star round
    * shuffles the full edge set). Returns the materialized (url, nid) map.
    *
    * Cost/benefit (measured): compaction spends ~5 extra shuffles (node
    * distinct, seq pass, 2 edge-mapping joins, assignment map-back) to
    * thin every iteration's 2 shuffles. It LOSES below ~10 iterations x
    * large |E| (sf0.1 chain graph: 6.6s -> 11.3s), and wins when
    * iterations x edge bytes dominate — long-chain graphs at TB edge
    * volumes. Hence `compact` is an explicit opt-in on `run`, not a
    * default. Callers pass the exact |E| (both call sites have it from the
    * convergence signature); sizing policy lives in DeterministicSeq.
    */
  private def compactIds(
      edges: DataFrame,
      snapshot: DataFrame => DataFrame,
      edgeCountHint: Long = 0L
  ): DataFrame = {
    val nodes = edges
      .select(col("src").as("url"))
      .unionAll(edges.select(col("dst").as("url")))
      .distinct()
    // The inputs here are iteration checkpoints whose LogicalRDD leaves
    // PROPAGATE the pre-checkpoint plan estimate — after k star rounds
    // (4 self-references each) that estimate is multiplicatively inflated
    // garbage (measured: 6.6 TB for a 20 MB frame -> 50k range partitions
    // -> a 93 s seq pass for a 5 s job). The loop knows |E| exactly from
    // the convergence signature, so hand the seq pass the true size
    // (|V| <= 2|E|, ~96 bytes per url row) and let assign() own the
    // bytes->partitions policy.
    snapshot(
      graft.util.DeterministicSeq
        .assign(nodes, "url", bytesHint = 2L * math.max(edgeCountHint, 0L) * 96L)
        .select(col("url"), col("seq").as("nid"))
    )
  }

  private def mapEdges(edges: DataFrame, ids: DataFrame): DataFrame =
    edges
      .join(ids.select(col("url").as("src"), col("nid").as("_s")), "src")
      .join(ids.select(col("url").as("dst"), col("nid").as("_d")), "dst")
      .select(col("_s").as("src"), col("_d").as("dst"))

  private def mapAssignmentsBack(assign: DataFrame, ids: DataFrame): DataFrame =
    assign
      .join(ids.select(col("nid").as("url"), col("url").as("_u")), "url")
      .join(ids.select(col("nid").as("cluster_id"), col("url").as("_c")), "cluster_id")
      .select(col("_u").as("url"), col("_c").as("cluster_id"))

  /** Run to convergence. Input: edge list with string columns (src, dst),
    * src != dst, any orientation. Output: (url, cluster_id) covering every
    * node that appears in an edge; cluster_id = component-min url.
    *
    * Each iteration ends in an eager SERIALIZED localCheckpoint — this
    * truncates the LOGICAL plan (a star round references its input ~4x, so
    * an untruncated plan grows ~16x per iteration and OOMs the analyzer)
    * and stores bytes, not object graphs. The convergence signature then
    * scans the checkpointed blocks (cheap second action). Iterations run
    * over compacted long node ids (see `compactIds`).
    */
  /** `idSnapshot`: snapshot hook for RUN-LIFETIME frames (the compacted ids
    * map). The ids map is re-read AFTER the last iteration
    * (mapAssignmentsBack), so it must NEVER go through a rotating hook
    * (Checkpoints.reliable with keepLast > 0 — what iteration snapshots
    * use) or the final map-back reads a deleted checkpoint. The default is
    * therefore a non-rotating serialized localCheckpoint, safe with ANY
    * iteration snapshot; durable runs that need the ids map to survive
    * executor loss pass their own non-rotating durable hook (e.g.
    * Checkpoints.reliable(idsDir)).
    */
  /** `compactAfter`: mid-run auto-compaction threshold. Upfront compaction
    * (`compact = true`) loses below ~10 iterations (its ~5 fixed shuffles
    * outweigh the thinner rounds; see `compactIds`), and the iteration
    * count is unknowable upfront — so instead of guessing, the loop
    * switches the LIVE edge set to dense long ids the moment it has run
    * `compactAfter` rounds without converging: shallow graphs (typical ER
    * blocking output converges in 3-5 rounds) never pay the fixed cost,
    * while deep chains — the only regime still iterating at that point,
    * and exactly the regime where remaining-rounds x edge-bytes dominates —
    * run their many remaining rounds on 8-byte ids. The star rounds
    * preserve the node set, and nids are assigned ordered by url over that
    * same set, so numeric min stays lexicographic-min url and the final
    * map-back contract is identical to upfront compaction.
    */
  def run(
      edgesIn: DataFrame,
      maxIterations: Int = 20,
      snapshot: DataFrame => DataFrame = graft.util.Checkpoints.serializedLocal,
      compact: Boolean = false,
      idSnapshot: Option[DataFrame => DataFrame] = None,
      compactAfter: Int = 8
  ): DataFrame = {
    val edges0 = edgesIn
      .select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
    var ids =
      if (compact) {
        // One exact count (a single action over the input, no checkpoint)
        // feeds the seq pass its true size — upfront inputs, like mid-run
        // ones, can lack honest plan stats (cached/checkpointed leaves
        // carry the defaultSizeInBytes sentinel). Mapping to nids BEFORE
        // the first distinct keeps that first full-edge-set shuffle in
        // 8-byte id space (measured: unifying upfront with the mid-run
        // block instead costs an extra url-space checkpoint, 36 -> 52 s
        // on the 500k chain).
        Some(
          compactIds(
            edges0,
            idSnapshot.getOrElse(graft.util.Checkpoints.serializedLocal),
            edges0.count()
          )
        )
      } else None
    var (edges, sig) =
      snapshotWithSignature(ids.fold(edges0)(mapEdges(edges0, _)).distinct(), snapshot)
    val ccLog = sys.env.contains("GRAFT_CC_LOG")
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      if (iter == compactAfter && ids.isEmpty) {
        val tc0 = if (ccLog) System.nanoTime() else 0L
        ids = Some(
          compactIds(edges, idSnapshot.getOrElse(graft.util.Checkpoints.serializedLocal), sig._1)
        )
        if (ccLog) println(f"[cc] compactIds ${(System.nanoTime() - tc0) / 1e9}%.2f s")
        val tm0 = if (ccLog) System.nanoTime() else 0L
        val (remapped, remappedSig) = snapshotWithSignature(mapEdges(edges, ids.get), snapshot)
        if (ccLog) println(f"[cc] remap ${(System.nanoTime() - tm0) / 1e9}%.2f s")
        edges = remapped
        // the signature hashes id VALUES, so the url-space sig is not
        // comparable to the nid-space one; reseed convergence from the
        // remapped set (costs nothing: the next round's sig compares to it)
        sig = remappedSig
        if (ccLog) println(s"[cc] iter=$iter compacted: |E|=${sig._1}")
      }
      val t0 = if (ccLog) System.nanoTime() else 0L
      val (next, nextSig) = snapshotWithSignature(smallStar(largeStar(edges)), snapshot)
      converged = nextSig == sig
      if (!converged && nextSig._1 == sig._1) {
        // Early fixpoint test, saving the final verification round (the
        // signature alone only detects convergence one FULL star round
        // after the fixpoint): small-star output is oriented src > dst, so
        // "no node appears as both src and dst" <=> depth-1 trees whose
        // root is smaller than every member <=> the min-rooted star forest
        // the alternation converges to — sufficient AND necessary. The
        // test is one narrow semi-join with isEmpty's take-1 early exit
        // (an unconverged graph yields a witness almost immediately),
        // gated on count stability — a necessary fixpoint condition — so
        // shrinking rounds never pay it.
        converged = next
          .join(next.select(col("src").as("dst")), Seq("dst"), "left_semi")
          .isEmpty
      }
      sig = nextSig
      edges = next
      iter += 1
      if (ccLog)
        println(f"[cc] iter=$iter |E|=${sig._1} converged=$converged ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // converged edge set is a star forest: (member -> root)
    val assign = starsToAssignments(edges)
    ids.fold(assign)(mapAssignmentsBack(assign, _))
  }

  private def starsToAssignments(edges: DataFrame): DataFrame = {
    val members = edges.select(col("src").as("url"), col("dst").as("cluster_id"))
    val roots = edges.select(col("dst").as("url"), col("dst").as("cluster_id")).distinct()
    members.unionByName(roots).distinct()
  }

  /** Durable variant: every iteration commits through `io` as stage
    * `cc_iter_<i>`, and a restarted run resumes from the last committed
    * iteration (reference restart rule: only committed work survives,
    * app/services/task_queue.py:37 -> SURVEY.md §4.3).
    */
  def runResumable(
      edgesIn: DataFrame,
      io: graft.io.TableIO,
      maxIterations: Int = 20
  ): DataFrame = {
    val spark = edgesIn.sparkSession
    // resume probe from the TOP down: manifest reads are one small JSON
    // file each, and the full commit-validity check (readStage counts the
    // stage's parquet) runs only on the newest committed iteration —
    // probing upward would full-scan EVERY committed multi-TB edge set
    // just to find the last one. Only that last iteration is needed;
    // if its data fails validation, fall back to the next lower commit.
    val resumed: Option[(Int, DataFrame)] =
      (maxIterations to 0 by -1).iterator
        .filter(i => io.manifest(s"cc_iter_$i").isDefined)
        .map(i => i -> io.readStage(spark, s"cc_iter_$i"))
        .collectFirst { case (i, Some(df)) => (i, df) }
    var (iter, edges) = resumed match {
      case Some((i, df)) => (i, df)
      case None =>
        val initial = edgesIn
          .select(col("src"), col("dst"))
          .where(col("src") =!= col("dst"))
          .distinct()
        (0, io.commitStage(initial, "cc_iter_0"))
    }
    var sig = signature(edges)
    var converged = false
    while (!converged && iter < maxIterations) {
      iter += 1
      val next = io.commitStage(smallStar(largeStar(edges)), s"cc_iter_$iter", Seq(s"cc_iter_${iter - 1}"))
      val nextSig = signature(next)
      converged = nextSig == sig
      if (!converged && nextSig._1 == sig._1)
        // same count-gated min-rooted-star-forest early exit as run() —
        // saves the full verification round on the durable path too
        converged = next
          .join(next.select(col("src").as("dst")), Seq("dst"), "left_semi")
          .isEmpty
      sig = nextSig
      edges = next
    }
    starsToAssignments(edges)
  }
}
