package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Normalize
import graft.functions.SimilarityFunctions.{hamming64, minhash_shingles, simhash64}

/** Deduplication family for training-data pipelines. Every flavor reduces to
  * the same scale shape: derive a key/signature per document (narrow), then
  * either group exactly (one hash-aggregate shuffle) or candidate-join and
  * verify (blocked self-join, skew-salted like the ER pipeline).
  *
  * All methods expect an `id` column name + a `text` column (or embedding).
  */
object Dedup {

  /** Exact dedup on a content hash: returns (id, dup_key, canonical, n)
    * where canonical = min id per group. One hash-agg shuffle; the groupBy
    * key is the sha, never the payload.
    */
  def exact(docs: DataFrame, idCol: String, keyExpr: Column): DataFrame = {
    val keyed = docs.select(col(idCol), keyExpr.as("dup_key"))
    val withKey = keyed.where(col("dup_key").isNotNull)
    val groups = withKey
      .groupBy("dup_key")
      .agg(min(col(idCol)).as("canonical"), count(lit(1)).as("n"))
    val grouped = withKey.join(groups, "dup_key")
    // null dup_key (e.g. null text -> sha2 null): the equi-join never
    // matches null, which would silently DELETE those docs from the
    // output. No content means nothing to compare — each is its own
    // singleton, kept explicitly.
    val nullKeyed = keyed
      .where(col("dup_key").isNull)
      .select(col("dup_key"), col(idCol), col(idCol).as("canonical"), lit(1L).as("n"))
    grouped.unionByName(nullKeyed.select(grouped.columns.map(col).toIndexedSeq: _*))
  }

  /** Exact text dedup (whole normalized text sha256). */
  def exactText(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    exact(docs, idCol, sha2(regexp_replace(trim(col("text")), "\\s+", " "), 256))

  /** Output of [[minHashPlan]]: `rows` hash rows per band, `bands` bands,
    * `numHashes` = rows·bands total signature slots, `expectedRecall` at
    * the planned threshold and `fpAtHalf` = the candidate probability for
    * a pair at HALF the threshold (the false-positive proxy).
    */
  final case class MinHashPlan(
      rows: Int,
      bands: Int,
      numHashes: Int,
      expectedRecall: Double,
      fpAtHalf: Double
  )

  /** S-curve planner for MinHash-LSH banding (Leskovec–Rajaraman–Ullman,
    * MMDS ch. 3): a pair with Jaccard s shares at least one of b bands of
    * r rows with probability 1 − (1 − s^r)^b. Picks the DEEPEST rows-per-
    * band r whose band count (solved for the recall target at `threshold`)
    * still fits the `maxHashes` signature budget — for the same guaranteed
    * recall, deeper bands push the S-curve right and the sub-threshold
    * false-positive candidate mass falls like s^r. If even r = 1 cannot
    * reach the target inside the budget the plan degrades to
    * (1, maxHashes) and notes the delivered recall on stderr, mirroring
    * [[SimilaritySearch.lshPlan]]. Deterministic, driver-side arithmetic
    * only. Feed the result to [[minHashPairs]] as (numHashes, bands).
    */
  def minHashPlan(
      threshold: Double = 0.8,
      recall: Double = 0.95,
      maxHashes: Int = 128
  ): MinHashPlan = {
    require(threshold > 0 && threshold < 1, "threshold in (0,1)")
    require(recall > 0 && recall < 1, "recall in (0,1)")
    require(maxHashes >= 1, "maxHashes >= 1")
    def bandsFor(r: Int): Long = {
      val pBand = math.pow(threshold, r.toDouble)
      // pBand underflows to 0 for deep r at tiny thresholds: no band count
      // reaches the target — saturate instead of overflowing the ceil
      if (pBand <= 0.0) Long.MaxValue
      else {
        val b = math.ceil(math.log1p(-recall) / math.log1p(-pBand))
        if (b.isNaN || b >= Long.MaxValue.toDouble) Long.MaxValue else math.max(1L, b.toLong)
      }
    }
    // b <= maxHashes/r (floor) <=> r*b <= maxHashes, without overflow
    val feasible = (1 to 64).filter(r => bandsFor(r) <= (maxHashes / r).toLong)
    val (r, b) =
      if (feasible.nonEmpty) { val rr = feasible.max; (rr, bandsFor(rr).toInt) }
      else (1, maxHashes)
    def curve(s: Double): Double = 1.0 - math.pow(1.0 - math.pow(s, r.toDouble), b.toDouble)
    val expected = curve(threshold)
    if (expected < recall)
      System.err.println(
        f"[graft] minHashPlan clamp: (rows=$r, bands=$b) delivers expected recall $expected%.3f" +
          f" below the requested $recall%.2f — raise maxHashes or accept the lower recall"
      )
    MinHashPlan(r, b, r * b, expected, curve(threshold / 2.0))
  }

  /** MinHash-LSH near-dup candidate pairs (idA < idB), via banded fused
    * shingle-minhash keys + the skew-guarded pair join.
    */
  def minHashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 8,
      maxBlockSize: Int = 1000
  ): DataFrame = {
    val d = docs.select(col(idCol).cast("string").as("url"), col("text"))
    Blocker
      .pairs(MinHashBlocking(shingleSize, numHashes, bands).keys(d).select("url", "key"), maxBlockSize)
      .select(col("urlA").as("id_a"), col("urlB").as("id_b"), col("key"))
  }

  /** SimHash near-dup pairs: fingerprint each doc, block on chunk
    * COMBINATIONS (Manku et al., "Detecting Near-Duplicates for Web
    * Crawling", WWW'07 §3), verify by full Hamming distance.
    *
    * The fingerprint's 64 bits split into 6 chunks (11,11,11,11,10,10); a
    * pair within Hamming distance d <= 3 differs in at most 3 chunks, so
    * at least 6-d chunks agree and the pair shares at least one
    * (6-d)-chunk combination key. Blocking on every C(6, 6-d) combination
    * (d=3: 20 keys/doc, ~32-bit key space) keeps the exactness guarantee
    * of the classic 4x16-bit rotated-chunk scheme while replacing its
    * FIXED 2^16 bucket space — where bucket sizes grow linearly with the
    * corpus and candidate pairs quadratically, the same
    * quadratic-under-the-salt-cap regime measured for 1-token domain keys
    * in graft.tools.ScaleProbe — with a ~2^32 space whose occupancy stays
    * content-bound at web scale.
    */
  /** The Manku chunk-COMBINATION blocking keys behind [[simHashPairs]],
    * exposed so scale probes (graft.tools.ScaleProbe) can measure block
    * statistics on the same key family the operator joins on. Output:
    * (url, key).
    */
  private[graft] def simHashKeys(
      docs: DataFrame,
      idCol: String = "doc_id",
      maxHamming: Int = 3
  ): DataFrame =
    simHashKeysFromFp(
      docs.select(
        col(idCol).cast("string").as("url"),
        simhash64(Normalize.tokensOf(col("text"))).as("fp")
      ),
      maxHamming
    )

  /** Key explosion over a precomputed (url, fp) frame — [[simHashPairs]]
    * reuses its fingerprint pass for both keys and the hamming verify.
    */
  private def simHashKeysFromFp(fp: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 5, "chunk-combination blocking covers maxHamming in [0,5]")
    val sizes = Seq(11, 11, 11, 11, 10, 10)
    val offsets = sizes.scanLeft(0)(_ + _).init
    def chunk(i: Int): Column =
      shiftright(col("fp"), offsets(i)).bitwiseAND(lit((1L << sizes(i)) - 1))
    // C(6, 6-d) combinations guarantee a shared key at Hamming distance
    // <= d; at d=0 that is C(6,6) = ONE full-fingerprint key per doc (the
    // old max(d,1) emitted six 5-chunk keys — 6x the shuffle rows and
    // every d=1 pair as a doomed candidate, pure wasted join volume)
    val pick = 6 - maxHamming
    val combos = (0 until 6).combinations(pick).toSeq
    // one LONG key per combination: combo index in DISJOINT high bits.
    // Combos have different total chunk widths (e.g. pick=3: 30-33 bits),
    // so seeding the fold with idx would make different combos' numeric
    // ranges OVERLAP (idx=1 over 33 chunk bits collides with idx=2 over 32)
    // and unrelated blocks merge on colliding keys. Packed chunk widths are
    // bounded by 54 bits (pick <= 5 of 11-bit chunks), so idx * 2^54 +
    // packed is collision-free across combos: 54 + 5 index bits < 63.
    val comboKeys = combos.zipWithIndex.map { case (c, idx) =>
      val packed = c.foldLeft(lit(0L): Column) { (acc, i) =>
        acc * lit(1L << sizes(i)) + chunk(i)
      }
      lit(idx.toLong) * lit(1L << 54) + packed
    }
    fp.select(col("url"), explode(array(comboKeys: _*)).as("_k"))
      .select(col("url"), col("_k").cast("string").as("key"))
  }

  def simHashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      maxHamming: Int = 3,
      maxBlockSize: Int = 10000
  ): DataFrame = {
    val fp = docs.select(
      col(idCol).cast("string").as("url"),
      simhash64(Normalize.tokensOf(col("text"))).as("fp")
    )
    val keys = simHashKeysFromFp(fp, maxHamming).select("url", "key")
    val pairs = Blocker.pairs(keys, maxBlockSize)
    val fa = fp.select(col("url").as("urlA"), col("fp").as("fp_a"))
    val fb = fp.select(col("url").as("urlB"), col("fp").as("fp_b"))
    pairs
      .join(fa, "urlA")
      .join(fb, "urlB")
      .withColumn("hamming", hamming64(col("fp_a"), col("fp_b")))
      .where(col("hamming") <= maxHamming)
      .select(col("urlA").as("id_a"), col("urlB").as("id_b"), col("hamming"))
  }

  /** n-gram Jaccard verification over candidate pairs: joins token arrays
    * back to (id_a, id_b) pairs and computes exact Jaccard over hashed
    * shingle sets (native kernel — no shingle strings materialized, and the
    * pair join ships token arrays, not the n-times-bigger gram arrays).
    */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id", n: Int = 3): DataFrame = {
    val sh = docs.select(
      col(idCol).cast("string").as("id"),
      Normalize.tokensOf(col("text")).as("toks")
    )
    pairs
      .join(sh.select(col("id").as("id_a"), col("toks").as("t_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("toks").as("t_b")), "id_b")
      .withColumn("jaccard", graft.functions.SimilarityFunctions.ngram_jaccard(col("t_a"), col("t_b"), n))
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding-cosine near-duplicate pairs above `threshold` — EXACT by
    * default (`lshBits = 0`: the quadratic all-pairs join; correct at any
    * threshold, affordable only at bounded corpus sizes). The scale path is
    * [[embeddingNearDupApprox]] — a separate name so the exact->approximate
    * recall change is explicit at every call site.
    */
  /** Dense-cell refinement for LSH bucket keys — the embedding-family
    * analog of [[Blocker.saltOversized]], keeping the shuffle key a STRUCT
    * of longs (never string concat). Needed because lshPlan bounds only the
    * EXPECTED bucket size: realized sign-LSH cell occupancy is skewed, and
    * the skew GROWS with bits (measured in graft.tools.ScaleProbe: max
    * bucket 3.9-20x the mean from 85k to 848k docs; candidate pairs/doc
    * climbed 4254 -> 8358 -> 14117 while the planned size stayed
    * bounded) — and real embedding corpora are CLUSTERED, which is worse.
    *
    * Buckets over `cap` rows are split by ceil(log2(bn/cap)) EXTRA
    * hyperplane bits from `key.extra` — CONTENT-derived, not id-derived:
    * an id-salt would separate a true near-dup pair with prob 1 - 1/nb in
    * EVERY table whose cell is dense (dense clusters are dense in all
    * tables), whereas extra sign bits agree for a pair at cos >= t with
    * prob (1 - acos(t)/pi) per bit (~0.9 at t = 0.95), so the per-table
    * retention after k refinement bits is ~0.9^k instead of ~1/2^k. The
    * worst-case join volume is bounded at ~cap rows per block regardless
    * of skew; the cosine verify keeps the output exact either way.
    *
    * Input: (id, key struct<t, b, extra>) — `extra` carries up to 24
    * pre-computed refinement bits (cells denser than cap * 2^24 stay
    * partially unsplit, far past any real corpus).
    */
  private[graft] def saltBuckets(bucketed: DataFrame, cap: Int): DataFrame = {
    val base = bucketed.select(col("id"), struct(col("key.t"), col("key.b")).as("tb"), col("key.extra"))
    val sizes = base.groupBy("tb").agg(count(lit(1)).as("bn"))
    base
      .join(sizes.where(col("bn") > cap), Seq("tb"), "left")
      .select(
        col("id"),
        struct(
          col("tb.t").as("t"),
          col("tb.b").as("b"),
          when(col("bn").isNull, lit(0L))
            .otherwise(
              // mask = 2^k - 1, k = ceil(log2(bn/cap)) clamped to the 24
              // precomputed refinement bits (shiftleft needs a literal
              // shift, pow is exact for k <= 24)
              col("extra").bitwiseAND(
                (pow(lit(2.0), least(ceil(log(2.0, col("bn") / cap)), lit(24.0))).cast("long") - 1)
              )
            )
            .as("sub")
        ).as("key")
      )
  }

  def embeddingNearDup(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.9,
      lshBits: Int = 0,
      lshTables: Int = 6,
      maxBucketRows: Int = 10000
  ): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val paired =
      if (lshBits > 0) {
        // bucket join ships ONLY (id, key) — never the dense vectors (an
        // exploded vector column would shuffle the embeddings lshTables
        // times); vectors re-attach to the deduped candidate pairs via two
        // id-equi-joins, the same fetch-join shape as simHashPairs
        val keys = (0 until lshTables).map(t =>
          struct(
            lit(t).as("t"),
            SimilaritySearch.hyperplaneBucket(col("v"), lshBits, seed = t).as("b"),
            // refinement bits for dense-cell splitting, from an independent
            // hyperplane family (seed offset past every table's base seed)
            SimilaritySearch.hyperplaneBucket(col("v"), 24, seed = lshTables + t).as("extra")
          )
        )
        val buckets = saltBuckets(e.select(col("id"), explode(array(keys: _*)).as("key")), maxBucketRows)
        val cand = buckets
          .select(col("id").as("id_a"), col("key"))
          .join(buckets.select(col("id").as("id_b"), col("key")), Seq("key"))
          .where(col("id_a") < col("id_b"))
          .select("id_a", "id_b")
          .distinct()
        cand
          .join(e.select(col("id").as("id_a"), col("v").as("va")), "id_a")
          .join(e.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      } else {
        val a = e.select(col("id").as("id_a"), col("v").as("va"))
        val b = e.select(col("id").as("id_b"), col("v").as("vb"))
        a.join(b, col("id_a") < col("id_b"))
      }
    paired
      .withColumn("cos", SimilaritySearch.cosine(col("va"), col("vb")))
      .where(col("cos") > threshold)
      .select("id_a", "id_b", "cos")
  }

  /** APPROXIMATE embedding near-dup — the 100 TB path: candidates restricted
    * to pairs sharing a sign-LSH bucket in at least one of `lshTables`
    * independent tables (equi-join on (table, bucket)), then verified by
    * exact cosine — false positives never survive; recall is what is
    * approximate. Recall for true near-dups at cos >= 0.9 with
    * (6 bits, 6 tables) is ~0.95+ and rises with the threshold (identical
    * vectors are found with certainty). Explicitly named so callers opt into
    * the recall trade (the exact mode stays [[embeddingNearDup]]).
    */
  def embeddingNearDupApprox(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.9,
      lshBits: Int = 6,
      lshTables: Int = 6,
      maxBucketRows: Int = 10000
  ): DataFrame = {
    require(lshBits > 0, "embeddingNearDupApprox needs lshBits > 0; use embeddingNearDup for the exact mode")
    embeddingNearDup(embeddings, idCol, vecCol, threshold, lshBits, lshTables, maxBucketRows)
  }

  /** [[embeddingNearDupApprox]] with (bits, tables) derived from the corpus
    * size via [[SimilaritySearch.lshPlan]] — a FIXED bits value means 2^bits
    * buckets whose sizes grow linearly with the corpus and whose bucket-join
    * pairs grow quadratically; the plan instead bounds expected bucket rows
    * at `targetBucketRows` for any corpus size and re-solves the table count
    * for the recall target. Costs one count() action; deterministic given
    * the data.
    */
  def embeddingNearDupAuto(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.9,
      targetBucketRows: Int = 1000,
      recall: Double = 0.95
  ): DataFrame = {
    // convenience wrapper: the input cache is released only by LRU
    // eviction. One-shot jobs are fine; long-lived sessions (server,
    // notebook, streaming driver) that call this repeatedly should use
    // [[embeddingNearDupAutoWithRelease]] and release after their action,
    // or stale caches accumulate and evict still-hot ones.
    embeddingNearDupAutoWithRelease(embeddings, idCol, vecCol, threshold, targetBucketRows, recall)._1
  }

  /** [[embeddingNearDupAuto]] with an explicit cache-release hook (the
    * PairScorer.featuresWithRelease pattern): call the hook after the
    * terminal action on the returned frame to drop the pinned input cache.
    */
  def embeddingNearDupAutoWithRelease(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.9,
      targetBucketRows: Int = 1000,
      recall: Double = 0.95
  ): (DataFrame, () => Unit) = {
    // persist the projected frame: the count() action and the LSH
    // key-explode + two fetch-joins would otherwise re-run an expensive
    // upstream plan several times
    val e = embeddings
      .select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val plan = SimilaritySearch.lshPlan(e.count(), threshold, targetBucketRows, recall)
    // dense-cell cap at 4x the PLANNED bucket size: realized sign-LSH
    // bucket skew (ScaleProbe: max cell 4-20x the mean, growing with bits)
    // can't push the join volume past ~4 * target * tables / 2 per row —
    // oversized cells split by content-derived refinement bits
    // (saltBuckets), so the recall cost stays ~pBit^k per affected table
    val out =
      embeddingNearDup(e, idCol, vecCol, threshold, plan.bits, plan.tables, maxBucketRows = 4 * targetBucketRows)
    (out, () => { e.unpersist(blocking = false); () })
  }

  /** SemDeDup (Abbas et al., arXiv:2303.09540): k-means-cluster the
    * embedding space, then look for near-duplicates only WITHIN clusters —
    * the published semantic-dedup recipe for web-scale corpora (LAION /
    * C4 experiments). Uses the bit-stable spherical trainer
    * ([[SimilaritySearch.trainIvf]]) so reruns and resumes assign boundary
    * vectors identically. Returns candidate pairs (id_a, id_b, cell, cos)
    * with cos >= tau; compose with [[resolve]] for the keep/drop list.
    *
    * Recall caveat (inherent to the method, documented in the paper): a
    * near-dup pair split across two cells is missed — exact copies never
    * are (identical vectors share a nearest centroid by determinism of the
    * assignment kernel). Scale shape: the codebook is nList rows (driver +
    * one broadcast); assignment is one row-local codegen pass; the
    * self-join is a cell equi-join with cell sizes ~corpus/nList by
    * construction (pick nList ~ n / targetCellRows), so the within-cell
    * pair volume is bounded and the corpus-sized frame never cross-joins.
    */
  def semDedupPairs(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      tau: Double = 0.9,
      nList: Int = 64,
      maxIters: Int = 5
  ): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val codebook = SimilaritySearch.trainIvf(e, "id", "v", nList, maxIters)
    val bc = e.sparkSession.sparkContext.broadcast(codebook)
    val assigned = e
      .where(col("v").isNotNull && size(col("v")) > 0)
      .withColumn(
        "cell",
        element_at(graft.functions.SimilarityFunctions.nearest_centroids(col("v"), bc, 1), 1)
      )
    assigned
      .select(col("id").as("id_a"), col("cell"), col("v").as("va"))
      .join(assigned.select(col("id").as("id_b"), col("cell"), col("v").as("vb")), Seq("cell"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", SimilaritySearch.cosine(col("va"), col("vb")))
      .where(col("cos") >= tau)
      .select("id_a", "id_b", "cell", "cos")
  }

  /** Near-dup RESOLUTION — the last mile of corpus dedup: turn verified
    * duplicate PAIRS (any family: MinHash, SimHash, embedding, span)
    * into a per-doc keep/drop decision. Pairs must close transitively
    * (A~B and B~C must not keep both A and C), so clusters come from the
    * checkpointed large/small-star operator; the canonical per cluster is
    * the LONGEST text (the usual keep-the-fullest-copy policy), ties to
    * the smallest id. Docs in no pair are singleton keeps.
    *
    * Output: (idCol, cluster_id, canonical, keep). Scale shape: CC over
    * the (small) pair set, one min(struct) agg per cluster for the
    * canonical, two keyed joins to land it back on the corpus — text
    * length travels as an int, text never joins.
    */
  def resolve(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    // accept both pair shapes this file produces: (urlA, urlB) from the
    // blocking path and (id_a, id_b) from minHashPairs/simHashPairs/
    // embeddingNearDup — resolve is documented as composing with ANY family
    val (a, b) =
      if (pairs.columns.contains("urlA")) ("urlA", "urlB")
      else if (pairs.columns.contains("id_a")) ("id_a", "id_b")
      else sys.error(s"pairs must have (urlA, urlB) or (id_a, id_b); got ${pairs.columns.mkString(",")}")
    val assign = ConnectedComponents
      .run(pairs.select(col(a).as("src"), col(b).as("dst")))
      .select(col("url").as(idCol), col("cluster_id"))
    // null text must LOSE the canonical pick (embedding-family pairs never
    // inspect text, so null-text members reach here; a null length would
    // otherwise WIN — struct ordering sorts null fields first)
    val d = docs.select(col(idCol), coalesce(length(col(textCol)), lit(-1)).as("_len"))
    val membered = d
      .join(assign, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cluster_id"), col(idCol)).as("cluster_id"), col("_len"))
    val canon = membered
      .groupBy("cluster_id")
      .agg(min(struct((-col("_len")).as("nl"), col(idCol).as("id"))).as("_c"))
      .select(col("cluster_id"), col("_c.id").as("canonical"))
    membered
      .join(canon, Seq("cluster_id"))
      .select(
        col(idCol),
        col("cluster_id"),
        col("canonical"),
        (col(idCol) === col("canonical")).as("keep")
      )
  }

  /** Line-level (C4/CCNet-style) corpus dedup: drop every line whose
    * document frequency exceeds `maxDocFreq`, preserving the order of the
    * surviving lines per document. Input: (`idCol`, `linesCol:
    * array<string>`) — the caller decides what a "line" is (newline split,
    * sentence split, fixed word chunks); output: (`idCol`, `text_clean`),
    * one row per input document (all-boilerplate docs survive with "").
    *
    * Scale shape (no driver state, no broadcast, no cartesian):
    * posexplode is row-local; doc frequency is distinct(line-hash, id) +
    * one map-side-combinable count per hash; the filter is a left-semi
    * join of the exploded lines against surviving hashes — all keyed on
    * the 8-byte xxhash64 of the line, so shuffles never carry line text
    * on the build side. Reassembly is one groupBy(id) with an
    * array_sort(collect_list(struct(pos, line))) — per-doc state bounded
    * by document length. The only approximation vs per-string grouping is
    * a 2^-64 xxhash64 collision.
    */
  /** Span-level exact-substring dedup: remove from EVERY document each
    * word span that appears (as an exact `windowWords`-word window)
    * `minFreq`+ times anywhere in the corpus — the windowed-hash
    * relaxation of suffix-array ExactSubstr dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better": drop all
    * duplicated substrings of >= 50 tokens; a suffix array is not
    * expressible relationally, but stride-1 windows give the same
    * guarantee at word granularity — any duplicated span of >=
    * `windowWords` words is fully covered by duplicated windows, and
    * nothing shorter is ever touched). Within-doc repetition counts
    * toward the frequency (a doc repeating its own span gets it removed),
    * matching the paper's "appears more than once in the corpus".
    *
    * Input: (`idCol`, `wordsCol: array<string>`) — caller tokenizes, same
    * contract as [[lineDedup]]. Output one row per input doc:
    * (`idCol`, n_words, n_removed, text_clean), all-duplicate docs
    * survive with "".
    *
    * Scale shape: window formation is row-local (stride-1 xxhash64 over
    * word windows; costs `windowWords`x the hashing of a rolling
    * Rabin-Karp — see TextAnalysis.fingerprints for that kernel — but
    * stays inside whole-stage codegen and collision-behaves like 2^-64);
    * the shuffle rows are (id, int-offset, 8-byte hash) — window TEXT
    * never shuffles. Frequency is one map-side-combinable count by hash;
    * duplicated offsets come back via a left-semi join on the hash;
    * offset->word-index expansion multiplies only the DUPLICATED windows
    * by `windowWords`. The rebuild is the lineDedup shape: exploded words
    * anti-joined against removed indexes, one groupBy(id) with per-doc
    * state bounded by document length.
    */
  def spanDedup(
      docs: DataFrame,
      idCol: String = "doc_id",
      wordsCol: String = "words",
      windowWords: Int = 50,
      minFreq: Long = 2L,
      sep: String = " "
  ): DataFrame = {
    require(windowWords >= 1, s"windowWords must be >= 1 (got $windowWords)")
    require(minFreq >= 2, s"minFreq < 2 would remove every window (got $minFreq)")
    val base = docs.select(col(idCol), col(wordsCol).as("_w"))
    val words = base.select(col(idCol), posexplode(col("_w")).as(Seq("idx", "word")))
    // materialized once: the window table feeds BOTH the frequency
    // aggregation and the duplicated-offset semi-join probe, and the
    // stride-1 window hashing (windowWords x the text bytes re-hashed per
    // position) is the operator's dominant row-local kernel — recomputing
    // it per consumer doubled the stage. The cached rows are the narrow
    // (id, int-offset, 8-byte hash) proxy, never window text.
    val wins = graft.util.Checkpoints.serializedLocal(
      base
        .where(size(col("_w")) >= windowWords) // shorter docs form no window
        .select(
          col(idCol),
          explode(
            transform(
              sequence(lit(0), size(col("_w")) - windowWords),
              off =>
                struct(
                  off.as("off"),
                  xxhash64(array_join(slice(col("_w"), off + lit(1), lit(windowWords)), sep)).as("h")
                )
            )
          ).as("w")
        )
        .select(col(idCol), col("w.off").as("off"), col("w.h").as("h"))
    )
    val dup = wins
      .groupBy("h")
      .agg(count(lit(1)).as("occ"))
      .where(col("occ") >= minFreq)
      .select("h")
    val removed = wins
      .join(dup, Seq("h"), "left_semi")
      .select(col(idCol), explode(sequence(col("off"), col("off") + lit(windowWords - 1))).as("idx"))
      .distinct()
    val rebuilt = words
      .join(removed, Seq(idCol, "idx"), "left_anti")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("_n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("idx"), col("word")))),
            x => x.getField("word")
          ),
          sep
        ).as("text_clean")
      )
    base
      .select(col(idCol), size(col("_w")).cast("long").as("n_words"))
      .join(rebuilt, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_words"),
        (col("n_words") - coalesce(col("_n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("text_clean"), lit("")).as("text_clean")
      )
  }

  def lineDedup(
      docs: DataFrame,
      idCol: String = "doc_id",
      linesCol: String = "lines",
      maxDocFreq: Long = 1L,
      sep: String = " "
  ): DataFrame = {
    val lines = docs
      .select(col(idCol), posexplode(col(linesCol)).as(Seq("pos", "line")))
      .withColumn("h", xxhash64(col("line")))
    val keep = lines
      .select(col("h"), col(idCol))
      .distinct() // a line repeated WITHIN one doc counts once toward df
      .groupBy("h")
      .agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDocFreq)
      .select("h")
    val rebuilt = lines
      .join(keep, Seq("h"), "left_semi")
      .groupBy(idCol)
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")
          ),
          sep
        ).as("text_clean")
      )
    docs
      .select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("text_clean"), lit("")).as("text_clean"))
  }
}
