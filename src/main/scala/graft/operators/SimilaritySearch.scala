package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SimilarityFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; the quadratic cross join is
  * the scale ceiling). Scale path: sign-LSH (random-hyperplane) bucketing —
  * candidates share a bucket, the quadratic term shrinks to bucket-local
  * joins; recall is tuned by bits/tables. Hyperplanes are deterministic
  * (derived from the seed) so results are reproducible with no stored model;
  * the plane matrix is built once per executor JVM and the per-row cost is
  * one tight dot-product loop inside whole-stage codegen (native
  * expression, graft.functions.SignLsh — not per-element lambda chains).
  */
object SimilaritySearch {

  /** Cosine similarity between two array<double> columns (in index order —
    * deterministic summation; native codegen kernel).
    */
  def cosine(a: Column, b: Column): Column =
    SimilarityFunctions.dense_cosine(a, b)

  /** `bits`-bit sign-LSH bucket id (long): bit p = sign of the dot product
    * with deterministic pseudo-random hyperplane p of `seed`'s family.
    */
  def hyperplaneBucket(v: Column, bits: Int, seed: Int = 0): Column =
    SimilarityFunctions.sign_lsh(v, bits, seed)

  /** Corpus-size-derived sign-LSH parameters. A FIXED bits value is a scale
    * bug: 2^bits buckets means bucket sizes grow linearly with the corpus
    * and bucket-join candidate pairs quadratically (the same
    * quadratic-under-the-cap regime graft.tools.ScaleProbe measured for
    * 1-token domain blocking keys). Instead:
    *
    *  - `bits` = ceil(log2(n / targetBucketRows)) bounds the EXPECTED
    *    bucket size at targetBucketRows for any corpus size, so candidate
    *    pairs per row stay O(targetBucketRows) as n grows;
    *  - `tables` then restores recall at the cosine threshold: a true pair
    *    at cos = t agrees on one hyperplane bit with p = 1 - acos(t)/pi,
    *    on a whole table with p^bits, and is missed by all T independent
    *    tables with (1 - p^bits)^T — solve for T at the recall target.
    *
    * Values are clamped to cost-sane ranges (bits in [4, 24], tables in
    * [1, 64]); past the clamps (n >~ 2^24 * targetBucketRows, or a table
    * count the recall target can't afford) the guarantees DEGRADE, so the
    * plan carries `expectedRecall` — the recall the returned (bits,
    * tables) actually deliver — and a clamp that moves it below the
    * request is additionally noted on stderr. Deterministic: depends only
    * on (n, threshold, targets).
    */
  final case class LshParams(bits: Int, tables: Int, expectedRecall: Double)

  def lshPlan(
      n: Long,
      threshold: Double = 0.9,
      targetBucketRows: Int = 1000,
      recall: Double = 0.95
  ): LshParams = {
    require(threshold > 0 && threshold < 1, "threshold in (0,1)")
    require(recall > 0 && recall < 1, "recall in (0,1)")
    val bits = math.max(
      4,
      math.min(24, math.ceil(math.log(math.max(n, 1L).toDouble / targetBucketRows) / math.log(2)).toInt)
    )
    val pBit = 1.0 - math.acos(threshold) / math.Pi
    val pTable = math.pow(pBit, bits.toDouble)
    val tables = math.max(1, math.min(64, math.ceil(math.log1p(-recall) / math.log1p(-pTable)).toInt))
    val expected = 1.0 - math.pow(1.0 - pTable, tables.toDouble)
    if (expected < recall)
      System.err.println(
        f"[graft] lshPlan clamp: (bits=$bits, tables=$tables) delivers expected recall $expected%.3f" +
          f" below the requested $recall%.2f at n=$n — raise targetBucketRows or accept the lower recall"
      )
    LshParams(bits, tables, expected)
  }

  /** Exact brute-force cosine top-k: for each query row, the k nearest
    * corpus rows. Broadcast the smaller (query) side; the corpus streams.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor"), col(vecCol).cast("array<double>").as("cv"))
    val scored = c
      .join(broadcast(q), lit(true))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("neighbor").asc)
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select("qid", "rk", "neighbor", "cos")
  }

  /** Exact brute-force cosine top-k over int8-QUANTIZED vectors (pair with
    * [[graft.functions.EmbeddingFunctions.quantizeInt8]]): symmetric
    * quantization's per-vector scale CANCELS in cosine —
    * cos(s_a·a, s_b·b) = dot(a,b)/(|a||b|) — so the whole ranking runs in
    * integer space over vectors shipping 1/4 the bytes of float32 (the
    * fetch-join and broadcast are the cost at corpus scale, so the byte
    * ratio is the speedup). Ranking is EXACT with respect to the
    * quantized codes; vs the float vectors it differs only by the
    * quantization error (<= scale/2 per coordinate). Integer sums cannot
    * overflow: dims x 127^2 and its square stay far under 2^63 for any
    * realistic dimension.
    */
  def bruteForceTopKInt8(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      qvCol: String,
      k: Int
  ): DataFrame = {
    def codes(df: DataFrame, as: String, vecAs: String) =
      df.select(col(idCol).as(as), col(qvCol).getField("q").as(vecAs))
    def sq(a: Column) =
      aggregate(transform(a, x => x.cast("long") * x.cast("long")), lit(0L), (s, x) => s + x)
    val q = codes(queries, "qid", "_qa")
    val c = codes(corpus, "neighbor", "_qb")
    val dot = aggregate(
      zip_with(col("_qa"), col("_qb"), (x, y) => x.cast("long") * y.cast("long")),
      lit(0L),
      (s, x) => s + x
    )
    val scored = c
      .join(broadcast(q), lit(true))
      .withColumn("_na", sq(col("_qa")))
      .withColumn("_nb", sq(col("_qb")))
      .withColumn(
        "cos",
        when(col("_na") === 0 || col("_nb") === 0, 0.0)
          .otherwise(dot.cast("double") / sqrt((col("_na") * col("_nb")).cast("double")))
      )
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("neighbor").asc)
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select("qid", "rk", "neighbor", "cos")
  }

  /** IVF-bucketed ANN top-k (the other classic scale path, next to sign-LSH):
    * `nList` centroids are drawn deterministically from the corpus by id
    * hash (a seeded stand-in for k-means — the assignment/probe plumbing is
    * identical; plug a trained codebook into `centroids` for real IVF),
    * every corpus row is assigned to its nearest centroid (one broadcast
    * pass, codegen kernel), and each query probes its `nProbe` nearest
    * cells — the cross join shrinks to cell-local equi-joins.
    *
    * The centroid table is bounded (nList rows -> driver collect + one
    * broadcast), never the corpus.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nList: Int = 64,
      nProbe: Int = 8,
      codebook: Option[Array[Array[Double]]] = None
  ): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
    // codebook precedence: a trained one (trainIvf) plugs in; otherwise a
    // deterministic hash-stride sample (bounded collect) stands in
    val centroids: Array[Array[Double]] = codebook.getOrElse {
      // null/empty embeddings must not reach the sample: Row.getSeq would
      // return null and NPE on the driver (trainIvf applies the same guard)
      val valid = c.where(col("cv").isNotNull && size(col("cv")) > 0)
      val n = math.max(valid.count(), 1L)
      val stride = math.max(n / math.max(nList, 1), 1L)
      valid
        .where(pmod(xxhash64(col("neighbor")), lit(stride)) === 0)
        .orderBy("neighbor")
        .limit(nList)
        .collect()
        .map(_.getSeq[Double](1).toArray)
    }
    require(centroids.nonEmpty, "ivfTopK: empty corpus")
    val bc = c.sparkSession.sparkContext.broadcast(centroids)
    val assigned = c.withColumn(
      "cell",
      element_at(SimilarityFunctions.nearest_centroids(col("cv"), bc, 1), 1)
    )
    val probed = q.withColumn(
      "cell",
      explode(SimilarityFunctions.nearest_centroids(col("qv"), bc, nProbe))
    )
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("neighbor").asc)
    probed
      .join(assigned, "cell")
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select("qid", "rk", "neighbor", "cos")
  }

  /** Distributed spherical k-means (Lloyd's) IVF codebook trainer, matching
    * [[ivfTopK]]'s max-cosine assignment. Per iteration: ONE broadcast of
    * the (nList x dim) codebook, one map-side-combined groupBy producing at
    * most nList rows of (count, per-dimension sum) — the corpus never
    * shuffles, so an iteration over 10^12 rows moves nList*(dim+1) doubles.
    * Cell means are left unnormalized (cosine assignment is scale-invariant).
    *
    * Init is the same deterministic hash-stride sample ivfTopK uses
    * untrained; empty cells keep their previous centroid. Training on a
    * sampled subset (`corpus.sample(...)`) and assigning the full corpus is
    * the usual 100 TB shape — the trainer takes whatever frame it is given.
    *
    * Result is BIT-STABLE across parallelism/partitioning: each coordinate
    * is truncated to 2^-40 fixed point (deterministic per element) and the
    * per-cell sums accumulate as three non-overlapping LONG chunk sums
    * (bits >=40 arithmetic-shifted, bits 20-39, bits 0-19) — exact integer
    * arithmetic, associative + commutative — so partition order cannot
    * perturb the reconstructed mean's bits and a resumed/replayed
    * trained-IVF job assigns boundary vectors identically. (The first
    * bit-stable implementation summed decimal(38,18); per-row BigDecimal
    * allocation made the stats pass ~1.7x slower than double sums, while
    * primitive long sums stay inside whole-stage codegen at double-sum
    * speed. Chunk bounds: the two low sums are < n*2^20, safe past 10^12
    * rows per cell; the high sum is < n*(max|coord|+1); the 2^40 scaling
    * cast bounds |coord| < ~8.4e6 and overflow anywhere fails loudly under
    * ANSI, never silently. Truncation loss is < 2^-40 per element — noise
    * relative to k-means' own tolerance.)
    */
  def trainIvf(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nList: Int,
      maxIters: Int = 10,
      tol: Double = 1e-6
  ): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    val c = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("cv"))
      .where(col("cv").isNotNull && size(col("cv")) > 0)
    val n = c.count()
    require(n > 0, "trainIvf: empty corpus")
    val k = math.min(nList.toLong, n).toInt
    val stride = math.max(n / k, 1L)
    var centroids: Array[Array[Double]] = c
      .where(pmod(xxhash64(col("id")), lit(stride)) === 0)
      .orderBy("id")
      .limit(k)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    if (centroids.length < k) // hash stride can undershoot on tiny inputs
      centroids = c.orderBy("id").limit(k).collect().map(_.getSeq[Double](1).toArray)
    // ragged corpora: the codebook itself must be uniform too — a sampled
    // short centroid would crash the driver-side shift loop and the
    // Array.tabulate(dim) mean update, not just the element_at aggregation
    val dim = centroids.head.length
    centroids = centroids.filter(_.length == dim)
    // train only on vectors of the codebook's dimension: ANSI element_at
    // would throw on shorter rows (and longer rows would skew the means).
    // Ragged rows are merely excluded from TRAINING — nearestCentroids
    // tolerates them at assignment/search time.
    val vecs = c
      .select("cv")
      .where(size(col("cv")) === dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var iter = 0
      var shift = Double.MaxValue
      while (iter < maxIters && shift > tol) {
        val bc = spark.sparkContext.broadcast(centroids)
        val scale = 1099511627776.0 // 2^40 fixed-point scale
        val mask = lit(0xFFFFFL)
        // (cell, pos)-keyed narrow aggregation, NOT 3*dim wide agg columns:
        // each iteration builds a fresh plan (new broadcast), so the wide
        // form re-janino-compiled a 1+3*dim-column aggregate per iteration —
        // compile time dominated the pass at small scale. The exploded form
        // sums the SAME scaled-long chunks grouped by (cell, pos): identical
        // exact integer arithmetic, still associative/commutative, so the
        // reconstructed means stay bit-stable; partial map-side aggregation
        // bounds the shuffle at nList*dim rows per map task.
        val scaled = (col("x") * scale).cast("long")
        val cellStats = vecs
          .withColumn("cell", element_at(SimilarityFunctions.nearest_centroids(col("cv"), bc, 1), 1))
          .select(col("cell"), posexplode(col("cv")).as(Seq("pos", "x")))
          .groupBy("cell", "pos")
          .agg(
            count(lit(1)).as("cnt"),
            sum(shiftright(scaled, 40)).as("h"),
            sum(shiftright(scaled, 20).bitwiseAND(mask)).as("m"),
            sum(scaled.bitwiseAND(mask)).as("l")
          )
          .collect() // <= nList * dim rows
        val next = centroids.map(_.clone())
        cellStats.foreach { r =>
          val cell = r.getInt(0)
          val pos = r.getInt(1)
          val cnt = r.getLong(2).toDouble
          // exact integer chunks -> one deterministic double rounding
          val hi = r.getLong(3).toDouble * scale
          val mid = r.getLong(4).toDouble * 1048576.0 // 2^20
          val lo = r.getLong(5).toDouble
          next(cell)(pos) = (hi + mid + lo) / scale / cnt
        }
        shift = centroids
          .zip(next)
          .map { case (a, b) =>
            var s = 0.0; var i = 0
            while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
            math.sqrt(s)
          }
          .max
        centroids = next
        bc.unpersist()
        iter += 1
      }
      centroids
    } finally { vecs.unpersist(); () }
  }

  /** LSH-bucketed ANN top-k: queries only meet corpus rows in the same
    * bucket (one equi-join instead of a cross join). `tables` independent
    * hash tables trade compute for recall; results are deduped across
    * tables before ranking. Bucket keys are (table, long-bucket) pairs —
    * never string concat in the shuffle key.
    *
    * At scale, size (bits, tables) from the corpus count via [[lshPlan]] —
    * a fixed `bits` means bucket sizes grow linearly with the corpus and
    * the bucket join quadratically.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 8,
      tables: Int = 4
  ): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor"), col(vecCol).cast("array<double>").as("cv"))
    def keyed(df: DataFrame, vec: String): DataFrame = {
      val keys = (0 until tables).map(t =>
        struct(lit(t).as("t"), hyperplaneBucket(col(vec), bits, seed = t).as("b"))
      )
      df.withColumn("key", explode(array(keys: _*)))
    }
    val candidates = keyed(q, "qv")
      .join(keyed(c, "cv"), "key")
      .select("qid", "qv", "neighbor", "cv")
      .dropDuplicates("qid", "neighbor")
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("neighbor").asc)
    candidates
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select("qid", "rk", "neighbor", "cos")
  }
}
