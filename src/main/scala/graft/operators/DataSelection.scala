package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection: score a raw web corpus by how much it
  * resembles a small high-quality target corpus, then resample toward the
  * target distribution (Xie et al., "Data Selection for Language Models via
  * Importance Resampling", NeurIPS 2023). The published recipe over hashed
  * n-gram features with bag-of-features models:
  *
  *   log w(x) = sum_f c_f(x) * (ln p_target(f) - ln p_raw(f))
  *
  * which over the engine's hashed-unigram machinery is exactly
  * `n_tok(x) * (lp_mean_target(x) - lp_mean_raw(x))` — both terms come from
  * [[TextAnalysis.unigramLogProb]]'s count-weighted mean, so the weight
  * costs two row-local codegen'd scoring passes against two broadcast
  * models (each ONE bounded hashed-bucket aggregation; the vocabulary never
  * shuffles).
  *
  * Selection is Gumbel top-k — the exact equivalent of sampling k docs
  * without replacement with probability proportional to w(x) (Vieira 2014):
  * key_i = log w_i + g_i with g_i = -ln(-ln u_i). The noise is seeded and
  * deterministic (u_i derived from xxhash64(id + seed)), so a selection is
  * reproducible and resumable; top-k executes as TakeOrdered (per-partition
  * heads, then a k-row merge — no global sort materializes).
  *
  * 100 TB shape: model builds are the bounded aggregations documented on
  * [[TextAnalysis.unigramModel]]; weighting is zero-exchange row-local;
  * the only global structure is the k-row TakeOrdered result. Persist the
  * two (t, c) model frames to score future deltas against FROZEN models
  * (the idfArtifact pattern).
  */
object DataSelection {

  /** Importance-weight a raw corpus against a target corpus: builds both
    * hashed-unigram models, then delegates to [[weighted]]. Adds columns
    * `lp_target`, `lp_raw`, `n_tok`, `logw`.
    */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      textCol: String = "text",
      buckets: Int = 1 << 18
  ): DataFrame = {
    val (mt, tt) = TextAnalysis.unigramModel(target, textCol, buckets)
    val (mr, tr) = TextAnalysis.unigramModel(raw, textCol, buckets)
    weighted(raw, mt, tt, mr, tr, textCol, buckets)
  }

  /** Frozen-model variant: score `raw` against persisted target/raw model
    * frames (the (t, c) output of [[TextAnalysis.unigramModel]]) — the
    * delta-scoring path for incremental corpus builds.
    */
  def weighted(
      raw: DataFrame,
      targetModel: DataFrame,
      targetTotal: Long,
      rawModel: DataFrame,
      rawTotal: Long,
      textCol: String = "text",
      buckets: Int = 1 << 18
  ): DataFrame =
    weightedNgram(raw, targetModel, targetTotal, rawModel, rawTotal, split(col(textCol), " "), buckets)

  /** The paper's hashed-BIGRAM feature space: identical machinery over
    * adjacent-pair features ([[TextAnalysis.bigramsOf]]). Bigrams carry
    * word-order evidence unigrams can't (DSIR's reported configuration).
    */
  def importanceWeightsBigram(
      raw: DataFrame,
      target: DataFrame,
      textCol: String = "text",
      buckets: Int = 1 << 18
  ): DataFrame = {
    val toks = TextAnalysis.bigramsOf(split(col(textCol), " "))
    val (mt, tt) = TextAnalysis.ngramModel(target, toks, buckets)
    val (mr, tr) = TextAnalysis.ngramModel(raw, toks, buckets)
    weightedNgram(raw, mt, tt, mr, tr, toks, buckets)
  }

  /** Core weighting over an arbitrary token-array expression — must match
    * the expression both models were built with.
    */
  def weightedNgram(
      raw: DataFrame,
      targetModel: DataFrame,
      targetTotal: Long,
      rawModel: DataFrame,
      rawTotal: Long,
      tokens: Column,
      buckets: Int = 1 << 18
  ): DataFrame = {
    val st = TextAnalysis
      .ngramLogProb(raw, targetModel, targetTotal, tokens, buckets)
      .withColumnRenamed("lp_mean", "lp_target")
    TextAnalysis
      .ngramLogProb(st, rawModel, rawTotal, tokens, buckets)
      .withColumnRenamed("lp_mean", "lp_raw")
      // size(tokens) counts every array element (the arrays carry no
      // nulls) — exactly the TermFreqs kernel's count weight, so logw is
      // the true sum over features (not an approximation with another n).
      .withColumn("n_tok", size(tokens).cast("long"))
      .withColumn("logw", col("n_tok") * (col("lp_target") - col("lp_raw")))
  }

  /** The seeded Gumbel perturbation for a numeric id column:
    * u = ((xxhash64(id + seed) >>> 11) + 0.5) / 2^53 in (0, 1), then
    * g = -ln(-ln u). Exposed for oracle replay.
    */
  def gumbelNoise(id: Column, seed: Long): Column = {
    val u = (shiftrightunsigned(xxhash64(id + lit(seed)), 11).cast("double") + lit(0.5)) /
      lit(9007199254740992.0) // 2^53
    -log(-log(u))
  }

  /** Gumbel top-k resampling without replacement: pick the k rows with the
    * largest `logw + gumbelNoise(id, seed)`. Ties (identical texts hashing
    * to identical keys never tie — the noise differs per id) break on id.
    */
  def gumbelTopK(weightedDocs: DataFrame, idCol: String, k: Int, seed: Long = 0L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    weightedDocs
      .withColumn("gumbel_key", col("logw") + gumbelNoise(col(idCol), seed))
      .orderBy(col("gumbel_key").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic hard top-k by weight (the paper's no-noise ablation —
    * biased toward the mode of the target; prefer [[gumbelTopK]]).
    */
  /** Distribution-drift metrics between two corpus slices over the same
    * hashed n-gram feature space — the monitoring complement to DSIR: KL
    * divergence of the add-one-smoothed bucket distributions in BOTH
    * directions plus total-variation distance. The standard data-mixing /
    * drift dashboard numbers (is this crawl snapshot / domain slice still
    * distributed like the reference corpus?).
    *
    * Exact over ALL `buckets` cells, not just observed ones: the two model
    * builds are the bounded aggregations of [[TextAnalysis.ngramModel]]
    * (≤ `buckets` rows each), observed cells full-outer-join once, and the
    * (buckets − observed) never-seen cells contribute a CLOSED-FORM
    * remainder (their smoothed probabilities are the same constant in every
    * cell), so nothing corpus-sized moves and the result is independent of
    * which cells happen to be empty.
    *
    * Output: one row (n_buckets, observed, kl_target_raw, kl_raw_target,
    * tv), floats rounded to 6. KL(t‖r) = Σ p_t ln(p_t/p_r); tv = ½ Σ
    * |p_t − p_r|.
    */
  def klDrift(
      raw: DataFrame,
      target: DataFrame,
      tokens: Column,
      buckets: Int = 1 << 18
  ): DataFrame = {
    val (mt, tt) = TextAnalysis.ngramModel(target, tokens, buckets)
    val (mr, tr) = TextAnalysis.ngramModel(raw, tokens, buckets)
    val denT = tt.toDouble + buckets
    val denR = tr.toDouble + buckets
    val joined = mt
      .select(col("t"), col("c").as("ct"))
      .join(mr.select(col("t"), col("c").as("cr")), Seq("t"), "full_outer")
      .select(
        ((coalesce(col("ct"), lit(0L)) + 1.0) / denT).as("pt"),
        ((coalesce(col("cr"), lit(0L)) + 1.0) / denR).as("pr")
      )
    val p0t = 1.0 / denT
    val p0r = 1.0 / denR
    joined
      .agg(
        count(lit(1)).as("observed"),
        coalesce(sum(col("pt") * log(col("pt") / col("pr"))), lit(0.0)).as("kl_tr_obs"),
        coalesce(sum(col("pr") * log(col("pr") / col("pt"))), lit(0.0)).as("kl_rt_obs"),
        coalesce(sum(abs(col("pt") - col("pr"))), lit(0.0)).as("l1_obs")
      )
      .select(
        lit(buckets.toLong).as("n_buckets"),
        col("observed"),
        round(
          col("kl_tr_obs") + (lit(buckets.toDouble) - col("observed")) * (p0t * math.log(p0t / p0r)),
          6
        ).as("kl_target_raw"),
        round(
          col("kl_rt_obs") + (lit(buckets.toDouble) - col("observed")) * (p0r * math.log(p0r / p0t)),
          6
        ).as("kl_raw_target"),
        round(
          (col("l1_obs") + (lit(buckets.toDouble) - col("observed")) * math.abs(p0t - p0r)) / 2.0,
          6
        ).as("tv")
      )
  }

  def topK(weightedDocs: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    weightedDocs.orderBy(col("logw").desc, col(idCol).asc).limit(k)
  }
}
