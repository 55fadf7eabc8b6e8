package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Normalize
import graft.functions.SimilarityFunctions.{jaro_winkler, sorted_vec_dot}

/** Pairwise scoring: deterministic Catalyst-expression similarity replacing
  * the reference's LLM ranking black box
  * (/root/reference/lion_linker/core.py:133-222). Three legs — Jaro-Winkler
  * on a title-ish prefix, Levenshtein ratio on capped text, TF-IDF cosine on
  * full token vectors — combined by fixed weights and thresholded; a pair
  * below threshold produces no edge (the NIL analog, lion_linker.py:702-734).
  */
object PairScorer {

  final case class Weights(
      jw: Double = 0.3,
      lev: Double = 0.3,
      cosine: Double = 0.4,
      threshold: Double = 0.70
  )

  /** Per-document similarity features. Computed ONCE per document (linear
    * scan + one shuffle for the IDF join), so the quadratic pair stage only
    * does cheap kernel math — never re-tokenizes per pair.
    *
    * Output: url, title_norm (first 10 tokens), text_cap (first 240 chars of
    * ws-normalized text), tfidf (array<struct<t:long,w:double>> sorted by t,
    * L2-normalized).
    */
  def features(pages: DataFrame): DataFrame = {
    val toks = Normalize.tokensOf(col("text"))
    val base = pages.select(
      col("url"),
      toks.as("toks"),
      array_join(slice(toks, 1, 10), " ").as("title_norm"),
      substring(regexp_replace(trim(col("text")), "\\s+", " "), 1, 240).as("text_cap")
    )

    // term frequencies per (url, term-hash)
    val tf = base
      .select(col("url"), explode(col("toks")).as("term"))
      .groupBy(col("url"), xxhash64(col("term")).as("t"))
      .agg(count(lit(1)).cast("double").as("tf"))

    // document frequency per term -> idf; numDocs via a scalar broadcast join
    val docFreq = tf.groupBy("t").agg(count(lit(1)).cast("double").as("df"))
    val nDocs = pages.select(count(lit(1)).as("n_docs"))
    val idf = docFreq
      .crossJoin(broadcast(nDocs))
      .select(col("t"), (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0).as("idf"))

    val weighted = tf
      .join(idf, "t")
      .select(col("url"), col("t"), (col("tf") * col("idf")).as("w"))

    val vecs = weighted
      .groupBy("url")
      .agg(sort_array(collect_list(struct(col("t"), col("w")))).as("vec_raw"))
      .withColumn(
        "norm",
        sqrt(aggregate(col("vec_raw"), lit(0.0), (acc, x) => acc + x.getField("w") * x.getField("w")))
      )
      .select(
        col("url"),
        transform(
          col("vec_raw"),
          e => struct(e.getField("t").as("t"), (e.getField("w") / col("norm")).as("w"))
        ).as("tfidf")
      )

    base.select(col("url"), col("title_norm"), col("text_cap")).join(vecs, Seq("url"), "left")
  }

  /** Score candidate pairs. `pairs`: (urlA, urlB, key); `feats`: output of
    * `features`. Two equi-joins re-attach per-side features (the reference's
    * dedup-fetch-join pattern, lion_linker.py:994-1016), then one codegen'd
    * projection computes all three kernels.
    */
  def score(pairs: DataFrame, feats: DataFrame, w: Weights = Weights()): DataFrame = {
    val fa = feats.select(
      col("url").as("urlA"),
      col("title_norm").as("title_a"),
      col("text_cap").as("text_a"),
      col("tfidf").as("vec_a")
    )
    val fb = feats.select(
      col("url").as("urlB"),
      col("title_norm").as("title_b"),
      col("text_cap").as("text_b"),
      col("tfidf").as("vec_b")
    )
    pairs
      .join(fa, "urlA")
      .join(fb, "urlB")
      .select(
        col("urlA"),
        col("urlB"),
        col("key"),
        jaro_winkler(col("title_a"), col("title_b")).as("jw"),
        Normalize.levRatio(col("text_a"), col("text_b")).as("lev"),
        coalesce(sorted_vec_dot(col("vec_a"), col("vec_b")), lit(0.0)).as("cosine")
      )
      .withColumn(
        "score",
        Normalize.clamp01(col("jw") * w.jw + col("lev") * w.lev + col("cosine") * w.cosine)
      )
  }

  /** Threshold scored pairs into match edges (below threshold = NIL analog). */
  def edges(scored: DataFrame, w: Weights = Weights()): DataFrame =
    scored.where(col("score") >= w.threshold).select(col("urlA").as("src"), col("urlB").as("dst"))
}
