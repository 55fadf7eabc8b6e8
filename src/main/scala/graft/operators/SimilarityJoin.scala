package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set-similarity join with prefix filtering — SSJoin (Chaudhuri, Ganti &
  * Kaushik, ICDE 2006) / the prefix-filter core of PPJoin (Xiao et al.,
  * WWW 2008). The published alternative to LSH for THRESHOLD similarity
  * joins: instead of probabilistic buckets (recall < 1), order every
  * record's token set by global rarity and index only its PREFIX — the
  * first |x| − ceil(t·|x|) + 1 tokens. Pigeonhole: two sets with
  * Jaccard >= t MUST share a prefix token, so candidate generation is
  * LOSSLESS — the verified result equals the brute-force all-pairs join
  * exactly, while only rare-token collisions are ever materialized.
  *
  * Scale shape: token document frequencies are one keyed aggregation
  * (never collected — the frequency order attaches by an equi-join on the
  * token); the candidate join ships (id, token) pairs keyed on the rare
  * prefix tokens; full token arrays re-attach to the DEDUPED candidate
  * pairs via two id equi-joins (the fetch-join pattern), so arrays never
  * ride the token-keyed shuffle. Rarity-first ordering is exactly what
  * bounds the join fan-out: the most frequent tokens land in prefixes
  * least often.
  */
object SimilarityJoin {

  /** All pairs (id_a < id_b) with Jaccard(tokens_a, tokens_b) >= threshold;
    * output (id_a, id_b, jaccard). Token arrays are treated as SETS
    * (deduped); empty sets join nothing.
    */
  def prefixJaccardJoin(
      docs: DataFrame,
      idCol: String,
      tokensCol: String,
      threshold: Double
  ): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold must be in (0,1], got $threshold")
    val d = docs
      .select(col(idCol).as("id"), array_distinct(col(tokensCol)).as("toks"))
      .where(size(col("toks")) > 0)
    val tokenDf = d
      .select(explode(col("toks")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("df"))
    // rarity-first order per doc: sort by (df, tok); prefix keeps the
    // first |x| - ceil(t*|x|) + 1 tokens
    val ordered = d
      .select(col("id"), explode(col("toks")).as("tok"))
      .join(tokenDf, "tok")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("sorted"))
      .select(
        col("id"),
        transform(col("sorted"), s => s.getField("tok")).as("rare_first"),
        size(col("sorted")).as("n")
      )
    val prefix = ordered.select(
      col("id"),
      explode(
        slice(
          col("rare_first"),
          lit(1),
          (col("n") - ceil(lit(threshold) * col("n")) + 1).cast("int")
        )
      ).as("tok")
    )
    val cand = prefix
      .select(col("id").as("id_a"), col("tok"))
      .join(prefix.select(col("id").as("id_b"), col("tok")), Seq("tok"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val withSets = cand
      .join(d.select(col("id").as("id_a"), col("toks").as("ta")), "id_a")
      .join(d.select(col("id").as("id_b"), col("toks").as("tb")), "id_b")
    val inter = size(array_intersect(col("ta"), col("tb")))
    val jac = inter.cast("double") / (size(col("ta")) + size(col("tb")) - inter).cast("double")
    withSets
      .withColumn("jaccard", jac)
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
