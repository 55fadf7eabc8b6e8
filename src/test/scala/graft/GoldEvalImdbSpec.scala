package graft

import org.apache.spark.sql.functions._

import graft.eval.{GoldEval, PairwiseEval}

/** The gold harness at 30x the film fixture's size: the reference's
  * imdb_top_1000.csv (1000 REAL movie titles — punctuation, digits,
  * colons, one-word and numeral titles like "M" and "1917") through the
  * same blocking + PairScorer + top-1 decision. The fixture carries no
  * QID column, so entity ids derive deterministically from the title
  * ("T:<title>"): real reference mention text, synthesized labels — the
  * complement of GoldEvalSpec's real labels at small scale.
  *
  * The "The ..." first-token block here exceeds the default 1000-row salt
  * cap, so this also exercises the harness under REAL block salting; the
  * gate is the north rule's F1 >= 0.99, not 100%.
  */
class GoldEvalImdbSpec extends SparkSpec {

  /** Vendored copy of the reference's imdb_top_1000.csv (test resource) —
    * the suite no longer depends on a mounted reference checkout.
    */
  private val imdbCsv: String = sys.props
    .get("graft.gold.imdb.csv")
    .orElse(sys.env.get("GRAFT_GOLD_IMDB_CSV"))
    .getOrElse(graft.util.Fixtures.materialize("graft/fixtures/imdb_top_1000.csv"))

  private lazy val table = {
    val raw = GoldEval.loadTable(spark, imdbCsv)
    // duplicate titles across years collapse to one entity (id = title)
    raw
      .select(col("Series_Title").as("title"))
      .where(col("title").isNotNull && length(trim(col("title"))) > 0)
      .distinct()
      .select(col("title"), concat(lit("T:"), col("title")).as("title_QID"))
      .cache()
  }

  test("1000 real titles: pairwise F1 >= 0.99 globally and per blocking key") {
    val n = table.count()
    assert(n >= 990, s"expected ~1000 distinct titles, got $n")
    val mentions = GoldEval.mentionVariants(table, "title").cache()
    // sequel-safe distractor suffix: imdb has real sequel families, where
    // a "<title> II" distractor of a prefix title is ambiguous against a
    // typo'd sequel mention (see GoldEval.entityTable doc)
    val entities = GoldEval.entityTable(table, distractorSuffix = " alternate cut")
    val linked = GoldEval.link(mentions, entities).cache()

    // accuracy: how many variants resolve to their gold entity
    val gold = table.select(col("title").as("row_key"), col("title_QID").as("gold_id"))
    val joined = linked
      .join(mentions.select("url", "row_key"), "url")
      .join(gold, "row_key")
      .cache()
    val total = joined.count()
    val wrong = joined.where(col("predicted_id") =!= col("gold_id")).count()
    info(s"variants=$total wrong=$wrong accuracy=${1.0 - wrong.toDouble / total}")
    assert(wrong.toDouble / total <= 0.01, s"$wrong/$total variants mislinked")

    // north-rule gate: pairwise F1 within each blocking key
    val assignments = linked.select(
      col("url"),
      when(col("predicted_id") === "NIL", col("url")).otherwise(col("predicted_id")).as("cluster_id")
    )
    val keyed = mentions.select(
      col("url"),
      col("row_key"),
      concat(lit("ft:"), try_element_at(graft.functions.Normalize.tokensOf(col("row_key")), lit(1)))
        .as("block_key")
    )
    val a = keyed.select(col("url").as("url_a"), col("row_key"), col("block_key"))
    val b = keyed.select(col("url").as("url_b"), col("row_key"))
    val goldPairs = a
      .join(b, Seq("row_key"))
      .where(col("url_a") < col("url_b"))
      .select(col("url_a"), col("url_b"), lit(true).as("label"), col("block_key"))

    val global = PairwiseEval.metrics(assignments, goldPairs)
    info(s"global pairwise: tp=${global.tp} fp=${global.fp} fn=${global.fn} f1=${global.f1}")
    assert(global.f1 >= 0.99, s"global pairwise F1 ${global.f1}")

    // per-key: aggregate F1 over keys weighted by gold pairs must clear the
    // bar, and no key may collapse (the salted "The ..." block included)
    val perKey = PairwiseEval.metricsPerKey(assignments, goldPairs).cache()
    val bad = perKey.where(col("f1") < 0.99)
    assert(bad.count() === 0, bad.collect().mkString("\n"))
    perKey.unpersist(); joined.unpersist(); linked.unpersist(); mentions.unpersist()
  }
}
