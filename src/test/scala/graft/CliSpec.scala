package graft

import org.apache.spark.sql.functions._

import graft.cli.Main
import graft.pipeline.LinkagePipeline

/** CLI input-shaping semantics: mention-column resolution by the reference
  * precedence (selection > link columns > configured mention columns > first
  * column, names or positional indexes — app/services/linker.py:428-471),
  * gt-column exclusion, url synthesis, and dry-run mode.
  */
class CliSpec extends SparkSpec {

  private val header = Seq("film", "film_QID", "director", "year")

  test("mention-column resolution precedence and positional indexes") {
    // selection wins, by index
    assert(Main.resolveMentionColumns(header, selection = Seq("2")) === Seq("director"))
    // selection by name
    assert(Main.resolveMentionColumns(header, selection = Seq("film")) === Seq("film"))
    // link columns when no selection (mixed name + index)
    assert(Main.resolveMentionColumns(header, linkColumns = Seq("3", "film")) === Seq("year", "film"))
    // configured mention columns filter to present ones
    assert(
      Main.resolveMentionColumns(header, mentionConfig = Seq("nope", "director")) === Seq("director")
    )
    // fallback: first header column
    assert(Main.resolveMentionColumns(header) === Seq("film"))
    // strict errors for selection/link
    intercept[IllegalArgumentException](Main.resolveMentionColumns(header, selection = Seq("9")))
    intercept[IllegalArgumentException](Main.resolveMentionColumns(header, linkColumns = Seq("nope")))
  }

  test("digits-only items resolve as NAMES first (numeric year headers), indexes second") {
    // the reference types items (isinstance int vs str); a CLI string that
    // exactly names a column must be that column, not an index
    val numeric = Seq("country", "2019", "2020")
    assert(Main.resolveMentionColumns(numeric, selection = Seq("2020")) === Seq("2020"))
    assert(Main.resolveMentionColumns(numeric, selection = Seq("1")) === Seq("2019")) // no col named "1"
    val tricky = Seq("name", "3", "0")
    assert(Main.resolveMentionColumns(tricky, selection = Seq("0")) === Seq("0")) // name wins over index 0
    assert(Main.resolveMentionColumns(tricky, selection = Seq("2")) === Seq("0")) // plain index still works
  }

  test("positional indexes resolve against the RAW header, before the gt drop") {
    import spark.implicits._
    val df = Seq(("Avatar", "Q24871", "James Cameron", "2009"))
      .toDF("film", "film_QID", "director", "year")
    // reference semantics (linker.py:355 reads the raw header; gt drop is
    // later): index 2 = director, even with film_QID gt-dropped
    val pages = Main.preparePages(
      df,
      Map("gt-columns" -> "film_QID", "select-columns" -> "2", "id-column" -> "film")
    )
    assert(pages.select("text").collect().map(_.getString(0)).toSeq === Seq("James Cameron"))
    // linking over the gt column itself fails loudly, not silently
    val e = intercept[IllegalArgumentException] {
      Main.preparePages(df, Map("gt-columns" -> "film_QID", "select-columns" -> "film_QID"))
    }
    assert(e.getMessage.contains("gt columns cannot be linked over"))
  }

  test("preparePages: gt drop + index-resolved mention on a table without url/text") {
    import spark.implicits._
    val df = Seq(
      ("Avatar", "Q24871", "James Cameron", "2009"),
      ("Titanic", "Q44578", "James Cameron", "1997")
    ).toDF(header: _*)
    val pages = Main.preparePages(
      df,
      Map("gt-columns" -> "film_QID", "select-columns" -> "0", "id-column" -> "film")
    )
    assert(pages.columns.contains("url") && pages.columns.contains("text"))
    assert(!pages.columns.contains("film_QID"))
    val rows = pages.select("url", "text").orderBy("url").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("Avatar", "Titanic"))
    assert(rows.map(_.getString(1)).toSeq === Seq("Avatar", "Titanic"))
  }

  test("preparePages: url synthesized deterministically when no id column exists") {
    import spark.implicits._
    val df = Seq(("doc one text", "en"), ("doc two text", "fr")).toDF("body", "lang")
    val pages = Main.preparePages(df, Map("mention-columns" -> "body"))
    val urls = pages.select("url").collect().map(_.getString(0))
    assert(urls.distinct.length === 2 && urls.forall(_.length === 64)) // sha256 hex
    // and the linkage pipeline runs end-to-end over it
    val preds = LinkagePipeline.run(pages)
    assert(preds.count() === 2)
    assert(preds.columns.toSet === Set("url", "cluster_id", "score", "status", "text", "seq"))
  }

  test("preparePages: frame already shaped (url, text) passes through untouched") {
    import spark.implicits._
    val df = Seq(("https://a.org/x", "hello world")).toDF("url", "text")
    assert(Main.preparePages(df, Map.empty).collect() === df.collect())
  }

  test("dry-run: full output schema, all nil, blank mentions skipped, deterministic seq") {
    import spark.implicits._
    val pages = Seq(
      ("u3", "gamma text"),
      ("u1", "alpha text"),
      ("u2", "   "), // blank mention -> skipped (reference: not mention.strip())
      ("u4", "delta text")
    ).toDF("url", "text")
    val out = LinkagePipeline.dryRun(pages).orderBy("seq").collect()
    assert(out.length === 3)
    assert(out.forall(_.getAs[String]("status") == "nil"))
    assert(out.forall(r => r.getAs[String]("cluster_id") == r.getAs[String]("url")))
    assert(out.forall(_.getAs[Double]("score") == 0.0))
    // seq: dense 1..N in url order
    assert(out.map(_.getAs[Long]("seq")).toSeq === Seq(1L, 2L, 3L))
    assert(out.map(_.getAs[String]("url")).toSeq === Seq("u1", "u3", "u4"))
  }

  test("--golden writes one survivorship record per cluster next to the predictions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-golden-cli").toString
    Main.run(
      spark,
      Map(
        "input" -> "synth:300",
        "output" -> s"$tmp/preds",
        "golden" -> s"$tmp/golden"
      )
    )
    val preds = spark.read.parquet(s"$tmp/preds")
    val golden = spark.read.parquet(s"$tmp/golden")
    assert(golden.count() === preds.select("cluster_id").distinct().count())
    assert(
      golden.columns.toSeq === Seq("cluster_id", "n_members", "url", "text", "best_score")
    )
    // survivors replay per cluster: smallest url, longest text, best score
    import org.apache.spark.sql.functions._
    val replay = preds
      .groupBy("cluster_id")
      .agg(min("url").as("url_x"), max("score").as("score_x"))
    val joined = golden
      .join(replay.select(col("cluster_id"), col("url_x"), col("score_x")), "cluster_id")
    assert(joined.where(col("url") =!= col("url_x")).count() === 0)
    assert(joined.where(col("best_score") =!= col("score_x")).count() === 0)
    // longest-text survivor: no member of the cluster has a longer text
    val longer = golden
      .select(col("cluster_id"), length(col("text")).as("glen"))
      .join(preds.select(col("cluster_id"), length(col("text")).as("plen")), "cluster_id")
      .where(col("plen") > col("glen"))
    assert(longer.count() === 0)
  }
}
