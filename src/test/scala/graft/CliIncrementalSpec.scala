package graft

import org.apache.spark.sql.functions._

import graft.cli.Main
import graft.operators.IncrementalLinkage

/** The CLI incremental surface end-to-end: a base run with --save-index,
  * a delta linked via --base, and the result compared against a one-shot
  * full run over the union — the user-visible composition of
  * operators/IncrementalLinkage (base artifacts round-trip through parquet
  * between two separate CLI invocations, exactly the operational loop).
  */
class CliIncrementalSpec extends SparkSpec {

  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft-cli-inc").toString

  test("--base links a delta against a committed run; equals the full rerun") {
    val pages = graft.synth.WebCorpus.pages(spark, graft.synth.WebCorpus.Config(numClusters = 90, seed = 11L)).toDF
    val base = pages.where(pmod(xxhash64(col("url")), lit(3)) =!= 0)
    val delta = pages.where(pmod(xxhash64(col("url")), lit(3)) === 0)
    base.write.mode("overwrite").parquet(s"$tmp/base-in")
    delta.write.mode("overwrite").parquet(s"$tmp/delta-in")
    pages.write.mode("overwrite").parquet(s"$tmp/union-in")

    Main.run(spark, Map("input" -> s"$tmp/base-in", "output" -> s"$tmp/base-out", "save-index" -> "true"))
    Main.run(spark, Map("input" -> s"$tmp/delta-in", "output" -> s"$tmp/inc-out", "base" -> s"$tmp/base-out"))
    Main.run(spark, Map("input" -> s"$tmp/union-in", "output" -> s"$tmp/full-out"))

    val cols = Seq("url", "cluster_id", "status", "seq")
    val inc = spark.read.parquet(s"$tmp/inc-out").select(cols.map(col): _*).orderBy("url").collect()
    val full = spark.read.parquet(s"$tmp/full-out").select(cols.map(col): _*).orderBy("url").collect()
    assert(inc.length == full.length, s"row counts differ: inc=${inc.length} full=${full.length}")
    inc.zip(full).foreach { case (a, b) => assert(a == b, s"row differs:\n inc =$a\n full=$b") }

    // the updated index round-trips and describes the union corpus
    val (nextIndex, strategies) = IncrementalLinkage.loadIndex(spark, s"$tmp/inc-out.index")
    // recorded under canonical strategy NAMES (MinHashBlocking's name
    // carries its band parameter — a band change must also fail the check)
    assert(strategies == "canonical_url,domain,minhash_b8")
    assert(nextIndex.idfDocs == pages.count())
    // merge map shipped for downstream in-place relabels
    val merges = spark.read.parquet(s"$tmp/inc-out.merges")
    assert(merges.columns.toSeq == Seq("old_cluster_id", "new_cluster_id"))
  }

  test("a second increment chains the index (O(delta) write) and still links") {
    // near-duplicates of 20 base docs under fresh urls — must attach to
    // their source clusters THROUGH the chained (delta-keys + parent) index
    val delta2 = spark.read
      .parquet(s"$tmp/base-in")
      .limit(20)
      .select(concat(col("url"), lit("?v=2")).as("url"), col("text"))
    delta2.write.mode("overwrite").parquet(s"$tmp/delta2-in")
    Main.run(
      spark,
      Map("input" -> s"$tmp/delta2-in", "output" -> s"$tmp/inc2-out", "base" -> s"$tmp/inc-out", "emit" -> "changed")
    )
    val store = spark.read.parquet(s"$tmp/inc-out")
      .select(col("url"), col("cluster_id").as("base_cluster"))
    val v2 = spark.read.parquet(s"$tmp/inc2-out")
      .where(col("url").endsWith("?v=2"))
      .select(expr("substring(url, 1, length(url) - 4)").as("url"), col("cluster_id"), col("status"))
    val joined = v2.join(store, Seq("url")).collect()
    assert(joined.length == 20, s"${joined.length}")
    joined.foreach { r =>
      assert(r.getAs[String]("status") == "linked", r.toString)
      assert(r.getAs[String]("cluster_id") == r.getAs[String]("base_cluster"), r.toString)
    }
    // the chain's own keys dir holds ONLY the 20-doc delta; loadIndex
    // unions the parent links back to full coverage
    assert(spark.read.parquet(s"$tmp/inc2-out.index/keys").select("url").distinct().count() == 20)
    val (idx, _) = IncrementalLinkage.loadIndex(spark, s"$tmp/inc2-out.index")
    val total = spark.read.parquet(s"$tmp/inc-out").count() + 20
    assert(idx.idfDocs == total, s"${idx.idfDocs} != $total")
    assert(idx.keys.select("url").distinct().count() == total)
  }

  test("--base refuses an index built under different blocking strategies") {
    val e = intercept[IllegalArgumentException] {
      Main.run(
        spark,
        Map(
          "input" -> s"$tmp/delta-in",
          "output" -> s"$tmp/inc-bad",
          "base" -> s"$tmp/base-out",
          "strategies" -> "domain"
        )
      )
    }
    assert(e.getMessage.contains("blocking keys would not align"), e.getMessage)
  }

  test("--base without a saved index fails loudly with the remedy") {
    val e = intercept[IllegalArgumentException] {
      Main.run(
        spark,
        Map("input" -> s"$tmp/delta-in", "output" -> s"$tmp/inc-bad2", "base" -> s"$tmp/full-out")
      )
    }
    assert(e.getMessage.contains("--save-index"), e.getMessage)
  }

  test("--remove deletes tombstones from a committed run; equals the reduced rerun") {
    val pages = spark.read.parquet(s"$tmp/base-in")
    val rm = pages.where(pmod(xxhash64(col("url")), lit(4)) === 0).select("url")
    assert(rm.count() > 0)
    rm.write.mode("overwrite").parquet(s"$tmp/rm-in")
    pages
      .join(rm, Seq("url"), "left_anti")
      .write
      .mode("overwrite")
      .parquet(s"$tmp/reduced-in")

    Main.run(
      spark,
      Map("input" -> s"$tmp/rm-in", "output" -> s"$tmp/rm-out", "base" -> s"$tmp/base-out", "remove" -> "true")
    )
    Main.run(spark, Map("input" -> s"$tmp/reduced-in", "output" -> s"$tmp/reduced-out"))

    val cols = Seq("url", "cluster_id", "status", "seq")
    val got = spark.read.parquet(s"$tmp/rm-out").select(cols.map(col): _*).orderBy("url").collect()
    val want = spark.read.parquet(s"$tmp/reduced-out").select(cols.map(col): _*).orderBy("url").collect()
    assert(got.length == want.length, s"row counts differ: rm=${got.length} rerun=${want.length}")
    got.zip(want).foreach { case (a, b) => assert(a == b, s"row differs:\n rm   =$a\n rerun=$b") }

    // tombstones recorded; compacted index describes the reduced corpus
    assert(spark.read.parquet(s"$tmp/rm-out.tombstones").count() == rm.count())
    val (idx, strategies) = IncrementalLinkage.loadIndex(spark, s"$tmp/rm-out.index")
    assert(strategies == "canonical_url,domain,minhash_b8")
    assert(idx.idfDocs == pages.count() - rm.count())
    assert(idx.keys.join(rm, Seq("url"), "left_semi").count() == 0)
  }
}
