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
}
