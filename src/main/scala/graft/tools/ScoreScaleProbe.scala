package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Normalize
import graft.functions.SimilarityFunctions.{jaro_winkler, sorted_vec_dot}

import graft.operators.{Blocker, PairScorer}

/** Scaling probe for the PAIR-SCORING stage alone, each kernel ablated in
  * turn (full / nocos / nolev / cosonly) at N=`local-cluster[1,2]` vs
  * 4N=`local-cluster[4,2]` on a pre-materialized corpus with pre-built
  * pairs+features (only the scoring projection is timed, warmed,
  * best-of-reps). Produced BENCH.md R5.0's lever-(a) demonstration: the
  * stage scales at the engine-free compute ceiling and ~95% of its wall
  * is the Levenshtein kernel, so shrinking TF-IDF shuffle bytes is moot.
  * Usage: runMain graft.tools.ScoreScaleProbe [reps]. Run ALONE.
  */
object ScoreScaleProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    // pre-materialize corpus once
    val gen = graft.pipeline.LinkagePipeline.session("local[8]", "gen")
    gen.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft-scorescale"
    graft.synth.WebCorpus.pages(gen, graft.synth.WebCorpus.Config(numClusters = 25000))
      .write.mode("overwrite").parquet(dir)
    gen.stop()

    def variantCols(v: String): Seq[org.apache.spark.sql.Column] = v match {
      case "full" => Seq(
        jaro_winkler(col("title_a"), col("title_b")).as("jw"),
        Normalize.levRatioBanded(col("text_a"), col("text_b"), maxDist = 64).as("lev"),
        coalesce(sorted_vec_dot(col("vec_a"), col("vec_b")), lit(0.0)).as("cos"))
      case "nocos" => Seq(
        jaro_winkler(col("title_a"), col("title_b")).as("jw"),
        Normalize.levRatioBanded(col("text_a"), col("text_b"), maxDist = 64).as("lev"))
      case "nolev" => Seq(
        jaro_winkler(col("title_a"), col("title_b")).as("jw"),
        coalesce(sorted_vec_dot(col("vec_a"), col("vec_b")), lit(0.0)).as("cos"))
      case "cosonly" => Seq(
        coalesce(sorted_vec_dot(col("vec_a"), col("vec_b")), lit(0.0)).as("cos"))
    }
    def featCols(v: String): Seq[String] =
      if (v == "nocos") Seq("url", "title_norm", "text_cap")
      else if (v == "cosonly") Seq("url", "tfidf")
      else Seq("url", "title_norm", "text_cap", "tfidf")

    def runOnce(spark: SparkSession, v: String): Double = {
      val pages = spark.read.parquet(dir)
      val cfg = graft.pipeline.LinkagePipeline.Config()
      val keys = Blocker.allKeys(pages.select("url", "text"), cfg.strategies)
      val pairs = graft.util.Checkpoints.serializedLocal(Blocker.pairs(keys, cfg.maxBlockSize))
      val (featsAll, rel) = PairScorer.featuresWithRelease(pages.select("url", "text"))
      val feats = graft.util.Checkpoints.serializedLocal(featsAll.select(featCols(v).map(col): _*))
      rel()
      val fa = feats.columns.foldLeft(feats)((d, c) => d.withColumnRenamed(c, c match {
        case "url" => "urlA"; case "title_norm" => "title_a"; case "text_cap" => "text_a"; case "tfidf" => "vec_a"; case x => x }))
      val fb = feats.columns.foldLeft(feats)((d, c) => d.withColumnRenamed(c, c match {
        case "url" => "urlB"; case "title_norm" => "title_b"; case "text_cap" => "text_b"; case "tfidf" => "vec_b"; case x => x }))
      val scored = pairs.join(fa, "urlA").join(fb, "urlB").select(variantCols(v): _*)
      scored.foreach(_ => ()) // warm
      val t0 = System.nanoTime()
      scored.foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }

    for (v <- Seq("full", "nocos", "nolev", "cosonly")) {
      var wN, w4N = Double.MaxValue
      (1 to reps).foreach { _ =>
        for ((m, isN) <- Seq("local-cluster[1,2,6144]" -> true, "local-cluster[4,2,6144]" -> false)) {
          val s = graft.pipeline.LinkagePipeline.session(m, s"scorescale-$v")
          s.sparkContext.setLogLevel("ERROR")
          try {
            val w = runOnce(s, v)
            if (isN) wN = math.min(wN, w) else w4N = math.min(w4N, w)
          } finally s.stop()
        }
      }
      println(f"[scorescale] $v%-8s N=$wN%.2f s 4N=$w4N%.2f s eff=${wN / (4.0 * w4N)}%.3f")
    }
  }
}
