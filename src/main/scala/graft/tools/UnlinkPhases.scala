package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Blocker, ConnectedComponents, IncrementalLinkage, PairScorer}
import graft.pipeline.LinkagePipeline

/** Dev loop: phase-level wall breakdown of the q_inc_unlink battery body
  * (base symbolic run + production remove) at sf0.1 — which phase owns the
  * query's wall. Usage: sbt 'runMain graft.tools.UnlinkPhases [dir]'
  */
object UnlinkPhases {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = LinkagePipeline.session("local[32]", "unlink-phases")
    spark.sparkContext.setLogLevel("ERROR")

    def phase[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    (1 to 2).foreach { round =>
      println(s"[phase] ---- round $round ----")
      val W = PairScorer.Weights(jw = 0.0, lev = 1.0, cosine = 0.0, threshold = 0.4)
      val symCfg = LinkagePipeline.Config(weights = W, maxBlockSize = 100000)
      val pages = spark.read
        .parquet(s"$dir/documents.parquet")
        .select(
          col("doc_id").as("url"),
          substring(col("text"), 1, 60).as("text"),
          col("lang"),
          col("n_chars")
        )
      val keys = pages
        .select(
          col("url"),
          concat_ws("|", lit("b"), col("lang"), floor(col("n_chars") / 5).cast("long")).as("key")
        )
        .unionAll(
          pages.select(
            col("url"),
            concat_ws("|", lit("t"), array_join(slice(split(col("text"), " "), 1, 2), " ")).as("key")
          )
        )
      val texts = pages.select("url", "text")
      val (idfDf, nDocs) = phase("idfArtifact")(PairScorer.idfArtifact(texts)) match { case p => p }
      val (feats, releaseFeats) =
        phase("featuresWithIdf")(PairScorer.featuresWithIdf(texts, Seq((idfDf, nDocs))))
      val accepted = phase("score+threshold+ck") {
        graft.util.Checkpoints.serializedLocal(
          PairScorer.threshold(
            PairScorer.score(Blocker.pairs(keys, maxBlockSize = 100000), feats, W),
            W
          )
        )
      }
      val clusters = phase("base CC (action)") {
        val c = ConnectedComponents.run(
          accepted.select(col("urlA").as("src"), col("urlB").as("dst"))
        )
        graft.util.Checkpoints.serializedLocal(c)
      }
      val basePred = phase("assemblePredictions+ck") {
        graft.util.Checkpoints.serializedLocal(
          LinkagePipeline.assemblePredictions(texts, clusters, accepted)
        )
      }
      releaseFeats()
      val out = phase("remove() build") {
        IncrementalLinkage.remove(
          pages.where(pmod(col("url"), lit(5)) === 0).select("url"),
          basePred,
          IncrementalLinkage.Index(keys, idfDf, nDocs),
          symCfg
        )
      }
      phase("predictions action") {
        out.predictions.select("url", "cluster_id", "status", "seq").orderBy("url").foreach(_ => ())
      }
      out.release()
    }
    spark.stop()
  }
}
