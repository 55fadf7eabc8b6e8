package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Blocker, ConnectedComponents, IncrementalLinkage, PairScorer}
import graft.pipeline.LinkagePipeline

/** Dev loop: instrumented inline copy of IncrementalLinkage.remove over the
  * q_inc_unlink battery inputs, with forced materialization at each phase
  * boundary so the wall of each internal stage is visible. Attribution
  * only — the extra count() actions make the total slightly worse than the
  * real remove. Usage: sbt 'runMain graft.tools.RemovePhases [dir]'
  */
object RemovePhases {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = LinkagePipeline.session("local[32]", "remove-phases")
    spark.sparkContext.setLogLevel("ERROR")

    def phase[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val W = PairScorer.Weights(jw = 0.0, lev = 1.0, cosine = 0.0, threshold = 0.4)
    val cfg = LinkagePipeline.Config(weights = W, maxBlockSize = 100000)

    (1 to 2).foreach { round =>
      println(s"[phase] ---- round $round ----")
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
      val (idfDf, nDocs) = PairScorer.idfArtifact(texts)
      val (feats, releaseFeats) = PairScorer.featuresWithIdf(texts, Seq((idfDf, nDocs)))
      val accepted0 = graft.util.Checkpoints.serializedLocal(
        PairScorer.threshold(
          PairScorer.score(Blocker.pairs(keys, maxBlockSize = 100000), feats, W),
          W
        )
      )
      val clusters = ConnectedComponents.run(
        accepted0.select(col("urlA").as("src"), col("urlB").as("dst"))
      )
      val basePredictions = graft.util.Checkpoints.serializedLocal(
        LinkagePipeline.assemblePredictions(texts, clusters, accepted0)
      )
      releaseFeats()
      val index = IncrementalLinkage.Index(keys, idfDf, nDocs)
      val removedUrls = pages.where(pmod(col("url"), lit(5)) === 0).select("url")

      // ---- inline remove() ----
      val rm = phase("rm persist") {
        val d = removedUrls
          .select("url")
          .distinct()
          .join(basePredictions.select("url"), Seq("url"), "left_semi")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        d.count(); d
      }
      val affected = phase("affected persist") {
        val d = basePredictions
          .join(rm, Seq("url"), "left_semi")
          .select("cluster_id")
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        d.count(); d
      }
      val members = phase("members persist") {
        val d = basePredictions
          .select("url", "cluster_id", "score", "status", "text")
          .join(affected, Seq("cluster_id"), "left_semi")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        d.count(); d
      }
      val survivors = phase("survivors persist") {
        val d = members
          .join(rm, Seq("url"), "left_anti")
          .select("url", "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        d.count(); d
      }
      val blockPairs = phase("blockPairs (lazy)") {
        val hotKeys = index.keys
          .join(members.select("url"), Seq("url"), "left_semi")
          .select("key")
          .distinct()
        val hotLive = index.keys
          .join(hotKeys, Seq("key"), "left_semi")
          .join(rm, Seq("url"), "left_anti")
        val tagged = hotLive.join(
          survivors.select(col("url"), lit(true).as("is_m")),
          Seq("url"),
          "left"
        )
        val salted = Blocker.saltOversized(tagged, cfg.maxBlockSize)
        val sA = salted.where(col("is_m")).select(col("url").as("ua"), col("key"))
        val sB = salted.where(col("is_m")).select(col("url").as("ub"), col("key"))
        sA.join(sB, Seq("key"))
          .where(col("ua") < col("ub"))
          .select(col("ua").as("urlA"), col("ub").as("urlB"), col("key"))
          .groupBy("urlA", "urlB")
          .agg(min("key").as("key"))
      }
      val (reducedIdfDf, reducedN) = phase("reduced IDF (lazy)") {
        val (rmIdfDf, rmN) = PairScorer.idfArtifact(
          members.join(rm, Seq("url"), "left_semi").select("url", "text")
        )
        val red = index.idfDf
          .unionByName(rmIdfDf.select(col("t"), (-col("df")).as("df")))
          .groupBy("t")
          .agg(sum("df").as("df"))
          .where(col("df") > 0)
        (red, index.idfDocs - rmN)
      }
      val (feats2, releaseFeats2) = phase("featuresWithIdf(survivors)") {
        PairScorer.featuresWithIdf(survivors, Seq((reducedIdfDf, reducedN)))
      }
      val acceptedCk = phase("score+threshold+acceptedCk") {
        LinkagePipeline.checkpointed(
          PairScorer.threshold(PairScorer.score(blockPairs, feats2, cfg.weights), cfg.weights, cfg.perKeyThresholds)
        )
      }
      releaseFeats2()
      val (comp, mergeMap) = phase("contractAndCluster+mergeMapCk") {
        val edgeUrls = acceptedCk
          .select(col("urlA").as("url"))
          .unionByName(acceptedCk.select(col("urlB").as("url")))
          .distinct()
        val unaffectedAssign = basePredictions
          .select("url", "cluster_id")
          .join(affected, Seq("cluster_id"), "left_anti")
          .join(edgeUrls, Seq("url"), "left_semi")
        val c = IncrementalLinkage.contractAndCluster(acceptedCk, unaffectedAssign, cfg.maxCcIterations)
        (c.assignments, LinkagePipeline.checkpointed(c.mergeMap))
      }
      val updatedAll: DataFrame = phase("untouched+recomputed (lazy)") {
        val bestNew = acceptedCk
          .select(col("urlA").as("url"), col("score"))
          .unionAll(acceptedCk.select(col("urlB").as("url"), col("score")))
          .groupBy("url")
          .agg(max("score").as("new_score"))
        val recomputed = survivors
          .join(comp, Seq("url"), "left")
          .join(bestNew, Seq("url"), "left")
          .select(
            col("url"),
            coalesce(col("cluster_id"), col("url")).as("cluster_id"),
            col("new_score").as("score"),
            when(col("cluster_id").isNotNull, "linked").otherwise("nil").as("status"),
            col("text")
          )
        val untouched = basePredictions
          .select("url", "cluster_id", "score", "status", "text")
          .join(affected, Seq("cluster_id"), "left_anti")
          .join(
            broadcast(mergeMap.select(col("old_cluster_id").as("cluster_id"), col("new_cluster_id"))),
            Seq("cluster_id"),
            "left"
          )
          .join(bestNew, Seq("url"), "left")
          .select(
            col("url"),
            coalesce(col("new_cluster_id"), col("cluster_id")).as("cluster_id"),
            greatest(col("score"), col("new_score")).as("score"),
            when(col("new_score").isNotNull || col("status") === "linked", "linked")
              .otherwise("nil")
              .as("status"),
            col("text")
          )
        untouched.unionByName(recomputed)
      }
      phase("withDeterministicSeq+action") {
        LinkagePipeline
          .withDeterministicSeq(updatedAll, "url")
          .select("url", "cluster_id", "status", "seq")
          .orderBy("url")
          .foreach(_ => ())
      }
      rm.unpersist(false); survivors.unpersist(false)
      affected.unpersist(false); members.unpersist(false)
    }
    spark.stop()
  }
}
