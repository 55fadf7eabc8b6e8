package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.LinkagePipeline
import graft.streaming.StreamingLinkage
import graft.synth.WebCorpus

class StreamingLinkageSpec extends SparkSpec {

  private def snapshot(store: String): Map[String, (String, String)] =
    StreamingLinkage
      .predictions(spark, store)
      .select(col("url"), col("cluster_id").cast("string"), col("status"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2))))
      .toMap

  private def rerun(
      pages: Seq[(String, String)],
      cfg: LinkagePipeline.Config
  ): Map[String, (String, String)] = {
    import spark.implicits._
    LinkagePipeline
      .run(pages.toDF("url", "text"), cfg)
      .select(col("url"), col("cluster_id").cast("string"), col("status"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2))))
      .toMap
  }

  test("streaming linkage: store equals the batch rerun after every micro-batch prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft-slink-store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-slink-ckpt").toString
    val cfg = LinkagePipeline.Config()
    val all = WebCorpus
      .pages(spark, WebCorpus.Config(numClusters = 25, seed = 11L))
      .toDF()
      .select("url", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
    // any 3-way split must converge to the same clusters (the operator's
    // equivalence theorem); round-robin keeps every wave non-trivial
    val waves = (0 until 3).map(w => all.zipWithIndex.filter(_._2 % 3 == w).map(_._1))

    val input = MemoryStream[(String, String)]
    val q = StreamingLinkage.run(
      input.toDS().toDF("url", "text"),
      store,
      ckpt,
      cfg,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)
    )
    try {
      var seen = Seq.empty[(String, String)]
      for ((wave, i) <- waves.zipWithIndex) {
        input.addData(wave: _*)
        q.processAllAvailable()
        seen = seen ++ wave
        assert(StreamingLinkage.currentVersion(spark, store).contains(i), s"version after wave $i")
        val got = snapshot(store)
        val want = rerun(seen, cfg)
        assert(got.size == want.size, s"wave $i: ${got.size} rows vs rerun ${want.size}")
        assert(got == want, s"wave $i: store diverged from the batch rerun")
      }
    } finally q.stop()

    // idempotent re-delivery: a crashed-and-replayed batch advances the
    // version but cannot change the clusters
    val before = snapshot(store)
    StreamingLinkage.linkBatch(waves.last.toDF("url", "text"), store, cfg)
    assert(StreamingLinkage.currentVersion(spark, store).contains(3))
    assert(snapshot(store) == before, "re-delivered batch must be a no-op")

    // W5 finalize: one batch seq pass over the committed snapshot must
    // reproduce the FULL batch pipeline output — every column INCLUDING
    // seq, byte-identically (the one reference semantic the streaming
    // surface leaves null)
    val finalDir = StreamingLinkage.finalizeSeq(spark, store)
    // score excluded: incremental linkage freezes old-url scores at
    // base-time IDF (contract condition 3) — same exclusion as the prefix
    // comparison above; everything else, seq INCLUDED, is byte-identical
    val cols = Seq("url", "cluster_id", "status", "text", "seq")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[String])
    val got = rows(spark.read.parquet(finalDir))
    val want = rows(LinkagePipeline.run(all.toDF("url", "text"), cfg))
    assert(got.size == want.size, s"finalized ${got.size} rows vs batch ${want.size}")
    assert(got == want, "finalized store must equal the batch pipeline output incl. seq")
    // finalize is a read-side export: LATEST still points at the
    // un-stamped v3 and the store keeps incrementing from it
    assert(StreamingLinkage.currentVersion(spark, store).contains(3))
  }

  test("streamed tombstones: store equals the batch rerun over the reduced corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft-srm-store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-srm-ckpt").toString
    val cfg = LinkagePipeline.Config()
    val all = WebCorpus
      .pages(spark, WebCorpus.Config(numClusters = 25, seed = 13L))
      .toDF()
      .select("url", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
    StreamingLinkage.linkBatch(all.toDF("url", "text"), store, cfg)
    assert(StreamingLinkage.currentVersion(spark, store).contains(0))

    // two tombstone waves through the streaming surface
    val rmWaves = Seq(
      all.zipWithIndex.filter(_._2 % 5 == 0).map(_._1._1),
      all.zipWithIndex.filter(_._2 % 5 == 1).map(_._1._1)
    )
    val input = MemoryStream[String]
    val q = StreamingLinkage.runRemovals(
      input.toDS().toDF("url"),
      store,
      ckpt,
      cfg,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)
    )
    try {
      var gone = Set.empty[String]
      for ((wave, i) <- rmWaves.zipWithIndex) {
        input.addData(wave: _*)
        q.processAllAvailable()
        gone = gone ++ wave
        assert(StreamingLinkage.currentVersion(spark, store).contains(i + 1))
        val got = snapshot(store)
        val want = rerun(all.filterNot(p => gone(p._1)), cfg)
        assert(got.size == want.size, s"wave $i: ${got.size} rows vs rerun ${want.size}")
        assert(got == want, s"wave $i: store diverged from the reduced rerun")
      }
    } finally q.stop()

    // re-delivered tombstones advance the version but change nothing
    val before = snapshot(store)
    StreamingLinkage.removeBatch(rmWaves.last.toDF("url"), store, cfg)
    assert(StreamingLinkage.currentVersion(spark, store).contains(3))
    assert(snapshot(store) == before, "re-delivered tombstones must be a no-op")

    // the compacted post-removal index still serves link batches: add a
    // fresh wave of near-duplicates of surviving docs — they must attach
    val survivors = all.filterNot(p => (rmWaves(0) ++ rmWaves(1)).toSet(p._1))
    val dupes = survivors.take(10).map { case (u, t) => (s"$u?v=2", t) }
    StreamingLinkage.linkBatch(dupes.toDF("url", "text"), store, cfg)
    val got = snapshot(store)
    val want = rerun(survivors ++ dupes, cfg)
    assert(got == want, "post-removal increment diverged from the batch rerun")
  }

  test("gc keeps the live store loadable and drops superseded versions") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft-slink-gc").toString
    val cfg = LinkagePipeline.Config()
    val all = WebCorpus
      .pages(spark, WebCorpus.Config(numClusters = 12, seed = 3L))
      .toDF()
      .select("url", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
    val waves = (0 until 4).map(w => all.zipWithIndex.filter(_._2 % 4 == w).map(_._1))
    // compactEvery = 2: v2 is a FLAT index, so v0/v1 links become unreferenced
    waves.foreach(w => StreamingLinkage.linkBatch(w.toDF("url", "text"), store, cfg, compactEvery = 2))
    assert(StreamingLinkage.currentVersion(spark, store).contains(3))
    val before = snapshot(store)

    val (preds, idx) = StreamingLinkage.gc(spark, store, keepVersions = 2)
    assert(preds == 2, s"predictions_v0/v1 dropped (got $preds)")
    assert(idx == 2, s"index_v0/v1 (below the flat root v2) dropped (got $idx)")
    assert(snapshot(store) == before, "gc must not change the live snapshot")
    // the store still takes increments after gc (index chain intact)
    StreamingLinkage.linkBatch(waves.head.toDF("url", "text"), store, cfg, compactEvery = 2)
    assert(StreamingLinkage.currentVersion(spark, store).contains(4))
    assert(snapshot(store) == before, "re-delivered wave is still a no-op post-gc")
    // second gc: v4's post-increment index is flat again, so v2/v3 links
    // and the one now-superseded prediction snapshot go; nothing else
    assert(StreamingLinkage.gc(spark, store, keepVersions = 2) == ((1, 2)))
    assert(snapshot(store) == before)

    // commitVersion crash window: LATEST deleted, only LATEST.tmp present
    // (the delete-then-rename gap). The store must still read as v4 and the
    // next batch must INCREMENT to v5 — bootstrapping here would silently
    // orphan every committed version
    val fsys = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.rename(
      new org.apache.hadoop.fs.Path(s"$store/LATEST"),
      new org.apache.hadoop.fs.Path(s"$store/LATEST.tmp")
    )
    assert(StreamingLinkage.currentVersion(spark, store).contains(4), "tmp fallback")
    StreamingLinkage.linkBatch(waves.last.toDF("url", "text"), store, cfg, compactEvery = 2)
    assert(StreamingLinkage.currentVersion(spark, store).contains(5))
    assert(snapshot(store) == before, "recovered store must not lose clusters")
    // compactEvery must be validated up front
    intercept[IllegalArgumentException](
      StreamingLinkage.linkBatch(waves.last.toDF("url", "text"), store, cfg, compactEvery = 0)
    )
  }
}
