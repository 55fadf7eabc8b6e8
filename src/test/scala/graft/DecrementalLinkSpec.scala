package graft

import org.apache.spark.sql.functions._

import graft.operators.IncrementalLinkage
import graft.pipeline.LinkagePipeline
import graft.synth.WebCorpus

/** Decremental linkage (IncrementalLinkage.remove): delete-vs-rerun
  * equivalence, bridge splits, label handoff when the removed url WAS the
  * cluster label, tombstone idempotence, and index maintenance.
  */
class DecrementalLinkSpec extends SparkSpec {

  import spark.implicits._

  private val cfg = WebCorpus.Config(numClusters = 110, seed = 11L)
  lazy val pages = WebCorpus.pages(spark, cfg).toDF.cache()

  test("remove == full rerun over (base \\ removed): labels, status, seq exact") {
    // remove a pseudo-random ~quarter of the corpus, including docs inside
    // planted clusters (splits + label handoffs) and cluster-min urls
    val rmUrls = pages.where(pmod(xxhash64(col("url")), lit(4)) === 0).select("url").cache()
    assert(rmUrls.count() > 0)

    val pipeCfg = LinkagePipeline.Config()
    val basePred = LinkagePipeline.run(pages, pipeCfg).cache()
    val index = IncrementalLinkage.buildIndex(pages, pipeCfg)
    val out = IncrementalLinkage.remove(rmUrls, basePred, index, pipeCfg)

    val reduced = pages.join(rmUrls, Seq("url"), "left_anti")
    val rerun = LinkagePipeline.run(reduced, pipeCfg)

    val cols = Seq("url", "cluster_id", "status", "seq")
    val want = rerun.select(cols.map(col): _*).orderBy("url").collect()
    val got = out.predictions.select(cols.map(col): _*).orderBy("url").collect()
    assert(want.length == got.length, s"row counts differ: rerun=${want.length} rm=${got.length}")
    want.zip(got).foreach { case (a, b) => assert(a == b, s"row differs:\n rerun=$a\n rm   =$b") }

    // no removed url survives anywhere
    assert(out.predictions.join(rmUrls, Seq("url"), "left_semi").count() == 0)

    // the reduced index must equal a fresh index over the reduced corpus
    val freshIndex = IncrementalLinkage.buildIndex(reduced, pipeCfg)
    assert(out.index.idfDocs == freshIndex.idfDocs)
    val d1 = out.index.idfDf.orderBy("t").collect().map(r => (r.getLong(0), r.getLong(1)))
    val d2 = freshIndex.idfDf.orderBy("t").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(d1.sameElements(d2), "reduced IDF artifact != fresh reduced artifact")
    val k1 = out.index.keys.orderBy("url", "key").collect()
    val k2 = freshIndex.keys.orderBy("url", "key").collect()
    assert(k1.length == k2.length && k1.zip(k2).forall { case (a, b) => a == b })
  }

  test("removing a bridge doc splits its cluster into the rerun's components") {
    // sliding-window chain under a cosine-only scorer: adjacent docs share
    // 4/6 tokens (cos ~0.54), docs 2 apart share 2/6 (cos ~0.18) — with
    // threshold 0.4 the middle doc is the only bridge
    val toks = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9".split(" ")
    // shared two-token prefix: the domain strategy's key is
    // domain|tok1|tok2, so all three docs land in ONE block
    def textOf(i: Int) = "chain corp " + toks.slice(2 * i, 2 * i + 6).mkString(" ")
    val chain = Seq(0, 1, 2)
      .map(i => (s"https://chain.example.org/p$i", textOf(i)))
      .toDF("url", "text")
    val pipeCfg = LinkagePipeline.Config(
      weights = graft.operators.PairScorer.Weights(jw = 0.0, lev = 0.0, cosine = 1.0, threshold = 0.4)
    )
    val basePred = LinkagePipeline.run(chain, pipeCfg).cache()
    // precondition: the chain is one 3-doc cluster in the base run
    assert(basePred.select("cluster_id").distinct().count() == 1)

    val index = IncrementalLinkage.buildIndex(chain, pipeCfg)
    val out = IncrementalLinkage.remove(
      Seq("https://chain.example.org/p1").toDF("url"),
      basePred,
      index,
      pipeCfg
    )
    val got = out.predictions
      .select("url", "cluster_id", "status")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    // p0 and p2 share no tokens: both become nil singletons
    assert(
      got == Set(
        ("https://chain.example.org/p0", "https://chain.example.org/p0", "nil"),
        ("https://chain.example.org/p2", "https://chain.example.org/p2", "nil")
      ),
      s"got $got"
    )
    // and the rerun agrees
    val rerun = LinkagePipeline.run(chain.where(col("url") =!= "https://chain.example.org/p1"), pipeCfg)
    val want = rerun
      .select("url", "cluster_id", "status")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got == want)
  }

  test("unknown urls are a no-op; removing nothing returns the base store") {
    val pipeCfg = LinkagePipeline.Config()
    val basePred = LinkagePipeline.run(pages, pipeCfg).cache()
    val index = IncrementalLinkage.buildIndex(pages, pipeCfg)
    val out = IncrementalLinkage.remove(
      Seq("https://never-crawled.example.org/x").toDF("url"),
      basePred,
      index,
      pipeCfg,
      reseq = false
    )
    assert(out.removed.count() == 0)
    assert(out.changed.count() == 0)
    val cols = Seq("url", "cluster_id", "score", "status")
    val want = basePred.select(cols.map(col): _*).orderBy("url").collect()
    val got = out.predictions.select(cols.map(col): _*).orderBy("url").collect()
    assert(want.length == got.length && want.zip(got).forall { case (a, b) => a == b })
  }

  test("changed upsert + tombstones applied onto the base store reproduce predictions") {
    val rmUrls = pages.where(pmod(xxhash64(col("url")), lit(4)) === 0).select("url").cache()
    val basePred = LinkagePipeline.run(pages).cache()
    val index = IncrementalLinkage.buildIndex(pages)
    val out = IncrementalLinkage.remove(rmUrls, basePred, index, reseq = false)

    val cols = Seq("url", "cluster_id", "score", "status", "text")
    val changed = out.changed.cache()
    val patched = basePred
      .select(cols.map(col): _*)
      .join(out.removed, Seq("url"), "left_anti") // apply tombstones
      .join(changed.select(col("url"), lit(true).as("_hit")), Seq("url"), "left_anti")
      .unionByName(
        changed
          .join(basePred.select(col("url"), col("text").as("_base_text")), Seq("url"), "left")
          .select(
            col("url"),
            col("cluster_id"),
            col("score"),
            col("status"),
            coalesce(col("text"), col("_base_text")).as("text")
          )
      )
    val want = out.predictions.select(cols.map(col): _*).orderBy("url").collect()
    val got = patched.orderBy("url").collect()
    assert(got.length == want.length, s"${got.length} != ${want.length}")
    got.zip(want).foreach { case (a, b) => assert(a == b, s"patched row differs:\n got =$a\n want=$b") }
    // the upsert never ships text
    assert(changed.where(col("text").isNotNull).count() == 0)
    // window configs are refused
    val winCfg = LinkagePipeline.Config(windowPasses = Seq(("substring(url, 1, 30)", 3)))
    intercept[IllegalArgumentException] {
      IncrementalLinkage.remove(rmUrls, basePred, index, winCfg)
    }
  }
}
