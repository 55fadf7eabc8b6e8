package graft.cli

import org.apache.spark.sql.functions._

import graft.operators._
import graft.pipeline.LinkagePipeline
import graft.synth.WebCorpus

/** Phase-timing profiler for the flagship job (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val master = args.lift(1).getOrElse("local[8]")
    val spark = LinkagePipeline.session(master, "graft-profile")
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val samples = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      val mon = new Thread(() => {
        while (!done.get()) {
          val active = spark.sparkContext.statusTracker.getExecutorInfos.map(_.numRunningTasks()).sum
          samples.add(active)
          Thread.sleep(200)
        }
      })
      mon.setDaemon(true); mon.start()
      val t0 = System.nanoTime(); val r = f
      done.set(true)
      val xs = samples.toArray(Array.empty[Integer]).map(_.toInt)
      val avg = if (xs.nonEmpty) xs.sum.toDouble / xs.length else 0.0
      val idlePct = if (xs.nonEmpty) 100.0 * xs.count(_ == 0) / xs.length else 0.0
      println(f"[phase] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s  avgActiveTasks=$avg%6.1f idle%%=$idlePct%5.1f")
      r
    }
    val cfg = LinkagePipeline.Config()
    val pages = WebCorpus.pages(spark, WebCorpus.Config(numClusters = n / 4)).toDF
    timed("gen+cache") { pages.cache().count() }
    val corpus = pages.select("url", "text")
    val keys = timed("keys") { val k = Blocker.allKeys(corpus, cfg.strategies).transform(graft.util.Checkpoints.serializedLocal); k }
    val pairs = timed("pairs") { Blocker.pairs(keys, cfg.maxBlockSize).transform(graft.util.Checkpoints.serializedLocal) }
    println(s"[n] pairs=${pairs.count()}")
    val feats = timed("features") { PairScorer.features(corpus).transform(graft.util.Checkpoints.serializedLocal) }
    val scored = timed("score") { PairScorer.score(pairs, feats, cfg.weights).transform(graft.util.Checkpoints.serializedLocal) }
    val accepted = timed("threshold") {
      scored.where(col("score") >= cfg.weights.threshold).transform(graft.util.Checkpoints.serializedLocal)
    }
    val clusters = timed("cc") {
      ConnectedComponents.run(accepted.select(col("urlA").as("src"), col("urlB").as("dst"))).transform(graft.util.Checkpoints.serializedLocal)
    }
    timed("predictions") {
      // the REAL pipeline tail — timing a hand-copied variant would let the
      // profiler silently diverge from what production runs
      LinkagePipeline.assemblePredictions(corpus, clusters, accepted).count()
    }
    spark.stop()
  }
}
