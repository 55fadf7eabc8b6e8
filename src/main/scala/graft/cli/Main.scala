package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.pipeline.LinkagePipeline
import graft.synth.WebCorpus

/** spark-submit entry point, mirroring the reference CLI surface
  * (/root/reference/lion_linker/cli.py:15-39): flag-style config selects
  * blocking strategies by name (no reflection), runs the linkage pipeline,
  * writes predictions parquet + a metrics line.
  *
  * Usage:
  *   graft.cli.Main --input <parquet dir|synth:N> --output <dir>
  *     [--strategies canonical_url,domain,minhash]
  *     [--threshold 0.70] [--max-block-size 1000] [--master local[8]]
  *     [--snapshots <dir>]   resumable mode: commit every stage under <dir>
  *                           and resume from the last committed stage on rerun
  */
object Main {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect { case Array(k, v) if k.startsWith("--") => k.drop(2) -> v }.toMap

  val strategyByName: Map[String, BlockingStrategy] = Map(
    "canonical_url" -> CanonicalUrlBlocking,
    "domain" -> DomainBlocking,
    "minhash" -> MinHashBlocking()
  )

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val input = opts.getOrElse("input", "synth:2000")
    val output = opts.getOrElse("output", "/tmp/graft-out")
    val master = opts.getOrElse("master", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    val strategies = opts
      .getOrElse("strategies", "canonical_url,domain,minhash")
      .split(",")
      .map(_.trim)
      .map(n => strategyByName.getOrElse(n, sys.error(s"unknown strategy '$n'; have ${strategyByName.keys.mkString(",")}")))
      .toSeq
    val weights = PairScorer.Weights(threshold = opts.get("threshold").map(_.toDouble).getOrElse(0.70))
    val cfg = LinkagePipeline.Config(
      strategies = strategies,
      weights = weights,
      maxBlockSize = opts.get("max-block-size").map(_.toInt).getOrElse(1000)
    )

    val spark = LinkagePipeline.session(master, "graft-linkage-cli")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val pages =
        if (input.startsWith("synth:")) {
          val n = input.drop("synth:".length).toInt
          WebCorpus.pages(spark, WebCorpus.Config(numClusters = math.max(n / 4, 1))).toDF
        } else spark.read.parquet(input)

      val t0 = System.nanoTime()
      val preds = opts.get("snapshots") match {
        case Some(snapDir) =>
          val hash = graft.io.TableIO.configHash(
            Map(
              "input" -> input,
              "strategies" -> strategies.map(_.name).mkString(","),
              "threshold" -> weights.threshold.toString,
              "maxBlockSize" -> cfg.maxBlockSize.toString
            )
          )
          val io = new graft.io.ParquetTableIO(snapDir, runId = java.util.UUID.randomUUID.toString, hash)
          LinkagePipeline.runResumable(pages, cfg, io)
        case None => LinkagePipeline.run(pages, cfg)
      }
      preds.write.mode("overwrite").parquet(output)
      val secs = (System.nanoTime() - t0) / 1e9

      val out = spark.read.parquet(output)
      val nDocs = out.count()
      val nClusters = out.select("cluster_id").distinct().count()
      val nLinked = out.where(col("status") === "linked").count()
      println(
        s"""{"docs":$nDocs,"clusters":$nClusters,"linked":$nLinked,""" +
          s""""seconds":${"%.2f".format(secs)},"docs_per_sec":${"%.1f".format(nDocs / secs)},""" +
          s""""output":"$output"}"""
      )
    } finally spark.stop()
  }
}
