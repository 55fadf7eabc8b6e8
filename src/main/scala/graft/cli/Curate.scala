package graft.cli

import graft.pipeline.{CorpusPipeline, LinkagePipeline}

/** Training-data curation CLI — the corpus build (redact -> quality gate
  * -> exact dedup -> span dedup -> split) as a spark-submit surface:
  *
  *   graft.cli.Curate --input <parquet dir|csv:path|synth:N> --output <dir>
  *     [--master local[*]]
  *     [--min-tokens 50] [--max-tokens 100000] [--min-distinct 0.0]
  *     [--max-top-bigram 0.2] [--max-dup-trigram 0.2]
  *     [--window-words 50] [--splits train=0.98,valid=0.01,test=0.01]
  *     [--redact true]
  *
  * Writes the cleaned corpus (url, split, n_words, n_removed, text_clean)
  * to <output> and prints ONE JSON stats line (stage counts) on stdout.
  */
object Curate {

  private[graft] def parseSplits(s: String): Seq[(String, Double)] =
    s.split(",").toSeq.map { part =>
      part.split("=") match {
        case Array(name, w) => (name.trim, w.trim.toDouble)
        case _ => sys.error(s"bad --splits entry '$part' (want name=weight)")
      }
    }

  def main(args: Array[String]): Unit = {
    // JSON output uses "%.2f".format — locale-dependent (a comma-decimal
    // locale would emit invalid JSON); pin the JVM default for this process
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val opts = Main.parseArgs(args)
    val input = opts.getOrElse("input", "synth:2000")
    val output = opts.getOrElse("output", "/tmp/graft-curated")
    val spark = LinkagePipeline.session(opts.getOrElse("master", "local[*]"), "graft-curate")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val cfg = CorpusPipeline.Config(
        minTokens = opts.get("min-tokens").map(_.toLong).getOrElse(50L),
        maxTokens = opts.get("max-tokens").map(_.toLong).getOrElse(100000L),
        minDistinctRatio = opts.get("min-distinct").map(_.toDouble).getOrElse(0.0),
        maxTopBigramFrac = opts.get("max-top-bigram").map(_.toDouble).getOrElse(0.2),
        maxDupTrigramFrac = opts.get("max-dup-trigram").map(_.toDouble).getOrElse(0.2),
        windowWords = opts.get("window-words").map(_.toInt).getOrElse(50),
        splits = opts.get("splits").map(parseSplits).getOrElse(CorpusPipeline.Config().splits),
        redactPii = opts.get("redact").contains("true")
      )
      val raw = Main.materializeInput(spark, input, output)
      val pages = Main.preparePages(raw, opts)
      val t0 = System.nanoTime()
      val res = CorpusPipeline.run(pages, cfg)
      res.cleaned.write.mode("overwrite").parquet(output)
      res.release()
      val secs = (System.nanoTime() - t0) / 1e9
      // the output path is interpolated into the stats JSON: escape the two
      // characters that can break the string literal (same failure class the
      // incremental index's meta.json guards against)
      val outJson = output.replace("\\", "\\\\").replace("\"", "\\\"")
      println(
        s"""{"docs_in":${res.docsIn},"kept":${res.kept},"canonical":${res.canonical},""" +
          s""""removed_words":${res.removedWords},"seconds":${"%.2f".format(secs)},""" +
          s""""docs_per_sec":${"%.1f".format(res.docsIn / secs)},"output":"$outJson"}"""
      )
    } finally spark.stop()
  }
}
