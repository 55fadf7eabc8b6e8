package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents
import graft.pipeline.LinkagePipeline

/** Measures the CC id-compaction break-even on a deep chain graph — the
  * adversarial regime for the alternating-star algorithm (~log2(n) rounds,
  * each shuffling the full edge set). Compares: never compacting, upfront
  * compaction, and the default mid-run auto-compaction (compactAfter = 8).
  *
  * Usage: sbt 'runMain graft.tools.CcProbe [nNodes] [master]'
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 2000000
    val master = if (args.length > 1) args(1) else "local[32]"
    val spark = LinkagePipeline.session(master, s"cc-probe-$n")
    spark.sparkContext.setLogLevel("ERROR")

    // chain 0-1-2-...-n with url-shaped string ids (zero-padded: lex order
    // == numeric order, so cluster_id must be node 0 for every row)
    val edges = spark
      .range(1, n)
      .select(
        format_string("https://probe.example/p%09d", col("id") - 1).as("src"),
        format_string("https://probe.example/p%09d", col("id")).as("dst")
      )
      .repartition(32)
      .cache()
    edges.count()

    def once(tag: String)(run: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val out = run.agg(count(lit(1)).as("n"), countDistinct(col("cluster_id")).as("k")).collect()(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[cc-probe] n=$n $tag%-22s ${secs}%7.2f s  (nodes=${out.getLong(0)} clusters=${out.getLong(1)})")
    }

    val modes = sys.env.getOrElse("GRAFT_CC_PROBE_MODES", "never,auto,upfront").split(",").toSet
    if (modes("never"))
      once("never-compact") { ConnectedComponents.run(edges, maxIterations = 40, compactAfter = Int.MaxValue) }
    if (modes("auto")) {
      val after = sys.env.getOrElse("GRAFT_CC_COMPACT_AFTER", "8").toInt
      once(s"auto-compact@$after") { ConnectedComponents.run(edges, maxIterations = 40, compactAfter = after) }
    }
    if (modes("upfront"))
      once("upfront-compact") { ConnectedComponents.run(edges, maxIterations = 40, compact = true) }
    spark.stop()
  }
}
