package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Plan probe for one star round: prints the final ADAPTIVE plan's
  * exchange and ReusedExchange counts plus their partitioning lines —
  * how BENCH.md R5.0 established the per-round exchange structure
  * (probe-side + partial-agged mins exchanges per star, reuse between
  * the mins subtrees). Usage: runMain graft.tools.CcExplain.
  */
object CcExplain {
  def main(args: Array[String]): Unit = {
    val spark = graft.pipeline.LinkagePipeline.session("local[8]", "cc-explain")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edges = (0 until 200000).map(i => (i.toLong.toString, (i + 1).toString)).toDF("src", "dst")
    val ck = graft.util.Checkpoints.serializedLocal(edges)
    val round = ConnectedComponents.smallStar(ConnectedComponents.largeStar(ck))
    round.collect()
    // final adaptive plan only
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val aqe = round.queryExecution.executedPlan.collectFirst { case a: AdaptiveSparkPlanExec => a }
    val finalPlan = aqe.map(_.executedPlan.toString).getOrElse(round.queryExecution.executedPlan.toString)
    println("FINAL_EXCHANGES=" + "Exchange hashpartitioning".r.findAllIn(finalPlan).length)
    println("FINAL_REUSED=" + "ReusedExchange".r.findAllIn(finalPlan).length)
    finalPlan.linesIterator.filter(l => l.contains("Exchange hashpartitioning") || l.contains("ReusedExchange")).foreach(l => println(l.trim.take(120)))
    spark.stop()
  }
}
