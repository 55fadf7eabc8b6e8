package graft.tools

import graft.SparkEntry
import graft.pipeline.LinkagePipeline

/** Dev loop: run ONE battery query, print cold + warm wall seconds and the
  * post-execution formatted plan (AQE-final). Usage:
  *   sbt 'runMain graft.tools.QueryProbe q_dd_embedding_neardup /root/testdata/sf0.1'
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = LinkagePipeline.session("local[32]", s"probe-$name")
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    def once(tag: String): Unit = {
      val t0 = System.nanoTime()
      fn(spark, dir).foreach(_ => ())
      println(f"[probe] $name $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    once("cold")
    once("warm")
    once("warm2")
    val df = fn(spark, dir)
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
