package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.LinkagePipeline

/** The engine-free control: a pure-Spark shuffle microbenchmark (range ->
  * groupBy -> groupBy, no engine code in the loop) whose N->4N efficiency
  * is this host's shuffle-scaling CEILING. ONE definition, used by both
  * the in-bench control and the standalone probe:
  *
  *   sbt 'runMain graft.BenchControl local[2] local[8]'
  */
object BenchControl {

  /** Run the control job once (an action; nothing returned). */
  def controlJob(spark: SparkSession, rows: Long): Unit = spark
    .range(rows)
    .select(
      (col("id") % 1000000).as("k"),
      concat(lit("v-"), col("id") % 97, lit("-padpadpadpadpad")).as("v")
    )
    .groupBy("k")
    .agg(count(lit(1)).as("n"), max("v").as("m"))
    .groupBy(col("n") % 32)
    .agg(count(lit(1)))
    .foreach(_ => ())

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONTROL_ROWS", "60000000").toLong
    args.foreach { master =>
      val spark = LinkagePipeline.session(master, s"graft-control-$master")
      spark.sparkContext.setLogLevel("ERROR")
      try {
        controlJob(spark, rows) // warmup
        var best = Double.MaxValue
        (1 to 2).foreach { _ =>
          val t0 = System.nanoTime()
          controlJob(spark, rows)
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        println(f"[control] $master best: $best%.2f s")
      } finally spark.stop()
    }
  }
}
