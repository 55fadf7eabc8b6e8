package graft

import org.apache.spark.sql.functions._

import graft.pipeline.LinkagePipeline

/** Standalone engine-free control: the pure-shuffle microbenchmark from
  * Bench at an arbitrary list of masters (args), for measuring this host's
  * shuffle-scaling ceiling under any parallelism pairing.
  *
  *   sbt 'runMain graft.BenchControl local[2] local[8]'
  */
object BenchControl {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONTROL_ROWS", "60000000").toLong
    args.foreach { master =>
      val spark = LinkagePipeline.session(master, s"graft-control-$master")
      spark.sparkContext.setLogLevel("ERROR")
      try {
        def job(): Unit = spark
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
        job() // warmup
        var best = Double.MaxValue
        (1 to 2).foreach { rep =>
          val t0 = System.nanoTime()
          job()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        println(f"[control] $master best: $best%.2f s")
      } finally spark.stop()
    }
  }
}
