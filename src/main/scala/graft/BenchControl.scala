package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.LinkagePipeline

/** Engine-free controls bracketing this host's N->4N scaling physics (no
  * engine code in either loop):
  *
  *  - [[controlJob]] — a pure SHUFFLE microbenchmark (range -> groupBy ->
  *    groupBy): memory-bus-bound, the scaling floor-to-ceiling reference
  *    for shuffle-dominated work.
  *  - [[computeControlJob]] — a pure COMPUTE microbenchmark (per-row hash
  *    chain, one tiny aggregate): CPU-bound, the reference for
  *    compute-dominated work. On a shared-bus VM this scales BETTER than
  *    the shuffle control; a compute-heavy flagship (per-phase profile:
  *    ~88% kernel scoring) legitimately lands between the two, which is
  *    why "flagship above the shuffle control" is NOT by itself
  *    implausible (measured round 4: shuffle 0.42, flagship 0.62).
  *
  *   sbt 'runMain graft.BenchControl local[2] local[8]'
  */
object BenchControl {

  /** Run the shuffle control job once (an action; nothing returned). */
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

  /** Run the compute control job once: an 8-round xxhash64 chain per row,
    * no wide shuffle (single scalar aggregate). Codegen'd built-ins only.
    */
  def computeControlJob(spark: SparkSession, rows: Long): Unit = {
    val chained = (1 to 8).foldLeft(col("id")) { (c, _) => xxhash64(c, col("id")) }
    spark
      .range(rows)
      .select(chained.as("h"))
      // pmod keeps the ANSI sum far from Long overflow at any row count
      .agg(sum(pmod(col("h"), lit(1000))))
      .foreach(_ => ())
  }

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
