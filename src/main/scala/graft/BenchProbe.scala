package graft

import graft.pipeline.LinkagePipeline

/** Dev probe: time the flagship at two arbitrary masters (args). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val corpus = args(0)
    args.drop(1).foreach { master =>
      val spark = LinkagePipeline.session(master, "graft-probe")
      spark.sparkContext.setLogLevel("ERROR")
      try {
        LinkagePipeline.run(spark.read.parquet(corpus).limit(15000)).foreach(_ => ())
        val t0 = System.nanoTime()
        LinkagePipeline.run(spark.read.parquet(corpus)).foreach(_ => ())
        println(f"[probe] $master ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } finally spark.stop()
    }
  }
}
