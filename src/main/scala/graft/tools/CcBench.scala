package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Connected-components microbench: wall of `ConnectedComponents.run` to
  * convergence on two fixed edge shapes — a shallow ER-like star corpus
  * (400k edges, converges in a few rounds) and a deep 300k-edge chain
  * (~8 url rounds + mid-run compaction + ~10 compacted rounds) —
  * best-of-3. Produced BENCH.md R5.0's lever-(b) measurement (shared
  * star-round exchanges: chain −16%, shallow wash, rejected for skew
  * safety). Usage: runMain graft.tools.CcBench [master]. Run ALONE.
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val master = args.headOption.getOrElse("local[8]")
    val spark = graft.pipeline.LinkagePipeline.session(master, "cc-bench")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // two shapes: shallow ER-ish stars (many small comps) and a deep chain
    val shallow = (0 until 400000).map { i =>
      val c = i / 5
      (s"u$c-${i % 5}", s"u$c-0")
    }.toDF("src", "dst").where(col("src") =!= col("dst"))
    val chain = (0 until 300000).map(i => (f"c$i%08d", f"c${i + 1}%08d")).toDF("src", "dst")
    for ((name, df) <- Seq("shallow" -> shallow, "chain" -> chain)) {
      val ck = graft.util.Checkpoints.serializedLocal(df)
      ck.count()
      var best = Double.MaxValue
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        ConnectedComponents.run(ck).foreach(_ => ())
        val s = (System.nanoTime() - t0) / 1e9
        best = math.min(best, s)
        println(f"[ccbench] $name rep$r: $s%.2f s")
      }
      println(f"[ccbench] $name BEST: $best%.2f s (materialize=${!sys.env.get("GRAFT_CC_MATERIALIZE").contains("0")})")
    }
    spark.stop()
  }
}
