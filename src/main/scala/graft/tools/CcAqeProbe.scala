package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents
import graft.pipeline.LinkagePipeline

/** Dev loop: CC.run wall on the q_er_cc chain graph with AQE on vs off —
  * how much of the per-round cost is AQE stage-job scheduling at tiny
  * scale. Usage: sbt 'runMain graft.tools.CcAqeProbe [dir]'
  */
object CcAqeProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = LinkagePipeline.session("local[32]", "cc-aqe-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def edges() = {
      val nodes = spark.read
        .parquet(s"$dir/documents.parquet")
        .select(lpad(col("doc_id").cast("string"), 6, "0").as("id"), col("lang"), col("n_chars"))
      val a = nodes.select(col("id").as("src"), col("lang"), col("n_chars"))
      val b = nodes
        .select(col("id").as("dst"), col("lang").as("lang_b"), col("n_chars").as("nc_b"))
        .select(
          col("dst"),
          col("lang_b"),
          explode(array(col("nc_b") - 1, col("nc_b"), col("nc_b") + 1)).as("nc_key")
        )
      a.join(b, col("lang") === col("lang_b") && col("n_chars") === col("nc_key") && col("src") =!= col("dst"))
        .select("src", "dst")
    }

    def run(tag: String): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      ConnectedComponents.run(edges()).foreach(_ => ())
      println(f"[aqe-probe] $tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    run("aqe=on ")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    run("aqe=off")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    run("aqe=on2")
    spark.stop()
  }
}
