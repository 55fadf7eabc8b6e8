package graft.tools

import org.apache.spark.sql.functions._

import graft.operators._
import graft.pipeline.LinkagePipeline
import graft.synth.WebCorpus

/** Dev loop: how do candidate-pair counts scale with corpus size, per
  * blocking strategy? Quadratic growth hiding under the per-block salt cap
  * shows up here as a pair/doc ratio that climbs with N. Usage:
  *   sbt 'runMain graft.tools.ScaleProbe 100000 300000 1000000'
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(100000, 300000, 1000000)
    val spark = LinkagePipeline.session("local[32]", "scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val strategies: Seq[BlockingStrategy] =
      Seq(CanonicalUrlBlocking, DomainBlocking, MinHashBlocking())
    sizes.foreach { n =>
      val cfg = WebCorpus.Config(numClusters = n / 4)
      val pages = WebCorpus.pages(spark, cfg).toDF().select("url", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val docs = pages.count()
      strategies.foreach { s =>
        val keys = s.keys(pages).select("url", "key").distinct()
        val blocks = keys.groupBy("key").agg(count(lit(1)).as("n"))
        val st = blocks
          .agg(
            count(lit(1)).as("blocks"),
            max("n").as("maxBlock"),
            sum((col("n") * (col("n") - 1) / 2).cast("long")).as("rawPairs"),
            sum(when(col("n") > 1000, col("n")).otherwise(0)).as("oversizedRows")
          )
          .collect()(0)
        println(
          f"[scale] n=$docs%8d ${s.name}%-12s blocks=${st.getLong(0)}%9d maxBlock=${st.getLong(1)}%7d " +
            f"rawPairs=${st.getLong(2)}%12d oversizedRows=${Option(st.get(3)).map(_.toString).getOrElse("0")}"
        )
      }
      val allPairs = Blocker.pairs(Blocker.allKeys(pages, strategies), 1000).count()
      println(f"[scale] n=$docs%8d TOTAL salted+deduped pairs=$allPairs%12d ratio=${allPairs.toDouble / docs}%.1f")
      pages.unpersist()
    }
    spark.stop()
  }
}
