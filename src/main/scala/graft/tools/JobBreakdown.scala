package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import graft.SparkEntry
import graft.pipeline.LinkagePipeline

/** Dev loop: run ONE battery query warm and print every Spark job's wall
  * time with its call site, so the expensive actions inside a multi-job
  * query (checkpoints, counts, collects, the final foreach) are visible
  * individually. Usage:
  *   sbt 'runMain graft.tools.JobBreakdown q_inc_unlink /root/testdata/sf0.1'
  */
object JobBreakdown {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = LinkagePipeline.session("local[32]", s"jobs-$name")
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    fn(spark, dir).foreach(_ => ()) // warmup (JIT + codegen)

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // attribute the job to the first graft frame in the result stage's
        // call site (stage details = the submitting stack trace)
        val site = e.stageInfos.lastOption
          .map(_.details)
          .flatMap(_.split('\n').find(l => l.contains("graft.") && !l.contains("JobBreakdown")))
          .map(_.trim)
          .getOrElse("?")
        starts.put(e.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach { case (t0, site) =>
          rows.add((e.jobId, (System.nanoTime() - t0) / 1e9, site))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, dir).foreach(_ => ())
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500) // let the listener bus drain

    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toVector.sortBy(_._1)
    println(f"[jobs] $name warm wall: $wall%.2f s, ${all.size} jobs, job-sum ${all.map(_._2).sum}%.2f s")
    all.foreach { case (id, secs, site) => println(f"[jobs]  #$id%-4d $secs%7.3f s  $site") }
    val bySite = all.groupBy(_._3).map { case (s, v) => (s, v.map(_._2).sum, v.size) }.toVector.sortBy(-_._2)
    println("[jobs] by call site:")
    bySite.foreach { case (s, secs, n) => println(f"[jobs]  $secs%7.2f s  x$n%-3d $s") }
    spark.stop()
  }
}
