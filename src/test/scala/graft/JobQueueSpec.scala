package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.operators.JobQueue

/** W7 job-state transitions (reference semantics:
  * /root/reference/app/storage/state.py:118-155) and the S4 multipart
  * part-merge (app/api/routes.py:303-337).
  */
class JobQueueSpec extends SparkSpec {

  private def jobs(rows: (String, String, Long)*) = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "job_id string, status string, created_at bigint, started_at bigint, finished_at bigint, error string"
    )
    spark.createDataFrame(
      rows.map { case (id, st, at) => Row(id, st, at, null, null, null) }.asJava,
      schema
    )
  }

  test("claimNext takes the oldest queued job, ties broken by job_id") {
    val out = JobQueue
      .claimNext(
        jobs(("j3", "queued", 30L), ("j1", "queued", 10L), ("j1b", "queued", 10L), ("j2", "running", 5L)),
        lit(99L)
      )
      .collect()
      .map(r => r.getAs[String]("job_id") -> (r.getAs[String]("status"), Option(r.getAs[java.lang.Long]("started_at"))))
      .toMap
    assert(out("j1") === (("running", Some(99L))))  // oldest queued; j1 < j1b
    assert(out("j1b") === (("queued", None)))
    assert(out("j3") === (("queued", None)))
    assert(out("j2") === (("running", None))) // already running, untouched
  }

  test("claimNext with no queued jobs is a no-op") {
    val out = JobQueue
      .claimNext(jobs(("j1", "done", 1L), ("j2", "running", 2L)), lit(99L))
      .collect()
      .map(r => r.getAs[String]("job_id") -> r.getAs[String]("status"))
      .toMap
    assert(out === Map("j1" -> "done", "j2" -> "running"))
  }

  test("peekNext returns the row claimNext would take, without mutating") {
    val row = JobQueue.peekNext(jobs(("j2", "queued", 20L), ("j1", "queued", 10L))).collect()
    assert(row.map(_.getAs[String]("job_id")).toSeq === Seq("j1"))
    assert(row.head.getAs[String]("status") === "queued")
  }

  test("markRunningFailed sweeps running jobs only") {
    val out = JobQueue
      .markRunningFailed(jobs(("j1", "running", 1L), ("j2", "queued", 2L)), "restart", lit(50L))
      .collect()
      .map(r => r.getAs[String]("job_id") -> (r.getAs[String]("status"), r.getAs[String]("error")))
      .toMap
    assert(out("j1") === (("failed", "restart")))
    assert(out("j2") === (("queued", null)))
  }

  test("cancel flips a queued job only (running job is left alone)") {
    val base = jobs(("j1", "queued", 1L), ("j2", "running", 2L))
    val c1 = JobQueue.cancel(base, "j1", lit(9L)).where(col("job_id") === "j1").head()
    assert(c1.getAs[String]("status") === "cancelled")
    assert(c1.getAs[java.lang.Long]("finished_at") === 9L)
    val c2 = JobQueue.cancel(base, "j2", lit(9L)).where(col("job_id") === "j2").head()
    assert(c2.getAs[String]("status") === "running")
  }

  test("mergeParts concatenates parts in part-number order and validates missing parts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-parts").toString
    // write out of numeric order + a decoy non-part file
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "000002.part"), "c,d\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "000001.part"), "url,text\na,b\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "junk.txt"), "nope")
    val target = s"$dir/merged.csv"
    val n = Sources.mergeParts(spark, dir, target, totalParts = Some(2))
    val merged = java.nio.file.Files.readString(java.nio.file.Paths.get(target))
    assert(merged === "url,text\na,b\nc,d\n")
    assert(n === merged.getBytes("UTF-8").length.toLong)
    // a part straddling a row boundary still parses once merged
    val df = spark.read.option("header", true).csv(target)
    assert(df.count() === 2)
    // missing part -> reference-style error listing the gap
    val err = intercept[IllegalArgumentException] {
      Sources.mergeParts(spark, dir, target, totalParts = Some(4))
    }
    assert(err.getMessage.contains("Missing parts: 3, 4"))
    // stale parts outside 1..N (a 0.part, a leftover 3.part from an aborted
    // wider upload) must NOT leak bytes into the merged file
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "000000.part"), "STALE0\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "000003.part"), "STALE3\n")
    Sources.mergeParts(spark, dir, target, totalParts = Some(2))
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(target)) === "url,text\na,b\nc,d\n")
    // two filenames parsing to the same part number -> loud failure, not
    // double-concatenated bytes
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "1.part"), "DUP\n")
    val dupErr = intercept[IllegalArgumentException] {
      Sources.mergeParts(spark, dir, target, totalParts = Some(2))
    }
    assert(dupErr.getMessage.contains("Duplicate part numbers: 1"))
  }

  test("mergeParts without a declared count rejects gaps and duplicates") {
    def freshDir() = java.nio.file.Files.createTempDirectory("graft-parts-nd").toString
    // contiguous 1..2 -> merged
    val ok = freshDir()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(ok, "1.part"), "a\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(ok, "2.part"), "b\n")
    Sources.mergeParts(spark, ok, s"$ok/m.csv")
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(ok, "m.csv")) === "a\nb\n")
    // a stale high-numbered leftover (gap) -> loud failure, not silent concat
    val gap = freshDir()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(gap, "1.part"), "a\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(gap, "7.part"), "STALE\n")
    val gapErr = intercept[IllegalArgumentException] {
      Sources.mergeParts(spark, gap, s"$gap/m.csv")
    }
    assert(gapErr.getMessage.contains("Missing parts"))
    // duplicate numbering -> loud failure
    val dup = freshDir()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dup, "1.part"), "a\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dup, "000001.part"), "a\n")
    val dupErr2 = intercept[IllegalArgumentException] {
      Sources.mergeParts(spark, dup, s"$dup/m.csv")
    }
    assert(dupErr2.getMessage.contains("Duplicate part numbers"))
  }
}
