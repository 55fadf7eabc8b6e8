package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Sources

class SourcesSpec extends SparkSpec {

  test("inline table source validates width and injects row_id") {
    val df = Sources.inlineTable(spark, Seq("title", "year"), Seq(Seq("A", "2001"), Seq("B", "2002")))
    assert(df.columns.toSeq == Seq("row_id", "title", "year"))
    assert(df.count() == 2)
    assert(df.where(col("row_id") === 0 && col("title") === "A").count() == 1)
    intercept[IllegalArgumentException] {
      Sources.inlineTable(spark, Seq("a", "b"), Seq(Seq("only-one")))
    }
  }

  test("csv sink quotes all fields and round-trips") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-csv").toString + "/out"
    val df = Seq(("a,b", "with \"quote\""), ("plain", "x\ny")).toDF("c1", "c2")
    Sources.csvSink(df, dir)
    val raw = spark.read.text(dir).collect().map(_.getString(0)).mkString("\n")
    assert(raw.contains("\"plain\""), "quoteAll must quote unquoted fields too")
    val back = spark.read
      .option("header", true).option("escape", "\\").option("multiLine", true)
      .csv(dir)
    assert(back.count() == 2)
    assert(back.where(col("c1") === "a,b").count() == 1)
  }

  test("sha cache key + hit/miss split + upsert-on-read") {
    import spark.implicits._
    val reqs = Seq(("m1", 10), ("m2", 10), ("m3", 10))
      .toDF("mention", "k")
      .withColumn("key", Sources.cacheKey(col("mention"), col("k")))
    val cache = Seq(("m1", 10, "cached-payload"))
      .toDF("mention", "k", "payload")
      .withColumn("key", Sources.cacheKey(col("mention"), col("k")))
      .select("key", "payload")
    val (hits, misses) = Sources.cacheSplit(reqs, cache, "key")
    assert(hits.count() == 1 && hits.collect()(0).getAs[String]("payload") == "cached-payload")
    assert(misses.count() == 2)

    // upsert-on-read: append two generations of one key, latest seq wins
    val dir = Files.createTempDirectory("graft-cache").toString + "/cache"
    Seq(("k1", "old", 1L), ("k2", "keep", 2L)).toDF("key", "payload", "seq")
      .write.mode("append").parquet(dir)
    Seq(("k1", "new", 3L)).toDF("key", "payload", "seq")
      .write.mode("append").parquet(dir)
    val cached = Sources.readCache(spark, dir, "key").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[String]("payload")).toMap
    assert(cached == Map("k1" -> "new", "k2" -> "keep"))
  }

  test("forced-id cache invalidation degrades stale hits to misses") {
    import spark.implicits._
    // m1: cache covers forced ids -> hit; m2: forced id missing from cached
    // candidate set -> miss (refetch, retrievers.py:77-89); m3: no forced
    // ids -> plain hit; m4: not cached -> miss
    val reqs = Seq(
      ("k1", Seq("Q1")),
      ("k2", Seq("Q9")),
      ("k3", Seq.empty[String]),
      ("k4", Seq.empty[String])
    ).toDF("key", "forced_ids")
    val cache = Seq(
      ("k1", Seq("Q1", "Q2"), "p1"),
      ("k2", Seq("Q1"), "p2"),
      ("k3", Seq("Q5"), "p3")
    ).toDF("key", "candidate_ids", "payload")
    val (hits, misses) = Sources.cacheSplitForced(reqs, cache, "key", "forced_ids", "candidate_ids")
    assert(hits.select("key").collect().map(_.getString(0)).toSet == Set("k1", "k3"))
    assert(misses.select("key").collect().map(_.getString(0)).toSet == Set("k2", "k4"))
    assert(misses.columns.toSeq == reqs.columns.toSeq, "misses carry request columns only")
  }

  test("base64url cursor codec round-trips and rejects malformed input") {
    import spark.implicits._
    import graft.functions.Cursor
    val df = Seq(("job-1", 0L), ("job-2", 12345L), ("j", 7L)).toDF("job_id", "seq")
    val enc = df.withColumn("cursor", Cursor.encode(col("job_id"), col("seq")))
    val cursors = enc.select("cursor").collect().map(_.getString(0))
    // urlsafe alphabet, no padding (routes.py:40-43)
    assert(cursors.forall(c => !c.contains("=") && !c.contains("+") && !c.contains("/")))
    val dec = enc
      .withColumn("d", Cursor.decode(col("cursor")))
      .select(col("job_id"), col("seq"), col("d.job_id").as("jid2"), col("d.seq").as("seq2"))
      .collect()
    dec.foreach { r =>
      assert(r.getString(0) == r.getString(2) && r.getLong(1) == r.getLong(3))
    }
    // python-compatible payload: matches base64.urlsafe_b64encode(json.dumps(...))
    val one = enc.where(col("job_id") === "job-2").select("cursor").collect()(0).getString(0)
    val expected = java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString("""{"job_id": "job-2", "seq": 12345}""".getBytes("UTF-8"))
    assert(one == expected)
    // job ids with JSON-special chars round-trip (json.dumps escapes them)
    val special = Seq(("job\"q\\x", 9L)).toDF("job_id", "seq")
      .withColumn("cursor", Cursor.encode(col("job_id"), col("seq")))
      .withColumn("d", Cursor.decode(col("cursor")))
      .select("job_id", "d.job_id", "d.seq")
      .collect()(0)
    assert(special.getString(0) == special.getString(1) && special.getLong(2) == 9L)
    // malformed cursor decodes to null, not an exception (routes.py:49-55)
    val bad = Seq("!!!not-base64!!!", "").toDF("cursor")
      .select(graft.functions.Cursor.decode(col("cursor")).as("d"))
      .collect()
    assert(bad.forall(r => r.isNullAt(0) || r.getStruct(0).isNullAt(0)))
  }

  test("run-log sink appends with run_id + monotone seq + created_at") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-runlog").toString + "/log"
    val logA = new graft.io.RunLog(dir, runId = "runA")
    logA.append(Seq(("u1", "x"), ("u2", "y")).toDF("id", "v"))
    logA.append(Seq(("u3", "z")).toDF("id", "v"))
    val logB = new graft.io.RunLog(dir, runId = "runB")
    logB.append(Seq(("u9", "q")).toDF("id", "v"))
    val all = logA.read(spark)
    assert(all.count() == 4)
    assert(all.columns.contains("created_at") && all.columns.contains("run_id"))
    // monotone seq within runA across batches (result_store.py:92-103)
    val aSeqs = logA.readRun(spark).select("seq").collect().map(_.getLong(0)).toSeq
    assert(aSeqs == Seq(0L, 1L, 2L))
    assert(logB.readRun(spark).select("seq").collect().map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("csv scan with explicit schema") {
    val dir = Files.createTempDirectory("graft-scan").toString + "/in"
    import spark.implicits._
    Seq(("x", "1")).toDF("name", "n").write.option("header", true).csv(dir)
    val schema = StructType(Seq(StructField("name", StringType), StructField("n", StringType)))
    val df = Sources.csvScan(spark, dir, schema)
    assert(df.schema == schema)
    assert(df.count() == 1)
  }
}
