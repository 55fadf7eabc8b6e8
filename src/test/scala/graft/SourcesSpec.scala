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
