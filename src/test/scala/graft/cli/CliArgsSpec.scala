package graft.cli

import org.scalatest.funsuite.AnyFunSuite

/** Strict CLI argument parsing: a malformed flag list must die loudly —
  * the sliding-pairs parser it replaces silently re-paired everything
  * after a value-less flag (--monitor --input X dropped the input and ran
  * the synth default with exit 0).
  */
class CliArgsSpec extends AnyFunSuite {

  test("well-formed flag/value pairs parse in order") {
    val m = Main.parseArgs(Array("--input", "/data/p", "--monitor", "true", "--threshold", "0.7"))
    assert(m === Map("input" -> "/data/p", "monitor" -> "true", "threshold" -> "0.7"))
  }

  test("a flag without a value is a loud error, not silent re-pairing") {
    val e = intercept[IllegalArgumentException] {
      Main.parseArgs(Array("--monitor", "--input", "/data/p"))
    }
    assert(e.getMessage.contains("--monitor"))
  }

  test("a trailing value-less flag errors") {
    val e = intercept[IllegalArgumentException] {
      Main.parseArgs(Array("--input", "/data/p", "--monitor"))
    }
    assert(e.getMessage.contains("--monitor"))
  }

  test("--flag=value is the escape hatch for values that start with --") {
    val m = Main.parseArgs(Array("--output=--weird-dir", "--input", "/data/p", "--threshold=0.8"))
    assert(m === Map("output" -> "--weird-dir", "input" -> "/data/p", "threshold" -> "0.8"))
  }

  test("a bare value with no flag errors") {
    val e = intercept[IllegalArgumentException] {
      Main.parseArgs(Array("/data/p", "--input", "/x"))
    }
    assert(e.getMessage.contains("/data/p"))
  }

  test("inputSignature: synth specs sign by spec string, missing paths as absent") {
    // no Spark needed for the synth branch; missing-path branch needs a
    // session only for hadoopConfiguration — covered in CliSpec e2e
    assert(Main.inputSignature(null, "synth:2000") === "synth:2000")
  }

  test("inputSignature changes when the input files change (resume staleness guard)") {
    val spark = graft.SharedSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sig").toString
    Seq(("u1", "old text")).toDF("url", "text").write.mode("overwrite").parquet(dir)
    val sig1 = Main.inputSignature(spark, dir)
    assert(sig1 !== "absent")
    Seq(("u1", "completely different crawl"), ("u2", "more")).toDF("url", "text")
      .write.mode("overwrite").parquet(dir)
    val sig2 = Main.inputSignature(spark, dir)
    assert(sig1 !== sig2, "overwritten input must change the resume signature")
    assert(Main.inputSignature(spark, s"$dir-does-not-exist") === "absent")
  }
}
