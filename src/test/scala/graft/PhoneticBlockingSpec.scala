package graft

import graft.operators.PhoneticBlocking
import org.apache.spark.sql.functions._

class PhoneticBlockingSpec extends SparkSpec {
  import spark.implicits._

  private def key(text: String): String =
    PhoneticBlocking(2)
      .keys(Seq(("u1", text)).toDF("url", "text"))
      .select("key")
      .as[String]
      .collect()(0)

  test("published soundex pairs share a block key") {
    assert(key("Robert Smith") === key("Rupert Smyth")) // R163 | S530
    assert(key("catherine jones") === key("cathryn janes"))
    assert(key("Robert Smith") !== key("Bob Smith"))
  }

  test("key carries the p: prefix and both token codes") {
    assert(key("Robert Smith") === "p:|R163|S530")
  }

  test("short/blank texts still produce a stable key (no ANSI element_at throw)") {
    assert(key("solo") === key("solo"))
    val blank = PhoneticBlocking(2).keys(Seq(("u1", "   ")).toDF("url", "text")).count()
    assert(blank === 1L)
  }
}
