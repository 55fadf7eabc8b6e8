package graft

import graft.operators.SuffixBlocking

class SuffixBlockingSpec extends SparkSpec {
  import spark.implicits._

  private def keysOf(text: String, minLen: Int = 4, cap: Int = 16): Seq[String] =
    SuffixBlocking(minLen, cap)
      .keys(Seq(("u1", text)).toDF("url", "text"))
      .select("key")
      .as[String]
      .collect()
      .toSeq
      .sorted

  test("prefixed variants share suffix keys that exact/phonetic blocking miss") {
    val a = keysOf("Jonathan Smith")
    val b = keysOf("Nathan Jones")
    assert(a.contains("x:jonathan") && b.contains("x:nathan"))
    val shared = a.toSet intersect b.toSet
    assert(shared === Set("x:nathan", "x:athan", "x:than"), s"shared=$shared")
  }

  test("suffixes come longest-first and the cap keeps the most specific keys") {
    val k = keysOf("abcdefgh", minLen = 4, cap = 3)
    // 5 suffixes of length >= 4 exist; the cap keeps the 3 LONGEST
    assert(k.toSet === Set("x:abcdefgh", "x:bcdefgh", "x:cdefgh"))
    assert(keysOf("abcdefgh", minLen = 4, cap = 16).size === 5)
  }

  test("short, blank, and whitespace-only texts emit zero keys without throwing") {
    assert(keysOf("abc") === Seq.empty) // below minSuffixLen
    assert(keysOf("") === Seq.empty)
    assert(keysOf("   ") === Seq.empty)
  }

  test("degenerate parameters are rejected") {
    intercept[IllegalArgumentException](SuffixBlocking(0))
    intercept[IllegalArgumentException](SuffixBlocking(4, 0))
  }
}
