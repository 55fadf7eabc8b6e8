package graft

import graft.functions.Normalize
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextSignalsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u)
      .toDF("u")
      .select(Normalize.urlNormalize(col("u")).as("c"))
      .as[String]
      .collect()(0)

  test("urlNormalize: each rule") {
    // case + default port + tracking strip + param sort + fragment
    assert(
      canon("HTTP://Example.COM:80/path/x?utm_source=a&b=2&a=1#frag") ===
        "http://example.com/path/x?a=1&b=2"
    )
    assert(canon("https://CDN.Site.org:443/a/b") === "https://cdn.site.org/a/b")
    // non-default port kept; gclid dropped
    assert(canon("https://h.net:8443/x?gclid=1&z=9&y=0") === "https://h.net:8443/x?y=0&z=9")
    // all-tracking query vanishes entirely
    assert(canon("http://Host.com/x?fbclid=abc&utm_medium=m") === "http://host.com/x")
    // bare host gains the root path; whitespace trimmed
    assert(canon("  http://Bare.com  ") === "http://bare.com/")
    // http on 443 is NOT default -> kept (and vice versa)
    assert(canon("http://a.com:443/p") === "http://a.com:443/p")
    assert(canon("https://a.com:80/p") === "https://a.com:80/p")
    // non-URL passes through trimmed
    assert(canon(" plain text ") === "plain text")
    // utm_ prefix matched literally, not as a LIKE pattern
    assert(canon("http://a.com/p?utmx=1") === "http://a.com/p?utmx=1")
  }

  test("duplicateLineSignals: hand-computed fractions") {
    val lines = Seq((1L, Seq("aa", "bb", "aa", "cc", "aa", "bb")))
    val r = lines
      .toDF("id", "lines")
      .select(TextAnalysis.duplicateLineSignals(col("lines")).as("s"))
      .select("s.n_lines", "s.dup_line_frac", "s.dup_line_char_frac")
      .as[(Long, Double, Double)]
      .collect()(0)
    // 6 lines; repeats: aa twice more, bb once more -> 3/6; chars 6/12
    assert(r._1 === 6L)
    assert(r._2 === 0.5)
    assert(r._3 === 0.5)
  }

  test("duplicateLineSignals: no dups and single-line edge cases") {
    val rows = Seq((1L, Seq("a", "b", "c")), (2L, Seq("solo")), (3L, Seq.empty[String]))
    val got = rows
      .toDF("id", "lines")
      .select(col("id"), TextAnalysis.duplicateLineSignals(col("lines")).as("s"))
      .select(col("id"), col("s.n_lines"), col("s.dup_line_frac"))
      .as[(Long, Long, Double)]
      .collect()
      .sortBy(_._1)
    assert(got(0) === ((1L, 3L, 0.0)))
    assert(got(1) === ((2L, 1L, 0.0)))
    assert(got(2) === ((3L, 0L, 0.0)))
  }

  test("tokenChunks: width-2 chunking with odd tail") {
    val got = Seq((1L, Seq("a", "b", "c", "d", "e")))
      .toDF("id", "toks")
      .select(TextAnalysis.tokenChunks(col("toks"), 2).as("c"))
      .as[Seq[String]]
      .collect()(0)
    assert(got === Seq("a b", "c d", "e"))
  }
}
