package graft

import org.apache.spark.sql.functions._

import graft.pipeline.CorpusPipeline

class CorpusPipelineSpec extends SparkSpec {

  test("corpus build: gate, exact dedup, span dedup, split compose with honest counts") {
    import spark.implicits._
    val good = (1 to 40).map(i => s"w$i").mkString(" ")
    val pages = Seq(
      ("u1", good), // canonical of the exact-dup pair (min url)
      ("u2", good), // exact dup -> dropped
      ("u3", (1 to 40).map(i => s"x$i").mkString(" ") + " " + good), // shares a >=8-word span with u1
      ("u4", "too short to pass") // gate drop
    ).toDF("url", "text")
    val cfg = CorpusPipeline.Config(
      minTokens = 10,
      windowWords = 8,
      splits = Seq("train" -> 0.5, "test" -> 0.5)
    )
    val res = CorpusPipeline.run(pages, cfg)
    val rows = res.cleaned.collect().map(r => r.getAs[String]("url") -> r).toMap
    assert(res.docsIn == 4 && res.kept == 3 && res.canonical == 2)
    assert(rows.keySet == Set("u1", "u3"), rows.keySet.toString)
    // u2 was REMOVED by exact dedup before span dedup, so the shared span
    // between u1 and u3 is the only surviving duplication: all 40 good
    // words leave both docs
    assert(rows("u1").getAs[Long]("n_removed") == 40L)
    assert(rows("u3").getAs[Long]("n_removed") == 40L)
    assert(res.removedWords == 80L)
    assert(rows("u3").getAs[String]("text_clean") == (1 to 40).map(i => s"x$i").mkString(" "))
    assert(Set("train", "test").contains(rows("u1").getAs[String]("split")))
    res.release()
  }

  test("parseSplits") {
    assert(
      graft.cli.Curate.parseSplits("train=0.8,valid=0.1,test=0.1") ==
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    )
    intercept[RuntimeException](graft.cli.Curate.parseSplits("oops"))
  }
}
