package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.DecisionOps

/** Data-plane decision operator: the DecisionSpec semantics (port of
  * /root/reference/tests/test_llm_response_parsing.py) run DISTRIBUTED over
  * a (task_id, response, candidates) frame via DecisionOps.run.
  */
class DecisionOpsSpec extends SparkSpec {

  private def cand(id: String, name: String, desc: String, types: Seq[(String, String)]) =
    Row(id, name, desc, types.map { case (i, n) => Row(i, n) })

  private val candSchema =
    "array<struct<id:string,name:string,description:string,types:array<struct<id:string,name:string>>>>"

  private def runCases(cases: Seq[(String, String, Seq[Row])], topK: Int = 5) = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      s"task_id STRING, response STRING, candidates $candSchema"
    )
    val df = spark.createDataFrame(
      cases.map { case (t, r, c) => Row(t, r, c) }.asJava,
      schema
    )
    DecisionOps
      .run(df, "task_id", "response", "candidates", topK)
      .collect()
      .map(r => r.getAs[String]("task_id") -> r)
      .toMap
  }

  private val defaultCands = Seq(
    cand("Q1", "Alpha", "First", Seq((null, "Person"))),
    cand("Q2", "Beta", "Second", Seq((null, "Organization"))),
    cand("Q3", "Gamma", "Third", Nil)
  )

  test("accepts a HIGH top candidate, sorts, pads from candidates, joins metadata") {
    val resp =
      """{"candidate_ranking":[{"id":"Q2","score":0.4},{"id":"Q1","score":0.9}],
        | "nil_score":0.12, "explanation":"Q1 scored higher."}""".stripMargin
    val out = runCases(Seq(("t1", resp, defaultCands)))("t1")
    assert(out.getAs[String]("predicted_id") == "Q1")
    assert(out.getAs[String]("error") == null)
    val ranking = out.getSeq[Row](out.fieldIndex("ranking"))
    // sorted by score desc, then padded with Q3 (unseen candidate)
    assert(ranking.map(_.getAs[String]("id")) == Seq("Q1", "Q2", "Q3"))
    assert(ranking.head.getAs[Double]("score") == 0.9)
    assert(ranking.head.getAs[Boolean]("matched"))
    assert(!ranking(1).getAs[Boolean]("matched"))
    assert(ranking.head.getAs[String]("name") == "Alpha")
    assert(ranking(2).getAs[String]("name") == "Gamma")
    assert(ranking(2).isNullAt(ranking(2).fieldIndex("score"))) // pad has no score
    // null-id type was kept (name non-empty) and trimmed to ""
    val types = ranking.head.getSeq[Row](ranking.head.fieldIndex("types"))
    assert(types.map(t => (t.getString(0), t.getString(1))) == Seq(("", "Person")))
  }

  test("MEDIUM top score predicts NIL and wipes scores") {
    val resp =
      """{"candidate_ranking":[{"id":"Q1","score":0.55},{"id":"Q2","score":0.45}],
        | "explanation":"Medium confidence."}""".stripMargin
    val out = runCases(Seq(("t1", resp, defaultCands)))("t1")
    assert(out.getAs[String]("predicted_id") == "NIL")
    val ranking = out.getSeq[Row](out.fieldIndex("ranking"))
    assert(ranking.map(_.getAs[String]("id")) == Seq("Q1", "Q2", "Q3"))
    assert(ranking.forall(_.isNullAt(1))) // all scores nulled under NIL
    assert(!ranking.exists(_.getAs[Boolean]("matched")))
  }

  test("nil_score dominance and NIL-mode ordering") {
    val dominated =
      """{"candidate_ranking":[{"id":"Q1","score":0.8}], "nil_score":0.9,
        | "explanation":"NIL more likely."}""".stripMargin
    val nilMode =
      """{"candidate_ranking":[{"id":"NIL","score":0.9},{"id":"Q1","score":null}],
        | "nil_score":0.88, "explanation":"No entity."}""".stripMargin
    val out = runCases(Seq(("t1", dominated, defaultCands), ("t2", nilMode, defaultCands)))
    assert(out("t1").getAs[String]("predicted_id") == "NIL")
    assert(out("t2").getAs[String]("predicted_id") == "NIL")
    assert(math.abs(out("t2").getAs[Double]("nil_score") - 0.88) < 1e-9)
    val r2 = out("t2").getSeq[Row](out("t2").fieldIndex("ranking"))
    assert(r2.map(_.getAs[String]("id")) == Seq("Q1", "Q2", "Q3")) // input order + pad
  }

  test("parse errors surface in error column; ranking backfills from candidates") {
    val cases = Seq(
      ("bad_json", "not json at all", defaultCands),
      ("extra_key", """{"candidate_ranking":[],"answer":"Q42","explanation":"x"}""", defaultCands),
      ("range", """{"candidate_ranking":[{"id":"Q1","score":1.5}],"explanation":"x"}""", defaultCands),
      ("no_expl", """{"candidate_ranking":[{"id":"Q1","score":0.8}]}""", defaultCands)
    )
    val out = runCases(cases)
    out.values.foreach { r =>
      assert(r.getAs[String]("predicted_id") == "NIL")
      assert(r.getAs[String]("error") != null)
      // degraded rows still enrich: first-k candidate backfill, null scores
      val ranking = r.getSeq[Row](r.fieldIndex("ranking"))
      assert(ranking.map(_.getAs[String]("id")) == Seq("Q1", "Q2", "Q3"))
      assert(ranking.forall(_.isNullAt(1)))
    }
    assert(out("extra_key").getAs[String]("error").contains("unexpected top-level keys"))
    assert(out("range").getAs[String]("error").contains("within [0, 1]"))
  }

  test("case-insensitive dedup + trim to k against driver-side port") {
    val resp =
      """{"candidate_ranking":[{"id":"Q1","score":0.9},{"id":"q1","score":0.8},
        | {"id":"Q2","score":0.7},{"id":"Q4","score":0.6}],
        | "explanation":"dup"}""".stripMargin
    val out = runCases(Seq(("t1", resp, defaultCands)), topK = 3)("t1")
    val ranking = out.getSeq[Row](out.fieldIndex("ranking"))
    assert(ranking.map(_.getAs[String]("id")) == Seq("Q1", "Q2", "Q4"))
    // Q4 not in candidates: enriched with empty metadata
    assert(ranking(2).getAs[String]("name") == "")
    // cross-check the distributed result against the exact driver-side port
    val Right(p) = graft.operators.Decision.parseLlmJson(resp, 3)
    assert(ranking.take(2).map(_.getAs[String]("id")) == p.ranking.take(2).map(_.id))
  }

  test("S12 export flatten: candidate_ranking payload added, metadata dropped") {
    import spark.implicits._
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val answer =
      """{"candidate_ranking":[{"id":"Q2","score":0.4},{"id":"Q1","score":0.9}],
        | "explanation":"Q1 best."}""".stripMargin
    val metadata =
      """[{"id":"Q1","name":"Alpha","description":"First","types":[{"id":null,"name":"Person"},"RawType"]},
        | {"id":"Q2","name":"Beta","description":"","types":[]}]""".stripMargin
    val df = Seq(
      ("r1", answer, metadata, "Q1"),
      ("r2", "not json", metadata, "NIL"), // lenient: bad answer -> backfill
      ("r3", null: String, null: String, null: String) // all absent
    ).toDF("row_id", "title_llm_answer", "title_candidate_metadata", "title_pred_id")
    val out = DecisionOps.exportPredictions(df, Seq("title"), rankingSize = 3)
    assert(!out.columns.contains("title_candidate_metadata"), "metadata cols must drop")
    assert(out.columns.contains("title_candidate_ranking"))
    val rows = out.collect().map(r => r.getAs[String]("row_id") -> r.getAs[String]("title_candidate_ranking")).toMap

    val p1 = JsonMethods.parse(rows("r1"))
    val ids1 = (p1 \ "candidate_ranking" \\ classOf[JString]).collect { case s: String => s }
    val entries1 = (p1 \ "candidate_ranking") match { case JArray(items) => items; case _ => Nil }
    assert(entries1.map(e => (e \ "id").asInstanceOf[JString].s) == List("Q1", "Q2"))
    assert((entries1.head \ "match") == JBool(true))
    assert((entries1.head \ "name") == JString("Alpha"))
    // bare-string type becomes {"id":"","name":"RawType"} (py:846)
    val types1 = (entries1.head \ "types") match { case JArray(ts) => ts; case _ => Nil }
    assert(types1.contains(JObject("id" -> JString(""), "name" -> JString("RawType"))))
    assert((p1 \ "explanation") == JString("Q1 best."))

    // lenient path: unparseable answer -> candidate backfill, null scores,
    // fallback explanation
    val p2 = JsonMethods.parse(rows("r2"))
    val entries2 = (p2 \ "candidate_ranking") match { case JArray(items) => items; case _ => Nil }
    assert(entries2.map(e => (e \ "id").asInstanceOf[JString].s) == List("Q1", "Q2"))
    assert(entries2.forall(e => (e \ "score") == JNull))
    assert((p2 \ "explanation") == JString(graft.operators.Decision.DefaultExplanationFallback))

    // fully absent inputs: empty ranking, fallback explanation
    val p3 = JsonMethods.parse(rows("r3"))
    assert((p3 \ "candidate_ranking") == JArray(Nil))
  }

  test("NULL candidates column degrades like empty, never nulls the ranking") {
    val resp =
      """{"candidate_ranking":[{"id":"Q1","score":0.9}], "explanation":"hi"}"""
    val out = runCases(Seq(("t1", resp, null)))("t1")
    assert(out.getAs[String]("predicted_id") == "Q1")
    val ranking = out.getSeq[Row](out.fieldIndex("ranking"))
    assert(ranking.map(_.getAs[String]("id")) == Seq("Q1"))
  }

  test("case-colliding candidate ids follow the dict-overwrite semantics") {
    // python: lookup["ABC"]=First, lookup["ABC"(upper of abc)]=Second — the
    // later candidate's upper write overwrites, so entry "ABC" sees Second
    val cands = Seq(
      cand("ABC", "First", "d1", Nil),
      cand("abc", "Second", "d2", Nil)
    )
    val resp = """{"candidate_ranking":[{"id":"ABC","score":0.9}], "explanation":"x"}"""
    val out = runCases(Seq(("t1", resp, cands)), topK = 3)("t1")
    val ranking = out.getSeq[Row](out.fieldIndex("ranking"))
    assert(ranking.head.getAs[String]("name") == "Second")
    // cross-check against the exact driver-side port
    import graft.model.{Candidate, RankingEntry}
    val driver = graft.operators.Decision.enrichCandidateRanking(
      List(RankingEntry("ABC", Some(0.9))),
      List(Candidate("ABC", "First", "d1", Nil), Candidate("abc", "Second", "d2", Nil)),
      "ABC",
      3
    )
    assert(driver.head.name == ranking.head.getAs[String]("name"))
  }

  test("no candidates + NIL prediction: ranking survives without metadata") {
    val resp =
      """{"candidate_ranking":[{"id":"Q9","score":0.2}], "explanation":"low"}"""
    val out = runCases(Seq(("t1", resp, Nil)))("t1")
    assert(out.getAs[String]("predicted_id") == "NIL")
    val ranking = out.getSeq[Row](out.fieldIndex("ranking"))
    assert(ranking.map(_.getAs[String]("id")) == Seq("Q9"))
    assert(ranking.head.getAs[String]("name") == "")
  }
}
