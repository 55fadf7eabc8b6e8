package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Candidate, CandidateType, RankingEntry}
import graft.operators.Decision

/** Port of /root/reference/tests/test_llm_response_parsing.py:15-188 (the
  * reference's 10 decision-semantics cases), asserting the behavior of the
  * reference CODE. Note: the reference's own
  * test_enrich_candidate_ranking_adds_metadata expects score 0.55 to be
  * accepted, but its shipped predict rule (lion_linker.py:731) requires band
  * HIGH (>= 0.70) — that test fails against its own code (verified by
  * execution). We assert the code's behavior (NIL) and cover the enrichment
  * assertions with an explicit predicted id.
  */
class DecisionSpec extends AnyFunSuite {

  test("parse valid top5 payload") {
    val resp =
      """{"candidate_ranking":[
        |  {"id":"Q42","score":0.92},{"id":"Q123","score":0.63},{"id":"Q999","score":0.31},
        |  {"id":"Q777","score":0.24},{"id":"Q888","score":0.18}],
        | "nil_score":0.12,
        | "explanation":"Top candidates closely match the mention context."}""".stripMargin
    val Right(p) = Decision.parseLlmJson(resp, 5)
    assert(p.ranking.size == 5)
    assert(math.abs(p.nilScore.get - 0.12) < 1e-9)
    assert(p.explanation.nonEmpty)
    assert(p.ranking.head == RankingEntry("Q42", Some(0.92)))
  }

  test("parse sorts by score") {
    val resp =
      """{"candidate_ranking":[{"id":"Q2","score":0.4},{"id":"Q1","score":0.9}],
        | "explanation":"Q1 scored higher confidence than Q2."}""".stripMargin
    val Right(p) = Decision.parseLlmJson(resp, 5)
    assert(p.nilScore.isEmpty)
    assert(p.ranking.map(_.id) == List("Q1", "Q2"))
  }

  test("parse allows NIL entry") {
    val resp =
      """{"candidate_ranking":[{"id":"NIL","score":0.8}],
        | "explanation":"No provided candidate matched the context."}""".stripMargin
    val Right(p) = Decision.parseLlmJson(resp, 5)
    assert(p.ranking.isEmpty)
    assert(p.nilScore.isEmpty)
    assert(p.explanation == "No provided candidate matched the context.")
  }

  test("parse requires score") {
    val resp =
      """{"candidate_ranking":[{"id":"Q1"}],
        | "explanation":"Missing confidence score triggers a failure."}""".stripMargin
    assert(Decision.parseLlmJson(resp, 5).isLeft)
  }

  test("parse rejects unexpected keys") {
    val resp =
      """{"candidate_ranking":[],"answer":"Q42","explanation":"Contains an unexpected key."}"""
    assert(Decision.parseLlmJson(resp, 5).isLeft)
  }

  test("parse requires explanation") {
    val resp = """{"candidate_ranking":[{"id":"Q1","score":0.8}]}"""
    assert(Decision.parseLlmJson(resp, 5).isLeft)
  }

  test("parse handles nil_score and explanation in NIL mode") {
    val resp =
      """{"candidate_ranking":[{"id":"NIL","score":0.9},{"id":"Q1","score":null}],
        | "nil_score":0.88,
        | "explanation":"Mention clearly references no known entity."}""".stripMargin
    val Right(p) = Decision.parseLlmJson(resp, 5)
    assert(p.ranking.head.id == "Q1")
    assert(p.ranking.head.score.isEmpty)
    assert(math.abs(p.nilScore.get - 0.88) < 1e-9)
    assert(p.explanation == "Mention clearly references no known entity.")
  }

  test("predict requires high confidence") {
    assert(Decision.determinePredictedIdentifier(List(RankingEntry("Q1", Some(0.7))), None) == "Q1")
    assert(Decision.determinePredictedIdentifier(List(RankingEntry("Q1", Some(0.3))), None) == "NIL")
    assert(Decision.determinePredictedIdentifier(List(RankingEntry("NIL", Some(0.9))), None) == "NIL")
  }

  test("predict: nil_score dominates; thresholds; mixed cases") {
    // nil_score >= max(score, threshold) -> NIL (py:728-729)
    assert(Decision.determinePredictedIdentifier(List(RankingEntry("Q1", Some(0.8))), Some(0.9)) == "NIL")
    assert(Decision.determinePredictedIdentifier(List(RankingEntry("Q1", Some(0.8))), Some(0.5)) == "Q1")
    // null score -> label None -> NIL even above threshold
    assert(Decision.determinePredictedIdentifier(List(RankingEntry("Q1", None)), None) == "NIL")
    // empty ranking -> NIL
    assert(Decision.determinePredictedIdentifier(Nil, None) == "NIL")
    // the reference-code behavior its own test contradicts: 0.55 is MEDIUM -> NIL
    assert(
      Decision.determinePredictedIdentifier(
        List(RankingEntry("Q1", Some(0.55)), RankingEntry("Q2", Some(0.45))),
        None
      ) == "NIL"
    )
  }

  test("enrich adds metadata and match flags") {
    val entries = List(RankingEntry("Q1", Some(0.55)), RankingEntry("Q2", Some(0.45)))
    val candidates = List(
      Candidate("Q1", "Alpha", "First", Seq(CandidateType(null, "Person"))),
      Candidate("Q2", "Beta", "Second", Seq(CandidateType(null, "Organization")))
    )
    // per the shipped predict rule 0.55 -> NIL (see class doc); enrichment
    // behavior under an accepted id is asserted with an explicit "Q1"
    val enriched = Decision.enrichCandidateRanking(entries, candidates, "Q1")
    assert(enriched.head.matched)
    assert(!enriched(1).matched)
    assert(enriched.head.types == List(CandidateType("", "Person")))
    assert(enriched.head.name == "Alpha")
    // and under the code's actual prediction, nothing matches and scores null out
    val predicted = Decision.determinePredictedIdentifier(entries, None)
    assert(predicted == "NIL")
    val nilEnriched = Decision.enrichCandidateRanking(entries, candidates, predicted)
    assert(!nilEnriched.exists(_.matched))
    assert(nilEnriched.forall(_.score.isEmpty))
  }

  test("enrich handles NIL top") {
    val entries = List(RankingEntry("Q1", None))
    val predicted = Decision.determinePredictedIdentifier(entries, None)
    assert(predicted == "NIL")
    val enriched = Decision.enrichCandidateRanking(entries, Nil, predicted)
    assert(!enriched.exists(_.matched))
  }

  test("validate: dedup case-insensitive, trim to k, mixed null+numeric errors") {
    import Decision.RawEntry
    val dup = List(
      RawEntry(Some("Q1"), Some(Some(0.9))),
      RawEntry(Some("q1"), Some(Some(0.8))),
      RawEntry(Some("Q2"), Some(Some(0.7)))
    )
    val Right(d) = Decision.validateCandidateRanking(dup, 3)
    assert(d.map(_.id) == List("Q1", "Q2"))

    val mixed = List(RawEntry(Some("Q1"), Some(None)), RawEntry(Some("Q2"), Some(Some(0.5))))
    assert(Decision.validateCandidateRanking(mixed, 5).isLeft)

    // NIL entry flips nil-mode: all scores nulled, input order kept
    val nilMode = List(
      RawEntry(Some("Q2"), Some(Some(0.1))),
      RawEntry(Some("NIL"), Some(Some(0.9))),
      RawEntry(Some("Q1"), Some(Some(0.8)))
    )
    val Right(n) = Decision.validateCandidateRanking(nilMode, 5)
    assert(n.map(_.id) == List("Q2", "Q1")) // input order, not score order
    assert(n.forall(_.score.isEmpty))

    // invalid topK
    assert(Decision.validateCandidateRanking(Nil, 4).isLeft)
    // out-of-range score
    assert(Decision.validateCandidateRanking(List(RawEntry(Some("Q1"), Some(Some(1.5)))), 5).isLeft)
  }
}
