package graft.operators

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model.{Candidate, CandidateType, EnrichedEntry, RankingEntry}

/** Exact port of the reference's decision semantics (SURVEY.md §2.9):
  * ranking validation, payload parsing, prediction rule and enrichment —
  * /root/reference/lion_linker/lion_linker.py:383-544 (validate/parse),
  * :702-734 (predict), :736-854 (enrich).
  *
  * Faithful to the CODE, which is authoritative over the reference's test
  * suite: its test_enrich_candidate_ranking_adds_metadata expects a 0.55
  * score to be accepted, but the shipped predict rule requires band HIGH
  * (score >= 0.70) — the reference's own test fails against its own code
  * (verified by running it). We mirror the code.
  *
  * Errors are surfaced as Left(message) (the reference raises ValueError);
  * the pipeline degrades failures to the NIL payload exactly like
  * lion_linker.py:1063-1070.
  */
object Decision {

  val AllowedRankingSizes: Set[Int] = Set(3, 5) // lion_linker.py:59
  val DefaultExplanationFallback = "LLM response did not include an explanation."
  val RankingKey = "candidate_ranking"

  final case class ParsedPayload(
      ranking: List[RankingEntry],
      nilScore: Option[Double],
      explanation: String
  )

  /** lion_linker.py:383-487. `entries` uses None for a missing 'score' key
    * vs Some(None) for an explicit null — mirrored here as
    * score: Option[Option[Double]] via RawEntry.
    */
  final case class RawEntry(
      id: Option[Any],
      /** None = key absent; Some(None) = JSON null; Some(Some(x)) = number */
      score: Option[Option[Double]],
      scoreWasNumeric: Boolean = true
  )

  def validateCandidateRanking(
      entries: List[RawEntry],
      requestedTopK: Int
  ): Either[String, List[RankingEntry]] = {
    if (!AllowedRankingSizes.contains(requestedTopK))
      return Left(s"requested_top_k must be one of $AllowedRankingSizes. Got requested_top_k: $requestedTopK")

    var nilEntrySeen = false
    var numericScores = 0
    var nullScores = 0
    val normalized = scala.collection.mutable.ListBuffer.empty[(Int, String, Option[Double])]

    entries.zipWithIndex.foreach { case (entry, orderIdx) =>
      val rawId = entry.id match {
        case Some(s: String) => s
        case _ => return Left("Candidate ranking entries must include a string 'id'.")
      }
      val candidateId = rawId.trim
      if (candidateId.isEmpty)
        return Left("Candidate ranking entries must include a non-empty string 'id'.")

      if (entry.score.isEmpty)
        return Left("Candidate ranking entries must include 'score'.")

      // NIL check happens BEFORE the score type/range checks (py:421-423)
      if (candidateId.toUpperCase == "NIL") {
        nilEntrySeen = true
      } else {
        val score: Option[Double] = entry.score.get match {
          case None =>
            nullScores += 1
            None
          case Some(v) =>
            if (!entry.scoreWasNumeric)
              return Left(s"score must be numeric. Received for id $candidateId.")
            if (v < 0 || v > 1)
              return Left(s"score must be within [0, 1]. Received $v for id $candidateId.")
            numericScores += 1
            Some(v)
        }
        normalized += ((orderIdx, candidateId, score))
      }
    }

    if (normalized.isEmpty) return Right(Nil)

    val nilMode =
      if (nilEntrySeen) true
      else if (nullScores > 0) {
        if (numericScores > 0) return Left("score must be all null when using NIL mode.")
        true
      } else false

    val effective =
      if (nilMode) normalized.toList.map { case (o, id, _) => (o, id, Option.empty[Double]) }
      else normalized.toList

    val iterable =
      if (nilMode) effective // input order preserved (py:465-471)
      else effective.sortBy { case (o, _, s) => (-s.get, o) }

    val seen = scala.collection.mutable.Set.empty[String]
    val trimmed = scala.collection.mutable.ListBuffer.empty[RankingEntry]
    iterable.foreach { case (_, id, score) =>
      val up = id.toUpperCase
      if (!seen.contains(up) && trimmed.size < requestedTopK) {
        seen += up
        trimmed += RankingEntry(id, score)
      }
    }
    Right(trimmed.toList)
  }

  /** JSON ranking entries -> RawEntry list (shared by the strict payload
    * parser and the lenient output-export path).
    */
  def jsonEntriesToRaw(items: List[JValue]): Either[String, List[RawEntry]] = {
    val out = scala.collection.mutable.ListBuffer.empty[RawEntry]
    items.foreach {
      case JObject(f) =>
        val m = f.toMap
        val id = m.get("id") match {
          case Some(JString(s)) => Some(s)
          case Some(_) => Some(new Object) // non-string id -> type error downstream
          case None => None
        }
        val scoreField = m.get("score").orElse(m.get("confidence_score"))
        val (score, numeric) = scoreField match {
          case Some(JNull) => (Some(None), true)
          case Some(JDouble(d)) => (Some(Some(d)), true)
          case Some(JInt(i)) => (Some(Some(i.toDouble)), true)
          case Some(JDecimal(d)) => (Some(Some(d.toDouble)), true)
          case Some(JBool(b)) => (Some(Some(if (b) 1.0 else 0.0)), true) // python bool is numeric (isinstance int)
          case Some(_) => (Some(Some(0.0)), false)
          case None => (None, true)
        }
        out += RawEntry(id, score, numeric)
      case _ => return Left("Each candidate ranking entry must be a JSON object.")
    }
    Right(out.toList)
  }

  /** lion_linker.py:491-544 — strict JSON payload parsing. */
  def parseLlmJson(response: String, rankingSize: Int): Either[String, ParsedPayload] = {
    if (response == null || response.trim.isEmpty)
      return Left("LLM response must be a non-empty string containing JSON.")
    val json =
      try JsonMethods.parse(response.trim)
      catch { case _: Throwable => return Left(s"LLM response must be valid JSON. Received: ${response.trim}") }

    val obj = json match {
      case JObject(fields) => fields.toMap
      case _ => return Left("LLM response JSON must be an object containing the ranking key only.")
    }

    val unexpected = obj.keySet -- Set(RankingKey, "nil_score", "explanation")
    if (unexpected.nonEmpty)
      return Left(
        s"LLM response must not contain unexpected top-level keys. Found: ${unexpected.toList.sorted.mkString(", ")}"
      )

    val rankingJson = obj.get(RankingKey) match {
      case Some(v) => v
      case None => return Left(s"""LLM response JSON must contain a "$RankingKey" list.""")
    }
    val rawEntries = rankingJson match {
      case JArray(items) =>
        jsonEntriesToRaw(items) match {
          case Right(r) => r
          case Left(e) => return Left(e)
        }
      case JNull => Nil
      case _ => return Left("Candidate ranking must be provided as a list of objects.")
    }

    val ranking = validateCandidateRanking(rawEntries, rankingSize) match {
      case Right(r) => r
      case Left(e) => return Left(e)
    }

    val nilScore: Option[Double] = obj.get("nil_score") match {
      case None => None
      case Some(JDouble(d)) => Some(d)
      case Some(JInt(i)) => Some(i.toDouble)
      case Some(JDecimal(d)) => Some(d.toDouble)
      // python isinstance(x, (int, float)) accepts booleans (py:529-531)
      case Some(JBool(b)) => Some(if (b) 1.0 else 0.0)
      case Some(_) => return Left("nil_score must be numeric.")
    }
    nilScore.foreach { ns =>
      if (ns < 0 || ns > 1) return Left(s"nil_score must be within [0, 1].")
    }

    val explanation = obj.get("explanation") match {
      case None => return Left("""LLM response JSON must contain an "explanation" string summarizing the decision.""")
      case Some(JString(s)) => if (s.trim.nonEmpty) s.trim else DefaultExplanationFallback
      case Some(_) => return Left(""""explanation" must be a string.""")
    }

    Right(ParsedPayload(ranking, nilScore, explanation))
  }

  /** lion_linker.py:856-935 (`_enrich_output_csv`, per-row kernel): the
    * results-export flatten (S12). LENIENT answer parse (bad JSON -> empty
    * ranking, bare list accepted), strict validate with errors degraded to
    * empty, lenient candidate-metadata parse, then the shared enrichment;
    * returns the `{col}_candidate_ranking` JSON payload
    * {"candidate_ranking": [...], "explanation": ...}. Serialization is
    * JSON-equivalent to python's json.dumps (compact separators differ;
    * no consumer is byte-sensitive).
    */
  def enrichOutputAnswer(
      rawAnswer: String,
      rawMetadata: String,
      predictedId: String,
      rankingSize: Int
  ): String = {
    val (entries, explanation): (List[JValue], Option[String]) =
      if (rawAnswer == null || rawAnswer.isEmpty) (Nil, None)
      else
        try {
          JsonMethods.parse(rawAnswer) match {
            case JObject(fields) =>
              val m = fields.toMap
              val ents = m.get(RankingKey) match {
                case Some(JArray(items)) => items
                case _ => Nil
              }
              val expl = m.get("explanation") match {
                case Some(JString(s)) => Some(s.trim).filter(_.nonEmpty)
                case _ => None
              }
              (ents, expl)
            case JArray(items) => (items, None)
            case _ => (Nil, None)
          }
        } catch { case _: Throwable => (Nil, None) }

    val ranking: List[RankingEntry] =
      jsonEntriesToRaw(entries)
        .flatMap(validateCandidateRanking(_, rankingSize))
        .getOrElse(Nil) // ValueError -> [] (py:906-911)

    def jStr(v: JValue): String = v match {
      case JString(s) => s
      case JInt(i) => i.toString
      case JDouble(d) => d.toString
      case JDecimal(d) => d.toString
      case JBool(b) => if (b) "True" else "False" // python str(bool)
      case _ => null
    }
    val candidates: List[Candidate] =
      if (rawMetadata == null || rawMetadata.isEmpty) Nil
      else
        try {
          JsonMethods.parse(rawMetadata) match {
            case JArray(items) =>
              items.collect { case JObject(f) =>
                val m = f.toMap
                val types = m.get("types") match {
                  case Some(JArray(ts)) =>
                    ts.flatMap {
                      case JObject(tf) =>
                        val tm = tf.toMap
                        Some(CandidateType(tm.get("id").map(jStr).orNull, tm.get("name").map(jStr).orNull))
                      case JString(s) => Some(CandidateType("", s)) // bare-string type (py:846)
                      case _ => None
                    }
                  case _ => Nil
                }
                Candidate(
                  m.get("id").map(jStr).orNull,
                  m.get("name").map(jStr).orNull,
                  m.get("description").map(jStr).orNull,
                  types
                )
              }
            case _ => Nil
          }
        } catch { case _: Throwable => Nil }

    val predicted = Option(predictedId).map(_.trim).getOrElse("")
    val enriched = enrichCandidateRanking(ranking, candidates, predicted, rankingSize)

    val payload = JObject(
      RankingKey -> JArray(enriched.map { e =>
        JObject(
          "id" -> JString(e.id),
          "score" -> e.score.map(JDouble(_): JValue).getOrElse(JNull),
          "name" -> JString(e.name),
          "types" -> JArray(
            e.types.toList.map(t => JObject("id" -> JString(t.id), "name" -> JString(t.name)))
          ),
          "description" -> JString(e.description),
          "match" -> JBool(e.matched)
        )
      }),
      "explanation" -> JString(explanation.getOrElse(DefaultExplanationFallback))
    )
    JsonMethods.compact(JsonMethods.render(payload))
  }

  /** lion_linker.py:702-734. */
  def determinePredictedIdentifier(
      ranking: List[RankingEntry],
      nilScore: Option[Double],
      matchConfidenceThreshold: Double = 0.5
  ): String = {
    val nil = nilScore.map(v => math.max(0.0, math.min(1.0, v)))
    if (ranking.isEmpty) return "NIL"
    val top = ranking.head
    val candidateId = Option(top.id).getOrElse("").trim
    if (candidateId.isEmpty || candidateId.toUpperCase == "NIL") return "NIL"
    val score = top.score.getOrElse(0.0)
    val label: Option[String] = top.score.map { s =>
      if (s >= 0.70) "HIGH" else if (s >= 0.40) "MEDIUM" else "LOW"
    }
    if (nil.exists(_ >= math.max(score, matchConfidenceThreshold))) return "NIL"
    if (score >= matchConfidenceThreshold && label.contains("HIGH")) candidateId else "NIL"
  }

  /** lion_linker.py:736-854. */
  def enrichCandidateRanking(
      rankedEntries: List[RankingEntry],
      candidates: List[Candidate],
      predictedIdentifier: String,
      rankingSize: Int = 5
  ): List[EnrichedEntry] = {
    val lookup = scala.collection.mutable.Map.empty[String, Candidate]
    candidates.foreach { c =>
      val id = Option(c.id).map(_.trim).getOrElse("")
      if (id.nonEmpty) { lookup(id) = c; lookup(id.toUpperCase) = c }
    }

    var effective: List[RankingEntry] = rankedEntries
    if (effective.isEmpty && candidates.nonEmpty)
      effective = candidates
        .take(rankingSize)
        .flatMap(c => Option(c.id).map(_.trim).filter(_.nonEmpty).map(RankingEntry(_, None)))

    if (predictedIdentifier.toUpperCase == "NIL")
      effective = effective.map(_.copy(score = None))

    val seen = scala.collection.mutable.Set(effective.map(_.id.trim.toUpperCase): _*)
    if (effective.size < rankingSize && candidates.nonEmpty) {
      val pad = scala.collection.mutable.ListBuffer.empty[RankingEntry]
      candidates.iterator
        .map(c => Option(c.id).map(_.trim).getOrElse(""))
        .filter(_.nonEmpty)
        .foreach { id =>
          val up = id.toUpperCase
          if (!seen.contains(up) && effective.size + pad.size < rankingSize) {
            pad += RankingEntry(id, None)
            seen += up
          }
        }
      effective = effective ++ pad
    }

    effective.flatMap { entry =>
      val entryId = entry.id.trim
      if (entryId.isEmpty) None
      else {
        val base =
          if (entryId.toUpperCase == "NIL") None
          else lookup.get(entryId).orElse(lookup.get(entryId.toUpperCase))
        val types = base.toList.flatMap(_.types).collect {
          case ct if Option(ct.id).exists(_.nonEmpty) || Option(ct.name).exists(_.nonEmpty) =>
            CandidateType(Option(ct.id).map(_.trim).getOrElse(""), Option(ct.name).map(_.trim).getOrElse(""))
        }
        Some(
          EnrichedEntry(
            id = entryId,
            score = entry.score,
            name = base.flatMap(c => Option(c.name)).filter(_.nonEmpty).getOrElse(""),
            types = types,
            description = base.flatMap(c => Option(c.description)).filter(_.nonEmpty).getOrElse(""),
            matched = entryId.toUpperCase == predictedIdentifier.toUpperCase
          )
        )
      }
    }
  }
}
