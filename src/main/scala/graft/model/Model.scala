package graft.model

import java.sql.Timestamp

/** Core data model of the record-linkage engine.
  *
  * The canonical input row is a Common-Crawl-style web page (BASELINE.json
  * `input_hint`); the remaining types mirror the reference's data contracts —
  * see /root/reference/lion_linker/lion_linker.py:637-638 (task),
  * lion_linker/utils.py:4-14 (candidate), app/models/queue.py:103-113
  * (prediction record) — generalized from KB entity-linking to within-corpus
  * record linkage.
  */
final case class WebPage(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** One blocking-key emission: page `url` belongs to block `key` produced by
  * blocking strategy `strategy` (reference analog: a retriever subclass —
  * lion_linker/retrievers.py:146-386 — is a candidate-generation strategy).
  */
final case class BlockKey(url: String, key: String, strategy: String)

/** A candidate pair inside one block; invariant `urlA < urlB` (canonical
  * orientation kills mirror duplicates before the expensive scoring join).
  */
final case class CandidatePair(urlA: String, urlB: String, key: String)

/** A scored pair: individual similarity components plus the weighted score. */
final case class ScoredPair(
    urlA: String,
    urlB: String,
    key: String,
    jw: Double,
    lev: Double,
    cosine: Double,
    score: Double
)

/** Final cluster assignment; `clusterId` = min url in the component
  * (deterministic across parallelism levels — never partition-derived).
  */
final case class ClusterAssignment(url: String, clusterId: String)

/** Output row, mirroring app/models/queue.py:103-113 generalized to
  * clusters. `text` is the byte-identical pass-through (per-row invariant);
  * `seq` is a deterministic total order (reference W5,
  * lion_linker/lion_linker.py:243,346-347).
  */
final case class Prediction(
    url: String,
    cluster_id: String,
    score: Option[Double],
    status: String, // "linked" | "nil"
    seq: Long,
    text: String
)

/** Gold pair label emitted by the synthetic generator (the stand-in for the
  * reference's gt_columns evaluation harness —
  * /root/reference/tests/data/film_with_QIDs.csv, exclusion mechanism
  * lion_linker/lion_linker.py:196,945,969).
  */
final case class GoldPair(url_a: String, url_b: String, block_key: String, label: Boolean)

/** A KB candidate, mirroring lion_linker/utils.py:4-14. Used by the ported
  * decision-semantics surface (ranking validation / prediction / enrichment).
  */
final case class Candidate(
    id: String,
    name: String,
    description: String,
    types: Seq[CandidateType]
)
final case class CandidateType(id: String, name: String)

/** One ranking entry (lion_linker/lion_linker.py:442-487). */
final case class RankingEntry(id: String, score: Option[Double])

/** Enriched ranking entry (lion_linker/lion_linker.py:736-854). */
final case class EnrichedEntry(
    id: String,
    score: Option[Double],
    name: String,
    types: Seq[CandidateType],
    description: String,
    matched: Boolean
)
