package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}

/** The training-data corpus build as ONE pipeline (the q_corpus_build
  * battery flagship, productized): optional PII redaction -> quality gate
  * (reason codes) -> exact dedup (min-id canonical per content hash) ->
  * span-level exact-substring dedup -> leakage-safe hash split.
  *
  * Stage accounting is scale-honest: [[annotate]] carries per-doc flags
  * (keep, reasons, is_canonical) WITHOUT filtering, so every stage count
  * comes from ONE aggregation over one frame — not one count() action
  * (= one full corpus scan) per stage.
  */
object CorpusPipeline {

  final case class Config(
      minTokens: Long = 50L,
      maxTokens: Long = 100000L,
      minDistinctRatio: Double = 0.0,
      maxTopBigramFrac: Double = 0.2,
      maxDupTrigramFrac: Double = 0.2,
      windowWords: Int = 50,
      minFreq: Long = 2L,
      splits: Seq[(String, Double)] = Seq("train" -> 0.98, "valid" -> 0.01, "test" -> 0.01),
      redactPii: Boolean = false
  )

  final case class Result(
      cleaned: DataFrame,
      docsIn: Long,
      kept: Long,
      canonical: Long,
      removedWords: Long,
      /** call after the terminal action on `cleaned` — drops the pinned
        * annotated-frame cache (the featuresWithRelease pattern)
        */
      release: () => Unit
  )

  /** Per-doc stage flags, no filtering: (url, text, keep, reasons,
    * is_canonical). `is_canonical` is null for gate-dropped docs, true
    * for the min-url copy of each surviving text.
    */
  def annotate(pages: DataFrame, cfg: Config = Config()): DataFrame = {
    val p0 = pages.select(col("url"), col("text"))
    val p = if (cfg.redactPii) Curation.redactPii(p0) else p0
    val gate = Curation
      .qualityGate(
        p.select(col("url"), split(col("text"), " ").as("toks")),
        idCol = "url",
        minTokens = cfg.minTokens,
        maxTokens = cfg.maxTokens,
        minDistinctRatio = cfg.minDistinctRatio,
        maxTopBigramFrac = cfg.maxTopBigramFrac,
        maxDupTrigramFrac = cfg.maxDupTrigramFrac
      )
      .select("url", "keep", "reasons")
    val flagged = p.join(gate, Seq("url"))
    val canon = Dedup
      .exact(flagged.where(col("keep")), "url", sha2(col("text"), 256))
      .select(col("url"), (col("url") === col("canonical")).as("is_canonical"))
    flagged.join(canon, Seq("url"), "left")
  }

  /** Full build: survivors of gate + exact dedup go through span dedup
    * and the split; stats come from one agg over the annotated frame and
    * one over the output.
    */
  def run(pages: DataFrame, cfg: Config = Config()): Result = {
    val ann = annotate(pages, cfg).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val stats = ann
      .agg(
        count(lit(1)).as("docs_in"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"),
        sum(when(col("is_canonical"), 1L).otherwise(0L)).as("canonical")
      )
      .collect()(0)
    val survivors = ann.where(col("is_canonical")).select(col("url"), split(col("text"), " ").as("words"))
    // persist before the stats action: span dedup is the heaviest stage
    // (several corpus shuffles) and the caller's terminal action on
    // `cleaned` would otherwise re-execute it from scratch
    val cleaned = Curation
      .hashSplit(
        Dedup.spanDedup(survivors, idCol = "url", wordsCol = "words", windowWords = cfg.windowWords, minFreq = cfg.minFreq),
        cfg.splits,
        keyCol = "url"
      )
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val removed = cleaned.agg(coalesce(sum("n_removed"), lit(0L)).as("r")).collect()(0).getLong(0)
    Result(
      cleaned,
      stats.getLong(0),
      stats.getLong(1),
      stats.getLong(2),
      removed,
      () => { ann.unpersist(false); cleaned.unpersist(false); () }
    )
  }
}
