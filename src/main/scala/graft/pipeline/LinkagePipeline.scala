package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._

/** The end-to-end record-linkage DAG (SURVEY.md §3.1 re-architecture):
  *
  *   pages -> features (linear)           \
  *   pages -> blocking keys -> salted pair self-join -> score -> threshold
  *         -> large-star/small-star CC -> clusters joined back to pages
  *         -> predictions (byte-identical text pass-through)
  *
  * The reference's per-chunk asyncio loop
  * (/root/reference/lion_linker/lion_linker.py:1334-1410) collapses into one
  * declarative plan; the only driver-side loop is the bounded, checkpointed
  * CC iteration.
  */
object LinkagePipeline {

  final case class Config(
      strategies: Seq[BlockingStrategy] = Seq(
        CanonicalUrlBlocking,
        DomainBlocking,
        MinHashBlocking()
      ),
      weights: PairScorer.Weights = PairScorer.Weights(),
      maxBlockSize: Int = 1000,
      maxCcIterations: Int = 20
  )

  /** Spark session tuned for the engine: AQE + skew join on, shuffle
    * partition count from the env (sized to cores locally; on a real
    * cluster AQE coalesces the rest).
    */
  def session(master: String, appName: String = "graft-linkage", shufflePartitions: Int = 32): SparkSession =
    SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  /** Run linkage over a (url, text, ...) corpus; returns the Prediction
    * frame: url, cluster_id, score, status, seq, text.
    *
    * `score` = the best accepted pair score touching the url (null for
    * singletons); `status` = linked/nil; `seq` = deterministic total order
    * (reference W5); `text` = untouched input text (per-row invariant).
    */
  def run(pages: DataFrame, cfg: Config = Config()): DataFrame = {
    val corpus = pages.select("url", "text")

    val keys = Blocker.allKeys(corpus, cfg.strategies)
    val pairs = Blocker.pairs(keys, cfg.maxBlockSize)
    val feats = PairScorer.features(corpus)
    val scored = PairScorer.score(pairs, feats, cfg.weights)
    val accepted = scored.where(col("score") >= cfg.weights.threshold)

    // scoring + CC reuse the accepted edge set: materialize it once
    val acceptedCk = accepted.localCheckpoint(true)

    val clusters = ConnectedComponents.run(
      acceptedCk.select(col("urlA").as("src"), col("urlB").as("dst")),
      cfg.maxCcIterations
    )

    val bestScore = acceptedCk
      .select(col("urlA").as("url"), col("score"))
      .unionAll(acceptedCk.select(col("urlB").as("url"), col("score")))
      .groupBy("url")
      .agg(max("score").as("score"))

    // join from the projected corpus, not the raw input frame — extra input
    // columns (e.g. a cluster_id when re-linking a previous output) must not
    // collide with the prediction schema
    val joined = corpus
      .join(clusters, Seq("url"), "left")
      .join(bestScore, Seq("url"), "left")
      .select(
        col("url"),
        coalesce(col("cluster_id"), col("url")).as("cluster_id"),
        col("score"),
        when(col("cluster_id").isNotNull, "linked").otherwise("nil").as("status"),
        col("text")
      )
    withDeterministicSeq(joined, "url")
  }

  /** Resumable variant of `run`: every stage commits a Parquet snapshot +
    * manifest through `io`, and a restarted run with the same config hash
    * resumes from the last committed stage (SURVEY.md §4.3). Stage DAG:
    * keys -> pairs -> accepted(score+threshold) -> cc_iter_* -> predictions.
    */
  def runResumable(pages: DataFrame, cfg: Config, io: graft.io.TableIO): DataFrame = {
    val spark = pages.sparkSession
    val corpus = pages.select("url", "text")

    val keys = io
      .readStage(spark, "keys")
      .getOrElse(io.commitStage(Blocker.allKeys(corpus, cfg.strategies), "keys"))
    val pairs = io
      .readStage(spark, "pairs")
      .getOrElse(io.commitStage(Blocker.pairs(keys, cfg.maxBlockSize), "pairs", Seq("keys")))
    val accepted = io
      .readStage(spark, "accepted")
      .getOrElse {
        val feats = PairScorer.features(corpus)
        val scored = PairScorer.score(pairs, feats, cfg.weights)
        io.commitStage(scored.where(col("score") >= cfg.weights.threshold), "accepted", Seq("pairs"))
      }

    val clusters = ConnectedComponents.runResumable(
      accepted.select(col("urlA").as("src"), col("urlB").as("dst")),
      io,
      cfg.maxCcIterations
    )

    io.readStage(spark, "predictions").getOrElse {
      val bestScore = accepted
        .select(col("urlA").as("url"), col("score"))
        .unionAll(accepted.select(col("urlB").as("url"), col("score")))
        .groupBy("url")
        .agg(max("score").as("score"))
      val joined = corpus
        .join(clusters, Seq("url"), "left")
        .join(bestScore, Seq("url"), "left")
        .select(
          col("url"),
          coalesce(col("cluster_id"), col("url")).as("cluster_id"),
          col("score"),
          when(col("cluster_id").isNotNull, "linked").otherwise("nil").as("status"),
          col("text")
        )
      io.commitStage(withDeterministicSeq(joined, "url"), "predictions", Seq("accepted"))
    }
  }

  /** Deterministic global sequence by `orderCol` WITHOUT a single-partition
    * window (reference W5 needs a total order; a global row_number would
    * serialize 100 TB through one task). Two-phase: bucket by a key prefix
    * (order-compatible with the full key), rank within bucket, add
    * driver-computed bucket offsets (bucket count table is tiny).
    */
  def withDeterministicSeq(df: DataFrame, orderCol: String): DataFrame = {
    val bucketed = df.withColumn("_bucket", substring(col(orderCol), 1, 12))
    val counts = bucketed.groupBy("_bucket").agg(count(lit(1)).as("_n"))
    val buckets = counts.orderBy("_bucket").collect()
    var acc = 0L
    val offsets = buckets.map { r =>
      val o = (r.getString(0), acc)
      acc += r.getLong(1)
      o
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toDF("_bucket", "_offset")
    val w = Window.partitionBy("_bucket").orderBy(orderCol)
    bucketed
      .join(broadcast(offsetDf), "_bucket")
      .withColumn("seq", (col("_offset") + row_number().over(w)).cast("long"))
      .drop("_bucket", "_offset")
  }
}
