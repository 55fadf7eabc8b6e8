package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Data-plane decision semantics: the exact-ported driver-side rules of
  * `Decision` (validate -> predict -> enrich,
  * /root/reference/lion_linker/lion_linker.py:383-854) lifted to DataFrame
  * operators so a frame of (task_id, LLM-response payload, candidates)
  * columns runs distributed:
  *
  *  - F9 strict parse+validate: a codegen'd expression per row (the strict
  *    error semantics — unexpected keys, missing-vs-null score, NIL mode —
  *    are not expressible in `from_json`, which is lenient by design)
  *  - F15 predict: a when-cascade over the parsed struct (py:702-734)
  *  - W4 pad-to-k + empty-ranking backfill: array expressions (py:782-798)
  *  - J4 enrichment: a REAL join against the exploded candidate table
  *    (py:746-755), then order-preserving reassembly
  *
  * The plan is linear + one bounded self-join: rows-per-task after explode
  * is <= rankingSize (5), candidate lookup is |tasks| * |candidates-per-task|
  * — both scale linearly with the task table.
  */
object DecisionKernels {

  val rankingEntryType: StructType = StructType(
    Seq(
      StructField("id", StringType, nullable = false),
      StructField("score", DoubleType, nullable = true)
    )
  )

  val payloadType: StructType = StructType(
    Seq(
      StructField("ranking", ArrayType(rankingEntryType, containsNull = false)),
      StructField("nil_score", DoubleType, nullable = true),
      StructField("explanation", StringType, nullable = true),
      StructField("error", StringType, nullable = true)
    )
  )

  /** Strict parse+validate of one LLM payload (exact port semantics — the
    * shared `Decision.parseLlmJson`). Runs on executors; json4s ships with
    * Spark. Errors surface in the `error` field (the pipeline's degrade-to-
    * NIL rule, lion_linker.py:1063-1070, is then a column expression).
    */
  def parse(response: UTF8String, topK: Int): InternalRow =
    Decision.parseLlmJson(if (response == null) "" else response.toString, topK) match {
      case Right(p) =>
        val entries = p.ranking.map { e =>
          InternalRow(UTF8String.fromString(e.id), e.score.map(Double.box).orNull)
        }.toArray[Any]
        InternalRow(
          new GenericArrayData(entries),
          p.nilScore.map(Double.box).orNull,
          UTF8String.fromString(p.explanation),
          null
        )
      case Left(err) =>
        InternalRow(new GenericArrayData(Array.empty[Any]), null, null, UTF8String.fromString(err))
    }
}

/** parse_llm_payload(response, topK) -> struct(ranking, nil_score,
  * explanation, error). Null/blank input yields the reference's
  * non-empty-string error, not a null struct.
  */
case class ParseLlmPayload(child: Expression, topK: Int) extends UnaryExpression {
  override def dataType: DataType = DecisionKernels.payloadType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "parse_llm_payload"
  override protected def nullSafeEval(v: Any): Any =
    DecisionKernels.parse(v.asInstanceOf[UTF8String], topK)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.operators.DecisionKernels.parse($a, $topK)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** enrich_answer(rawAnswer, rawMetadata, predictedId) -> the
  * `{col}_candidate_ranking` JSON payload (S12 export flatten,
  * lion_linker.py:856-935). Row-local, codegen'd.
  */
case class EnrichAnswer(
    first: Expression,
    second: Expression,
    third: Expression,
    rankingSize: Int
) extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "enrich_answer"
  override protected def nullSafeEval(a: Any, m: Any, p: Any): Any =
    UTF8String.fromString(
      Decision.enrichOutputAnswer(
        a.asInstanceOf[UTF8String].toString,
        m.asInstanceOf[UTF8String].toString,
        p.asInstanceOf[UTF8String].toString,
        rankingSize
      )
    )
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      (a, m, p) =>
        "UTF8String.fromString(graft.operators.Decision.enrichOutputAnswer(" +
          s"$a.toString(), $m.toString(), $p.toString(), $rankingSize))"
    )
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object DecisionOps {

  /** Column API for the export flatten; null inputs degrade to "" (the
    * python path treats non-strings as absent).
    */
  def enrich_answer(rawAnswer: Column, rawMetadata: Column, predictedId: Column, rankingSize: Int): Column =
    GraftShim.column(
      EnrichAnswer(
        GraftShim.expression(coalesce(rawAnswer, lit(""))),
        GraftShim.expression(coalesce(rawMetadata, lit(""))),
        GraftShim.expression(coalesce(predictedId, lit(""))),
        rankingSize
      )
    )

  /** S12: the reference's results-CSV enrichment pass
    * (`_enrich_output_csv`): for every mention column with a
    * `{col}_llm_answer`, add `{col}_candidate_ranking` (unless already
    * present) and drop all `*_candidate_metadata` columns. One row-local
    * projection — the python version re-reads and rewrites the whole CSV.
    */
  def exportPredictions(
      df: DataFrame,
      mentionCols: Seq[String],
      rankingSize: Int = 5,
      predictionSuffix: String = "_pred_id"
  ): DataFrame = {
    var out = df
    mentionCols.foreach { c =>
      val answerCol = s"${c}_llm_answer"
      val metaCol = s"${c}_candidate_metadata"
      val rankCol = s"${c}_candidate_ranking"
      // reference semantics (lion_linker.py:872): skip only when the
      // existing ranking column has at least one non-null value — an
      // all-null (or empty-frame) column is recomputed. One bounded action
      // per pre-existing ranking column (matches the reference, which
      // re-reads the whole CSV to decide).
      def hasAnyValue =
        out.columns.contains(rankCol) &&
          // short-circuits at the first non-null row (limit-1); the all-null
          // recompute case necessarily scans the whole column — as does the
          // reference's notna().any() over the re-read CSV
          !out.select(rankCol).where(col(rankCol).isNotNull).isEmpty
      if (out.columns.contains(answerCol) && !hasAnyValue) {
        val meta = if (out.columns.contains(metaCol)) col(metaCol) else lit(null).cast("string")
        val pred =
          if (out.columns.contains(s"$c$predictionSuffix")) col(s"$c$predictionSuffix")
          else lit(null).cast("string")
        out = out.withColumn(rankCol, enrich_answer(col(answerCol), meta, pred, rankingSize))
      }
    }
    out.drop(out.columns.filter(_.endsWith("_candidate_metadata")): _*)
  }

  /** Column API for the strict parser. `coalesce` keeps null responses on
    * the error path (None response -> error, like the reference).
    */
  def parse_llm_payload(response: Column, topK: Int): Column =
    GraftShim.column(ParseLlmPayload(GraftShim.expression(coalesce(response, lit(""))), topK))

  /** F15 predict (lion_linker.py:702-734) over parsed payload columns. */
  def predict(ranking: Column, nilScore: Column, error: Column, threshold: Double = 0.5): Column = {
    val top = try_element_at(ranking, lit(1)) // ANSI-safe on empty rankings
    val topId = trim(top.getField("id"))
    val topScore = top.getField("score")
    val scoreVal = coalesce(topScore, lit(0.0))
    val nilClamped = least(lit(1.0), greatest(lit(0.0), nilScore))
    when(error.isNotNull || size(ranking) === 0, "NIL")
      .when(topId === "" || upper(topId) === "NIL", "NIL")
      .when(nilClamped.isNotNull && nilClamped >= greatest(scoreVal, lit(threshold)), "NIL")
      .when(scoreVal >= threshold && topScore.isNotNull && topScore >= 0.70, topId)
      .otherwise("NIL")
  }

  private def entry(id: Column, score: Column): Column =
    struct(id.as("id"), score.cast("double").as("score"))

  /** The full data-plane decision pipeline.
    *
    * Input columns: `taskCol` (unique id), `responseCol` (JSON string),
    * `candidatesCol` (array<struct<id,name,description,
    * types:array<struct<id,name>>>>). Output: one row per task with
    * (task_id, predicted_id, nil_score, explanation, error,
    * ranking: array<struct<id,score,name,description,
    * types:array<struct<id,name>>,matched>>).
    */
  def run(
      df: DataFrame,
      taskCol: String,
      responseCol: String,
      candidatesCol: String,
      requestedTopK: Int,
      matchThreshold: Double = 0.5
  ): DataFrame = {
    val rankingSize = requestedTopK
    val nilScore = lit(null).cast("double")

    // ---- parse + predict (row-local) ----
    // null candidates degrade to "no candidates" (python None -> []): the
    // coalesce keeps the pad/backfill array algebra from null-propagating
    // a valid ranking into null
    val candIds = coalesce(
      filter(
        transform(col(candidatesCol), c => trim(c.getField("id"))),
        id => id =!= ""
      ),
      array().cast("array<string>")
    )
    val parsed = df
      .withColumn("_p", parse_llm_payload(col(responseCol), requestedTopK))
      .withColumn(
        "_pred",
        predict(col("_p.ranking"), col("_p.nil_score"), col("_p.error"), matchThreshold)
      )
      .withColumn("_cand_ids", candIds)

    // ---- effective ranking: backfill + NIL score wipe + pad-to-k ----
    // empty ranking + candidates present -> first k candidate ids (py:758-764)
    val backfill = transform(
      slice(col("_cand_ids"), 1, rankingSize),
      id => entry(id, nilScore)
    )
    val eff0 = when(
      size(col("_p.ranking")) === 0 && size(col("_cand_ids")) > 0,
      backfill
    ).otherwise(col("_p.ranking"))
    // NIL prediction wipes scores (py:766-768)
    val eff1 = when(
      upper(col("_pred")) === "NIL",
      transform(eff0, e => entry(e.getField("id"), nilScore))
    ).otherwise(eff0)
    val staged = parsed.withColumn("_eff1", eff1)

    // pad with unseen candidate ids, input order, case-insensitive dedup
    // (py:782-798); rankingSize bounds the arrays so the lambda aggregate
    // is O(k * |candidates|) per row, never data-sized
    val seen = transform(col("_eff1"), e => upper(trim(e.getField("id"))))
    val padIds = aggregate(
      col("_cand_ids"),
      array().cast("array<string>"),
      (acc, id) =>
        when(
          // stop accumulating once rankingSize pad ids exist: the slice
          // below never takes more, and without the gate the accumulator
          // (and the per-element rescan of it) grows with |candidates| —
          // O(|candidates|^2) per row instead of the promised O(k * n)
          size(acc) >= rankingSize ||
            array_contains(seen, upper(id)) || array_contains(transform(acc, x => upper(x)), upper(id)),
          acc
        ).otherwise(array_append(acc, id))
    )
    val padded = concat(
      col("_eff1"),
      transform(
        slice(padIds, lit(1), greatest(lit(0), lit(rankingSize) - size(col("_eff1")))),
        id => entry(id, nilScore)
      )
    )
    // blank-id entries are dropped from the output (py:800-802)
    val effective = filter(padded, e => trim(e.getField("id")) =!= "")
    val tasks = staged
      .withColumn("_eff", effective)
      .select(
        col(taskCol).as("_tid"),
        col("_pred"),
        col("_p.nil_score").as("_nil"),
        // degrade-to-NIL rule (py:1063-1070): parse failures carry the
        // fallback explanation, like the reference's default NIL payload
        coalesce(col("_p.explanation"), lit(Decision.DefaultExplanationFallback)).as("_expl"),
        col("_p.error").as("_err"),
        col("_eff")
      )

    // ---- J4 enrichment join ----
    // Candidate lookup with the reference's dict-overwrite semantics
    // (py:739-744): ONE key namespace where candidate i writes its exact id
    // then its upper-cased id, later writes winning — emulated by emitting
    // both key events with an event ordinal (2i, 2i+1) and keeping the max
    // ordinal per (task, key). Entry resolution then tries the exact id
    // first, the upper-cased id second (py:823).
    val cands = df
      .select(col(taskCol).as("_tid"), posexplode(col(candidatesCol)).as(Seq("_cidx", "_c")))
      .select(
        col("_tid"),
        col("_cidx"),
        trim(col("_c.id")).as("_cid"),
        col("_c.name").as("_cname"),
        col("_c.description").as("_cdesc"),
        col("_c.types").as("_ctypes")
      )
      .where(col("_cid") =!= "")
    val events = cands
      .select(col("_tid"), col("_cid").as("_key"), (col("_cidx") * 2).as("_ord"), col("_cname"), col("_cdesc"), col("_ctypes"))
      .unionAll(
        cands.select(col("_tid"), upper(col("_cid")).as("_key"), (col("_cidx") * 2 + 1).as("_ord"), col("_cname"), col("_cdesc"), col("_ctypes"))
      )
    val w = Window.partitionBy("_tid", "_key").orderBy(col("_ord").desc)
    val lookup = events.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn", "_ord")

    val exploded = tasks
      .select(col("*"), posexplode_outer(col("_eff")).as(Seq("_pos", "_e")))
      .withColumn("_eid", trim(col("_e.id")))

    val x = lookup.select(
      col("_tid").as("_xtid"),
      col("_key").as("_xkey"),
      col("_cname").as("_xname"),
      col("_cdesc").as("_xdesc"),
      col("_ctypes").as("_xtypes")
    )
    val u = lookup.select(
      col("_tid").as("_utid"),
      col("_key").as("_ukey"),
      col("_cname").as("_uname"),
      col("_cdesc").as("_udesc"),
      col("_ctypes").as("_utypes")
    )
    val joined = exploded
      .join(x, exploded("_tid") === x("_xtid") && col("_eid") === x("_xkey"), "left")
      .join(u, exploded("_tid") === u("_utid") && upper(col("_eid")) === u("_ukey"), "left")

    // NIL entries carry no base metadata (py:820-823)
    val isNilEntry = upper(col("_eid")) === "NIL"
    val hasExact = col("_xkey").isNotNull && !isNilEntry
    val hasUpper = col("_ukey").isNotNull && !isNilEntry
    val baseName = when(hasExact, col("_xname")).when(hasUpper, col("_uname"))
    val baseDesc = when(hasExact, col("_xdesc")).when(hasUpper, col("_udesc"))
    val baseTypes = when(hasExact, col("_xtypes")).when(hasUpper, col("_utypes"))
    // keep types whose raw id OR name is non-empty; output trimmed (py:826-833)
    val cleanTypes = transform(
      filter(
        coalesce(baseTypes, array().cast("array<struct<id:string,name:string>>")),
        t => coalesce(t.getField("id"), lit("")) =!= "" || coalesce(t.getField("name"), lit("")) =!= ""
      ),
      t =>
        struct(
          trim(coalesce(t.getField("id"), lit(""))).as("id"),
          trim(coalesce(t.getField("name"), lit(""))).as("name")
        )
    )
    val enriched = when(
      col("_e").isNull,
      lit(null).cast(
        "struct<id:string,score:double,name:string,description:string," +
          "types:array<struct<id:string,name:string>>,matched:boolean>"
      )
    ).otherwise(
      struct(
        col("_eid").as("id"),
        col("_e.score").as("score"),
        coalesce(baseName, lit("")).as("name"),
        coalesce(baseDesc, lit("")).as("description"),
        cleanTypes.as("types"),
        (upper(col("_eid")) === upper(col("_pred"))).as("matched")
      )
    )

    // ---- order-preserving reassembly: one row per task ----
    joined
      .withColumn("_enr", enriched)
      .groupBy("_tid")
      .agg(
        first("_pred").as("predicted_id"),
        first("_nil").as("nil_score"),
        first("_expl").as("explanation"),
        first("_err").as("error"),
        transform(
          array_sort(collect_list(when(col("_enr").isNotNull, struct(col("_pos"), col("_enr"))))),
          s => s.getField("_enr")
        ).as("ranking")
      )
      .withColumnRenamed("_tid", "task_id")
  }
}
