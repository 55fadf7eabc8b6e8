package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.PromptRender

/** F16 rendering fidelity: every expected string below was produced by
  * RUNNING the reference generator
  * (/root/reference/lion_linker/prompt/generator.py) on the same inputs —
  * candidate text (all 4 variants), both table forms, template substitution,
  * and the batched multi-task prompt.
  */
class PromptRenderSpec extends SparkSpec {

  private val candSchema =
    "array<struct<id:string,name:string,description:string,types:array<struct<id:string,name:string>>>>"

  private def cand(id: String, name: String, desc: String, types: Seq[(String, String)]) =
    Row(id, name, desc, types.map { case (i, n) => Row(i, n) })

  // exercises: null type name (dropped), empty type name (kept), null
  // description (variant-specific default), empty description (python
  // truthiness), null name, whitespace-heavy name (normalized only in
  // compact), empty types
  private val cands = Seq(
    cand("Q1", "Alpha Film", "a 1999 film", Seq(("T1", "film"), ("T2", null))),
    cand("Q2", "  Beta  Movie ", null, Seq(("T3", ""), ("T4", "novel"))),
    cand("Q3", null, "", Nil)
  )

  private def renderOne(c: org.apache.spark.sql.Column): String = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(s"candidates $candSchema")
    spark
      .createDataFrame(Seq(Row(cands)).asJava, schema)
      .select(c.as("out"))
      .head()
      .getString(0)
  }

  test("angle variant matches the reference byte for byte") {
    assert(
      renderOne(PromptRender.candidatesAngle(col("candidates"))) ===
        "<id: Q1; name: Alpha Film; description: a 1999 film; types: film>," +
          "<id: Q2; name:   Beta  Movie ; description: N.A.; types: ,novel>," +
          "<id: Q3; name: None; description: ; types: >"
    )
  }

  test("tablellama variant matches the reference") {
    assert(
      renderOne(PromptRender.candidatesTableLlama(col("candidates"))) ===
        "<Alpha Film [DESCRIPTION] a 1999 film [TYPE] film>," +
          "<  Beta  Movie  [DESCRIPTION] None [TYPE] ,novel>," +
          "<None [DESCRIPTION]  [TYPE] >"
    )
  }

  test("compact variant matches the reference (first truthy type, desc-or-name, N.A.s)") {
    assert(
      renderOne(PromptRender.candidatesCompact(col("candidates"))) ===
        "CANDIDATES (ID | TYPE | DESCRIPTION):\n" +
          "- Q1 | film | a 1999 film\n" +
          "- Q2 | novel | Beta Movie\n" +
          "- Q3 | N.A. | N.A."
    )
  }

  test("compact variant: empty candidate list renders the N.A. placeholder row") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(s"candidates $candSchema")
    val out = spark
      .createDataFrame(Seq(Row(Seq.empty[Row])).asJava, schema)
      .select(PromptRender.candidatesCompact(col("candidates")).as("out"))
      .head()
      .getString(0)
    assert(out === "CANDIDATES (ID | TYPE | DESCRIPTION):\n- N.A. | N.A. | N.A.")
  }

  test("json variant matches python json.dumps (null desc kept, empty-name types kept)") {
    assert(
      renderOne(PromptRender.candidatesJson(col("candidates"))) ===
        """[{"id":"Q1","name":"Alpha Film","description":"a 1999 film","types":[{"id":"T1","name":"film"}]},""" +
          """{"id":"Q2","name":"  Beta  Movie ","description":null,"types":[{"id":"T3","name":""},{"id":"T4","name":"novel"}]},""" +
          """{"id":"Q3","name":null,"description":"","types":[]}]"""
    )
  }

  private val tableRows = Seq(Seq("title", "year"), Seq("Alpha Film", "1999"), Seq(null, "2001"))

  private def renderTable(c: org.apache.spark.sql.Column): String = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL("rows array<array<string>>")
    spark.createDataFrame(Seq(Row(tableRows)).asJava, schema).select(c.as("out")).head().getString(0)
  }

  test("pipe table matches the reference (None for nulls)") {
    assert(
      renderTable(PromptRender.tablePipe(col("rows"))) ===
        "|title|year|\n|Alpha Film|1999|\n|None|2001|"
    )
  }

  test("tablellama table matches the reference (col:/[SEP] row, no joiner)") {
    assert(
      renderTable(PromptRender.tableTableLlama(col("rows"))) ===
        "col: | title | year | [SEP] row 1: | Alpha Film | 1999 | [SEP] row 2: | None | 2001 |"
    )
  }

  test("tablellama table fails loudly on an empty rows array (reference: rows[0] IndexError)") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL("rows array<array<string>>")
    val df = spark.createDataFrame(Seq(Row(Seq.empty[Seq[String]])).asJava, schema)
    val err = intercept[Exception] {
      df.select(PromptRender.tableTableLlama(col("rows")).as("out")).head()
    }
    assert(err.getMessage.contains("empty rows"))
    // NULL rows array fails the same way (reference: TypeError on rows=None)
    val dfNull = spark.createDataFrame(Seq(Row(null)).asJava, schema)
    val errNull = intercept[Exception] {
      dfNull.select(PromptRender.tableTableLlama(col("rows")).as("out")).head()
    }
    assert(errNull.getMessage.contains("empty rows"))
  }

  test("template substitution matches generate_prompt (null -> None)") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL(s"rows array<array<string>>, mention string, candidates $candSchema")
    val df = spark.createDataFrame(
      Seq(Row(Seq(Seq("h"), Seq("v")), "Alpha", Seq(cands.head))).asJava,
      schema
    )
    val rendered = df
      .select(
        PromptRender
          .renderTemplate(
            lit("M: [ENTITY MENTION]; T: [TABLE]; C: [CANDIDATES]; A: [ANSWER_FORMAT]"),
            Seq(
              "[ENTITY MENTION]" -> col("mention"),
              "[TABLE]" -> PromptRender.tablePipe(col("rows")),
              "[CANDIDATES]" -> PromptRender.candidatesAngle(col("candidates")),
              "[ANSWER_FORMAT]" -> lit(null).cast("string")
            )
          )
          .as("out")
      )
      .head()
      .getString(0)
    assert(
      rendered ===
        "M: Alpha; T: |h|\n|v|; C: <id: Q1; name: Alpha Film; description: a 1999 film; types: film>; A: None"
    )
  }

  test("batched multi-prompt assembly matches generate_multi_prompt") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      s"batch string, seq int, task_id string, rows array<array<string>>, mention string, candidates $candSchema"
    )
    val tasks = spark.createDataFrame(
      Seq(
        Row("b0", 1, "r1-c0", Seq(Seq("title", "year"), Seq("Alpha Film", "1999")), "Alpha Film", Seq(cands.head)),
        Row("b0", 2, "r2-c0", Seq(Seq("title", "year"), Seq("Beta", "2001")), "", Seq.empty[Row])
      ).asJava,
      schema
    )
    val blocks = tasks.withColumn(
      "block",
      PromptRender.taskBlock(
        col("task_id"),
        PromptRender.tablePipe(col("rows")),
        col("mention"),
        PromptRender.candidatesCompact(col("candidates"))
      )
    )
    val prompt = PromptRender
      .assembleMultiPrompt(blocks, "batch", "seq", "block", "compact", "ANSWER AS JSON.")
      .head()
      .getAs[String]("prompt")
    val expected =
      "You perform entity linking over table cell mentions.\nFor each task, rank the candidates and return a top list following the answer format.\n\nFor each task you are given:\n  - The table header and the target row.\n  - The entity mention to link.\n  - The list of candidate entities.\n\nCandidates are given as a compact list: ID | TYPE | DESCRIPTION.\n\n### Task\nTASK_ID: \"r1-c0\"\nTABLE_ROW:\n|title|year|\n|Alpha Film|1999|\nENTITY_MENTION:\nAlpha Film\nCANDIDATES:\nCANDIDATES (ID | TYPE | DESCRIPTION):\n- Q1 | film | a 1999 film\n\n### Task\nTASK_ID: \"r2-c0\"\nTABLE_ROW:\n|title|year|\n|Beta|2001|\nENTITY_MENTION:\nN.A.\nCANDIDATES:\nCANDIDATES (ID | TYPE | DESCRIPTION):\n- N.A. | N.A. | N.A.\n\nANSWER AS JSON."
    assert(prompt === expected)
  }
}
