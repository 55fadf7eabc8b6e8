package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{PromptRender, PromptTemplates}

/** End-to-end prompt fidelity over the VENDORED reference assets: each
  * expected file under test resources (ref_few_shot.txt,
  * ref_multi_angle.txt, ref_multi_tablellama.txt) was produced by RUNNING
  * the reference PromptGenerator
  * (/root/reference/lion_linker/prompt/generator.py:109-206) on the inputs
  * rebuilt below — template-file substitution with the real few-shot
  * examples payload, and the batched multi-task prompt in both candidate
  * formats, compared byte for byte.
  */
class PromptTemplatesSpec extends SparkSpec {

  private val candSchema =
    "array<struct<id:string,name:string,description:string,types:array<struct<id:string,name:string>>>>"

  private val answerFormat = """Return JSON: {"task_id": str, "ranking": [ids]}"""

  // the python-side inputs: table [[title,source],[alpha beta gamma,web]],
  // mention "beta", two candidates (one null type name dropped, one null
  // description -> N.A.)
  private val cands1 = Seq(
    Row("Q1", "alpha", "desc en", Seq(Row("T1", "en"), Row("T2", null))),
    Row("Q2", "beta", null, Seq(Row("T3", "film")))
  )
  private val table1 = Seq(Seq("title", "source"), Seq("alpha beta gamma", "web"))
  private val table2 = Seq(Seq("title", "source"), Seq("delta", "news"))

  private def tasksDf = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      s"batch_id int, seq int, task_id string, tbl array<array<string>>, mention string, candidates $candSchema"
    )
    spark.createDataFrame(
      Seq(
        Row(0, 1, "task-000001", table1, "beta", cands1),
        Row(0, 2, "task-000002", table2, "", Seq.empty[Row])
      ).asJava,
      schema
    )
  }

  private def expected(resource: String): String =
    graft.util.Fixtures.resourceText(s"graft/fixtures/$resource")

  test("few_shot template + examples render byte-identical to the reference generator") {
    val out = tasksDf
      .where(col("seq") === 1)
      .select(
        PromptRender
          .renderTemplate(
            lit(PromptTemplates.template("few_shot")),
            Seq(
              "[EXAMPLES]" -> lit(PromptTemplates.examples),
              "[TABLE]" -> PromptRender.tablePipe(col("tbl")),
              "[ENTITY MENTION]" -> col("mention"),
              "[CANDIDATES]" -> PromptRender.candidatesAngle(col("candidates")),
              "[ANSWER_FORMAT]" -> lit(answerFormat)
            )
          )
          .as("prompt")
      )
      .head()
      .getString(0)
    assert(out === expected("ref_few_shot.txt"))
  }

  test("multi-task prompt (angle) assembles byte-identical to generate_multi_prompt") {
    val tasks = tasksDf.select(
      col("batch_id"),
      col("seq"),
      PromptRender
        .taskBlock(
          col("task_id"),
          PromptRender.tablePipe(col("tbl")),
          col("mention"),
          PromptRender.candidatesAngle(col("candidates"))
        )
        .as("block")
    )
    val out = PromptRender
      .assembleMultiPrompt(tasks, "batch_id", "seq", "block", "angle", answerFormat)
      .head()
      .getString(1)
    assert(out === expected("ref_multi_angle.txt"))
  }

  test("multi-task prompt (tablellama) assembles byte-identical to the reference") {
    val tasks = tasksDf.select(
      col("batch_id"),
      col("seq"),
      PromptRender
        .taskBlock(
          col("task_id"),
          PromptRender.tableTableLlama(col("tbl")),
          col("mention"),
          PromptRender.candidatesTableLlama(col("candidates"))
        )
        .as("block")
    )
    val out = PromptRender
      .assembleMultiPrompt(tasks, "batch_id", "seq", "block", "tablellama", answerFormat)
      .head()
      .getString(1)
    assert(out === expected("ref_multi_tablellama.txt"))
  }

  test("all four vendored templates load and carry their placeholders") {
    PromptTemplates.names.foreach { n =>
      val t = PromptTemplates.template(n)
      assert(t.contains("[TABLE]") && t.contains("[CANDIDATES]"), s"template $n missing placeholders")
    }
    assert(PromptTemplates.template("few_shot").contains("[EXAMPLES]"))
    assert(PromptTemplates.examples.contains("### Example 1"))
  }
}
