package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F16: the reference's prompt/candidate-text rendering, as pure column
  * expressions (codegen'd — a rendered prompt per row is just a string
  * projection, so "prompt generation" runs distributed over the whole
  * mention table instead of a driver loop).
  *
  * Candidate shape (SURVEY data model):
  *   ARRAY<STRUCT<id STRING, name STRING, description STRING,
  *               types ARRAY<STRUCT<id STRING, name STRING>>>>
  *
  * Reference semantics mirrored exactly:
  *  - candidate text, 3 variants (angle / TableLlama / compact) + JSON:
  *    /root/reference/lion_linker/prompt/generator.py:63-107
  *  - table rendering (pipe + TableLlama "col:/[SEP] row" forms):
  *    /root/reference/lion_linker/prompt/generator.py:24-36
  *  - template placeholder substitution:
  *    /root/reference/lion_linker/prompt/generator.py:120-151
  *  - batched multi-task prompt assembly:
  *    /root/reference/lion_linker/prompt/generator.py:153-206
  *
  * Python-f-string null semantics: a null id/name interpolates as "None";
  * a null description renders "N.A." (angle) / "None" (TableLlama).
  */
object PromptRender {

  private def orNone(c: Column): Column = coalesce(c, lit("None"))

  /** type names with null names dropped (generator.py:50-58 _optimize). */
  private def typeNames(cand: Column): Column =
    transform(
      filter(cand.getField("types"), t => t.getField("name").isNotNull),
      t => t.getField("name")
    )

  /** `<id: ..; name: ..; description: ..; types: t1,t2>` joined by ","
    * (generator.py:70-80, format_candidates=True, non-TableLlama).
    */
  def candidatesAngle(cands: Column): Column =
    array_join(
      transform(
        cands,
        c =>
          concat(
            lit("<id: "),
            orNone(c.getField("id")),
            lit("; name: "),
            orNone(c.getField("name")),
            lit("; description: "),
            coalesce(c.getField("description"), lit("N.A.")),
            lit("; types: "),
            array_join(typeNames(c), ","),
            lit(">")
          )
      ),
      ","
    )

  /** `<name [DESCRIPTION] .. [TYPE] t1,t2>` joined by "," (generator.py:81-89,
    * TableLlama candidate form; null description renders "None" here).
    */
  def candidatesTableLlama(cands: Column): Column =
    array_join(
      transform(
        cands,
        c =>
          concat(
            lit("<"),
            orNone(c.getField("name")),
            lit(" [DESCRIPTION] "),
            coalesce(c.getField("description"), lit("None")),
            lit(" [TYPE] "),
            array_join(typeNames(c), ","),
            lit(">")
          )
      ),
      ","
    )

  /** Compact list (generator.py:91-107): header line, then
    * `- id | firstTruthyTypeName | normalize(description or name)` per
    * candidate; the empty candidate list renders the N.A. placeholder row.
    * Python `or` treats "" as missing, hence the nullif.
    */
  def candidatesCompact(cands: Column): Column = {
    val row = (c: Column) => {
      val truthyTypes =
        filter(c.getField("types"), t => t.getField("name").isNotNull && t.getField("name") =!= "")
      concat(
        lit("- "),
        Normalize.wsNorm(c.getField("id")),
        lit(" | "),
        coalesce(try_element_at(truthyTypes, lit(1)).getField("name"), lit("N.A.")),
        lit(" | "),
        Normalize.wsNorm(coalesce(nullif(c.getField("description"), lit("")), c.getField("name")))
      )
    }
    concat(
      lit("CANDIDATES (ID | TYPE | DESCRIPTION):\n"),
      when(size(cands) === 0, lit("- N.A. | N.A. | N.A."))
        .otherwise(array_join(transform(cands, row), "\n"))
    )
  }

  /** Compact JSON of the optimized candidates (generator.py:107,
    * `json.dumps(..., separators=(",",":"))`); null description is kept as
    * JSON null like python. Caveat: python escapes non-ASCII (`ensure_ascii`)
    * where Spark emits raw UTF-8 — byte-identical for ASCII payloads.
    */
  def candidatesJson(cands: Column): Column =
    to_json(
      transform(
        cands,
        c =>
          struct(
            c.getField("id").as("id"),
            c.getField("name").as("name"),
            c.getField("description").as("description"),
            transform(
              filter(c.getField("types"), t => t.getField("name").isNotNull),
              t => struct(t.getField("id").as("id"), t.getField("name").as("name"))
            ).as("types")
          )
      ),
      java.util.Collections.singletonMap("ignoreNullFields", "false")
    )

  /** Pipe table (generator.py:36): one `|a|b|c|` line per row. Input is an
    * ARRAY<ARRAY<STRING>> column (header row included, like the reference).
    */
  def tablePipe(rows: Column): Column =
    array_join(
      transform(rows, r => concat(lit("|"), array_join(transform(r, orNone(_)), "|"), lit("|"))),
      "\n"
    )

  /** TableLlama table (generator.py:25-34): `col: | h1 | h2 |` then
    * ` [SEP] row i: | v1 | v2 |` appended with no separator. An EMPTY rows
    * array fails loudly like the reference (`rows[0]` IndexError) instead
    * of silently rendering "" — without the guard, sequence(0, -1) yields a
    * descending [0,-1] and zip_with null-pads the empty side to "".
    */
  def tableTableLlama(rows: Column): Column =
    when(rows.isNull || size(rows) === 0, raise_error(lit("tableTableLlama: empty rows"))).otherwise(
      tableTableLlamaNonEmpty(rows)
    )

  private def tableTableLlamaNonEmpty(rows: Column): Column =
    array_join(
      zip_with(
        rows,
        sequence(lit(0), size(rows) - 1),
        (r, i) =>
          when(i === 0, concat(lit("col: | "), array_join(transform(r, orNone(_)), " | "), lit(" |")))
            .otherwise(
              concat(
                lit(" [SEP] row "),
                i.cast("string"),
                lit(": | "),
                array_join(transform(r, orNone(_)), " | "),
                lit(" |")
              )
            )
      ),
      ""
    )

  /** Placeholder substitution (generator.py:136-151): literal (non-regex)
    * replace of each [PLACEHOLDER] with its value column. Null values
    * interpolate as "None" like `str(None)`.
    */
  def renderTemplate(template: Column, replacements: Seq[(String, Column)]): Column =
    replacements.foldLeft(template) { case (acc, (ph, v)) => replace(acc, lit(ph), orNone(v)) }

  /** One batched-prompt task block (generator.py:180-189). */
  def taskBlock(taskId: Column, tableText: Column, mention: Column, candidatesText: Column): Column =
    concat(
      lit("### Task\nTASK_ID: \""),
      orNone(taskId),
      lit("\"\nTABLE_ROW:\n"),
      orNone(tableText),
      lit("\nENTITY_MENTION:\n"),
      coalesce(nullif(mention, lit("")), lit("N.A.")),
      lit("\nCANDIDATES:\n"),
      orNone(candidatesText),
      lit("\n")
    )

  /** The fixed multi-prompt preamble (generator.py:160-176) for a candidate
    * format: "angle" | "tablellama" | "compact" | "json".
    */
  def multiPromptPreamble(variant: String): String = {
    val candidateLine = variant match {
      case "tablellama" =>
        "Candidates are given as: <name [DESCRIPTION] ... [TYPE] ...>\n" +
          "types is a short category such as film, television film, novel, album, etc.\n"
      case "angle" =>
        "Candidates are given as: <id: ...; name: ...; description: ...; types: ...>\n" +
          "types is a short category such as film, television film, novel, album, etc.\n"
      case "compact" => "Candidates are given as a compact list: ID | TYPE | DESCRIPTION.\n"
      case _         => "Candidates are given as JSON objects with id, name, description, and types.\n"
    }
    "You perform entity linking over table cell mentions.\n" +
      "For each task, rank the candidates and return a top list following the answer format.\n\n" +
      "For each task you are given:\n" +
      "  - The table header and the target row.\n" +
      "  - The entity mention to link.\n" +
      "  - The list of candidate entities.\n\n" +
      candidateLine + "\n"
  }

  /** Batched multi-task prompt assembly (generator.py:153-206): tasks grouped
    * by `batchCol`, blocks ordered by `seqCol` (the reference iterates its
    * task list in order; seq is that order made explicit), preamble +
    * blocks + answer format. One hash-agg shuffle per batch — prompts for a
    * trillion-row mention table assemble fully distributed.
    */
  def assembleMultiPrompt(
      tasks: DataFrame,
      batchCol: String,
      seqCol: String,
      blockCol: String,
      variant: String,
      answerFormat: String
  ): DataFrame =
    tasks
      .groupBy(col(batchCol).as("batch_id"))
      .agg(
        concat(
          lit(multiPromptPreamble(variant)),
          array_join(
            transform(
              array_sort(collect_list(struct(col(seqCol).as("s"), col(blockCol).as("b")))),
              e => e.getField("b")
            ),
            "\n"
          ),
          lit("\n" + answerFormat)
        ).as("prompt")
      )
}
