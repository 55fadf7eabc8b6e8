package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F12: base64url pagination-cursor codec
  * (/root/reference/app/api/routes.py:40-56). The cursor payload is the
  * reference's canonical JSON `{"job_id": <id>, "seq": <n>}` (python
  * json.dumps default separators), urlsafe-base64-encoded with padding
  * stripped; decode re-pads, inverts the urlsafe alphabet and parses the
  * JSON — malformed cursors decode to null (routes.py returns None).
  *
  * Pure column expressions — cursor encode/decode runs distributed, e.g.
  * stamping a resume cursor onto every page boundary of a result export.
  */
object Cursor {

  private val schema = "job_id STRING, seq BIGINT"

  /** Canonical cursor JSON (python json.dumps spacing). Escapes exactly what
    * json.dumps escapes: backslash, quote, the short escapes
    * \b \t \n \f \r, and \u00xx for every other control char — so a job id
    * containing a newline/tab round-trips through encode/decode and through
    * python json.loads instead of silently producing an unparseable cursor.
    */
  def payloadJson(jobId: Column, seq: Column): Column = {
    val base = regexp_replace(regexp_replace(jobId, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")
    val shortEscapes = Seq('\b' -> "\\b", '\t' -> "\\t", '\n' -> "\\n", '\f' -> "\\f", '\r' -> "\\r")
    val uEscapes = (0 until 0x20)
      .map(_.toChar)
      .filterNot(shortEscapes.map(_._1).contains)
      .map(c => c -> f"\\u${c.toInt}%04x")
    // literal (non-regex) replace per control char: rare inputs, tiny
    // payloads — 32 cheap scans, all inside one codegen'd projection
    val escaped = (shortEscapes ++ uEscapes).foldLeft(base) { case (acc, (c, esc)) =>
      replace(acc, lit(c.toString), lit(esc))
    }
    concat(lit("{\"job_id\": \""), escaped, lit("\", \"seq\": "), seq.cast("long"), lit("}"))
  }

  /** urlsafe_b64encode(payload).rstrip('='). */
  def encode(jobId: Column, seq: Column): Column =
    regexp_replace(translate(base64(payloadJson(jobId, seq).cast("binary")), "+/", "-_"), "=+$", "")

  /** Inverse: struct(job_id, seq), null for malformed input. */
  def decode(cursor: Column): Column = {
    val padLen = pmod(lit(4) - pmod(length(cursor), lit(4)), lit(4))
    val padded = concat(cursor, lit("===").substr(lit(1), padLen))
    val raw = unbase64(translate(padded, "-_", "+/")).cast("string")
    from_json(raw, org.apache.spark.sql.types.StructType.fromDDL(schema))
  }
}
