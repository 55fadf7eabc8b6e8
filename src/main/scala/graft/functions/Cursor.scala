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

  /** Canonical cursor JSON (python json.dumps spacing). Backslashes and
    * quotes in the job id are JSON-escaped (json.dumps does); other control
    * characters are not expected in job ids.
    */
  def payloadJson(jobId: Column, seq: Column): Column = {
    val escaped = regexp_replace(regexp_replace(jobId, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")
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
