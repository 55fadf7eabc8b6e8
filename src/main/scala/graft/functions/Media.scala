package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Media-payload kernels: the binary-column decode step as a row-local
  * Catalyst expression — the decoded metadata is a pure function of the
  * payload bytes, so re-attaching it must never shuffle (a join to add a
  * column computed from the same row is a scale anti-pattern).
  *
  * The decode itself is STUBBED (no image/audio codecs ship in this image):
  * container sniffing from magic bytes is real; width/height/duration are a
  * clearly-marked deterministic fake. A real implementation replaces ONLY
  * `MediaKernels.decode`'s dimension/duration derivation — the expression,
  * schema and plan shape stay.
  */
object MediaKernels {

  val metaType: StructType = StructType(
    Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("magic", StringType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("duration_ms", LongType, nullable = false)
    )
  )

  /** STUB decode: magic-byte container sniff (real) + deterministic fake
    * dimensions/duration (stub; see class doc).
    */
  def decode(payload: Array[Byte]): InternalRow = {
    if (payload == null || payload.isEmpty)
      return InternalRow(0L, UTF8String.EMPTY_UTF8, UTF8String.fromString("unknown"), 0, 0, 0L)
    val magic = payload.take(4).map("%02x".format(_)).mkString
    val kind = magic match {
      case m if m.startsWith("ffd8") => "image" // jpeg
      case m if m.startsWith("8950") => "image" // png
      case m if m.startsWith("4949") || m.startsWith("4d4d") => "image" // tiff
      case m if m.startsWith("6674") || m.startsWith("0000") => "video" // mp4-ish
      case m if m.startsWith("4f67") || m.startsWith("fff1") => "audio" // ogg/aac
      case _ => "unknown"
    }
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < math.min(payload.length, 256)) { h = (h ^ (payload(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    val w = 64 + math.floorMod(h, 1024).toInt
    val ht = 64 + math.floorMod(h >>> 16, 1024).toInt
    val dur = if (kind == "video" || kind == "audio") 1000L + math.floorMod(h >>> 24, 600000L) else 0L
    InternalRow(
      payload.length.toLong,
      UTF8String.fromString(magic),
      UTF8String.fromString(kind),
      w,
      ht,
      dur
    )
  }
}

/** decode_meta(payload: binary) -> struct(n_bytes, magic, kind, width,
  * height, duration_ms). Row-local, codegen'd — zero exchanges.
  */
case class DecodeMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaKernels.metaType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "decode_meta"
  override protected def nullSafeEval(v: Any): Any =
    MediaKernels.decode(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.MediaKernels.decode($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MediaFunctions {
  def decode_meta(payload: Column): Column =
    GraftShim.column(DecodeMeta(GraftShim.expression(payload)))
}
