package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel behind [[UrlNormalize]] — the RFC-3986-style URL
  * normalization rule chain (see Normalize.urlNormalize's scaladoc for the
  * rules), as one plain JVM pass per row instead of the previous chain of
  * interpreted higher-order functions (`filter`/`array_sort` lambdas were
  * the whole-query cost: ~10x the row-local siblings at sf0.1).
  *
  * Byte-for-byte identical to the Catalyst-column formulation it replaced:
  * lowercasing goes through UTF8String.toLowerCase (what Spark's `lower`
  * uses), the query-param sort compares UTF8String binary order (what
  * `array_sort` uses on strings), and the trim strips ASCII spaces only
  * (what `trim` strips).
  */
object NormKernels {

  private def lower(s: String): String = UTF8String.fromString(s).toLowerCase.toString

  private def dropParam(p: String): Boolean = {
    val eq = p.indexOf('=')
    val key = if (eq >= 0) p.substring(0, eq) else p
    key.startsWith("utm_") || key == "gclid" || key == "fbclid" || key == "msclkid"
  }

  def urlNormalize(url: UTF8String): UTF8String = {
    val s = url.toString
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val u = s.substring(b, e)
    val hash = u.indexOf('#')
    val noFrag = if (hash >= 0) u.substring(0, hash) else u
    val sep = noFrag.indexOf("://")
    // not a URL this parser can see (no "://" before any '#'): pass through
    // the trimmed input untouched, fragment included
    if (sep < 0) return UTF8String.fromString(u)
    val scheme = lower(noFrag.substring(0, sep))
    val rest = noFrag.substring(sep + 3)
    // hostport: before the first '/', then before the first '?'
    val slash = rest.indexOf('/')
    var hp = if (slash >= 0) rest.substring(0, slash) else rest
    val hq = hp.indexOf('?')
    if (hq >= 0) hp = hp.substring(0, hq)
    val afterHost = rest.substring(hp.length)
    val qpos = afterHost.indexOf('?')
    val path = if (qpos >= 0) afterHost.substring(0, qpos) else afterHost
    val query = if (qpos >= 0) afterHost.substring(qpos + 1) else ""
    val cpos = hp.indexOf(':')
    val host = lower(if (cpos >= 0) hp.substring(0, cpos) else hp)
    val port = if (cpos >= 0) hp.substring(cpos + 1) else ""
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") || (scheme == "https" && port == "443"))

    // surviving query params, sorted in UTF8 binary order
    val kept = new java.util.ArrayList[UTF8String]()
    var i = 0
    val n = query.length
    while (i <= n) {
      val amp = query.indexOf('&', i)
      val end = if (amp >= 0) amp else n
      if (end > i) {
        val p = query.substring(i, end)
        if (!dropParam(p)) kept.add(UTF8String.fromString(p))
      }
      i = end + 1
    }
    java.util.Collections.sort(kept)

    val out = new java.lang.StringBuilder(u.length + 1)
    out.append(scheme).append("://").append(host)
    if (keepPort) out.append(':').append(port)
    if (path.isEmpty) out.append('/') else out.append(path)
    if (!kept.isEmpty) {
      out.append('?')
      var j = 0
      while (j < kept.size()) {
        if (j > 0) out.append('&')
        out.append(kept.get(j).toString)
        j += 1
      }
    }
    UTF8String.fromString(out.toString)
  }
}

/** Codegen'd URL normalization (the `TokenSetSim` kernel precedent): one
  * static-call expression inside whole-stage codegen, replacing the
  * interpreted HOF chain.
  */
case class UrlNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "url_normalize"
  override protected def nullSafeEval(v: Any): Any =
    NormKernels.urlNormalize(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.NormKernels.urlNormalize($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
