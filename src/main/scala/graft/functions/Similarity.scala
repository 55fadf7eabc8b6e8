package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static similarity kernels referenced by the generated code — keeping the
  * math in ordinary static methods lets `doGenCode` emit a plain call and
  * stay inside whole-stage codegen (no CodegenFallback in the hot pair-
  * scoring path).
  */
object SimKernels {

  /** Jaro-Winkler similarity in [0,1]; standard p=0.1, prefix<=4, boost
    * threshold 0.7. Replaces the reference's LLM scoring black box
    * (/root/reference/lion_linker/core.py:133-222) with a deterministic
    * kernel; built-in `levenshtein` covers the edit-distance leg.
    */
  def jaroWinkler(aStr: UTF8String, bStr: UTF8String): Double = {
    val a = aStr.toString
    val b = bStr.toString
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / la + m / lb + (m - transpositions / 2.0) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(la, lb))
    while (prefix < maxPrefix && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  /** Dot product of two sparse vectors encoded as arrays of
    * struct(t: long, w: double) SORTED ASCENDING by t. O(n+m) merge — the
    * TF-IDF cosine when both sides are pre-L2-normalized.
    */
  def sortedDot(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var acc = 0.0
    while (i < na && j < nb) {
      val ra = a.getStruct(i, 2)
      val rb = b.getStruct(j, 2)
      val ta = ra.getLong(0)
      val tb = rb.getLong(0)
      if (ta == tb) { acc += ra.getDouble(1) * rb.getDouble(1); i += 1; j += 1 }
      else if (ta < tb) i += 1
      else j += 1
    }
    acc
  }

  /** FNV-1a 64-bit over UTF-8 bytes — self-contained deterministic token
    * hash (stable across Spark versions / partitionings).
    */
  def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash over an array of string tokens (unit weights): bit k of
    * the result is 1 iff the sum of signs of bit k over all token hashes is
    * positive. Near-duplicate texts land within small Hamming distance.
    */
  def simHash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv64(tokens.getUTF8String(i))
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
          k += 1
        }
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) {
      if (counts(k) > 0) out |= (1L << k)
      k += 1
    }
    out
  }

  /** MinHash signature: for each of k hash families, the minimum of
    * (fnv64(shingle) XOR seed_k) * PRIME over all shingles. Empty input
    * yields Long.MaxValue per slot.
    */
  def minHashSignature(shingles: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = fnv64(shingles.getUTF8String(i))
        var s = 0
        while (s < k) {
          val hv = (h ^ (0x9E3779B97F4A7C15L * (s + 1))) * 0xff51afd7ed558ccdL
          if (hv < sig(s)) sig(s) = hv
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** Jaro-Winkler similarity as a native binary expression (codegen'd). */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SimKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SimKernels.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product over sorted sparse term vectors (array<struct<t:long,w:double>>). */
case class SortedVecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_vec_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SimKernels.sortedDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SimKernels.sortedDot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 64-bit SimHash of an array<string> token column. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(v: Any): Any =
    SimKernels.simHash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimKernels.simHash64($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** k-slot MinHash signature of an array<string> shingle column. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(v: Any): Any =
    SimKernels.minHashSignature(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimKernels.minHashSignature($a, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-API entry points for the custom expressions. */
object SimilarityFunctions {
  private def e(c: Column): Expression = GraftShim.expression(c)
  def jaro_winkler(a: Column, b: Column): Column = GraftShim.column(JaroWinkler(e(a), e(b)))
  def sorted_vec_dot(a: Column, b: Column): Column = GraftShim.column(SortedVecDot(e(a), e(b)))
  def simhash64(tokens: Column): Column = GraftShim.column(SimHash64(e(tokens)))
  def minhash_sig(shingles: Column, k: Int): Column = GraftShim.column(MinHashSig(e(shingles), k))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b)).cast("int")

  /** Register SQL names (FunctionRegistry) for ad-hoc spark.sql use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction("jaro_winkler", es => JaroWinkler(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_vec_dot", es => SortedVecDot(es(0), es(1)), "scala_udf")
  }
}
