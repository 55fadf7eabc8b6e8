package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Normalize, SimKernels, SimilarityFunctions}

class SimilaritySpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    SimKernels.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro-winkler reference values") {
    // classic published examples of the metric
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111) < 1e-9)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333) < 1e-9)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962963) < 1e-9)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "") == 1.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("abc", "xyz") == 0.0)
  }

  test("jaro-winkler properties: symmetry, range, identity (seeded sample)") {
    val rng = new scala.util.Random(42)
    def randStr(): String =
      (0 until rng.nextInt(13)).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    (1 to 500).foreach { _ =>
      val a = randStr(); val b = randStr()
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"range violated for ($a,$b): $s")
      assert(math.abs(s - jw(b, a)) < 1e-12, s"asymmetric for ($a,$b)")
      if (a.nonEmpty) assert(jw(a, a) == 1.0)
    }
  }

  private def dl(a: String, b: String): Int =
    SimKernels.damerauLevenshtein(UTF8String.fromString(a), UTF8String.fromString(b))

  test("damerau-levenshtein: true (unrestricted) variant, known values") {
    // CA->ABC is the canonical OSA/true-DL separator: OSA says 3, true DL 2
    // (transposed block edited again). DuckDB's builtin agrees (probed),
    // which is what makes the battery oracle a one-liner.
    assert(dl("CA", "ABC") === 2)
    assert(dl("ab", "ba") === 1)
    assert(dl("abc", "ca") === 2)
    assert(dl("kitten", "sitting") === 3)
    assert(dl("", "abc") === 3 && dl("abc", "") === 3 && dl("", "") === 0)
    assert(dl("a", "a") === 0 && dl("same", "same") === 0)
    assert(dl("abcdef", "abcfed") === 2) // two adjacent swaps... f<->e then e<->d? verify below
  }

  test("damerau-levenshtein properties vs levenshtein (seeded sample)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    def randStr(): String =
      (0 until rng.nextInt(10)).map(_ => ('a' + rng.nextInt(4)).toChar).mkString
    val cases = (1 to 400).map(_ => (randStr(), randStr()))
    val rows = cases
      .toDF("a", "b")
      .select(
        col("a"),
        col("b"),
        SimilarityFunctions.damerau_levenshtein(col("a"), col("b")).as("dl"),
        levenshtein(col("a"), col("b")).as("lev")
      )
      .collect()
    rows.foreach { r =>
      val (a, b, d, l) = (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3))
      assert(d <= l, s"dl > lev for ($a,$b): $d > $l")
      assert(d >= math.abs(a.length - b.length), s"below length bound for ($a,$b)")
      assert(d === dl(b, a), s"asymmetric for ($a,$b)")
      if (a == b) assert(d === 0)
    }
    // adjacent-swap-only pairs cost exactly 1 where levenshtein pays 2
    assert(dl("abcd", "abdc") === 1 && dl("abcd", "bacd") === 1)
  }

  test("jaro-winkler expression matches kernel through codegen") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("same", "same"))
      .toDF("a", "b")
      .select(SimilarityFunctions.jaro_winkler(col("a"), col("b")).as("s"))
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 0.9611111111) < 1e-9)
    assert(math.abs(got(1) - 0.8133333333) < 1e-9)
    assert(got(2) == 1.0)
  }

  test("sorted_vec_dot merges sorted sparse vectors") {
    import spark.implicits._
    val df = Seq(
      ((Seq(1L, 3L, 9L), Seq(0.5, 0.5, 0.7071)), (Seq(3L, 9L), Seq(1.0, 0.5)))
    ).toDF("a", "b")
      .select(
        SimilarityFunctions
          .sorted_vec_dot(
            col("a").cast("struct<ts:array<bigint>,ws:array<double>>"),
            col("b").cast("struct<ts:array<bigint>,ws:array<double>>")
          )
          .as("dot")
      )
    val got = df.collect()(0).getDouble(0)
    assert(math.abs(got - (0.5 * 1.0 + 0.7071 * 0.5)) < 1e-9)
  }

  test("simhash: identical tokens identical hash; near tokens near hash") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i")
    val near = base.updated(5, "changed").updated(30, "other")
    val far = (1 to 60).map(i => s"zzz$i")
    val df = Seq((base, near, far)).toDF("a", "b", "c")
    val row = df
      .select(
        SimilarityFunctions.simhash64(col("a")).as("ha"),
        SimilarityFunctions.simhash64(col("b")).as("hb"),
        SimilarityFunctions.simhash64(col("c")).as("hc")
      )
      .collect()(0)
    val (ha, hb, hc) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(ha != 0L)
    assert(java.lang.Long.bitCount(ha ^ hb) < java.lang.Long.bitCount(ha ^ hc))
    // determinism across evaluation paths
    val again = df.select(SimilarityFunctions.simhash64(col("a"))).collect()(0).getLong(0)
    assert(again == ha)
  }

  test("minhash signature: jaccard-similar sets share slots") {
    import spark.implicits._
    val a = (1 to 50).map(i => s"sh$i")
    val b = (1 to 50).map(i => if (i % 10 == 0) s"x$i" else s"sh$i") // 80% overlap
    val c = (1 to 50).map(i => s"other$i")
    val df = Seq((a, b, c)).toDF("a", "b", "c").select(
      SimilarityFunctions.minhash_sig(col("a"), 16).as("sa"),
      SimilarityFunctions.minhash_sig(col("b"), 16).as("sb"),
      SimilarityFunctions.minhash_sig(col("c"), 16).as("sc")
    )
    val row = df.collect()(0)
    val sa = row.getSeq[Long](0)
    val sb = row.getSeq[Long](1)
    val sc = row.getSeq[Long](2)
    val agreeAB = sa.zip(sb).count { case (x, y) => x == y }
    val agreeAC = sa.zip(sc).count { case (x, y) => x == y }
    assert(agreeAB > agreeAC)
    assert(agreeAB >= 8) // ~0.8 jaccard over 16 slots
  }

  test("embedding l2-normalize and int8 quantization round-trip") {
    import spark.implicits._
    val F = graft.functions.EmbeddingFunctions
    val row = Seq((Seq(3.0, 4.0), Seq(0.0, 0.0), Seq(1.27, -0.635, 0.005)))
      .toDF("v", "z", "q")
      .select(
        F.l2Normalize(col("v")).as("nv"),
        F.l2Normalize(col("z")).as("nz"),
        F.quantizeInt8(col("q")).as("qv"),
        F.dequantizeInt8(F.quantizeInt8(col("q"))).as("dq")
      )
      .collect()(0)
    assert(row.getSeq[Double](0) == Seq(0.6, 0.8))
    assert(row.getSeq[Double](1) == Seq(0.0, 0.0), "zero vector stays zero, no NaN")
    val qv = row.getStruct(2)
    val scale = qv.getDouble(0)
    assert(math.abs(scale - 1.27 / 127.0) < 1e-12) // = 0.01
    // codes: 1.27/0.01 = 127; -0.635/0.01 = -63.5 -> floor(-63) = -63 (the
    // explicit floor(x+0.5) contract — SQL round() would say -64);
    // 0.005/0.01 = 0.5 -> 1
    assert(qv.getSeq[Byte](1) == Seq[Byte](127, -63, 1), qv.getSeq[Byte](1).toString)
    val dq = row.getSeq[Double](3)
    dq.zip(Seq(1.27, -0.635, 0.005)).foreach { case (a, b) =>
      assert(math.abs(a - b) <= scale / 2 + 1e-12, s"$a vs $b")
    }
  }

  test("int8 top-k ranks like float top-k when margins exceed quantization error") {
    import spark.implicits._
    val F = graft.functions.EmbeddingFunctions
    // corpus at well-separated angles; quantization error (<= scale/2 per
    // coordinate) cannot flip any pairwise order here
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0)), // query
      (10L, Seq(0.9, 0.1, 0.0)), // nearest
      (11L, Seq(0.5, 0.5, 0.0)),
      (12L, Seq(0.0, 1.0, 0.0)), // orthogonal
      (13L, Seq(-1.0, 0.0, 0.0)) // opposite
    ).toDF("vec_id", "embedding")
    val e = vecs.select(col("vec_id"), F.quantizeInt8(col("embedding")).as("qv"))
    val got = graft.operators.SimilaritySearch
      .bruteForceTopKInt8(e.where(col("vec_id") === 0), e.where(col("vec_id") >= 10), "vec_id", "qv", 4)
      .orderBy("rk")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 10L), (2L, 11L), (3L, 12L), (4L, 13L)), got.mkString(","))
    // the zero vector neither crashes nor ranks above anything real
    val z = Seq((0L, Seq(1.0, 0.0)), (10L, Seq(0.0, 0.0)), (11L, Seq(1.0, 0.0)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), F.quantizeInt8(col("embedding")).as("qv"))
    val zr = graft.operators.SimilaritySearch
      .bruteForceTopKInt8(z.where(col("vec_id") === 0), z.where(col("vec_id") >= 10), "vec_id", "qv", 2)
      .orderBy("rk")
      .collect()
      .map(_.getLong(2))
    assert(zr.toSeq == Seq(11L, 10L))
  }

  test("winnow: the MOSS guarantees on hand-built documents") {
    import spark.implicits._
    val k = 4
    val w = 5
    // shared run of exactly w + k - 1 = 8 tokens, embedded at different
    // positions in otherwise-disjoint documents
    val run = (1 to 8).map(i => s"shared$i")
    val a = (1 to 6).map(i => s"a$i") ++ run ++ (1 to 6).map(i => s"a${i + 6}")
    val b = (1 to 3).map(i => s"b$i") ++ run ++ (1 to 9).map(i => s"b${i + 3}")
    val c = (1 to 20).map(i => s"c$i") // nothing shared
    val tiny = Seq("t1", "t2", "t3", "t4", "t5") // >= k, shorter than one window
    val sub = Seq("x1", "x2", "x3") // < k tokens
    val row = Seq((a, b, c, tiny, sub))
      .toDF("a", "b", "c", "tiny", "sub")
      .select(
        SimilarityFunctions.winnow(col("a"), k, w).as("fa"),
        SimilarityFunctions.winnow(col("b"), k, w).as("fb"),
        SimilarityFunctions.winnow(col("c"), k, w).as("fc"),
        SimilarityFunctions.winnow(col("tiny"), k, w).as("ft"),
        SimilarityFunctions.winnow(col("sub"), k, w).as("fs")
      )
      .collect()(0)
    val fa = row.getSeq[Long](0).toSet
    val fb = row.getSeq[Long](1).toSet
    val fc = row.getSeq[Long](2).toSet
    assert((fa & fb).nonEmpty, "a shared w+k-1 run must yield a shared fingerprint")
    assert((fa & fc).isEmpty && (fb & fc).isEmpty, "disjoint docs share nothing")
    assert(row.getSeq[Long](3).size == 1, "a doc shorter than one window emits ONE fingerprint")
    assert(row.getSeq[Long](4).isEmpty, "fewer than k tokens emits none")
    // fingerprints are position-free: the same run at another offset
    // selects the same minima values inside its fully-shared windows
    val fa2 = Seq(Tuple1((1 to 11).map(i => s"z$i") ++ run))
      .toDF("z")
      .select(SimilarityFunctions.winnow(col("z"), k, w))
      .collect()(0)
      .getSeq[Long](0)
      .toSet
    assert((fa & fa2).nonEmpty)
  }

  test("normalize: canonical url collapses planted variants") {
    import spark.implicits._
    val urls = Seq(
      "http://site1.example.com/page/7",
      "https://www.site1.example.com/page/7",
      "http://site1.example.com/page/7?utm_source=feed&ref=2",
      "https://m.site1.example.com/page/7/"
    )
    val keys = urls.toDF("url").select(Normalize.canonicalUrl(col("url"))).distinct().collect()
    assert(keys.length == 1)
    assert(keys(0).getString(0) == "site1.example.com/page/7")
  }

  test("normalize: whitespace norm mirrors reference semantics") {
    import spark.implicits._
    val df = Seq("  a \t b\n c ", "   ", null).toDF("s").select(Normalize.wsNorm(col("s")))
    val got = df.collect().map(_.getString(0))
    assert(got(0) == "a b c")
    assert(got(1) == "N.A.")
    assert(got(2) == "N.A.")
  }

  test("normalize: id norm takes suffix after last '/' then ':'") {
    import spark.implicits._
    val df = Seq("http://www.wikidata.org/entity/Q42", "wd:Q42", "Q42")
      .toDF("s")
      .select(Normalize.idNorm(col("s")))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("Q42", "Q42", "Q42"))
  }

  test("shingles") {
    import spark.implicits._
    val df = Seq("a b c d").toDF("t")
      .select(Normalize.shingles(Normalize.tokensOf(col("t")), 3).as("sh"))
    assert(df.collect()(0).getSeq[String](0) == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(Normalize.shingles(Normalize.tokensOf(col("t")), 3).as("sh"))
    assert(short.collect()(0).getSeq[String](0).isEmpty)
  }

  test("ngram repetition: exact counts on hand-checked cases") {
    import spark.implicits._
    def rep(text: String, n: Int): (Long, Long, Long) = {
      val r = Seq(text).toDF("t")
        .select(SimilarityFunctions.ngram_repetition(split(col("t"), " "), n).as("r"))
        .head().getStruct(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // "a b a b a": bigrams [ab, ba, ab, ba] -> total 4, top 2, dup 4
    assert(rep("a b a b a", 2) == ((4L, 2L, 4L)))
    // trigrams [aba, bab, aba] -> total 3, top 2, dup 2
    assert(rep("a b a b a", 3) == ((3L, 2L, 2L)))
    // all distinct: dup 0, top 1
    assert(rep("a b c d", 2) == ((3L, 1L, 0L)))
    // fewer tokens than n: all zero
    assert(rep("a", 2) == ((0L, 0L, 0L)))
    // all-identical tokens: one gram repeated
    assert(rep("x x x x", 2) == ((3L, 3L, 3L)))
  }

  test("token-set sims: closed-form jaccard/dice/overlap/cosine incl. degenerates") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val SF = graft.functions.SimilarityFunctions
    def sims(a: String, b: String): (Double, Double, Double, Double) = {
      val d = Seq((a, b)).toDF("a", "b").select(split(col("a"), " ").as("ta"), split(col("b"), " ").as("tb"))
      d.select(
        SF.token_jaccard(col("ta"), col("tb")),
        SF.token_dice(col("ta"), col("tb")),
        SF.token_overlap(col("ta"), col("tb")),
        SF.token_set_cosine(col("ta"), col("tb"))
      ).as[(Double, Double, Double, Double)].collect()(0)
    }
    // A={x,y,z}, B={y,z,w}: inter 2, union 4
    val (j, di, o, c) = sims("x y z z", "y z w")
    assert(j == 0.5 && di == 2.0 * 2 / 6 && o == 2.0 / 3)
    assert(math.abs(c - 2.0 / 3) < 1e-12) // sqrt(3*3) = 3
    assert(sims("x y", "x y") == ((1.0, 1.0, 1.0, 1.0)))
    // disjoint and empty-side conventions: all zero
    assert(sims("x", "y") == ((0.0, 0.0, 0.0, 0.0)))
  }

  test("monge-elkan: mean of per-token best JW, asymmetric, empty a -> 0") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val SF = graft.functions.SimilarityFunctions
    def me(a: Seq[String], b: Seq[String]): Double =
      Seq((a, b)).toDF("ta", "tb").select(SF.monge_elkan_jw(col("ta"), col("tb")))
        .as[Double].collect()(0)
    // both tokens match exactly -> 1.0
    assert(me(Seq("anna", "smith"), Seq("smith", "anna")) == 1.0)
    // one exact + one best-effort: mean of 1.0 and jw(martha, marhta)
    val expected = (1.0 + jw("martha", "marhta")) / 2
    assert(math.abs(me(Seq("anna", "martha"), Seq("anna", "marhta")) - expected) < 1e-12)
    // asymmetry: extra tokens on the right don't dilute, on the left they do
    assert(me(Seq("anna"), Seq("anna", "zzz")) == 1.0)
    assert(me(Seq("anna", "zzz"), Seq("anna")) < 1.0)
    assert(me(Seq.empty[String], Seq("anna")) == 0.0)
  }
}
