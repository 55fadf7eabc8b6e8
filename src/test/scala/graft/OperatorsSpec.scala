package graft

import org.apache.spark.sql.functions._

import graft.operators._

class OperatorsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
      (2L, "the quick brown fox jumps over the lazy dog and runs away fast"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy cat and runs away fast"), // near dup of 1
      (4L, "der hund läuft schnell und der vogel ist nicht da ein zu mit"),
      (5L, "zzz qqq xxx yyy www vvv uuu ttt sss rrr")
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts") {
    val out = Dedup.exactText(docs).where(col("n") > 1).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L))
    assert(out.forall(_.getAs[Long]("canonical") == 1L))
  }

  test("line dedup drops cross-doc boilerplate, keeps order, keeps emptied docs") {
    import spark.implicits._
    val lined = Seq(
      (1L, Seq("unique one", "COOKIE BANNER", "unique two")),
      (2L, Seq("COOKIE BANNER", "other text", "COOKIE BANNER")), // in-doc repeat counts once
      (3L, Seq("COOKIE BANNER")), // emptied entirely, must survive as ""
      (4L, Seq.empty[String]) // no lines at all
    ).toDF("doc_id", "lines")
    val out = Dedup
      .lineDedup(lined, maxDocFreq = 1)
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(out(1L) == "unique one unique two", "order of survivors preserved")
    assert(out(2L) == "other text")
    assert(out(3L) == "")
    assert(out(4L) == "")
    assert(out.size == 4)
    // df threshold honored: at maxDocFreq = 3 the banner (df=3) survives
    val loose = Dedup
      .lineDedup(lined, maxDocFreq = 3)
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(loose(2L) == "COOKIE BANNER other text COOKIE BANNER")
  }

  test("resolve: pairs close transitively, longest text wins, singletons keep") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "short"),
      (2L, "the longest copy of the three"), // canonical of {1,2,3} by length
      (3L, "medium copy"),
      (4L, "alone") // no pair: singleton keep
    ).toDF("doc_id", "text")
    // 1~2 and 2~3 only: 1 and 3 must still land in ONE cluster (closure)
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("urlA", "urlB")
    val out = Dedup
      .resolve(corpus, pairs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out(1L) == ((1L, 2L, false)), out(1L).toString) // cluster label = min member
    assert(out(2L) == ((1L, 2L, true)), "longest text is the canonical")
    assert(out(3L) == ((1L, 2L, false)))
    assert(out(4L) == ((4L, 4L, true)), "unpaired doc keeps itself")
  }

  test("span dedup removes duplicated windows from all copies, only those") {
    import spark.implicits._
    // docs 1 and 2 share the 6-word prefix "a b c d e f"; with window 3
    // every covered word of that span is removed from BOTH docs; doc 2's
    // own tail repeats "x y z x y z" (within-doc duplication counts);
    // doc 3 shares nothing; doc 4 is shorter than the window.
    val corpus = Seq(
      (1L, "a b c d e f p q r"),
      (2L, "a b c d e f x y z x y z"),
      (3L, "g h i j k l m n"),
      (4L, "s t")
    ).toDF("doc_id", "text").select(col("doc_id"), split(col("text"), " ").as("words"))
    val out = Dedup
      .spanDedup(corpus, windowWords = 3, minFreq = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((9L, 6L, "p q r")), "shared prefix removed, unique tail kept")
    assert(out(2L) == ((12L, 12L, "")), "shared prefix AND self-repeated tail removed; emptied doc survives")
    assert(out(3L) == ((8L, 0L, "g h i j k l m n")), "doc with no duplicated window untouched")
    assert(out(4L) == ((2L, 0L, "s t")), "doc shorter than the window forms no window")
  }

  test("minhash pairs find near-duplicates") {
    val pairs = Dedup
      .minHashPairs(docs)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    assert(pairs.contains(("1", "2")))
    assert(pairs.contains(("1", "3")) || pairs.contains(("2", "3")))
    assert(!pairs.exists(p => p._1 == "5" || p._2 == "5"))
  }

  test("simhash pairs respect hamming threshold") {
    val pairs = Dedup.simHashPairs(docs).collect()
    val ids = pairs.map(r => (r.getString(0), r.getString(1))).toSet
    assert(ids.contains(("1", "2"))) // identical => hamming 0
    pairs.foreach(r => assert(r.getAs[Int]("hamming") <= 3))
  }

  test("simhash chunk-combination blocking is exact vs brute force at d<=3") {
    import spark.implicits._
    // ~120 docs with overlapping token windows: plenty of fingerprint pairs
    // land within Hamming 3, exercising every chunk combination
    val base = (0 until 400).map(i => s"w${i % 37}")
    val corpus = (0 until 120)
      .map(i => (i.toLong, base.slice(i % 40, i % 40 + 60 + (i % 7)).mkString(" ")))
      .toDF("doc_id", "text")
    val fp = corpus
      .select(col("doc_id"), graft.functions.SimilarityFunctions.simhash64(
        graft.functions.Normalize.tokensOf(col("text"))).as("fp"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // the operator orients pairs by STRING id order ("100" < "2")
    val brute = (for {
      (a, fa) <- fp; (b, fb) <- fp if a.toString < b.toString
      if java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (a.toString, b.toString)).toSet
    val blocked = Dedup
      .simHashPairs(corpus)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    assert(blocked == brute, s"missing=${(brute -- blocked).take(5)} extra=${(blocked -- brute).take(5)}")
  }

  test("lshPlan bounds bucket size and restores recall as the corpus grows") {
    val p1 = SimilaritySearch.lshPlan(1000L)
    val p2 = SimilaritySearch.lshPlan(1000000L)
    val p3 = SimilaritySearch.lshPlan(1000000000L)
    // bits track log2(n/target): expected bucket rows stay ~targetBucketRows
    assert(p1.bits <= p2.bits && p2.bits <= p3.bits)
    assert(p2.bits == 10 && p3.bits == 20)
    // more bits -> lower per-table hit rate -> more tables to hold recall
    assert(p1.tables <= p2.tables && p2.tables <= p3.tables)
    // the plan reports the recall its (bits, tables) actually deliver
    // (p3 hits the 64-table cost clamp, shaving ~0.3% off the 0.95 target)
    assert(p2.expectedRecall >= 0.95)
    assert(p3.expectedRecall >= 0.94 && p3.expectedRecall < 0.95)
    val pBit = 1.0 - math.acos(0.9) / math.Pi
    assert(math.abs(p3.expectedRecall - (1.0 - math.pow(1.0 - math.pow(pBit, p3.bits), p3.tables))) < 1e-12)
  }

  test("embeddingNearDupAuto finds planted duplicates with derived parameters") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val basevecs = (0 until 40).map(i => (i.toLong, Array.fill(16)(rng.nextFloat() * 2 - 1)))
    // plant exact copies of the first 5 vectors
    val planted = (0 until 5).map(i => (100L + i, basevecs(i)._2.clone()))
    val all = (basevecs ++ planted).toDF("vec_id", "embedding")
    val (pairsDf, release) = Dedup.embeddingNearDupAutoWithRelease(all, threshold = 0.99, targetBucketRows = 8)
    val found = pairsDf
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    release()
    (0 until 5).foreach(i => assert(found.contains((i.toLong, 100L + i)), s"missing planted copy $i"))
  }

  test("ngram jaccard verifies candidates") {
    import spark.implicits._
    val pairs = Seq(("1", "2"), ("1", "3"), ("1", "5")).toDF("id_a", "id_b")
    val out = Dedup.ngramJaccard(docs, pairs).collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("1", "2")) == 1.0)
    assert(out(("1", "3")) > 0.4 && out(("1", "3")) < 1.0)
    assert(out(("1", "5")) == 0.0)
  }

  test("embedding near-dup with and without LSH agree on high-sim pairs") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.1f, 0.0f)),
      (2L, Array(0.98f, 0.01f, 0.12f, 0.0f)), // ~same direction as 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.2f)),
      (4L, Array(-1.0f, 0.1f, 0.0f, 0.3f))
    ).toDF("vec_id", "embedding")
    val brute = Dedup.embeddingNearDup(vecs, threshold = 0.95).collect()
    assert(brute.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    val lsh = Dedup.embeddingNearDup(vecs, threshold = 0.95, lshBits = 2).collect()
    assert(lsh.map(r => (r.getLong(0), r.getLong(1))).toSet.subsetOf(Set((1L, 2L))))
  }

  test("brute-force ANN top-k ranks by cosine") {
    import spark.implicits._
    val corpus = (0 until 50)
      .map(i => (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val out = SimilaritySearch.bruteForceTopK(corpus.where(col("vec_id") < 3), corpus.where(col("vec_id") >= 3), "vec_id", "embedding", 5)
    val byQ = out.collect().groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach { rows =>
      assert(rows.length == 5)
      val coss = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos"))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH ANN returns a subset consistent with brute force at rank 1") {
    import spark.implicits._
    val corpus = (0 until 80)
      .map(i => (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.3 + d * 1.1).toFloat)))
      .toDF("vec_id", "embedding")
    val qs = corpus.where(col("vec_id") < 2)
    val cs = corpus.where(col("vec_id") >= 2)
    val lsh = SimilaritySearch.lshTopK(qs, cs, "vec_id", "embedding", 3, bits = 4, tables = 3).collect()
    assert(lsh.nonEmpty)
    lsh.foreach(r => assert(r.getAs[Double]("cos") <= 1.0 + 1e-9))
  }

  test("IVF ANN recalls brute-force top-1 on clustered vectors") {
    import spark.implicits._
    // 8 well-separated direction clusters x 30 members
    val rng = new scala.util.Random(11)
    val dirs = Array.fill(8)(Array.fill(12)(rng.nextGaussian()))
    val all = (0 until 240).map { i =>
      val d = dirs(i % 8)
      (i.toLong, d.map(x => (x + 0.05 * rng.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val qs = all.where(col("vec_id") < 8)
    val cs = all.where(col("vec_id") >= 8)
    val brute = SimilaritySearch
      .bruteForceTopK(qs, cs, "vec_id", "embedding", 1)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("neighbor")).toMap
    val ivf = SimilaritySearch
      .ivfTopK(qs, cs, "vec_id", "embedding", 1, nList = 16, nProbe = 4)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("neighbor")).toMap
    assert(ivf.keySet == brute.keySet)
    val agree = brute.count { case (q, n) => ivf.get(q).contains(n) }
    info(s"IVF top-1 agreement: $agree/${brute.size}")
    assert(agree >= brute.size - 1, s"IVF recall too low: $agree/${brute.size}")
  }

  test("trained IVF codebook matches brute-force top-1 and beats/equals the sampled codebook") {
    import spark.implicits._
    // same 8-direction-cluster shape as the untrained IVF test
    val rng = new scala.util.Random(11)
    val dirs = Array.fill(8)(Array.fill(12)(rng.nextGaussian()))
    val all = (0 until 240).map { i =>
      val d = dirs(i % 8)
      (i.toLong, d.map(x => (x + 0.05 * rng.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val qs = all.where(col("vec_id") < 8)
    val cs = all.where(col("vec_id") >= 8)
    val codebook = SimilaritySearch.trainIvf(cs, "vec_id", "embedding", nList = 8, maxIters = 10)
    assert(codebook.length == 8 && codebook.forall(_.length == 12))
    // converged centroids must align with a true cluster direction
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    codebook.foreach { cen =>
      assert(dirs.exists(d => cos(cen, d) > 0.95), "centroid aligns with no true cluster")
    }
    val brute = SimilaritySearch
      .bruteForceTopK(qs, cs, "vec_id", "embedding", 1)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("neighbor")).toMap
    val trained = SimilaritySearch
      .ivfTopK(qs, cs, "vec_id", "embedding", 1, nList = 8, nProbe = 2, codebook = Some(codebook))
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("neighbor")).toMap
    val agree = brute.count { case (q, n) => trained.get(q).contains(n) }
    info(s"trained IVF top-1 agreement: $agree/${brute.size}")
    assert(agree == brute.size, s"trained IVF recall: $agree/${brute.size}")
    // deterministic across invocations (same membership every iteration)
    val codebook2 = SimilaritySearch.trainIvf(cs, "vec_id", "embedding", nList = 8, maxIters = 10)
    codebook.zip(codebook2).foreach { case (a, b) =>
      assert(cos(a, b) > 1.0 - 1e-9, "trainIvf not deterministic")
    }
  }

  test("trainIvf codebook is BIT-identical across partitioning / summation order") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val dirs = Array.fill(6)(Array.fill(10)(rng.nextGaussian()))
    val all = (0 until 300).map { i =>
      val d = dirs(i % 6)
      (i.toLong, d.map(x => (x + 0.05 * rng.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    // the chunked-long fixed-point cell sums make the per-cell mean exact and
    // order-independent: 1 partition, 7 partitions, 32 hash-scattered
    // partitions and a reversed row order must all produce the same BITS
    // (a resumed/replayed trained-IVF job then assigns boundary vectors
    // identically — the round-3 review's bit-stability requirement)
    val variants = Seq(
      all.coalesce(1),
      all.repartition(7),
      all.repartition(32, col("vec_id")),
      all.orderBy(col("vec_id").desc)
    )
    val books = variants.map(v => SimilaritySearch.trainIvf(v, "vec_id", "embedding", nList = 6, maxIters = 5))
    val ref = books.head
    books.tail.zipWithIndex.foreach { case (b, vi) =>
      assert(b.length == ref.length, s"variant $vi codebook size differs")
      ref.zip(b).zipWithIndex.foreach { case ((a, c), ci) =>
        assert(
          java.util.Arrays.equals(a, c),
          s"variant $vi centroid $ci differs bit-wise: ${a.mkString(",")} vs ${c.mkString(",")}"
        )
      }
    }
  }

  test("LSH near-dup default path recalls planted near-duplicates") {
    import spark.implicits._
    // 60 random-direction vectors + 20 planted near-dup pairs (cos > ~0.99)
    val rng = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(16)(rng.nextGaussian().toFloat)
    val base = (0 until 60).map(i => (i.toLong, vec()))
    val dups = (0 until 20).map { i =>
      val (id, v) = base(i)
      (100L + i, v.map(x => x + 0.02f * rng.nextGaussian().toFloat))
    }
    val all = (base ++ dups).toDF("vec_id", "embedding")
    val brute = Dedup
      .embeddingNearDup(all, threshold = 0.95, lshBits = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup
      .embeddingNearDupApprox(all, threshold = 0.95) // the explicit LSH scale path
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), "LSH must never invent pairs (exact verify)")
    assert(brute.size >= 20)
    val recall = lsh.size.toDouble / brute.size
    info(s"LSH recall vs brute force: $recall (${lsh.size}/${brute.size})")
    assert(recall >= 0.9, s"approx LSH recall $recall below 0.9")
  }

  test("dense-cell refinement keeps near-dup recall inside an oversized bucket") {
    import spark.implicits._
    // a DENSE cone: 300 vectors around one direction (all share every
    // sign-LSH bucket at 4 bits), of which 50 planted near-dup pairs at
    // cos >= 0.99. cap=50 forces k=3 refinement bits on the whole cell in
    // every table — the content-derived sub-keys must keep most true pairs
    // together (an id-salt here would destroy ~49/50 of them per table).
    val rng = new scala.util.Random(23)
    val dir = Array.fill(16)(rng.nextGaussian())
    val norm = math.sqrt(dir.map(x => x * x).sum)
    val unit = dir.map(_ / norm)
    def inCone(eps: Double): Array[Float] =
      unit.map(x => (x + eps * rng.nextGaussian()).toFloat)
    val base = (0 until 300).map(i => (i.toLong, inCone(0.12)))
    val dups = (0 until 50).map { i =>
      val (_, v) = base(i)
      (1000L + i, v.map(x => x + 0.015f * rng.nextGaussian().toFloat))
    }
    val all = (base ++ dups).toDF("vec_id", "embedding")
    val brute = Dedup
      .embeddingNearDup(all, threshold = 0.99, lshBits = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size >= 50, s"planted pairs missing from exact answer: ${brute.size}")
    val refined = Dedup
      .embeddingNearDup(all, threshold = 0.99, lshBits = 4, lshTables = 6, maxBucketRows = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(refined.subsetOf(brute), "refinement must never invent pairs")
    val recall = refined.size.toDouble / brute.size
    info(s"refined recall in dense cell: $recall (${refined.size}/${brute.size})")
    assert(recall >= 0.85, s"dense-cell refinement recall $recall below 0.85")
  }

  test("decodeMeta plan has zero exchanges (row-local expression)") {
    import spark.implicits._
    val media = Seq((1L, "abc".getBytes), (2L, "def".getBytes)).toDF("id", "payload")
    val plan = Multimodal.decodeMeta(media, "id", "payload").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decodeMeta must not shuffle:\n$plan")
  }

  test("decodeMeta: NULL payload decodes like empty (kind=unknown), not to a null struct") {
    import spark.implicits._
    val media = Seq((1L, "x".getBytes), (2L, null: Array[Byte])).toDF("id", "payload")
    val rows = Multimodal.decodeMeta(media, "id", "payload")
      .select("id", "meta.kind", "meta.n_bytes")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(2L).getAs[String]("kind") == "unknown")
    assert(rows(2L).getAs[Long]("n_bytes") == 0L)
  }

  test("text analysis: langid, quality, token counts") {
    val out = TextAnalysis.annotate(docs).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("lang_pred") == "en")
    assert(out(4L).getAs[String]("lang_pred") == "de")
    assert(out(5L).getAs[String]("lang_pred") == "unk")
    assert(out(1L).getAs[Long]("n_tokens") == 13L)
    val q1 = out(1L).getAs[Double]("quality")
    val q5 = out(5L).getAs[Double]("quality")
    assert(q1 > 0 && q1 <= 1.0 && q5 > 0 && q5 <= 1.0)
    assert(out(1L).getAs[Long]("fingerprint") == out(2L).getAs[Long]("fingerprint"))
  }

  test("blocking eval: candidate count from block sizes, coverage, closed form") {
    import spark.implicits._
    // 4 docs: key k1 = {a,b,c} (3 candidates), k2 = {c,d} (1 candidate),
    // doc e emits no key. N = 4 keyed docs -> C(4,2) = 6 total.
    val keys = Seq(("a", "k1"), ("b", "k1"), ("c", "k1"), ("c", "k2"), ("d", "k2"))
      .toDF("url", "key")
    // gold: (a,b) covered by k1, (c,d) covered by k2, (a,d) NOT covered,
    // (a,e) has a keyless member -> not covered; labels filter applies
    val gold = Seq(
      ("a", "b", true),
      ("c", "d", true),
      ("a", "d", true),
      ("a", "e", true),
      ("b", "c", false)
    ).toDF("url_a", "url_b", "label")
    val m = graft.eval.BlockingEval.metricsDf(keys, gold).collect()(0)
    assert(m.getAs[Long]("n_docs") == 4L)
    assert(m.getAs[Long]("candidates") == 4L, "C(3,2) + C(2,2) = 3 + 1")
    assert(m.getAs[Long]("gold_pairs") == 4L)
    assert(m.getAs[Long]("covered") == 2L)
    assert(math.abs(m.getAs[Double]("reduction_ratio") - (1.0 - 4.0 / 6.0)) < 1e-6)
    assert(math.abs(m.getAs[Double]("pairs_completeness") - 0.5) < 1e-6)
    assert(math.abs(m.getAs[Double]("pairs_quality") - 0.5) < 1e-6)
  }

  test("htmlText: drops chrome, strips tags, decodes entities once, collapses ws") {
    import spark.implicits._
    val cases = Seq(
      // head (incl. title), style, script, comments all removed with content
      (1L, "<html><head><title>NO</title><style>b{}</style></head>" +
        "<body><p>keep</p><script>if (1 < 2) alert('x')</script><!-- no --></body></html>", "keep"),
      // single-pass entity decode: &amp;lt; -> &lt; (never to '<')
      (2L, "<body>a &amp;lt; b &amp; c &lt;d&gt; &quot;e&quot; &#39;f&#39;&nbsp;g</body>",
        "a &lt; b & c <d> \"e\" 'f' g"),
      // whitespace runs across removed blocks collapse to one space
      (3L, "<body>  x \n\n <b>y</b>\t z  </body>", "x y z")
    ).toDF("id", "html_s", "expected")
    val got = cases
      .select(col("id"), TextAnalysis.htmlText(encode(col("html_s"), "UTF-8")).as("t"), col("expected"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    got.foreach { case (id, (t, exp)) => assert(t == exp, s"case $id: got '$t'") }
    // the north-rule invariant end-to-end: extraction over the synthetic
    // corpus's html column recovers the text column byte-identically
    val corpus = graft.synth.WebCorpus.pages(spark).toDF().limit(200)
    val mismatches = corpus
      .where(TextAnalysis.htmlText(col("html")) =!= col("text"))
      .count()
    assert(mismatches == 0L, "htmlText(html) must equal text per url")
  }

  test("bpe-ish token count splits punctuation and digits") {
    import spark.implicits._
    val df = Seq("hello, world! v2.0").toDF("text")
      .select(TextAnalysis.tokenCountBpeIsh(col("text")).as("n"))
    // hello , world ! v2 . 0 — whitespace pieces are separators, NOT
    // tokens (counting them inflated prose estimates ~2x)
    assert(df.collect()(0).getLong(0) == 7)
  }

  test("multimodal: stub decode plumbing produces typed metadata") {
    import spark.implicits._
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte) ++ "payload".getBytes
    val mp4 = Array[Byte](0x66, 0x74, 0x79, 0x70) ++ "moov".getBytes
    val media = Seq((1L, jpeg), (2L, mp4), (3L, Array.empty[Byte])).toDF("id", "payload")
    val meta = Multimodal.decodeMeta(media, "id", "payload")
    val rows = meta.select("id", "meta.*").collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[String]("kind") == "image")
    assert(rows(2L).getAs[String]("kind") == "video")
    assert(rows(1L).getAs[Long]("n_bytes") == jpeg.length.toLong)
    assert(rows(1L).getAs[Int]("width") > 0)
    // frame sampling plan only for video, deterministic spacing
    val frames = Multimodal.frameSamplePlan(meta, "id", everyMs = 500L).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getLong(0) == 2L))
    // featurize stub: fixed width, deterministic
    val f = Multimodal.featurizeStub(media, "id", "payload", dim = 8).collect()
    assert(f.forall(_.getSeq[Double](1).size == 8))
  }

  test("multimodal: resizePlan fits images into the box, never upscales, clamps to 1px") {
    import spark.implicits._
    val jpegA = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte) ++ "a".getBytes
    val jpegB = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte) ++ "bb".getBytes
    val mp4 = Array[Byte](0x66, 0x74, 0x79, 0x70) ++ "moov".getBytes
    val media = Seq((1L, jpegA), (2L, jpegB), (3L, mp4)).toDF("id", "payload")
    val meta = Multimodal.decodeMeta(media, "id", "payload")
    val out = Multimodal.resizePlan(meta, "id", 100, 100)
      .collect().map(r => r.getLong(0) -> r).toMap
    // non-images are excluded from the resize plan
    assert(!out.contains(3L) && out.contains(1L) && out.contains(2L))
    out.values.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      val s = r.getAs[Double]("scale")
      assert(ow <= 100 && oh <= 100, s"($ow,$oh) must fit the 100-box")
      assert(ow >= 1 && oh >= 1)
      assert(s <= 1.0, "never upscale")
      // the long side fills the box (stub dims are always > 100 here)
      assert(math.max(ow, oh) >= 99, s"long side $ow x $oh should fill the box")
      assert(s == math.min(1.0, math.min(100.0 / w, 100.0 / h)))
    }
    // upscale guard: a tiny image passes through at scale 1 unchanged
    val tiny = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(9L, org.apache.spark.sql.Row(5L, "ffd8", "image", 3, 7, 0L))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("meta", graft.functions.MediaKernels.metaType)
      ))
    )
    val t9 = Multimodal.resizePlan(tiny, "id", 100, 100).collect()(0)
    assert(t9.getAs[Int]("out_w") == 3 && t9.getAs[Int]("out_h") == 7 && t9.getAs[Double]("scale") == 1.0)
  }

  test("unigram LM scoring: closed-form log-probs, prose beats gibberish, frozen-model deltas") {
    import spark.implicits._
    // 3 docs over a tiny vocab; buckets large enough that distinct words
    // land in distinct buckets (closed form stays hand-computable)
    val docs = Seq(
      (1L, "aa aa bb"),
      (2L, "aa bb cc"),
      (3L, "")
    ).toDF("doc_id", "text")
    val buckets = 1 << 16
    val (model, total) = TextAnalysis.unigramModel(docs, buckets = buckets)
    // counts: aa=3, bb=2, cc=1, ""=1 (empty doc splits to one empty token)
    assert(total == 7L, s"total=$total")
    assert(model.count() == 4L)
    val scored = TextAnalysis
      .unigramLogProb(docs, model, total, buckets = buckets)
      .select("doc_id", "lp_mean")
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    val denom = total + buckets.toDouble
    def lp(c: Long) = math.log((c + 1.0) / denom)
    assert(math.abs(scored(1L) - (2 * lp(3) + lp(2)) / 3.0) < 1e-12, scored(1L).toString)
    assert(math.abs(scored(2L) - (lp(3) + lp(2) + lp(1)) / 3.0) < 1e-12)
    // doc 3: one empty-string token, corpus count 1
    assert(math.abs(scored(3L) - lp(1)) < 1e-12)

    // repeated common words score above unseen-by-the-model gibberish —
    // the filtering signal; gibberish hits the default (unseen) logprob
    val frozen = Seq((9L, "aa aa bb"), (10L, "zz qq xx")).toDF("doc_id", "text")
    val f = TextAnalysis
      .unigramLogProb(frozen, model, total, buckets = buckets)
      .select("doc_id", "lp_mean")
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(f(9L) > f(10L), s"prose ${f(9L)} must outscore gibberish ${f(10L)}")
    assert(math.abs(f(10L) - math.log(1.0 / denom)) < 1e-12, "unseen words take the default logprob")
  }

  test("minHashPlan: closed-form S-curve banding, deepest feasible rows, clamp path") {
    // t=0.8, recall 0.95, budget 128: r=7 needs ceil(ln.05/ln(1-0.8^7))=13
    // bands (91 slots); r=8 would need 17 bands (136 > 128). Hand-checked.
    val p = graft.operators.Dedup.minHashPlan(0.8, 0.95, 128)
    assert(p.rows === 7 && p.bands === 13 && p.numHashes === 91)
    assert(p.expectedRecall >= 0.95 && p.expectedRecall < 1.0)
    assert(math.abs(p.expectedRecall - (1.0 - math.pow(1.0 - math.pow(0.8, 7), 13))) < 1e-12)
    // the whole point of deep bands: sub-threshold pairs almost never collide
    assert(p.fpAtHalf < 0.05, s"fpAtHalf=${p.fpAtHalf}")
    // higher threshold affords deeper bands under the same budget
    assert(graft.operators.Dedup.minHashPlan(0.9, 0.95, 128).rows > p.rows)
    // infeasible budget degrades to (1, maxHashes) and reports the shortfall
    val clamped = graft.operators.Dedup.minHashPlan(0.05, 0.99, 4)
    assert(clamped.rows === 1 && clamped.bands === 4 && clamped.expectedRecall < 0.99)
    // recall monotone in the budget
    assert(
      graft.operators.Dedup.minHashPlan(0.8, 0.95, 256).expectedRecall >= p.expectedRecall ||
        graft.operators.Dedup.minHashPlan(0.8, 0.95, 256).rows > p.rows
    )
  }
}
