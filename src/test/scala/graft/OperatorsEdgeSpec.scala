package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SimilaritySearch, TextAnalysis}

/** Degenerate-input behavior of the dedup / ANN / text-analysis family: at
  * web scale every partition contains blank, null, and single-token docs
  * and zero-length or null embedding vectors — none may throw (ANSI mode)
  * and each must produce the documented value, not garbage.
  */
class OperatorsEdgeSpec extends SparkSpec {

  private def docs(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("text analysis annotates blank, null, and single-token docs without throwing") {
    val out = TextAnalysis
      .annotate(docs("d1" -> "", "d2" -> null, "d3" -> "   ", "d4" -> "hello"))
      .collect()
      .map(r => r.getAs[String]("doc_id") -> r)
      .toMap
    assert(out.size === 4)
    // blank docs: zero tokens, 'unk' language
    Seq("d1", "d3").foreach { id =>
      assert(out(id).getAs[Long]("n_tokens") === 0L)
      assert(out(id).getAs[String]("lang_pred") === "unk")
    }
    // null text: no-signal language verdict ('unk'), null token count —
    // never an error
    assert(out("d2").getAs[String]("lang_pred") === "unk")
    assert(out("d2").isNullAt(out("d2").fieldIndex("n_tokens")))
    assert(out("d4").getAs[Long]("n_tokens") === 1L)
  }

  test("exact dedup keeps null-text docs as singletons instead of dropping them") {
    val out = Dedup
      .exactText(docs("a" -> null, "b" -> "same text", "c" -> "same text", "d" -> null))
      .collect()
      .map(r => r.getAs[String]("doc_id") -> (r.getAs[String]("canonical"), r.getAs[Long]("n")))
      .toMap
    assert(out.size === 4, s"no doc may vanish: $out")
    // null-text docs: own singleton each, never merged with each other
    assert(out("a") === ("a", 1L))
    assert(out("d") === ("d", 1L))
    assert(out("b") === ("b", 2L) && out("c") === ("b", 2L))
  }

  test("minhash pairs: blank docs emit no keys, so no pairs (P4 semantics)") {
    val pairs = Dedup.minHashPairs(docs("a" -> "", "b" -> "  ", "c" -> null, "d" -> "some real content here"))
    assert(pairs.count() === 0)
  }

  test("simhash pairs on blank docs neither throw nor pair blank with non-blank") {
    val pairs = Dedup
      .simHashPairs(docs("a" -> "", "b" -> "   ", "c" -> "real content of this page"))
      .collect()
    // blank-blank may legitimately pair (identical empty fingerprints);
    // blank must never pair with real content
    assert(!pairs.exists(r => Set(r.getAs[String]("id_a"), r.getAs[String]("id_b")).contains("c")))
  }

  test("ngram jaccard over blank/null pairs yields 0.0, not a division error") {
    import spark.implicits._
    val pairs = Seq(("a", "b"), ("a", "c")).toDF("id_a", "id_b")
    val out = Dedup
      .ngramJaccard(docs("a" -> "", "b" -> null, "c" -> "words here"), pairs)
      .collect()
      .map(r => (r.getAs[String]("id_b"), Option(r.get(r.fieldIndex("jaccard")))))
      .toMap
    // null text propagates null (no verdict), empty-vs-nonempty is 0.0
    assert(out("b").isEmpty)
    assert(out("c").contains(0.0))
  }

  test("embedding near-dup tolerates empty and null vectors (cosine 0, no pair)") {
    import spark.implicits._
    val e = Seq(
      ("v1", Seq.empty[Double]),
      ("v2", Seq(1.0, 0.0)),
      ("v3", Seq(1.0, 0.0)),
      ("v4", null.asInstanceOf[Seq[Double]])
    ).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDup(e, threshold = 0.9).collect()
    assert(exact.map(r => (r.getString(0), r.getString(1))).toSet === Set(("v2", "v3")))
    val approx = Dedup.embeddingNearDupApprox(e, threshold = 0.9).collect()
    assert(approx.map(r => (r.getString(0), r.getString(1))).toSet === Set(("v2", "v3")))
  }

  test("brute-force top-k with empty corpus returns an empty frame, not an error") {
    import spark.implicits._
    val q = Seq(("q1", Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val empty = Seq.empty[(String, Seq[Double])].toDF("vec_id", "embedding")
    assert(SimilaritySearch.bruteForceTopK(q, empty, "vec_id", "embedding", 5).count() === 0)
  }

  test("ivf top-k fails loudly (not silently) on an empty corpus") {
    import spark.implicits._
    val q = Seq(("q1", Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val empty = Seq.empty[(String, Seq[Double])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SimilaritySearch.ivfTopK(q, empty, "vec_id", "embedding", 5)
    }
    assert(e.getMessage.contains("empty corpus"))
  }
}
