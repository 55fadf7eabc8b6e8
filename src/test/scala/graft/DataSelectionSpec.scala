package graft

import org.apache.spark.sql.functions._

import graft.operators.{DataSelection, TextAnalysis}

class DataSelectionSpec extends SparkSpec {
  import spark.implicits._

  // raw corpus: 6 docs — 3 written in the target's vocabulary, 3 not
  private def raw = Seq(
    (1L, "cat dog cat dog"),
    (2L, "cat cat cat dog"),
    (3L, "dog cat dog dog"),
    (4L, "xy zq xy zq"),
    (5L, "zq zq xy xy"),
    (6L, "xy xy xy zq")
  ).toDF("doc_id", "text")

  private def target = Seq(
    (100L, "cat dog cat"),
    (101L, "dog cat dog cat")
  ).toDF("doc_id", "text")

  test("importanceWeights: logw = n_tok * (lp_target - lp_raw), target-like docs win") {
    val w = DataSelection.importanceWeights(raw, target, buckets = 4096)
    val rows = w
      .select($"doc_id", $"n_tok", $"lp_target", $"lp_raw", $"logw")
      .as[(Long, Long, Double, Double, Double)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    rows.values.foreach { case (_, n, lpt, lpr, logw) =>
      assert(math.abs(logw - n * (lpt - lpr)) < 1e-12)
      assert(n === 4L)
    }
    // every target-vocabulary doc outweighs every out-of-vocabulary doc
    val inVocab = Seq(1L, 2L, 3L).map(rows(_)._5)
    val outVocab = Seq(4L, 5L, 6L).map(rows(_)._5)
    assert(inVocab.min > outVocab.max)
    // out-of-vocab docs: every token unseen by the target model, so
    // lp_target is the default ln(1/(total+buckets)) exactly
    val (_, _, lpt4, _, _) = rows(4L)
    assert(math.abs(lpt4 - math.log(1.0 / (7 + 4096))) < 1e-12)
  }

  test("weighted scores against frozen persisted models identically") {
    val (mt, tt) = TextAnalysis.unigramModel(target, buckets = 4096)
    val (mr, tr) = TextAnalysis.unigramModel(raw, buckets = 4096)
    val a = DataSelection
      .importanceWeights(raw, target, buckets = 4096)
      .select("doc_id", "logw")
      .as[(Long, Double)]
      .collect()
      .toMap
    val b = DataSelection
      .weighted(raw, mt, tt, mr, tr, buckets = 4096)
      .select("doc_id", "logw")
      .as[(Long, Double)]
      .collect()
      .toMap
    assert(a === b)
  }

  test("gumbelTopK is seed-deterministic and partitioning-invariant") {
    val w = DataSelection.importanceWeights(raw, target, buckets = 4096)
    val s1 = DataSelection.gumbelTopK(w, "doc_id", 3, seed = 7L).select("doc_id").as[Long].collect().toSet
    val s2 = DataSelection
      .gumbelTopK(w.repartition(7), "doc_id", 3, seed = 7L)
      .select("doc_id")
      .as[Long]
      .collect()
      .toSet
    assert(s1 === s2 && s1.size === 3)
    // noise actually varies with the seed (keys differ, not necessarily sets)
    val k7 = DataSelection.gumbelTopK(w, "doc_id", 6, 7L).select("doc_id", "gumbel_key").as[(Long, Double)].collect().toMap
    val k8 = DataSelection.gumbelTopK(w, "doc_id", 6, 8L).select("doc_id", "gumbel_key").as[(Long, Double)].collect().toMap
    assert(k7 !== k8)
  }

  test("gumbelTopK: dominant weights override the noise; topK is the hard cut") {
    val w = raw
      .withColumn("logw", when($"doc_id" <= 3, lit(1000.0)).otherwise(lit(-1000.0)))
    assert(
      DataSelection.gumbelTopK(w, "doc_id", 3, 42L).select("doc_id").as[Long].collect().toSet ===
        Set(1L, 2L, 3L)
    )
    val hard = DataSelection.topK(w.withColumn("logw", $"logw" + $"doc_id"), "doc_id", 2)
    assert(hard.select("doc_id").as[Long].collect().toSet === Set(2L, 3L))
  }

  test("bigram features separate word order that unigrams cannot see") {
    // same unigram multiset, different order: "cat dog cat dog" vs
    // "dog dog cat cat" — the target is pure cat-dog alternation
    val rawDocs = Seq((1L, "cat dog cat dog"), (2L, "dog dog cat cat")).toDF("doc_id", "text")
    val tgt = Seq((9L, "cat dog cat dog cat dog")).toDF("doc_id", "text")
    val uni = DataSelection
      .importanceWeights(rawDocs, tgt, buckets = 4096)
      .select("doc_id", "logw")
      .as[(Long, Double)]
      .collect()
      .toMap
    assert(math.abs(uni(1L) - uni(2L)) < 1e-12, "unigram view must tie the two orders")
    val bi = DataSelection
      .importanceWeightsBigram(rawDocs, tgt, buckets = 4096)
      .select("doc_id", "logw")
      .as[(Long, Double)]
      .collect()
      .toMap
    assert(bi(1L) > bi(2L), s"alternating order must win under bigrams: $bi")
    // single-token doc: zero bigram features, zero weight
    val one = DataSelection
      .importanceWeightsBigram(Seq((5L, "cat")).toDF("doc_id", "text"), tgt, buckets = 4096)
      .select("n_tok", "logw")
      .as[(Long, Double)]
      .collect()(0)
    assert(one === ((0L, 0.0)))
  }

  test("k must be positive") {
    val w = raw.withColumn("logw", lit(0.0))
    intercept[IllegalArgumentException](DataSelection.gumbelTopK(w, "doc_id", 0))
    intercept[IllegalArgumentException](DataSelection.topK(w, "doc_id", 0))
  }

  test("klDrift: zero on identical slices, positive + asymmetric on drifted ones") {
    val a = Seq((1L, "cat dog cat"), (2L, "dog fish dog")).toDF("doc_id", "text")
    val b = Seq((3L, "zebra yak zebra yak zebra")).toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val same = DataSelection
      .klDrift(a, a, toks, buckets = 256)
      .as[(Long, Long, Double, Double, Double)]
      .collect()(0)
    assert(same._1 === 256L)
    assert(same._3 === 0.0 && same._4 === 0.0 && same._5 === 0.0)
    val drift = DataSelection
      .klDrift(a, b, toks, buckets = 256)
      .as[(Long, Long, Double, Double, Double)]
      .collect()(0)
    assert(drift._3 > 0.0 && drift._4 > 0.0, s"drifted KL must be positive: $drift")
    assert(drift._5 > 0.0 && drift._5 <= 1.0, s"tv in (0,1]: $drift")
  }

  test("klDrift equals a driver-side recomputation over the model frames (all buckets)") {
    val rawD = Seq((1L, "a b c a"), (2L, "b d"), (3L, "e f g")).toDF("doc_id", "text")
    val tgtD = Seq((4L, "a b a b"), (5L, "c")).toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val buckets = 64
    val (mt, tt) = graft.operators.TextAnalysis.ngramModel(tgtD, toks, buckets)
    val (mr, tr) = graft.operators.TextAnalysis.ngramModel(rawD, toks, buckets)
    val ct = mt.as[(Long, Long)].collect().toMap
    val cr = mr.as[(Long, Long)].collect().toMap
    val denT = tt.toDouble + buckets
    val denR = tr.toDouble + buckets
    var kl = 0.0; var klr = 0.0; var l1 = 0.0
    (0L until buckets.toLong).foreach { bkt =>
      val pt = (ct.getOrElse(bkt, 0L) + 1.0) / denT
      val pr = (cr.getOrElse(bkt, 0L) + 1.0) / denR
      kl += pt * math.log(pt / pr); klr += pr * math.log(pr / pt); l1 += math.abs(pt - pr)
    }
    val got = DataSelection
      .klDrift(rawD, tgtD, toks, buckets)
      .as[(Long, Long, Double, Double, Double)]
      .collect()(0)
    assert(got._2 === (ct.keySet ++ cr.keySet).size.toLong)
    assert(math.abs(got._3 - kl) < 1e-6, s"kl ${got._3} vs $kl") // operator rounds to 6
    assert(math.abs(got._4 - klr) < 1e-6)
    assert(math.abs(got._5 - l1 / 2.0) < 1e-6)
  }
}
