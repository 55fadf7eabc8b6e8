package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Plan audits: the properties every 100 TB plan must keep — filters and
  * projections reaching the parquet scan, broadcast of bounded sides, no
  * exchange for row-local derivations. Asserted on the executed plan text
  * so a regression (a lost pushdown, an accidental shuffle) fails CI, not a
  * cluster bill.
  */
class PlanAuditSpec extends SparkSpec {

  private lazy val dir = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-audit").toString + "/t"
    (0 until 1000)
      .map(i => (i.toLong, s"text-$i", s"lang${i % 3}", i % 100))
      .toDF("id", "text", "lang", "score")
      .write.parquet(d)
    d
  }

  test("filter and projection push down to the parquet scan") {
    val q = spark.read
      .parquet(dir)
      .where(col("score") > 50 && col("lang") === "lang1")
      .select("id", "lang")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThan(score,50)"), plan)
    // pruned read schema: text column must NOT be scanned
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"), readSchema)
  }

  test("pair scoring joins stay inside whole-stage codegen") {
    import spark.implicits._
    val pages = (0 until 200)
      .map(i => (s"https://d$i.org/p", s"tok$i words common here for scoring"))
      .toDF("url", "text")
    val feats = graft.operators.PairScorer.features(pages)
    val pairs = Seq(("https://d1.org/p", "https://d2.org/p", "k"))
      .toDF("urlA", "urlB", "key")
    val scored = graft.operators.PairScorer.score(pairs, feats)
    scored.collect() // finalize the adaptive plan: codegen spans appear post-execution
    val plan = scored.queryExecution.executedPlan.toString
    // "*(n)" node prefixes mark whole-stage-codegen spans; the kernel
    // projection and both feature joins must carry one
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("jaro_winkler")), plan)
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("BroadcastHashJoin")), plan)
    // the similarity kernels are codegen'd expressions, not udfs
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"), plan)
  }

  test("battery near-dup and pairwise-eval plans are keyed, never cartesian") {
    // the round-2 verdict's scale-killer findings: these two battery queries
    // used all-pairs joins; they must stay on bucketed/keyed plans
    val sf = "/root/testdata/sf0.001"
    for (
      name <- Seq(
        "q_dd_embedding_neardup",
        "q_a7_pairwise_eval",
        "q_er_pipeline_sym",
        "q_dd_line_dedup",
        "q_inc_link",
        "q_er_sorted_neighborhood",
        "q_cur_decontaminate",
        "q_cur_quota_sample",
        "q_dd_span_dedup",
        "q_dd_resolve",
        "q_corpus_build",
        "q_er_ccpivot",
        "q_er_pr_curve",
        "q_er_active",
        "q_er_survivorship",
        "q_er_fs_levels",
        "q_er_dl_score",
        // session-2 additions: the decremental theorem row, the matching
        // round, cross-table link_only, the skew census and diagnostics
        "q_inc_unlink",
        "q_er_mutual_best",
        "q_er_link_tables",
        "q_er_skew_census",
        "q_er_cluster_diag",
        "q_rc_latest"
      )
    ) {
      val q = graft.SparkEntry.queries(name)(spark, sf)
      q.collect() // finalize AQE before reading the executed plan
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name:\n$plan")
    }
  }

  test("meta-blocking / Fellegi-Sunter plans: keyed joins, nested-loop only for 1-row scalar frames") {
    // these queries deliberately crossJoin(broadcast(<1-row aggregate>))
    // (WEP mean, |B| total, FS u-probability constants, ClusterEval
    // entropy scalars), which plans as BroadcastNestedLoopJoin. That is
    // fine at any scale. What must NEVER appear: a CartesianProduct, or a
    // nested-loop join with a CONDITION (the theta-join shape a broken
    // equi-join degrades to — that one is quadratic).
    val sf = "/root/testdata/sf0.001"
    for (
      name <- Seq(
        "q_er_metablock_wep",
        "q_er_metablock_cnp",
        "q_er_fs_score",
        "q_er_fs_pipeline",
        "q_er_cluster_eval",
        "q_er_cluster_ari",
        "q_cur_dsir_sample",
        "q_cur_kl_drift"
      )
    ) {
      val q = graft.SparkEntry.queries(name)(spark, sf)
      q.collect() // finalize AQE before reading the executed plan
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name:\n$plan")
      plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).foreach { l =>
        assert(
          l.contains("Cross") && !l.contains("condition"),
          s"$name has a conditioned nested-loop join (quadratic):\n$l"
        )
      }
    }
  }

  test("row-local operators execute with ZERO exchanges") {
    // these must all run inside the scan projection — one Exchange node in
    // any of them is a 100 TB shuffle bill for row-local work
    val base = spark.read.parquet(dir)
    val cases: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "htmlText" -> base.select(
        col("id"),
        graft.operators.TextAnalysis.htmlText(encode(col("text"), "UTF-8")).as("t")
      ),
      "redactPii" -> graft.operators.Curation.redactPii(base.select(col("id"), col("text"))),
      "hashSplit" -> graft.operators.Curation
        .hashSplit(base.select(col("id")), Seq("train" -> 0.9, "test" -> 0.1), keyCol = "id"),
      "qualityGate" -> graft.operators.Curation
        .qualityGate(base.select(col("id"), split(col("text"), " ").as("toks")), idCol = "id"),
      "annotate" -> graft.operators.TextAnalysis.annotate(base.select(col("id"), col("text")))
    )
    for ((name, q) <- cases) {
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$name shuffles row-local work:\n$plan")
    }
  }

  test("per-key threshold table joins as a broadcast") {
    import spark.implicits._
    val scored = (0 until 500)
      .map(i => (s"a$i", s"b$i", s"u:k${i % 7}", i / 500.0))
      .toDF("urlA", "urlB", "key", "score")
    val perKey = Seq(("u:k1", 0.2)).toDF("key", "threshold")
    val out = graft.operators.PairScorer.threshold(scored, perKey = Some(perKey))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
