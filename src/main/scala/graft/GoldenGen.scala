package graft

import org.apache.spark.sql.SparkSession

/** Golden-fixture generator for the custom-kernel queries that have no
  * ANSI-SQL oracle (MinHash/SimHash signatures, sign-LSH buckets, the full
  * linkage pipeline). Run ONCE against the correctness scale factor:
  *
  *   sbt 'runMain graft.GoldenGen /root/testdata/sf0.01 golden'
  *
  * and commit the output. The kernels themselves are exactness-tested in
  * ScalaTest (SimilaritySpec/OperatorsSpec/PipelineSpec); the fixture oracle
  * then pins cross-run, cross-parallelism, cross-session determinism —
  * any kernel or plan change that silently alters results turns the
  * CORRECTNESS row red.
  */
object GoldenGen {

  // q_dd_simhash, q_dd_minhash_pairs, q_txt_fingerprint, q_ann_lsh and
  // q_er_jw_score graduated to fully symbolic DuckDB oracles (FNV-1a /
  // shingle-fold / family-mix / splitmix64+ordered-float-dot arithmetic and
  // a recursive-CTE textbook Jaro-Winkler recomputed in SQL) — no fixtures
  // needed since round 3. Still fixture-pinned: IVF (argmin over trained
  // centroids) and the full pipeline (inherently engine-defined) — both
  // exactness-tested in ScalaTest.
  val fixtureQueries: Seq[String] = Seq(
    "q_ann_ivf",
    "q_er_pipeline"
  )

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession
      .builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    fixtureQueries.foreach { name =>
      SparkEntry
        .queries(name)(spark, sfDir)
        .coalesce(1)
        .write
        .mode("overwrite")
        .parquet(s"$outDir/$name")
      System.err.println(s"[golden] wrote $outDir/$name")
    }
    spark.stop()
  }
}
