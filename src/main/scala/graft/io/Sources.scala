package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Sources & sinks mirroring the reference's I/O surface (SURVEY.md §2.1):
  * S1/S8 CSV scan + quote-all incremental sink, S3 inline JSON table
  * source, S11 sha-keyed candidate cache with hit/miss split (J3).
  */
object Sources {

  /** S1: header CSV scan with explicit schema (partitioned scan subsumes
    * the reference's row-chunking, lion_linker.py:1349-1351).
    */
  def csvScan(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", true).schema(schema).csv(path)

  /** S8: CSV sink with the reference's quoting discipline — QUOTE_ALL +
    * escape char (lion_linker.py:1383-1402); append mode = the incremental
    * per-chunk commit.
    */
  def csvSink(df: DataFrame, path: String, append: Boolean = false): Unit =
    df.write
      .mode(if (append) "append" else "overwrite")
      .option("header", true)
      .option("quoteAll", true)
      .option("escape", "\\")
      .csv(path)

  /** S4 (multipart half): merge uploaded byte parts into one file, the
    * reference's finalize step (app/api/routes.py:303-337) — list
    * `<partsDir>/<n>.part` files with integer stems, sort by part number,
    * optionally verify 1..totalParts are all present (the reference 409s
    * listing the missing numbers), then stream-concatenate bytes to
    * `targetPath`. Hadoop FS streams end to end: parts never materialize in
    * memory and the merged file can land on any cluster filesystem. Returns
    * total bytes written; feed the target to [[csvScan]].
    */
  def mergeParts(
      spark: SparkSession,
      partsDir: String,
      targetPath: String,
      totalParts: Option[Int] = None
  ): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(partsDir)
    val fs = dir.getFileSystem(conf)
    require(fs.exists(dir), s"Upload parts not found: $partsDir")
    val parts = fs
      .listStatus(dir)
      .toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".part"))
      .flatMap { st =>
        val stem = st.getPath.getName.stripSuffix(".part")
        stem.toIntOption.map(_ -> st.getPath)
      }
      .sortBy(_._1)
    // with a declared count, merge EXACTLY parts 1..N (the reference
    // finalize reads range(1, total_parts+1)) — a stale 0.part or a
    // leftover part beyond N from an aborted upload must not leak foreign
    // bytes into the merged file
    val selected = totalParts match {
      case Some(expected) =>
        val have = parts.map(_._1).toSet
        val missing = (1 to expected).filterNot(have)
        require(missing.isEmpty, s"Missing parts: ${missing.mkString(", ")}")
        val inRange = parts.filter { case (i, _) => i >= 1 && i <= expected }
        // two filenames parsing to the same index ('1.part' beside
        // '000001.part') would concatenate that part's bytes twice
        val dup = inRange.groupBy(_._1).filter(_._2.size > 1).keys
        require(dup.isEmpty, s"Duplicate part numbers: ${dup.toSeq.sorted.mkString(", ")}")
        inRange
      case None =>
        // no declared count: still refuse the silent-corruption cases —
        // duplicate numbers ('1.part' beside '000001.part') and gaps (a
        // stale high-numbered leftover from an aborted larger upload).
        // Numbering may start at 0 or 1 (a stale 0.part before a 1-based
        // upload is indistinguishable without a declared count; pass
        // totalParts for the reference's strict 1..N semantics).
        val dup = parts.groupBy(_._1).filter(_._2.size > 1).keys
        require(dup.isEmpty, s"Duplicate part numbers: ${dup.toSeq.sorted.mkString(", ")}")
        val nums = parts.map(_._1)
        nums.headOption.foreach { lo =>
          require(lo == 0 || lo == 1, s"Part numbering must start at 0 or 1, found $lo")
          val have = nums.toSet
          val missing = (lo to nums.last).filterNot(have)
          require(missing.isEmpty, s"Missing parts: ${missing.mkString(", ")}")
        }
        parts
    }
    val target = new org.apache.hadoop.fs.Path(targetPath)
    val out = target.getFileSystem(conf).create(target, true)
    val buf = new Array[Byte](1024 * 1024)
    var written = 0L
    try {
      selected.foreach { case (_, p) =>
        val in = fs.open(p)
        try {
          var n = in.read(buf)
          while (n >= 0) {
            if (n > 0) { out.write(buf, 0, n); written += n }
            n = in.read(buf)
          }
        } finally in.close()
      }
    } finally out.close()
    written
  }

  /** S3: inline {header, rows} table source (app/services/linker.py:294-311)
    * — width-validated, row_id injected when absent.
    */
  def inlineTable(spark: SparkSession, header: Seq[String], rows: Seq[Seq[String]]): DataFrame = {
    require(header.nonEmpty, "header must be non-empty")
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.size == header.size, s"row $i width ${r.size} != header width ${header.size}")
    }
    val schema = StructType(StructField("row_id", org.apache.spark.sql.types.LongType) +: header.map(StructField(_, StringType)))
    val data = rows.zipWithIndex.map { case (r, i) => Row.fromSeq(i.toLong +: r) }
    spark.createDataFrame(spark.sparkContext.parallelize(data), schema)
  }

  /** S11 cache key: sha256 over a canonical struct encoding — field order
    * fixed by construction (reference sorted-key canonical JSON,
    * retrievers.py:43-75).
    */
  def cacheKey(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    sha2(to_json(struct(cols: _*)), 256)

  /** J3: split requests into cache hits (with payload) and misses.
    * hits = semi-join semantics with the payload attached; misses = anti.
    */
  def cacheSplit(
      requests: DataFrame,
      cache: DataFrame,
      keyCol: String
  ): (DataFrame, DataFrame) = {
    val hits = requests.join(cache, Seq(keyCol), "inner")
    val misses = requests.join(cache, Seq(keyCol), "left_anti")
    (hits, misses)
  }

  /** S11 forced-id cache invalidation (retrievers.py:77-89): a cache hit is
    * valid only if the cached candidate-id set covers every requested
    * forced id; otherwise the request degrades to a miss (refetch), exactly
    * like `_cache_needs_update`. `forcedCol` (array<string> on requests;
    * null/empty = no constraint) and `cachedIdsCol` (array<string> on cache
    * rows) are compared trimmed, blank forced ids ignored.
    */
  def cacheSplitForced(
      requests: DataFrame,
      cache: DataFrame,
      keyCol: String,
      forcedCol: String,
      cachedIdsCol: String
  ): (DataFrame, DataFrame) = {
    // the cache contract is ONE row per key (the reference upserts a
    // single Mongo document, retrievers.py:77-89). An undeduped append-only
    // dir passed directly would fan out the left join and classify one
    // request as BOTH hit and miss (old row fails `valid`, new row passes).
    // Collapse defensively: latest by `seq` when present (the readCache
    // convention), else the row with the largest id set, deterministic
    // tiebreak on the sorted ids.
    val orderCols =
      (if (cache.columns.contains("seq")) Seq(col("seq").desc) else Nil) ++
        Seq(
          size(coalesce(col(cachedIdsCol), array().cast("array<string>"))).desc,
          to_json(array_sort(coalesce(col(cachedIdsCol), array().cast("array<string>")))).desc
        )
    val oneRowPerKey = cache
      .withColumn(
        "_cache_rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(keyCol).orderBy(orderCols: _*)
        )
      )
      .where(col("_cache_rn") === 1)
      .drop("_cache_rn")
    val marked = oneRowPerKey.withColumn("_cache_hit", lit(true))
    val joined = requests.join(marked, Seq(keyCol), "left")
    val forced = filter(
      transform(coalesce(col(forcedCol), array().cast("array<string>")), f => trim(f)),
      f => f =!= ""
    )
    val cachedIds = transform(
      coalesce(col(cachedIdsCol), array().cast("array<string>")),
      c => trim(c)
    )
    val valid = col("_cache_hit").isNotNull && size(array_except(forced, cachedIds)) === 0
    val hits = joined.where(valid).drop("_cache_hit")
    val misses = joined.where(!coalesce(valid, lit(false))).select(requests.columns.map(col): _*)
    (hits, misses)
  }

  /** S11 upsert-on-read: append-only cache dirs deduped at read by key,
    * last writer wins via the monotone seq column (W5 analog).
    */
  def readCache(spark: SparkSession, path: String, keyCol: String): DataFrame = {
    val raw = spark.read.parquet(path)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol)
      .orderBy(col("seq").desc)
    raw.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }
}
