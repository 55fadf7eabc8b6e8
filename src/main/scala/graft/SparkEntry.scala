package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.LinkagePipeline
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: full record-linkage pipeline (block -> score -> cluster) over
    * a web-page-shaped corpus derived deterministically from the sf0.001
    * documents table. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pages = docs.select(
      concat(lit("https://"), col("source"), lit(".example.org/doc/"), col("doc_id")).as("url"),
      col("text"),
      col("lang")
    )
    LinkagePipeline.run(pages)
  }
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map()
}
