package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global sequence by `orderCol` WITHOUT a single-partition
  * window (reference W5 needs a total order; a global row_number would
  * serialize 100 TB through one task). Two-phase over a range
  * partitioning: rank within each range partition + driver-computed
  * partition offsets (offset table is <= numRangePartitions rows). The
  * result does not depend on the sampled range boundaries — moving a
  * boundary moves rows between partitions but never reorders them — so
  * seq is identical across parallelism levels and partition counts.
  *
  * `rangePartitions` defaults to a bytes-based heuristic (plan-stats size
  * / 128 MB, floored at the cluster's default parallelism): wide input
  * stays wide; at 100 TB a fixed constant would funnel TBs through single
  * tasks. (Not `df.rdd.getNumPartitions` — under AQE that executes the
  * plan's stages eagerly.) The ranged frame is MATERIALIZED (serialized
  * localCheckpoint) before either pass: repartitionByRange samples its
  * boundaries per job, so computing offsets in one action and row_number
  * in a later action on an un-materialized frame could place rows in
  * different partitions across the two jobs, breaking the
  * dense-total-order contract.
  */
object DeterministicSeq {

  def assign(df: DataFrame, orderCol: String, rangePartitions: Int = 0): DataFrame = {
    val nParts =
      if (rangePartitions > 0) rangePartitions
      else {
        // checkpointed/RDD-backed frames report no stats (sizeInBytes =
        // defaultSizeInBytes sentinel) — treat anything implausibly huge as
        // unknown and fall back to the session's wide-op width
        val spark = df.sparkSession
        val fallback = math.max(
          spark.sparkContext.defaultParallelism,
          spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
        )
        val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
        if (bytes <= 0 || bytes >= BigInt(1L << 50)) fallback
        else {
          val byBytes = (bytes / BigInt(128L * 1024 * 1024)).min(BigInt(1000000)).toInt + 1
          math.max(spark.sparkContext.defaultParallelism, byBytes)
        }
      }
    val ranged = Checkpoints.serializedLocal(
      df.repartitionByRange(nParts, col(orderCol)).withColumn("_pid", spark_partition_id())
    )
    val counts = ranged.groupBy("_pid").agg(count(lit(1)).as("_n")).orderBy("_pid").collect()
    var acc = 0L
    val offsets = counts.map { r =>
      val o = (r.getInt(0), acc)
      acc += r.getLong(1)
      o
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toDF("_pid", "_offset")
    val w = Window.partitionBy("_pid").orderBy(orderCol)
    ranged
      .join(broadcast(offsetDf), "_pid")
      .withColumn("seq", (col("_offset") + row_number().over(w)).cast("long"))
      .drop("_pid", "_offset")
  }
}
