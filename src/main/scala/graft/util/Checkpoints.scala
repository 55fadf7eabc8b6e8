package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

object Checkpoints {

  /** Eager localCheckpoint with SERIALIZED storage: truncates lineage like
    * the default, but MemoryStore sizes blocks from their byte arrays
    * instead of a SizeEstimator object-graph walk (that walk dominates
    * wall-clock on wide string rows). Reliable `checkpoint()` is NOT used
    * on the hot path — it recomputes the plan a second time for the
    * checkpoint job.
    */
  def serializedLocal(df: DataFrame): DataFrame =
    df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)

  /** Durable checkpoint function rooted at `dir` (any Hadoop FS scheme):
    * each call writes the frame as Parquet under a fresh subdir and returns
    * the re-read — lineage truncated AND executor-loss-safe, unlike
    * localCheckpoint whose blocks die with their executor. This is the
    * checkpoint to use for long CC iterations on a real cluster
    * (`LinkagePipeline.Config.checkpointDir`); the write IS the materializing
    * action, so nothing is computed twice (RDD `checkpoint()` would re-run
    * the plan for its checkpoint job).
    */
  def reliable(dir: String): DataFrame => DataFrame = {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    df => {
      val p = s"$dir/ck_${counter.getAndIncrement()}"
      df.write.mode("overwrite").parquet(p)
      df.sparkSession.read.parquet(p)
    }
  }
}
