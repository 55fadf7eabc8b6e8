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
    *
    * `keepLast > 0` rotates: after writing ck_i, ck_(i-keepLast) is deleted
    * — iterative callers (CC) only ever read the latest frame, and without
    * rotation a 20-iteration run would leave 20 full edge-set copies on
    * durable storage. Callers whose checkpoints are re-read later in the
    * run (the accepted edge set) use keepLast = 0 (keep everything).
    */
  def reliable(dir: String, keepLast: Int = 0): DataFrame => DataFrame = {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    df => {
      val i = counter.getAndIncrement()
      val p = s"$dir/ck_$i"
      df.write.mode("overwrite").parquet(p)
      val out = df.sparkSession.read.parquet(p)
      if (keepLast > 0 && i - keepLast >= 0) {
        val stale = new org.apache.hadoop.fs.Path(s"$dir/ck_${i - keepLast}")
        val fs = stale.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
        fs.delete(stale, true)
      }
      out
    }
  }
}
