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
}
