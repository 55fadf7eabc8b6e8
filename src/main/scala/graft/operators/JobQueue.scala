package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** W7: the reference's job-state transitions re-expressed as deterministic
  * frame transforms over a jobs table (job_id, status, created_at, ...).
  *
  * The reference does these against Mongo
  * (/root/reference/app/storage/state.py:118-155):
  *  - claim_next_job: find_one_and_update(status=queued, sort=created_at asc)
  *    -> status=running + started_at
  *  - mark_running_jobs_failed: update_many(status=running) -> failed + error
  *  - cancel_job: update_one(job_id, status=queued) -> cancelled
  *
  * Mongo's atomicity is storage-level; the data-plane semantics are the
  * deterministic state transition itself, which is what these implement
  * (the caller serializes claims, exactly like the reference's single queue
  * worker — `LION_QUEUE_WORKERS=1`, app/core/config.py:28-31).
  *
  * Scale shape: claimNext finds the oldest queued job with ONE min(struct)
  * aggregation (no global window, no sort) and applies it with a broadcast
  * join — the jobs table never shuffles.
  */
object JobQueue {

  /** The oldest-queued selection shared by claim and peek: 1-row frame of
    * (__claim_id) — min(struct(created_at, job_id)) so ties on created_at
    * break by job_id and the choice is total-order deterministic.
    */
  private def oldestQueued(jobs: DataFrame): DataFrame =
    jobs
      .where(col("status") === "queued")
      .agg(min(struct(col("created_at"), col("job_id"))).as("o"))
      .select(col("o.job_id").as("__claim_id"))
      .where(col("__claim_id").isNotNull)

  /** Oldest queued job -> running (+ started_at = `now`); ties on
    * created_at break by job_id so the claim is total-order deterministic.
    * Returns the full post-claim jobs frame; the claimed row is the one
    * whose status flipped (join against claimedId to fetch it alone).
    */
  def claimNext(jobs: DataFrame, now: Column): DataFrame = {
    val claimed = jobs.join(broadcast(oldestQueued(jobs)), col("job_id") === col("__claim_id"), "left")
    claimed
      .withColumn(
        "started_at",
        when(col("__claim_id").isNotNull, now).otherwise(col("started_at"))
      )
      .withColumn(
        "status",
        when(col("__claim_id").isNotNull, lit("running")).otherwise(col("status"))
      )
      .drop("__claim_id")
  }

  /** The job claimNext would take, without mutating: oldest queued row. */
  def peekNext(jobs: DataFrame): DataFrame =
    jobs.join(broadcast(oldestQueued(jobs)), col("job_id") === col("__claim_id")).drop("__claim_id")

  /** All running jobs -> failed with `reason` (+ finished_at = `now`);
    * startup crash-recovery sweep (state.py:138-145).
    */
  def markRunningFailed(jobs: DataFrame, reason: String, now: Column): DataFrame =
    jobs
      .withColumn("finished_at", when(col("status") === "running", now).otherwise(col("finished_at")))
      .withColumn("error", when(col("status") === "running", lit(reason)).otherwise(col("error")))
      .withColumn("status", when(col("status") === "running", lit("failed")).otherwise(col("status")))

  /** Queued job `jobId` -> cancelled (+ finished_at = `now`); a running or
    * finished job is left untouched, like the reference's guarded update
    * (state.py:147-155).
    */
  def cancel(jobs: DataFrame, jobId: String, now: Column): DataFrame = {
    val hit = col("job_id") === jobId && col("status") === "queued"
    jobs
      .withColumn("finished_at", when(hit, now).otherwise(col("finished_at")))
      .withColumn("status", when(hit, lit("cancelled")).otherwise(col("status")))
  }
}
