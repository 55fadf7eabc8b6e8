package graft.util

import org.apache.spark.sql.Observation

/** Shared bounded-wait poll for `df.observe` metrics. `Observation.get`
  * blocks FOREVER if the observed plan's action never drives the
  * observation, so both call sites (CC's fused snapshot signature, the
  * resumable pipeline's manifest metrics) poll `getOrEmpty` (each call
  * waits <=100ms internally — not a hot spin) against a deadline instead.
  */
object Observations {

  /** Metrics if the observation fires within `budgetSeconds`, else empty —
    * with a stderr note so a timeout is distinguishable from metrics that
    * are legitimately absent.
    */
  def getWithin(obs: Observation, budgetSeconds: Int = 5): Map[String, Any] = {
    val getOrEmpty = () => org.apache.spark.sql.GraftShim.observationGetOrEmpty(obs)
    val deadline = System.nanoTime() + budgetSeconds.toLong * 1000 * 1000 * 1000
    var m = getOrEmpty()
    while (m.isEmpty && System.nanoTime() < deadline) m = getOrEmpty()
    if (m.isEmpty)
      System.err.println(s"[graft] observation did not fire within ${budgetSeconds}s; proceeding without its metrics")
    m
  }
}
