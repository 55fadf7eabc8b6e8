package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Survivorship / golden-record construction — the MERGE phase of entity
  * resolution: once docs are clustered (connected components, correlation
  * clustering, canopies...), collapse each cluster to ONE canonical record
  * by picking, per field, the value the configured rule survives.
  *
  * The reference keeps every mention row and only ANNOTATES it with the
  * winning entity (lion_linker/lion_linker.py merge step); a linkage store
  * that feeds downstream consumers needs the classical complement — the
  * per-entity record with field-level survivorship rules (most frequent,
  * longest, latest, min/max), as shipped by every MDM-style linker.
  *
  * Scale shape: every rule is ONE keyed aggregation on the cluster id.
  * `Mode` needs its own (cluster, value) count aggregation per field —
  * value frequencies cannot fold into a single pass — joined back on the
  * cluster key; everything else rides the main groupBy via `min_by` /
  * `max_by` with a composite ordering struct. No windows, no collects,
  * nothing corpus-sized on the driver. Skew = the largest cluster's row
  * count, the same bound the clustering stage already carries.
  *
  * Determinism: ties are broken by VALUE so the survivor is independent of
  * partitioning and row order — `Mode` takes the highest count then the
  * smallest value; `Longest` the greatest length then the smallest value;
  * `Latest` the greatest timestamp then the greatest value (max_by over an
  * ascending (ts, value) struct). Null values never survive over non-null
  * ones (null ordering structs are skipped by min_by/max_by); an all-null
  * field survives as null.
  */
object Survivorship {

  sealed trait Strategy

  /** Most frequent non-null value; ties → smallest value. */
  case object Mode extends Strategy

  /** Longest string value (by character length); ties → smallest value. */
  case object Longest extends Strategy

  /** Smallest non-null value. */
  case object MinValue extends Strategy

  /** Largest non-null value. */
  case object MaxValue extends Strategy

  /** Value on the row with the greatest `tsCol` (most recent wins); ties →
    * largest value. `tsCol` must be orderable (numeric / timestamp /
    * string). Rows where the value OR the timestamp is null are skipped.
    */
  final case class Latest(tsCol: String) extends Strategy

  /** One survivorship rule: pick `field` by `strategy`, output as `as`
    * (defaults to the field name).
    */
  final case class Rule(field: String, strategy: Strategy, as: String = "") {
    def outName: String = if (as.nonEmpty) as else field
  }

  /** One golden record per cluster: `clusterCol`, `n_members`, then one
    * column per rule (rule output names must be unique and must not
    * collide with `n_members` or the cluster column).
    */
  def golden(docs: DataFrame, clusterCol: String, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one survivorship rule required")
    val outNames = rules.map(_.outName)
    require(
      outNames.distinct.size == outNames.size &&
        !outNames.contains("n_members") && !outNames.contains(clusterCol),
      s"rule output names must be unique and avoid n_members/$clusterCol: $outNames"
    )

    // non-Mode rules fold into the single main aggregation
    def mainExpr(r: Rule): Option[Column] = {
      val v = col(r.field)
      r.strategy match {
        case Mode => None
        case Longest =>
          // min over (length desc via negation, value asc); null value →
          // null ordering struct → row skipped by the aggregate
          val ord = when(v.isNotNull, struct((-length(v)).cast("long"), v))
          Some(min_by(v, ord).as(r.outName))
        case MinValue => Some(min(v).as(r.outName))
        case MaxValue => Some(max(v).as(r.outName))
        case Latest(ts) =>
          val ord = when(v.isNotNull && col(ts).isNotNull, struct(col(ts), v))
          Some(max_by(v, ord).as(r.outName))
      }
    }
    val mainAggs = count(lit(1)).as("n_members") +: rules.flatMap(mainExpr)
    var out = docs.groupBy(col(clusterCol)).agg(mainAggs.head, mainAggs.tail: _*)

    // each Mode rule: its own (cluster, value) count pass, argmin joined back
    rules.filter(_.strategy == Mode).foreach { r =>
      val picked = docs
        .where(col(r.field).isNotNull)
        .groupBy(col(clusterCol), col(r.field).as("_v"))
        .agg(count(lit(1)).as("_c"))
        .groupBy(col(clusterCol))
        .agg(min_by(col("_v"), struct(-col("_c"), col("_v"))).as(r.outName))
      out = out.join(picked, Seq(clusterCol), "left")
    }
    // pin the declared column order (Mode joins appended theirs at the end)
    out.select((col(clusterCol) +: col("n_members") +: outNames.map(col)): _*)
  }
}
