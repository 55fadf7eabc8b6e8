package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Battery output-contract guard (round-4 lesson): the driver's compare
  * loads both sides into pandas and sorts over every column, so an output
  * column whose pandas dtype is an ndarray/list/dict is UNSORTABLE — the
  * compare errors ("unhashable type: 'numpy.ndarray'") and the row goes red
  * regardless of correctness. Three r4 queries shipped bare array columns
  * and the friendlier local replica masked it. This spec makes the
  * contract structural: every `SparkEntry.queries` output schema must be
  * scalar-only (arrays/maps/structs stay inside the library API; battery
  * rows canonicalize them — e.g. `array_join` — before emitting).
  *
  * Most queries resolve their schema lazily (no job runs), but NOT all:
  * the streaming rows (q_stream_dedup, q_stream_link_finalize) and the
  * iterative ones (CC / pivot / packSequences collect driver state at
  * construction) execute real jobs before returning a frame — so this
  * spec runs against the smallest fixture (sf0.001) and is the slow-ish
  * full sweep, not a seconds-long schema check.
  */
class BatterySchemaSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every battery query emits only scalar (pandas-sortable) columns") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val schema = q(spark, sf).schema
      schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] => s"$name.${f.name}: ${f.dataType.simpleString}"
        case f if f.dataType.isInstanceOf[MapType]   => s"$name.${f.name}: ${f.dataType.simpleString}"
        case f if f.dataType.isInstanceOf[StructType] => s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty, s"driver-unhashable battery columns:\n${offenders.mkString("\n")}")
  }

  test("every oracle belongs to a query and vice versa (rows-only checks excepted)") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    val orphanOracles = os.diff(qs)
    assert(orphanOracles.isEmpty, s"oracles without a query: $orphanOracles")
  }
}
