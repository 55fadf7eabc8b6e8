package graft

import graft.operators.ActiveLearning
import org.apache.spark.sql.functions._

class ActiveLearningSpec extends SparkSpec {
  import spark.implicits._

  private val scored = Seq(
    (1L, 2L, 0.51), // u = 0.01
    (1L, 3L, 0.10), // u = 0.40
    (2L, 3L, 0.49), // u = 0.01  (ties 0.51 on |p-.5|; (1,2) wins on ids)
    (2L, 4L, 0.95), // u = 0.45
    (3L, 4L, 0.50) // u = 0.00
  ).toDF("id_a", "id_b", "p")

  test("uncertaintyBatch: closest-to-0.5 first, id tie-break, exact k") {
    val got = ActiveLearning
      .uncertaintyBatch(scored, "p", 3)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSeq
    assert(got === Seq((3L, 4L), (1L, 2L), (2L, 3L)))
  }

  test("uncertaintyBatch: null posteriors are excluded, k caps output") {
    val withNull = scored.union(Seq((9L, 9L, null.asInstanceOf[java.lang.Double]))
      .toDF("id_a", "id_b", "p"))
    assert(ActiveLearning.uncertaintyBatch(withNull, "p", 100).count() === 5L)
  }

  test("committeeBatch: largest disagreement first") {
    val two = Seq((1L, 2L, 0.9, 0.1), (1L, 3L, 0.6, 0.5), (2L, 3L, 0.2, 0.9))
      .toDF("id_a", "id_b", "p1", "p2")
    val got = ActiveLearning
      .committeeBatch(two, "p1", "p2", 2)
      .select("id_a", "id_b", "disagreement")
      .as[(Long, Long, Double)]
      .collect()
      .toSeq
    assert(got.map(r => (r._1, r._2)) === Seq((1L, 2L), (2L, 3L)))
    assert(math.abs(got(0)._3 - 0.8) < 1e-9)
  }
}
