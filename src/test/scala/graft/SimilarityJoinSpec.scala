package graft

import graft.operators.SimilarityJoin
import org.apache.spark.sql.functions._

class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Seq[String])], t: Double): Set[(Long, Long)] = {
    val sets = rows.map { case (id, tk) => (id, tk.toSet) }
    (for {
      (a, sa) <- sets
      (b, sb) <- sets
      if a < b && sa.nonEmpty && sb.nonEmpty
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= t
    } yield (a, b)).toSet
  }

  private def prefix(rows: Seq[(Long, Seq[String])], t: Double): Set[(Long, Long)] =
    SimilarityJoin
      .prefixJaccardJoin(rows.toDF("id", "toks"), "id", "toks", t)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet

  test("hand case: shared-prefix pair found, dissimilar pair dropped") {
    val rows = Seq(
      (1L, Seq("rare", "a", "b", "c")),
      (2L, Seq("rare", "a", "b", "d")),
      (3L, Seq("x", "y", "z", "w"))
    )
    val got = prefix(rows, 0.5)
    assert(got === Set((1L, 2L))) // jaccard(1,2) = 3/5 = 0.6 >= 0.5
  }

  test("prefix filtering is LOSSLESS: equals brute force on seeded random sets") {
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 40).map(i => s"t$i")
    for (t <- Seq(0.4, 0.6, 0.8)) {
      val rows: Seq[(Long, Seq[String])] =
        (1L to 60L).map(id => (id, (1 to 3 + rnd.nextInt(10)).map(_ => vocab(rnd.nextInt(vocab.length))).distinct))
      assert(prefix(rows, t) === brute(rows, t), s"threshold $t")
    }
  }

  test("duplicated tokens are set semantics; empty sets join nothing") {
    val rows = Seq(
      (1L, Seq("a", "a", "b")),
      (2L, Seq("b", "a")),
      (3L, Seq.empty[String])
    )
    assert(prefix(rows, 0.9) === Set((1L, 2L))) // both are {a,b} -> jaccard 1.0
  }
}
