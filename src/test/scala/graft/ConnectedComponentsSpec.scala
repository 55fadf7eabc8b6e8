package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {

  private def cc(edges: Seq[(String, String)]): Map[String, String] = {
    import spark.implicits._
    ConnectedComponents
      .run(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
  }

  /** Brute-force transitive closure for the oracle. */
  private def bruteForce(edges: Seq[(String, String)]): Map[String, String] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: String): String = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (ra < rb) rb else ra) = if (ra < rb) ra else rb
    }
    nodes.map(n => n -> find(n)).toMap
  }

  test("simple chain collapses to min") {
    val got = cc(Seq(("b", "a"), ("c", "b"), ("d", "c")))
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a"))
  }

  test("two components stay separate") {
    val got = cc(Seq(("a", "b"), ("x", "y"), ("y", "z")))
    assert(got("a") == "a" && got("b") == "a")
    assert(got("x") == "x" && got("y") == "x" && got("z") == "x")
  }

  test("matches brute-force closure on random graphs (seeded)") {
    val rng = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val n = 30 + rng.nextInt(40)
      val edges = (1 to n).map { _ =>
        (s"n${rng.nextInt(25)}", s"n${rng.nextInt(25)}")
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val expected = bruteForce(edges)
        val got = cc(edges)
        assert(got == expected, s"trial $trial mismatch")
      }
    }
  }

  test("compact-id opt-in produces identical assignments") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val edges = (1 to 80)
      .map(_ => (s"u${rng.nextInt(30)}", s"u${rng.nextInt(30)}"))
      .filter(e => e._1 != e._2)
      .distinct
    val df = edges.toDF("src", "dst")
    val plain = ConnectedComponents.run(df).collect().map(r => (r.getString(0), r.getString(1))).toSet
    val compact = ConnectedComponents
      .run(df, compact = true)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(plain == compact)
  }

  test("compact + rotating durable checkpoints: idSnapshot keeps the ids map alive") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val edges = (1 to 80)
      .map(_ => (s"u${rng.nextInt(30)}", s"u${rng.nextInt(30)}"))
      .filter(e => e._1 != e._2)
      .distinct
    val df = edges.toDF("src", "dst")
    val plain = ConnectedComponents.run(df).collect().map(r => (r.getString(0), r.getString(1))).toSet
    // a rotating iteration snapshot (keepLast = 2, as LinkagePipeline wires
    // for Config.checkpointDir) deletes old checkpoints; the compacted ids
    // map is read again AFTER the last iteration, so it must go through the
    // non-rotating idSnapshot or the final map-back would hit a deleted dir
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-rot").toString
    val rotated = ConnectedComponents
      .run(
        df,
        snapshot = graft.util.Checkpoints.reliable(s"$dir/cc", keepLast = 2),
        compact = true,
        idSnapshot = Some(graft.util.Checkpoints.reliable(s"$dir/ids"))
      )
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(plain == rotated)
  }

  test("mid-run auto-compaction on a deep chain matches the uncompacted run") {
    import spark.implicits._
    // a 700-node chain needs ~10 star rounds — past compactAfter = 3, so
    // the loop provably switches the live edge set to long nids mid-run;
    // zero-padded urls keep lexicographic order == numeric order for the
    // brute-force oracle comparison
    val chain = (1 until 700).map(i => (f"c${i - 1}%04d", f"c$i%04d"))
    val df = chain.toDF("src", "dst")
    val auto = ConnectedComponents
      .run(df, compactAfter = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val never = ConnectedComponents
      .run(df, compactAfter = Int.MaxValue)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(auto == never)
    assert(auto.forall(_._2 == "c0000"), "every chain node must link to the min url")
    assert(auto.size == 700)
  }

  test("result is invariant under repartitioning") {
    import spark.implicits._
    val edges = (1 to 60).map(i => (s"v${i % 23}", s"v${(i * 7) % 23}")).filter(e => e._1 != e._2)
    val df1 = edges.toDF("src", "dst").repartition(1)
    val df8 = edges.toDF("src", "dst").repartition(8, col("src"))
    val r1 = ConnectedComponents.run(df1).collect().map(r => (r.getString(0), r.getString(1))).toSet
    val r8 = ConnectedComponents.run(df8).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(r1 == r8)
  }
}
