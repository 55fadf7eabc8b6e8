package graft

import org.apache.spark.sql.functions._

import graft.operators.SortedNeighborhood

/** Sorted-neighborhood blocking: window semantics vs a driver-side
  * brute-force reference, determinism across partitionings, multi-pass
  * dedup.
  */
class SortedNeighborhoodSpec extends SparkSpec {

  import spark.implicits._

  // keys deliberately collide so ties are broken by url
  private lazy val rows: Seq[(String, String)] =
    (0 until 60).map(i => (f"u$i%02d", s"k${(i * 7) % 13}"))

  private def bruteForce(data: Seq[(String, String)], window: Int): Set[(String, String)] = {
    val sorted = data.sortBy { case (u, k) => (k, u) }.map(_._1)
    (for {
      i <- sorted.indices
      j <- (i + 1) until math.min(i + window, sorted.length)
      p = if (sorted(i) < sorted(j)) (sorted(i), sorted(j)) else (sorted(j), sorted(i))
    } yield p).toSet
  }

  test("window pairs match the brute-force sliding window; each pair once") {
    val df = rows.toDF("url", "sk")
    val got = SortedNeighborhood
      .pairs(df, col("sk"), 4)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.length == got.toSet.size, "pair emitted more than once")
    assert(got.toSet == bruteForce(rows, 4))
    // linear by construction: (w-1) per rank minus the short tail windows
    // = 57*3 + 2 + 1 = 174 for n=60, w=4
    assert(got.length == 174, s"${got.length}")
  }

  test("pair set is identical across partitionings") {
    val a = SortedNeighborhood
      .pairs(rows.toDF("url", "sk").repartition(7), col("sk"), 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val b = SortedNeighborhood
      .pairs(rows.toDF("url", "sk").repartition(1), col("sk"), 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("pipeline window pass finds a pair every exact-key strategy misses") {
    import graft.pipeline.LinkagePipeline
    // the two targets share ONLY the sort-key region: different domains,
    // different leading tokens (so canonical/domain keys differ) and mostly
    // different text (so no MinHash band collides)
    val targets = Seq(
      ("https://alpha.example.org/1", "aaaa COMMON rest one entirely unrelated trailing content paddington"),
      ("https://bravo.example.org/2", "zzzz COMMON rest two totally distinct words forming another payload")
    )
    val filler = (0 until 10).map(i =>
      (s"https://site$i.example.org/f", s"fill$i document number $i with its own text body entirely distinct $i")
    )
    val corpus = (targets ++ filler).toDF("url", "text")
    val keys = graft.operators.Blocker.allKeys(corpus, LinkagePipeline.Config().strategies)
    def pairSet(cfg: LinkagePipeline.Config) =
      LinkagePipeline
        .candidatePairs(corpus, keys, cfg)
        .collect()
        .map(r => (r.getString(0), r.getString(1)))
        .toSet
    val target = ("https://alpha.example.org/1", "https://bravo.example.org/2")
    assert(!pairSet(LinkagePipeline.Config()).contains(target), "exact keys unexpectedly block the pair")
    val withWindow = LinkagePipeline.Config(windowPasses = Seq(("substring(text, 6, 10)", 3)))
    assert(pairSet(withWindow).contains(target), "window pass must surface the sort-adjacent pair")
  }

  test("multiPass unions passes and dedups shared pairs") {
    val df = rows.toDF("url", "sk").withColumn("sk2", reverse(col("sk")))
    val got = SortedNeighborhood
      .multiPass(df, Seq(col("sk"), col("sk2")), 3)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.length == got.toSet.size)
    val want = bruteForce(rows, 3) ++
      bruteForce(rows.map { case (u, k) => (u, k.reverse) }, 3)
    assert(got.toSet == want)
  }
}
