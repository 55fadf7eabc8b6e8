package graft.synth

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{GoldPair, WebPage}

/** Deterministic synthetic Common-Crawl-style corpus with planted duplicate
  * clusters + gold pair labels.
  *
  * This is the engine's stand-in for the reference's external KB retriever +
  * gold CSV (/root/reference/tests/data/film_with_QIDs.csv): the generator
  * plants the truth, the evaluator (graft.eval.PairwiseEval) scores the
  * pipeline against it — mirroring the gt_columns mechanism
  * (lion_linker/lion_linker.py:196,945,969) where gold is excluded from
  * processing and only read by the evaluation.
  *
  * Everything is a pure function of (seed, cluster-id, member-id): results
  * are identical across partitioning / parallelism levels, which the N-vs-4N
  * scaling comparison and the resume tests require.
  *
  * Skew: domains are Zipf-assigned so a head domain carries a large share of
  * clusters — this deliberately exercises the salted blocking path.
  */
object WebCorpus {

  final case class Config(
      numClusters: Int = 300,
      seed: Long = 42L,
      /** max cluster size; sizes are Zipf-ish in [2, maxClusterSize] */
      maxClusterSize: Int = 6,
      /** number of distinct web domains; domain 0 is the hot head domain */
      numDomains: Int = 40,
      /** token substitution rate for near-duplicate member texts */
      editNoise: Double = 0.08,
      /** fraction of extra singleton pages (the NIL analog) */
      nilFraction: Double = 0.2,
      baseTokens: Int = 80
  )

  /** Deterministic pseudo-word vocabulary (no dictionaries shipped). */
  private val VocabSize = 4096
  private def word(i: Int): String = {
    val consonants = "bcdfghklmnprstvz"
    val vowels = "aeiou"
    val rng = new scala.util.Random(0x5EEDL * 31 + i)
    val len = 2 + rng.nextInt(3)
    val sb = new StringBuilder
    (0 until len).foreach { _ =>
      sb.append(consonants.charAt(rng.nextInt(consonants.length)))
      sb.append(vowels.charAt(rng.nextInt(vowels.length)))
    }
    sb.toString
  }
  private lazy val vocab: Array[String] = Array.tabulate(VocabSize)(word)

  /** Zipf-ish index in [0, n): rank r with prob ~ 1/(r+1). */
  private def zipf(rng: scala.util.Random, n: Int): Int = {
    val h = (0 until n).map(r => 1.0 / (r + 1)).sum
    var u = rng.nextDouble() * h
    var r = 0
    while (r < n - 1 && u > 1.0 / (r + 1)) { u -= 1.0 / (r + 1); r += 1 }
    r
  }

  private def baseText(rng: scala.util.Random, nTokens: Int): Array[String] =
    Array.fill(nTokens)(vocab(rng.nextInt(VocabSize)))

  private def perturb(tokens: Array[String], rng: scala.util.Random, rate: Double): Array[String] =
    tokens.map(t => if (rng.nextDouble() < rate) vocab(rng.nextInt(VocabSize)) else t)

  /** URL variants of one canonical page — the planted duplicate surface.
    * Variants 0-3 collapse under canonical-URL blocking (scheme / www /
    * trailing slash / tracking params); variant 4 changes the path (same
    * domain — needs content blocking); variant 5 is a mirror host (different
    * domain — only MinHash-over-text blocking can recover it).
    */
  private def urlVariant(domain: String, path: String, variant: Int): String = variant % 6 match {
    case 0 => s"http://$domain/$path"
    case 1 => s"https://www.$domain/$path"
    case 2 => s"http://$domain/$path?utm_source=feed&ref=$variant"
    case 3 => s"https://m.$domain/$path/"
    case 4 => s"https://$domain/amp/$path"
    case 5 => s"https://mirror-$domain/$path"
  }

  private def htmlOf(text: String): Array[Byte] =
    s"<html><head></head><body><p>$text</p></body></html>".getBytes(StandardCharsets.UTF_8)

  private val langs = Array("en", "en", "en", "de", "it", "fr", "es")

  /** A cluster's seeded RNG stream; its FIRST draw is the cluster domain.
    * clusterPages and goldPairs must derive the domain through these two
    * helpers — goldPairs used to re-seed and replay the first draw by
    * hand, which silently desynchronizes if clusterPages ever reorders
    * its draws.
    */
  private def clusterRng(cfg: Config, c: Int): scala.util.Random =
    new scala.util.Random(cfg.seed * 1000003L + c)

  private def clusterDomain(rng: scala.util.Random, cfg: Config): String =
    s"site${zipf(rng, cfg.numDomains)}.example.com"

  /** One cluster's members + any singletons attached to the same spec row. */
  private def clusterPages(cfg: Config, c: Int): Seq[WebPage] = {
    val rng = clusterRng(cfg, c)
    val domain = clusterDomain(rng, cfg)
    val size = 2 + zipf(rng, cfg.maxClusterSize - 1)
    val lang = langs(rng.nextInt(langs.length))
    val base = baseText(rng, cfg.baseTokens - 10 + rng.nextInt(21))
    val members = (0 until size).map { m =>
      val mRng = new scala.util.Random(cfg.seed * 7919L + c * 131L + m)
      val tokens = if (m == 0) base else perturb(base, mRng, cfg.editNoise)
      val text = tokens.mkString(" ")
      val ts = new Timestamp(1600000000000L + (c.toLong * 100 + m) * 60000L)
      WebPage(urlVariant(domain, s"page/$c", m), ts, htmlOf(text), text, lang)
    }
    val nSingles = if (rng.nextDouble() < cfg.nilFraction) 1 else 0
    val singles = (0 until nSingles).map { s =>
      val sRng = new scala.util.Random(cfg.seed * 104729L + c * 17L + s)
      val sDom = s"site${zipf(sRng, cfg.numDomains)}.example.com"
      val text = baseText(sRng, cfg.baseTokens).mkString(" ")
      val ts = new Timestamp(1600000000000L + (c.toLong * 100 + 90 + s) * 60000L)
      WebPage(s"https://$sDom/solo/$c-$s", ts, htmlOf(text), text, langs(sRng.nextInt(langs.length)))
    }
    members ++ singles
  }

  /** The corpus as a typed Dataset, generated distributed (one spec row per
    * cluster, flat-mapped on executors — deterministic per (seed, c, m)).
    */
  def pages(spark: SparkSession, cfg: Config = Config()): Dataset[WebPage] = {
    import spark.implicits._
    val parallelism = math.max(spark.sparkContext.defaultParallelism, 1)
    spark.sparkContext
      .parallelize(0 until cfg.numClusters, math.min(parallelism, cfg.numClusters))
      .flatMap(c => clusterPages(cfg, c))
      .toDS()
  }

  /** Gold labels: every within-cluster pair, url_a < url_b, keyed by the
    * cluster's domain (F1 is evaluated within blocking key per north rule).
    */
  def goldPairs(spark: SparkSession, cfg: Config = Config()): Dataset[GoldPair] = {
    import spark.implicits._
    val parallelism = math.max(spark.sparkContext.defaultParallelism, 1)
    spark.sparkContext
      .parallelize(0 until cfg.numClusters, math.min(parallelism, cfg.numClusters))
      .flatMap { c =>
        val ps = clusterPages(cfg, c).takeWhile(!_.url.contains("/solo/"))
        val domain = clusterDomain(clusterRng(cfg, c), cfg)
        for {
          i <- ps.indices
          j <- (i + 1) until ps.size
        } yield {
          val (a, b) = (ps(i).url, ps(j).url)
          if (a < b) GoldPair(a, b, domain, label = true)
          else GoldPair(b, a, domain, label = true)
        }
      }
      .toDS()
  }
}
