package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter, JASA
  * 1969) — the classical model behind Splink/FEBRL-style linkers, scoring a
  * candidate pair by the log-likelihood ratio of its per-field agreement
  * pattern:
  *
  *   match_weight = Σ_f  [ γ_f = agree ] · ln(m_f / u_f)
  *                     + [ γ_f = disagree ] · ln((1 − m_f) / (1 − u_f))
  *
  * with m_f = P(field f agrees | match), u_f = P(field f agrees |
  * non-match). The reference's LLM decides "same entity?" from a rendered
  * prompt (lion_linker/generator.py); this operator is the published
  * deterministic replacement: evidence-weighted field agreement with
  * term-frequency adjustment (agreeing on a RARE value is stronger evidence
  * than agreeing on a common one — Splink's `tf_adjustment`).
  *
  * Scale shape: u-probabilities are one aggregation each (Σ (n_v/N)² — the
  * chance two random docs agree); TF tables are value-keyed aggregations
  * joined to the pair frame on the agreed value (a keyed equi-join — value
  * tables are NOT collected, they can be arbitrarily large); the pair frame
  * itself joins doc fields through two keyed id joins. Missing values carry
  * zero evidence (weight 0) rather than counting as disagreement. EM
  * parameter estimation works on the agreement-PATTERN count frame (≤ 2^F
  * rows, collected) — the corpus-sized pair set is aggregated once, and the
  * EM iterations are driver-side arithmetic on that tiny table, the same
  * bounded-collect pattern as the IVF codebook trainer.
  */
object FellegiSunter {

  /** Field spec: `field` must exist on the docs frame; `m` is the assumed
    * (or EM-estimated) P(agree | match).
    */
  final case class FieldParams(field: String, m: Double) {
    require(m > 0.0 && m < 1.0, s"m must be in (0,1), got $m for $field")
  }

  /** EM output: per-field (m, u) plus the match prior λ. */
  final case class EmParams(lambda: Double, fields: Map[String, (Double, Double)])

  /** Global u-probability for a field: the probability two random docs
    * agree on it, Σ_v (n_v / N)². Nulls are excluded from both n_v and N
    * (a null never "agrees"). Exact integer sums, one division.
    */
  def uProbability(docs: DataFrame, field: String): Double = {
    val row = docs
      .where(col(field).isNotNull)
      .groupBy(field)
      .agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * col("n")).as("s2"), sum(col("n")).as("n"))
      .collect()(0)
    if (row.isNullAt(1) || row.getLong(1) == 0L) 0.0
    else row.getLong(0).toDouble / (row.getLong(1).toDouble * row.getLong(1).toDouble)
  }

  /** Term-frequency table for a field: (value, u_v = n_v / N). Joined, not
    * collected — value cardinality is unbounded at corpus scale.
    */
  def uTable(docs: DataFrame, field: String): DataFrame = {
    val nn = docs.where(col(field).isNotNull)
    // total rides the same aggregation output as the value counts (1-row
    // broadcast cross join, the WEP/edges pattern) instead of a separate
    // nn.count() — that count was a full extra corpus scan PER FIELD, and
    // it made this frame eager; the division is the same IEEE
    // long-over-long double either way
    val counts = nn.groupBy(col(field).as("value")).agg(count(lit(1)).as("n_v"))
    val total = counts.agg(sum(col("n_v")).as("n_tot"))
    counts
      .crossJoin(broadcast(total))
      .select(col("value"), (col("n_v") / col("n_tot")).as("u"))
  }

  /** Score candidate pairs (id_a, id_b) against docs' fields. Adds, per
    * field, `w_<field>` (the log-likelihood-ratio contribution), plus
    * `match_weight` (their sum) and `match_p` (posterior under prior λ =
    * `prior`). With `tfAdjust` the agreement branch uses the agreed VALUE's
    * u_v instead of the field's global u (rare values score higher);
    * disagreement always uses the global u. Null on either side → weight 0.
    */
  def scorePairs(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      fields: Seq[FieldParams],
      prior: Double = 0.5,
      tfAdjust: Boolean = true
  ): DataFrame = {
    require(prior > 0.0 && prior < 1.0, s"prior must be in (0,1), got $prior")
    require(fields.nonEmpty, "at least one field required")
    val fieldCols = fields.map(f => f.field)
    // all global u-probabilities in ONE collect: per-field uProbability
    // calls each ran their own eager aggregation job over docs (3 fields =
    // 3 extra full passes before scoring even planned); a union of the
    // per-field branches computes identical Σ(n_v/N)² values in one job
    val uMap: Map[String, Double] = fieldCols.distinct
      .map { f =>
        docs
          .where(col(f).isNotNull)
          .groupBy(col(f))
          .agg(count(lit(1)).as("n"))
          .agg(sum(col("n") * col("n")).as("s2"), sum(col("n")).as("n"))
          .select(lit(f).as("field"), col("s2"), col("n"))
      }
      .reduce(_ unionAll _)
      .collect()
      .map { r =>
        val u =
          if (r.isNullAt(2) || r.getLong(2) == 0L) 0.0
          else r.getLong(1).toDouble / (r.getLong(2).toDouble * r.getLong(2).toDouble)
        r.getString(0) -> u
      }
      .toMap
    // TF adjustment uses the AGREED value's u_v, and agreement means the
    // A-side value IS the pair's value — so the per-field u-tables join
    // onto the DOC-side projection, not the pair frame: at scale the pair
    // set is the big side, and value-keyed joins against it would shuffle
    // |pairs| once PER FIELD; doc-side enrichment shuffles only |docs|.
    var a = docs.select(
      (col(idCol).as("id_a") +: fieldCols.map(f => col(f).as(s"${f}_a"))): _*
    )
    if (tfAdjust) fieldCols.distinct.foreach { f =>
      val tf = uTable(docs, f).select(col("value").as(s"${f}_a"), col("u").as(s"_u_$f"))
      a = a.join(tf, Seq(s"${f}_a"), "left")
    }
    val b = docs.select(
      (col(idCol).as("id_b") +: fieldCols.map(f => col(f).as(s"${f}_b"))): _*
    )
    var out = pairs.join(a, "id_a").join(b, "id_b")
    val weightCols = fields.map { fp =>
      val f = fp.field
      val u = uMap(f)
      require(u > 0.0 && u < 1.0, s"degenerate u=$u for field $f (constant or all-null column)")
      val fa = col(s"${f}_a")
      val fb = col(s"${f}_b")
      val agree = fa.isNotNull && fb.isNotNull && (fa === fb)
      val missing = fa.isNull || fb.isNull
      val agreeU: Column =
        if (!tfAdjust) lit(u) else coalesce(col(s"_u_$f"), lit(u))
      val w = when(missing, lit(0.0))
        .when(agree, log(lit(fp.m) / agreeU))
        .otherwise(log(lit(1.0 - fp.m) / lit(1.0 - u)))
      (s"w_$f", w)
    }
    weightCols.foreach { case (name, c) => out = out.withColumn(name, c) }
    val mw = weightCols.map(w => col(w._1)).reduce(_ + _)
    out
      .withColumn("match_weight", mw)
      .withColumn(
        "match_p",
        lit(1.0) / (lit(1.0) + exp(-(lit(math.log(prior / (1.0 - prior))) + col("match_weight"))))
      )
      .drop(fields.filter(_ => tfAdjust).map(f => s"_u_${f.field}"): _*)
  }

  /** One comparison level à la Splink: `cond` decides whether a pair sits
    * at this level (evaluated on the two field columns), `m`/`u` are the
    * level's P(level | match) / P(level | non-match). Levels are ordered
    * most-specific-first; the FIRST matching level wins.
    */
  final case class Level(name: String, cond: (Column, Column) => Column, m: Double, u: Double) {
    require(m > 0.0 && m < 1.0 && u > 0.0 && u < 1.0, s"m/u must be in (0,1) for level $name")
  }

  /** The mandatory catch-all last level (Splink's "else" / anything-else
    * level) — absorbs every pair no earlier level claimed.
    */
  def elseLevel(m: Double, u: Double): Level = Level("else", (_, _) => lit(true), m, u)

  /** A multi-level comparison over one field: e.g. exact match >
    * jaro_winkler ≥ 0.9 > else. The last level must be [[elseLevel]]-like
    * (we force it: its condition is ignored and treated as always-true).
    */
  final case class Comparison(field: String, levels: Seq[Level]) {
    require(levels.size >= 2, s"comparison on $field needs ≥2 levels (incl. the else level)")
  }

  /** Score pairs under multi-level comparisons (Splink's comparison-level
    * model, the practical generalization of binary agreement): per
    * comparison, `gamma_<field>` = the matched level's index counted from
    * the LAST level (else = 0, most specific = L−1, null on either side =
    * −1 — the null level, zero evidence), and `w_<field>` = ln(m_l / u_l)
    * of the matched level. `match_weight` / `match_p` as in [[scorePairs]].
    *
    * Scale shape: two keyed id joins fetch the fields; everything else is a
    * row-local CASE chain (whole-stage codegen'd, conditions may call the
    * similarity kernels). No aggregations, no collects: level m/u are
    * caller-supplied (pre-trained, as Splink persists them) — pair volume
    * is whatever the blocking stage bounded it to.
    */
  def scoreLevels(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      comparisons: Seq[Comparison],
      prior: Double = 0.5
  ): DataFrame = {
    require(prior > 0.0 && prior < 1.0, s"prior must be in (0,1), got $prior")
    require(comparisons.nonEmpty, "at least one comparison required")
    val fieldCols = comparisons.map(_.field).distinct
    val a = docs.select((col(idCol).as("id_a") +: fieldCols.map(f => col(f).as(s"${f}_a"))): _*)
    val b = docs.select((col(idCol).as("id_b") +: fieldCols.map(f => col(f).as(s"${f}_b"))): _*)
    var out = pairs.join(a, "id_a").join(b, "id_b")
    comparisons.foreach { cmp =>
      val f = cmp.field
      val fa = col(s"${f}_a")
      val fb = col(s"${f}_b")
      val nLev = cmp.levels.size
      // first-match-wins CASE chain; the last level is the forced catch-all
      val start: (Column, Column) = (
        when(fa.isNull || fb.isNull, lit(-1)),
        when(fa.isNull || fb.isNull, lit(0.0))
      )
      val (gamma, w) = cmp.levels.zipWithIndex.foldLeft(start) {
        case ((g, wc), (lev, i)) =>
          val hit = if (i == nLev - 1) lit(true) else lev.cond(fa, fb)
          (g.when(hit, lit(nLev - 1 - i)), wc.when(hit, lit(math.log(lev.m / lev.u))))
      }
      out = out.withColumn(s"gamma_$f", gamma).withColumn(s"w_$f", w)
    }
    val mw = comparisons.map(c => col(s"w_${c.field}")).reduce(_ + _)
    out
      .withColumn("match_weight", mw)
      .withColumn(
        "match_p",
        lit(1.0) / (lit(1.0) + exp(-(lit(math.log(prior / (1.0 - prior))) + col("match_weight"))))
      )
  }

  /** EM estimation of (λ, m_f, u_f) from the binary agreement patterns of a
    * candidate-pair frame. Nulls count as disagreement here (the 2-state
    * EM; fields where that misfits should be scored with weight-0 nulls at
    * scoring time, this is only the estimator). One Spark aggregation
    * builds the pattern-count table (≤ 2^F rows, collected); iterations are
    * driver-side and deterministic. Parameters are clamped to
    * [1e-6, 1 − 1e-6] so a degenerate pattern table cannot produce NaN.
    */
  def emEstimate(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      fieldNames: Seq[String],
      iters: Int = 25,
      initLambda: Double = 0.1,
      initM: Double = 0.9,
      initU: Double = 0.1
  ): EmParams = {
    require(fieldNames.nonEmpty && iters >= 1)
    val a = docs.select((col(idCol).as("id_a") +: fieldNames.map(f => col(f).as(s"${f}_a"))): _*)
    val b = docs.select((col(idCol).as("id_b") +: fieldNames.map(f => col(f).as(s"${f}_b"))): _*)
    val gammaCols = fieldNames.map { f =>
      (col(s"${f}_a").isNotNull && col(s"${f}_b").isNotNull &&
        (col(s"${f}_a") === col(s"${f}_b"))).cast("int").as(s"g_$f")
    }
    val patterns = pairs
      .join(a, "id_a")
      .join(b, "id_b")
      .select(gammaCols: _*)
      .groupBy(fieldNames.map(f => col(s"g_$f")): _*)
      .agg(count(lit(1)).as("c"))
      .collect() // bounded by 2^F patterns
      .map(r => (fieldNames.indices.map(i => r.getInt(i)).toArray, r.getLong(fieldNames.length)))
    val eps = 1e-6
    def clamp(x: Double) = math.min(1.0 - eps, math.max(eps, x))
    var lambda = clamp(initLambda)
    var m = Array.fill(fieldNames.length)(clamp(initM))
    var u = Array.fill(fieldNames.length)(clamp(initU))
    var it = 0
    while (it < iters) {
      var sumW = 0.0; var sumC = 0.0
      val mNum = Array.fill(fieldNames.length)(0.0)
      val uNum = Array.fill(fieldNames.length)(0.0)
      var sum1mW = 0.0
      patterns.foreach { case (g, c) =>
        var pm = lambda; var pu = 1.0 - lambda
        var i = 0
        while (i < g.length) {
          pm *= (if (g(i) == 1) m(i) else 1.0 - m(i))
          pu *= (if (g(i) == 1) u(i) else 1.0 - u(i))
          i += 1
        }
        val w = pm / (pm + pu)
        sumW += c * w; sum1mW += c * (1.0 - w); sumC += c.toDouble
        i = 0
        while (i < g.length) {
          if (g(i) == 1) { mNum(i) += c * w; uNum(i) += c * (1.0 - w) }
          i += 1
        }
      }
      lambda = clamp(sumW / sumC)
      m = mNum.map(x => clamp(x / sumW))
      u = uNum.map(x => clamp(x / sum1mW))
      it += 1
    }
    EmParams(lambda, fieldNames.zipWithIndex.map { case (f, i) => f -> ((m(i), u(i))) }.toMap)
  }

  /** Waterfall explanation of a scored pair frame (Splink's waterfall
    * chart, the per-pair audit view): one row per evidence STEP, walking
    * the posterior from the prior through each field's log-likelihood
    * contribution in the caller's field order. The reference's analog is
    * the raw LLM answer string a reviewer reads per mention
    * (lion_linker/lion_linker.py:879-906); this is the deterministic,
    * queryable version.
    *
    * Input: the output of [[scorePairs]] / [[scoreLevels]] (must carry
    * `w_<field>` for every name in `fields`, plus the two id columns).
    * Output per pair: step 0 = the prior (weight 0, cum_weight 0,
    * cum_p = prior), then step i = field i with its weight, running
    * cum_weight and running posterior cum_p = σ(logit(prior) + cum).
    *
    * Scale shape: a row-local explode of a fixed-size struct array —
    * fields.size + 1 output rows per pair, zero joins, zero shuffles,
    * zero aggregations; the running sums are compile-time folds over the
    * fixed field list (no window). Runs at whatever volume the scored
    * frame has.
    */
  def explain(
      scored: DataFrame,
      fields: Seq[String],
      prior: Double = 0.5,
      idA: String = "id_a",
      idB: String = "id_b"
  ): DataFrame = {
    require(prior > 0.0 && prior < 1.0, s"prior must be in (0,1), got $prior")
    require(fields.nonEmpty, "at least one field required")
    val logitPrior = math.log(prior / (1.0 - prior))
    def post(cum: Column): Column =
      lit(1.0) / (lit(1.0) + exp(-(lit(logitPrior) + cum)))
    val priorStep = struct(
      lit(0L).as("step"),
      lit("prior").as("field"),
      lit(0.0).as("weight"),
      lit(0.0).as("cum_weight"),
      post(lit(0.0)).as("cum_p")
    )
    val steps = fields.zipWithIndex.map { case (f, i) =>
      // deterministic left-to-right fold — the accumulation order is the
      // caller's field order, not an exchange-dependent aggregate
      val cum = fields.take(i + 1).map(g => col(s"w_$g")).reduce(_ + _)
      struct(
        lit((i + 1).toLong).as("step"),
        lit(f).as("field"),
        col(s"w_$f").as("weight"),
        cum.as("cum_weight"),
        post(cum).as("cum_p")
      )
    }
    scored
      .select(col(idA), col(idB), explode(array(priorStep +: steps: _*)).as("s"))
      .select(
        col(idA),
        col(idB),
        col("s.step").as("step"),
        col("s.field").as("field"),
        col("s.weight").as("weight"),
        col("s.cum_weight").as("cum_weight"),
        col("s.cum_p").as("cum_p")
      )
  }
}
