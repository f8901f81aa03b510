package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [engine-added] Deterministic corpus-sampling operators for
  * training-data pipelines: per-group quota downsampling (cap
  * over-represented sources) and temperature-rebalanced mixture targets
  * (the `p_g ∝ n_g^alpha` upsampling/downsampling rule used when mixing
  * web-scale corpora).
  *
  * Both are deliberately seedless: the sampling priority is a Knuth
  * multiplicative hash of a stable id, so reruns (and the DuckDB oracle,
  * which has no xxhash64) reproduce the exact same sample — a property
  * `df.sample()` cannot give across engines or partitionings.
  */
object Sampling {

  /** Knuth multiplicative-hash priority in [0, 2^32): portable arithmetic
    * (identical in ANSI Spark and DuckDB for ids below ~3.4e9, where the
    * 64-bit product cannot overflow). */
  private[rel] def priority(id: Column): Column = pmod(id * lit(2654435761L), lit(4294967296L))

  /** At most `n` rows per group, chosen by hash priority of `idCol` —
    * a deterministic stratified downsample. One shuffle on the group key;
    * the per-group sort is bounded by the window, not a global orderBy.
    * Skew note: a single giant group still sorts its rows in one task —
    * at corpus scale pre-filter with [[temperatureTargets]]-style rates
    * instead of quotas when a group is a large fraction of the data. */
  def quotaPerGroup(df: DataFrame, groupCol: String, idCol: String, n: Int): DataFrame = {
    require(!df.columns.contains("_rn"), "input must not already carry a _rn column")
    val w = Window.partitionBy(col(groupCol)).orderBy(priority(col(idCol)), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }

  /** [[quotaPerGroup]] with a PER-GROUP quota — the execution half of a
    * temperature-rebalanced mix: feed it [[temperatureTargets]]'s
    * `(group, target_rows)` and it materializes the planned epoch sample.
    * `targets` is per-group metadata (one row per group) and broadcasts;
    * the data pays the same single group-key shuffle as the constant-n
    * quota. Groups absent from `targets` are dropped (target 0).
    * Duplicate group rows in `targets` are collapsed to their max quota
    * before the join — a duplicated target row must not fan out the join
    * and silently emit duplicate sampled rows. */
  def quotaByTargets(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      targets: DataFrame,
      targetCol: String = "target_rows"): DataFrame = {
    require(!df.columns.contains("_rn"), "input must not already carry a _rn column")
    val w = Window.partitionBy(col(groupCol)).orderBy(priority(col(idCol)), col(idCol))
    val uniqueTargets = targets
      .groupBy(col(groupCol))
      .agg(max(col(targetCol)).as(targetCol))
    df.join(broadcast(uniqueTargets), Seq(groupCol))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= col(targetCol))
      .drop("_rn", targetCol)
  }

  /** Deterministic train/val/test assignment: bucket = hash-priority of the
    * id mod 100, split by percentage ranges. The standard corpus-split rule
    * for training pipelines — membership is a pure function of the id, so
    * the split is stable across reruns, engines, partitionings, and corpus
    * growth (new docs never move old docs between splits, unlike any
    * `randomSplit`/sample approach). Zero shuffles — one projection.
    */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need 0 < trainPct and trainPct+valPct < 100, got $trainPct/$valPct")
    require(!df.columns.contains("split"), "input must not already carry a split column")
    val bucket = pmod(priority(col(idCol)), lit(100L))
    df.withColumn(
      "split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * algorithm A-ES): keep the top `n` rows per group by the key
    * `ln(u) / weight`, where `u ∈ (0, 1]` is the deterministic
    * hash-uniform of the id. Selecting the n LARGEST keys draws subsets
    * with inclusion probability proportional to weight — the
    * quality-weighted corpus downsample ("sample documents ∝ quality
    * score"), seed-free and rerun-stable like every sampler here.
    * `ln(u)/w` is monotone-equivalent to the textbook `u^(1/w)` at one
    * ln and one divide per row.
    *
    * `ln` is libm-dependent, so ranking uses the FLOAT32-SQUEEZED key
    * with the id tiebreak (the [[temperatureTargets]] convention) — any
    * engine replaying the integer hash lands on the identical sample.
    * One group-key shuffle; the sort is per-group. Weights must be
    * strictly positive (caller contract — a zero/negative weight
    * produces ±Inf/NaN keys and poisons its group's ordering).
    */
  def weightedSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weightCol: String,
      n: Int): DataFrame = {
    require(!df.columns.contains("_wkey"), "input must not already carry a _wkey column")
    require(!df.columns.contains("_rn"), "input must not already carry a _rn column")
    val u = (priority(col(idCol)) + lit(1L)).cast("double") / lit(4294967296.0)
    val key = log(u) / col(weightCol).cast("double")
    val w = Window
      .partitionBy(col(groupCol))
      .orderBy(col("_wkey").cast("float").cast("double").desc, col(idCol))
    df.withColumn("_wkey", key)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_wkey", "_rn")
  }

  /** Curriculum binning by EXACT value quantiles: assign each row to one
    * of `bins` equal-population buckets of `valueCol` (ascending) — the
    * "schedule short documents first" curriculum primitive, and the
    * general equal-depth histogram.
    *
    * NOT `ntile`: a global ntile shuffles every row into one sorted
    * window task. Here the rows reduce to a VALUE HISTOGRAM first
    * (distinct values × counts — metadata-sized for any discrete measure
    * like token counts, bounded by the max document length no matter how
    * many rows), boundaries come from a cumulative sum over that
    * histogram, and the assignment joins the boundary array back as a
    * broadcast 1-row frame: the data pays one combinable aggregate and
    * zero extra shuffles.
    *
    * Boundary `b` (1-based, `b < bins`) = min value whose cumulative
    * count ≥ ceil(b·N/bins); a row lands in the smallest bin whose
    * boundary admits it, i.e. `bin = 1 + #{b : boundary_b < value}`.
    * Ties share a bin (equal values never straddle a boundary), so bin
    * populations are equal only up to tie mass — exact, reproducible
    * arithmetic, unlike approx_percentile. All integers → every engine
    * replays the identical assignment.
    *
    * Caller contract: `valueCol` must be DISCRETE (token counts, byte
    * lengths, bucketed scores). A continuous double column makes the
    * histogram as large as the data and the boundary window a single
    * task — pre-round such a column (e.g. `round(x, 3)`) to bound the
    * distinct-value count before binning. */
  def quantileBins(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be ≥ 2, got $bins")
    val hist = df.groupBy(col(valueCol)).agg(count(lit(1)).as("_cnt"))
    // Single-partition window over the HISTOGRAM (metadata-sized), not
    // the data — same shape as temperatureTargets' global-share window.
    val cum = hist
      .withColumn("_cum", sum(col("_cnt")).over(Window.orderBy(col(valueCol))))
      .withColumn("_n", sum(col("_cnt")).over(Window.partitionBy()))
    val boundaries = cum
      .crossJoin(broadcast(
        df.sparkSession.range(1, bins).select(col("id").as("_b"))))
      // integer ceil(b·N/bins) without a float step (`div`, not `/` —
      // Spark's `/` is always double division)
      .filter(col("_cum") >= expr(s"(_b * _n + ${bins - 1}) div $bins"))
      .groupBy(col("_b"))
      .agg(min(col(valueCol)).as("_boundary"))
      .agg(sort_array(collect_list(col("_boundary"))).as("_bnds"))
    df.crossJoin(broadcast(boundaries))
      .withColumn(
        "bin",
        (aggregate(col("_bnds"), lit(0),
          (acc, bv) => acc + when(bv < col(valueCol), 1).otherwise(0)) + lit(1)).cast("int"))
      .drop("_bnds")
  }

  /** Per-group mixture targets under temperature `alpha`: weight
    * `n_g^alpha` normalized over groups, scaled to `total` rows. Pure
    * metadata output (one row per group) — the aggregate is map-side
    * partial, the normalization a single window over the tiny group set.
    *
    * `alpha = 1` keeps natural proportions, `alpha < 1` flattens toward
    * uniform (upweights rare groups), `alpha = 0` is uniform.
    *
    * Reproducibility: `pow` may differ by an ulp across engines, so the
    * weight and share are squeezed through float32 before the scale-and-
    * floor — any engine computing the same counts lands on the identical
    * `target_rows`, keeping the operator as seed-free portable as
    * [[quotaPerGroup]]. `floor(x + 0.5)` rather than `round` for the same
    * reason (one documented tie rule, no HALF_EVEN/HALF_UP ambiguity).
    */
  def temperatureTargets(df: DataFrame, groupCol: String, alpha: Double, total: Long): DataFrame = {
    val f32 = (c: Column) => c.cast("float").cast("double")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_rows"))
    val w = Window.partitionBy()
    counts
      .withColumn("weight", f32(pow(col("n_rows").cast("double"), lit(alpha))))
      .withColumn("share", f32(col("weight") / sum("weight").over(w)))
      .withColumn("target_rows", floor(col("share") * lit(total.toDouble) + lit(0.5)).cast("long"))
      .drop("weight")
  }

  /** Availability-capped temperature mixture by EXACT water-filling: give
    * source i the allocation `t_i = min(avail_i, w_i·λ)` with
    * `w_i = avail_i^temperature` and λ the unique level at which the
    * allocations sum to `budget` — the mixture [[temperatureTargets]]
    * computes, made feasible when a source simply doesn't HAVE its
    * uncapped share (the sampling-without-replacement reality every real
    * corpus mix hits; uncapped temperature targets silently over-ask tiny
    * sources). λ has a CLOSED FORM: sort sources by their cap breakpoint
    * `r_i = avail_i / w_i` (ascending — the order in which caps bind as λ
    * rises); if the first k sources are capped, λ_k = (budget − Σ_{≤k}
    * avail) / (Σ_{>k} w), and exactly one k satisfies
    * `r_k ≤ λ_k < r_{k+1}`. No iteration, no driver loop — one
    * metadata-sized window pass, and every arithmetic step (IEEE-exact
    * sqrt/pow of integer counts, cumulative sums in one fixed sorted
    * order, a single division) replays identically in SQL.
    *
    * `avail(source, avail)` — one row per source, positive long
    * availability; `budget ≤ Σ avail` (a larger budget caps everything).
    * Output: (source, avail, t_target f32, capped). */
  def cappedMixture(avail: DataFrame, budget: Double, temperature: Double): DataFrame = {
    val f32 = (c: Column) => c.cast("float").cast("double")
    val a = col("avail").cast("double")
    // temperature 0.5 routes through sqrt: IEEE requires sqrt correctly
    // rounded (pow does not), so the weights are BITWISE portable to any
    // engine at the canonical temperature
    val weight = if (temperature == 0.5) sqrt(a) else pow(a, lit(temperature))
    val base = avail
      .withColumn("w", weight)
      .withColumn("r", a / col("w"))
    val win = Window.orderBy("r", "source")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    val cum = base
      .withColumn("cum_c", sum(a).over(win))
      .withColumn("cum_w", sum("w").over(win))
      .withColumn("tw", sum("w").over(all))
      .withColumn("ta", sum(a).over(all))
      .withColumn("r_next", lead(col("r"), 1).over(Window.orderBy("r", "source")))
    // λ candidate for "sources up to and including this row are capped";
    // valid iff the level sits in this row's breakpoint interval
    val lam = (lit(budget) - col("cum_c")) / (col("tw") - col("cum_w"))
    val flagged = cum.withColumn(
      "lam_valid",
      when(
        col("tw") > col("cum_w"),
        when(lam >= col("r") && (col("r_next").isNull || lam < col("r_next")), lam)))
    // exactly one row carries a valid λ; none ⇒ no source capped (λ=T/ΣW)
    // unless budget ≥ total availability ⇒ everything capped. The latter
    // branch is short-circuited (`all_capped`) rather than signalled with
    // an infinite λ: a Double.MaxValue sentinel only worked because
    // w·MaxValue overflows to +Inf before least()/<= see it — correct
    // today, but resting on IEEE overflow semantics surviving any future
    // engine/SQL replay of the branch. A flag replays anywhere.
    val lambda = flagged
      .agg(
        max("lam_valid").as("lam_k"),
        max(col("tw")).as("tw0"),
        max(col("ta")).as("ta0"))
      .select(
        when(lit(budget) >= col("ta0"), lit(1L)).otherwise(lit(0L)).as("all_capped"),
        coalesce(col("lam_k"), lit(budget) / col("tw0")).as("lambda"))
    base
      .crossJoin(broadcast(lambda))
      .select(
        col("source"), col("avail"),
        f32round6(when(col("all_capped") === 1L, a)
          .otherwise(least(a, col("w") * col("lambda")))).as("t_target"),
        (col("all_capped") === 1L || a <= col("w") * col("lambda")).as("capped"))
  }

  private def f32round6(c: Column): Column =
    round(c.cast("float").cast("double"), 6) + lit(0.0)

  /** EXACT stratified split by the largest-remainder (Hamilton) method:
    * within every stratum the split sizes are exactly
    * `floor(n_g·pct/100)` plus one extra for the splits with the largest
    * integer remainders (ties broken by declared split order), so the
    * quotas sum to `n_g` exactly — no stratum ever loses or gains a row,
    * unlike bucket-based [[hashSplit]] whose per-stratum proportions are
    * only correct in expectation (a 30-row stratum under 80/10/10
    * bucketing can easily have zero validation rows; this operator
    * guarantees 3). Membership is deterministic: rows rank within their
    * stratum by the portable hash [[priority]], and rank ranges map to
    * splits — reproducible across engines, reruns, and partitionings.
    *
    * Dataflow at 100 TB: quota planning runs on per-stratum COUNTS
    * (metadata-sized — strata × splits rows, windowed on the stratum key,
    * then broadcast); the data pays exactly one shuffle (the stratum-key
    * window that ranks rows) and a broadcast range join against the quota
    * intervals. Skew note: a single giant stratum ranks in one task —
    * same caveat (and same mitigation) as [[quotaPerGroup]].
    *
    * `splits`: (name, percent) with percents positive and summing to 100.
    * Output: input columns + `split`. All arithmetic is exact 64-bit
    * integer (`n·pct` div/mod 100) — an external SQL engine replays the
    * allocation bit-for-bit. */
  def exactStratifiedSplit(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) && splits.map(_._2).sum == 100,
      s"split percents must be positive and sum to 100, got $splits")
    require(splits.map(_._1).distinct.length == splits.length, "split names must be unique")
    val reserved = Seq("split", "_rk", "_stratum", "lo", "hi")
    reserved.foreach(c =>
      require(!df.columns.contains(c), s"input must not already carry a '$c' column"))
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_g"))
    val splitDf = splits.zipWithIndex
      .map { case ((nm, p), i) => (nm, p, i) }
      .toDF("split", "pct", "split_idx")
    val byStratum = Window.partitionBy(col(stratumCol))
    val remRank = Window.partitionBy(col(stratumCol))
      .orderBy(col("rem").desc, col("split_idx"))
    val cum = Window.partitionBy(col(stratumCol)).orderBy(col("split_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val alloc = counts
      .crossJoin(splitDf)
      .withColumn("fl", expr("(n_g * pct) div 100"))
      .withColumn("rem", (col("n_g") * col("pct")) % 100)
      .withColumn("extras", col("n_g") - sum("fl").over(byStratum))
      .withColumn("rrank", row_number().over(remRank))
      .withColumn("quota", col("fl") + when(col("rrank") <= col("extras"), 1L).otherwise(0L))
      .withColumn("hi", sum("quota").over(cum))
      .withColumn("lo", col("hi") - col("quota"))
      .select(col(stratumCol).as("_stratum"), col("split"), col("lo"), col("hi"))
    val ranked = df.withColumn(
      "_rk",
      row_number().over(
        Window.partitionBy(col(stratumCol)).orderBy(priority(col(idCol)), col(idCol))))
    ranked
      .join(
        broadcast(alloc),
        // null-SAFE stratum equality: a NULL stratum is a stratum like any
        // other (groupBy/window both treat it as one group) — a plain ===
        // would silently drop every null-stratum row, breaking the
        // every-row-assigned-exactly-once contract
        ranked(stratumCol) <=> alloc("_stratum") &&
          col("_rk") > col("lo") && col("_rk") <= col("hi"))
      .drop("_stratum", "_rk", "lo", "hi")
  }
}
