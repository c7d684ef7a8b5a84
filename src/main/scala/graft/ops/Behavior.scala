package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-behavior analytics over the event stream (X113 funnel
  * conversion, X114 cohort retention) — the ordered-sequence and
  * lifecycle questions the reference's per-type counts
  * (streamlit_dashboard.py value_counts panels) cannot answer: "of the
  * users who did A, how many went on to do B then C, and how fast" and
  * "how many of each day's new users come back N days later".
  *
  * Both are FULL value oracles: every intermediate is integer
  * (epoch-micros timestamps, distinct-user counts), with one final
  * display division of identical shape in both engines.
  */
object Behavior {

  /** Ordered conversion funnel: per user, the FIRST occurrence of
    * `steps(0)`, then the first occurrence of each later step STRICTLY
    * AFTER the previous step's time, all within `horizonSec` of the
    * funnel start. Emits one row per step: users reaching it and the
    * exact average seconds from funnel start (integer micros summed —
    * sums of integer-valued doubles are exact below 2^53, so the one
    * display division replays bit-identically).
    *
    * Shape at scale: one hash aggregation for the entry step, then per
    * later step ONE equi-join on the user key + re-aggregation — all
    * stages shuffle on the same user key (co-partitioned under AQE; no
    * window over the full event history, no per-user sort of raw rows).
    * The per-step rollups are metadata-sized single-row aggregates.
    */
  /** The shared per-step reach frames: frame i holds one row per user
    * who reached step i, with `__t0` (funnel start) and `__tp` (step-i
    * reach time) in epoch micros.
    */
  private def funnelFrames(ev: DataFrame, user: String, typ: String,
      ts: String, steps: Seq[String],
      horizonSec: Long): Seq[DataFrame] = {
    require(steps.length >= 2, "funnel: need at least 2 steps")
    require(steps.distinct.length == steps.length, "funnel: duplicate step")
    require(horizonSec > 0, "funnel: horizon must be positive")
    val horizonUs = horizonSec * 1000000L
    val entry = ev.filter(col(typ) === steps.head)
      .groupBy(col(user))
      .agg(min(unix_micros(col(ts))).as("__t0"))
      .withColumn("__tp", col("__t0"))
    steps.tail.scanLeft(entry) { (prev, st) =>
      val nxt = ev.filter(col(typ) === st)
        .select(col(user).as("__u"), unix_micros(col(ts)).as("__ts"))
      prev.join(nxt, col(user) === col("__u"))
        .filter(col("__ts") > col("__tp") &&
          col("__ts") <= col("__t0") + lit(horizonUs))
        .groupBy(col(user), col("__t0"))
        .agg(min(col("__ts")).as("__tp"))
    }
  }

  /** Per-user funnel FACT TABLE — the joinable building block behind
    * [[funnel]]'s rollup: one row per (user, reached step) with the
    * exact integer micros from funnel start, which is what cohort/LTV
    * joins and conversion-latency distribution reads consume. Same
    * user-keyed join chain as [[funnel]]; ALL-INTEGER output — a full
    * value oracle with zero FP surface.
    */
  def funnelTimes(ev: DataFrame, user: String, typ: String, ts: String,
      steps: Seq[String], horizonSec: Long): DataFrame =
    funnelFrames(ev, user, typ, ts, steps, horizonSec)
      .zip(steps).zipWithIndex.map { case ((f, st), i) =>
        f.select(col(user),
          lit(i).cast("int").as("step_idx"), lit(st).as("step"),
          (col("__tp") - col("__t0")).cast("long").as("us_from_start"))
      }.reduce(_ unionByName _)

  def funnel(ev: DataFrame, user: String, typ: String, ts: String,
      steps: Seq[String], horizonSec: Long): DataFrame = {
    val frames = funnelFrames(ev, user, typ, ts, steps, horizonSec)
    frames.zip(steps).zipWithIndex.map { case ((f, st), i) =>
      f.agg(count(lit(1)).as("n_users"),
          sum(col("__tp") - col("__t0")).as("__sum_us"))
        .select(lit(i).cast("int").as("step_idx"),
          lit(st).as("step"),
          col("n_users"),
          round(col("__sum_us").cast("double") /
            (col("n_users").cast("double") * lit(1000000.0)), 6)
            .as("avg_sec_from_start"))
    }.reduce(_ unionByName _)
  }

  /** First-order event transition matrix (X115): per user, consecutive
    * event pairs in (ts, id) total order → per (from, to) the
    * transition count and its probability given `from` (one rounded
    * division). The behavioral "what happens next" view — next-step
    * probabilities the funnel's fixed step list doesn't enumerate.
    *
    * One window per user (key-partitioned, never global) + one hash
    * aggregation on the (from, to) pair; the per-from totals reuse the
    * same aggregate re-grouped (vocabulary-sized) and broadcast back.
    * The total order is pinned by (ts, `id`) so the lag is identical in
    * any engine — a FULL value oracle.
    *
    * `maxGapSec` (default: unbounded) applies the session-boundary
    * rule the streaming form's eviction depends on: consecutive events
    * more than `maxGapSec` apart form NO transition — a long silence
    * is a session break, not a behavioral step. With the bound set,
    * this is the exact batch twin of
    * [[graft.streaming.Stateful.transitionPairs]] with the same gap.
    */
  def transitions(ev: DataFrame, user: String, typ: String, ts: String,
      id: String, maxGapSec: Long = Long.MaxValue): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(user)).orderBy(col(ts), col(id))
    val gapPred =
      if (maxGapSec >= Long.MaxValue / 1000000L) lit(true)
      else unix_micros(col(ts)) - lag(unix_micros(col(ts)), 1).over(w) <=
        lit(maxGapSec * 1000000L)
    val pairs = ev
      .select(col(user), col(typ).as("to_type"),
        lag(col(typ), 1).over(w).as("from_type"),
        gapPred.as("__in_gap"))
      .filter(col("from_type").isNotNull && col("__in_gap"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
      .withColumnRenamed("from_type", "__f")
    pairs.join(broadcast(totals), col("from_type") === col("__f"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        round(col("n").cast("double") / col("n_from").cast("double"), 6)
          .as("p"))
  }

  /** RFM segmentation (X118): per user recency (last-seen micros),
    * frequency (event count), monetary (summed value, 2 dp), each
    * binned into quartiles by `ntile(4)` over a PINNED total order
    * (metric, then user id) — deterministic in any engine, unlike
    * percentile-boundary binning where one FP ulp flips boundary
    * users. Returns the segment rollup: (r, f, m) → users + the
    * segment's exact aggregate means (integer/2-dp sums, one display
    * division each).
    *
    * One user-keyed aggregation + three vocabulary-sized window passes
    * over the 1-row-per-user frame (NOT the raw events) + one hash
    * aggregation on the 64-cell segment space. The per-user frame is
    * the only window input, so the unpartitioned ntile windows sort
    * #users rows, not #events — at 100 TB shard them by range exactly
    * like X80 if #users outgrows a task.
    */
  def rfmSegments(ev: DataFrame, user: String, ts: String,
      value: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = ev
      .filter(col(user).isNotNull)
      .groupBy(col(user))
      .agg(max(unix_micros(col(ts))).as("__rec"),
        count(lit(1)).as("__freq"),
        round(sum(coalesce(col(value), lit(0.0))), 2).as("__mon"))
    def tile(metric: String) = ntile(4).over(
      Window.orderBy(col(metric), col(user)))
    perUser
      // integer cents: summing 2-dp doubles is order-sensitive in the
      // last ulp; summed longs are exact, one display division
      .withColumn("__cents",
        round(col("__mon") * lit(100.0), 0).cast("long"))
      .withColumn("r_tile", tile("__rec"))
      .withColumn("f_tile", tile("__freq"))
      .withColumn("m_tile", tile("__mon"))
      .groupBy(col("r_tile"), col("f_tile"), col("m_tile"))
      .agg(count(lit(1)).as("n_users"),
        round(sum(col("__cents")).cast("double") /
          (count(lit(1)).cast("double") * lit(100.0)), 6)
          .as("avg_monetary"),
        round(sum(col("__freq")).cast("double") /
          count(lit(1)).cast("double"), 6).as("avg_frequency"))
  }

  /** Cohort retention matrix: cohort = each user's first active day;
    * for every (cohort day, day offset) the distinct users active, the
    * cohort size, and the retention rate (one rounded division). Two
    * shuffles on the user key + one on the (cohort, offset) pair; the
    * cohort-size side is group-cardinality-bounded and broadcast.
    */
  def cohortRetention(ev: DataFrame, user: String, ts: String): DataFrame = {
    val ud = ev.select(col(user).as("__u"), to_date(col(ts)).as("__day"))
      .distinct()
    val first = ud.groupBy(col("__u")).agg(min(col("__day")).as("cohort_day"))
    val act = ud.join(first, "__u")
      .groupBy(col("cohort_day"),
        datediff(col("__day"), col("cohort_day")).cast("long")
          .as("day_offset"))
      .agg(countDistinct(col("__u")).as("n_active"))
    val sizes = first.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_size"))
      .withColumnRenamed("cohort_day", "__cd")
    act.join(broadcast(sizes), col("cohort_day") === col("__cd"))
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") /
          col("cohort_size").cast("double"), 6).as("retention"))
  }

  /** Bounded-retention cohort matrix — the batch twin of
    * [[graft.streaming.Stateful.cohortActivity]] with a retention
    * horizon: a user's cohort is their first active day, and activity
    * more than `horizonDays` after the cohort start RESETS the cohort
    * to that day (the user re-enters as new). Fixed-window-from-start
    * sessionization is inherently sequential (each reset depends on
    * the previous cohort start), so it folds per user over the sorted
    * DISTINCT day list — per-user state is that day list, bounded by
    * data span / retention policy, never the raw events. One distinct
    * aggregation + one user-keyed fold + the vocabulary-sized matrix
    * rollup; oracle-able in SQL via a recursive CTE
    * (`q_cohort_bounded`). Within a segment days are distinct, so
    * offsets are unique — no dedup needed (the streaming form's `seen`
    * set covers duplicate DELIVERY, which `distinct()` covers here).
    */
  def cohortRetentionBounded(ev: DataFrame, user: String, ts: String,
      horizonDays: Long): DataFrame = {
    require(horizonDays > 0, s"cohortRetentionBounded: $horizonDays")
    import ev.sparkSession.implicits._
    val acts = ev
      .select(col(user).cast("string").as("__u"),
        unix_date(to_date(col(ts))).cast("long").as("__d"))
      .distinct()
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (u: String, it: Iterator[(String, Long)]) =>
        val days = it.map(_._2).toVector.sorted
        var cohort = days.head
        days.iterator.map { d =>
          if (d - cohort > horizonDays) cohort = d
          (u, cohort, d - cohort)
        }
      }
      .toDF("__u", "cohort_epoch_day", "day_offset")
    val matrix = acts.groupBy(col("cohort_epoch_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
    // cohort size IS the matrix's own offset-0 cell (every segment
    // emits offset 0 exactly once) — deriving it from the aggregate
    // keeps the per-user fold single-execution (AQE reuses the
    // matrix exchange; a second fold branch would re-run MapGroups)
    val sizes = matrix.filter(col("day_offset") === 0L)
      .select(col("cohort_epoch_day").as("__cd"),
        col("n_active").as("cohort_size"))
    matrix.join(broadcast(sizes), col("cohort_epoch_day") === col("__cd"))
      .select(
        date_from_unix_date(col("cohort_epoch_day").cast("int"))
          .as("cohort_day"),
        col("day_offset"), col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double") /
          col("cohort_size").cast("double"), 6).as("retention"))
  }
}
