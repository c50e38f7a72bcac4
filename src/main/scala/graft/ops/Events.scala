package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the crawl/telemetry event stream — the
  * behavioral-analytics counterpart to the reference's per-document
  * extractors (its processing-history list at
  * /root/reference/app_enhanced.py:1184-1195 is a flat event log; these
  * operators are what a warehouse does WITH such a log at scale):
  * ordered funnel completion and rolling anomaly detection on event-rate
  * time series. Both are pure column programs with integer-exact
  * arithmetic (hash-comparable cross-engine) and single-digit shuffle
  * counts that survive a 100-TB event table. */
object Events {

  /** Cohort retention matrix: users grouped by the week of their FIRST
    * event (the cohort), counted in every week they were active, with
    * the retention rate vs the cohort's size — the standard
    * product-analytics view of a telemetry log.
    *
    * Scale shape: ONE user-keyed shuffle of the events, once. A single
    * groupBy(user) yields both the cohort week (min ts) and the distinct
    * active weeks (collect_set, bounded by the calendar — weeks, not
    * events, so per-user state stays tiny no matter how hot the user);
    * the exploded (cohort, week) pairs partial-agg into the matrix, and
    * cohort sizes are read off the matrix's own DIAGONAL (a user's first
    * event makes them active in their cohort week, so the
    * active_week = cohort_week cell IS the cohort size) via a window
    * over the calendar²-sized matrix — no second consumer of the
    * per-user aggregate, so nothing is recomputed or joined back. The
    * naive formulation (per-user first event joined back against raw
    * events) shuffles the full event table twice. Output: (cohort_week,
    * active_week, n_users, cohort_users, retention). */
  def retention(events: DataFrame, user: String, ts: String): DataFrame = {
    val perUser = events
      .select(col(user).as("u"), col(ts).as("t"))
      .where(col("u").isNotNull && col("t").isNotNull)
      .groupBy(col("u"))
      .agg(date_trunc("week", min(col("t"))).as("cohort_week"),
        collect_set(date_trunc("week", col("t"))).as("weeks"))
    val w = Window.partitionBy(col("cohort_week"))
    perUser
      .select(col("cohort_week"), explode(col("weeks")).as("active_week"))
      .groupBy(col("cohort_week"), col("active_week"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("cohort_users",
        max(when(col("active_week") === col("cohort_week"), col("n_users"))).over(w))
      .select(col("cohort_week"), col("active_week"), col("n_users"),
        col("cohort_users"),
        round(col("n_users") * lit(1.0) / col("cohort_users"), 4).as("retention"))
  }

  /** Ordered funnel: how far through `steps` (an ordered list of event
    * types) each user progressed, where step i+1 must occur STRICTLY
    * after the chosen step-i event. Greedy earliest-first semantics —
    * equivalent to the textbook min-ts chain (t1 = min ts of step 1;
    * t_{i+1} = min ts of step i+1 with ts > t_i) because taking the
    * EARLIEST qualifying event at each level maximizes eligibility for
    * the next level.
    *
    * Scale shape: ONE shuffle total. Events filter narrowly to the step
    * types, then a single groupBy(user) collects each user's sorted
    * (ts, step) list and a codegen'd `aggregate` lambda folds it — vs
    * the naive k-pass min-ts chain, which rescans the events table once
    * PER STEP and shuffles k times. Per-user state is bounded by that
    * user's step-type event count (the sessionization bound; a user
    * whose events overflow one task's list is the same pathology as an
    * unsplittable session and gets the same answer: slice upstream).
    * Tie rule: an event at exactly t_i never advances step i+1 (strict
    * >); simultaneous events sort by (ts, step index) so the fold is
    * deterministic under any partitioning.
    * Output: (user, steps_completed, t_first, t_last) — t_first = the
    * step-1 ts, t_last = ts of the furthest completed step, both null
    * when steps_completed = 0 (the user had step-type events but never
    * step 1). Users with NO step-type events don't appear. */
  def funnel(events: DataFrame, user: String, ts: String, typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "funnel: need at least two steps")
    require(steps.distinct.size == steps.size, "funnel: steps must be distinct")
    val k = steps.size
    val idx = steps.zipWithIndex.foldRight(lit(-1)) { case ((s, i), acc) =>
      when(col(typeCol) === s, lit(i)).otherwise(acc)
    }
    val perUser = events
      // cast: parquet timestamps read as NTZ; unix_micros wants an
      // instant (session tz is pinned UTC, so the wall clock is the same)
      .select(col(user).as("user"),
        unix_micros(col(ts).cast("timestamp")).as("t"), idx.as("step"))
      .where(col("step") >= 0)
      .groupBy(col("user"))
      .agg(sort_array(collect_list(struct(col("t"), col("step")))).as("evs"))
    // fold state: d = steps completed, tp = ts of last completed step,
    // t1 = ts of step 1. Advance iff the event IS the next needed step
    // and (first step, or strictly after the previous step's ts).
    val folded = perUser.select(col("user"),
      expr(
        s"""aggregate(evs,
           |  named_struct('d', 0, 'tp', cast(null as bigint), 't1', cast(null as bigint)),
           |  (acc, x) -> if(acc.d < $k and x.step = acc.d and (acc.d = 0 or x.t > acc.tp),
           |    named_struct('d', acc.d + 1, 'tp', x.t,
           |                 't1', if(acc.d = 0, x.t, acc.t1)),
           |    acc))""".stripMargin).as("f"))
    folded.select(col("user").as(user),
      col("f.d").as("steps_completed"),
      timestamp_micros(col("f.t1")).as("t_first"),
      timestamp_micros(col("f.tp")).as("t_last"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences — the behavioral model behind next-event prediction and
    * anomalous-session scoring: count every adjacent (from → to) pair in
    * each user's (ts, type)-ordered stream, and express the conditional
    * probability as exact INTEGER parts-per-million
    * (n·1000000 div n_from — hash-comparable, no float division).
    * Tie rule: simultaneous events order by (ts, type), so equal-ts
    * duplicates contribute the same transition multiset under any
    * partitioning.
    *
    * Scale shape: ONE events-sized shuffle (the per-user window; the
    * sessionize bound — no partition is hotter than the busiest user),
    * then two transition-matrix-sized aggs (|types|² rows). lead() is
    * the whole sequence pass; no self-join of events against events.
    * Output: (from_type, to_type, n, n_from, p_ppm). */
  def transitionMatrix(events: DataFrame, user: String, ts: String,
      typeCol: String): DataFrame = {
    val w = Window.partitionBy(col("u")).orderBy(col("t"), col("from_type"))
    val next = events
      .select(col(user).as("u"), col(ts).as("t"), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
    val cnt = next.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
    cnt.join(tot, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        expr("n * 1000000L div n_from").as("p_ppm"))
  }

  /** Rolling z-score spike detection on per-(key, hour) event counts —
    * the feed monitor a 100-TB crawl ingest needs (a host or event type
    * whose hourly rate jumps z sigmas above its own trailing window is a
    * crawler trap, an outage, or a spam burst). Entirely INTEGER
    * arithmetic, so flags hash-compare cross-engine: with x the bucket
    * count and (n, s, ss) the trailing window's count/sum/sum-of-squares
    * over the previous `lookback` buckets,
    *   anomaly  ⇔  n ≥ minPrev  ∧  x·n − s > 0
    *             ∧  (x·n − s)²·zDen² > zNum²·(n·ss − s²)
    * which is exactly x > mean + z·σ (population σ, z = zNum/zDen)
    * cleared of divisions and square roots.
    *
    * Scale shape: the events-sized shuffle is the (key, hour) partial
    * aggregation (map-side combine crushes it to bucket cardinality);
    * the trailing-window pass then shuffles only the BUCKET table on
    * key. The window frame is `rowsBetween`, i.e. the previous lookback
    * OBSERVED buckets — silent hours are absent rows, not zeros (the
    * sessionize convention; densify upstream if gaps must count).
    * Counts are guarded ≤ 100M in-plan (beyond that (x·n−s)²
    * approaches Long overflow — pre-aggregate to a coarser bucket or
    * pre-scale counts at that volume).
    * Output: (key, bucket_hour, cnt, n_prev, sum_prev, is_anomaly). */
  def rollingAnomalies(events: DataFrame, key: String, ts: String,
      lookback: Int = 24, zNum: Long = 3L, zDen: Long = 1L,
      minPrev: Int = 8): DataFrame = {
    require(lookback >= 2 && minPrev >= 2 && minPrev <= lookback,
      "rollingAnomalies: need 2 <= minPrev <= lookback")
    require(zNum >= 1L && zDen >= 1L, "rollingAnomalies: need zNum, zDen >= 1")
    val maxCnt = 100000000L
    val buckets = events
      .groupBy(col(key).as("key"), date_trunc("hour", col(ts)).as("bucket_hour"))
      .agg(count(lit(1)).as("cnt"))
    val cntG = when(col("cnt") > maxCnt,
      raise_error(concat(lit(s"rollingAnomalies: bucket count exceeds $maxCnt " +
        "(pre-scale or coarsen buckets): "), col("cnt").cast("string"))))
      .otherwise(col("cnt"))
    val w = Window.partitionBy(col("key")).orderBy(col("bucket_hour"))
      .rowsBetween(-lookback.toLong, -1L)
    val stats = buckets.select(col("key"), col("bucket_hour"), cntG.as("cnt"))
      .withColumn("n_prev", count(lit(1)).over(w))
      .withColumn("sum_prev", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("ssq_prev", coalesce(sum(col("cnt") * col("cnt")).over(w), lit(0L)))
    val dev = col("cnt") * col("n_prev") - col("sum_prev")
    val varN2 = col("n_prev") * col("ssq_prev") - col("sum_prev") * col("sum_prev")
    stats.select(col("key"), col("bucket_hour"), col("cnt"),
      col("n_prev"), col("sum_prev"),
      (col("n_prev") >= minPrev.toLong && dev > 0L &&
        dev * dev * lit(zDen * zDen) > lit(zNum * zNum) * varN2).as("is_anomaly"))
  }
}
