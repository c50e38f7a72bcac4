package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for. The as-of join is
  * composed from built-ins — union the two sides, one running
  * `last(ignoreNulls)` window over (key, time) — so Catalyst plans ONE
  * shuffle on the key and no join at all; the naive formulation
  * (inequality theta-join + per-probe max) explodes to |probes|·|refs|
  * pairs per key and is unusable at crawl scale. DuckDB's NATIVE
  * `ASOF LEFT JOIN` serves as the independent oracle, so the composed
  * implementation is validated against a first-class engine one. */
object Temporal {

  private val ReservedCols = Set("__t", "__side", "__ref", "__m", "__kn", "__dup", "__ov", "__bin")

  /** As-of join: for every probe row, the latest reference row of the
    * same `key` with ref time ≤ probe time (inclusive), or nulls if none
    * precedes it — pandas `merge_asof` / DuckDB `ASOF JOIN` semantics.
    *
    * Contract (ENFORCED with require, so a violating caller fails loudly
    * instead of getting plan-order-dependent results): probe and ref
    * column names must be disjoint apart from `key` (rename on the ref
    * side first), and neither side may use the reserved `__`-prefixed
    * internal names. (key, refTs) uniqueness can't be checked without a
    * pass over the data — `debugChecks = true` surfaces duplicate
    * (key, refTs) ref pairs as the "asof_contract" observe metric
    * (max_dup_ref_rows > 1 ⇒ the contract is violated).
    *
    * Skew: the running-last window puts EVERY row of one key into one
    * task. That is the right shape for per-user/per-entity keys; a
    * degenerate hot key (null-ish domain, bot user) serializes its rows
    * through one task. The always-on "asof_skew" observe metric reports
    * max rows in any key (cheap: an extra frameless window over the SAME
    * key exchange — no additional shuffle). Escape hatch for a measured
    * hot key: time-slice it — add `floor(ts / slice)` to the join key,
    * run this operator per slice, and as-of join each slice's probes
    * against the union of its own and the previous slice's refs (the
    * previous slice contributes at most its last ref per key).
    *
    * The ref payload rides the sort as ONE struct column, so all its
    * fields always come from the same reference row (per-column
    * `last(ignoreNulls)` could mix rows when a payload field is null).
    * Output: every probe column, then every non-key ref column.
    *
    * `skewMetric` names the observe metric: Spark rejects two observed
    * metrics with the same name but different subplans in ONE query, so
    * a caller composing several as-ofs into a single plan must give
    * each a distinct name (as `asofJoinTimeSliced` does internally). */
  def asofJoin(probes: DataFrame, probeTs: String, refs: DataFrame, refTs: String,
      key: String, debugChecks: Boolean = false,
      skewMetric: String = "asof_skew"): DataFrame = {
    val shared = probes.columns.toSet.intersect(refs.columns.toSet)
    require(shared == Set(key),
      s"asofJoin: probe/ref columns must be disjoint apart from '$key'; shared: " +
        shared.filterNot(_ == key).mkString(", "))
    val reservedHits = (probes.columns ++ refs.columns).filter(ReservedCols)
    require(reservedHits.isEmpty,
      s"asofJoin: reserved internal column names in input: ${reservedHits.mkString(", ")}")
    val refPayload = refs.columns.filterNot(_ == key)
    val probeCols = probes.columns.filterNot(_ == key)
    val refStructT = refs.select(struct(refPayload.map(col): _*).as("__ref"))
      .schema("__ref").dataType
    val p = probes.select(
      col(key) +: col(probeTs).as("__t") +: lit(1).as("__side") +:
        (probeCols.map(col) :+ lit(null).cast(refStructT).as("__ref")): _*)
    val r = refs.select(
      col(key) +: col(refTs).as("__t") +: lit(0).as("__side") +:
        (probeCols.map(c => lit(null).cast(probes.schema(c).dataType).as(c)) :+
          struct(refPayload.map(col): _*).as("__ref")): _*)
    // refs sort before probes at the same instant, so an equal-time ref
    // IS visible to the probe (the inclusive <= of ASOF semantics)
    val w = Window.partitionBy(col(key)).orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = p.unionByName(r)
      // frameless count over the same key partitioning: rides the window
      // exchange, surfaces the largest key's row count for skew triage
      .withColumn("__kn", count(lit(1)).over(Window.partitionBy(col(key))))
      .observe(skewMetric, max(col("__kn")).as("max_key_rows"))
    val checked =
      if (!debugChecks) base
      else base
        // rows per (key, __t) on the REF side; > 1 ⇒ duplicate
        // (key, refTs) pairs — the result would be plan-order dependent
        .withColumn("__dup", when(col("__side") === 0,
          count(lit(1)).over(Window.partitionBy(col(key), col("__t"), col("__side"))))
          .otherwise(lit(1L)))
        .observe("asof_contract", max(col("__dup")).as("max_dup_ref_rows"))
    checked
      .withColumn("__m", last(col("__ref"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(probes.columns.map(col) ++ refPayload.map(f => col(s"__m.$f").as(f)): _*)
  }

  /** The documented hot-key escape hatch for `asofJoin`, made concrete:
    * identical semantics (left as-of, inclusive ≤), but no window
    * partition ever holds more than one time slice of one key — a
    * degenerate key (null-ish domain, bot user) whose rows would
    * serialize through one task in `asofJoin` is spread across
    * ceil(span / sliceWidth) tasks here.
    *
    * Shape: (1) an in-slice as-of on the composite (key, slice) window;
    * (2) the per-(key, slice) LATEST ref — an aggregation, so hot keys
    * partial-aggregate — as-of-joined on SLICE NUMBERS to each probe
    * slice (this table has one row per key-slice, not per row, so its
    * window partitions are bounded by the key's slice count); (3) every
    * probe takes its in-slice match if any, else the carry from earlier
    * slices. Three key shuffles instead of one — the price of bounding
    * the partition; use plain `asofJoin` until the `asof_skew` metric
    * says otherwise.
    *
    * Contract: `asofJoin`'s, plus both time columns NUMERIC and
    * NONNEGATIVE (slicing uses integer division), and input columns may
    * not use the `__`-prefixed internal names. */
  def asofJoinTimeSliced(probes: DataFrame, probeTs: String, refs: DataFrame,
      refTs: String, key: String, sliceWidth: Long): DataFrame = {
    require(sliceWidth > 0, "asofJoinTimeSliced: sliceWidth must be positive")
    // the inner as-ofs see only projected ref columns, so enforce the
    // outer contract HERE — otherwise shared payload names would surface
    // as silently duplicated output columns instead of an error
    val shared0 = probes.columns.toSet.intersect(refs.columns.toSet)
    require(shared0 == Set(key),
      s"asofJoinTimeSliced: probe/ref columns must be disjoint apart from '$key'; shared: " +
        shared0.filterNot(_ == key).mkString(", "))
    val internal = Set("__ks", "__inpay", "__pslice", "__pt", "__slice", "__last", "__rt")
    val hits = (probes.columns ++ refs.columns).filter(internal)
    require(hits.isEmpty,
      s"asofJoinTimeSliced: reserved internal column names in input: ${hits.mkString(", ")}")
    val refPayload = refs.columns.filterNot(_ == key)

    // (1) in-slice as-of on the composite key; ref payload rides as ONE
    // struct so the final coalesce picks a whole row, never mixes two
    val ps = probes.withColumn("__ks",
      struct(col(key), expr(s"$probeTs div $sliceWidth")))
    val rs = refs
      .withColumn("__ks", struct(col(key), expr(s"$refTs div $sliceWidth")))
      .withColumn("__inpay", struct(refPayload.map(col): _*))
      .select(col("__ks"), col(refTs), col("__inpay"))
    val inSlice = asofJoin(ps, probeTs, rs.withColumnRenamed(refTs, "__rt"), "__rt",
      "__ks", debugChecks = false, skewMetric = "asof_sliced_inslice")

    // (2) latest ref per (key, slice) — hot keys partial-aggregate here —
    // then an as-of over SLICE NUMBERS: probe slice s matches the
    // greatest ref slice ≤ s-1
    val lastPerSlice = refs
      .withColumn("__slice", expr(s"$refTs div $sliceWidth"))
      .groupBy(col(key), col("__slice"))
      .agg(max_by(struct(refPayload.map(col): _*), col(refTs)).as("__last"))
    val probeSlices = probes
      .select(col(key), expr(s"$probeTs div $sliceWidth").as("__pslice"))
      .distinct()
      .withColumn("__pt", col("__pslice") - 1)
    val carry = asofJoin(probeSlices, "__pt", lastPerSlice, "__slice", key,
        debugChecks = false, skewMetric = "asof_sliced_carry")
      .select(col(key), col("__pslice"), col("__last"))

    // (3) prefer the in-slice match, else the carried one
    inSlice
      .withColumn("__pslice", expr(s"$probeTs div $sliceWidth"))
      .join(carry, Seq(key, "__pslice"), "left")
      .withColumn("__inpay", coalesce(col("__inpay"), col("__last")))
      .select(probes.columns.map(col) ++
        refPayload.map(f => col(s"__inpay.$f").as(f)): _*)
  }

  /** Range (point-in-interval) join for NON-OVERLAPPING intervals per
    * key — sessions, validity periods, SCD-2 rows: an as-of join on the
    * interval START plus a containment filter on the END. Inherits
    * asofJoin's plan (one key shuffle, zero join nodes) where a naive
    * `BETWEEN` theta-join degenerates to a per-key nested loop. Inner
    * semantics: points in a gap (or with no interval at all) are
    * dropped; both interval endpoints are inclusive. Overlapping
    * intervals need interval binning instead — a different operator,
    * deliberately not hidden behind this one. */
  def pointInInterval(points: DataFrame, pointTs: String, intervals: DataFrame,
      startCol: String, endCol: String, key: String,
      debugChecks: Boolean = false): DataFrame = {
    val iv =
      if (!debugChecks) intervals
      else {
        // overlap detector: an interval starting before ANY earlier
        // interval (by start, per key) ended violates the non-overlap
        // contract — this operator would silently match points only to
        // the LATEST containing interval. A running max of end over ALL
        // preceding rows (not lag(end), which only sees the immediate
        // predecessor and misses an early long interval spanning a
        // non-adjacent later one) rides the same per-key sort. Count
        // surfaces as "interval_overlap".
        val w = Window.partitionBy(col(key)).orderBy(col(startCol).asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        intervals
          .withColumn("__ov",
            when(max(col(endCol)).over(w) >= col(startCol), 1L).otherwise(0L))
          .observe("interval_overlap", sum(col("__ov")).as("overlapping_intervals"))
          .drop("__ov")
      }
    asofJoin(points, pointTs, iv, startCol, key, debugChecks)
      .where(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
  }

  /** Range join for OVERLAPPING intervals — the general case
    * `pointInInterval` refuses: replicate each interval to every
    * `binWidth`-sized bucket it touches, equi-join points on
    * (key, bucket), then filter exact containment. A matching pair
    * meets in exactly one bucket (the point's), so no distinct is
    * needed and the cost is |intervals|·(width/binWidth) replication
    * plus one hash join — instead of the per-key nested loop a BETWEEN
    * theta-join plans. Pick binWidth near the typical interval width:
    * wider bins raise false candidates, narrower bins raise
    * replication. Bounds are numeric (cast timestamps to epoch first)
    * and inclusive on both ends.
    * Output: every point column, then every non-key interval column. */
  def rangeJoinBinned(points: DataFrame, pointTs: String, intervals: DataFrame,
      startCol: String, endCol: String, key: String, binWidth: Long): DataFrame = {
    val iv = intervals.withColumn("__bin", explode(sequence(
      floor(col(startCol) / binWidth).cast("long"),
      floor(col(endCol) / binWidth).cast("long"))))
    points.withColumn("__bin", floor(col(pointTs) / binWidth).cast("long"))
      .join(iv, Seq(key, "__bin"))
      .where(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__bin")
  }
}
