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
    * Output: every probe column, then every non-key ref column. */
  def asofJoin(probes: DataFrame, probeTs: String, refs: DataFrame, refTs: String,
      key: String, debugChecks: Boolean = false): DataFrame = {
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
      .observe("asof_skew", max(col("__kn")).as("max_key_rows"))
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
        // overlap detector: an interval starting before its predecessor
        // (by start, per key) ended violates the non-overlap contract —
        // this operator would silently match points only to the LATEST
        // containing interval. Count surfaces as "interval_overlap".
        val w = Window.partitionBy(col(key)).orderBy(col(startCol).asc)
        intervals
          .withColumn("__ov",
            when(lag(col(endCol), 1).over(w) >= col(startCol), 1L).otherwise(0L))
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
