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

  /** As-of join: for every probe row, the latest reference row of the
    * same `key` with ref time ≤ probe time (inclusive), or nulls if none
    * precedes it — pandas `merge_asof` / DuckDB `ASOF JOIN` semantics.
    *
    * Contract: probe and ref column names must be disjoint apart from
    * `key` (rename on the ref side first), and (key, refTs) pairs must
    * be unique — with duplicates the chosen ref row would be plan-order
    * dependent in ANY engine, including DuckDB's native ASOF.
    *
    * The ref payload rides the sort as ONE struct column, so all its
    * fields always come from the same reference row (per-column
    * `last(ignoreNulls)` could mix rows when a payload field is null).
    * Output: every probe column, then every non-key ref column. */
  def asofJoin(probes: DataFrame, probeTs: String, refs: DataFrame, refTs: String,
      key: String): DataFrame = {
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
    p.unionByName(r)
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
      startCol: String, endCol: String, key: String): DataFrame =
    asofJoin(points, pointTs, intervals, startCol, key)
      .where(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))

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
