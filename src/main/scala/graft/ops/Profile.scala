package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality summary a 100-TB ingest gate
  * runs before accepting a drop (the reference's per-upload "document
  * stats" panel, /root/reference/app_enhanced.py:1130-1180, generalized
  * from one PDF to any table): per column, row/null counts, a KMV
  * distinct ESTIMATE (the repo's own mergeable sketch — an exact
  * per-column distinct would be one full shuffle PER COLUMN), and
  * lexicographic min/max. */
object Profile {

  /** Profile `cols` of a table in ONE scan: the columns unpivot to
    * (column, value) rows (a narrow explode — k rows per input row, no
    * per-column pass), then a single partial-aggregated pass computes
    * counts and min/max per column while [[Sketches.kmvDistinct]]
    * estimates distincts over the same unpivot (exact below its k).
    *
    * Values profile as STRINGS: min/max are lexicographic, and the
    * distinct hash is over the string form — profile ints, strings,
    * dates, timestamps freely; beware FLOAT columns, whose string
    * rendering is engine-specific (cast/round them upstream if they
    * must hash-compare cross-engine). NULLs count in n_rows, are
    * excluded from n_nonnull, min/max, and the distinct estimate.
    * Output: (column, n_rows, n_nonnull, est_distinct, min_val,
    * max_val), one row per profiled column. */
  def profileColumns(df: DataFrame, cols: Seq[String], kmvK: Int = 64): DataFrame = {
    require(cols.nonEmpty, "profileColumns: need at least one column")
    require(cols.distinct.size == cols.size, "profileColumns: duplicate column")
    val unp = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("value"))): _*)).as("cv"))
      .select(col("cv.column").as("column"), col("cv.value").as("value"))
    val counts = unp.groupBy(col("column")).agg(
      count(lit(1)).as("n_rows"),
      count(col("value")).as("n_nonnull"),
      min(col("value")).as("min_val"),
      max(col("value")).as("max_val"))
    val kmv = Sketches.kmvDistinct(unp, "column", "value", kmvK)
      .select(col("column"), col("est_distinct"))
    // left join: an all-null column has no KMV row but must still profile
    counts.join(kmv, Seq("column"), "left")
      .select(col("column"), col("n_rows"), col("n_nonnull"),
        coalesce(col("est_distinct"), lit(0.0)).as("est_distinct"),
        col("min_val"), col("max_val"))
  }
}
