package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketches. The usual engine sketch
  * (`approx_count_distinct` / HLL) is implementation-defined — two
  * engines disagree bit-for-bit, so it can never sit under a hash-exact
  * cross-engine oracle. KMV (k-minimum-values, the theta-sketch
  * family's simplest member) is a pure function of a portable hash:
  * keep the k smallest normalized md5 values of the distinct inputs;
  * with u_k the k-th smallest, distinct ≈ (k-1)/u_k. Every engine that
  * can md5 computes the SAME estimate, which is what makes it usable in
  * this repo's oracle gate — and at 100 TB it is mergeable: per-
  * partition k-minima union to the global k-minima (one partial-agg
  * shuffle), the same merge law Iceberg/DataSketches theta sketches
  * rely on. */
object Sketches {

  /** Uniform [0,1) hash: 60 bits of md5 (15 hex chars — fits a long
    * EXACTLY, and the long→double cast rounds identically under IEEE in
    * any engine) scaled by 2^-60 (a power of two: exact). */
  private def u01(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
      .cast("double") / lit(1152921504606846976.0) // 2^60

  /** Per-group KMV distinct estimate. Shape: distinct (group, value)
    * partials absorb duplicate mass, then a per-group k-smallest via
    * row_number — Spark pushes the rank filter below the sort
    * (WindowGroupLimit), so no group ever fully sorts. When a group has
    * fewer than k distinct values the sketch IS exact (est = count).
    * Output: (group, n_minima, est_distinct). */
  def kmvDistinct(df: DataFrame, group: String, value: String, k: Int): DataFrame = {
    require(k >= 2, "kmvDistinct: k must be at least 2")
    val w = Window.partitionBy(col(group)).orderBy(col("u").asc)
    // NULL values are excluded EXPLICITLY: a null hashes to a null u,
    // which Spark's ASC ordering puts FIRST and most SQL engines put
    // LAST — an engine-dependent k-minima set. Distinct-count semantics
    // don't count NULL anyway.
    df.select(col(group), col(value)).where(col(value).isNotNull).distinct()
      .select(col(group), u01(col(value)).as("u"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .groupBy(col(group))
      .agg(count(lit(1)).as("n_minima"), max(col("u")).as("uk"))
      .select(col(group), col("n_minima"),
        round(when(col("n_minima") < k, col("n_minima").cast("double"))
          .otherwise((lit(k - 1) / col("uk"))), 4).as("est_distinct"))
  }
}
