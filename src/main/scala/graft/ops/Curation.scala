package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for a 100-TB training-data pipeline:
  * deterministic hash sampling (stable under reruns and repartitioning —
  * the id-hash pattern production pipelines use instead of `Random` or
  * `sample()`, whose output depends on partition layout), per-source
  * caps (bounding any one domain's share of a crawl), and benchmark
  * decontamination (containment of a held-out eval set's shingles inside
  * corpus docs). All pure column programs with DuckDB oracles. */
object Curation {

  /** Deterministic stratified sampling: keep a row iff its md5 bucket
    * (0..9999, from the first 8 hex chars of md5(id)) falls below its
    * stratum's rate in basis points. Integer compare — engine-exact; a
    * given id is in or out of the sample forever, independent of
    * partitioning, ordering, or rerun (the property `df.sample()` does
    * NOT have). Narrow pass: zero shuffles.
    * Output: (id, stratum, bucket). */
  def hashSample(df: DataFrame, id: String, stratum: String,
      ratesBp: Seq[(String, Int)], defaultBp: Int): DataFrame = {
    val bucket = pmod(conv(substring(md5(col(id).cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(10000L))
    val rate = ratesBp.foldRight(lit(defaultBp).cast("long")) { case ((k, v), acc) =>
      when(col("stratum") === k, lit(v.toLong)).otherwise(acc)
    }
    df.select(col(id), col(stratum).as("stratum"), bucket.as("bucket"))
      .where(col("bucket") < rate)
  }

  /** Per-group cap: the top `n` rows per group by (orderCol desc, id
    * asc) — the per-domain cap that stops any single source from
    * dominating a crawl-scale corpus. One shuffle on the group key; the
    * rank filter pushes a group-limit below the sort (Spark's
    * WindowGroupLimit), so no partition ever fully sorts.
    * Output: (id, group, orderCol, rank_in_group). */
  def capPerGroup(df: DataFrame, id: String, group: String, orderCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(col(group)).orderBy(col(orderCol).desc, col(id).asc)
    df.select(col(id), col(group), col(orderCol))
      .withColumn("rank_in_group", row_number().over(w))
      .where(col("rank_in_group") <= n)
  }

  /** Benchmark decontamination: char-n-gram containment of each
    * benchmark doc's shingle set inside corpus docs —
    * |shingles(c) ∩ shingles(b)| / |shingles(b)| ≥ threshold flags doc c
    * as contaminated by benchmark doc b. The benchmark side is broadcast
    * (eval sets are tiny next to a 100-TB corpus), so the corpus is
    * never shuffled for the join, and the shingle tables deduplicate
    * per-row (narrow `array_distinct` inside `charShingles`, no global
    * distinct shuffle) — the per-pair count aggregation is the only
    * corpus-sized shuffle. Output: (id, bench_id, n_shared, containment). */
  def decontaminate(corpus: DataFrame, bench: DataFrame, id: String, text: String,
      n: Int, minContainment: Double): DataFrame = {
    val cs = Dedup.charShingles(corpus, id, text, n)
    val bs = Dedup.charShingles(bench, id, text, n).withColumnRenamed(id, "bench_id")
    val bsz = bs.groupBy(col("bench_id")).agg(count(lit(1)).as("bn"))
    cs.join(broadcast(bs), Seq("shingle"))
      .groupBy(col(id), col("bench_id")).agg(count(lit(1)).as("n_shared"))
      .join(broadcast(bsz), Seq("bench_id"))
      .select(col(id), col("bench_id"), col("n_shared"),
        round(col("n_shared") / col("bn"), 4).as("containment"))
      .where(col("containment") >= minContainment)
  }
}
