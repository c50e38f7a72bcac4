package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exactness baseline, and
  * random-hyperplane LSH bucketing as the scale path (bucketed candidate
  * join + exact re-rank). Hyperplane weights derive from md5 nibbles so
  * buckets are reproducible in any engine. All math in `functions._`
  * higher-order expressions (zip_with/aggregate) — codegen, no UDFs. */
object Similarity {

  /** cosine(a, b) with double accumulation, left-to-right fold. */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(ad, x => x * x), lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(bd, x => x * x), lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Brute-force cosine top-k: every probe row scored against every
    * corpus row (one broadcast of the probe set — the corpus is never
    * shuffled), ranked by (rounded score desc, id asc) for determinism.
    * Output: (probe_id, neighbor_id, cos_sim, rank). */
  def cosineTopK(corpus: DataFrame, probes: DataFrame, id: String, vec: String, k: Int): DataFrame = {
    val p = probes.select(col(id).as("probe_id"), col(vec).as("probe_vec"))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("corpus_vec"))
    val scored = c.crossJoin(broadcast(p))
      .where(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        round(cosine(col("probe_vec"), col("corpus_vec")), 4).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic hyperplane weight for (plane p, dim i): md5 nibble at
    * position (i mod 32) of md5(p||':'||i), centered at 7.5. */
  private def planeWeight(p: Column, i: Column): Column =
    expr("instr('0123456789abcdef', substring(md5(concat(p, ':', i)), (i % 32) + 1, 1)) - 1") - lit(7.5)

  /** Random-hyperplane LSH bucket bits: for each of nPlanes, the sign of
    * dot(vec, plane). Output: (id, bucket) with bucket a '0'/'1' string. */
  def lshBuckets(df: DataFrame, id: String, vec: String, nPlanes: Int = 8): DataFrame = {
    val dims = df.select(col(id),
      posexplode(transform(col(vec), x => x.cast("double"))).as(Seq("i", "x")))
    val planes = dims
      .select(col(id), col("i"), col("x"), explode(array((0 until nPlanes).map(lit): _*)).as("p"))
      .withColumn("w", planeWeight(col("p"), col("i")))
      .groupBy(col(id), col("p"))
      .agg(sum(col("x") * col("w")).as("dot"))
      .withColumn("b", when(col("dot") > 0, lit("1")).otherwise(lit("0")))
    planes.groupBy(col(id))
      .agg(concat_ws("",
        transform(array_sort(collect_list(struct(col("p"), col("b")))),
          x => x.getField("b"))).as("bucket"))
  }

  /** ANN via LSH buckets: candidates share a bucket; exact cosine re-rank
    * inside the bucket. Misses cross-bucket neighbors (that's the
    * recall/cost trade — the scale path for 100 TB corpora). */
  def annTopK(df: DataFrame, id: String, vec: String, k: Int, nPlanes: Int = 8): DataFrame = {
    val withBucket = df.join(lshBuckets(df, id, vec, nPlanes), Seq(id))
    val l = withBucket.select(col("bucket"), col(id).as("probe_id"), col(vec).as("probe_vec"))
    val r = withBucket.select(col("bucket"), col(id).as("neighbor_id"), col(vec).as("corpus_vec"))
    val scored = l.join(r, Seq("bucket"))
      .where(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        round(cosine(col("probe_vec"), col("corpus_vec")), 4).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs: bucketed candidates with
    * rounded cosine ≥ threshold (id1 < id2). */
  def cosineNearDups(df: DataFrame, id: String, vec: String,
      threshold: Double, nPlanes: Int = 8): DataFrame = {
    val withBucket = df.join(lshBuckets(df, id, vec, nPlanes), Seq(id))
    val l = withBucket.select(col("bucket"), col(id).as("id1"), col(vec).as("v1"))
    val r = withBucket.select(col("bucket"), col(id).as("id2"), col(vec).as("v2"))
    l.join(r, Seq("bucket"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), round(cosine(col("v1"), col("v2")), 4).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
      .distinct()
  }
}
