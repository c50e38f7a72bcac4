package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B: containment-pairs formulations at sf scale (noop sink).
  * Usage: runMain graft.tools.ContainProf <sfDir> */
object ContainProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Bench.newSession(cpus)
    def t(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[containprof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val tail = " additional tail content for near duplicate testing"
    val input = base
      .union(base.where(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .union(base.where(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(tail)).as("text")))
      .where(col("doc_id") % 4 === 0)

    // (a) the production op as-is
    t("a_current") {
      graft.ops.Dedup.containmentPairs(input, "doc_id", "text", 8, Int.MaxValue, 0.9) }
    t("a_current_2") {
      graft.ops.Dedup.containmentPairs(input, "doc_id", "text", 8, Int.MaxValue, 0.9) }

    // (c) hashed long join key, no anti-join (cap disarmed)
    def hashed(): DataFrame = {
      val sh = graft.ops.Dedup.charShingles(input, "doc_id", "text", 8)
        .select(col("doc_id"), xxhash64(col("shingle")).as("u"))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      sh.select(col("doc_id").as("id1"), col("u"))
        .join(sh.select(col("doc_id").as("id2"), col("u")), Seq("u"))
        .where(col("id1") < col("id2"))
        .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("shared_units"))
        .join(sizes.withColumnRenamed("doc_id", "id1").withColumnRenamed("sz", "sz1"), Seq("id1"))
        .join(sizes.withColumnRenamed("doc_id", "id2").withColumnRenamed("sz", "sz2"), Seq("id2"))
        .select(col("id1"), col("id2"),
          round(col("shared_units") / col("sz1"), 4).as("c_1_in_2"),
          round(col("shared_units") / col("sz2"), 4).as("c_2_in_1"))
        .where(col("c_1_in_2") >= 0.9 || col("c_2_in_1") >= 0.9)
    }
    t("c_hashed") { hashed() }
    t("c_hashed_2") { hashed() }

    // (d) posting-list pair explode (one shuffle of postings)
    def postingExplode(): DataFrame = {
      val sh = graft.ops.Dedup.charShingles(input, "doc_id", "text", 8)
        .select(col("doc_id"), xxhash64(col("shingle")).as("u"))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val lists = sh.groupBy(col("u"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .where(size(col("ids")) >= 2)
      lists.select(explode(expr(
          "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), y -> struct(x as id1, y as id2))))"))
          .as("p"))
        .select(col("p.id1"), col("p.id2"))
        .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("shared_units"))
        .join(sizes.withColumnRenamed("doc_id", "id1").withColumnRenamed("sz", "sz1"), Seq("id1"))
        .join(sizes.withColumnRenamed("doc_id", "id2").withColumnRenamed("sz", "sz2"), Seq("id2"))
        .select(col("id1"), col("id2"),
          round(col("shared_units") / col("sz1"), 4).as("c_1_in_2"),
          round(col("shared_units") / col("sz2"), 4).as("c_2_in_1"))
        .where(col("c_1_in_2") >= 0.9 || col("c_2_in_1") >= 0.9)
    }
    t("d_posting_explode") { postingExplode() }
    t("d_posting_explode_2") { postingExplode() }

    // row-identity check: c vs a
    val a = graft.ops.Dedup.containmentPairs(input, "doc_id", "text", 8, Int.MaxValue, 0.9)
      .select(col("id1"), col("id2"), col("c_1_in_2"), col("c_2_in_1"))
    println("[containprof] c minus a = " + hashed().exceptAll(a).count() +
      ", a minus c = " + a.exceptAll(hashed()).count())
    spark.stop()
  }
}
