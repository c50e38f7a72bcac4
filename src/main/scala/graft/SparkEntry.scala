package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kg.{PagesGen, Pipeline, Udfs}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with a DuckDB-equivalent `oracleSql` where the operator
  * is ANSI-SQL-expressible (regex-UDF kernels are golden-tested in
  * ScalaTest instead; see GoldenSpec). */
object SparkEntry {

  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship (SURVEY §7.2): build the KG on the synthetic corpus and
    * answer "which canonical entities appear in ≥2 distinct urls?" —
    * exercises extraction, linking, canonicalization, and the nodes
    * table in one query. */
  def entry(spark: SparkSession): DataFrame =
    spark.read.parquet(
        graft.queries.KgQueries.kgRun(spark, "/root/testdata/sf0.001") + "/nodes")
      .where(col("n_urls") >= 2)
      .select(col("canonical_name"), col("kind"), col("n_urls"), col("n_mentions"))
      .orderBy(col("n_urls").desc, col("canonical_name").asc)

  /** DuckDB-side equivalent of the live clean_text pattern chain
    * (/root/reference/src/config.py:39-50 — only 4 of 10 patterns can
    * match lowercased text, SURVEY §2.3). Parity with the Scala kernel
    * verified row-by-row against the executed reference at sf0.01. */
  private val cleanSql: String =
    "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      "lower(text), '\\b[\\w.-]+?@\\w+?\\.\\w+?\\b', '', 'g'), " +
      "'\\[[^\\]]*\\]', '', 'g'), " +
      "'[^\\x00-\\x7F]+', '', 'g'), " +
      "'<[^>]+>', '', 'g'), " +
      "'\\s+', ' ', 'g'))"

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    base ++ graft.queries.Relational.queries ++ graft.queries.DataOps.queries ++
      graft.queries.Extractors.queries ++ graft.queries.KgQueries.queries ++
      graft.queries.StreamingQueries.queries

  private def base: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C1 — the byte-identity kernel (SURVEY §2.3), via the NATIVE Catalyst
    // expression (graft.ext.CleanTextExpr, doGenCode — stays inside
    // whole-stage codegen; ExprSpec pins parity with the UDF)
    "c1_clean_text" -> ((s, dir) => {
      graft.ext.GraftFunctions.register(s)
      tbl(s, dir, "documents")
        .select(col("doc_id"), expr("graft_clean_text(text)").as("clean_text"))
    }),

    // A? — classic partial+final hash aggregation (scan→agg pushdown demo)
    "q1_agg" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_revenue"),
          count(lit(1)).as("n_rows")))
  )

  def oracleSql: Map[String, String] = Map(
    "c1_clean_text" ->
      s"SELECT doc_id, $cleanSql AS clean_text FROM documents",
    "q1_agg" ->
      ("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue, " +
        "count(*) AS n_rows FROM lineitem GROUP BY 1, 2")
  ) ++ graft.queries.Relational.oracles ++ graft.queries.DataOps.oracles ++
    graft.queries.Extractors.oracles ++ graft.queries.KgQueries.oracles ++
    graft.queries.StreamingQueries.oracles
}
