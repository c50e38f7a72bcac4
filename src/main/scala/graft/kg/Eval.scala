package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed KG-quality evaluation: triple precision / recall / F1
  * against a gold set, as a Spark op rather than a driver-side script.
  *
  * The north-rule acceptance gate (triple P/R ≥ 0.95 vs the reference)
  * is asserted in PipelineSpec at test scale; THIS is the deployment
  * form — at 10^12 documents the gold set (a labeled crawl slice, a
  * previous trusted build) is itself a big table, so the comparison has
  * to be a join, not a collect. Matching is on the exact (url, pred,
  * obj) key; counts flow through two LEFT SEMI joins (semi joins carry
  * no payload — the smallest possible shuffle for a membership test)
  * and the three scalars fold into one row. Ratios use the exact
  * integer micro-unit idiom: ppm = n·10⁶ div d (no engine float).
  *
  * Output (single row): (n_got, n_gold, n_match,
  * precision_ppm, recall_ppm, f1_ppm) — f1 = 2·match / (got + gold)
  * since dice-F1 over exact-match sets needs no float P/R intermediate.
  */
object Eval {

  def triplePR(got: DataFrame, gold: DataFrame): DataFrame = {
    val key = Seq("url", "pred", "obj")
    val g = got.select(key.map(col): _*).distinct()
    val h = gold.select(key.map(col): _*).distinct()
    val nGot = g.agg(count(lit(1)).as("n_got"))
    val nGold = h.agg(count(lit(1)).as("n_gold"))
    val nMatch = g.join(h, key, "left_semi").agg(count(lit(1)).as("n_match"))
    // loud zero guard (r5 ADVICE): Spark's integral div-by-zero yields
    // NULL where the DuckDB oracle's // raises, so a degenerate (empty)
    // extraction or gold set would diverge SILENTLY — fail in-plan
    // instead, the repo's loud-failure convention
    def nz(c: String): org.apache.spark.sql.Column =
      when(col(c) === 0L, raise_error(lit(
        s"triplePR: $c is 0 — empty extraction/gold set has no defined P/R")))
        .otherwise(col(c))
    nMatch.crossJoin(broadcast(nGot)).crossJoin(broadcast(nGold))
      .withColumn("n_got", nz("n_got"))
      .withColumn("n_gold", nz("n_gold"))
      .select(col("n_got"), col("n_gold"), col("n_match"),
        expr("n_match * 1000000 div n_got").as("precision_ppm"),
        expr("n_match * 1000000 div n_gold").as("recall_ppm"),
        expr("2 * n_match * 1000000 div (n_got + n_gold)").as("f1_ppm"))
  }
}
