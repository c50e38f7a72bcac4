package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical retrieval scoring — the batch analog of the reference's
  * retriever surface (/root/reference/src/vector_store.py:163-213 ranks
  * chunks for a query; BM25 is the standard lexical counterpart for a
  * corpus-scale engine). Pure column program: one token explode, partial
  * aggregation for tf/df/dl, the two scalar corpus stats broadcast as a
  * 1-row table, top-k via TakeOrderedAndProject — no UDFs, no global
  * sort, no single-partition window over the corpus. */
object Retrieval {

  /** BM25 top-k over `docs`:
    * score(d) = Σ_t ln(1 + (N − df + ½)/(df + ½)) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * with tokens = `[a-z]+` runs (the ta_tokens alpha tokenizer).
    * Ranking is by the ROUNDED score (4 dp) with id as tie-break, so the
    * order is reproducible in any engine. Constants are passed as
    * pre-folded double literals — `lit(k1) + 1` and a SQL `k1 + 1` can
    * disagree in the last ulp, so callers' oracles must embed the same
    * folded values this function receives.
    * Output: (id, score, rank), rank ≤ k. */
  def bm25TopK(docs: DataFrame, id: String, text: String, terms: Seq[String], k: Int,
      k1Plus1: Double = 2.2, k1: Double = 1.2, oneMinusB: Double = 0.25,
      b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(id),
      explode(expr(s"regexp_extract_all($text, '[a-z]+', 0)")).as("term"))
    val dl = toks.groupBy(col(id)).agg(count(lit(1)).as("dl"))
    // n_docs/avgdl: integer-valued double sums < 2^53 are order-exact,
    // so avg() is engine-portable here
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = toks.where(col("term").isInCollection(terms))
      .groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "term")
      .join(dl, Seq(id))
      .crossJoin(broadcast(stats))
      .select(col(id),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          col("tf") * lit(k1Plus1) /
          (col("tf") + lit(k1) *
            (lit(oneMinusB) + lit(b) * col("dl") / col("avgdl")))).as("ts"))
      .groupBy(col(id)).agg(round(sum(col("ts")), 4).as("score"))
    val top = scored.orderBy(col("score").desc, col(id).asc).limit(k)
    // rank over the already-limited k rows (tiny), never over the corpus
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col(id).asc)
    top.withColumn("rank", row_number().over(w))
  }
}
