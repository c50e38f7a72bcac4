package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: lay documents out as a contiguous token
  * stream and cut fixed-size context windows — the concat-and-chunk
  * packing every LLM pretraining pipeline runs before tokenized docs
  * become training sequences.
  *
  * The stream is SHARDED: a single global token order would put the
  * whole corpus in one window partition (one task sorts everything).
  * Docs go to `nShards` deterministic shards (id mod nShards) and pack
  * per shard in id order — the production layout, since shards are
  * independent training files; the only shuffle is the shard
  * repartition, and the running sum is per-shard. At 100 TB, nShards is
  * sized so a shard's docs fit one task comfortably (shards ≈ output
  * training files, thousands of them).
  */
object Packing {

  /** Per-doc packed layout. Output: (id, shard, n_tokens,
    * tok_start/tok_end — the doc's [start, end) token span in its
    * shard's stream — and win_start/win_end, the first/last
    * `windowTokens`-sized window the doc overlaps). Empty docs occupy a
    * zero-width span at their stream position. Tokens are whitespace
    * tokens (the `TextAnalysis.tokenCounts` n_ws_tokens convention). */
  def packSequences(df: DataFrame, id: String, text: String,
      windowTokens: Long, nShards: Int,
      metricName: String = "pack_shards"): DataFrame = {
    require(windowTokens > 0 && nShards > 0)
    // pmod needs a numeric id — fail loudly up front instead of the
    // opaque cast/analysis error a string url id would produce three
    // operators deeper (hash a non-numeric id to a long first, e.g.
    // xxhash64, if that's what you have)
    val idType = df.schema(id).dataType.typeName
    require(Seq("byte", "short", "integer", "long", "decimal").exists(idType.startsWith),
      s"packSequences: id column '$id' must be numeric for pmod sharding, got $idType — " +
        "hash string ids to a long (xxhash64) before packing")
    val nToks = size(filter(split(col(text), " "), t => t =!= "")).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col(id).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // shard-skew observe (the asof_skew idiom): a per-shard token total
    // via an unbounded window over the SAME partitioning — it rides the
    // shard exchange already paid for the running sum, zero extra
    // shuffle — then max/sum observed. At scale a shard is one training
    // file; max_shard_tokens ≫ total/nShards means pmod sharding is
    // skewed and the biggest file straggles.
    val wAll = Window.partitionBy(col("shard"))
    df.select(col(id), pmod(col(id), lit(nShards.toLong)).as("shard"), nToks.as("n_tokens"))
      .withColumn("tok_end", sum(col("n_tokens")).over(w))
      .withColumn("__shard_toks", sum(col("n_tokens")).over(wAll))
      // metricName is a parameter (the repo's composability idiom —
      // Spark rejects two same-named observed metrics in one plan, so
      // a query packing two corpora must name them apart)
      .observe(metricName,
        max(col("__shard_toks")).as("max_shard_tokens"),
        sum(col("n_tokens")).as("total_tokens"))
      .drop("__shard_toks")
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      .withColumn("win_start", floor(col("tok_start") / windowTokens))
      .withColumn("win_end",
        floor(greatest(col("tok_end") - 1, col("tok_start")) / windowTokens))
      .select(col(id), col("shard"), col("n_tokens"),
        col("tok_start"), col("tok_end"), col("win_start"), col("win_end"))
  }
}
