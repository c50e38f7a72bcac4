package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language-ID
  * (stopword-hit heuristic), quality scoring (length/stopword/word-shape
  * ratios), token counting (whitespace + BPE-ish pre-tokenizer regex),
  * and positional rolling-hash document fingerprints. All pure
  * `functions._` column programs — codegen'd, engine-portable (DuckDB
  * oracles recompute them exactly). */
object TextAnalysis {

  /** Tiny English function-word profile for the n-gram/langid heuristic. */
  val EnStopwords: Seq[String] = Seq(
    "the", "a", "and", "of", "to", "in", "is", "it", "for", "on",
    "with", "as", "at", "by", "this", "that")

  private val stopArr = array(EnStopwords.map(lit): _*)

  /** Language-ID heuristic: share of tokens that are English function
    * words; ≥ 5% → 'en', else 'und'. Output: (id, n_tokens, en_hits,
    * en_ratio, lang_pred). */
  def langId(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), split(col(text), " ").as("toks"))
      .select(col(id),
        size(filter(col("toks"), t => t =!= "")).as("n_tokens"),
        size(filter(col("toks"), t => array_contains(stopArr, t))).as("en_hits"))
      .withColumn("en_ratio",
        round(when(col("n_tokens") > 0, col("en_hits").cast("double") / col("n_tokens"))
          .otherwise(0.0), 4))
      .withColumn("lang_pred", when(col("en_ratio") >= 0.05, lit("en")).otherwise(lit("und")))

  /** Quality score: length term (saturating at 200 words), stopword-ratio
    * term, and mean-word-length sanity band. Output columns rounded for
    * engine-portable comparison. */
  def qualityScore(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id),
      length(col(text)).as("n_chars"),
      filter(split(col(text), " "), t => t =!= "").as("toks"))
      .select(col(id), col("n_chars"),
        size(col("toks")).as("n_words"),
        size(filter(col("toks"), t => array_contains(stopArr, t))).as("stop_hits"),
        aggregate(transform(col("toks"), t => length(t)), lit(0), (a, v) => a + v).as("tok_chars"))
      .withColumn("mean_word_len",
        round(when(col("n_words") > 0, col("tok_chars").cast("double") / col("n_words"))
          .otherwise(0.0), 4))
      .withColumn("stop_ratio",
        round(when(col("n_words") > 0, col("stop_hits").cast("double") / col("n_words"))
          .otherwise(0.0), 4))
      .withColumn("quality",
        // unrounded ratios inside (rounded ratios produce exact-decimal
        // ties where HALF_UP/HALF_EVEN engines disagree)
        round(
          least(col("n_words").cast("double") / 200.0, lit(1.0)) * 0.5 +
            least(when(col("n_words") > 0,
              col("stop_hits").cast("double") * 5.0 / col("n_words")).otherwise(0.0),
              lit(1.0)) * 0.3 +
            when(col("mean_word_len").between(3.0, 8.0), 0.2).otherwise(0.0), 4))
      .drop("tok_chars")

  /** Token counts: whitespace tokens, alpha runs, and a BPE-ish
    * pre-tokenizer (`[a-z]+|[0-9]+|punct-run`). */
  def tokenCounts(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id),
      size(filter(split(col(text), " "), t => t =!= "")).as("n_ws_tokens"),
      size(expr(s"regexp_extract_all($text, '[a-z]+', 0)")).as("n_alpha_tokens"),
      size(expr(s"regexp_extract_all($text, '[a-z]+|[0-9]+|[^a-z0-9 ]+', 0)")).as("n_bpe_tokens"),
      length(col(text)).as("n_chars"))

  /** Repetition signals (the Gopher-rule family: a high share of
    * repeated n-grams marks boilerplate/spam that length or stopword
    * ratios miss): per doc,
    *   - `dup_trigram_frac` — the fraction of trigram OCCURRENCES that
    *     belong to a trigram appearing more than once in the doc
    *     (Σ cnt over grams with cnt>1, over n_tokens−2), and
    *   - `top_bigram_frac`  — the share of bigram occurrences taken by
    *     the single most frequent bigram (tie → lexicographically
    *     greatest gram, so the argmax is a plain `max(struct)` partial
    *     aggregation in any engine — no window, no nondeterminism).
    * Docs too short for an n-gram score 0. Scale shape: one narrow
    * explode per n, then two partial-aggregated shuffles keyed by
    * (doc, gram) — per-doc vocabulary is bounded by doc length, so no
    * key is ever hotter than the longest document. */
  def repetitionSignals(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = df
      .select(col(id), filter(split(col(text), " "), t => t =!= "").as("toks"))
      .select(col(id), col("toks"), size(col("toks")).as("n_tokens"))
    def gramCounts(n: Int) = toks
      .where(col("n_tokens") >= n)
      .select(col(id),
        explode(transform(sequence(lit(1), col("n_tokens") - (n - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(n))))).as("gram"))
      .groupBy(col(id), col("gram")).agg(count(lit(1)).as("cnt"))
    val tri = gramCounts(3).groupBy(col(id))
      .agg(sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup_occ"))
    val bi = gramCounts(2).groupBy(col(id))
      .agg(max(struct(col("cnt"), col("gram"))).as("top"))
      .select(col(id), col("top.cnt").as("top_cnt"), col("top.gram").as("top_bigram"))
    toks.select(col(id), col("n_tokens"))
      .join(tri, Seq(id), "left")
      .join(bi, Seq(id), "left")
      .select(col(id), col("n_tokens"),
        round(when(col("n_tokens") >= 3,
          coalesce(col("dup_occ"), lit(0L)).cast("double") / (col("n_tokens") - 2))
          .otherwise(0.0), 4).as("dup_trigram_frac"),
        coalesce(col("top_bigram"), lit("")).as("top_bigram"),
        round(when(col("n_tokens") >= 2,
          coalesce(col("top_cnt"), lit(0L)).cast("double") / (col("n_tokens") - 1))
          .otherwise(0.0), 4).as("top_bigram_frac"))
  }

  /** Positional fingerprint: Σ h32(token_i) · ((i mod 997)+1) mod 1e9+7,
    * h32 = first 8 md5 hex chars as int. Order-sensitive (a permuted doc
    * fingerprints differently) yet associative-safe for distributed sum. */
  def fingerprint(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), posexplode(split(col(text), " ")).as(Seq("i", "token")))
      .where(col("token") =!= "")
      .withColumn("h32", conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long"))
      .groupBy(col(id))
      .agg((sum(col("h32") * (pmod(col("i"), lit(997)) + 1)) % 1000000007L).as("fingerprint"))
}
