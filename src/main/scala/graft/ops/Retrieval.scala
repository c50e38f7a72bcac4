package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval scoring — the batch analog of the reference's
  * retriever surface (/root/reference/src/vector_store.py:163-213 ranks
  * chunks for a query; BM25 is the standard lexical counterpart for a
  * corpus-scale engine). Pure column programs: token explode, partial
  * aggregation for tf/df/dl, scalar corpus stats broadcast as tiny
  * tables, top-k via TakeOrderedAndProject — no UDFs, no global sort,
  * no single-partition window over the corpus. */
object Retrieval {

  /** The `[a-z]+` alpha tokenizer (ta_tokens semantics) — ONE definition
    * shared by the one-shot scorer and the index builder, so the
    * `bm25FromIndex ≡ bm25TopK` and `dl = Σ tf` invariants cannot be
    * broken by editing a stray copy. */
  private def tokens(text: String): Column =
    explode(expr(s"regexp_extract_all($text, '[a-z]+', 0)"))

  /** One (doc, term) BM25 contribution from columns (tf, df, dl, n_docs,
    * avgdl):  ln(1 + (N − df + ½)/(df + ½)) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    * k1+1 and 1−b are folded HERE, in Scala IEEE arithmetic (for the
    * defaults they equal the literals 2.2 and 0.25 exactly) — a SQL-side
    * `k1 + 1` would fold through DuckDB DECIMAL arithmetic instead, so
    * oracles must embed the already-folded double values. */
  private def bm25Term(k1: Double, b: Double): Column =
    log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
      col("tf") * lit(k1 + 1) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))

  /** Top-k by (rounded score desc, id asc): TakeOrderedAndProject limit
    * first, then rank over the surviving k rows — never a
    * single-partition window over the corpus. Ranking on the ROUNDED
    * score keeps the order reproducible in any engine. */
  private def topKRanked(scored: DataFrame, id: String, k: Int): DataFrame = {
    val top = scored.orderBy(col("score").desc, col(id).asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col(id).asc)
    top.withColumn("rank", row_number().over(w))
  }

  /** One-shot BM25 top-k over raw text.
    *
    * dl and every per-term tf come out of ONE conditional-aggregation
    * pass over the exploded tokens (`perdoc`); df, N and avgdl collapse
    * into a single per-term broadcast table (each doc emits exactly one
    * unpivoted row per term, so count/avg per term ARE the global
    * stats). Two corpus scans total (PlanSpec-gated): one for the tiny
    * stats table, one for scoring — the minimum for one-shot BM25 from
    * raw text, since scores need the global stats first (a naive
    * tf/df/dl/stats-as-separate-branches formulation scans 4×; one scan
    * would need a materialized token table — see `buildIndex`).
    * Output: (id, score, rank), rank ≤ k. */
  def bm25TopK(docs: DataFrame, id: String, text: String, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    topKRanked(bm25ScoresBy(docs, Seq(id), text, terms, k1, b), id, k)

  /** The shared one-shot scoring core: (ids..., score) for every unit
    * (doc or passage) matching ≥1 term — `bm25TopK` cuts it to top-k,
    * `bm25MaxP` folds passage units back to their parent doc first. */
  private def bm25ScoresBy(docs: DataFrame, ids: Seq[String], text: String,
      terms: Seq[String], k1: Double, b: Double): DataFrame = {
    val idCols = ids.map(col)
    val toks = docs.select(idCols :+ tokens(text).as("term"): _*)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf_$i")
    }
    val aggCols = count(lit(1)).as("dl") +: tfCols
    val perdoc = toks.groupBy(idCols: _*).agg(aggCols.head, aggCols.tail: _*)
    val unpiv = perdoc.select(idCols ++ Seq(col("dl"),
      explode(array(terms.indices.map(i =>
        struct(lit(terms(i)).as("term"), col(s"tf_$i").as("tf"))): _*)).as("p")): _*)
      .select(idCols ++ Seq(col("dl"), col("p.term").as("term"), col("p.tf").as("tf")): _*)
    // one row per (doc, term) with no filter, so per-term count/avg ARE
    // the corpus-global N and avgdl; n_docs/avgdl are integer-valued
    // double sums < 2^53 — order-exact, engine-portable
    val meta = unpiv.groupBy(col("term")).agg(
      count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"),
      sum(when(col("tf") > 0, 1L).otherwise(0L)).as("df"))
    unpiv.where(col("tf") > 0).join(broadcast(meta), "term")
      .select(idCols :+ bm25Term(k1, b).as("ts"): _*)
      .groupBy(idCols: _*).agg(round(sum(col("ts")), 4).as("score"))
  }

  /** Materialized inverted index: (term, id, tf) postings. Built once
    * (one corpus scan, one shuffle on (term, id) with map-side combine),
    * it is the "serve many queries with ZERO corpus scans" path that
    * one-shot `bm25TopK` cannot have — the 100-TB deployment shape. */
  def buildIndex(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id), tokens(text).as("term"))
      .groupBy(col("term"), col(id)).agg(count(lit(1)).as("tf"))

  /** BM25 served from a materialized index — never touches raw text.
    * dl is recovered as Σ_t tf (the index covers every token), so
    * scores are EXACTLY `bm25TopK`'s (OpsSpec pins the equality). All
    * derived tables (dl, df, stats) scan the postings, which are a
    * fraction of corpus bytes. Output: (id, score, rank). */
  def bm25FromIndex(index: DataFrame, id: String, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val dl = index.groupBy(col(id)).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = index.where(col("term").isInCollection(terms))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "term")
      .join(dl, Seq(id))
      .crossJoin(broadcast(stats))
      .select(col(id), bm25Term(k1, b).as("ts"))
      .groupBy(col(id)).agg(round(sum(col("ts")), 4).as("score"))
    topKRanked(scored, id, k)
  }

  /** Reciprocal-rank fusion of two or more rankings — THE standard
    * hybrid-retrieval combiner (sparse BM25 + dense ANN lists feed one
    * fused ranking; Cormack et al.'s rrf(d) = Σ_lists 1/(k0+rank_d)).
    * Here each contribution is ⌊scale/(k0+rank)⌋, floored to an exact
    * integer BEFORE the sum (the adamicAdar idiom: long sums are
    * partition-order-free, so the fused scores hash-compare
    * cross-engine; float RRF sums would not). Rank-only fusion is the
    * point: BM25 scores and cosine similarities live on incomparable
    * scales, but their RANKS fuse directly — no score normalization,
    * no tuning beyond k0 (60 is the published default).
    *
    * Scale shape: inputs are top-k lists (per query, k rows each — the
    * OUTPUT of the retrievers, never corpus-sized), so the union + ONE
    * partial-agg shuffle on the doc id is list-sized; the final cut is
    * a TakeOrderedAndProject, no global sort. For a multi-query batch,
    * pass rankings keyed by a composite id (e.g. a
    * `concat(query_id, ':', doc_id)` column or a per-query loop) — the
    * program is unchanged. Rank contract: ranks must be ≥ 1 (rank 0
    * would overweight `scale div k0` and signals a 0-indexed caller) —
    * enforced in-plan via `raise_error`.
    * Output: (id, score, n_lists, rank), rank ≤ topK by
    * (score desc, id asc). */
  def rrfFuse(rankings: Seq[DataFrame], id: String, rankCol: String,
      topK: Int, k0: Int = 60, scale: Long = 1000000L): DataFrame = {
    require(rankings.size >= 2,
      "rrfFuse: need at least two rankings to fuse — one list is already fused")
    require(k0 >= 1 && topK >= 1 && scale >= 1,
      "rrfFuse: need k0, topK, scale >= 1")
    val parts = rankings.map(_.select(col(id), col(rankCol).cast("long").as("__rank")))
    val rankG = when(col("__rank") < 1L,
      raise_error(concat(lit("rrfFuse: rank must be >= 1 (0-indexed input?): "),
        col("__rank").cast("string"))))
      .otherwise(col("__rank"))
    // the guard must FEED the contribution (a separate guarded column
    // would be pruned away unreferenced and never fire)
    val fused = parts.reduce(_ unionAll _)
      .select(col(id), rankG.as("__rank"))
      .select(col(id), expr(s"${scale}L div (${k0}L + __rank)").as("__c"))
      .groupBy(col(id))
      .agg(sum(col("__c")).as("score"), count(lit(1)).as("n_lists"))
    topKRanked(fused, id, topK)
      .select(col(id), col("score"), col("n_lists"), col("rank"))
  }

  /** Sparse TF-IDF cosine document-pair similarity — the lexical
    * counterpart to `Similarity.cosineNearDups` (dense embeddings) and
    * the classic plagiarism/near-dup detector when no embedding model
    * is in the loop: weight each (doc, term) by tf·ln(N/df), join the
    * postings with themselves ON THE TERM (a pair of docs meets once
    * per shared term — never an all-pairs doc join), partial-agg the
    * dot products, normalize by the per-doc norms, keep the global
    * top-k pairs by rounded cosine.
    *
    * The scale guard is `maxDf`: a term in more than `maxDf` docs
    * contributes df² pair rows (the stopword quadratic — "the" at
    * 10^10 docs is 10^20 rows), so ubiquitous terms are DROPPED —
    * exactly the pruning every production sparse-similarity system
    * applies (such terms carry ~zero idf weight anyway), capped and
    * OBSERVED via `metricName` (dropped_terms, max_df — a run that
    * pruned everything is visible, never silent). The df table is
    * vocabulary-sized; n_docs rides a broadcast scalar, norms a
    * doc-keyed join of aggregates.
    * Output: (doc_a, doc_b, n_shared_terms, cos_sim), doc_a < doc_b,
    * top `k` by (cos_sim desc, doc_a, doc_b). */
  def sparseCosinePairs(df: DataFrame, id: String, text: String, k: Int,
      maxDf: Long = 1000L, metricName: String = "sparse_sim_terms"): DataFrame = {
    require(k >= 1 && maxDf >= 2L, "sparseCosinePairs: need k >= 1, maxDf >= 2")
    val dt = df.select(col(id).as("doc"), tokens(text).as("term"))
      .groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf"))
    val nd = df.agg(count(lit(1)).as("n_docs"))
    val kept = dt.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .observe(metricName,
        sum(when(col("df") > maxDf, 1L).otherwise(0L)).as("dropped_terms"),
        max(col("df")).as("max_df"))
      .where(col("df") <= maxDf)
    val wtd = dt.join(kept, Seq("term")).crossJoin(broadcast(nd))
      .select(col("doc"), col("term"),
        (col("tf") * log(col("n_docs").cast("double") / col("df"))).as("w"))
    val norms = wtd.groupBy(col("doc")).agg(sum(col("w") * col("w")).as("nsq"))
    wtd.select(col("term"), col("doc").as("doc_a"), col("w").as("wa"))
      .join(wtd.select(col("term"), col("doc").as("doc_b"), col("w").as("wb")),
        Seq("term"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("wa") * col("wb")).as("dot"),
        count(lit(1)).as("n_shared_terms"))
      .join(norms.select(col("doc").as("doc_a"), col("nsq").as("nsq_a")), Seq("doc_a"))
      .join(norms.select(col("doc").as("doc_b"), col("nsq").as("nsq_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_shared_terms"),
        round(col("dot") / (sqrt(col("nsq_a")) * sqrt(col("nsq_b"))), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("doc_a").asc, col("doc_b").asc)
      .limit(k)
  }

  /** Per-document top-n TF-IDF terms — the classic salience profile a
    * corpus browser/keyword extractor wants, and the lexical
    * feature-vector builder's core. tfidf = tf · ln(N/df); every
    * floating-point step (long→double cast, ÷, ×, ln as in the
    * BM25 oracle, round to 4) is replayed identically by the SQL
    * oracle. Shape: one token-explode pass → (doc, term) partial tf →
    * vocabulary-sized df table joined back (runtime-broadcastable) →
    * per-doc top-n on the ROUNDED score via row_number, whose rank
    * filter pushes a WindowGroupLimit below the sort (no doc's term
    * list fully sorts). Output: (id, term, tf, df, tfidf, rn), rn ≤ n. */
  def tfIdfTerms(docs: DataFrame, id: String, text: String, topN: Int): DataFrame = {
    val toks = docs.select(col(id), tokens(text).as("term"))
    val tf = toks.groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfT, Seq("term")).crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") * log(col("n_docs") / col("df")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= topN)
      .select(col(id), col("term"), col("tf"), col("df"), col("tfidf"), col("rn"))
  }

  /** Fixed-size token-window PASSAGES with stride — the RAG chunking
    * convention (overlapping windows so no answer span straddles a
    * boundary un-retrieved; stride < size ⇒ overlap size − stride).
    * One window starts at every multiple of `stride` below the token
    * count; the final windows are the natural remainders (slice caps at
    * the end). Narrow explode, zero shuffles, embarrassingly parallel —
    * at 100 TB this is the map stage feeding the embedding/indexing
    * fleet. Output: (id, passage_id, start_tok, n_tokens, passage). */
  def passageWindows(docs: DataFrame, id: String, text: String,
      size: Int, stride: Int): DataFrame = {
    require(size >= 1 && stride >= 1,
      s"passageWindows: size/stride must be >= 1, got $size/$stride")
    val toks = filter(split(col(text), " "), t => t =!= "")
    docs.select(col(id), toks.as("toks"))
      .where(org.apache.spark.sql.functions.size(col("toks")) > 0)
      .select(col(id), col("toks"),
        explode(sequence(lit(0),
          org.apache.spark.sql.functions.size(col("toks")) - 1,
          lit(stride))).as("start_tok"))
      .select(col(id),
        (col("start_tok") / stride).cast("long").as("passage_id"),
        col("start_tok").cast("long").as("start_tok"),
        slice(col("toks"), col("start_tok") + 1, lit(size)).as("win"))
      .select(col(id), col("passage_id"), col("start_tok"),
        org.apache.spark.sql.functions.size(col("win")).cast("long").as("n_tokens"),
        array_join(col("win"), " ").as("passage"))
  }

  /** Long-document retrieval via passage MaxP: chunk each doc into
    * overlapping token windows ([[passageWindows]]), BM25-score every
    * passage as its own unit (passage-local dl/avgdl — BM25's length
    * normalization is the point of passaging: a long doc can no longer
    * bury one relevant paragraph under its total length), then score a
    * doc by its BEST passage (Dai & Callan's BERT-MaxP convention, which
    * applies to any passage scorer). Same 2-scan shape as `bm25TopK`
    * over the passage set plus one doc-keyed partial-agg max — passages
    * of a doc are born co-partitioned, so the max folds map-side.
    * Output: (id, score, rank), rank ≤ k. */
  def bm25MaxP(docs: DataFrame, id: String, text: String, terms: Seq[String], k: Int,
      size: Int, stride: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val pass = passageWindows(docs, id, text, size, stride)
    val pscores = bm25ScoresBy(pass, Seq(id, "passage_id"), "passage", terms, k1, b)
    val perDoc = pscores.groupBy(col(id)).agg(max(col("score")).as("score"))
    topKRanked(perDoc, id, k)
  }

  /** Greedy CONTEXT PACKING — the serving-side step after retrieval:
    * per query, admit candidates in (score DESC, id ASC) order while the
    * running token total fits the budget, stopping at the first
    * overflow (running sums are monotone, so `cum <= budget` IS the
    * stop-at-first-overflow prefix — no sequential scan needed). One
    * window over query-partitioned candidates: candidates are top-k
    * lists, so partitions are k-sized regardless of corpus size.
    * Output: (qid, did, score, n_tokens, cum_tokens, position). */
  def contextPack(cands: DataFrame, qid: String, did: String,
      score: String, nTokens: String, budget: Long): DataFrame = {
    require(budget >= 1, s"contextPack: budget must be >= 1, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qid)).orderBy(col(score).desc, col(did).asc)
    cands
      .withColumn("cum_tokens", sum(col(nTokens)).over(w))
      .withColumn("position", row_number().over(w))
      .where(col("cum_tokens") <= budget)
      .select(col(qid), col(did), col(score), col(nTokens),
        col("cum_tokens"), col("position"))
  }
}
