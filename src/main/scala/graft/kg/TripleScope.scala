package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Post-extraction KG curation stages: support-based triple confidence
  * and temporal scoping of edges across crawl snapshots.
  *
  * The reference emits every extracted triple uncritically
  * (/root/reference/src/document_analyzer.py builds its entity/keyword
  * lists per document with no corpus-level filtering); at 10^12 pages
  * OpenIE-style extraction is noisy, and the standard cures are
  * (a) support counting — keep assertions corroborated by multiple
  * independent pages — and (b) temporal scoping — a fact's validity
  * interval is the span of crawl snapshots that assert it (the
  * Wikidata-qualifier analog for Common-Crawl-style corpora, where the
  * same url is re-fetched every snapshot).
  *
  * Both are single partial-agg shuffles over the triples table keyed by
  * the (pred, obj, kind) assertion — at 100 TB the triples table is the
  * big side and this is the minimal one-pass shape; the corpus-global
  * scalar (url count / latest snapshot) rides a broadcast cross join,
  * never a driver action.
  */
object TripleScope {

  /** Support-based triple confidence: per distinct assertion
    * (pred, obj, kind), the number of distinct urls corroborating it
    * and its confidence as floor(n_urls * 1e6 / corpus_urls) — the
    * integer micro-unit idiom (exact in both engines; doubles stay
    * < 2^53). Assertions below `minSupport` urls are dropped (the
    * classic "2 independent sources" rule for web-extracted facts).
    *
    * Plan: ONE groupBy shuffle with partial aggregation; the corpus
    * url count is its own tiny aggregate broadcast back (no driver
    * collect, no second pass over groups).
    * Output: (pred, obj, kind, n_urls, total_weight, conf_ppm). */
  def tripleSupport(triples: DataFrame, minSupport: Int = 2): DataFrame = {
    require(minSupport >= 1, s"tripleSupport: minSupport must be >= 1, got $minSupport")
    val corpus = triples.agg(countDistinct(col("url")).as("corpus_urls"))
    triples
      .groupBy(col("pred"), col("obj"), col("kind"))
      .agg(
        countDistinct(col("url")).as("n_urls"),
        sum(col("weight").cast("long")).as("total_weight"))
      .where(col("n_urls") >= minSupport)
      .crossJoin(broadcast(corpus))
      .select(col("pred"), col("obj"), col("kind"), col("n_urls"), col("total_weight"),
        floor(col("n_urls") * lit(1000000L) / col("corpus_urls")).cast("long").as("conf_ppm"))
  }

  /** Temporal scoping: per assertion (pred, obj, kind), the validity
    * interval over crawl snapshots — first_seen / last_seen snapshot
    * dates, how many distinct snapshots assert it, how many distinct
    * urls, and whether it is still current (asserted in the corpus's
    * latest snapshot). `snapDate` maps a triple row to its snapshot
    * date as an ISO 'yyyy-MM-dd' string (ISO strings order
    * lexicographically = chronologically, and hash identically across
    * engines — no timestamp-encoding drift in the compare).
    *
    * Same one-shuffle shape as [[tripleSupport]]; the corpus-latest
    * snapshot is a broadcast scalar. Output: (pred, obj, kind,
    * first_seen, last_seen, n_snapshots, n_urls, is_current). */
  def edgeIntervals(triples: DataFrame, snapDate: Column): DataFrame = {
    val t = triples.withColumn("snap_date", snapDate)
    val latest = t.agg(max(col("snap_date")).as("corpus_latest"))
    t.groupBy(col("pred"), col("obj"), col("kind"))
      .agg(
        min(col("snap_date")).as("first_seen"),
        max(col("snap_date")).as("last_seen"),
        countDistinct(col("snap_date")).as("n_snapshots"),
        countDistinct(col("url")).as("n_urls"))
      .crossJoin(broadcast(latest))
      .select(col("pred"), col("obj"), col("kind"),
        col("first_seen"), col("last_seen"), col("n_snapshots"), col("n_urls"),
        (col("last_seen") === col("corpus_latest")).as("is_current"))
  }
}
