package graft.kg

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.kg.Schema._

/** Streaming ingest path: the KG extract→clean→triples stages are narrow
  * per-row transforms, so they apply unchanged to a streaming
  * Dataset[Page] (Structured Streaming micro-batches). Canonicalization
  * stays batch (iterative CC has no incremental form — SURVEY §2.10);
  * the streaming path lands triples continuously and the batch
  * canonicalizer folds them in on its cadence — the standard
  * lambda-ish split for KG builds.
  */
object StreamingPipeline {

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** Streaming source → typed pages. */
  def readPages(spark: SparkSession, dir: String): Dataset[Page] = {
    import spark.implicits._
    spark.readStream.schema(pageSchema).parquet(dir).as[Page]
  }

  /** Same per-row extraction as the batch pipeline — reused verbatim so
    * streaming and batch results are identical by construction. */
  def streamTriples(spark: SparkSession, pages: Dataset[Page]): Dataset[Triple] = {
    import spark.implicits._
    pages.flatMap(p => Pipeline.triplesForDoc(p.url, Pipeline.rawText(p)))
  }

  /** Watermarked sliding-window mention counts per entity — the
    * streaming-native aggregation shape (event time = warc_ts). */
  def entityMentionsWindowed(spark: SparkSession, pages: Dataset[Page]): DataFrame = {
    import spark.implicits._
    val triples = pages
      .flatMap(p => Pipeline.triplesForDoc(p.url, Option(p.text).getOrElse(""))
        .filter(_.pred == "mentionsEntity")
        .map(t => (p.warc_ts, Py.lower(t.obj), t.weight)))
      .toDF("warc_ts", "entity", "weight")
    triples
      .withWatermark("warc_ts", "10 minutes")
      .groupBy(window(col("warc_ts"), "5 minutes"), col("entity"))
      .agg(sum(col("weight")).as("mentions"))
      .select(col("window.start").as("w_start"), col("entity"), col("mentions"))
  }

  /** Streaming exact dedup on content hash with BOUNDED state:
    * `dropDuplicatesWithinWatermark` evicts per-key state once the
    * watermark passes, so the dedup map never grows with the corpus —
    * the only shape that survives an unbounded 100-TB/day feed (a plain
    * `dropDuplicates` on a stream accumulates state forever).
    * Output: first-seen pages, duplicate texts within the horizon
    * dropped. */
  def streamDedup(spark: SparkSession, pages: Dataset[Page],
      watermark: String = "1 hour"): DataFrame = {
    import spark.implicits._
    // hash the EXTRACTED text (html fallback included) — keying on the
    // raw text column alone would collapse every html-only page
    // (text = null) onto md5('') and silently drop them as duplicates
    pages.map(p => (p.url, p.warc_ts, p.lang, Pipeline.rawText(p)))
      .toDF("url", "warc_ts", "lang", "raw_text")
      .withColumn("text_md5", md5(col("raw_text")))
      .withWatermark("warc_ts", watermark)
      .dropDuplicatesWithinWatermark("text_md5")
  }

  /** Per-entity running state over the stream. */
  final case class EntityState(total: Long, firstSeenMs: Long)
  /** One update row per entity per micro-batch; `crossed_hot` fires
    * exactly once, on the batch where the cumulative mention weight
    * first reaches `hotThreshold` (a streaming skew/hot-key detector —
    * the feed that would size salting upstream). */
  final case class EntityUpdate(
      entity: String, total: Long, first_seen_ms: Long, crossed_hot: Boolean)

  /** Custom cross-batch state via `flatMapGroupsWithState`: cumulative
    * mention weight per entity, carried in `GroupState` across
    * micro-batches (the arbitrary-state API — aggregations can't express
    * "emit once on threshold crossing"). State is per-entity
    * (vocabulary-sized), not per-document — bounded by construction. */
  def entityRunningTotals(spark: SparkSession, pages: Dataset[Page],
      hotThreshold: Long = 50L): Dataset[EntityUpdate] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val mentions = pages.flatMap { p =>
      // rawText, not p.text: html-only pages must count like in batch
      Pipeline.triplesForDoc(p.url, Pipeline.rawText(p))
        .filter(_.pred == "mentionsEntity")
        .map(t => (Py.lower(t.obj), t.weight.toLong, p.warc_ts.getTime))
    }
    mentions
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (entity: String, rows: Iterator[(String, Long, Long)],
            state: GroupState[EntityState]) => {
          val batch = rows.toVector
          if (batch.isEmpty) Iterator.empty
          else {
            val add = batch.map(_._2).sum
            val firstTs = batch.map(_._3).min
            val prev = state.getOption.getOrElse(EntityState(0L, firstTs))
            val next = EntityState(prev.total + add, math.min(prev.firstSeenMs, firstTs))
            state.update(next)
            val crossed = prev.total < hotThreshold && next.total >= hotThreshold
            Iterator.single(EntityUpdate(entity, next.total, next.firstSeenMs, crossed))
          }
        })
  }
}
