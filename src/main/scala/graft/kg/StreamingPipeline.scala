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
    pages.flatMap { p =>
      val raw =
        if (p.text != null) p.text
        else if (p.html != null) {
          try {
            val s = new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
            Py.strip(Py.collapseWs(s.replaceAll("<[^>]+>", " ")))
          } catch { case _: Throwable => "" }
        } else ""
      Pipeline.triplesForDoc(p.url, raw)
    }
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
}
