package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Structured Streaming: the streaming triple path must produce exactly
  * the batch pipeline's triples; windowed aggregation with watermark
  * completes on a bounded source. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming triples == batch triples on the same pages") {
    val dir = Files.createTempDirectory("pages").toString
    PagesGen.pages(spark, 80L).write.mode("overwrite").parquet(dir)

    val stream = StreamingPipeline.streamTriples(
      spark, StreamingPipeline.readPages(spark, dir))
    val q = stream.writeStream
      .format("memory").queryName("stream_triples").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("stream_triples")
      .select("url", "pred", "obj").as[(String, String, String)].collect().toSet
    val batch = Pipeline.extractTriples(spark,
      Pipeline.extractClean(spark, PagesGen.pages(spark, 80L), 4))
      .map(t => (t.url, t.pred, t.obj)).collect().toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("watermarked windowed aggregation produces entity counts") {
    val dir = Files.createTempDirectory("pages2").toString
    PagesGen.pages(spark, 50L).write.mode("overwrite").parquet(dir)
    val agg = StreamingPipeline.entityMentionsWindowed(
      spark, StreamingPipeline.readPages(spark, dir))
    val q = agg.writeStream
      .format("memory").queryName("stream_agg").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("stream_agg").collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[String]("entity") == "cnn"), "hot entity must appear")
  }
}
