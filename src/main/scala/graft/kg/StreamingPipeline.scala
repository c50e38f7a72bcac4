package graft.kg

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.kg.Schema._

/** Streaming ingest path: the KG extract→clean→triples stages are narrow
  * per-row transforms, so they apply unchanged to a streaming
  * Dataset[Page] (Structured Streaming micro-batches). The STATEFUL half
  * — linking + canonicalization — runs on a periodic cadence inside the
  * same stream via [[runIncremental]]: accumulated triples re-link, and
  * connected components fold the delta into the previous labeling
  * (ConnectedComponents.incremental) instead of re-walking history —
  * the lambda shape for a continuous 100-TB/day KG build.
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

  // ------------------------------------------------- incremental KG build
  /** The STATEFUL half of the KG build on a stream — linking +
    * canonicalization, not just extraction. Extraction runs inside each
    * micro-batch (stateless, batch code verbatim) and lands in an
    * accumulated triples table via IDEMPOTENT batchId-keyed overwrites;
    * every `recanonEvery` batches the accumulated triples re-link and
    * re-canonicalize with connected components SEEDED by the previous
    * labeling ([[ConnectedComponents.incremental]]) so the CC loop pays
    * for the delta's structure, never the resolved past — and after the
    * stream drains, one UNSEEDED (exact) fold ships tables from a full
    * CC of the complete graph, healing any drift the monotone seeded
    * folds could carry (the streaming compaction idiom). This is the
    * lambda shape a 100-TB/day feed needs: the expensive per-row
    * extraction is never redone (streams once), linking re-derives from
    * slim accumulated triples, canonicalization folds incrementally for
    * freshness and exactly for shipment. `foreachBatch` is the
    * sanctioned sink for batch-side effects; the stream checkpoint +
    * idempotent per-batch dirs + on-disk coverage markers make the
    * whole lane restartable and self-healing. The reference analog is
    * the per-upload FULL reprocess at /root/reference/app.py:53-122 —
    * which re-extracts everything; here only the canonicalization
    * folds, over already-extracted triples.
    *
    * Per-batch lineage (north_rule): (batch_id, partition_id, rows)
    * under `stream_lineage` — the streaming lane's per-partition
    * ledger, conservation-checkable against the triples table. */
  def runIncremental(spark: SparkSession, pages: Dataset[Page], workDir: String,
      recanonEvery: Int = 2, extractParallelism: Int = 0): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val triplesPath = s"$workDir/triples_stream"
    val lineagePath = s"$workDir/stream_lineage"
    // a micro-batch is as parallel as its FILE COUNT (one scan split per
    // small file), so a 1-file trigger runs the regex-heavy extraction
    // nearly single-core. extractParallelism > 0 repartitions the pages
    // WITHIN each micro-batch before extraction — cheap when the page
    // projection is slim (html already dropped/null); for a fat-row
    // corpus prefer more files per trigger over this shuffle.
    val src = if (extractParallelism > 0) pages.repartition(extractParallelism) else pages
    val q = streamTriples(spark, src).toDF()
      .writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // two actions read the batch (append + lineage): persist so the
        // regex-heavy extraction runs once per row, not twice.
        // IDEMPOTENT per-batch writes: foreachBatch is at-least-once (a
        // crash between the sink write and the streaming commit log
        // replays the batch on restart), so each batch OVERWRITES its
        // own batchId-keyed subdirectory instead of appending — a
        // replayed batch lands on itself, never doubles. Readers see
        // batch=<id> as a discovered partition column and project it
        // away. (The Iceberg deployment writes the same shape as an
        // idempotent overwrite-partition commit.)
        batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        batch.write.mode(SaveMode.Overwrite).parquet(s"$triplesPath/batch=$batchId")
        batch.groupBy(spark_partition_id().as("partition_id"))
          .agg(count(lit(1)).as("rows"))
          .write.mode(SaveMode.Overwrite).parquet(s"$lineagePath/batch_id=$batchId")
        batch.unpersist(false)
        if (recanonEvery > 0 && (batchId + 1) % recanonEvery == 0)
          recanonicalize(spark, workDir)
        ()
      }
      .start()
    q.awaitTermination()
    // fold in whatever the cadence has not covered yet. Staleness is
    // derived from DISK, not an in-memory flag (which a crash between
    // stream commit and fold would lose, leaving nodes_stream
    // permanently behind triples_stream): each labels version records
    // the triples row count it covered, and a final fold runs whenever
    // the landed count has moved past it. The final fold is UNSEEDED
    // (exact mode): seeded folds are monotone — a merge a prefix of the
    // stream justified is never undone even if the full corpus would
    // not re-derive it — so the shipped tables come from a full CC over
    // the complete accumulated graph (bit-equal to the batch pipeline),
    // while the mid-stream cadence keeps the cheap seeded freshness
    // path. This is the streaming-systems compaction idiom: incremental
    // folds for latency, periodic exact folds to heal drift.
    val landed = landedTriples(spark, workDir)
    val (covered, exact) = coverage(workDir)
    if (landed > 0 && !(exact && covered == landed))
      recanonicalize(spark, workDir, seeded = false)
  }

  private def landedTriples(spark: SparkSession, workDir: String): Long = {
    val p = new java.io.File(s"$workDir/triples_stream")
    if (!p.isDirectory) 0L
    else spark.read.parquet(p.toString).count()
  }

  /** (covered triples rows, was-exact) of the LATEST labels version —
    * a fold is exact when it ran a full CC (no seed), which the shipped
    * tables must always come from. */
  private def coverage(workDir: String): (Long, Boolean) =
    latestVersion(workDir)
      .map(v => new java.io.File(s"$workDir/cc_labels/v$v/_covered_rows.txt"))
      .filter(_.isFile)
      .map { f =>
        val parts = new String(java.nio.file.Files.readAllBytes(f.toPath)).trim.split(" ")
        (parts(0).toLong, parts.length > 1 && parts(1) == "exact")
      }
      .getOrElse((0L, false))

  private def latestVersion(workDir: String): Option[Int] =
    Option(new java.io.File(s"$workDir/cc_labels").listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("v") &&
        new java.io.File(f, "_SUCCESS").exists())
      .map(_.getName.drop(1).toInt)
      .sorted.lastOption

  /** One re-canonicalization pass over the accumulated streamed triples:
    * link → canonicalize (CC seeded by the previous labeling when one
    * exists) → overwrite `nodes_stream`/`edges_stream`, append a new
    * labels version. Labels are VERSIONED directories (`cc_labels/v<n>`)
    * because overwriting the parquet a lazy plan is still reading is the
    * classic self-overwrite corruption; versioning also gives the resume
    * story — a crashed pass leaves the previous version intact. */
  def recanonicalize(spark: SparkSession, workDir: String,
      seeded: Boolean = true): Unit = {
    import spark.implicits._
    val raw = spark.read.parquet(s"$workDir/triples_stream")
    // count the covered rows for the on-disk staleness ledger — and as
    // the linking-stage checkpoint key below
    val nCovered = raw.count()

    // ---- linking stage, CHECKPOINTED per coverage (the batch
    // pipeline's parquet-stage idiom applied to the fold): linking and
    // the CC edge graph are pure functions of the accumulated triples
    // multiset, and within a run the landed set only grows — so the
    // covered row count identifies it exactly. The payoff is the
    // drain-time EXACT fold: it re-canonicalizes the SAME coverage the
    // last cadence fold just linked, and reads these tables back
    // instead of re-running alias discovery + ambiguity resolution +
    // MinHash name-blocking end to end (the dominant fold cost). Also
    // the crash-restart story: a fold interrupted after this stage
    // resumes from parquet.
    val linkedPath = s"$workDir/link_stage/linked_$nCovered"
    val aliasPath = s"$workDir/link_stage/alias_$nCovered"
    val graphPath = s"$workDir/link_stage/graph_$nCovered"
    def stDone(p: String) = new java.io.File(p, "_SUCCESS").isFile
    if (!(stDone(linkedPath) && stDone(aliasPath) && stDone(graphPath))) {
      val triples = raw.drop("batch").as[Triple]
      val resolved = EntityLinking.resolve(spark, triples)
      // materialize linking ONCE for the three stage writes (the two
      // below run as concurrent jobs; block-level cache dedup scans the
      // linking DAG once)
      val linkedP = resolved.linked.toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val aliasP = resolved.aliasEdges
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Pipeline.inParallel(Seq(
        () => linkedP.write.mode(SaveMode.Overwrite).parquet(linkedPath),
        () => aliasP.write.mode(SaveMode.Overwrite).parquet(aliasPath)))
      // the CC input graph (alias ∪ name-similarity edges) is
      // vocabulary-sized; checkpointing it means no CC action ever
      // replays the name-blocking pipeline
      Pipeline.ccEdges(linkedP, aliasP)
        .write.mode(SaveMode.Overwrite).parquet(graphPath)
      linkedP.unpersist(false)
      aliasP.unpersist(false)
      resolved.unpersistCached()
    }
    val linkedCk = spark.read.parquet(linkedPath)
    val prev =
      if (!seeded) None
      else latestVersion(workDir).map(v => spark.read.parquet(s"$workDir/cc_labels/v$v"))
    val canonical = Pipeline.canonicalize(
      spark, linkedCk.as[Schema.LinkedMention],
      spark.read.parquet(aliasPath), prev,
      preGraph = Some(spark.read.parquet(graphPath)))
    val next = latestVersion(workDir).getOrElse(0) + 1
    // labels first (nodes/edges derive from the same plan; any failure
    // here leaves the previous version live), then the two outputs
    canonical.labels.write.mode(SaveMode.Overwrite)
      .parquet(s"$workDir/cc_labels/v$next")
    // coverage marker: how many triples rows this version folded and
    // whether the fold was EXACT (a full CC — prev empty — vs a seeded
    // incremental). runIncremental's staleness check compares it
    // against the landed count on disk, so a crash before the final
    // fold self-heals on restart, and a merely-seeded latest version
    // still triggers the exact compaction fold the shipped tables
    // require. (A production table format records this as snapshot
    // metadata.)
    val mode = if (prev.isEmpty) "exact" else "seeded"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$workDir/cc_labels/v$next/_covered_rows.txt"),
      s"$nCovered $mode".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // both outputs read the same persisted label table — overlap the two
    // writes as concurrent jobs exactly like the batch pipeline does
    Pipeline.inParallel(Seq(
      () => canonical.nodes.write.mode(SaveMode.Overwrite).parquet(s"$workDir/nodes_stream"),
      () => canonical.edges.write.mode(SaveMode.Overwrite).parquet(s"$workDir/edges_stream")))
    canonical.unpersistCached()
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
