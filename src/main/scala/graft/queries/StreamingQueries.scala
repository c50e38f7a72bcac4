package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Curation

/** Structured Streaming under the DRIVER contract (not just ScalaTest):
  * each query runs a real bounded micro-batch stream — file source split
  * into one micro-batch per file (`maxFilesPerTrigger=1`, so state
  * genuinely crosses batch boundaries), `Trigger.AvailableNow` to drain
  * it, memory sink — and returns the sink table, which the driver then
  * hash-compares against a DuckDB batch oracle. Stream ≡ batch is the
  * exact equivalence a lambda-style 100-TB pipeline needs: the streaming
  * lane must land the same rows the batch lane would.
  */
object StreamingQueries {

  private val sinkSeq = new AtomicInteger(0)

  /** Scale-adaptive partition count for STATEFUL streams, derived from
    * the stream's source size (never from the local core count): one
    * state/shuffle partition per `SPARK_GRAFT_ST_PART_BYTES` of source
    * parquet (default 32 MB ≈ ~100 MB in-memory rows), floored at 4 for
    * a parallelism minimum and CAPPED by the session's
    * spark.sql.shuffle.partitions — so a cluster-sized session setting
    * is respected and only over-partitioning is trimmed. Stateful
    * shuffle partitioning is frozen into a stream's checkpoint, so
    * production streaming jobs size it to expected state volume
    * explicitly rather than inheriting a batch default; AQE cannot
    * coalesce streaming exchanges (it is disabled for streams), which
    * is why this is derived manually. Measured motivation: 32 state
    * partitions over a 2 MB bounded replay spent ~50 s of summed
    * state-store commit wall vs 2.5 s at 8 — pure per-store overhead,
    * no data. */
  private def statePartitions(s: SparkSession, dir: String, name: String): Int = {
    val f = new java.io.File(s"$dir/$name.parquet")
    val bytes =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.filter(_.isFile).map(_.length()).sum).getOrElse(0L)
    val perPart = sys.env.getOrElse("SPARK_GRAFT_ST_PART_BYTES", (32L << 20).toString).toLong
    val derived = math.max(4L, (bytes + perPart - 1) / perPart)
    math.min(s.sessionState.conf.numShufflePartitions.toLong, derived).toInt
  }

  /** Run `f` (which must START and DRAIN the stream inside it) with the
    * session shuffle-partition setting temporarily pinned to `n` — the
    * value a streaming query captures at start — restoring the session
    * default after, so co-resident batch queries are untouched. */
  private def withShufflePartitions[A](s: SparkSession, n: Int)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try f finally s.conf.set(key, prev)
  }

  /** Drain a bounded stream into a memory sink; return the sink table.
    * The memory sink materializes on the driver — right for the
    * driver-contract compare at test scale; a production stream lands
    * in a parquet/Iceberg file sink instead (same transforms, different
    * `format`). */
  private def runToSink(s: SparkSession, df: DataFrame, outputMode: String): DataFrame = {
    val name = s"graft_st_sink_${sinkSeq.incrementAndGet()}"
    val q = df.writeStream
      .format("memory").queryName(name)
      // explicit tmpfs-backed checkpoint: without one Spark puts the
      // offset/commit logs AND every state-store delta/snapshot file
      // under java.io.tmpdir — this sandbox's single contended virtual
      // disk, whose fsync-heavy many-small-file pattern is a box
      // artifact, not the plan's (a cluster checkpoints to its DFS).
      // FRESH per run: a cached dir would resume the previous stream and
      // skip the batches (TmpDirs.fresh doc).
      .option("checkpointLocation", TmpDirs.fresh("st_ckpt"))
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
  }

  /** Streaming read of a parquet table, one micro-batch per file. The
    * file-stream source only accepts a DIRECTORY, and the testdata
    * tables are SINGLE parquet files — which would also mean a single
    * micro-batch, making "state crosses batch boundaries" vacuous. The
    * table is therefore re-written once per JVM into a temp dir as 4
    * parquet files, so `maxFilesPerTrigger=1` genuinely drives 4
    * micro-batches through the stream (stateful queries accumulate
    * across them; stateless ones are order-independent). */
  private def streamTbl(s: SparkSession, dir: String, name: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(s"$dir/$name.parquet")
    val streamDir =
      if (Files.isDirectory(src)) src.toString
      else {
        val tmp = TmpDirs.cached(s"st:$dir/$name", s"st_$name")
        // idempotent per JVM: the _SUCCESS marker says the 4-file
        // rewrite already ran for this key
        if (!Files.exists(Paths.get(tmp, "_SUCCESS")))
          s.read.parquet(src.toString).repartition(4)
            .write.mode("overwrite").parquet(tmp)
        tmp
      }
    s.readStream
      .schema(s.read.parquet(src.toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir)
  }

  /** Events as a TIME-ORDERED bounded stream: 4 ts-range files whose
    * modification times follow the range order (the file source replays
    * oldest-mtime first), plus a 5th far-future SENTINEL heartbeat row
    * (user_id = −1). This is the layout that makes a `0 seconds`
    * watermark sound: every later micro-batch's event times are ≥ the
    * watermark set by the previous one (range partitioning co-locates
    * equal keys), so nothing is ever late-dropped, and the sentinel
    * advances the final watermark past every real session so append
    * mode flushes them all — the standard punctuation/heartbeat trick
    * for draining event-time state in a bounded replay. */
  private def eventsByTsStream(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = s"$dir/events.parquet"
    val tmp = TmpDirs.cached(s"stts:$src", "st_ts_events")
    if (!Files.exists(Paths.get(tmp, "_SUCCESS"))) {
      val ev = s.read.parquet(src)
      val staging = tmp + "_stage"
      ev.repartitionByRange(4, col("ts")).sortWithinPartitions(col("ts"))
        .write.mode("overwrite").parquet(staging)
      // TWO heartbeat files: the watermark advances at the end of the
      // batch that READS a file, but state is flushed by the batch
      // AFTER that — so the +2h sentinel raises the watermark past all
      // real sessions and the +4h one triggers the batch that actually
      // emits them (AvailableNow stops when the files run out; a single
      // sentinel would leave the final sessions stuck in the store)
      val sentStage = tmp + "_sentinel"
      ev.agg(max(col("ts")).as("m"))
        .select(explode(array(expr("m + INTERVAL 2 HOURS"),
          expr("m + INTERVAL 4 HOURS"))).as("ts"))
        .select(lit(-1L).as("event_id"), col("ts"), lit(-1L).as("user_id"),
          lit("sentinel").as("event_type"), lit(0.0).as("value"), lit("").as("props"))
        .repartitionByRange(2, col("ts")).sortWithinPartitions(col("ts"))
        .write.mode("overwrite").parquet(sentStage)
      Files.createDirectories(Paths.get(tmp))
      val parts = new java.io.File(staging).listFiles
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .sortBy(_.getName) ++
        new java.io.File(sentStage).listFiles
          .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        val dst = Paths.get(tmp, f"f$i%02d.parquet")
        Files.copy(f.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
        // explicit second-spaced mtimes pin the replay order to the
        // ts-range order regardless of copy timing
        dst.toFile.setLastModified(1000000000000L + i * 1000L)
        ()
      }
      Files.write(Paths.get(tmp, "_SUCCESS"), Array.emptyByteArray)
      // the staging dirs live OUTSIDE TmpDirs' shutdown hook (which
      // covers only `tmp`) and sit on RAM-backed /dev/shm — delete them
      // now that their parts are copied, or repeat JVMs leak tmpfs
      Seq(staging, sentStage).foreach(d =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
      ()
    }
    s.readStream
      .schema(s.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(tmp)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // stateless curation on a stream: hashSample is a pure column
    // program, so it applies to a streaming DataFrame unchanged — the
    // same operator object serves both lanes (append mode, no state)
    "st_hash_sample" -> ((s, dir) =>
      runToSink(s,
        Curation.hashSample(streamTbl(s, dir, "documents"), "doc_id", "lang",
          Seq("en" -> 10000, "de" -> 2500), 500),
        "append")),

    // the NORTH-STAR lane under streaming: the full triple-extraction
    // stage (metadata/sections/figures/terms/equations/keywords/summary
    // extractor families) runs on a live micro-batch stream of pages and
    // must emit EXACTLY the batch pipeline's triples — the oracle is the
    // same kg_triples SQL re-derivation. Extraction is per-row, so the
    // streaming lane reuses the batch code verbatim (streamTriples →
    // Pipeline.triplesForDoc)
    "st_kg_triples" -> ((s, dir) => {
      import s.implicits._
      // a micro-batch is ONE small file = one scan split, so the
      // regex-heavy extraction would run single-core per batch;
      // repartition the slim projected pages across the session
      // parallelism first (the same spread runIncremental applies via
      // extractParallelism)
      val pages = graft.queries.KgQueries.pageProjection(streamTbl(s, dir, "documents"))
        .repartition(s.sparkContext.defaultParallelism)
        .as[graft.kg.Schema.Page]
      runToSink(s,
        graft.kg.StreamingPipeline.streamTriples(s, pages).toDF()
          .select(col("url"), col("pred"), col("obj"), col("kind"), col("weight")),
        "append")
    }),

    // the STATEFUL half of the north-star lane under streaming: the
    // full incremental KG build — micro-batched extraction appending to
    // an accumulated triples table, linking + CC canonicalization
    // re-folding on a 2-batch cadence with the previous labeling as the
    // CC seed (ConnectedComponents.incremental) — must land EXACTLY the
    // batch pipeline's nodes table; the oracle is the same kg_nodes SQL
    // re-derivation. A fresh work dir per call: resuming a previous
    // run's checkpoint would skip the stream and misprice the evidence
    "st_kg_nodes" -> ((s, dir) => {
      import s.implicits._
      val pages = graft.queries.KgQueries.pageProjection(streamTbl(s, dir, "documents"))
        .as[graft.kg.Schema.Page]
      val work = TmpDirs.fresh("st_kg_inc")
      graft.kg.StreamingPipeline.runIncremental(s, pages, work, recanonEvery = 2,
        extractParallelism = s.sparkContext.defaultParallelism)
      s.read.parquet(s"$work/nodes_stream")
        .select(col("canonical_name"), col("kind"),
          concat_ws("|", col("aliases")).as("aliases"),
          col("n_mentions"), col("n_urls"))
    }),

    // stateful streaming aggregation: hourly per-type event rollup whose
    // running state accumulates ACROSS micro-batches (files arrive in
    // arbitrary hour order, so nearly every batch touches old windows);
    // complete mode emits the final converged table — which must equal
    // the batch q9 aggregation row for row. NOTE complete-mode state
    // grows with key cardinality (every (hour, type) ever seen stays in
    // the store) — fine for this bounded driver-contract compare; the
    // production shape is `st_events_hourly_update` below (update mode
    // to a file sink), plus a watermark on ts when arrival order allows
    // eviction
    "st_events_hourly" -> ((s, dir) =>
      withShufflePartitions(s, statePartitions(s, dir, "events")) {
        runToSink(s,
          streamTbl(s, dir, "events")
            .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
            .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value")),
          "complete")
      }),

    // the PRODUCTION shape of the same rollup: update mode to a FILE
    // sink via foreachBatch — each micro-batch appends only the keys it
    // changed (tagged with its batchId), and the reader resolves
    // last-writer-wins per key. Unlike complete mode, emitted volume is
    // per-batch delta, not the whole state table; the store itself still
    // holds every live key, and in an unbounded deployment a watermark
    // on ts would evict old windows — deliberately OMITTED here because
    // the 4-file rewrite delivers hours in arbitrary order, so any
    // finite watermark could silently drop legitimately-late rows and
    // break stream ≡ batch. foreachBatch is at-least-once: a replayed
    // batch re-appends identical (key, batchId) rows, which
    // last-writer-wins absorbs — the sink is idempotent at the reader.
    "st_events_hourly_update" -> ((s, dir) => {
      val work = TmpDirs.fresh("st_upd")
      withShufflePartitions(s, statePartitions(s, dir, "events")) {
      val q = streamTbl(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .writeStream
        // tmpfs checkpoint (see runToSink) — separate from `work`, which
        // is read back whole as parquet
        .option("checkpointLocation", TmpDirs.fresh("st_upd_ckpt"))
        .outputMode("update")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.withColumn("batch", lit(batchId))
            .write.mode("append").parquet(work)
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("hour"), col("event_type")).orderBy(col("batch").desc)
      s.read.parquet(work)
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("hour"), col("event_type"), col("n"), col("sum_value"))
    }),

    // streaming MATERIALIZED-VIEW maintenance — the lambda shape of
    // tb_mv_refresh: each micro-batch of facts folds into the
    // accumulated summary via Cdc.refreshSummary (delta aggregates
    // map-side, ONE key-sized full-outer join — never a rescan of old
    // facts), and the converged view must equal a single-pass GROUP BY
    // over ALL the facts. The fold itself is plain batch code inside
    // foreachBatch; each fold lands in a batchId-NAMED versioned dir
    // (read latest < b, write b, _SUCCESS-gated) — so an at-least-once
    // REPLAY of batch b overwrites version b with the identical fold of
    // the identical input instead of double-counting it, and a restart
    // resumes from the last durable version. State here is the
    // key-sized summary ON DISK, not in the streaming store — which is
    // why MIN/MAX survive (complete/update-mode aggs could maintain
    // COUNT/SUM, but a streaming MIN over retractions cannot exist;
    // append-only facts + disk folds sidestep that boundary).
    "st_mv_refresh" -> ((s, dir) => {
      val work = TmpDirs.fresh("st_mv")
      val keys = Seq("event_type", "hour"); val ms = Seq("m1", "m2")
      def versions(): Seq[Long] = {
        val d = new java.io.File(work)
        if (!d.isDirectory) Nil
        else d.listFiles.toSeq
          .filter(f => f.getName.startsWith("summary_v") &&
            new java.io.File(f, "_SUCCESS").isFile)
          .map(_.getName.stripPrefix("summary_v").toLong)
      }
      val q = streamTbl(s, dir, "events")
        .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"),
          (col("event_id") % 97).as("m1"), expr("nullif(user_id % 5, 0)").as("m2"))
        .writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val prev = versions().filter(_ < batchId)
          val folded =
            if (prev.isEmpty) graft.ops.Cdc.aggregateSummary(batch, keys, ms)
            else graft.ops.Cdc.refreshSummary(
              s.read.parquet(s"$work/summary_v${prev.max}"), batch, keys, ms)
          folded.write.mode("overwrite").parquet(s"$work/summary_v$batchId")
          ()
        }
        .option("checkpointLocation", s"$work/ckpt") // tmpfs (see runToSink)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$work/summary_v${versions().max}")
    }),

    // streaming EXACT DEDUP — the training-pipeline staple, stateful
    // across micro-batches: `dropDuplicates` keeps the first arrival of
    // each content fingerprint in the state store and suppresses every
    // later duplicate, so the emitted key set is exactly the batch
    // DISTINCT (which arrival "wins" is order-dependent; the key set is
    // not — hence only the fingerprint is emitted). State grows with
    // distinct keys; the unbounded-deployment shape is
    // `dropDuplicatesWithinWatermark` on an event-time column, which
    // evicts fingerprints older than the watermark — not used here
    // because testdata duplicates carry no bounded-lateness guarantee.
    // null text fingerprints as "" (the Dedup kernel convention).
    "st_exact_dedup" -> ((s, dir) =>
      withShufflePartitions(s, statePartitions(s, dir, "documents")) {
        runToSink(s,
          streamTbl(s, dir, "documents")
            .select(md5(coalesce(col("text"), lit(""))).as("text_md5"))
            .dropDuplicates("text_md5"),
          "append")
      }),

    // streaming NEAR-DUP DEDUP — MinHash-LSH under continuous ingestion,
    // the shape Dedup.deltaCandidatePairs was built for: each
    // micro-batch (a landing shard, expanded with its planted exact/near
    // dups exactly like the batch dd_* corpus — the expansion is
    // row-local, so shards accumulate to the batch corpus) is
    // fingerprinted ONCE, its bands + shingles appended to the on-disk
    // index as batchId-keyed versions (idempotent under replay), and
    // checked against the ACCUMULATED index — per-shard work scales
    // with the delta, never re-pairing the corpus. A pair is emitted
    // exactly once, by the batch where its LATER member lands (both
    // sides of the band join are row-local functions of each doc, so
    // membership is arrival-order-free), hence the union of per-batch
    // verified pairs ≡ the one-shot batch rebuild — the oracle is
    // literally dd_minhash_pairs' SQL.
    // PREFIX-CAP CAVEAT (r5 ADVICE): that equivalence holds only while
    // no (band, bucket) group crosses maxBucketSize mid-stream —
    // per-batch caps are evaluated over the ACCUMULATED PREFIX, so a
    // bucket under the cap early but over it in the final corpus would
    // emit pairs the one-shot rebuild drops. The default cap (100k)
    // never binds here (max bucket ≈ planted dup-group size ≪ 100k); a
    // deployment expecting binding caps must either re-evaluate caps
    // over the final index or accept prefix-cap semantics.
    "st_delta_pairs" -> ((s, dir) => {
      val work = TmpDirs.fresh("st_dd")
      def versions(prefix: String): Seq[Long] = {
        val d = new java.io.File(work)
        if (!d.isDirectory) Nil
        else d.listFiles.toSeq
          .filter(f => f.getName.startsWith(prefix + "_v") &&
            new java.io.File(f, "_SUCCESS").isFile)
          .map(_.getName.stripPrefix(prefix + "_v").toLong)
      }
      val q = streamTbl(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // one micro-batch = one scan split: spread the slim
          // (doc_id, text) shard across the session parallelism before
          // the CPU-fat fingerprint kernels, and overlap the two
          // independent index writes as concurrent jobs (they share the
          // persisted shard; block-level dedup scans it once)
          val shard = DataOps.ddExpand(
              batch.repartition(s.sparkContext.defaultParallelism))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          graft.kg.Pipeline.inParallel(Seq(
            () => graft.ops.Dedup.minhashBands(
                graft.ops.Dedup.minhashShingles(shard, "doc_id", "text", 8, 8),
                "doc_id", 4)
              .withColumn("ver", lit(batchId))
              .write.mode("overwrite").parquet(s"$work/bands_v$batchId"),
            () => graft.ops.Dedup.charShingles(shard, "doc_id", "text", 8)
              .withColumnRenamed("shingle", "token")
              .write.mode("overwrite").parquet(s"$work/sh_v$batchId")))
          shard.unpersist(false)
          val allBands = s.read.parquet(
            versions("bands").filter(_ <= batchId).map(v => s"$work/bands_v$v"): _*)
          val allSh = s.read.parquet(
            versions("sh").filter(_ <= batchId).map(v => s"$work/sh_v$v"): _*)
          val pairs = graft.ops.Dedup.deltaCandidatePairs(
            allBands, col("ver") === batchId, "doc_id")
          graft.ops.Dedup.jaccardVerify(pairs, allSh, "doc_id")
            .where(col("jaccard") >= 0.5)
            .write.mode("overwrite").parquet(s"$work/pairs_v$batchId")
          ()
        }
        .option("checkpointLocation", s"$work/ckpt") // tmpfs (see runToSink)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(versions("pairs").map(v => s"$work/pairs_v$v"): _*)
    }),

    // STREAM-STATIC enrichment join — the standard lambda shape for
    // dimension lookups (the Iceberg-table equivalent: each micro-batch
    // re-reads the dim snapshot, so the static side may be UPDATED
    // between batches without restarting the stream): every streamed
    // event inner-joins a batch-computed per-user profile. Stateless —
    // nothing crosses batch boundaries, no watermark needed; the static
    // side is a plain DataFrame the planner is free to broadcast under
    // every micro-batch's plan
    "st_static_enrich" -> ((s, dir) => {
      val profile = s.read.parquet(s"$dir/events.parquet")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("user_total"),
          countDistinct(col("event_type")).as("user_types"))
      runToSink(s,
        streamTbl(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"))
          .join(profile, Seq("user_id")),
        "append")
    }),

    // STREAM-STREAM interval join — both sides are live streams with
    // per-side state: each error waits (in the state store) for clicks
    // from the same user within the preceding 30 minutes, across
    // micro-batch boundaries. INNER join matches emit the moment both
    // sides have arrived — the watermark + the two-sided time-range
    // condition exist to EVICT state (a click older than any future
    // error's window can ever reach gets dropped from the store), not
    // to gate emission, so no heartbeat files are needed and the
    // time-ordered replay again makes the 0-second watermark sound.
    // The event_type predicates live in the JOIN CONDITION (they push
    // into each side's scan — fine here: they drop only rows that could
    // never match, unlike the sessionize sentinel trap).
    "st_stream_join" -> ((s, dir) => {
      def side() = eventsByTsStream(s, dir)
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "0 seconds")
      val joined = side().as("e").join(side().as("c"),
        expr("""e.user_id = c.user_id AND
                e.event_type = 'error' AND c.event_type = 'click' AND
                c.ts BETWEEN e.ts - INTERVAL 30 MINUTES AND e.ts"""))
        .select(col("e.event_id").as("error_id"), col("c.event_id").as("click_id"),
          col("e.user_id").as("user_id"), col("e.ts").as("error_ts"),
          col("c.ts").as("click_ts"))
      withShufflePartitions(s, statePartitions(s, dir, "events")) {
        runToSink(s, joined, "append")
      }
    }),

    // streaming SESSION WINDOWS — the state-merging aggregation (session
    // boundaries move as events arrive; Spark merges overlapping
    // [ts, ts+gap) windows in the store). Event-time append mode with a
    // 0-second watermark is sound ONLY on the time-ordered replay
    // (eventsByTsStream): batches arrive in ts-range order so nothing is
    // late, and the sentinel heartbeat drains the final sessions.
    // Session rule: a gap ≥ 30 min splits (windows are half-open, so an
    // exactly-30-min gap does NOT merge) — the oracle mirrors that exact
    // boundary at µs precision, NOT q10's floor-seconds `> 1800` rule.
    "st_sessionize" -> ((s, dir) =>
      withShufflePartitions(s, statePartitions(s, dir, "events")) {
      runToSink(s,
        eventsByTsStream(s, dir)
          // event-time ops require TIMESTAMP (the table is NTZ; the
          // session is pinned UTC, so the cast preserves the instant)
          .withColumn("ts", col("ts").cast("timestamp"))
          .withWatermark("ts", "0 seconds")
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
          // the sentinel filter MUST ride an aggregate output: a filter
          // on the grouping key (`where(user_id >= 0)`) gets pushed
          // below the aggregation into the scan, dropping the heartbeat
          // rows BEFORE the watermark operator ever sees them — the
          // watermark then never advances and the final sessions stay
          // stuck in state. min(user_id) ≡ user_id per group but is
          // un-pushable.
          .agg(count(lit(1)).as("n_events"), min(col("user_id")).as("__u"))
          .where(col("__u") >= 0)
          .select(col("user_id"), col("sw.start").as("t_start"),
            col("sw.end").as("t_end"), col("n_events")),
        "append")
      }),

    // INGEST under streaming: `.warc.gz` segment blobs arrive as a
    // stream (one micro-batch per file, like a crawler landing
    // segments) and the record split runs per batch — stateless, so the
    // batch parser (sources.Warc.readPages) serves the stream verbatim
    // and must emit exactly the batch round-trip's rows
    "st_warc_ingest" -> ((s, dir) =>
      runToSink(s,
        graft.sources.Warc.readPages(warcBlobStream(s, dir), "warc")
          .select(col("url"), col("warc_date"), col("content_length"),
            md5(col("payload")).as("payload_md5")),
        "append")))

  /** The `src_warc_roundtrip` corpus as a STREAM of file blobs:
    * documents → 8 `.warc.gz` shard blobs (the batch query's exact
    * derivation), written once per JVM as 4 parquet files so
    * `maxFilesPerTrigger=1` drives 4 micro-batches of segment
    * arrivals. */
  private def warcBlobStream(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val tmp = TmpDirs.cached(s"warc:$dir", "st_warc")
    if (!Files.exists(Paths.get(tmp, "_SUCCESS"))) {
      // DataOps.warcPages is THE shared derivation — this lane's oracle
      // is aliased to src_warc_roundtrip's, so diverging copies would
      // silently break the stream ≡ batch equivalence
      graft.sources.Warc.writeFiles(DataOps.warcPages(s, dir),
          "url", "warc_date", "payload", col("shard"))
        .repartition(4).write.mode("overwrite").parquet(tmp)
    }
    s.readStream.schema(s.read.parquet(tmp).schema)
      .option("maxFilesPerTrigger", 1).parquet(tmp)
  }

  val oracles: Map[String, String] = Map(
    // identical to the batch kg_triples / cu_hash_sample /
    // q9_events_hourly oracles — the POINT: the streaming lane must
    // reproduce the batch lane
    "st_kg_triples" -> graft.queries.KgQueries.oracles("kg_triples"),
    "st_kg_nodes" -> graft.queries.KgQueries.oracles("kg_nodes"),
    "st_warc_ingest" -> graft.queries.DataOps.oracles("src_warc_roundtrip"),
    "st_hash_sample" ->
      """SELECT doc_id, stratum, bucket FROM (
        |  SELECT doc_id, lang AS stratum,
        |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000 AS bucket
        |  FROM documents)
        |WHERE bucket < CASE stratum WHEN 'en' THEN 10000 WHEN 'de' THEN 2500 ELSE 500 END""".stripMargin,
    "st_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |       round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // the update-mode file-sink lane must converge to the SAME table
    "st_events_hourly_update" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |       round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // the micro-batch-folded view must converge to the same single-pass
    // GROUP BY the batch tb_mv_refresh oracle re-derives
    "st_mv_refresh" ->
      """WITH ev AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |         event_id % 97 AS m1, nullif(user_id % 5, 0) AS m2
        |  FROM events)
        |SELECT event_type, hour, count(*) AS n_rows,
        |       sum(m1)::BIGINT AS sum_m1, min(m1) AS min_m1, max(m1) AS max_m1,
        |       sum(m2)::BIGINT AS sum_m2, min(m2) AS min_m2, max(m2) AS max_m2
        |FROM ev GROUP BY 1, 2""".stripMargin,

    // stream-dedup'd fingerprints ≡ batch DISTINCT
    "st_exact_dedup" ->
      "SELECT DISTINCT md5(coalesce(text, '')) AS text_md5 FROM documents",

    // delta-accumulated near-dup pairs ≡ the one-shot batch rebuild
    "st_delta_pairs" -> graft.queries.DataOps.oracles("dd_minhash_pairs"),

    // streamed events enriched against the static per-user profile ≡
    // the same join done wholly in batch
    "st_static_enrich" ->
      """WITH profile AS (
        |  SELECT user_id, count(*)::BIGINT AS user_total,
        |         count(DISTINCT event_type)::BIGINT AS user_types
        |  FROM events GROUP BY 1)
        |SELECT user_id, event_id, event_type, user_total, user_types
        |FROM events JOIN profile USING (user_id)""".stripMargin,
    // the streamed interval join must land exactly the batch self-join
    "st_stream_join" ->
      """SELECT e.event_id AS error_id, c.event_id AS click_id, e.user_id,
        |       e.ts AS error_ts, c.ts AS click_ts
        |FROM events e JOIN events c
        |  ON e.user_id = c.user_id
        | AND e.event_type = 'error' AND c.event_type = 'click'
        | AND c.ts BETWEEN e.ts - INTERVAL 30 MINUTE AND e.ts""".stripMargin,

    // batch re-derivation of Spark's session_window semantics: split on
    // gap ≥ 30 min at µs precision; window end = last event + gap
    "st_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM flagged)
        |SELECT user_id, min(ts) AS t_start, max(ts) + INTERVAL 30 MINUTE AS t_end,
        |       count(*) AS n_events
        |FROM sessions GROUP BY user_id, session_id""".stripMargin)
}
