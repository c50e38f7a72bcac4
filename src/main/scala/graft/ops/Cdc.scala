package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance — the incremental
  * table-upkeep half of a lakehouse pipeline (the Iceberg/Delta `MERGE
  * INTO` shape, expressed as a pure DataFrame program so it runs on
  * plain parquet checkpoints too). The reference reprocesses its whole
  * store per upload (`/root/reference/app.py:53-122`); at 10^12 rows a
  * dimension must instead fold full snapshots into a versioned history
  * without rewriting untouched versions. */
object Cdc {

  /** SCD-type-2 fold of a full `snapshot` (one row per live key, taken
    * at version `ts`) into a versioned `history`
    * (key, attrs…, valid_from, valid_to with NULL = open):
    *   - closed rows pass through untouched,
    *   - an open row whose key is absent from the snapshot closes at
    *     `ts` (deletion),
    *   - an open row whose attrs equal the snapshot's (null-safely)
    *     stays open,
    *   - a changed key closes the old row at `ts` AND opens a new one
    *     from `ts`,
    *   - a key new to the snapshot opens at `ts`.
    *
    * Scale shape: ONE full-outer key join of the open slice with the
    * snapshot; each joined row emits its 0–2 outputs through a built
    * array + explode (no triple-referenced join subtree to recompute or
    * checkpoint), and the untouched closed history unions around the
    * join without ever shuffling. With daily snapshots the open slice ≈
    * live-key count, so at 10^12-row history the join is over the live
    * fraction only — and both sides arrive key-partitioned if the
    * history is bucketed by key (kg.io.BucketedTableIO), making the
    * join exchange-free.
    *
    * Contracts: `ts` must be later than every open row's `valid_from`
    * (a snapshot cannot predate versions it supersedes) — enforced
    * in-plan via `raise_error` riding the join input (zero extra pass).
    * One open row per key is the caller's invariant (it holds by
    * induction if history is only ever produced by this fold from a
    * one-row-per-key start); `checkUnique = true` adds an explicit
    * aggregation pass that fails loudly on a violation — the Temporal
    * debug-detector idiom, off by default because it prices a second
    * scan of the open slice. */
  def scd2Merge(history: DataFrame, snapshot: DataFrame, key: String,
      attrs: Seq[String], ts: Long,
      validFrom: String = "valid_from", validTo: String = "valid_to",
      checkUnique: Boolean = false): DataFrame = {
    require(attrs.nonEmpty, "scd2Merge: need at least one tracked attribute")
    require(!attrs.contains(key) && !Seq(validFrom, validTo).exists(attrs.contains),
      "scd2Merge: attrs must not repeat the key or validity columns")
    val outCols = (key +: attrs) ++ Seq(validFrom, validTo)

    val closed = history.where(col(validTo).isNotNull)
      .select(outCols.map(col): _*)
    val open0 = history.where(col(validTo).isNull)
    val open = if (!checkUnique) open0 else {
      val dups = open0.groupBy(col(key)).agg(count(lit(1)).as("n_open"))
        .where(col("n_open") > 1)
      open0.join(dups, Seq(key), "left")
        .withColumn(key, when(col("n_open").isNotNull, raise_error(concat(
          lit("scd2Merge: multiple open rows for key "), col(key).cast("string"))))
          .otherwise(col(key)))
        .drop("n_open")
    }
    // loud contract: the snapshot version must postdate every open row
    val openG = open.withColumn(validFrom,
      when(col(validFrom) >= ts, raise_error(concat(
        lit(s"scd2Merge: snapshot ts $ts <= open valid_from "),
        col(validFrom).cast("string"), lit(" for key "), col(key).cast("string"))))
        .otherwise(col(validFrom)))

    val h = openG.select((col(key).as("_hk") +: col(validFrom).as("_hf") +:
      attrs.map(a => col(a).as(s"_h_$a"))): _*)
    val sn = snapshot.select((col(key).as("_sk") +:
      attrs.map(a => col(a).as(s"_s_$a"))): _*)
    val j = h.join(sn, col("_hk") === col("_sk"), "full_outer")

    val hPresent = col("_hk").isNotNull
    val sPresent = col("_sk").isNotNull
    val same = attrs.map(a => col(s"_h_$a") <=> col(s"_s_$a")).reduce(_ && _)
    def row(k: org.apache.spark.sql.Column, as: String => org.apache.spark.sql.Column,
        from: org.apache.spark.sql.Column, to: org.apache.spark.sql.Column) =
      struct((k.as(key) +: attrs.map(a => as(a).as(a))) ++
        Seq(from.as(validFrom), to.as(validTo)): _*)
    val nullTo = lit(null).cast(history.schema(validTo).dataType)
    val tsLit = lit(ts).cast(history.schema(validFrom).dataType)
    val tsTo = lit(ts).cast(history.schema(validTo).dataType)
    // each joined row emits 0–2 of: the old version closed at ts, the
    // unchanged open row, the new open version
    val outs = array(
      when(hPresent && (!sPresent || !same),
        row(col("_hk"), a => col(s"_h_$a"), col("_hf"), tsTo)),
      when(hPresent && sPresent && same,
        row(col("_hk"), a => col(s"_h_$a"), col("_hf"), nullTo)),
      when(sPresent && (!hPresent || !same),
        row(col("_sk"), a => col(s"_s_$a"), tsLit, nullTo)))
    val merged = j
      .select(explode(filter(outs, o => o.isNotNull)).as("o"))
      .select(outCols.map(c => col(s"o.$c")): _*)
    closed.unionAll(merged)
  }

  /** The summary-table shape `refreshSummary` maintains: per key group,
    * `n_rows` plus (sum_m, min_m, max_m) for every measure — the
    * self-maintainable aggregate set (COUNT/SUM/MIN/MAX distribute over
    * unions, so partial summaries combine without the facts). AVG is
    * served as sum/n downstream; nothing non-distributive (median,
    * distinct counts) belongs here — that's what the mergeable sketches
    * (`ops.Sketches`) are for. */
  def aggregateSummary(facts: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "aggregateSummary: need at least one group key")
    require(measures.intersect(keys).isEmpty,
      "aggregateSummary: measures must not repeat the keys")
    val aggs = count(lit(1)).as("n_rows") +: measures.flatMap(m => Seq(
      sum(col(m)).as(s"sum_$m"), min(col(m)).as(s"min_$m"), max(col(m)).as(s"max_$m")))
    facts.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental materialized-view maintenance for an APPEND-ONLY fact
    * stream: fold a batch of new `deltaFacts` into an existing `base`
    * summary (the `aggregateSummary` shape) so the refreshed view equals
    * a full recompute over (old facts ∪ delta) — without ever rescanning
    * the old facts. The reference rebuilds its whole store per upload
    * (`/root/reference/app.py:53-122`); at 10^12 facts the view must
    * absorb the day's 10^9 appends at delta cost.
    *
    * Scale shape: the delta aggregates FIRST (map-side partials shrink
    * it to its key count before anything shuffles), then ONE full-outer
    * key join against the base — which is key-sized, not fact-sized, and
    * exchange-free when the base checkpoint is key-bucketed
    * (kg.io.BucketedTableIO). Combine rules per the distributive law:
    * counts add, sums add (null only when both sides never saw a value —
    * SQL's sum-of-empty = NULL survives the merge), min/max via
    * least/greatest (null-ignoring in both engines).
    *
    * Contracts: `base` must carry the exact `aggregateSummary` columns
    * (loud require). Append-only is the semantic boundary, not an
    * implementation shortcut: COUNT/SUM could retract deletes, but
    * MIN/MAX cannot (dropping the current min needs the runner-up, which
    * only the facts know) — deletions mean recomputing affected
    * partitions or narrowing the view to retractable aggregates. Sums
    * over integral/decimal measures refresh bit-exactly; float sums are
    * only numerically equal (addition order differs from a single-pass
    * recompute), so keep float measures out of hash-compared views. */
  def refreshSummary(base: DataFrame, deltaFacts: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val expected = (keys :+ "n_rows") ++
      measures.flatMap(m => Seq(s"sum_$m", s"min_$m", s"max_$m"))
    val missing = expected.filterNot(base.columns.contains)
    require(missing.isEmpty,
      s"refreshSummary: base is not an aggregateSummary(keys=$keys, measures=$measures) " +
        s"table — missing columns ${missing.mkString(", ")}")
    val delta = aggregateSummary(deltaFacts, keys, measures)
    val b = base.select(expected.map(c =>
      col(c).as(if (keys.contains(c)) s"_bk_$c" else s"_b_$c")): _*)
    val d = delta.select(expected.map(c =>
      col(c).as(if (keys.contains(c)) s"_dk_$c" else s"_d_$c")): _*)
    val cond = keys.map(k => col(s"_bk_$k") <=> col(s"_dk_$k")).reduce(_ && _)
    val j = b.join(d, cond, "full_outer")
    // n_rows > 0 on any present side, so presence = n_rows non-null
    val keyCols = keys.map(k =>
      when(col(s"_b_n_rows").isNotNull, col(s"_bk_$k")).otherwise(col(s"_dk_$k")).as(k))
    def added(c: String) = {
      val zero = lit(0).cast(base.schema(c).dataType)
      when(col(s"_b_$c").isNull && col(s"_d_$c").isNull, lit(null).cast(base.schema(c).dataType))
        .otherwise(coalesce(col(s"_b_$c"), zero) + coalesce(col(s"_d_$c"), zero)).as(c)
    }
    val aggCols = added("n_rows") +: measures.flatMap(m => Seq(
      added(s"sum_$m"),
      least(col(s"_b_min_$m"), col(s"_d_min_$m")).as(s"min_$m"),
      greatest(col(s"_b_max_$m"), col(s"_d_max_$m")).as(s"max_$m")))
    j.select(keyCols ++ aggCols: _*)
  }

  /** Change-data extraction between two full snapshots of the same
    * keyspace: one full-outer key join emitting
    * (key, attrs…, change_type) with `insert` (key only in `newer`,
    * new attrs), `delete` (key only in `older`, old attrs — the row the
    * consumer must retract), `update` (key in both, any attr changed
    * null-safely, new attrs). Unchanged keys emit nothing, so the
    * output is delta-sized — the input a downstream incremental
    * consumer (scd2Merge, a streaming upsert sink, an index maintainer)
    * wants instead of re-reading 10^12 rows. Same bucketed-join note as
    * scd2Merge: key-bucketed snapshots diff exchange-free. */
  /** Time travel over an SCD2 history: the dimension table AS OF `ts` —
    * rows whose validity interval covers the instant
    * (`valid_from <= ts < valid_to`, an open row's `valid_to` is NULL).
    * Intervals are half-open, matching [[scd2Merge]]'s close-then-open
    * convention: at the exact instant a version changes, the NEW row is
    * current. This is the query a reproducible training run replays to
    * see its dimensions exactly as an earlier run did. Pure filter +
    * project — with the history laid out by `valid_from` (range
    * partition or z-order), the scan partition-prunes to the epochs
    * covering ts. */
  def snapshotAsOf(history: DataFrame, validFrom: String, validTo: String,
      ts: Long): DataFrame =
    history
      .where(col(validFrom) <= ts && (col(validTo).isNull || col(validTo) > ts))
      .drop(validFrom, validTo)

  def snapshotDiff(older: DataFrame, newer: DataFrame, key: String,
      attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "snapshotDiff: need at least one compared attribute")
    val o = older.select((col(key).as("_ok") +:
      attrs.map(a => col(a).as(s"_o_$a"))): _*)
    val n = newer.select((col(key).as("_nk") +:
      attrs.map(a => col(a).as(s"_n_$a"))): _*)
    val j = o.join(n, col("_ok") === col("_nk"), "full_outer")
    val same = attrs.map(a => col(s"_o_$a") <=> col(s"_n_$a")).reduce(_ && _)
    val change = when(col("_ok").isNull, "insert")
      .when(col("_nk").isNull, "delete")
      .when(!same, "update")
    val useNew = col("_nk").isNotNull
    j.where(change.isNotNull)
      .select((when(useNew, col("_nk")).otherwise(col("_ok")).as(key) +:
        attrs.map(a => when(useNew, col(s"_n_$a")).otherwise(col(s"_o_$a")).as(a))) :+
        change.as("change_type"): _*)
  }
}
