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
