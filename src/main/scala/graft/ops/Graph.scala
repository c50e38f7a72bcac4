package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the materialized KG tables
  * (/root/reference has no graph consumer for its store — this is the
  * analysis layer a KG engine owes its users). PageRank runs in pure
  * integer arithmetic: SCALE-scaled long ranks, per-edge floor division,
  * order-free long sums — so every iteration is bit-identical in any
  * engine and the result can sit under the hash-exact DuckDB oracle.
  * Float PageRank accumulates contributions in partition order and can
  * never be hash-compared cross-engine. */
object Graph {

  /** Deterministic weighted PageRank over an edge list, with every edge
    * mirrored (src↔dst) so the bipartite url→entity KG keeps rank
    * circulating instead of draining into sinks. Fixed `iters` Jacobi
    * sweeps of
    *   r0(v)      = SCALE div N
    *   r_{k+1}(v) = (15·(SCALE div N)) div 100
    *              + (85·Σ_u (r_k(u)·w(u,v)) div wdeg(u)) div 100
    * (damping 0.85 as the 85/100 integer pair). Per iteration: one join
    * of the static weighted-degree edge table with the current ranks and
    * one partial-aggregated shuffle on dst — the standard iterative
    * DataFrame PageRank shape. The unrolled lineage is fine for fixed
    * small `iters`; a production run checkpoints ranks per iteration
    * (the kg.Pipeline parquet-ledger pattern) to cut lineage growth.
    * Output: (vertex, pr) for every vertex.
    *
    * Preconditions (enforced): the weight column must be an integral
    * type — a float weight would make `div` coerce and break the
    * bit-exact determinism that is this operator's contract — and
    * `scale * max(weight)` must stay below 2^63 (r ≤ SCALE, so the
    * per-edge product r·w is bounded by SCALE·max(w); with the default
    * SCALE=1e9 that caps weights at ~9.2e9). Weights must also be
    * POSITIVE — a zero/negative weight corrupts the weighted-degree
    * semantics (and a large negative one would wrap scale·w just like a
    * large positive one). Both bounds are checked lazily in-plan via
    * `raise_error` (zero extra pass — the check rides the degree
    * aggregation), so a bad weight fails the job loudly instead of
    * wrapping silently. */
  def pageRank(edges: DataFrame, src: String, dst: String, weight: String,
      iters: Int = 5, scale: Long = 1000000000L): DataFrame = {
    val wType = edges.schema(weight).dataType
    require(Seq("byte", "short", "integer", "long").contains(wType.typeName),
      s"pageRank: weight column '$weight' must be integral, got ${wType.typeName} — " +
        "integer arithmetic is the operator's bit-exactness contract")
    val maxW = Long.MaxValue / scale
    val wGuarded = when(col(weight).cast("long") > maxW || col(weight).cast("long") < 1L,
      raise_error(concat(
        lit(s"pageRank: weight must be in [1, ${maxW}] " +
          "(non-positive corrupts weighted degrees; larger overflows scale*w): "),
        col(weight).cast("string"))))
      .otherwise(col(weight).cast("long"))
    val ed = edges.select(col(src).as("src"), col(dst).as("dst"), wGuarded.as("w"))
      .unionAll(edges.select(col(dst).as("src"), col(src).as("dst"), wGuarded.as("w")))
    val deg = ed.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
    val edeg = ed.join(deg, "src")
    val verts = ed.select(col("src").as("v")).distinct()
    val nn = verts.agg(count(lit(1)).as("n"))
    var ranks = verts.crossJoin(broadcast(nn))
      .select(col("v"), expr(s"${scale}L div n").as("r"))
    for (_ <- 0 until iters) {
      val contrib = edeg.join(ranks.withColumnRenamed("v", "src"), "src")
        .select(col("dst").as("v"), expr("(r * w) div wdeg").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("cs"))
      ranks = verts.join(contrib, Seq("v"), "left")
        .crossJoin(broadcast(nn))
        .select(col("v"),
          expr(s"(15 * (${scale}L div n)) div 100 + (85 * coalesce(cs, 0L)) div 100").as("r"))
    }
    ranks.select(col("v").as("vertex"), col("r").as("pr"))
  }
}
