package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DataFrame connected components — the canonicalization clustering step
  * (north_rule). GraphX is RDD-based; the north rule mandates typed
  * Dataset/Catalyst, so this is a pure DataFrame loop, following the
  * label-propagation + pointer-jumping scheme of large-star/small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14): each round (a) every vertex adopts the min label in its
  * direct neighborhood (one shuffle agg + join), then (b) labels chase
  * their own label (pointer jump — halves chain depth, giving O(log d)
  * rounds on diameter-d components). `localCheckpoint` per round cuts
  * lineage blowup; convergence is an `isEmpty` probe on changed labels.
  *
  * Input: edges (src: Long, dst: Long), undirected.
  * Output: (id: Long, component: Long) — component = min id reachable.
  */
object ConnectedComponents {

  def run(spark: SparkSession, edges: DataFrame, maxIterations: Int = 25): DataFrame = {
    import spark.implicits._

    val sym = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .where($"src" =!= $"dst")
      .distinct()
      .localCheckpoint(true)

    var labels = sym.select($"src".as("id")).union(sym.select($"dst".as("id")))
      .distinct()
      .withColumn("component", $"id")
      .localCheckpoint(true)

    var converged = labels.isEmpty
    var iter = 0
    while (!converged && iter < maxIterations) {
      // (a) adopt min label among direct neighbors
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy($"dst".as("id")).agg(min($"component").as("nbr_min"))
      val adopted = labels.join(nbrMin, Seq("id"), "left")
        .select($"id", least($"component", coalesce($"nbr_min", $"component")).as("component"))

      // (b) pointer jump: component := label(component)
      val parents = adopted.select($"id".as("component"), $"component".as("parent"))
      val jumped = adopted.join(parents, Seq("component"), "left")
        .select($"id", least($"component", coalesce($"parent", $"component")).as("component"))
        .localCheckpoint(true)

      converged = jumped.join(labels.withColumnRenamed("component", "prev"), Seq("id"))
        .where($"component" =!= $"prev")
        .isEmpty
      labels = jumped
      iter += 1
    }
    labels
  }
}
