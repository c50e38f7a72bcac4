package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** User-facing surface for the scale guards the operators emit as named
  * `observe()` metrics (`minhash_buckets`, `simhash_buckets`,
  * `ann_buckets`, `asof_skew`, `pack_shards`, CC convergence, stage
  * lineage …). `observe` rides the query's own aggregation — zero extra
  * passes — but its result is only delivered through the listener bus,
  * so without a registered listener the caps/skew numbers fire into the
  * void. `Collector` is that listener, packaged: register, run actions,
  * read the latest row per metric name.
  *
  * Delivery is ASYNC (the listener bus drains after the action returns),
  * hence `await`: poll with a deadline instead of reading immediately.
  * One collector may observe many queries; the LATEST row per metric
  * name wins, which matches the repo convention that composed multi-pass
  * operators parameterize their metric names (`metricName` args) so no
  * two live subplans share one.
  */
object Metrics {

  final class Collector(spark: SparkSession) extends AutoCloseable {
    private val rows = new ConcurrentHashMap[String, Row]()

    private val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) => rows.put(name, row) }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    /** Latest delivered row for `name`, if any has arrived yet. */
    def get(name: String): Option[Row] = Option(rows.get(name))

    /** All metrics delivered so far (name → latest row). */
    def snapshot(): Map[String, Row] = {
      val b = Map.newBuilder[String, Row]
      rows.forEach((k, v) => b += k -> v)
      b.result()
    }

    /** Block until `name` arrives (the bus drains asynchronously after
      * the action) or fail loudly after `timeoutMs`. */
    def await(name: String, timeoutMs: Long = 20000L): Row = {
      val deadline = System.currentTimeMillis + timeoutMs
      var r = get(name)
      while (r.isEmpty && System.currentTimeMillis < deadline) {
        Thread.sleep(50)
        r = get(name)
      }
      r.getOrElse(throw new NoSuchElementException(
        s"observe metric '$name' not delivered within ${timeoutMs}ms — " +
          "did the query that emits it actually run an action?"))
    }

    override def close(): Unit = spark.listenerManager.unregister(listener)
  }

  /** Run `body` with a registered collector; always unregisters. */
  def collecting[A](spark: SparkSession)(body: Collector => A): A = {
    val c = new Collector(spark)
    try body(c) finally c.close()
  }
}
