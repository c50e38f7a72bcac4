package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kg.TestSpark

/** Driver smoke contract: entry() must return rows on sf0.001. */
class EntrySpec extends AnyFunSuite {
  test("entry returns canonical multi-url entities") {
    val df = SparkEntry.entry(TestSpark.spark)
    val rows = df.collect()
    assert(rows.length > 0)
    assert(rows.forall(_.getAs[Long]("n_urls") >= 2))
  }
}
