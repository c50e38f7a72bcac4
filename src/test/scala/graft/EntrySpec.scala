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

  // this repo keeps a DuckDB oracle for EVERY query (the contract allows
  // rows-only checks, but a missing oracle here is a wiring mistake, and
  // catching it at test time beats catching it in the driver artifact)
  test("driver contract: queries and oracleSql key sets are identical") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q diff o).isEmpty, s"queries without oracle: ${(q diff o).toSeq.sorted}")
    assert((o diff q).isEmpty, s"oracles without query: ${(o diff q).toSeq.sorted}")
  }
}
