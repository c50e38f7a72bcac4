package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class TripleScopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (url, pred, obj, kind, weight): fact A on 3 urls, fact B on 2 urls
  // (one url asserts it twice — distinct-url support must stay 2),
  // fact C on 1 url (below minSupport)
  private def triples = Seq(
    ("u1", "mentionsEntity", "cnn", "acronym", 2),
    ("u2", "mentionsEntity", "cnn", "acronym", 1),
    ("u3", "mentionsEntity", "cnn", "acronym", 1),
    ("u1", "hasKeyword", "graph", "keyword", 1),
    ("u1", "hasKeyword", "graph", "keyword", 1),
    ("u4", "hasKeyword", "graph", "keyword", 1),
    ("u2", "hasTitle", "only once", "attr", 1))
    .toDF("url", "pred", "obj", "kind", "weight")

  test("tripleSupport: distinct-url support, minSupport gate, exact ppm") {
    val out = TripleScope.tripleSupport(triples, minSupport = 2)
      .collect().map(r => r.getAs[String]("obj") ->
        (r.getAs[Long]("n_urls"), r.getAs[Long]("total_weight"), r.getAs[Long]("conf_ppm")))
      .toMap
    // corpus has 4 distinct urls
    assert(out("cnn") == ((3L, 4L, 750000L)))
    assert(out("graph") == ((2L, 3L, 500000L)), "duplicate assertion on u1 counts once for support")
    assert(!out.contains("only once"), "support 1 < minSupport 2 dropped")
    assert(out.size == 2)
  }

  test("triplePR: exact set math in ppm; duplicate assertions never double-count") {
    val got = Seq(("u1", "p", "a"), ("u1", "p", "b"), ("u2", "p", "c"),
      ("u3", "p", "d"), ("u3", "p", "d")).toDF("url", "pred", "obj")
    val gold = Seq(("u1", "p", "a"), ("u1", "p", "b"), ("u2", "p", "c"),
      ("u9", "p", "z")).toDF("url", "pred", "obj")
    val r = Eval.triplePR(got, gold).collect()(0)
    assert(r.getAs[Long]("n_got") == 4L, "got dedups to 4")
    assert(r.getAs[Long]("n_gold") == 4L)
    assert(r.getAs[Long]("n_match") == 3L)
    assert(r.getAs[Long]("precision_ppm") == 750000L)
    assert(r.getAs[Long]("recall_ppm") == 750000L)
    assert(r.getAs[Long]("f1_ppm") == 750000L)
  }

  test("edgeIntervals: first/last seen, snapshot counts, is_current only for latest") {
    // u1→day0, u2→day1, u3→day2, u4→day0 (u4 shares u1's snapshot)
    val day = Map("u1" -> 0, "u2" -> 1, "u3" -> 2, "u4" -> 0)
    val snapExpr = date_format(date_add(to_date(lit("2026-01-01")),
      element_at(typedLit(day), col("url"))), "yyyy-MM-dd")
    val out = TripleScope.edgeIntervals(triples, snapExpr)
      .collect().map(r => r.getAs[String]("obj") ->
        ((r.getAs[String]("first_seen"), r.getAs[String]("last_seen"),
          r.getAs[Long]("n_snapshots"), r.getAs[Long]("n_urls"),
          r.getAs[Boolean]("is_current"))))
      .toMap
    // cnn spans snapshots 0..2 and is asserted in the corpus-latest (day 2)
    assert(out("cnn") == (("2026-01-01", "2026-01-03", 3L, 3L, true)))
    // graph: u1 and u4 are BOTH day 0 → one snapshot, two urls, stale
    assert(out("graph") == (("2026-01-01", "2026-01-01", 1L, 2L, false)))
    // title: single assertion on day 1, not current
    assert(out("only once") == (("2026-01-02", "2026-01-02", 1L, 1L, false)))
  }
}
