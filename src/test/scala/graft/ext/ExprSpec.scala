package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.kg.{PagesGen, RefText, TestSpark, Udfs}

/** The native Catalyst clean_text expression: byte parity with the UDF
  * and the pure kernel, null semantics, and codegen placement. */
class ExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus: Seq[String] =
    (0L until 150L).map(PagesGen.docText) ++ Seq(
      "", "   ", "a", "<b>bold</b> naïve [cite] a@b.c",
      "ehT dna rof era tub ton uoy lla nac dah reh saw eno ruo tuo sah " +
        "sih woh sti yam wen won dlo ees yaw ohw", // reversed-ish
      "ABC DEF\n\nLine two\r\nLine three sep")

  test("expression == pure kernel == UDF on fuzz corpus (byte parity)") {
    GraftFunctions.register(spark)
    val df = corpus.toDF("text")
    val got = df.select(
        expr("graft_clean_text(text)").as("e"),
        Udfs.cleanText(col("text")).as("u"),
        col("text"))
      .collect()
    got.foreach { r =>
      val want = RefText.cleanText(r.getString(2))
      assert(r.getString(0) == want, s"expr diverges on: ${r.getString(2).take(60)}")
      assert(r.getString(1) == want, s"udf diverges on: ${r.getString(2).take(60)}")
    }
  }

  test("null input yields empty string (UDF semantics), nullable = false") {
    GraftFunctions.register(spark)
    val df = Seq[Option[String]](None, Some("x")).toDF("text")
      .select(expr("graft_clean_text(text)").as("c"))
    assert(!df.schema("c").nullable, "expression must be provably non-nullable")
    assert(df.as[String].collect().toSeq == Seq("", "x"))
  }

  test("expression runs inside whole-stage codegen (no UDF boundary)") {
    GraftFunctions.register(spark)
    // a parquet scan (not a LocalRelation, which the optimizer folds by
    // evaluating the expression interpreted) so the projection actually
    // compiles through doGenCode
    val dir = java.nio.file.Files.createTempDirectory("exprspec").toString
    corpus.toDF("text").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).select(expr("graft_clean_text(text)").as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_clean_text"), plan)
    // and the compiled path must produce the kernel's bytes
    val got = df.as[String].collect().sorted
    val want = corpus.map(RefText.cleanText).sorted
    assert(got.toSeq == want)
  }

  test("non-string input is rejected at analysis time") {
    GraftFunctions.register(spark)
    val ex = intercept[Exception] {
      Seq(1, 2).toDF("n").select(expr("graft_clean_text(n)")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("string") ||
      ex.getMessage.contains("DATATYPE_MISMATCH"), ex.getMessage)
  }
}
