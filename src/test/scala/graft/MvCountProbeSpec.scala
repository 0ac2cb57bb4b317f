package graft

import org.apache.spark.sql.functions._

class MvCountProbeSpec extends SparkSpec {
  import spark.implicits._

  test("SizeOfSplitRewrite: size(split) becomes allocation-free string math") {
    graft.plans.SizeOfSplitRewrite.install(spark)
    // range source so constant folding can't erase the expression
    val df = spark.range(3).select(
      concat(lit("a b c x"), col("id").cast("string")).as("text"))
    val direct = graft.dsl.Esql.applyCommand(df, """eval n = mv_count(split(text, " "))""")
    val viaCol = graft.dsl.Esql.applyCommand(
      graft.dsl.Esql.applyCommand(df, """eval toks = split(text, " ")"""),
      "eval n = mv_count(toks)")
    // the rewrite fires on the n projection in both composition forms
    val directPlan = direct.select("n").queryExecution.optimizedPlan.toString
    val viaPlan = viaCol.select("n").queryExecution.optimizedPlan.toString
    assert(!directPlan.contains("split("), directPlan)
    assert(!viaPlan.contains("split("), viaPlan)
    assert(direct.select("n").as[Int].collect().toSeq == Seq(4, 4, 4))
    assert(viaCol.select("n").as[Int].collect().toSeq == Seq(4, 4, 4))
    // parity with size(split(..)) on edges: empty string and trailing
    // delimiters (split limit -1 keeps empty fields)
    val edges = Seq("", " ", "a ", " a", "a  b").toDF("text")
    val rw = graft.dsl.Esql.applyCommand(edges, """eval n = mv_count(split(text, " "))""")
      .select("n").as[Int].collect().toSeq
    // ground truth of size(split(.., -1)): empty fields are kept
    assert(rw == Seq(1, 2, 2, 2, 3))
  }
}
