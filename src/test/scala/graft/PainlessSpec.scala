package graft

import graft.dsl.Painless
import graft.search.Search
import org.apache.spark.sql.functions._

class PainlessSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, 100.0, 4L),
    (2L, 200.0, 9L),
    (3L, 0.0, 1L)).toDF("id", "x", "n")

  private def eval(script: String, params: Map[String, Any] = Map.empty): Seq[Double] =
    df.orderBy("id")
      .select(Painless.compile(script, params).cast("double"))
      .as[Double].collect().toSeq

  test("arithmetic, precedence, unary minus") {
    assert(eval("1 + 2 * 3") == Seq(7.0, 7.0, 7.0))
    assert(eval("(1 + 2) * 3") == Seq(9.0, 9.0, 9.0))
    assert(eval("-doc['x'].value / 2") == Seq(-50.0, -100.0, 0.0))
    assert(eval("7 % 4") == Seq(3.0, 3.0, 3.0))
  }

  test("doc refs, params, Math functions") {
    assert(eval("Math.sqrt(doc['x'].value)") == Seq(10.0, math.sqrt(200.0), 0.0))
    assert(eval("Math.max(doc['x'].value, params.floor)", Map("floor" -> 150)) ==
      Seq(150.0, 200.0, 150.0))
    assert(eval("Math.pow(doc['n'].value, 2)") == Seq(16.0, 81.0, 1.0))
    assert(eval("Math.log(Math.exp(1))") == Seq(1.0, 1.0, 1.0))
    assert(eval("Math.floor(2.7) + Math.ceil(2.2) + Math.abs(-1)") ==
      Seq(6.0, 6.0, 6.0))
  }

  test("saturation and sigmoid helpers") {
    assert(eval("saturation(doc['x'].value, 100)") == Seq(0.5, 2.0 / 3.0, 0.0))
    // sigmoid(v, k, a) = v^a / (k^a + v^a); at v == k it is 0.5
    assert(eval("sigmoid(doc['x'].value, 100, 1)")(0) == 0.5)
  }

  test("ternary with comparisons; comparison yields 1/0") {
    assert(eval("doc['x'].value >= 150 ? 10 : 20") == Seq(20.0, 10.0, 20.0))
    assert(eval("doc['x'].value == 0 ? -1 : doc['x'].value") ==
      Seq(100.0, 200.0, -1.0))
    // bare comparison composes with arithmetic (painless booleans
    // don't, but the 1/0 encoding keeps the subset total)
    assert(eval("(doc['x'].value > 0) + (doc['n'].value > 5)") ==
      Seq(1.0, 2.0, 0.0))
  }

  test("_score reference feeds the provided score column") {
    val out = df.select(
      Painless.compile("_score * 2 + doc['n'].value", Map.empty, col("x")).as("s"))
      .orderBy("s").as[Double].collect().toSeq
    assert(out == Seq(1.0, 204.0, 409.0))
  }

  test("rejects unknown identifiers, params, malformed input") {
    intercept[IllegalArgumentException](eval("System.exit(1)"))
    intercept[IllegalArgumentException](eval("params.nope"))
    intercept[IllegalArgumentException](eval("doc['x'.value"))
    intercept[IllegalArgumentException](eval("1 + "))
    intercept[IllegalArgumentException](eval("Math.pow(1)"))
  }

  test("vector functions: cosineSimilarity / dotProduct / l2norm") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 2.0f)), (3L, Seq(3.0f, 4.0f)))
      .toDF("id", "embedding")
    def run(script: String) = vecs.select(
      $"id",
      graft.dsl.Painless.compile(script, Map("qv" -> Seq(3.0, 4.0))).as("s"))
      .as[(Long, Double)].collect().toMap
    val cos = run("cosineSimilarity(params.qv, 'embedding')")
    assert(math.abs(cos(1L) - 0.6) < 1e-12 && math.abs(cos(2L) - 0.8) < 1e-12)
    assert(math.abs(cos(3L) - 1.0) < 1e-12)
    val dot = run("dotProduct(params.qv, 'embedding') + 1.0")
    assert(dot == Map(1L -> 4.0, 2L -> 9.0, 3L -> 26.0))
    val l2 = run("l2norm(params.qv, 'embedding')")
    assert(l2(3L) == 0.0 && math.abs(l2(1L) - math.sqrt(20.0)) < 1e-12)
    intercept[IllegalArgumentException](
      graft.dsl.Painless.compile("cosineSimilarity(params.qv, 7)", Map("qv" -> Seq(1.0))))
  }

  test("statement subset: defs, for loops over doc arrays, return") {
    import graft.dsl.Painless
    val docs = Seq(
      (1L, Seq(3.0, 4.0)), (2L, Seq(1.0, 1.0, 1.0)), (3L, Seq.empty[Double]))
      .toDF("id", "vals")
    def run(src: String, params: Map[String, Any] = Map.empty): Map[Long, Double] =
      docs.select(col("id"), Painless.compile(src, params).as("v"))
        .as[(Long, Double)].collect().toMap
    // loop folds to one aggregate; empty array returns the init
    val sumsq = run(
      "def s = 0.0; for (x in doc['vals']) { s += x * x } return Math.sqrt(s)")
    assert(sumsq == Map(1L -> 5.0, 2L -> math.sqrt(3.0), 3L -> 0.0))
    // locals compose; reassignment; params inside loop bodies
    val scaled = run(
      """def s = 0.0;
        |def bias = params.b;
        |for (x in doc['vals']) { s += x }
        |s = s * 2.0;
        |return s + bias""".stripMargin, Map("b" -> 10.0))
    assert(scaled == Map(1L -> 24.0, 2L -> 16.0, 3L -> 10.0))
    intercept[IllegalArgumentException](
      run("def s = 0.0; for (x in doc['vals']) { t += x } return s"))
    intercept[IllegalArgumentException](run("def s = 1.0; s + 1.0"))
    // if/else compiles to when/otherwise over def-ed locals
    val gated = run(
      """def s = 0.0;
        |for (x in doc['vals']) { s += x }
        |if (s > 4.0) { s = s * 10.0 } else { s = s + 0.5 }
        |return s""".stripMargin)
    assert(gated == Map(1L -> 70.0, 2L -> 3.5, 3L -> 0.5))
    // if without else keeps the current value
    val keep = run(
      "def s = 2.0; if (doc['id'].value > 2.0) { s = 9.0 } return s")
    assert(keep == Map(1L -> 2.0, 2L -> 2.0, 3L -> 9.0))
    intercept[IllegalArgumentException](
      run("def a = 1.0; def b = 2.0; if (a > 0.0) { a = 3.0 } else { b = 4.0 } return a"))
  }

  test("scriptScoreTopK: filter gates, script replaces score") {
    val docs = Seq(
      (1L, 10L), (2L, 40L), (3L, 90L), (4L, 5L)).toDF("doc_id", "w")
    val out = Search.scriptScoreTopK(
      docs, "doc_id",
      query = col("w") >= 10L,
      script = "Math.sqrt(doc['w'].value) + params.b",
      params = Map("b" -> 1.0), k = 2)
    val rows = out.as[(Long, Double)].collect().toSeq
    assert(rows == Seq((3L, 10.4868), (2L, 7.3246)))
  }

  test("while loops: literal trip counts unroll; data-dependent rejected") {
    // 6 Newton steps from g=100 converge to sqrt(x)
    val newton = "def g = 100.0; def i = 0; " +
      "while (i < 6) { g = (g + doc['x'].value / g) / 2.0; i = i + 1 } return g"
    val got = eval(newton)
    assert(math.abs(got(0) - 10.0) < 1e-3)
    assert(math.abs(got(1) - math.sqrt(200.0)) < 1e-3)
    // decrementing counter form
    assert(eval("def s = 0.0; def i = 3; while (i > 0) { s = s + 2.0; i = i - 1 } return s")
      == Seq(6.0, 6.0, 6.0))
    // a counter that is NOT a literal def cannot resolve a trip count
    val e = intercept[IllegalArgumentException] {
      eval("def i = doc['n'].value; while (i < 6) { i = i + 1 } return i")
    }
    assert(e.getMessage.contains("literal initializer"))
    // runaway guard
    val e2 = intercept[IllegalArgumentException] {
      eval("def i = 0; def s = 0.0; while (i < 5000) { s = s + 1.0; i = i + 1 } return s")
    }
    assert(e2.getMessage.contains("1000"))
  }

  test("r13 hardening: keyword boundaries, underscore locals, top-level +=, trailing semicolon, loud while contract") {
    val df = Seq((1L, 10.0)).toDF("id", "n")
    def v(script: String) =
      df.select(graft.dsl.Painless.compile(script).cast("double")).as[Double].collect().head
    // a local whose name STARTS with a keyword is just a local
    assert(v("def ifx = 1; ifx = 2; return ifx") == 2.0)
    assert(v("def returns = 3; return returns") == 3.0)
    // underscore-prefixed locals are definable AND usable
    assert(v("def _x = 4; return _x") == 4.0)
    // top-level compound assignment, same as in loop bodies
    assert(v("def s = 1; s += 2; return s") == 3.0)
    // a plain expression with a trailing semicolon is implicit-return
    assert(df.select(graft.dsl.Painless.compile("doc['n'].value * 2;")
      .cast("double")).as[Double].collect().head == 20.0)
    // a while whose condition variable goes data-dependent errors
    // CLEARLY instead of crashing with a bare key-not-found
    val e = intercept[IllegalArgumentException] {
      graft.dsl.Painless.compile(
        "def i = 0; def s = 0; while (i < 3) { i = i + doc['n'].value; s += 1 } return s")
    }
    assert(e.getMessage.contains("data-dependent"))
  }
}
