package graft

import graft.sim.Pca
import org.apache.spark.sql.functions._

/** Distributed PCA at the real embedding dimensionality (the 2-D form
  * is oracle-exact via q_embed_pca; these pin the generic d-dim path's
  * linear-algebra invariants, which no SQL oracle can express). */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.load(spark, sfDir, "embeddings")

  test("64-dim fit: eigenvalues descending and variance-complete, " +
      "components orthonormal, score variance == eigenvalue") {
    val model = Pca.fit(emb, "embedding", dim = 64)
    // descending order
    model.eigenvalues.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-12) }
    // trace preservation: Σ eigenvalues == Σ per-coordinate variances
    val trace = model.eigenvalues.sum
    val varRow = emb.select((0 until 64).map(i =>
      var_pop(element_at($"embedding", i + 1).cast("double")).as(s"v$i")): _*).head()
    val varSum = (0 until 64).map(varRow.getDouble).sum
    assert(math.abs(trace - varSum) / varSum < 1e-9)
    // orthonormal components
    for (i <- 0 until 4; j <- 0 until 4) {
      val dot = model.components(i).zip(model.components(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"c$i . c$j = $dot")
    }
    // the projected first component's variance IS the top eigenvalue
    val pc0Var = emb
      .select(var_pop(Pca.principalCol(model, $"embedding", 0)))
      .head().getDouble(0)
    assert(math.abs(pc0Var - model.eigenvalues(0)) / model.eigenvalues(0) < 1e-6)
    // whitening scales that variance to 1
    val whiteVar = emb
      .select(var_pop(Pca.whitenedCol(model, $"embedding", 0)))
      .head().getDouble(0)
    assert(math.abs(whiteVar - 1.0) < 1e-6)
  }

  test("Jacobi matches the independent closed-form 2x2 eigensolution") {
    // an asymmetric-variance correlated matrix with known answers
    val cov = Array(Array(3.0, 1.2), Array(1.2, 1.0))
    val (values, vectors) = graft.sim.Pca.jacobiEigen(cov)
    // closed form: eigenvalues of [[a,b],[b,c]] are
    // (a+c)/2 ± sqrt(((a-c)/2)² + b²)
    val mid = (3.0 + 1.0) / 2
    val rad = math.sqrt(math.pow((3.0 - 1.0) / 2, 2) + 1.2 * 1.2)
    val expect = Seq(mid + rad, mid - rad)
    val got = values.sorted.reverse.toSeq
    expect.zip(got).foreach { case (e, g) => assert(math.abs(e - g) < 1e-12) }
    // major-axis angle: 0.5·atan2(2b, a−c) — the q_embed_pca oracle's
    // formula; the Jacobi eigenvector must agree (modulo sign)
    val th = 0.5 * math.atan2(2 * 1.2, 3.0 - 1.0)
    val majorIdx = values.indexOf(values.max)
    val v = Array(vectors(0)(majorIdx), vectors(1)(majorIdx))
    val dot = math.abs(v(0) * math.cos(th) + v(1) * math.sin(th))
    assert(math.abs(dot - 1.0) < 1e-12, s"major axis off: $dot")
  }

  test("loud contracts: wrong-length vectors, degenerate whitening, bad k") {
    val short = emb.withColumn("v3",
      slice($"embedding".cast("array<double>"), 1, 3))
    val wrong = intercept[Exception] {
      Pca.fit(short, "v3", dim = 64)
    }
    assert(wrong.getMessage.contains("64") ||
      wrong.getCause != null && wrong.getCause.getMessage.contains("64"))
    val model = Pca.fit(emb, "embedding", dim = 64)
    // a synthetic degenerate model: eigenvalue 0 must refuse whitening
    val degenerate = model.copy(eigenvalues = model.eigenvalues.updated(63, 0.0))
    val degen = intercept[IllegalArgumentException] {
      Pca.whitenedCol(degenerate, $"embedding", 63)
    }
    assert(degen.getMessage.contains("degenerate"))
    val badK = intercept[IllegalArgumentException] {
      Pca.fitTransform(emb, "vec_id", "embedding", dim = 64, k = 65)
    }
    assert(badK.getMessage.contains("k"))
  }
}
