package graft

import graft.expr.{MinHashSig, SimHash32, TokenShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions registration — makes graft's native
  * expressions first-class SQL functions, so pure-SQL users (and
  * `spark.sql(...)` pipelines) can call them without the Scala DSL:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   spark.sql("SELECT simhash32(token_shingles(split(text, ' '), 3)) ...")
  *
  * (The Spark-native analog of the reference registering its
  * integration through connector options.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.SizeOfSplitRewrite)
    ext.injectFunction((
      new FunctionIdentifier("token_shingles"),
      new ExpressionInfo(classOf[TokenShingles].getName, "token_shingles"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(toks) => TokenShingles(toks, 3)
        case Seq(toks, n) => TokenShingles(toks, intArg(n, "shingle size"))
        case _ => throw new IllegalArgumentException("token_shingles(tokens[, n])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(sh) => MinHashSig(sh, 32)
        case Seq(sh, n) => MinHashSig(sh, intArg(n, "signature size"))
        case _ => throw new IllegalArgumentException("minhash_sig(shingles[, n])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(toks) => SimHash32(toks)
        case _ => throw new IllegalArgumentException("simhash32(tokens)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.expr.SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(toks) => graft.expr.SimHash64(toks)
        case _ => throw new IllegalArgumentException("simhash64(tokens)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("tokenize"),
      new ExpressionInfo(classOf[graft.expr.Tokenize].getName, "tokenize"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(text) => graft.expr.Tokenize(text)
        case _ => throw new IllegalArgumentException("tokenize(text)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("geohash"),
      new ExpressionInfo(classOf[graft.expr.GeoHash].getName, "geohash"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(lat, lon) => graft.expr.GeoHash(lat, lon, 12)
        case Seq(lat, lon, p) => graft.expr.GeoHash(lat, lon, intArg(p, "geohash precision"))
        case _ => throw new IllegalArgumentException("geohash(lat, lon[, precision])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("damerau_levenshtein"),
      new ExpressionInfo(classOf[graft.expr.DamerauLevenshtein].getName, "damerau_levenshtein"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => graft.expr.DamerauLevenshtein(a, b)
        case _ => throw new IllegalArgumentException("damerau_levenshtein(a, b)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.expr.CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => graft.expr.CosineSim(a, b)
        case _ => throw new IllegalArgumentException("cosine_sim(a, b)")
      }))
  }
}
