package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled analysis-chain kernel: ES token filters (stop, stemmer,
  * edge_ngram) applied to an already-tokenized array in ONE compiled
  * pass per row — the same design rationale as Tokenize
  * (HashExprs.scala): the HOF formulation
  * (`filter` -> `transform` -> `flatten`) is CodegenFallback,
  * interpreted per lambda step; this participates in whole-stage
  * codegen via a static call.
  *
  * Filter order follows the common ES analyzer layout:
  * stop filter first, then stemmer, then edge_ngram expansion
  * (each stage optional). Tokens never shuffle — the chain is a
  * narrow per-row transform wherever the plain tokenizer is.
  */
object AnalysisKernels {

  /** stemCode: 0 = none, 1 = minimal_english, 2 = porter,
    * 3 = light_german, 4 = minimal_french, 5 = light_spanish. */
  def chainKernel(
      arr: ArrayData,
      stop: java.util.HashSet[UTF8String],
      stemCode: Int,
      edgeMin: Int,
      edgeMax: Int): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      if (stop == null || !stop.contains(tok)) {
        val stemmed: UTF8String =
          if (stemCode == 0) tok
          else {
            val s = tok.toString
            val r = stemCode match {
              case 1 => graft.analysis.Stemmers.minimalEnglish(s)
              case 2 => graft.analysis.Stemmers.porter(s)
              case 3 => graft.analysis.Stemmers.lightGerman(s)
              case 4 => graft.analysis.Stemmers.minimalFrench(s)
              case 5 => graft.analysis.Stemmers.lightSpanish(s)
            }
            if (r eq s) tok else UTF8String.fromString(r)
          }
        if (edgeMax <= 0) out.add(stemmed)
        else {
          // edge_ngram: prefixes of byte-length edgeMin..min(len, edgeMax);
          // tokens shorter than edgeMin emit nothing (Lucene default).
          // The token alphabet is [a-z0-9] (one byte per char), so byte
          // slicing == character slicing.
          val len = stemmed.numBytes()
          var l = edgeMin
          while (l <= len && l <= edgeMax) {
            out.add(stemmed.substring(0, l))
            l += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** array<string> tokens -> analyzed tokens through the (stop, stemmer,
  * edge_ngram) chain. Config is plan-time constant; the stop set is a
  * shared reference object, so codegen passes a single HashSet
  * reference into the static kernel. */
case class AnalyzeChain(
    child: Expression,
    stop: Seq[String],
    stemmer: String, // "" | "minimal_english" | "porter"
    edgeMin: Int,
    edgeMax: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(Set("", "minimal_english", "porter", "light_german",
    "minimal_french", "light_spanish").contains(stemmer),
    s"unknown stemmer: $stemmer")
  require(edgeMax <= 0 || (edgeMin >= 1 && edgeMin <= edgeMax),
    s"bad edge_ngram bounds: $edgeMin..$edgeMax")

  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "analyze_chain"

  private def stemCode: Int = stemmer match {
    case "" => 0
    case "minimal_english" => 1
    case "porter" => 2
    case "light_german" => 3
    case "minimal_french" => 4
    case "light_spanish" => 5
  }

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] =
    if (stop.isEmpty) null
    else {
      val s = new java.util.HashSet[UTF8String](stop.size * 2)
      stop.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }

  override def nullSafeEval(input: Any): Any =
    AnalysisKernels.chainKernel(
      input.asInstanceOf[ArrayData], stopSet, stemCode, edgeMin, edgeMax)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopRef =
      if (stopSet == null) "null"
      else ctx.addReferenceObj("stop", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.AnalysisKernels.chainKernel(" +
        s"$c, $stopRef, $stemCode, $edgeMin, $edgeMax);")
  }

  override protected def withNewChildInternal(newChild: Expression): AnalyzeChain =
    copy(child = newChild)
}
