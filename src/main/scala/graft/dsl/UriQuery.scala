package graft.dsl

import graft.search.Search
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's OTHER `es.query` format: a Lucene query string
  * (`?q=...`), e.g. `lang:en AND (n_chars:>300 OR source:src1*) AND
  * NOT text:"table scan"`.
  *
  * Supported subset (the operators the URI q= syntax is actually used
  * for): `field:value`, quoted phrases (match_phrase), wildcard values
  * (`*`/`?`), comparison shortcuts (`field:>v`, `>=`, `<`, `<=`),
  * inclusive/exclusive ranges (`field:[a TO b]`, `field:{a TO b}`),
  * `AND` / `OR` / `NOT`, parentheses, and bare terms against a default
  * field (analyzed match, like ES's `default_field`).
  *
  * Compiles to the same Catalyst predicates as the JSON DSL, so the
  * whole thing pushes into the parquet scan.
  */
object UriQuery {

  def compile(q: String, defaultField: String = "text"): Column =
    new Parser(tokenize(q), defaultField).parseExpr()

  // ---- tokenizer ----
  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object AND extends Tok
  private case object OR extends Tok
  private case object NOT extends Tok
  private case class Clause(field: Option[String], value: String, quoted: Boolean) extends Tok

  private def tokenize(q: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    val s = q
    def readQuoted(): String = {
      val sb = new StringBuilder
      i += 1 // opening quote
      while (i < s.length && s(i) != '"') { sb += s(i); i += 1 }
      i += 1 // closing quote
      sb.toString
    }
    def readBare(): String = {
      val sb = new StringBuilder
      while (i < s.length && !" ()".contains(s(i))) {
        if (s(i) == '[' || s(i) == '{') { // range literal: read through the close
          val close = if (s(i) == '[') ']' else '}'
          while (i < s.length && s(i) != close) { sb += s(i); i += 1 }
          if (i < s.length) { sb += s(i); i += 1 }
        } else { sb += s(i); i += 1 }
      }
      sb.toString
    }
    while (i < s.length) {
      s(i) match {
        case ' ' => i += 1
        case '(' => out += LP; i += 1
        case ')' => out += RP; i += 1
        case '"' => out += Clause(None, readQuoted(), quoted = true)
        case _ =>
          val start = i
          val word = readBare()
          word match {
            case "AND" | "&&" => out += AND
            case "OR" | "||" => out += OR
            case "NOT" | "!" => out += NOT
            case w if w.contains(':') =>
              val field = w.substring(0, w.indexOf(':'))
              var rest = w.substring(w.indexOf(':') + 1)
              if (rest.isEmpty && i < s.length && s(i) == '"') {
                out += Clause(Some(field), readQuoted(), quoted = true)
              } else if (rest.startsWith("\"")) {
                // field:"phrase" came through readBare without space
                i = start + field.length + 1
                out += Clause(Some(field), readQuoted(), quoted = true)
              } else {
                out += Clause(Some(field), rest, quoted = false)
              }
            case w => out += Clause(None, w, quoted = false)
          }
      }
    }
    out.toList
  }

  // ---- recursive descent ----
  private class Parser(var toks: List[Tok], defaultField: String) {
    private def peek: Option[Tok] = toks.headOption
    private def next(): Tok = { val t = toks.head; toks = toks.tail; t }

    def parseExpr(): Column = {
      var left = parseAnd()
      while (peek.contains(OR)) { next(); left = left || parseAnd() }
      left
    }

    private def parseAnd(): Column = {
      var left = parseNot()
      while (peek.contains(AND)) { next(); left = left && parseNot() }
      left
    }

    private def parseNot(): Column = peek match {
      case Some(NOT) => next(); !parseNot()
      case _ => parsePrimary()
    }

    private def parsePrimary(): Column = next() match {
      case LP =>
        val e = parseExpr()
        require(peek.contains(RP), "expected )")
        next()
        e
      case Clause(field, value, quoted) => compileClause(field, value, quoted)
      case other => throw new IllegalArgumentException(s"unexpected token $other")
    }

    private val RangePat = """^([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([}\]])$""".r

    private def typed(v: String): Any =
      if (v == "*") v
      else scala.util.Try(v.toLong).toOption
        .orElse(scala.util.Try(v.toDouble).toOption)
        .getOrElse(v)

    private def compileClause(fieldOpt: Option[String], value: String, quoted: Boolean): Column = {
      val field = fieldOpt.getOrElse(defaultField)
      val c = col(field)
      if (quoted) {
        if (fieldOpt.isEmpty || field == defaultField) Search.matchPhrase(c, value)
        else Search.matchPhrase(c, value)
      } else value match {
        case RangePat(lb, lo, hi, rb) =>
          val bounds = Seq.newBuilder[Column]
          if (lo != "*") bounds += (if (lb == "[") c >= lit(typed(lo)) else c > lit(typed(lo)))
          if (hi != "*") bounds += (if (rb == "]") c <= lit(typed(hi)) else c < lit(typed(hi)))
          bounds.result().reduceOption(_ && _).getOrElse(lit(true))
        case v if v.startsWith(">=") => c >= lit(typed(v.drop(2)))
        case v if v.startsWith("<=") => c <= lit(typed(v.drop(2)))
        case v if v.startsWith(">") => c > lit(typed(v.drop(1)))
        case v if v.startsWith("<") => c < lit(typed(v.drop(1)))
        case v if v.contains('*') || v.contains('?') => QueryDsl.wildcard(c, v)
        case v if fieldOpt.isEmpty => Search.matchQuery(c, v)
        case v => QueryDsl.term(c, typed(v))
      }
    }
  }
}
