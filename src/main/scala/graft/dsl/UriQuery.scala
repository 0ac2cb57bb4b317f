package graft.dsl

import graft.analysis.Analyzer
import graft.search.Search
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's OTHER `es.query` format: a Lucene query string
  * (`?q=...`), e.g. `+lang:en -source:src19 text:spak~1 title:fast^2`.
  *
  * Supported surface (the operators the URI q= syntax is actually used
  * for): `field:value`, quoted phrases (match_phrase) with `~N`
  * proximity slop, wildcard values (`*`/`?`), fuzzy suffix (`term~1`,
  * bare `~` = 2 edits), boost suffix (`term^2` — scoring-only, a
  * no-op in filter context; see Search.queryStringTopK for the scored
  * form), comparison shortcuts (`field:>v`, `>=`, `<`, `<=`),
  * inclusive/exclusive ranges (`field:[a TO b]`, `field:{a TO b}`),
  * `AND` / `OR` / `NOT`, Lucene `+` (must) / `-` (must_not) clause
  * modifiers, `default_operator` for bare adjacency, parentheses, and
  * bare terms against a default field (analyzed match, like ES's
  * `default_field`).
  *
  * Modifier semantics follow Lucene: when a level contains `+`/`-`
  * clauses, the `+` clauses are required, `-` prohibited, and plain
  * clauses become optional (scoring-only — no filter effect). Without
  * modifiers, AND binds tighter than OR and bare adjacency joins with
  * `default_operator` (OR unless overridden).
  *
  * Deliberate divergence from Lucene's classic parser: `NOT` negates
  * its clause IN PLACE in the boolean chain (`a OR NOT b` = a || !b,
  * the boolean-algebra reading users expect from AND/OR/NOT syntax),
  * whereas Lucene hoists every NOT to a level-wide MUST_NOT. Users
  * who want the Lucene hoisting write `-b` — both behaviors are
  * available, split by spelling.
  *
  * Compiles to the same Catalyst predicates as the JSON DSL, so the
  * whole thing pushes into the parquet scan.
  */
object UriQuery {

  def compile(
      q: String,
      defaultField: String = "text",
      defaultOperator: String = "or"): Column =
    new Parser(tokenize(q), defaultField,
      defaultOperator.equalsIgnoreCase("and")).parseTop()

  // ---- tokenizer ----
  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object AND extends Tok
  private case object OR extends Tok
  private case object NOT extends Tok
  private case object PLUS extends Tok
  private case object MINUS extends Tok
  private case class Clause(field: Option[String], value: String, quoted: Boolean,
      suffix: String = "") extends Tok

  private def tokenize(q: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    val s = q
    def readQuoted(): String = {
      val sb = new StringBuilder
      i += 1 // opening quote
      while (i < s.length && s(i) != '"') { sb += s(i); i += 1 }
      // a run-to-end "phrase" is a TYPO (missing close quote), not a
      // phrase — Lucene rejects unbalanced quotes and so do we
      require(i < s.length, s"unterminated quote in query: $q")
      i += 1 // closing quote
      sb.toString
    }
    // `~2` / `^1.5` right after a closing quote
    def readSuffix(): String = {
      val sb = new StringBuilder
      while (i < s.length && !" ()".contains(s(i))) { sb += s(i); i += 1 }
      sb.toString
    }
    def readBare(): String = {
      val sb = new StringBuilder
      while (i < s.length && !" ()".contains(s(i))) {
        if (s(i) == '[' || s(i) == '{') { // range literal: read through the close
          val close = if (s(i) == '[') ']' else '}'
          while (i < s.length && s(i) != close) { sb += s(i); i += 1 }
          if (i < s.length) { sb += s(i); i += 1 }
        } else if (s(i) == '/' && (sb.isEmpty || sb.last == ':')) {
          // Lucene regex literal `/re/`: spaces, parens and
          // alternation are LEGAL inside — read through the closing
          // slash or the tokenizer shreds the pattern into nonsense
          // clauses with no error. A regex literal can only OPEN a
          // term (`/re/` or `field:/re/`); a mid-term '/' is plain
          // value text (mime:video/mp4, URL paths) — treating it as
          // an opener would silently swallow the following clauses.
          sb += s(i); i += 1
          while (i < s.length && s(i) != '/') { sb += s(i); i += 1 }
          // run-to-end means a missing close slash, the regex twin of
          // the unterminated-quote contract: fail loudly, don't guess
          require(i < s.length, s"unterminated regex literal in query: $q")
          sb += s(i); i += 1
        } else { sb += s(i); i += 1 }
      }
      sb.toString
    }
    while (i < s.length) {
      s(i) match {
        case ' ' => i += 1
        case '(' => out += LP; i += 1
        case ')' => out += RP; i += 1
        case '+' if i + 1 < s.length && s(i + 1) != ' ' => out += PLUS; i += 1
        case '-' if i + 1 < s.length && s(i + 1) != ' ' => out += MINUS; i += 1
        case '"' => out += Clause(None, readQuoted(), quoted = true, suffix = readSuffix())
        case _ =>
          val start = i
          val word = readBare()
          word match {
            case "AND" | "&&" => out += AND
            case "OR" | "||" => out += OR
            case "NOT" | "!" => out += NOT
            case w if w.contains(':') =>
              val field = w.substring(0, w.indexOf(':'))
              val rest = w.substring(w.indexOf(':') + 1)
              if (rest.isEmpty && i < s.length && s(i) == '"') {
                out += Clause(Some(field), readQuoted(), quoted = true, suffix = readSuffix())
              } else if (rest.startsWith("\"")) {
                // field:"phrase" came through readBare without space
                i = start + field.length + 1
                out += Clause(Some(field), readQuoted(), quoted = true, suffix = readSuffix())
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
  private class Parser(var toks: List[Tok], defaultField: String, defaultAnd: Boolean) {
    private def peek: Option[Tok] = toks.headOption
    private def next(): Tok = { val t = toks.head; toks = toks.tail; t }

    def parseTop(): Column = {
      val c = parseLevel()
      require(toks.isEmpty, s"trailing tokens: $toks")
      c
    }

    /** One parenthesization level: a flat item sequence with explicit
      * (AND/OR) or implicit (default_operator) joiners, local NOT
      * negation, and Lucene +/- modifiers, combined per the rules in
      * the object scaladoc. */
    private def parseLevel(): Column = {
      // (modifier, column, explicit-joiner-before-item)
      val items = scala.collection.mutable.ListBuffer.empty[(Int, Column, Option[Boolean])]
      var pendingJoin: Option[Boolean] = None
      var pendingMod = 0
      var pendingNot = false
      while (peek.isDefined && peek.get != RP) {
        next() match {
          case AND => pendingJoin = Some(true)
          case OR => pendingJoin = Some(false)
          // NOT is a local negation INSIDE the joiner chain (it keeps
          // its position in the AND/OR precedence: `a OR NOT b` is
          // a || !b); only the Lucene `-` modifier prohibits globally.
          case NOT => pendingNot = !pendingNot
          case MINUS => pendingMod = -1
          case PLUS => pendingMod = 1
          case LP =>
            val e0 = parseLevel()
            require(peek.contains(RP), "expected )")
            next()
            val e = if (pendingNot) !e0 else e0
            items += ((pendingMod, e, pendingJoin))
            pendingMod = 0; pendingJoin = None; pendingNot = false
          case c: Clause =>
            val e0 = compileClause(c)
            val e = if (pendingNot) !e0 else e0
            items += ((pendingMod, e, pendingJoin))
            pendingMod = 0; pendingJoin = None; pendingNot = false
          case other => throw new IllegalArgumentException(s"unexpected token $other")
        }
      }
      require(items.nonEmpty, "empty query group")

      val must = items.toList.collect { case (1, c, _) => c }
      val mustNot = items.toList.collect { case (-1, c, _) => c }
      val plain = items.toList.filter(_._1 == 0)
      // plain chain with AND-over-OR precedence; implicit joiner is the
      // default operator
      val plainCol: Option[Column] = plain match {
        case Nil => None
        case head :: tail =>
          var orGroups = List.empty[Column]
          var cur = head._2
          tail.foreach { case (_, c, join) =>
            if (join.getOrElse(defaultAnd)) cur = cur && c
            else { orGroups ::= cur; cur = c }
          }
          Some((cur :: orGroups).reduce(_ || _))
      }
      if (must.isEmpty && mustNot.isEmpty) plainCol.get
      else {
        // Lucene: with required clauses present, plain clauses are
        // optional (scoring-only) and impose no filter
        val pos =
          if (must.nonEmpty) must.reduce(_ && _)
          else plainCol.getOrElse(lit(true))
        mustNot.reduceOption(_ || _).fold(pos)(n => pos && !n)
      }
    }

    private val RangePat = """^([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([}\]])$""".r
    private val BoostPat = """^(.+)\^([0-9]+(?:\.[0-9]+)?)$""".r
    private val FuzzPat = """^(.+?)~([0-9]*)$""".r

    private def typed(v: String): Any =
      if (v == "*") v
      else scala.util.Try(v.toLong).toOption
        .orElse(scala.util.Try(v.toDouble).toOption)
        .getOrElse(v)

    private def compileClause(cl: Clause): Column = {
      val field = cl.field.getOrElse(defaultField)
      val c = col(field)
      if (cl.quoted) {
        // `"a b"~N` = phrase with proximity slop (span_near)
        // `~N`, optionally followed by a scoring-only `^boost`
        // ("a b"~2^3 is legal Lucene order) — the boost strips here,
        // filter semantics unchanged
        val slopPart = cl.suffix.takeWhile(_ != '^')
        val slop = slopPart match {
          case s if s.startsWith("~") && s.drop(1).forall(_.isDigit) =>
            if (s.length == 1) 2 else s.drop(1).toInt
          case _ => 0
        }
        if (slop > 0 && Analyzer.analyze(cl.value).length >= 2)
          Search.matchPhraseSlop(c, cl.value, slop)
        else Search.matchPhrase(c, cl.value)
      } else {
        // `^boost` is scoring-only: strip it, filter semantics unchanged
        val value = cl.value match { case BoostPat(v, _) => v case v => v }
        value match {
          case RangePat(lb, lo, hi, rb) =>
            val bounds = Seq.newBuilder[Column]
            if (lo != "*") bounds += (if (lb == "[") c >= lit(typed(lo)) else c > lit(typed(lo)))
            if (hi != "*") bounds += (if (rb == "]") c <= lit(typed(hi)) else c < lit(typed(hi)))
            bounds.result().reduceOption(_ && _).getOrElse(lit(true))
          case v if v.startsWith(">=") => c >= lit(typed(v.drop(2)))
          case v if v.startsWith("<=") => c <= lit(typed(v.drop(2)))
          case v if v.startsWith(">") => c > lit(typed(v.drop(1)))
          case v if v.startsWith("<") => c < lit(typed(v.drop(1)))
          case v if v.length >= 2 && v.startsWith("/") && v.endsWith("/") =>
            // Lucene regex syntax `/re/` — anchored whole-value match
            // (ES regexp semantics); on the analyzed default field the
            // regex applies per token, like the fuzzy clause below
            val re = v.substring(1, v.length - 1)
            if (cl.field.isEmpty || field == defaultField)
              exists(Analyzer.tokens(c), t => t.rlike("^(?:" + re + ")$"))
            else QueryDsl.regexp(c, re)
          case v if (v.contains('*') || v.contains('?')) &&
              FuzzPat.findFirstIn(v).isDefined =>
            // Lucene forbids combining wildcard and fuzzy on one term;
            // folding `~N` into the wildcard pattern would demand a
            // literal tilde in the data and silently match nothing
            throw new IllegalArgumentException(
              s"cannot combine wildcard and fuzzy (~N) in one term: $v")
          case v if v.contains('*') || v.contains('?') => QueryDsl.wildcard(c, v)
          case FuzzPat(v, n) =>
            val edits = if (n.isEmpty) 2 else n.toInt
            if (cl.field.isEmpty || field == defaultField)
              // fuzzy inside full text: any analyzed token within the
              // edit distance (ES `fuzziness` on a match query)
              exists(Analyzer.tokens(c), t => levenshtein(t, lit(v)) <= edits)
            else QueryDsl.fuzzy(c, v, edits)
          case v if cl.field.isEmpty => Search.matchQuery(c, v)
          case v => QueryDsl.term(c, typed(v))
        }
      }
    }
  }
}
