package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiler for the Painless-expression subset that `script_score`
  * scripts actually use (the reference forwards such scripts verbatim
  * to ES's scripting engine; here they become codegen'd Column math,
  * so a script costs the same as a built-in scoring function).
  *
  * Supported grammar:
  *   - literals: `1`, `2.5`
  *   - refs: `doc['field'].value`, `params.name`, `_score`
  *   - arithmetic: `+ - * / %`, unary minus, parentheses
  *   - ternary: `cond ? a : b` with `< <= > >= == !=` comparisons
  *   - `Math.log/log10/sqrt/abs/exp/floor/ceil/pow/max/min`
  *   - ES script_score helpers: `saturation(v, pivot)` = v/(v+pivot),
  *     `sigmoid(v, k, a)` = v^a/(k^a+v^a)
  *
  * Everything compiles to deterministic double-typed Column
  * expressions inside whole-stage codegen — no UDF, no interpreter
  * at row time.
  */
object Painless {

  def compile(
      src: String,
      params: Map[String, Any] = Map.empty,
      score: Column = lit(1.0)): Column = {
    // `_score * 2;` — a plain expression with a trailing semicolon is
    // valid Painless (the last expression statement is the implicit
    // return); don't let the stray ';' route it to the statement
    // compiler, which would reject it
    val t = src.trim
    val body = if (t.endsWith(";")) t.dropRight(1).trim else t
    if (body.contains(";") || body.startsWith("def "))
      compileScript(src, params, score)
    else new Parser(lex(body, Set.empty), params, score, Map.empty).parseFull()
  }

  /** The statement subset: `def` locals, `for` loops over doc
    * arrays, assignment, `return`.
    *
    * {{{
    * def s = 0.0;
    * for (x in doc['embedding']) { s += x * x }
    * return Math.sqrt(s)
    * }}}
    *
    * `def` binds a compiled sub-expression; a `for` over an array
    * column compiles the whole loop to ONE `aggregate` fold whose
    * lambda is the compiled body (the loop variable and accumulator
    * become the lambda's bound columns). The fold is a Spark HOF —
    * interpreted, not codegen'd — so a scripted loop costs more per
    * row than the expression subset; fine for doc-array sizes
    * (10s-100s of elements), and the honest alternative to rejecting
    * loops outright. Loops must accumulate into exactly one `def`
    * variable; `return` ends the script. */
  private def compileScript(
      src: String, params: Map[String, Any], score: Column): Column = {
    val stmts = splitStmts(src).map(_.trim).filter(_.nonEmpty)
    var env = Map.empty[String, Column]
    def exprC(s0: String, extra: Map[String, Column] = Map.empty): Column =
      new Parser(lex(s0, env.keySet ++ extra.keySet), params, score, env ++ extra)
        .parseFull()
    var ret: Option[Column] = None
    // defs whose initializer is a bare numeric literal also carry a
    // driver-side value, so `while` trip counts can resolve at compile
    // time (see the while case below)
    var litEnv = Map.empty[String, Double]
    val forPat = """(?s)for\s*\(\s*(\w+)\s+in\s+doc\[\s*'([^']+)'\s*\]\s*\)\s*\{(.+)\}""".r
    val accPat = """(?s)\s*(\w+)\s*(\+=|=)\s*(.+)""".r
    val numLit = """\s*-?\d+(?:\.\d+)?\s*""".r
    val whilePat = """(?s)while\s*\(\s*(\w+)\s*(<=|<|>=|>|!=)\s*(-?\d+(?:\.\d+)?)\s*\)\s*\{(.+)\}""".r
    // counter-step forms a while body may apply driver-side
    val stepPat = """\s*(\w+)\s*(?:\+=\s*(-?\d+(?:\.\d+)?)|=\s*\1\s*\+\s*(-?\d+(?:\.\d+)?)|=\s*\1\s*-\s*(-?\d+(?:\.\d+)?))\s*""".r
    stmts.foreach {
      case st if ret.isDefined =>
        throw new IllegalArgumentException(s"statement after return: $st")
      case st if st.startsWith("def ") =>
        val eq = st.indexOf('=')
        require(eq > 0, s"def needs an initializer: $st")
        val name = st.substring(4, eq).trim
        require(name.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad def name: $name")
        val init = st.substring(eq + 1)
        init match {
          case numLit() => litEnv += name -> init.trim.toDouble
          case _ => ()
        }
        env += name -> exprC(init)
      case forPat(v, field, body) =>
        val (accName, op, rhs) = body.trim match {
          case accPat(a, o, r) => (a, o, r)
          case other => throw new IllegalArgumentException(
            s"for body must be one accumulation statement: $other")
        }
        require(env.contains(accName),
          s"loop accumulator '$accName' must be a def-ed local")
        val init = env(accName).cast("double")
        litEnv -= accName
        env += accName -> aggregate(col(field), init, (a, x) => {
          val bodyC = exprC(rhs, Map(accName -> a, v -> x.cast("double")))
          if (op == "+=") a + bodyC else bodyC
        })
      // if (cond) { x = a } [else { x = b }] — both branches assign
      // the SAME def-ed local; compiles to when/otherwise (no else =
      // keep the current value)
      case st if st.matches("(?s)if\\b.*") =>
        val ifPat =
          """(?s)if\s*\((.+?)\)\s*\{(.+?)\}(?:\s*else\s*\{(.+?)\})?\s*""".r
        st match {
          case ifPat(cond, thenB, elseB) =>
            val condC = exprC(cond)
            val (name, thenC) = thenB.trim match {
              case accPat(n, o, r) =>
                require(env.contains(n), s"if-branch target '$n' must be a def-ed local")
                (n, if (o == "+=") env(n) + exprC(r) else exprC(r))
              case other => throw new IllegalArgumentException(
                s"if branch must be one assignment: $other")
            }
            val elseC = Option(elseB).map(_.trim) match {
              case Some(accPat(n2, o2, r2)) =>
                require(n2 == name, s"if/else branches must assign the same local ($name vs $n2)")
                if (o2 == "+=") env(name) + exprC(r2) else exprC(r2)
              case Some(other) => throw new IllegalArgumentException(
                s"else branch must be one assignment: $other")
              case None => env(name)
            }
            litEnv -= name
            env += name -> when(condC =!= 0.0, thenC).otherwise(elseC)
          case other => throw new IllegalArgumentException(s"unsupported if statement: $other")
        }
      // while (i < N) { ... } — Catalyst's expression algebra has no
      // recursion, so only DATA-INDEPENDENT trip counts compile: the
      // condition variable must be a literal-initialized def stepped by
      // a literal inside the body. The loop then UNROLLS at compile
      // time — each iteration rebinds the column-valued locals in
      // statement order, exactly like Painless's own interpreter, and
      // the unrolled expression stays inside whole-stage codegen.
      // Data-dependent conditions (doc values / params in the test)
      // are rejected with a clear error rather than silently mis-run.
      case whilePat(cv, cop, climRaw, body) =>
        require(litEnv.contains(cv),
          s"while condition variable '$cv' must be a def with a literal initializer " +
            "(data-dependent trip counts cannot compile to a static plan)")
        val clim = climRaw.toDouble
        def cvVal: Double = litEnv.getOrElse(cv,
          throw new IllegalArgumentException(
            s"while condition variable '$cv' was reassigned non-literally " +
              "inside the body — the trip count became data-dependent, " +
              "which cannot compile to a static plan"))
        def holds: Boolean = cop match {
          case "<" => cvVal < clim
          case "<=" => cvVal <= clim
          case ">" => cvVal > clim
          case ">=" => cvVal >= clim
          case "!=" => cvVal != clim
        }
        val bodyStmts = splitStmts(body).map(_.trim).filter(_.nonEmpty)
        var guard = 0
        while (holds) {
          guard += 1
          require(guard <= 1000, "while loop exceeds 1000 unrolled iterations")
          bodyStmts.foreach {
            case stepPat(v, s1, s2, s3) if v == cv || litEnv.contains(v) =>
              val step = Option(s1).orElse(Option(s2)).map(_.toDouble)
                .getOrElse(-s3.toDouble)
              litEnv += v -> (litEnv(v) + step)
              env += v -> lit(litEnv(v))
            case accPat(name, op, rhs) if env.contains(name) =>
              litEnv -= name // now column-valued; no longer a driver literal
              env += name -> (if (op == "+=") env(name) + exprC(rhs) else exprC(rhs))
            case other => throw new IllegalArgumentException(
              s"unsupported while-body statement: $other")
          }
        }
      // \b word boundary: a local named "returnx"/"ifx" must not be
      // mis-routed into the keyword branches (silently returning the
      // wrong local, or throwing "unsupported if")
      case st if st.matches("(?s)return\\b.*") =>
        ret = Some(exprC(st.stripPrefix("return")))
      case accPat(name, "=", rhs) if env.contains(name) =>
        litEnv -= name
        env += name -> exprC(rhs)
      // top-level compound assignment, same spelling the for/if/while
      // bodies already accept
      case accPat(name, "+=", rhs) if env.contains(name) =>
        litEnv -= name
        env += name -> (env(name) + exprC(rhs))
      case other => throw new IllegalArgumentException(s"unsupported statement: $other")
    }
    ret.getOrElse(throw new IllegalArgumentException("script needs a return statement"))
  }

  /** Split on `;` outside parens/braces/quotes; a `for (...) {...}`
    * block counts as one statement even without a trailing `;`. */
  private def splitStmts(src: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    var i = 0
    while (i < src.length) {
      val c = src.charAt(i)
      if (inStr) { cur += c; if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true; cur += c
        case '(' | '{' | '[' => depth += 1; cur += c
        case '}' =>
          depth -= 1; cur += c
          // a closed top-level block ends its statement — unless an
          // `else` continues it
          if (depth == 0 &&
              !src.substring(i + 1).dropWhile(_.isWhitespace).startsWith("else")) {
            out += cur.result(); cur.clear()
          }
        case ')' | ']' => depth -= 1; cur += c
        case ';' if depth == 0 => out += cur.result(); cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.result()
    out.toList
  }

  // ---- lexer ----------------------------------------------------------

  private sealed trait Tok
  private final case class Num(v: Double) extends Tok
  private final case class Str(s: String) extends Tok
  private final case class DocRef(field: String) extends Tok
  private final case class ParamRef(name: String) extends Tok
  private case object ScoreRef extends Tok
  private final case class Fn(name: String) extends Tok
  private final case class Ident(name: String) extends Tok
  private final case class Op(s: String) extends Tok
  private case object Open extends Tok
  private case object Close extends Tok
  private case object Comma extends Tok

  private val docPat = """doc\[\s*'([^']+)'\s*\]\s*\.\s*value""".r
  private val fnNames = Set(
    "Math.log", "Math.log10", "Math.sqrt", "Math.abs", "Math.exp",
    "Math.floor", "Math.ceil", "Math.pow", "Math.max", "Math.min",
    "saturation", "sigmoid",
    "cosineSimilarity", "dotProduct", "l2norm")

  private def lex(src: String, idents: Set[String]): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < n && src.charAt(i + 1).isDigit)) {
        val j = src.indexWhere(ch => !(ch.isDigit || ch == '.'), i)
        val end = if (j < 0) n else j
        out += Num(src.substring(i, end).toDouble); i = end
      } else if (src.startsWith("doc[", i)) {
        docPat.findPrefixMatchOf(src.substring(i)) match {
          case Some(m) => out += DocRef(m.group(1)); i += m.end
          case None => throw new IllegalArgumentException(
            s"malformed doc[...] ref at offset $i in: $src")
        }
      } else if (src.startsWith("params.", i)) {
        val start = i + "params.".length
        val j = src.indexWhere(ch => !(ch.isLetterOrDigit || ch == '_'), start)
        val end = if (j < 0) n else j
        out += ParamRef(src.substring(start, end)); i = end
      } else if (src.startsWith("_score", i) &&
          (i + 6 >= n || !(src.charAt(i + 6).isLetterOrDigit || src.charAt(i + 6) == '_'))) {
        out += ScoreRef; i += "_score".length
      } else if (c == '\'') {
        // '...' string literal — the field-name argument of the vector
        // functions (cosineSimilarity(params.qv, 'embedding'))
        val j = src.indexOf('\'', i + 1)
        require(j > 0, s"unterminated string at offset $i in: $src")
        out += Str(src.substring(i + 1, j)); i = j + 1
      } else if (c.isLetter || c == '_') {
        // leading underscore: def-name validation accepts _x, so the
        // lexer must read it back (it previously fell to the operator
        // match and threw "unexpected character")
        val j = src.indexWhere(ch => !(ch.isLetterOrDigit || ch == '.' || ch == '_'), i)
        val end = if (j < 0) n else j
        val word = src.substring(i, end)
        if (fnNames.contains(word)) out += Fn(word)
        else if (idents.contains(word)) out += Ident(word)
        else throw new IllegalArgumentException(
          s"unsupported identifier '$word' in script: $src")
        i = end
      } else c match {
        case '(' => out += Open; i += 1
        case ')' => out += Close; i += 1
        case ',' => out += Comma; i += 1
        case '<' | '>' | '=' | '!' if i + 1 < n && src.charAt(i + 1) == '=' =>
          out += Op(s"$c="); i += 2
        case '<' | '>' | '+' | '-' | '*' | '/' | '%' | '?' | ':' =>
          out += Op(c.toString); i += 1
        case other => throw new IllegalArgumentException(
          s"unexpected character '$other' in script: $src")
      }
    }
    out.toList
  }

  // ---- parser ---------------------------------------------------------

  private final class Parser(
      var toks: List[Tok], params: Map[String, Any], score: Column,
      env: Map[String, Column]) {

    def parseFull(): Column = {
      val c = parseTernary()
      require(toks.isEmpty, s"trailing tokens in script: $toks")
      c
    }

    private def peek: Option[Tok] = toks.headOption
    private def next(): Tok = {
      require(toks.nonEmpty, "unexpected end of script")
      val h = toks.head; toks = toks.tail; h
    }
    private def expect(t: Tok): Unit = {
      val h = next()
      require(h == t, s"expected $t, got $h")
    }

    private def parseTernary(): Column = {
      val cond = parseComparison()
      peek match {
        case Some(Op("?")) =>
          next()
          val a = parseTernary()
          expect(Op(":"))
          val b = parseTernary()
          when(cond =!= 0.0, a).otherwise(b)
        case _ => cond
      }
    }

    // comparisons produce 1.0 / 0.0 so they compose with arithmetic
    // (and feed the ternary's cond =!= 0 test)
    private def parseComparison(): Column = {
      val left = parseAddSub()
      peek match {
        case Some(Op(op @ ("<" | "<=" | ">" | ">=" | "==" | "!="))) =>
          next()
          val right = parseAddSub()
          val b = op match {
            case "<" => left < right
            case "<=" => left <= right
            case ">" => left > right
            case ">=" => left >= right
            case "==" => left === right
            case "!=" => left =!= right
          }
          when(b, 1.0).otherwise(0.0)
        case _ => left
      }
    }

    private def parseAddSub(): Column = {
      var acc = parseMulDiv()
      var done = false
      while (!done) peek match {
        case Some(Op("+")) => next(); acc = acc + parseMulDiv()
        case Some(Op("-")) => next(); acc = acc - parseMulDiv()
        case _ => done = true
      }
      acc
    }

    private def parseMulDiv(): Column = {
      var acc = parseUnary()
      var done = false
      while (!done) peek match {
        case Some(Op("*")) => next(); acc = acc * parseUnary()
        case Some(Op("/")) => next(); acc = acc / parseUnary()
        case Some(Op("%")) => next(); acc = acc % parseUnary()
        case _ => done = true
      }
      acc
    }

    private def parseUnary(): Column = peek match {
      case Some(Op("-")) => next(); -parseUnary()
      case _ => parsePrimary()
    }

    private def parsePrimary(): Column = next() match {
      case Num(v) => lit(v)
      case Ident(n) => env.getOrElse(n,
        throw new IllegalArgumentException(s"unbound local '$n'"))
      case DocRef(f) => col(f).cast("double")
      case ParamRef(p) => params.getOrElse(p,
        throw new IllegalArgumentException(s"missing param '$p'")) match {
        // a Column param binds the reference to caller-provided frame
        // math — how bucket_script/bucket_selector alias their
        // buckets_path entries onto the compiled bucket frame
        case c: Column => c
        case n: Number => lit(n.doubleValue())
        // vector param (the query_vector of the vector functions)
        case s: Seq[_] => typedLit(s.map {
          case n: Number => n.doubleValue()
          case other => throw new IllegalArgumentException(
            s"param '$p' has a non-numeric element: $other")
        })
        case other => throw new IllegalArgumentException(
          s"param '$p' is not numeric: $other")
      }
      case ScoreRef => score
      case Open =>
        val c = parseTernary(); expect(Close); c
      // vector functions take (params.query_vector, 'field') — the
      // field is a STRING naming a dense-vector column, parsed
      // structurally rather than as an expression
      case Fn(name @ ("cosineSimilarity" | "dotProduct" | "l2norm")) =>
        expect(Open)
        val qv = parseTernary()
        expect(Comma)
        val field = next() match {
          case Str(s) => s
          case other => throw new IllegalArgumentException(
            s"$name needs a 'field' string as its second arg, got $other")
        }
        expect(Close)
        vectorFn(name, qv, field)
      case Fn(name) =>
        expect(Open)
        val args = scala.collection.mutable.ListBuffer(parseTernary())
        while (peek.contains(Comma)) { next(); args += parseTernary() }
        expect(Close)
        fn(name, args.toList)
      case other => throw new IllegalArgumentException(s"unexpected token: $other")
    }

    /** ES script_score dense-vector functions: the stored vector
      * column is float[] (cast element-wise); the query side is the
      * typedLit double array a Seq param produced. All three are
      * compiled one-pass kernels (HashKernels), same codegen class as
      * the ANN operators. */
    private def vectorFn(name: String, qv: Column, field: String): Column = {
      import org.apache.spark.sql.GraftBridge.{column => gcol, expression => gexpr}
      // float[] storage casts to double[] via the kernels'
      // ImplicitCastInputTypes — one codegen'd Cast, not a per-element
      // transform() HOF (those run interpreted)
      val v = col(field)
      name match {
        case "cosineSimilarity" => graft.dedup.Vectors.cosine(v, qv)
        case "dotProduct" => gcol(graft.expr.DotProductSim(gexpr(v), gexpr(qv)))
        case "l2norm" => gcol(graft.expr.L2Norm(gexpr(v), gexpr(qv)))
      }
    }

    private def fn(name: String, args: List[Column]): Column = (name, args) match {
      case ("Math.log", a :: Nil) => log(a)
      case ("Math.log10", a :: Nil) => log10(a)
      case ("Math.sqrt", a :: Nil) => sqrt(a)
      case ("Math.abs", a :: Nil) => abs(a)
      case ("Math.exp", a :: Nil) => exp(a)
      case ("Math.floor", a :: Nil) => floor(a).cast("double")
      case ("Math.ceil", a :: Nil) => ceil(a).cast("double")
      case ("Math.pow", a :: b :: Nil) => pow(a, b)
      case ("Math.max", a :: b :: Nil) => greatest(a, b)
      case ("Math.min", a :: b :: Nil) => least(a, b)
      // ES script_score rank-feature helpers
      case ("saturation", v :: pivot :: Nil) => v / (v + pivot)
      case ("sigmoid", v :: k :: a :: Nil) =>
        pow(v, a) / (pow(k, a) + pow(v, a))
      case _ => throw new IllegalArgumentException(
        s"bad arity for $name: ${args.size} args")
    }
  }
}
