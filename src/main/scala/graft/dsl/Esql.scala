package graft.dsl

import graft.util.Num
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A compiler for the piped query language the reference ecosystem
  * ships as ES|QL — `FROM idx | WHERE ... | STATS ... BY ... | SORT
  * ... | LIMIT n` — onto DataFrame transforms, so every pipe stage
  * lands in the same Catalyst plan (WHERE pushes to the scan, STATS
  * partial-aggregates, SORT+LIMIT fuses to TakeOrderedAndProject).
  *
  * Supported commands: FROM, ROW, WHERE, EVAL, STATS..BY, SORT,
  * LIMIT, KEEP, DROP, RENAME, MV_EXPAND, SAMPLE, DISSECT, GROK,
  * INLINESTATS, LOOKUP, ENRICH, CHANGE_POINT.
  * Expressions: arithmetic, comparisons (`==`, `!=`,
  * `>=`, ...), AND/OR/NOT, LIKE/RLIKE, parentheses, `IS [NOT] NULL`,
  * functions (ROUND/ABS/LENGTH/TO_LOWER/TO_UPPER/SUBSTRING/CONCAT/
  * COALESCE/STARTS_WITH), full-text search functions (MATCH/QSTR/KQL,
  * the 8.17 WHERE-clause surface), aggregates (COUNT(*)/COUNT/SUM/
  * AVG/MIN/MAX/COUNT_DISTINCT/MEDIAN/PERCENTILE).
  *
  * The pipe layout makes compilation deliberately simple: split on
  * top-level `|` (quote-aware), dispatch each segment on its leading
  * keyword, fold over the frame. No optimizer work is done here —
  * stage fusion is Catalyst's job and happens after assembly.
  */
object Esql {

  // ---- tokenizer ---------------------------------------------------

  private sealed trait Tok
  private final case class TId(s: String) extends Tok
  // `exact` carries the integer literal's full 64-bit value: the
  // Double round-trip loses precision above 2^53, which is fatal in
  // this engine's epoch-NANOSECOND timestamp domain
  private final case class TNum(v: Double, isInt: Boolean, exact: Long = 0L) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TOp(s: String) extends Tok

  /** `knn(field, [v, ...], k)` as the whole WHERE body. */
  private val KnnWhere =
    """(?is)^knn\(\s*([A-Za-z_][\w.]*)\s*,\s*\[([^\]]*)\]\s*,\s*(\d+)\s*\)$""".r

  /** "POLYGON((lon lat, lon lat, ...))" -> (lat, lon) vertices; the
    * closing duplicate vertex (WKT rings repeat the first point) is
    * dropped — geoPolygon closes the ring itself. */
  private[dsl] def parseWktPolygon(wkt: String): Seq[(Double, Double)] = {
    val m = """(?is)^\s*POLYGON\s*\(\(\s*(.+?)\s*\)\)\s*$""".r.findFirstMatchIn(wkt)
      .getOrElse(throw new IllegalArgumentException(
        s"expected a WKT POLYGON (point-vs-polygon is the supported class), got: $wkt"))
    val pts = m.group(1).split(",").map(_.trim).map { p =>
      val xy = p.split("\\s+")
      require(xy.length == 2, s"bad WKT vertex '$p'")
      (xy(1).toDouble, xy(0).toDouble) // WKT order is lon lat
    }.toSeq
    if (pts.length >= 2 && pts.head == pts.last) pts.dropRight(1) else pts
  }

  private def lex(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    val ops2 = Set("==", "!=", ">=", "<=")
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '"') {
        val e = s.indexOf('"', i + 1)
        require(e >= 0, s"unterminated string in: $s")
        out += TStr(s.substring(i + 1, e)); i = e + 1
      } else if (c.isDigit || (c == '.' && i + 1 < s.length && s.charAt(i + 1).isDigit)) {
        val start = i
        while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        val raw = s.substring(start, i)
        val isInt = !raw.contains('.')
        val exact = if (isInt) (try raw.toLong catch { case _: NumberFormatException => raw.toDouble.toLong }) else 0L
        out += TNum(raw.toDouble, isInt, exact)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        out += TId(s.substring(start, i))
      } else if (i + 1 < s.length && ops2.contains(s.substring(i, i + 2))) {
        out += TOp(s.substring(i, i + 2)); i += 2
      } else { out += TOp(c.toString); i += 1 }
    }
    out.toList
  }

  // ---- expression parser (recursive descent over the token list) ---

  private final class P(var toks: List[Tok]) {
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = { val h = toks.head; toks = toks.tail; h }
    def expectOp(op: String): Unit = next() match {
      case TOp(`op`) => ()
      case other => throw new IllegalArgumentException(s"expected '$op', got $other")
    }
    def isKw(kw: String): Boolean = peek match {
      case Some(TId(s)) => s.equalsIgnoreCase(kw)
      case _ => false
    }

    def parseExpr(): Column = parseOr()

    /** parseExpr + a LOUD leftover-token check: "a == 1 b == 2" (a
      * forgotten AND) must error, not silently drop "b == 2". */
    def parseExprAll(): Column = {
      val e = parseOr()
      require(toks.isEmpty, s"trailing tokens after expression: $toks")
      e
    }

    private def parseOr(): Column = {
      var e = parseAnd()
      while (isKw("or")) { next(); e = e || parseAnd() }
      e
    }
    private def parseAnd(): Column = {
      var e = parseNot()
      while (isKw("and")) { next(); e = e && parseNot() }
      e
    }
    private def parseNot(): Column =
      if (isKw("not")) { next(); !parseNot() } else parseCmp()

    private def parseCmp(): Column = {
      val l = parseAdd()
      peek match {
        case Some(TOp("==")) => next(); l === parseAdd()
        case Some(TOp("!=")) => next(); l =!= parseAdd()
        case Some(TOp(">=")) => next(); l >= parseAdd()
        case Some(TOp("<=")) => next(); l <= parseAdd()
        case Some(TOp(">")) => next(); l > parseAdd()
        case Some(TOp("<")) => next(); l < parseAdd()
        case Some(TId(k)) if k.equalsIgnoreCase("like") =>
          // ES|QL LIKE wildcards are * and ? (Lucene style), NOT SQL's
          // % and _ — translate, escaping literal SQL metachars
          next(); l.like(str(next()).flatMap {
            case '*' => "%"
            case '?' => "_"
            case '%' => "\\%"
            case '_' => "\\_"
            case c => c.toString
          })
        case Some(TId(k)) if k.equalsIgnoreCase("rlike") =>
          next(); l.rlike(str(next()))
        case Some(TId(k)) if k.equalsIgnoreCase("is") =>
          next()
          if (isKw("not")) { next(); require(isKw("null")); next(); l.isNotNull }
          else { require(isKw("null")); next(); l.isNull }
        case Some(TId(k)) if k.equalsIgnoreCase("in") =>
          next(); inList(l)
        case Some(TId(k)) if k.equalsIgnoreCase("not") =>
          // postfix negated membership/pattern: x NOT IN (...), NOT LIKE,
          // NOT RLIKE — prefix NOT is handled by the boolean layer above
          next()
          peek match {
            case Some(TId(k2)) if k2.equalsIgnoreCase("in") =>
              next(); !inList(l)
            case Some(TId(k2)) if k2.equalsIgnoreCase("like") =>
              next(); !l.like(str(next()))
            case Some(TId(k2)) if k2.equalsIgnoreCase("rlike") =>
              next(); !l.rlike(str(next()))
            case other => throw new IllegalArgumentException(
              s"expected IN/LIKE/RLIKE after NOT, got $other")
          }
        case _ => l
      }
    }

    private def inList(l: Column): Column = {
      expectOp("(")
      val vals = scala.collection.mutable.ListBuffer(parseAdd())
      while (peek.contains(TOp(","))) { next(); vals += parseAdd() }
      expectOp(")")
      vals.map(l === _).reduce(_ || _)
    }
    private def str(t: Tok): String = t match {
      case TStr(s) => s
      case other => throw new IllegalArgumentException(s"expected string, got $other")
    }

    private def parseAdd(): Column = {
      var e = parseMul()
      var go = true
      while (go) peek match {
        case Some(TOp("+")) => next(); e = e + parseMul()
        case Some(TOp("-")) => next(); e = e - parseMul()
        case _ => go = false
      }
      e
    }
    private def parseMul(): Column = {
      var e = parseUnary()
      var go = true
      while (go) peek match {
        case Some(TOp("*")) => next(); e = e * parseUnary()
        case Some(TOp("/")) => next(); e = e / parseUnary()
        case Some(TOp("%")) => next(); e = e % parseUnary()
        case _ => go = false
      }
      e
    }
    private def parseUnary(): Column = peek match {
      case Some(TOp("-")) => next(); lit(0) - parseUnary()
      case _ => parsePrimary()
    }

    private def parseArgs(): Seq[Column] = {
      expectOp("(")
      if (peek.contains(TOp(")"))) { next(); return Nil }
      val args = scala.collection.mutable.ListBuffer(parseExpr())
      while (peek.contains(TOp(","))) { next(); args += parseExpr() }
      expectOp(")")
      args.toSeq
    }

    /** A function argument that must be a literal string (format
      * patterns, unit names — they select the expression shape). */
    /** (wkt, point) for the symmetric spatial predicates: whichever
      * argument is the literal is the shape. */
    private def stShapePoint(a: Column, b: Column, what: String): (String, Column) =
      org.apache.spark.sql.GraftBridge.literalValue(a) match {
        case Some(w) => (String.valueOf(w), b)
        case None => (litStr(b, s"$what shape"), a)
      }

    private def litStr(c: Column, what: String): String =
      org.apache.spark.sql.GraftBridge.literalValue(c) match {
        case Some(v) => String.valueOf(v)
        case None => throw new IllegalArgumentException(s"$what must be a literal: $c")
      }

    /** Exact integral division of a long column. Column./ is DOUBLE
      * division, and an epoch-ns DIVIDEND already exceeds double's
      * exact-integer range (2^53) — the rounding error can shift the
      * quotient by one unit at representation boundaries. Catalyst's
      * IntegralDivide is the SQL `div` operator: exact long division
      * in codegen (truncating, which equals floor on the positive
      * event-time domain). */
    private def longDiv(x: Column, n: Long): Column = {
      import org.apache.spark.sql.GraftBridge
      GraftBridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        GraftBridge.expression(x.cast("long")), GraftBridge.expression(lit(n))))
    }

    /** ns-long event time (graft's ES|QL date type) → µs timestamp for
      * Spark's calendar functions. Truncating ns→µs never crosses a
      * calendar-unit boundary for real event data. */
    private def nsToTs(x: Column): Column = timestamp_micros(longDiv(x.cast("long"), 1000L))

    private val unitNs = Map(
      "second" -> 1000000000L, "minute" -> 60L * 1000000000L,
      "hour" -> 3600L * 1000000000L, "day" -> 86400L * 1000000000L)

    /** MV_MEDIAN's fold (shared with MAD): sorted middle, even counts
      * average the two middles. */
    private def mvMedian(x: Column): Column = {
      val sorted = sort_array(x)
      val n = size(x)
      // Column./ is double division — truncate back to the index
      val loIdx = ((n + lit(1)) / lit(2)).cast("int")
      val lo = element_at(sorted, loIdx).cast("double")
      val hi = element_at(sorted, loIdx + pmod(n + lit(1), lit(2)).cast("int"))
        .cast("double")
      (lo + hi) / 2.0
    }

    private def fn(name: String, args: Seq[Column]): Column =
      (name.toLowerCase, args) match {
        case ("round", Seq(x)) => Num.round(x, 0)
        case ("abs", Seq(x)) => abs(x)
        // DATE_EXTRACT("part", ts_ns) — calendar field as a long
        case ("date_extract", Seq(part, x)) =>
          val t = nsToTs(x)
          (litStr(part, "DATE_EXTRACT part").toLowerCase match {
            case "year" => year(t)
            case "month" => month(t)
            case "day_of_month" | "day" => dayofmonth(t)
            case "day_of_week" => dayofweek(t)
            case "hour" => hour(t)
            case "minute" => minute(t)
            case "second" => second(t)
            case other => throw new IllegalArgumentException(s"unknown DATE_EXTRACT part: $other")
          }).cast("long")
        // DATE_FORMAT("pattern", ts_ns) — Java datetime pattern
        case ("date_format", Seq(fmt, x)) =>
          date_format(nsToTs(x), litStr(fmt, "DATE_FORMAT pattern"))
        // DATE_DIFF("unit", from, to) — exact ns integer math
        case ("date_diff", Seq(unit, a, b)) =>
          val u = litStr(unit, "DATE_DIFF unit").toLowerCase
          val ns = unitNs.getOrElse(u,
            throw new IllegalArgumentException(s"unknown DATE_DIFF unit: $u"))
          longDiv(b.cast("long") - a.cast("long"), ns)
        // DATE_PARSE("pattern", str) — back to the ns-long domain
        case ("date_parse", Seq(fmt, x)) =>
          unix_micros(to_timestamp(x, litStr(fmt, "DATE_PARSE pattern"))) * lit(1000L)
        // CASE(cond1, val1, cond2, val2, ..., default?) — ES|QL allows
        // omitting the default, which is then null
        case ("case", xs) if xs.size >= 2 =>
          val (pairs, default) =
            if (xs.size % 2 == 1) (xs.dropRight(1), xs.last)
            else (xs, lit(null))
          pairs.grouped(2).toSeq.foldRight(default) {
            case (Seq(c, v), acc) => when(c, v).otherwise(acc)
          }
        case ("length", Seq(x)) => length(x)
        case ("to_lower", Seq(x)) => lower(x)
        case ("to_upper", Seq(x)) => upper(x)
        // IP family over dotted-quad strings (the graft `ip` model —
        // SURVEY §3): TO_IP normalizes/validates, CIDR_MATCH is one
        // numeric range predicate per block (codegen'd, pushdown-safe)
        case ("to_ip", Seq(x)) =>
          when(x.rlike("^([0-9]{1,3}\\.){3}[0-9]{1,3}$"), x)
        case ("cidr_match", x +: blocks) if blocks.nonEmpty =>
          // r18: compiled one-parse kernel. The r17 column form
          // (`ipValue(x) >= net && < net+block` OR-folded) re-evaluated
          // the split/cast chain — with x's derived-ip expression
          // substituted INTO it by predicate pushdown — once per octet
          // per bound: 16 evaluations/row for a 2-block match, the
          // whole cost of q_esql_cidr's scan stage (guide §1.2 "per-
          // task work"). Same numeric-range semantics, one byte scan.
          val ranges = blocks.map { b =>
            // each block arg is a 'a.b.c.d/n' string literal column;
            // extract the literal at compile time
            val lit = org.apache.spark.sql.GraftBridge.literalValue(b) match {
              case Some(v) => v.toString
              case None => throw new IllegalArgumentException(
                s"cidr_match blocks must be string literals, got: $b")
            }
            val Array(base, bits) = lit.split("/")
            val o = base.split("\\.").map(_.toLong)
            require(o.length == 4 && bits.toInt >= 0 && bits.toInt <= 32,
              s"bad CIDR block: $lit")
            val ipn = o(0) * 16777216L + o(1) * 65536L + o(2) * 256L + o(3)
            val block = 1L << (32 - bits.toInt)
            (ipn / block * block, block)
          }
          org.apache.spark.sql.GraftBridge.column(graft.expr.IpInRanges(
            org.apache.spark.sql.GraftBridge.expression(x),
            ranges.map(_._1), ranges.map(_._2)))
        case ("substring", Seq(x, a, b)) => x.substr(a, b)
        case ("concat", xs) => concat(xs: _*)
        case ("coalesce", xs) => coalesce(xs: _*)
        case ("starts_with", Seq(x, p)) => x.startsWith(p)
        case ("ends_with", Seq(x, p)) => x.endsWith(p)
        case ("floor", Seq(x)) => floor(x)
        case ("ceil", Seq(x)) => ceil(x)
        case ("sqrt", Seq(x)) => sqrt(x)
        case ("pow", Seq(x, p)) => pow(x, p)
        case ("log10", Seq(x)) => log10(x)
        case ("log", Seq(x)) => log(x) // natural log, like ES|QL LOG(x)
        case ("exp", Seq(x)) => exp(x)
        case ("greatest", xs) if xs.size >= 2 => greatest(xs: _*)
        case ("least", xs) if xs.size >= 2 => least(xs: _*)
        case ("trim", Seq(x)) => trim(x)
        case ("ltrim", Seq(x)) => ltrim(x)
        case ("rtrim", Seq(x)) => rtrim(x)
        case ("left", Seq(x, n)) => x.substr(lit(1), n)
        case ("replace", Seq(x, pat, rep)) => regexp_replace(x, pat, rep)
        // multivalue family: ES|QL fields can hold arrays (here:
        // SPLIT output); these fold them back to scalars
        // count-shaped MV_COUNT(SPLIT(...)) rewrites to allocation-free
        // string math in the optimizer (plans.SizeOfSplitRewrite) — at
        // Column level split is still an unresolved function node, so
        // the rewrite can't happen here
        case ("mv_count", Seq(x)) => size(x)
        case ("mv_min", Seq(x)) => array_min(x)
        case ("mv_max", Seq(x)) => array_max(x)
        case ("mv_sum", Seq(x)) =>
          aggregate(x, lit(0.0), (acc, v) => acc + v.cast("double"))
        case ("mv_avg", Seq(x)) =>
          aggregate(x, lit(0.0), (acc, v) => acc + v.cast("double")) / size(x)
        // MV_MEDIAN: sorted middle; even counts average the two
        // middles (ES|QL's rule)
        case ("mv_median", Seq(x)) => mvMedian(x)
        // MV_MEDIAN_ABSOLUTE_DEVIATION (8.15): median(|v - median|)
        case ("mv_median_absolute_deviation", Seq(x)) =>
          mvMedian(transform(x, v => abs(v.cast("double") - mvMedian(x))))
        // MV_PSERIES_WEIGHTED_SUM(x, p) (8.16): values sorted DESC,
        // the i-th (1-based) weighted 1/i^p, summed — the relevance-
        // decay fold ES uses for rank-aware multivalue scoring
        case ("mv_pseries_weighted_sum", Seq(x, p)) =>
          val sorted = sort_array(x, asc = false)
          aggregate(
            zip_with(sorted, sequence(lit(1), size(x)),
              (v, i) => v.cast("double") / pow(i.cast("double"), p.cast("double"))),
            lit(0.0), (acc, v) => acc + v)
        // MV_PERCENTILE(x, p): linear interpolation at rank
        // p/100·(n-1) over the sorted values (ES|QL's rule)
        case ("mv_percentile", Seq(x, p)) =>
          val sorted = sort_array(x)
          val n = size(x)
          val pos = (p.cast("double") / 100.0) * (n - lit(1)).cast("double")
          val lo = floor(pos).cast("int")
          val frac = pos - floor(pos)
          val vlo = element_at(sorted, lo + lit(1)).cast("double")
          val vhi = element_at(sorted, least(lo + lit(2), n)).cast("double")
          vlo + (vhi - vlo) * frac
        case ("mv_sort", Seq(x)) => sort_array(x)
        case ("mv_sort", Seq(x, ord)) =>
          // MV_SORT(x, "DESC") — the order arg arrives as a literal col
          sort_array(x, asc = !litStr(ord, "MV_SORT order").toLowerCase.contains("desc"))
        case ("mv_dedupe", Seq(x)) => array_distinct(x)
        // MV_SLICE(x, start[, end]) — 0-based inclusive, like ES|QL
        case ("mv_slice", Seq(x, s, e)) => slice(x, s + lit(1), e - s + lit(1))
        case ("mv_slice", Seq(x, s)) => slice(x, s + lit(1), lit(1))
        case ("mv_first", Seq(x)) => element_at(x, 1)
        case ("mv_last", Seq(x)) => element_at(x, -1)
        // trig + misc math
        case ("sin", Seq(x)) => sin(x)
        case ("cos", Seq(x)) => cos(x)
        case ("tan", Seq(x)) => tan(x)
        case ("asin", Seq(x)) => asin(x)
        case ("acos", Seq(x)) => acos(x)
        case ("atan", Seq(x)) => atan(x)
        case ("atan2", Seq(y, x)) => atan2(y, x)
        case ("sinh", Seq(x)) => sinh(x)
        case ("cosh", Seq(x)) => cosh(x)
        case ("tanh", Seq(x)) => tanh(x)
        case ("cbrt", Seq(x)) => cbrt(x)
        case ("signum", Seq(x)) => signum(x)
        case ("e", Seq()) => lit(math.E)
        case ("pi", Seq()) => lit(math.Pi)
        case ("tau", Seq()) => lit(2.0 * math.Pi)
        // string long tail
        case ("locate", Seq(x, sub)) =>
          // ES|QL LOCATE(string, substring) — Spark's locate wants the
          // pattern as a literal string
          locate(litStr(sub, "LOCATE substring"), x)
        case ("reverse", Seq(x)) => reverse(x)
        case ("repeat", Seq(x, n)) => repeat(x, n.cast("int"))
        case ("bit_length", Seq(x)) => bit_length(x)
        case ("byte_length", Seq(x)) => octet_length(x)
        case ("right", Seq(x, n)) => substring(x, -n.cast("int"), n.cast("int"))
        // ROUND(x, n) — decimal-scale rounding (Num.round: binary-
        // exact, matching DuckDB's round)
        case ("round", Seq(x, n)) =>
          Num.round(x, litStr(n, "ROUND scale").toDouble.toInt)
        // spatial family (ES|QL 8.12+): a point is an (x=lon, y=lat)
        // struct — ST_DISTANCE over geo points returns METERS (great-
        // circle, like ES); all pure codegen'd column math
        case ("st_point", Seq(x, y)) =>
          struct(x.cast("double").as("x"), y.cast("double").as("y"))
        case ("st_x", Seq(p)) => p.getField("x")
        case ("st_y", Seq(p)) => p.getField("y")
        case ("st_distance", Seq(a, b)) =>
          graft.rel.Relational.haversineKm(
            a.getField("y"), a.getField("x"),
            b.getField("y"), b.getField("x")) * lit(1000.0)
        // spatial predicates (8.14): the shape side must be a literal
        // TO_GEOSHAPE WKT polygon (it selects the expression shape —
        // the same literal-argument contract as date formats); points
        // are st_point structs. Point-vs-polygon only, the shape class
        // the synthetic geo columns exercise; polygon-polygon raises.
        case ("to_geoshape", Seq(w)) =>
          lit(litStr(w, "TO_GEOSHAPE wkt")) // carried as a literal, parsed by the predicate
        case ("st_contains", Seq(shape, p)) =>
          graft.rel.Relational.geoPolygon(
            p.getField("y"), p.getField("x"),
            parseWktPolygon(litStr(shape, "ST_CONTAINS shape")))
        case ("st_within", Seq(p, shape)) =>
          graft.rel.Relational.geoPolygon(
            p.getField("y"), p.getField("x"),
            parseWktPolygon(litStr(shape, "ST_WITHIN shape")))
        case ("st_intersects", Seq(a, b)) =>
          // a point intersects a polygon iff the polygon contains it;
          // INTERSECTS is symmetric in ES|QL, so accept either order
          val (shape, p) = stShapePoint(a, b, "ST_INTERSECTS")
          graft.rel.Relational.geoPolygon(
            p.getField("y"), p.getField("x"), parseWktPolygon(shape))
        case ("st_disjoint", Seq(a, b)) =>
          val (shape, p) = stShapePoint(a, b, "ST_DISJOINT")
          !graft.rel.Relational.geoPolygon(
            p.getField("y"), p.getField("x"), parseWktPolygon(shape))
        // base64 + angle conversions + 2-arg log (ES|QL long tail)
        case ("to_base64", Seq(x)) => base64(x.cast("binary"))
        case ("from_base64", Seq(x)) => unbase64(x).cast("string")
        case ("to_degrees", Seq(x)) => degrees(x)
        case ("to_radians", Seq(x)) => radians(x)
        case ("log", Seq(b, x)) => log(x) / log(b) // LOG(base, value)
        // MV_APPEND / MV_ZIP (8.15): array concat and element-wise
        // string join with a delimiter
        case ("mv_append", Seq(a, b)) => concat(a, b)
        case ("mv_zip", Seq(a, b)) => zip_with(a, b, (x, y) => concat_ws(",", x, y))
        case ("mv_zip", Seq(a, b, d)) =>
          val delim = litStr(d, "MV_ZIP delimiter")
          zip_with(a, b, (x, y) => concat_ws(delim, x, y))
        // hash family (ES|QL 8.16); HASH(alg, input) dispatches on the
        // algorithm name — unknown algorithms fail loudly
        case ("md5", Seq(x)) => md5(x.cast("binary"))
        case ("sha1", Seq(x)) => sha1(x.cast("binary"))
        case ("sha256", Seq(x)) => sha2(x.cast("binary"), 256)
        case ("hash", Seq(alg, x)) => litStr(alg, "HASH algorithm") match {
          case "md5" => md5(x.cast("binary"))
          case "sha1" => sha1(x.cast("binary"))
          case "sha256" => sha2(x.cast("binary"), 256)
          case "sha512" => sha2(x.cast("binary"), 512)
          case other => throw new IllegalArgumentException(
            s"HASH: unsupported algorithm '$other'")
        }
        // 8.15/9.x scalar tail: SPACE, HYPOT, SCALB, TO_BOOLEAN, and
        // the scalar IP_PREFIX (the agg bucketing twin lives in
        // Aggs.ipPrefix). v4 only, like the rest of the ip surface;
        // the v6 length argument is accepted and unused on v4 inputs.
        case ("space", Seq(n)) => call_function("repeat", lit(" "), n.cast("int"))
        case ("hypot", Seq(a, b)) => sqrt(a * a + b * b)
        case ("scalb", Seq(d, i)) => d * pow(lit(2.0), i.cast("double"))
        case ("to_boolean", Seq(x)) => x.cast("boolean")
        case ("to_bool", Seq(x)) => x.cast("boolean")
        case ("ip_prefix", Seq(ip, l4, _)) =>
          // 2^(32-len) fits a double exactly, so the block math is int-exact
          val block = pow(lit(2.0), lit(32.0) - l4.cast("double")).cast("long")
          val net = (graft.agg.Aggs.ipValue(ip) / block).cast("long") * block
          concat_ws(".",
            (net / 16777216L % 256L).cast("long"),
            (net / 65536L % 256L).cast("long"),
            (net / 256L % 256L).cast("long"),
            (net % 256L).cast("long"))
        // full-text functions (ES|QL 8.17): the search family reused
        // inside WHERE — MATCH compiles to the analyzed-token
        // predicate, QSTR to the Lucene query_string compiler, KQL
        // through the case-normalizing KQL front end; all of them are
        // the same Column predicates the Query DSL produces, so they
        // compose with the rest of the WHERE expression
        case ("match", Seq(f, q)) =>
          graft.search.Search.matchQuery(f, litStr(q, "MATCH query"))
        case ("qstr", Seq(q)) =>
          UriQuery.compile(litStr(q, "QSTR query"))
        case ("kql", Seq(q)) =>
          Kql.compile(litStr(q, "KQL query"))
        // 9.x additions to the family: MATCH_PHRASE (positional
        // adjacency, the match_phrase query as a WHERE function) and
        // TERM (exact un-analyzed equality on a keyword field)
        case ("match_phrase", Seq(f, q)) =>
          graft.search.Search.matchPhrase(f, litStr(q, "MATCH_PHRASE query"))
        case ("term", Seq(f, q)) => f === q
        // 9.1 math tail: ROUND_TO rounds DOWN to the nearest of a
        // fixed ascending point list (values below the first point
        // clamp to it — ES's bucketing-helper rule); COPY_SIGN carries
        // the second argument's sign onto the first's magnitude
        case ("round_to", x +: points) if points.nonEmpty =>
          points.tail.foldLeft(points.head) { (acc, p) =>
            when(x >= p, p).otherwise(acc)
          }
        case ("copy_sign", Seq(mag, sign)) =>
          when(sign.cast("double") < 0.0, -abs(mag)).otherwise(abs(mag))
        // 9.0 date-nanos support: graft's timestamp domain is ALREADY
        // ns longs (SURVEY §3), so TO_DATE_NANOS is the string->ns
        // parse; ns values flow through DATE_TRUNC/BUCKET/DATE_DIFF
        // unchanged — the rest of the date-nanos surface is the
        // existing ns-domain function set
        case ("to_date_nanos", Seq(x)) =>
          unix_micros(to_timestamp(x.cast("string"))) * lit(1000L)
        // type conversions
        case ("to_string", Seq(x)) => x.cast("string")
        case ("to_long", Seq(x)) => x.cast("long")
        case ("to_int", Seq(x)) => x.cast("int")
        case ("to_double", Seq(x)) => x.cast("double")
        case (other, _) =>
          throw new IllegalArgumentException(s"unknown ES|QL function: $other")
      }

    // ROUND's scale must be a literal (it selects the rounding
    // EXPRESSION, Num.round being scale-specialized) — parsed here
    // rather than through the generic arg path
    private def parseRound(): Column = {
      expectOp("(")
      val e = parseExpr()
      val scale = peek match {
        case Some(TOp(",")) =>
          next()
          // ROUND(x, -2) is valid ES|QL (round to hundreds): '-2'
          // lexes as TOp("-") + TNum(2)
          val neg = peek match {
            case Some(TOp("-")) => next(); true
            case _ => false
          }
          next() match {
            case TNum(v, true, _) => if (neg) -v.toInt else v.toInt
            case other =>
              throw new IllegalArgumentException(s"ROUND scale must be an int literal, got $other")
          }
        case _ => 0
      }
      expectOp(")")
      Num.round(e, scale)
    }

    // SPLIT's delimiter is a LITERAL (ES|QL splits on the literal
    // string, Spark's split takes a regex — quote it at parse time)
    private def parseSplit(): Column = {
      expectOp("(")
      val e = parseExpr()
      expectOp(",")
      val delim = str(next())
      expectOp(")")
      split(e, java.util.regex.Pattern.quote(delim))
    }

    // DATE_TRUNC("day"|"hour"|"minute"|"second", nsLong) — exact
    // integer math over graft's ns-long event time (hour-boundary
    // safe; the unit resolves at parse time)
    private def parseDateTrunc(): Column = {
      expectOp("(")
      val unit = str(next()).toLowerCase
      expectOp(",")
      val e = parseExpr()
      expectOp(")")
      val ns = unit match {
        case "second" => 1000000000L
        case "minute" => 60L * 1000000000L
        case "hour" => 3600L * 1000000000L
        case "day" => 86400L * 1000000000L
        case other => throw new IllegalArgumentException(
          s"unsupported DATE_TRUNC unit: $other")
      }
      e - (e % lit(ns))
    }

    // BUCKET(expr, "day") — calendar form, same ns math as DATE_TRUNC;
    // BUCKET(expr, width) — numeric form, floor(x / w) * w
    private def parseBucket(): Column = {
      expectOp("(")
      val e = parseExpr()
      expectOp(",")
      val out = peek match {
        case Some(TStr(unit)) =>
          next()
          val ns = unit.toLowerCase match {
            case "second" => 1000000000L
            case "minute" => 60L * 1000000000L
            case "hour" => 3600L * 1000000000L
            case "day" => 86400L * 1000000000L
            case other => throw new IllegalArgumentException(
              s"unsupported BUCKET unit: $other")
          }
          e - (e % lit(ns))
        case _ => next() match {
          case TNum(w, _, _) => floor(e / lit(w)) * lit(w)
          case other => throw new IllegalArgumentException(
            s"BUCKET width must be a literal, got $other")
        }
      }
      expectOp(")")
      out
    }

    private def identName(): String = next() match {
      case TId(s) => s
      case other => throw new IllegalArgumentException(s"expected column name, got $other")
    }

    private def parsePrimary(): Column = next() match {
      case TNum(v, isInt, exact) => if (isInt) lit(exact) else lit(v)
      case TStr(s) => lit(s)
      case TOp("(") =>
        val e = parseExpr(); expectOp(")"); e
      case TId(name) if peek.contains(TOp("(")) =>
        if (name.equalsIgnoreCase("round")) parseRound()
        else if (name.equalsIgnoreCase("split")) parseSplit()
        else if (name.equalsIgnoreCase("date_trunc")) parseDateTrunc()
        else if (name.equalsIgnoreCase("bucket")) parseBucket()
        else fn(name, parseArgs())
      case TId(name) if name.equalsIgnoreCase("true") => lit(true)
      case TId(name) if name.equalsIgnoreCase("false") => lit(false)
      case TId(name) if name.equalsIgnoreCase("null") => lit(null)
      case TId(name) => col(name)
      case other => throw new IllegalArgumentException(s"unexpected token: $other")
    }

    /** Aggregate call at STATS position; falls back to a plain
      * expression wrapped in an implicit FIRST? No — ES|QL requires an
      * aggregate, so unknown names fail loudly. */
    def parseAgg(filter: Option[Column] = None): Column = next() match {
      case TId(name) =>
        expectOp("(")
        // STATS ... WHERE p: only rows passing p feed this aggregate —
        // realized by null-masking the argument (aggs skip nulls), so
        // the filtered agg shares the single partial-agg pass with its
        // unfiltered siblings instead of forcing a separate scan
        def flt(e: Column): Column = filter.map(f => when(f, e)).getOrElse(e)
        name.toLowerCase match {
          case "count" =>
            val c = peek match {
              case Some(TOp("*")) => next(); count(flt(lit(1)))
              case _ => count(flt(parseExpr()))
            }
            expectOp(")"); c
          case "count_distinct" => val e = parseExpr(); expectOp(")"); countDistinct(flt(e))
          case "sum" => val e = parseExpr(); expectOp(")"); sum(flt(e))
          case "avg" => val e = parseExpr(); expectOp(")"); avg(flt(e))
          case "min" => val e = parseExpr(); expectOp(")"); min(flt(e))
          case "max" => val e = parseExpr(); expectOp(")"); max(flt(e))
          // exact interpolated percentile over a named column,
          // matching the oracle's quantile_cont (single-reducer — the
          // approx form is the scale path, as with percentilesAgg)
          // WEIGHTED_AVG(value, weight)
          case "weighted_avg" =>
            val e = parseExpr(); expectOp(",")
            val w = parseExpr(); expectOp(")")
            sum(flt(e * w)) / sum(flt(w))
          // VALUES(x) — distinct values as a multivalue field (sorted:
          // ES guarantees no order, sorting makes results stable)
          case "values" =>
            val e = parseExpr(); expectOp(")")
            sort_array(collect_set(flt(e)))
          // TOP(x, n[, "asc"|"desc"]) — n extreme values with dups
          case "top" =>
            val e = parseExpr(); expectOp(",")
            val n = next() match {
              case TNum(v, true, _) => v.toInt
              case other => throw new IllegalArgumentException(s"TOP needs an int limit: $other")
            }
            val asc = peek match {
              case Some(TOp(",")) => next(); str(next()).toLowerCase == "asc"
              case _ => false
            }
            expectOp(")")
            slice(sort_array(collect_list(flt(e)), asc), 1, n)
          // STD_DEV (8.15): population stddev, like ES|QL
          case "std_dev" => val e = parseExpr(); expectOp(")"); stddev_pop(flt(e))
          case "median" =>
            require(filter.isEmpty, "STATS..WHERE unsupported on MEDIAN/PERCENTILE")
            val id = identName(); expectOp(")")
            expr(s"percentile($id, 0.5)")
          case "percentile" =>
            require(filter.isEmpty, "STATS..WHERE unsupported on MEDIAN/PERCENTILE")
            val id = identName(); expectOp(",")
            val p = next() match {
              case TNum(v, _, _) => v
              case other =>
                throw new IllegalArgumentException(s"PERCENTILE needs a numeric literal, got $other")
            }
            expectOp(")")
            require(p >= 0 && p <= 100, s"PERCENTILE takes 0-100, got $p")
            // ES|QL percentile is 0-100; Spark's takes a 0-1 fraction
            // (MEDIAN above hard-codes 0.5 — same convention)
            expr(s"percentile($id, ${p / 100.0})")
          case other => throw new IllegalArgumentException(s"unknown aggregate: $other")
        }
      case other => throw new IllegalArgumentException(s"expected aggregate, got $other")
    }
  }

  // ---- pipe assembly -----------------------------------------------

  /** Split on top-level '|' (quote- and paren-aware — FORK branches
    * carry whole sub-pipelines inside parens). */
  private def segments(q: String): Seq[String] = splitTopLevel(q, '|')

  /** Index of the LAST top-level (outside quotes/parens) ` by `
    * keyword, case-insensitive — a ' by ' INSIDE a string literal
    * ("fix by tuesday") must not split a STATS/INLINESTATS body. */
  private def lastTopLevelBy(s: String): Int = {
    var inStr = false; var depth = 0; var found = -1; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr => depth -= 1
        case _ => ()
      }
      if (!inStr && depth == 0 && i + 4 <= s.length &&
        s.regionMatches(true, i, " by ", 0, 4)) found = i
      i += 1
    }
    found
  }

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var inStr = false
    s.foreach {
      case '"' => inStr = !inStr; cur += '"'
      case '(' if !inStr => depth += 1; cur += '('
      case ')' if !inStr => depth -= 1; cur += ')'
      case c if c == sep && depth == 0 && !inStr => out += cur.result(); cur.clear()
      case c => cur += c
    }
    out += cur.result()
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Run an ES|QL query against the parquet tables in `dir` (FROM and
    * ENRICH resolve table names through `graft.Tables`). */
  def run(spark: SparkSession, dir: String, query: String): DataFrame = {
    // sessions built without withExtensions still get the count-shaped
    // text rewrites (idempotent)
    graft.plans.SizeOfSplitRewrite.install(spark)
    // `TS` (the 9.x spelling of the time-series source command) is a
    // strict alias of METRICS here: both declare time-series intent
    // and desugar to FROM [+ STATS]
    val rawSegs0 = segments(query)
    val rawSegs =
      if (rawSegs0.nonEmpty && (rawSegs0.head.toLowerCase.startsWith("ts ") ||
          rawSegs0.head.toLowerCase == "ts"))
        ("metrics" + rawSegs0.head.drop(2)) +: rawSegs0.tail
      else rawSegs0
    require(rawSegs.nonEmpty && (rawSegs.head.toLowerCase.startsWith("from") ||
        rawSegs.head.toLowerCase.startsWith("row") ||
        rawSegs.head.toLowerCase.startsWith("metrics") ||
        rawSegs.head.toLowerCase.startsWith("show")),
      "ES|QL query must start with FROM, ROW, TS, METRICS or SHOW")
    // SHOW INFO: the one-row deployment descriptor (piped commands
    // compose after it like any other source)
    if (rawSegs.head.toLowerCase.trim == "show info") {
      import spark.implicits._
      val info = Seq(("graft", org.apache.spark.SPARK_VERSION, "spark-native"))
        .toDF("name", "version", "build")
      return rawSegs.tail.foldLeft(info)((d, seg) => applyCommand(d, seg))
    }
    // METRICS <index> [<aggs> [BY <keys>]] (8.16 TSDS sugar): desugars
    // to FROM + STATS — the aggregation semantics are identical, the
    // command just declares time-series intent
    val segs = rawSegs.head.toLowerCase match {
      case h if h.startsWith("metrics") =>
        val body = rawSegs.head.drop(7).trim
        val (table, aggPart) = body.span(!_.isWhitespace)
        val head = s"from $table"
        if (aggPart.trim.isEmpty) head +: rawSegs.tail
        else head +: s"stats ${aggPart.trim}" +: rawSegs.tail
      case _ => rawSegs
    }
    // events carries TIMESTAMP(NANOS) parquet — route through the
    // ns-long loader like every other operator (ts exposed as ts_ns)
    def load(t: String) =
      if (t == "events") graft.Tables.events(spark, dir)
      else graft.Tables.load(spark, dir, t)
    val source =
      if (segs.head.toLowerCase.startsWith("row")) rowSource(spark, segs.head.drop(3).trim)
      else {
        // FROM <t> [METADATA _id, _index, _version]: ES|QL's metadata
        // columns. _id = the table's key (stringified, as ES ids are
        // strings), _index = the source name, _version = 1 (parquet
        // storage has no per-doc versions unless the connector's
        // external-versioning column is used). _score needs a scoring
        // context (full-text WHERE) — loud error, not a silent 0.
        val FromRe = "(?i)^([A-Za-z0-9_]+)(?:\\s+metadata\\s+(.+))?$".r
        segs.head.drop(4).trim match {
          case FromRe(table, meta) =>
            val base = load(table)
            Option(meta).map(_.split(",").map(_.trim.toLowerCase).toSeq)
              .getOrElse(Nil).foldLeft(base) { (d, m) => m match {
                case "_id" =>
                  val key = EsSql.keyOf.getOrElse(table,
                    throw new IllegalArgumentException(
                      s"METADATA _id: no known key column for $table"))
                  d.withColumn("_id", col(key).cast("string"))
                case "_index" => d.withColumn("_index", lit(table))
                case "_version" => d.withColumn("_version", lit(1L))
                case "_score" => throw new IllegalArgumentException(
                  "METADATA _score needs a scoring query context; use " +
                    "FORK/RERANK/FUSE which materialize _score explicitly")
                case other => throw new IllegalArgumentException(
                  s"unknown METADATA field: $other")
              }}
          case other =>
            throw new IllegalArgumentException(s"bad FROM target: $other")
        }
      }
    val resolve = (t: String) => load(t)
    segs.tail.foldLeft(source)(applyCommand(_, _, resolve))
  }

  private def expandColumnPattern(df: DataFrame, p: String): Seq[String] =
    if (!p.contains("*")) Seq(p)
    else {
      val re = ("^" + p.split("\\*", -1).map(java.util.regex.Pattern.quote)
        .mkString(".*") + "$").r
      val hits = df.columns.filter(c => re.findFirstIn(c).isDefined).toSeq
      require(hits.nonEmpty, s"no columns match pattern: $p")
      hits
    }

  /** `ROW a = 1, b = "x"` — a one-row literal source (the ES|QL
    * scratchpad form). Built on a 1-row range so the assignments are
    * ordinary eval expressions. */
  private def rowSource(spark: SparkSession, body: String): DataFrame = {
    val base = spark.range(1)
    val assigns = splitTopLevel(body, ',').map(parseAssign)
    base.select(assigns.map { case (name, e) => e.as(name) }: _*)
  }

  /** Apply one pipe segment to the frame (exposed for testing against
    * in-memory frames; ENRICH needs a table resolver and fails loudly
    * without one). */
  def applyCommand(
      df: DataFrame, seg: String,
      resolve: String => DataFrame = t =>
        throw new IllegalArgumentException(s"no table resolver for ENRICH $t")): DataFrame = {
    val (kw, rest) = seg.span(!_.isWhitespace)
    val body = rest.trim
    kw.toLowerCase match {
      // KNN as a WHERE function (ES|QL 9.x, tech preview): keeps the k
      // rows nearest the query vector. Not a row-local predicate — it
      // rewrites to score + TakeOrderedAndProject (the distributed
      // top-k; never a global sort materialization), exactly how the
      // Query-DSL knn clause rewrites. ES leaves ties arbitrary;
      // pinned here to (rounded score desc, first column asc) so runs
      // reproduce. Must be the ENTIRE where body — compose extra
      // predicates as their own WHERE stages before/after.
      case "where" if KnnWhere.findFirstMatchIn(body.trim).isDefined =>
        val m = KnnWhere.findFirstMatchIn(body.trim).get
        val field = m.group(1)
        val vec = m.group(2).split(",").map(_.trim.toDouble)
        val k = m.group(3).toInt
        val q = array(vec.map(v => lit(v)): _*)
        val score = org.apache.spark.sql.GraftBridge.column(graft.expr.CosineSim(
          org.apache.spark.sql.GraftBridge.expression(col(field)),
          org.apache.spark.sql.GraftBridge.expression(q)))
        df.withColumn("__knn_s", graft.util.Num.round(score, 4))
          .orderBy(col("__knn_s").desc, col(df.columns.head).asc)
          .limit(k)
          .drop("__knn_s")
      case "where" if body.trim.toLowerCase.startsWith("knn(") =>
        throw new IllegalArgumentException(
          "KNN must be the entire WHERE body: knn(field, [v, ...], k) — " +
            "compose other predicates as separate WHERE stages")
      case "where" => df.where(new P(lex(body)).parseExprAll())
      case "limit" => df.limit(body.trim.toInt)
      // KEEP/DROP accept `*` wildcards (ES|QL qualified-name
      // patterns); KEEP preserves the pattern-list order with each
      // pattern's matches in schema order, like ES|QL
      case "keep" =>
        val picked = splitTopLevel(body, ',').map(_.trim)
          .flatMap(p => expandColumnPattern(df, p)).distinct
        df.select(picked.map(col): _*)
      case "drop" =>
        val dropped = splitTopLevel(body, ',').map(_.trim)
          .flatMap(p => expandColumnPattern(df, p)).distinct
        df.drop(dropped: _*)
      case "eval" =>
        splitTopLevel(body, ',').foldLeft(df) { (acc, assign) =>
          val (name, e) = parseAssign(assign)
          acc.withColumn(name, e)
        }
      case "sort" =>
        val orders = splitTopLevel(body, ',').map { part =>
          val ps = part.trim.split("\\s+")
          val c = col(ps.head)
          // ES|QL null placement: default LAST on ASC, FIRST on DESC
          // (nulls sort as largest) — overridable with NULLS FIRST/LAST
          ps.map(_.toLowerCase) match {
            case Array(_, "desc") => c.desc_nulls_first
            case Array(_, "asc") | Array(_) => c.asc_nulls_last
            case Array(_, "desc", "nulls", "first") => c.desc_nulls_first
            case Array(_, "desc", "nulls", "last") => c.desc_nulls_last
            case Array(_, "asc", "nulls", "first") | Array(_, "nulls", "first") => c.asc_nulls_first
            case Array(_, "asc", "nulls", "last") | Array(_, "nulls", "last") => c.asc_nulls_last
            case _ => throw new IllegalArgumentException(s"bad SORT clause: $part")
          }
        }
        df.orderBy(orders: _*)
      case "stats" =>
        val (aggPart, byPart) = lastTopLevelBy(body) match {
          case -1 => (body, "")
          case i => (body.substring(0, i), body.substring(i + 4))
        }
        val aggs = splitTopLevel(aggPart, ',').map { a =>
          val (name, c) = parseAggAssign(a)
          c.as(name)
        }
        if (byPart.trim.isEmpty) df.agg(aggs.head, aggs.tail: _*)
        else {
          // BY keys are column names or inline aliases (BY b = expr);
          // (?!=) keeps `==` inside an alias expression from matching.
          // CATEGORIZE(f) (8.18) groups by the log-pattern category —
          // the same head-token construction as the categorize_text
          // agg, inlined as a grouping expression.
          val aliasRe = "^([A-Za-z0-9_]+)\\s*=(?!=)(.*)$".r
          val catRe = "(?i)^categorize\\s*\\((.+)\\)$".r
          def keyExpr(e: String): Column = e.trim match {
            case catRe(inner) =>
              val c = new P(lex(inner)).parseExpr()
              array_join(slice(filter(graft.analysis.Analyzer.tokens(c),
                t => !t.rlike("^[0-9]+$")), 1, 4), " ")
            case other => new P(lex(other)).parseExpr()
          }
          val keys = splitTopLevel(byPart, ',').map(_.trim).map {
            case aliasRe(name, e) => keyExpr(e).as(name)
            case k @ catRe(_) => keyExpr(k).as("category")
            case k => col(k)
          }
          df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
        }
      case "rename" =>
        // RENAME old AS new [, ...]
        splitTopLevel(body, ',').foldLeft(df) { (acc, part) =>
          part.trim.split("(?i)\\s+as\\s+") match {
            case Array(o, n) => acc.withColumnRenamed(o.trim, n.trim)
            case _ => throw new IllegalArgumentException(s"bad RENAME clause: $part")
          }
        }
      case "mv_expand" =>
        // MV_EXPAND col — one row per element of a multi-value field.
        // ES|QL keeps a null multivalue as ONE row with null (a field
        // with zero values IS null in ES), so explode_outer, not
        // explode (which would silently drop those rows)
        val c = body.trim
        df.withColumn(c, explode_outer(col(c)))
      case "fork" =>
        // FORK (pipe | pipe) (pipe) — run each branch on the incoming
        // frame, union tagged with _fork. Branches are independent
        // Catalyst subtrees over the SAME scan (Spark reuses the
        // exchange under AQE); union is a no-shuffle concatenation.
        val branches = forkBranches(body)
        require(branches.size >= 2, s"FORK needs >= 2 branches: $body")
        branches.zipWithIndex.map { case (b, i) =>
          segments(b).foldLeft(df)(applyCommand(_, _, resolve))
            .withColumn("_fork", lit(s"fork${i + 1}"))
        }.reduce(_.unionByName(_, allowMissingColumns = true))
      case "rerank" =>
        // RERANK "query" ON field (ES|QL 8.18 inference operator).
        // The model call routes through the Inference seam (default:
        // the deterministic SparseTfDot term-overlap stub): real
        // plumbing — _score column + descending re-sort — swappable
        // model, the same stance as the multimodal decode stubs.
        // Narrow compiled pass, no shuffle; RERANK is meant to run on
        // an already-LIMIT-ed window.
        val rr = "^\"([^\"]+)\"\\s+(?i:on)\\s+([A-Za-z0-9_]+)$".r
        body.trim match {
          case rr(q, field) =>
            df.withColumn("_score",
              graft.inference.Inference.service.rerankScore(q, col(field)))
              .orderBy(col("_score").desc)
          case other => throw new IllegalArgumentException(s"bad RERANK: $other")
        }
      case "completion" =>
        // COMPLETION col = <prompt expr> [WITH ...] (ES|QL 9.x LLM
        // operator). The model call routes through the Inference seam
        // (default stub: "stub: " + the prompt's first 8 analyzed
        // tokens reversed) — real plumbing (named output column,
        // arbitrary prompt EXPRESSION, WITH clause accepted and
        // ignored), swappable model. Narrow map-only pass; COMPLETION
        // is meant to run on an already-LIMIT-ed window.
        val cr = "(?is)^([A-Za-z0-9_]+)\\s*=\\s*(.+?)(?:\\s+with\\s+.*)?$".r
        body.trim match {
          case cr(outCol, promptSrc) =>
            val prompt = new P(lex(promptSrc)).parseExpr()
            df.withColumn(outCol, graft.inference.Inference.service.complete(prompt))
          case other => throw new IllegalArgumentException(s"bad COMPLETION: $other")
        }
      case "fuse" =>
        // FUSE [rrf|linear] [KEY BY c1, c2] [WITH rank_constant = N]
        // (ES|QL 9.x) — merges FORK branches into one ranked result.
        // Rank within each branch comes from _score (desc, key-broken
        // ties); rrf: score = Σ 1/(k + rank); linear: min-max
        // normalized _score summed across branches. The window
        // partitions on _fork (a handful of branches, each already
        // LIMIT-ed by its fork pipe — never the corpus), and the merge
        // is one partial-aggregating groupBy on the keys.
        require(df.columns.contains("_fork") && df.columns.contains("_score"),
          "FUSE needs FORK output carrying a _score column")
        val fuseRe =
          "(?is)^\\s*(rrf|linear)?\\s*(?:key\\s+by\\s+([\\w\\s,]+?))?\\s*(?:with\\s+rank_constant\\s*=\\s*(\\d+))?\\s*$".r
        val (method, keys, kConst) = body match {
          case fuseRe(m, kp, kc) =>
            val ks = Option(kp).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
              .getOrElse(df.columns.filterNot(c => c == "_fork" || c == "_score").toSeq)
            (Option(m).map(_.toLowerCase).getOrElse("rrf"), ks,
              Option(kc).map(_.toInt).getOrElse(60))
          case other => throw new IllegalArgumentException(s"bad FUSE: $other")
        }
        require(keys.nonEmpty, "FUSE needs at least one key column")
        val keyCols = keys.map(col)
        val w = Window.partitionBy(col("_fork"))
          .orderBy(col("_score").desc +: keyCols.map(_.asc): _*)
        val ranked = df.withColumn("_rank", row_number().over(w))
        method match {
          case "rrf" =>
            ranked.groupBy(keyCols: _*)
              .agg(sum(lit(1.0) / (lit(kConst.toDouble) + col("_rank"))).as("_score"))
          case "linear" =>
            // per-branch min-max normalization: a 1-row-per-branch
            // frame broadcast back, zero extra scans of the windows
            val mm = ranked.groupBy(col("_fork"))
              .agg(min(col("_score")).as("_mn"), max(col("_score")).as("_mx"))
            ranked.join(broadcast(mm), "_fork")
              .withColumn("_norm",
                when(col("_mx") === col("_mn"), lit(1.0))
                  .otherwise((col("_score") - col("_mn")) / (col("_mx") - col("_mn"))))
              .groupBy(keyCols: _*).agg(sum(col("_norm")).as("_score"))
        }
      case "sample" =>
        // SAMPLE p — Bernoulli row sample. Deterministic content-hash
        // draw (not rand()): the same rows survive regardless of
        // partitioning or retry, which is what makes a sampled
        // pipeline stage reproducible — and oracle-checkable. Same
        // uniformHash48 construction as the sampler aggs.
        val p = body.trim.toDouble
        require(p > 0 && p <= 1, s"SAMPLE probability out of (0,1]: $p")
        val key = concat_ws("\u0000", df.columns.map(c => col(c).cast("string")): _*)
        df.where(Num.uniformHash48(key) < p)
      case "dissect" =>
        // DISSECT field "%{a}-%{b} %{c}" [APPEND_SEPARATOR="s"] —
        // literal-anchored extraction with the full modifier set:
        // %{+k} appends to a prior k (joined by the separator),
        // %{?k} / %{} match-and-discard, %{k->} lets the delimiter
        // that FOLLOWS the key repeat (right padding). The pattern
        // compiles to ONE regex with a lazy group per key (greedy for
        // the last), evaluated per output via regexp_extract — narrow
        // codegen'd column math, the log-pipeline workhorse.
        val m = "(?is)^([A-Za-z0-9_]+)\\s+\"(.*?)\"(?:\\s+append_separator\\s*=\\s*\"(.*)\")?$".r
        body.trim match {
          case m(field, pattern, sepOrNull) =>
            val sep = Option(sepOrNull).getOrElse("")
            val key = "%\\{([+?]?)([A-Za-z0-9_]*)(->)?\\}".r
            // (modifier, name, padded) per key, in pattern order
            val specs = key.findAllMatchIn(pattern)
              .map(k => (k.group(1), k.group(2), k.group(3) != null)).toSeq
            require(specs.exists { case (mod, name, _) => name.nonEmpty && mod != "?" },
              s"DISSECT pattern has no output keys: $pattern")
            val parts = key.split(pattern).map(java.util.regex.Pattern.quote)
            val regex = new StringBuilder("^")
            specs.indices.foreach { i =>
              val lit0 = if (i < parts.length) parts(i) else ""
              // a `->` on the PREVIOUS key lets this delimiter repeat
              regex ++= (if (i > 0 && specs(i - 1)._3 && lit0.nonEmpty)
                s"(?:$lit0)+" else lit0)
              regex ++= (if (i == specs.size - 1) "(.*)" else "(.*?)")
            }
            if (specs.size < parts.length) {
              val last = parts.last
              regex ++= (if (specs.last._3 && last.nonEmpty) s"(?:$last)+" else last)
            }
            regex ++= "$"
            // output columns: first-occurrence order; '+' occurrences
            // append to their base name with the separator
            val named = specs.zipWithIndex.collect {
              case ((mod, name, _), i) if name.nonEmpty && mod != "?" => (name, i + 1)
            }
            val outNames = named.map(_._1).distinct
            outNames.foldLeft(df) { case (acc, n) =>
              val gs = named.filter(_._1 == n).map(_._2)
              val cols = gs.map(g => regexp_extract(col(field), regex.result(), g))
              acc.withColumn(n,
                if (cols.size == 1) cols.head else concat_ws(sep, cols: _*))
            }
          case other => throw new IllegalArgumentException(s"bad DISSECT: $other")
        }
      case "grok" =>
        // GROK field "%{WORD:user} %{NUMBER:bytes:int}" — the named-
        // pattern sibling of DISSECT. Only the commonly-used pattern
        // names are built in (public grok base patterns); each capture
        // becomes a column, with optional :int/:long/:double coercion.
        val m = "^([A-Za-z0-9_]+)\\s+\"(.*)\"$".r
        body.trim match {
          case m(field, pattern) =>
            val lib = GrokPatterns.base
            // the capture NAME is optional: %{IP} is a valid grok
            // reference that must MATCH without capturing (it compiles
            // to a non-capturing group), not survive as literal text
            val key = "%\\{([A-Z0-9_]+)(?::([A-Za-z0-9_]+)(?::(int|long|double))?)?\\}".r
            val ms = key.findAllMatchIn(pattern).toSeq
            require(ms.nonEmpty, s"GROK pattern has no %{...} references: $pattern")
            // literal segments keep their quoted (plain-text) graft
            // semantics, but the standard grok escape idiom unwraps
            // first: \[ in the pattern means a literal '[' — quoting
            // the backslash itself would demand one in the DATA
            def quoteLit(seg: String): String =
              if (seg.isEmpty) seg
              else java.util.regex.Pattern.quote(seg.replaceAll("\\\\(.)", "$1"))
            val parts = key.split(pattern).map(quoteLit)
            val regex = new StringBuilder("^")
            var groupIdx = 0
            val caps = scala.collection.mutable.ListBuffer.empty[(String, Option[String], Int)]
            ms.zipWithIndex.foreach { case (k, i) =>
              regex ++= (if (i < parts.length) parts(i) else "")
              val pat = lib.getOrElse(k.group(1),
                throw new IllegalArgumentException(s"unknown grok pattern: %{${k.group(1)}}"))
              Option(k.group(2)) match {
                case Some(name) =>
                  groupIdx += 1
                  caps += ((name, Option(k.group(3)), groupIdx))
                  regex ++= s"($pat)"
                case None => regex ++= s"(?:$pat)"
              }
            }
            if (ms.size < parts.length) regex ++= parts.last
            regex ++= "$"
            require(caps.nonEmpty, s"GROK pattern has no named captures: $pattern")
            caps.foldLeft(df) { case (acc, (name, cast, g)) =>
              // a row the pattern does NOT match gets null captures
              // (ES grok skips it), never a cast failure on ''
              val raw0 = regexp_extract(col(field), regex.result(), g)
              val raw = when(raw0 =!= "", raw0)
              acc.withColumn(name, cast.fold(raw)(t => raw.cast(t)))
            }
          case other => throw new IllegalArgumentException(s"bad GROK: $other")
        }
      case "inlinestats" =>
        // INLINESTATS agg [BY keys] — like STATS but the aggregates
        // are appended to EVERY input row. Two-pass shape: one partial
        // agg to a tiny per-group frame, broadcast-joined back — the
        // scalable plan at any input size (a window over the whole
        // frame would single-partition the global case).
        val (aggPart, byPart) = lastTopLevelBy(body) match {
          case -1 => (body, "")
          case i => (body.substring(0, i), body.substring(i + 4))
        }
        val aggs = splitTopLevel(aggPart, ',').map { a =>
          val (name, c) = parseAggAssign(a)
          c.as(name)
        }
        if (byPart.trim.isEmpty)
          df.crossJoin(broadcast(df.agg(aggs.head, aggs.tail: _*)))
        else {
          val keys = splitTopLevel(byPart, ',').map(_.trim)
          val stats = df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
          df.join(broadcast(stats), keys, "left")
        }
      case "lookup" =>
        // LOOKUP JOIN table ON f1[, f2...] — ES 8.18's lookup-index
        // join (multi-key ON since 9.x): left join on the shared
        // field names; the lookup index is the small side by
        // definition, so it broadcasts.
        val m = "^(?i:join)\\s+([A-Za-z0-9_]+)\\s+(?i:on)\\s+([A-Za-z0-9_,\\s]+)$".r
        body.trim match {
          case m(table, fieldList) =>
            val fields = fieldList.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            require(fields.nonEmpty, s"LOOKUP JOIN needs at least one ON field")
            // same overwrite rule as ENRICH: the lookup side's non-key
            // columns replace same-named input columns (ES semantics)
            val lk = resolve(table)
            val cleaned = lk.columns
              .filter(c => !fields.contains(c) && df.columns.contains(c))
              .foldLeft(df)(_ drop _)
            cleaned.join(broadcast(lk), fields, "left")
          case other => throw new IllegalArgumentException(s"bad LOOKUP JOIN: $other")
        }
      case "change_point" =>
        // CHANGE_POINT value ON key — step-change detection over the
        // series ordered by key: the split maximizing the between-
        // segment sum of squares (the k=2 CUSUM statistic). Returns
        // the argmax row (key, value, cp_stat). Runs AFTER a STATS
        // bucketing in practice, so the series is small — the ordered
        // window is bounded by the bucket count, not the raw rows.
        val m = "^([A-Za-z0-9_]+)\\s+(?i:on)\\s+([A-Za-z0-9_]+)$".r
        body.trim match {
          case m(value, key) =>
            val w = org.apache.spark.sql.expressions.Window
              .orderBy(col(key)).rowsBetween(
                org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
            // total sum in decimal: the unordered partial agg must be
            // order-independent or cp_stat's 4th decimal wobbles
            val tot = df.agg(
              count(col(value)).cast("double").as("cp_n"),
              sum(col(value).cast("decimal(24,6)")).cast("double").as("cp_s"))
            df.select(col(key), col(value))
              .withColumn("cp_n1", count(col(value)).over(w).cast("double"))
              .withColumn("cp_s1", sum(col(value)).over(w))
              .crossJoin(broadcast(tot))
              .where(col("cp_n1") < col("cp_n"))
              .withColumn("cp_stat", {
                val m1 = col("cp_s1") / col("cp_n1")
                val m2 = (col("cp_s") - col("cp_s1")) / (col("cp_n") - col("cp_n1"))
                val mu = col("cp_s") / col("cp_n")
                Num.round(
                  col("cp_n1") * (m1 - mu) * (m1 - mu) +
                    (col("cp_n") - col("cp_n1")) * (m2 - mu) * (m2 - mu), 4)
              })
              .orderBy(col("cp_stat").desc, col(key).asc)
              .limit(1)
              .select(col(key), col(value), col("cp_stat"))
          case other => throw new IllegalArgumentException(s"bad CHANGE_POINT: $other")
        }
      case "enrich" =>
        // ENRICH table ON left == right [WITH f1, f2] — the lookup-
        // join command. The enrich table is the small side by
        // definition (an ES enrich index), so it broadcasts: the
        // stream never shuffles.
        val m = "^([A-Za-z0-9_]+)\\s+(?i:on)\\s+([A-Za-z0-9_]+)\\s*==\\s*([A-Za-z0-9_]+)(?:\\s+(?i:with)\\s+(.*))?$".r
        body.trim match {
          case m(table, left, right, withCols) =>
            // WITH entries are `field` or `new_name = field` (the
            // ES|QL enrich rename form)
            val aliasRe = "^([A-Za-z0-9_]+)\\s*=\\s*([A-Za-z0-9_]+)$".r
            val cols: Seq[Column] = Option(withCols)
              .map(splitTopLevel(_, ',').map(_.trim)).getOrElse(Nil)
              .map {
                case aliasRe(alias, src) => col(src).as(alias)
                case c => col(c)
              }
            val enrichSide = {
              val t = resolve(table)
              if (cols.isEmpty) t else t.select(col(right) +: cols: _*)
            }
            // ES ENRICH OVERWRITES a same-named existing field; keeping
            // both would leave an ambiguous duplicate that the next
            // KEEP/EVAL referencing the name trips over
            val added = enrichSide.columns.filterNot(_ == right)
            val cleaned = added.filter(c => df.columns.contains(c) && c != left)
              .foldLeft(df)(_ drop _)
            cleaned.join(broadcast(enrichSide), cleaned(left) === enrichSide(right), "left")
              .drop(enrichSide(right))
          case other => throw new IllegalArgumentException(s"bad ENRICH: $other")
        }
      case other => throw new IllegalArgumentException(s"unknown ES|QL command: $other")
    }
  }

  private def parseAssign(s: String): (String, Column) = {
    val i = s.indexOf('=')
    require(i > 0, s"EVAL needs name = expr, got: $s")
    (s.substring(0, i).trim, new P(lex(s.substring(i + 1))).parseExpr())
  }

  private def parseAggAssign(s: String): (String, Column) = {
    val i = s.indexOf('=')
    require(i > 0, s"STATS needs name = AGG(...), got: $s")
    // `name = AGG(...) WHERE pred` — per-aggregate row filter
    val rhs = s.substring(i + 1)
    val (aggSrc, predSrc) = splitAggWhere(rhs)
    val pred = predSrc.map(p => new P(lex(p)).parseExpr())
    (s.substring(0, i).trim, new P(lex(aggSrc)).parseAgg(pred))
  }

  /** Collect FORK's top-level parenthesized branch bodies. */
  private def forkBranches(body: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var depth = 0; var inStr = false; var start = -1
    body.zipWithIndex.foreach { case (c, i) =>
      c match {
        case '"' => inStr = !inStr
        case '(' if !inStr =>
          if (depth == 0) start = i + 1
          depth += 1
        case ')' if !inStr =>
          depth -= 1
          if (depth == 0) { out += body.substring(start, i).trim; start = -1 }
        case other if depth == 0 && !other.isWhitespace && !inStr =>
          throw new IllegalArgumentException(s"FORK expects (branch) (branch): $body")
        case _ =>
      }
    }
    require(depth == 0, s"unbalanced parens in FORK: $body")
    out.toSeq
  }

  /** Split `AGG(...) WHERE pred` at the top-level WHERE (quote- and
    * paren-aware; WHERE inside the agg's parens never splits). */
  private def splitAggWhere(s: String): (String, Option[String]) = {
    var depth = 0; var inStr = false
    var i = 0
    val lower = s.toLowerCase
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr => depth -= 1
        case _ =>
      }
      if (!inStr && depth == 0 && lower.startsWith(" where ", i))
        return (s.substring(0, i), Some(s.substring(i + 7)))
      i += 1
    }
    (s, None)
  }
}
