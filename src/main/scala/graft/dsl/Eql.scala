package graft.dsl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mini-EQL — the ES Event Query Language surface (`_eql/search`,
  * the security/correlation API).
  *
  * Grammar subset:
  * {{{
  *   <type> where <predicate>
  *   sequence by <field> [with maxspan=<n><ms|s|m|h>]
  *     [ <type> [where <pred>] ] [ <type> [where <pred>] ] ...
  * }}}
  *
  * Predicates are the comparison subset (`==`/`!=` normalize to SQL).
  * Steps may repeat a type (`[ b ] with runs=N` expands to N copies);
  * an event satisfying several levels extends a different chain at
  * each level, never two slots of one chain (strict row precedence).
  *
  * Sequence semantics: a match is reported per FINAL-step event, each
  * step pairing with the LATEST qualifying earlier-step event of the
  * same key, whole-sequence span bounded by `maxspan`. This is NOT a
  * lossy subset of ES's any-predecessor matching for match existence:
  * chain start times are monotone over completion order, so the
  * latest carried chain always has maximal slack — if ANY in-window
  * predecessor chain completes at a final event, the latest carry
  * completes one too (property-tested against brute-force
  * enumeration, incl. runs-steps and until kills —
  * EqlPropertySpec "latest-predecessor == any-predecessor"). What
  * differs from ES is enumeration, not existence: ES can emit several
  * overlapping sequences ending at different events consuming the
  * same predecessors; graft reports the deterministic one per final
  * event — the form an oracle can mirror.
  *
  * Plan shape — the as-of-join shape, NOT a self-join: tag step rows
  * in one narrow projection, ONE shuffle on the sequence key, then
  * k-1 key-partitioned window passes over the SAME partitioning
  * (Catalyst reuses the exchange), each carrying the latest completed
  * prefix chain forward with `last(_, ignoreNulls)` over
  * UNBOUNDED PRECEDING .. 1 PRECEDING (strict precedence). Per-key
  * cost is linear in events; there is no candidate-pair explosion at
  * any scale, and keys parallelize across executors.
  *
  * Timestamps run in µs (`ts_ns div 1000`): exact integer math that
  * the DuckDB oracle (whose parquet reader truncates ns to µs)
  * reproduces bit-for-bit.
  */
object Eql {

  private val seqRe =
    """(?s)^sequence\s+by\s+(\w+(?:\s*,\s*\w+)*)(?:\s+with\s+maxspan=(\d+)((?i:ms|s|m|h|d)))?\s*(.+?)(?:\s+until\s*(\[.+\]))?(?:\s*\|\s*(head|tail)\s+(\d+))?\s*$""".r
  private val stepRe =
    """(!?)\[\s*(\w+)(?:\s+where\s+([^\]]+))?\s*\](?:\s+with\s+runs=(\d+))?""".r
  private val simpleRe = """(?s)^(\w+)\s+where\s+(.+?)(?:\s*\|\s*(head|tail)\s+(\d+))?\s*$""".r

  /** EQL predicate → Column. The comparison subset rides on Spark
    * SQL's parser; EQL-named functions that Spark spells differently
    * rewrite first:
    *  - `wildcard(f, "a*b", ...)` → LIKE per pattern (`*`→`%`, `?`→`_`)
    *  - `cidrmatch(f, "a.b.c.d/n", ...)` → numeric range per block
    *    (the codegen'd ipValue math, same as the CIDR_MATCH ES|QL fn)
    *  - `stringContains(a, b)` → `contains(a, b)`
    * Spark already spells `length`, `substring`, `concat`,
    * `startswith`, `endswith` the way EQL does (case-insensitive). */
  /** Collapse `==` to `=` OUTSIDE string literals only — a compared
    * value containing "==" (command lines, key=value blobs) must
    * survive verbatim. */
  private def rewriteEq(src: String): String = {
    val sb = new StringBuilder(src.length)
    var inStr = false
    var i = 0
    while (i < src.length) {
      val c = src.charAt(i)
      if (c == '"') { inStr = !inStr; sb += c; i += 1 }
      else if (!inStr && c == '=' && i + 1 < src.length && src.charAt(i + 1) == '=') {
        sb += '='; i += 2
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Split a function-argument blob on top-level commas (quote-aware):
    * a comma INSIDE a quoted pattern is part of the pattern. */
  private def splitArgs(blob: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var inStr = false
    blob.foreach {
      case '"' => inStr = !inStr; cur += '"'
      case ',' if !inStr => out += cur.result(); cur.clear()
      case c => cur += c
    }
    out += cur.result()
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** EQL wildcard pattern -> SQL LIKE literal text: backslashes first
    * (a literal \ must reach LIKE as an escaped backslash, or Spark
    * either throws on the dangling escape or silently literalizes the
    * following wildcard), then literal %/_ escapes, then *->% ?->_,
    * then SQL single-quote doubling. */
  private def likeText(p: String): String = {
    // EQL strings spell ONE literal backslash as "\\" — unescape to a
    // marker first (stray singles count as literal too), LIKE-escape
    // the metachars, then render each marker as the 4-char SQL text
    // '\\\\' (literal-parses to '\\' = one LIKE-escaped backslash)
    val mark = "\u0001"
    p.replace("\\\\", mark).replace("\\", mark)
      .replace("%", "\\%").replace("_", "\\_")
      .replace('*', '%').replace('?', '_')
      .replace(mark, "\\\\\\\\")
      .replace("'", "''")
  }

  private def pred(src: String): Column = {
    var s = rewriteEq(src).trim
    val wildRe = """(?i)wildcard\s*\(\s*(\w+)\s*,\s*([^)]+)\)""".r
    s = wildRe.replaceAllIn(s, m => {
      val f = m.group(1)
      val pats = splitArgs(m.group(2)).map(_.stripPrefix("\"").stripSuffix("\""))
      java.util.regex.Matcher.quoteReplacement(
        pats.map(p => s"$f LIKE '${likeText(p)}'").mkString("(", " OR ", ")"))
    })
    val cidrRe = """(?i)cidrmatch\s*\(\s*(\w+)\s*,\s*([^)]+)\)""".r
    s = cidrRe.replaceAllIn(s, m => {
      val f = m.group(1)
      val q = "'\\\\.'"
      val ipn = s"(CAST(split($f, $q)[0] AS BIGINT) * 16777216 + " +
        s"CAST(split($f, $q)[1] AS BIGINT) * 65536 + " +
        s"CAST(split($f, $q)[2] AS BIGINT) * 256 + CAST(split($f, $q)[3] AS BIGINT))"
      val blocks = splitArgs(m.group(2)).map(_.stripPrefix("\"").stripSuffix("\""))
      java.util.regex.Matcher.quoteReplacement(
        blocks.map { b =>
          val Array(base, bits) = b.split("/")
          val o = base.split("\\.").map(_.toLong)
          require(o.length == 4 && bits.toInt >= 0 && bits.toInt <= 32, s"bad CIDR block: $b")
          val net = (o(0) * 16777216L + o(1) * 65536L + o(2) * 256L + o(3)) /
            (1L << (32 - bits.toInt)) * (1L << (32 - bits.toInt))
          s"($ipn >= ${net}L AND $ipn < ${net + (1L << (32 - bits.toInt))}L)"
        }.mkString("(", " OR ", ")"))
    })
    s = """(?i)stringContains\s*\(""".r.replaceAllIn(s, "contains(")
    expr(s)
  }

  /** Exposed for specs: the EQL predicate compiler. */
  private[graft] def predicate(src: String): Column = pred(src)

  /** `head` keeps the FIRST n results in sort order, `tail` the LAST
    * n (still returned ascending, like EQL): ordered limit over the
    * reversed sort, then a re-sort of the tiny window. */
  private def headTail(out: DataFrame, op: String, n: Int, sortCols: Seq[Column]): DataFrame =
    op match {
      case "head" => out.limit(n)
      case "tail" =>
        out.orderBy(sortCols.map(_.desc): _*).limit(n).orderBy(sortCols: _*)
    }

  private def unitNs(n: Long, u: String): Long = u.toLowerCase(java.util.Locale.ROOT) match {
    case "ms" => n * 1000000L
    case "s" => n * 1000000000L
    case "m" => n * 60L * 1000000000L
    case "h" => n * 3600L * 1000000000L
    case "d" => n * 86400L * 1000000000L
    case other => throw new IllegalArgumentException(s"bad maxspan unit: $other")
  }

  private val sampleRe =
    """(?s)^sample\s+by\s+(\w+(?:\s*,\s*\w+)*)\s*(.+?)(?:\s*\|\s*(head|tail)\s+(\d+))?\s*$""".r

  /** The step source must parse COMPLETELY: stepRe.findAllMatchIn
    * silently skips junk, so a typo'd `whree`, a misspelled `runs`,
    * an unsupported pipe, or a maxspan with a bad unit would be
    * dropped and the query would run with a silently different shape.
    * Stripping every matched step must leave only whitespace. */
  private def requireNoResidue(stepsSrc: String, what: String): Unit = {
    val residue = stepRe.replaceAllIn(stepsSrc, " ").trim
    require(residue.isEmpty,
      s"unparsed EQL $what text (typo or unsupported clause): '$residue'")
  }

  /** Run an EQL query against the events table in `dir`. */
  def run(spark: SparkSession, dir: String, query: String): DataFrame = {
    val events = graft.Tables.events(spark, dir)
    query.trim match {
      case sampleRe(key, stepsSrc, htOp, htN) =>
        val steps = stepRe.findAllMatchIn(stepsSrc).map { m =>
          require(m.group(1).isEmpty, "sample takes no negative steps")
          require(m.group(4) == null, "sample filters take no runs=N")
          (m.group(2), Option(m.group(3)).map(pred).getOrElse(lit(true)))
        }.toSeq
        require(steps.size >= 2, s"sample needs >= 2 filters: $query")
        requireNoResidue(stepsSrc, "sample")
        val keys = key.split(",").map(_.trim).toSeq
        val out = sample(events, keys, "event_id", steps)
        Option(htOp).map(op => headTail(out, op, htN.toInt,
          keys.map(col))).getOrElse(out)
      case seqRe(key, n, u, stepsSrc, untilSrc, htOp, htN) =>
        // `[ b where p ] with runs=N` is EQL shorthand for repeating
        // the step N times (N distinct successive events must match);
        // `![ x where p ]` is a MISSING-events step killing chains at
        // the gap it sits in
        val steps = scala.collection.mutable.ArrayBuffer.empty[(String, Column)]
        val missing = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Column)]
        for (m <- stepRe.findAllMatchIn(stepsSrc)) {
          val entry = (m.group(2), Option(m.group(3)).map(pred).getOrElse(lit(true)))
          if (m.group(1) == "!") {
            require(m.group(4) == null, "a negative step takes no runs=N")
            require(steps.nonEmpty, "![...] cannot precede the first step")
            missing += ((steps.size - 1, entry._1, entry._2))
          } else {
            val runs = Option(m.group(4)).map(_.toInt).getOrElse(1)
            // ES rejects runs < 1; Seq.fill(0) would silently DELETE
            // the step and run a different sequence
            require(runs >= 1, s"runs=N must be >= 1, got $runs")
            steps ++= Seq.fill(runs)(entry)
          }
        }
        require(steps.size >= 2, s"sequence needs >= 2 steps: $query")
        requireNoResidue(stepsSrc, "sequence")
        val until = Option(untilSrc).map { src =>
          val m = stepRe.findFirstMatchIn(src).getOrElse(
            throw new IllegalArgumentException(s"bad until clause: $src"))
          (m.group(2), Option(m.group(3)).map(pred).getOrElse(lit(true)))
        }
        val maxspanNs =
          if (n == null) Long.MaxValue else unitNs(n.toLong, u)
        val keys = key.split(",").map(_.trim).toSeq
        val out = sequenceKeys(events, keys, "ts_ns", "event_id",
          steps.toSeq, maxspanNs, until, missing.toSeq)
        Option(htOp).map(op => headTail(out, op, htN.toInt,
          keys.map(col) :+ col(s"e${steps.size}_id"))).getOrElse(out)
      case simpleRe(tpe, p, htOp, htN) =>
        // `any` is EQL's type wildcard — no event_type narrowing
        val typed = if (tpe == "any") pred(p)
                    else col("event_type") === tpe && pred(p)
        val out = events.where(typed)
          .select(col("event_id"), col("user_id"), col("value"))
          .orderBy(col("event_id"))
        Option(htOp).map(op => headTail(out, op, htN.toInt,
          Seq(col("event_id")))).getOrElse(out)
      case other => throw new IllegalArgumentException(s"unsupported EQL: $other")
    }
  }

  /** EQL `sample` (8.6): UNORDERED correlation — keys where every
    * filter matched at least once, regardless of event order. One
    * partial-aggregating groupBy: per filter, the min-id example
    * event (ES returns an arbitrary example; min is the
    * deterministic choice an oracle can mirror). No window, no join —
    * the exchange carries |keys| rows. */
  def sample(
      events: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      filters: Seq[(String, Column)]): DataFrame = {
    require(filters.map(_._1).distinct.size == filters.size,
      "sample filter event types must be distinct")
    require(keyCols.nonEmpty, "sample needs at least one by-key")
    val examples = filters.zipWithIndex.map { case ((tpe, p), i) =>
      min(when(col("event_type") === tpe && p, col(idCol))).as(s"e${i + 1}_id")
    }
    // the full key TUPLE groups (EQL 8.6 sample-by semantics): keys
    // matching only under different secondary-key values must not
    // correlate
    events.groupBy(keyCols.map(col): _*)
      .agg(examples.head, examples.tail: _*)
      .where(filters.indices.map(i => col(s"e${i + 1}_id").isNotNull).reduce(_ && _))
      .orderBy(keyCols.map(c => col(c).asc): _*)
  }

  /** Single-key convenience overload. */
  def sample(
      events: DataFrame,
      keyCol: String,
      idCol: String,
      filters: Seq[(String, Column)]): DataFrame =
    sample(events, Seq(keyCol), idCol, filters)

  /** Sequence correlation over arbitrary frames (exposed for specs).
    * `steps` = (event_type, extra predicate); types must be distinct.
    * An `until` event KILLS in-flight partial sequences (EQL's
    * expiration clause): until rows write a sentinel into every chain
    * column, so the last() carry picks the sentinel instead of a live
    * chain and the validity check rejects it — no extra pass. */
  def sequence(
      events: DataFrame,
      keyCol: String,
      tsNsCol: String,
      idCol: String,
      steps: Seq[(String, Column)],
      maxspanNs: Long,
      until: Option[(String, Column)] = None,
      missing: Seq[(Int, String, Column)] = Nil): DataFrame =
    sequenceKeys(events, Seq(keyCol), tsNsCol, idCol, steps, maxspanNs, until,
      missing)

  /** Multi-key form — EQL's `sequence by host, user`: the join key is
    * the TUPLE. Identical plan shape; the one shuffle and every window
    * pass partition on all keys together. */
  /** `missing` — EQL 8.x missing-events steps (`![type, pred]`): entry
    * (L, type, pred) means an event of that type matching pred KILLS
    * every chain whose completed prefix currently ends at level L —
    * the sequence only matches when the negative event does NOT occur
    * between step L and step L+1. Mechanically a per-LEVEL `until`:
    * the kill row writes the dead-chain sentinel into level L's carry
    * columns only, so prefixes completed after the kill still extend. */
  def sequenceKeys(
      events: DataFrame,
      keyCols: Seq[String],
      tsNsCol: String,
      idCol: String,
      steps: Seq[(String, Column)],
      maxspanNs: Long,
      until: Option[(String, Column)] = None,
      missing: Seq[(Int, String, Column)] = Nil): DataFrame = {
    until.foreach { case (t, _) =>
      require(!steps.exists(_._1 == t), s"until type duplicates a step: $t") }
    missing.foreach { case (lvl, t, _) =>
      require(lvl >= 0 && lvl < steps.size - 1,
        s"missing-step level $lvl out of gaps 0..${steps.size - 2}")
      require(!steps.exists(_._1 == t), s"missing type duplicates a step: $t") }
    val k = steps.size
    val maxspanUs = if (maxspanNs == Long.MaxValue) Long.MaxValue else maxspanNs / 1000L
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("_ts"), col(idCol))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)

    // Per-LEVEL match flags, not a single step index: duplicate step
    // types (the `with runs=N` expansion) mean one event can satisfy
    // several levels and extend a different chain at each — strict
    // row precedence in the carries still prevents one event filling
    // two slots of the SAME chain. An until row matches no level.
    val isUntil = col("_until")
    var df = events
      .withColumn("_ts", org.apache.spark.sql.functions.expr(s"$tsNsCol div 1000"))
      .withColumn("_until", until match {
        case Some((tpe, p)) => col("event_type") === tpe && p
        case None => lit(false)
      })
    for (((tpe, p), i) <- steps.zipWithIndex)
      df = df.withColumn(s"_m$i", !isUntil && col("event_type") === tpe && p)
    def killAt(lvl: Int): Column =
      missing.filter(_._1 == lvl)
        .map { case (_, tpe, p) => col("event_type") === tpe && p }
        .reduceOption(_ || _).getOrElse(lit(false))
    for (lvl <- missing.map(_._1).distinct)
      df = df.withColumn(s"_kill$lvl", killAt(lvl))
    def killCol(lvl: Int): Column =
      if (missing.exists(_._1 == lvl)) col(s"_kill$lvl") else lit(false)
    df = df
      .where((0 until k).map(i => col(s"_m$i")).reduce(_ || _) || isUntil ||
        missing.map(_._1).distinct.map(killCol).reduceOption(_ || _).getOrElse(lit(false)))
      .withColumn("c0_t0",
        when(isUntil || killCol(0), lit(Long.MinValue)).when(col("_m0"), col("_ts")))
      .withColumn("c0_i0",
        when(isUntil || killCol(0), lit(Long.MinValue)).when(col("_m0"), col(idCol)))

    for (i <- 1 until k) {
      // latest completed prefix chain strictly before this row; the
      // carried columns are non-null only together, so independent
      // last() calls all read the same chain row
      val carried = (0 until i).flatMap { j =>
        Seq(
          last(col(s"c${i - 1}_t$j"), ignoreNulls = true).over(wPrev).as(s"p_t$j"),
          last(col(s"c${i - 1}_i$j"), ignoreNulls = true).over(wPrev).as(s"p_i$j"))
      }
      df = df.select(col("*") +: carried: _*)
      val valid = col(s"_m$i") && col("p_t0").isNotNull &&
        col("p_t0") =!= Long.MinValue && // sentinel: an until row killed the chain (MinValue cannot collide with a real microsecond ts or id, unlike -1)
        (if (maxspanUs == Long.MaxValue) lit(true)
         else col("_ts") - col("p_t0") <= maxspanUs)
      val dead = isUntil || killCol(i)
      for (j <- 0 until i) {
        df = df
          .withColumn(s"c${i}_t$j", when(dead, lit(Long.MinValue)).when(valid, col(s"p_t$j")))
          .withColumn(s"c${i}_i$j", when(dead, lit(Long.MinValue)).when(valid, col(s"p_i$j")))
      }
      df = df
        .withColumn(s"c${i}_t$i", when(dead, lit(Long.MinValue)).when(valid, col("_ts")))
        .withColumn(s"c${i}_i$i", when(dead, lit(Long.MinValue)).when(valid, col(idCol)))
        .drop((0 until i).flatMap(j => Seq(s"p_t$j", s"p_i$j")): _*)
    }
    val last_ = k - 1
    val ids = (0 until k).map(j => col(s"c${last_}_i$j").as(s"e${j + 1}_id"))
    df.where(col(s"c${last_}_t$last_").isNotNull && col(s"c${last_}_t$last_") =!= Long.MinValue)
      .select(keyCols.map(col) ++ ids :+
        // integer div, not `/`: double division rounds to the nearest
        // representable value and a truncating cast on that can cross
        // an integer boundary the exact quotient does not
        org.apache.spark.sql.functions
          .expr(s"(c${last_}_t$last_ - c${last_}_t0) div 1000").as("span_ms"): _*)
      .orderBy(keyCols.map(col) :+ col(s"e${k}_id"): _*)
  }
}
