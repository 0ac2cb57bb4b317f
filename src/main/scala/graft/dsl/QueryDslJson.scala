package graft.dsl

import graft.search.Search
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Compiler from Elasticsearch Query-DSL JSON (the reference's
  * `es.query` payload format) to a Catalyst predicate.
  *
  * A user of the reference connector passes queries like
  * `{"bool": {"must": [{"range": {"price": {"gte": 10}}}]}}` via
  * `es.query`; graft accepts the same JSON and compiles it to a
  * `Column`, so it benefits from parquet pushdown instead of ES
  * shard-side filtering. Full-text clauses (match/match_phrase) compile
  * to the analyzed-token predicates in graft.search.Search.
  *
  * `_id` in `ids` queries resolves against `idField`.
  */
object QueryDslJson {

  /** ES multi-field addressing: `f.keyword` is the exact-match
    * subfield of a text field — on graft's flat model the parent
    * column already holds the raw value, so the suffix strips to the
    * parent (term/sort semantics on `.keyword` are exactly Spark's
    * string equality/ordering). A real struct field literally named
    * `keyword` would be shadowed; name it anything else. */
  private def fieldRef(f: String): org.apache.spark.sql.Column =
    col(if (f.endsWith(".keyword")) f.dropRight(".keyword".length) else f)


  def compile(json: String, idField: String = "_id"): Column =
    compileNode(JsonMethods.parse(json), idField, None)

  /** Frame-aware form: clauses that must consult the CORPUS at
    * compile time — the ES 8.12 `knn` query's rewrite-to-id-set, the
    * ES 8.15 `semantic` query — need the frame being searched. The
    * pure-Column form rejects them loudly instead of guessing. */
  def compile(json: String, idField: String,
      corpus: org.apache.spark.sql.DataFrame): Column =
    compileNode(JsonMethods.parse(json), idField, Some(corpus))

  /** The (field, query-text) of every SCORING clause in the query tree
    * — `match` clauses at the top level or under bool must/should.
    * Filter context (bool.filter, must_not) contributes no score,
    * mirroring ES; the connector's `readMetadata` sums BM25 over these
    * clauses to populate `_score`. */
  def scoringClauses(json: String): Seq[(String, String)] =
    collectScoring(JsonMethods.parse(json))

  private def collectScoring(q: JValue): Seq[(String, String)] = q match {
    case JObject(JField("match", JObject(JField(f, body) :: Nil)) :: Nil) =>
      body match {
        case JObject(fields) =>
          fields.toMap.get("query").map(v => f -> lits(v).toString).toSeq
        case v => Seq(f -> lits(v).toString)
      }
    case JObject(JField("bool", JObject(fields)) :: Nil) =>
      val m = fields.toMap
      Seq("must", "should").flatMap(k => m.get(k).toSeq.flatMap {
        case JArray(xs) => xs.flatMap(collectScoring)
        case single => collectScoring(single)
      })
    case _ => Nil
  }

  private def lits(v: JValue): Any = v match {
    case JString(s) => s
    case JInt(i) => i.toLong
    case JLong(l) => l
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case JBool(b) => b
    case other => throw new IllegalArgumentException(s"unsupported literal: $other")
  }

  /** The intervals query's rule tree.
    *
    *   - `{"match": {"query", "max_gaps", "ordered"}}` — positional
    *     proximity: ordered routes to the phrase-slop kernel,
    *     unordered to the minimal-window kernel; no gap bound = plain
    *     all-terms AND (max_gaps = 0 means adjacent, like ES)
    *   - `{"prefix": {"prefix": p}}` — any analyzed token starts
    *     with p (one compiled prefix-slot pass)
    *   - `{"any_of": {"intervals": [...]}}` — disjunction of sub-rules
    *   - `{"all_of": {"intervals": [...], "max_gaps", "ordered"}}` —
    *     proximity over slots, where each slot is a single-term match,
    *     a prefix, or an any_of of those: alternative sets expand to
    *     the (bounded) cartesian product of slot assignments, each a
    *     compiled span pass, OR-ed — the same expansion ES's automata
    *     perform. Subset constraint (kernel): a slot assignment with
    *     duplicate terms is rejected.
    */
  private def compileInterval(c: Column, rule: JValue): Column = rule match {
    case JObject(JField("match", JObject(parts)) :: Nil) =>
      val m = parts.toMap
      val q = lits(m.getOrElse("query",
        throw new IllegalArgumentException("intervals match needs query"))).toString
      val maxGaps = m.get("max_gaps").map(lits(_).toString.toInt).getOrElse(-1)
      val ordered = m.get("ordered").map(lits(_).toString.toBoolean).getOrElse(false)
      m.get("filter") match {
        // {"filter": {"not_containing"|"containing"|"not_overlapping"
        //  |"overlapping": {"match": {"query": t}}}} — some
        // qualifying source window must (not) contain t strictly
        // inside (containing family) or touch it anywhere in the
        // closed window (overlapping family). Compiled kernel over
        // the position lists; subset: two-term source, single-term
        // filter
        case Some(JObject(JField(mode @ ("not_containing" | "containing" |
            "not_overlapping" | "overlapping"), inner) :: Nil)) =>
          val terms = graft.analysis.Analyzer.analyze(q)
          require(terms.length == 2 && maxGaps >= 0,
            s"intervals filter needs a two-term bounded source match (got: $q)")
          val fTerm = inner match {
            case JObject(JField("match", JObject(fp)) :: Nil) =>
              val ft = graft.analysis.Analyzer.analyze(
                lits(fp.toMap.getOrElse("query",
                  throw new IllegalArgumentException("filter match needs query"))).toString)
              require(ft.length == 1, "intervals filter takes a single-term match")
              ft.head
            case other => throw new IllegalArgumentException(s"bad filter rule: $other")
          }
          org.apache.spark.sql.GraftBridge.column(graft.expr.IntervalFilterMatch(
            org.apache.spark.sql.GraftBridge.expression(
              graft.analysis.Analyzer.tokens(c)),
            terms.head, terms(1), fTerm, maxGaps, ordered,
            wantContained = !mode.startsWith("not_"),
            strictInside = mode.endsWith("containing")))
        case Some(other) =>
          throw new IllegalArgumentException(s"unsupported intervals filter: $other")
        case None =>
          if (maxGaps < 0) Search.matchQueryAnd(c, q)
          else if (ordered) Search.matchPhraseSlop(c, q, maxGaps)
          else Search.spanNear(c, q, maxGaps)
      }

    case JObject(JField("prefix", JObject(parts)) :: Nil) =>
      val p = lits(parts.toMap.getOrElse("prefix",
        throw new IllegalArgumentException("intervals prefix needs prefix"))).toString
      Search.spanNearMulti(c, Seq((p, true)), 0)

    case JObject(JField("any_of", JObject(parts)) :: Nil) =>
      intervalList(parts.toMap).map(compileInterval(c, _)).reduce(_ || _)

    case JObject(JField("all_of", JObject(parts)) :: Nil) =>
      val m = parts.toMap
      val maxGaps = m.get("max_gaps").map(lits(_).toString.toInt).getOrElse(-1)
      val ordered = m.get("ordered").map(lits(_).toString.toBoolean).getOrElse(false)
      // each sub-rule yields the slot's alternative (term, prefix?) set
      val slots: Seq[Seq[(String, Boolean)]] = intervalList(m).map(slotAlternatives)
      val combos = slots.foldLeft(Seq(Seq.empty[(String, Boolean)])) { (acc, alts) =>
        for (prefix <- acc; a <- alts) yield prefix :+ a
      }
      require(combos.size <= 64,
        s"intervals all_of expands to ${combos.size} slot assignments (cap 64)")
      combos.map { combo =>
        require(combo.map(_._1).distinct.size == combo.size,
          "intervals all_of: a slot assignment repeats a term (unsupported)")
        if (maxGaps < 0 && combo.forall(!_._2))
          Search.matchQueryAnd(c, combo.map(_._1).mkString(" "))
        else if (ordered && combo.forall(!_._2))
          Search.matchPhraseSlop(c, combo.map(_._1).mkString(" "),
            math.max(0, maxGaps))
        else Search.spanNearMulti(c, combo, math.max(0, maxGaps))
      }.reduce(_ || _)

    case other => throw new IllegalArgumentException(s"unsupported intervals rule: $other")
  }

  private def intervalList(m: Map[String, JValue]): Seq[JValue] = m.get("intervals") match {
    case Some(JArray(xs)) if xs.nonEmpty => xs
    case _ => throw new IllegalArgumentException("intervals rule needs a non-empty intervals list")
  }

  /** A slot inside all_of: single-term match, prefix, or any_of of
    * those (alternatives for this position). */
  private def slotAlternatives(rule: JValue): Seq[(String, Boolean)] = rule match {
    case JObject(JField("match", JObject(parts)) :: Nil) =>
      val q = lits(parts.toMap.getOrElse("query",
        throw new IllegalArgumentException("intervals match needs query"))).toString
      val terms = graft.analysis.Analyzer.analyze(q)
      require(terms.length == 1,
        s"all_of slots take single-term matches (got: $q); nest multi-term rules via any_of")
      Seq((terms.head, false))
    case JObject(JField("prefix", JObject(parts)) :: Nil) =>
      Seq((lits(parts.toMap.getOrElse("prefix",
        throw new IllegalArgumentException("intervals prefix needs prefix"))).toString, true))
    case JObject(JField("any_of", JObject(parts)) :: Nil) =>
      intervalList(parts.toMap).flatMap(slotAlternatives)
    case other => throw new IllegalArgumentException(s"unsupported all_of slot: $other")
  }

  private def caseInsensitive(m: Map[String, JValue]): Boolean =
    m.get("case_insensitive").exists(v => lits(v).toString.toBoolean)

  private def arr(v: JValue): Seq[Any] = v match {
    case JArray(xs) => xs.map(lits)
    case single => Seq(lits(single))
  }

  private def clauses(v: JValue, idField: String,
      corpus: Option[org.apache.spark.sql.DataFrame]): Seq[Column] = v match {
    case JArray(xs) => xs.map(compileNode(_, idField, corpus))
    case JNothing | JNull => Nil
    case single => Seq(compileNode(single, idField, corpus))
  }

  private def compileNode(q: JValue, idField: String,
      corpus: Option[org.apache.spark.sql.DataFrame]): Column = q match {
    case JObject(JField(op, body) :: Nil) =>
      (op, body) match {
        case ("match_all", _) => lit(true)
        case ("match_none", _) => lit(false)

        // {"dis_max": {"queries": [...]}} — in filter context a doc
        // matches if ANY subquery matches (tie_breaker only shapes
        // scores; Search.disMaxTopK is the scoring path)
        case ("dis_max", JObject(parts)) =>
          parts.toMap.get("queries") match {
            case Some(JArray(xs)) if xs.nonEmpty =>
              xs.map(compileNode(_, idField, corpus)).reduce(_ || _)
            case _ => throw new IllegalArgumentException("dis_max needs queries")
          }

        case ("term", JObject(JField(f, JObject(fields)) :: Nil))
            if fields.exists(_._1 == "value") =>
          val m = fields.toMap
          val v = lits(m("value"))
          // case_insensitive (ES 7.10): normalize both sides — the
          // predicate stays a plain comparison, still codegen'd
          if (caseInsensitive(m)) lower(fieldRef(f)) === lit(v.toString.toLowerCase)
          else QueryDsl.term(fieldRef(f), v)
        case ("term", JObject(JField(f, v) :: Nil)) => QueryDsl.term(fieldRef(f), lits(v))

        case ("terms", JObject(JField(f, v) :: Nil)) => QueryDsl.terms(fieldRef(f), arr(v))

        case ("ids", JObject(fields)) =>
          QueryDsl.ids(col(idField), arr(fields.find(_._1 == "values")
            .getOrElse(throw new IllegalArgumentException("ids needs values"))._2))

        case ("range", JObject(JField(f, JObject(bounds)) :: Nil)) =>
          val b = bounds.toMap
          // boost is a legal no-op in filter context (like ES); keys
          // that would CHANGE semantics (format, time_zone, relation)
          // must not be silently dropped
          val unknownB = b.keySet -- Set("gte", "gt", "lte", "lt", "boost")
          require(unknownB.isEmpty,
            s"unsupported range option(s) on '$f': ${unknownB.toSeq.sorted.mkString(", ")}")
          QueryDsl.range(fieldRef(f),
            gte = b.get("gte").map(lits), gt = b.get("gt").map(lits),
            lte = b.get("lte").map(lits), lt = b.get("lt").map(lits))

        case ("exists", JObject(fields)) =>
          QueryDsl.exists(col(fields.find(_._1 == "field").map(x => lits(x._2).toString)
            .getOrElse(throw new IllegalArgumentException("exists needs field"))))

        case ("prefix", JObject(JField(f, JObject(fields)) :: Nil))
            if fields.exists(_._1 == "value") =>
          val m = fields.toMap
          val p = lits(m("value")).toString
          if (caseInsensitive(m)) lower(fieldRef(f)).startsWith(p.toLowerCase)
          else QueryDsl.prefix(fieldRef(f), p)
        case ("prefix", JObject(JField(f, v) :: Nil)) =>
          QueryDsl.prefix(fieldRef(f), lits(v).toString)
        case ("wildcard", JObject(JField(f, JObject(fields)) :: Nil))
            if fields.exists(_._1 == "value") =>
          val m = fields.toMap
          val p = lits(m("value")).toString
          if (caseInsensitive(m)) QueryDsl.wildcard(lower(fieldRef(f)), p.toLowerCase)
          else QueryDsl.wildcard(fieldRef(f), p)
        case ("wildcard", JObject(JField(f, v) :: Nil)) =>
          QueryDsl.wildcard(fieldRef(f), lits(v).toString)
        case ("regexp", JObject(JField(f, JObject(fields)) :: Nil))
            if fields.exists(_._1 == "value") =>
          val m = fields.toMap
          val re = lits(m("value")).toString
          // ES case_insensitive maps to the regex engine's (?i) flag
          if (caseInsensitive(m)) QueryDsl.regexp(fieldRef(f), "(?i)" + re)
          else QueryDsl.regexp(fieldRef(f), re)
        case ("regexp", JObject(JField(f, v) :: Nil)) =>
          QueryDsl.regexp(fieldRef(f), lits(v).toString)

        case ("fuzzy", JObject(JField(f, JObject(fields)) :: Nil)) =>
          val m = fields.toMap
          val value = lits(m("value")).toString
          val edits = m.get("fuzziness").map(lits(_).toString.toInt).getOrElse(2)
          // ES defaults transpositions to TRUE, but graft's historical
          // fuzzy semantics (and the plain-levenshtein oracle queries)
          // count a swap as two edits — so the Damerau kernel engages
          // only when the clause asks for it explicitly
          if (m.get("transpositions").exists(lits(_).toString.toBoolean))
            QueryDsl.fuzzyTranspositions(fieldRef(f), value, edits)
          else QueryDsl.fuzzy(fieldRef(f), value, edits)
        case ("fuzzy", JObject(JField(f, v) :: Nil)) =>
          QueryDsl.fuzzy(fieldRef(f), lits(v).toString)

        case ("match", JObject(JField(f, JObject(fields)) :: Nil))
            if fields.exists(_._1 == "query") =>
          val m = fields.toMap
          val query = lits(m("query")).toString
          val andOp = m.get("operator").map(lits(_).toString.toLowerCase).contains("and")
          // zero_terms_query: what an all-stopword query matches once
          // analysis strips every term (none = nothing, all = all)
          val zeroTerms = m.get("zero_terms_query").map(lits(_).toString.toLowerCase)
          if (graft.analysis.Analyzer.analyze(query).isEmpty)
            Search.matchQueryZeroTerms(fieldRef(f), query, zeroTerms.getOrElse("none"))
          else m.get("fuzziness").map(lits(_).toString) match {
            case Some(s) if s.equalsIgnoreCase("auto") =>
              // length-scaled like ES: 0 edits (<3 chars), 1 (<6), 2
              Search.matchQueryFuzzyAuto(fieldRef(f), query, andOp)
            case Some(s) => Search.matchQueryFuzzy(fieldRef(f), query, s.toInt, andOp)
            case None if andOp => Search.matchQueryAnd(fieldRef(f), query)
            case None => Search.matchQuery(fieldRef(f), query)
          }
        case ("match", JObject(JField(f, v) :: Nil)) =>
          Search.matchQuery(fieldRef(f), lits(v).toString)

        // multi_match in FILTER context: a doc matches when ANY listed
        // field matches (best/most_fields differ only in scoring);
        // `operator: and` gates per field; `cross_fields` blends the
        // fields into one derived column so AND is satisfiable ACROSS
        // fields; `phrase` gates on the phrase per field. Boost
        // suffixes (`title^2`) are scoring-only and ignored here.
        case ("multi_match", JObject(parts)) =>
          val m = parts.toMap
          val q = lits(m.getOrElse("query",
            throw new IllegalArgumentException("multi_match needs query"))).toString
          val fields = m.get("fields") match {
            case Some(JArray(xs)) if xs.nonEmpty =>
              Search.parseBoostFields(xs.map(lits(_).toString)).map(_._1)
            case _ => throw new IllegalArgumentException("multi_match needs fields")
          }
          val andOp = m.get("operator").map(lits(_).toString.toLowerCase).contains("and")
          m.get("type").map(lits(_).toString) match {
            case Some("cross_fields") =>
              val blended = org.apache.spark.sql.functions.concat_ws(
                " ", fields.map(fieldRef): _*)
              if (andOp) Search.matchQueryAnd(blended, q) else Search.matchQuery(blended, q)
            case Some("phrase") =>
              fields.map(f => Search.matchPhrase(fieldRef(f), q)).reduce(_ || _)
            case None | Some("best_fields") | Some("most_fields") =>
              fields.map { f =>
                if (andOp) Search.matchQueryAnd(fieldRef(f), q)
                else Search.matchQuery(fieldRef(f), q)
              }.reduce(_ || _)
            case Some(other) => throw new IllegalArgumentException(
              s"unsupported multi_match type in filter context: $other")
          }

        case ("match_phrase", JObject(JField(f, JObject(fields)) :: Nil))
            if fields.exists(_._1 == "query") =>
          Search.matchPhrase(fieldRef(f), lits(fields.toMap.apply("query")).toString)
        case ("match_phrase", JObject(JField(f, v) :: Nil)) =>
          Search.matchPhrase(fieldRef(f), lits(v).toString)

        case ("query_string", JObject(fields)) =>
          val m = fields.toMap
          val query = lits(m.getOrElse("query",
            throw new IllegalArgumentException("query_string needs query"))).toString
          val qFields = m.get("fields").map(arr(_).map(f => col(f.toString)))
            .getOrElse(throw new IllegalArgumentException("query_string needs fields"))
          Search.queryString(qFields, query)

        // geo: a point "field" f maps to columns f_lat / f_lon
        case ("geo_distance", JObject(parts)) =>
          val m = parts.toMap
          val dist = m.getOrElse("distance",
            throw new IllegalArgumentException("geo_distance needs distance"))
          val km = lits(dist).toString match {
            case d if d.endsWith("km") => d.dropRight(2).toDouble
            case d if d.endsWith("m") => d.dropRight(1).toDouble / 1000.0
            case d => d.toDouble / 1000.0 // ES default unit: meters
          }
          val (f, point) = m.find(_._1 != "distance")
            .getOrElse(throw new IllegalArgumentException("geo_distance needs a point field"))
          val p = point.asInstanceOf[JObject].obj.toMap
          graft.rel.Relational.geoDistance(
            col(s"${f}_lat"), col(s"${f}_lon"),
            lits(p("lat")).toString.toDouble, lits(p("lon")).toString.toDouble, km)

        case ("geo_bounding_box", JObject(JField(f, JObject(corners)) :: Nil)) =>
          val c = corners.toMap
          val tl = c("top_left").asInstanceOf[JObject].obj.toMap
          val br = c("bottom_right").asInstanceOf[JObject].obj.toMap
          graft.rel.Relational.geoBoundingBox(
            col(s"${f}_lat"), col(s"${f}_lon"),
            top = lits(tl("lat")).toString.toDouble,
            left = lits(tl("lon")).toString.toDouble,
            bottom = lits(br("lat")).toString.toDouble,
            right = lits(br("lon")).toString.toDouble)

        // {"span_near": {"clauses": [{"span_term": {f: w}}, ...],
        //  "slop": n, "in_order": true|false}} — all clauses must
        // target one field (the ES span family's own constraint)
        // {"span_term": {f: "term"}} — single-term span leaf (token
        // containment; spans only differ from terms once combined)
        case ("span_term", JObject(JField(f, v) :: Nil)) =>
          Search.matchQueryAnd(fieldRef(f), lits(v).toString)

        // {"span_or": {"clauses": [<span_term|span_near>...]}}
        case ("span_or", JObject(parts)) =>
          parts.toMap.get("clauses") match {
            case Some(JArray(xs)) =>
              Search.spanOr(xs.map(compileNode(_, idField, corpus)))
            case _ => throw new IllegalArgumentException("span_or needs clauses")
          }

        // {"span_not": {"include": {"span_term": {f: w}},
        //  "exclude": {"span_term": {f: w}}, "pre": n, "post": n}} —
        // include hit with no exclude hit in the window
        case ("span_not", JObject(parts)) =>
          val m = parts.toMap
          def spanTerm(key: String): (String, String) = m.get(key) match {
            case Some(JObject(JField("span_term", JObject(JField(f, v) :: Nil)) :: Nil)) =>
              (f, lits(v).toString)
            case other => throw new IllegalArgumentException(s"span_not $key: bad clause $other")
          }
          val (incF, incT) = spanTerm("include")
          val (excF, excT) = spanTerm("exclude")
          require(incF == excF, "span_not include/exclude must target one field")
          val pre = m.get("pre").map(lits(_).toString.toInt).getOrElse(0)
          val post = m.get("post").map(lits(_).toString.toInt).getOrElse(0)
          Search.spanNot(col(incF), incT, excT, pre, post)

        // {"span_within": {"little": {"span_term": {f: w}},
        //  "big": {"span_near": {"clauses": [...], "slop": n}}}} and
        // {"span_containing": ...} — same doc-level predicate (they
        // differ only in which span feeds an ENCLOSING span query)
        case (key @ ("span_within" | "span_containing"), JObject(parts)) =>
          val m = parts.toMap
          val little = m.get("little") match {
            case Some(JObject(JField("span_term", JObject(JField(f, v) :: Nil)) :: Nil)) =>
              (f, lits(v).toString)
            case other => throw new IllegalArgumentException(s"$key little: bad clause $other")
          }
          val (bigF, bigTerms, slop) = m.get("big") match {
            case Some(JObject(JField("span_near", JObject(nearParts)) :: Nil)) =>
              val nm = nearParts.toMap
              val cls = nm.get("clauses") match {
                case Some(JArray(xs)) => xs.map {
                  case JObject(JField("span_term", JObject(JField(f, v) :: Nil)) :: Nil) =>
                    (f, lits(v).toString)
                  case other => throw new IllegalArgumentException(s"$key big clause: $other")
                }
                case _ => throw new IllegalArgumentException(s"$key big needs clauses")
              }
              require(cls.map(_._1).distinct.length == 1,
                s"$key big clauses must target one field")
              (cls.head._1, cls.map(_._2),
                nm.get("slop").map(lits(_).toString.toInt).getOrElse(0))
            case other => throw new IllegalArgumentException(s"$key big: bad clause $other")
          }
          require(little._1 == bigF, s"$key little/big must target one field")
          Search.spanWithin(col(bigF), little._2, bigTerms.mkString(" "), slop)

        // {"match_bool_prefix": {f: "quick bro"}} — terms anywhere,
        // last as prefix (search-as-you-type bool form)
        case ("match_bool_prefix", JObject(JField(f, v) :: Nil)) =>
          Search.matchBoolPrefix(fieldRef(f), lits(v).toString)

        // {"combined_fields": {"query": "...", "fields": [...]}} —
        // term-centric AND across fields
        case ("combined_fields", JObject(parts)) =>
          val m = parts.toMap
          val q = lits(m.getOrElse("query",
            throw new IllegalArgumentException("combined_fields needs query"))).toString
          val fs = m.get("fields") match {
            case Some(JArray(xs)) => xs.map(x => col(lits(x).toString))
            case _ => throw new IllegalArgumentException("combined_fields needs fields")
          }
          Search.combinedFields(fs, q)

        // {"simple_query_string": {"query": "...", "fields": [...],
        //  "default_operator": "and"|"or"}}
        case ("simple_query_string", JObject(parts)) =>
          val m = parts.toMap
          val q = lits(m.getOrElse("query",
            throw new IllegalArgumentException("simple_query_string needs query"))).toString
          val fs = m.get("fields") match {
            case Some(JArray(xs)) => xs.map(x =>
              col(lits(x).toString.split("\\^").head)) // boosts are no-ops in filter context
            case _ => throw new IllegalArgumentException("simple_query_string needs fields")
          }
          val andDefault = m.get("default_operator")
            .exists(v => lits(v).toString.equalsIgnoreCase("and"))
          Search.simpleQueryString(fs, q, defaultAnd = andDefault)

        case ("span_near", JObject(parts)) =>
          val m = parts.toMap
          // each clause: span_term (exact) or span_multi with a prefix
          // match (trailing-* wildcards normalize to prefix) — the
          // flag rides into the minimal-window kernel per slot
          val clauses = m.get("clauses") match {
            case Some(JArray(xs)) => xs.map {
              case JObject(JField("span_term", JObject(JField(f, v) :: Nil)) :: Nil) =>
                (f, lits(v).toString, false)
              case JObject(JField("span_multi", JObject(JField("match", JObject(
                  JField("prefix", JObject(JField(f, v) :: Nil)) :: Nil)) :: Nil)) :: Nil) =>
                (f, lits(v).toString, true)
              case JObject(JField("span_multi", JObject(JField("match", JObject(
                  JField("wildcard", JObject(JField(f, v) :: Nil)) :: Nil)) :: Nil)) :: Nil) =>
                val pat = lits(v).toString
                require(pat.endsWith("*") && !pat.dropRight(1).exists("*?".contains(_)),
                  s"span_multi wildcard must be a prefix pattern (abc*): $pat")
                (f, pat.dropRight(1), true)
              case other => throw new IllegalArgumentException(s"bad span clause: $other")
            }
            case _ => throw new IllegalArgumentException("span_near needs clauses")
          }
          require(clauses.map(_._1).distinct.size == 1,
            "span_near clauses must target a single field")
          val field = clauses.head._1
          val slop = m.get("slop").map(lits(_).toString.toInt).getOrElse(0)
          val inOrder = m.get("in_order").map(lits(_).toString.toBoolean).getOrElse(true)
          if (clauses.exists(_._3))
            Search.spanNearMulti(col(field), clauses.map(c => (c._2, c._3)), slop)
          else {
            val terms = clauses.map(_._2).mkString(" ")
            if (inOrder) Search.matchPhraseSlop(col(field), terms, slop)
            else Search.spanNear(col(field), terms, slop)
          }

        // {"intervals": {f: <rule>}} — the intervals query's rule tree:
        // match / prefix leaves, any_of disjunction, all_of proximity
        // composition (see compileInterval)
        case ("intervals", JObject(JField(f, rule) :: Nil)) =>
          compileInterval(fieldRef(f), rule)

        // {"terms_set": {f: {"terms": [...], "minimum_should_match": n}}}
        case ("terms_set", JObject(JField(f, JObject(parts)) :: Nil)) =>
          val m = parts.toMap
          val terms = arr(m.getOrElse("terms",
            throw new IllegalArgumentException("terms_set needs terms"))).map(_.toString)
          val msm = m.get("minimum_should_match").map(lits(_).toString.toInt)
            .getOrElse(terms.size)
          Search.termsSet(fieldRef(f), terms, lit(msm))

        case ("geo_polygon", JObject(JField(f, JObject(parts)) :: Nil)) =>
          val pts = parts.toMap.getOrElse("points",
            throw new IllegalArgumentException("geo_polygon needs points")) match {
            case JArray(xs) => xs.map { p =>
              val m = p.asInstanceOf[JObject].obj.toMap
              (lits(m("lat")).toString.toDouble, lits(m("lon")).toString.toDouble)
            }
            case other => throw new IllegalArgumentException(s"bad points: $other")
          }
          graft.rel.Relational.geoPolygon(col(s"${f}_lat"), col(s"${f}_lon"), pts)

        // {"wrapper": {"query": "<base64 of a query-dsl json>"}} — the
        // ES escape hatch for embedding a query through systems that
        // can't carry raw JSON; decode and compile recursively
        case ("wrapper", JObject(fields)) =>
          val b64 = lits(fields.toMap.getOrElse("query",
            throw new IllegalArgumentException("wrapper needs query"))).toString
          compileNode(JsonMethods.parse(new String(
            java.util.Base64.getDecoder.decode(b64),
            java.nio.charset.StandardCharsets.UTF_8)), idField, corpus)

        // {"script_score": {"query": {...}, "script": {...}}} — in
        // filter context the script only rescales scores, so the
        // clause gates on its inner query alone (ES semantics: a
        // script_score matches exactly the docs its query matches);
        // the scoring path is Search.scriptScoreTopK
        case ("script_score", JObject(parts)) =>
          compileNode(parts.toMap.getOrElse("query",
            throw new IllegalArgumentException("script_score needs query")), idField, corpus)

        // {"script": {"script": {"source": "...", "params": {...}}}} —
        // a boolean Painless filter. The subset compiles comparisons
        // inside ternaries, so the source is wrapped as
        // `(src) ? 1 : 0` and gated on != 0: one codegen'd expression,
        // same cost as a built-in predicate.
        case ("script", JObject(fields)) =>
          val inner = fields.toMap.getOrElse("script",
            throw new IllegalArgumentException("script clause needs script")) match {
            case JObject(sf) => sf.toMap
            case other => throw new IllegalArgumentException(s"bad script body: $other")
          }
          // inline source or a _scripts-stored script by id
          val src = inner.get("source").map(lits(_).toString)
            .orElse(inner.get("id").map(v => ScriptStore.resolve(lits(v).toString)))
            .getOrElse(throw new IllegalArgumentException("script needs source or id"))
          val params: Map[String, Any] = inner.get("params") match {
            case Some(JObject(ps)) => ps.map { case JField(k, v) => k -> lits(v) }.toMap
            case None => Map.empty
            case other => throw new IllegalArgumentException(s"bad params: $other")
          }
          Painless.compile(s"($src) ? 1 : 0", params) =!= lit(0.0)

        // {"sparse_vector": {"field": f, "query_vector": {tok: w}}} —
        // scoring query (Search.sparseVectorTopK); in filter context a
        // doc matches iff its dot product is nonzero, i.e. any query
        // token present
        case ("sparse_vector", JObject(parts)) =>
          val m = parts.toMap
          val f = lits(m.getOrElse("field",
            throw new IllegalArgumentException("sparse_vector needs field"))).toString
          val toks = m.get("query_vector") match {
            case Some(JObject(ps)) => ps.map { case JField(k, _) => k }
            case other => throw new IllegalArgumentException(s"bad query_vector: $other")
          }
          arrays_overlap(graft.analysis.Analyzer.tokens(fieldRef(f)), lit(toks.toArray))

        // {"pinned": {"ids": [...], "organic": {...}}} — in filter
        // context a pinned query matches organic ∪ pinned docs (the
        // promotion only affects ranking; Search.pinnedTopK is the
        // scoring path)
        case ("pinned", JObject(parts)) =>
          val m = parts.toMap
          val ids = arr(m.getOrElse("ids",
            throw new IllegalArgumentException("pinned needs ids")))
          val organic = compileNode(m.getOrElse("organic",
            throw new IllegalArgumentException("pinned needs organic")), idField, corpus)
          organic || col(idField).isin(ids: _*)

        // {"knn": {"field", "query_vector", "k", "num_candidates",
        //  "filter", "similarity"}} — the ES 8.12 QUERY-context knn
        // clause, composable under bool must/filter/should (distinct
        // from the top-level body `knn`, which SearchBody routes). ES
        // implements it as a REWRITE: the approximate search runs
        // first and the clause becomes a doc-id-set query — mirrored
        // here by running the body knn kernel (Ann.knnSearch) at
        // compile time and gating on the k-bounded id set (ES caps
        // k/num_candidates at 10^4, so the collect is bounded, like
        // search_after paging). The node's own `filter` is its
        // PRE-filter, exactly like the body form; sibling bool clauses
        // intersect afterwards, like ES.
        case ("knn", JObject(parts)) =>
          val frame = corpus.getOrElse(throw new IllegalArgumentException(
            "knn in query context rewrites against the searched corpus — " +
              "compile through the frame-aware overload (or the SearchBody " +
              "front door)"))
          val ids = graft.sim.Ann.knnSearch(frame, idField,
            JsonMethods.compact(JsonMethods.render(
              JObject(List(JField("knn", JObject(parts)))))), idField)
            .select(col("id")).collect().map(_.get(0))
          if (ids.isEmpty) lit(false)
          else col(idField).isin(ids.toSeq: _*)

        // {"semantic": {"field": f, "query": q}} — the ES 8.15
        // semantic_text query. Expansion routes through the
        // InferenceService seam (Inference.service.expandQuery —
        // ELSER's sparse (term, weight) output shape; the default
        // deterministic stub expands to unit-weight analyzed terms).
        // Filter-context semantics mirror sparse_vector: a doc matches
        // iff its expansion dot product is nonzero, i.e. any expanded
        // term present; Search.semanticTopK is the scoring path.
        case ("semantic", JObject(parts)) =>
          val m = parts.toMap
          val f = lits(m.getOrElse("field",
            throw new IllegalArgumentException("semantic needs field"))).toString
          val q = lits(m.getOrElse("query",
            throw new IllegalArgumentException("semantic needs query"))).toString
          val toks = graft.inference.Inference.service.expandQuery(q).map(_._1)
          require(toks.nonEmpty, s"semantic expansion produced no terms: $q")
          arrays_overlap(graft.analysis.Analyzer.tokens(fieldRef(f)),
            lit(toks.toArray))

        // {"text_expansion": {f: {"model_id": ..., "model_text": q}}}
        // — the pre-8.13 spelling of the ELSER query (deprecated for
        // sparse_vector but still in the wild). model_text expands
        // through the SAME InferenceService seam as `semantic`;
        // model_id names the endpoint a production service would
        // route on (the seam's single-service default ignores it —
        // deterministic stub or the swapped-in real endpoint).
        case ("text_expansion", JObject(JField(f, JObject(tparts)) :: Nil)) =>
          val m = tparts.toMap
          val unknownT = m.keySet -- Set("model_id", "model_text", "boost")
          require(unknownT.isEmpty,
            s"unsupported text_expansion option(s): ${unknownT.toSeq.sorted.mkString(", ")}")
          val q = lits(m.getOrElse("model_text",
            throw new IllegalArgumentException("text_expansion needs model_text"))).toString
          val toks = graft.inference.Inference.service.expandQuery(q).map(_._1)
          require(toks.nonEmpty, s"text_expansion produced no terms: $q")
          arrays_overlap(graft.analysis.Analyzer.tokens(fieldRef(f)),
            lit(toks.toArray))

        // {"weighted_tokens": {f: {"tokens": {tok: w, ...}}}} — the ES
        // 8.13 pre-computed token-weight form of sparse_vector (the
        // client ran the expansion model itself). Filter context: any
        // query token present (dot > 0); Search.sparseVectorTopK is
        // the scoring path. pruning_config drops low-signal tokens and
        // would CHANGE the matched set — loud, never silently ignored.
        case ("weighted_tokens", JObject(JField(f, JObject(wparts)) :: Nil)) =>
          val m = wparts.toMap
          val unknownW = m.keySet -- Set("tokens", "boost")
          require(unknownW.isEmpty,
            s"unsupported weighted_tokens option(s): ${unknownW.toSeq.sorted.mkString(", ")}")
          val toks = m.get("tokens") match {
            case Some(JObject(ps)) if ps.nonEmpty => ps.map { case JField(tk, _) => tk }
            case _ => throw new IllegalArgumentException(
              "weighted_tokens needs a non-empty tokens object")
          }
          arrays_overlap(graft.analysis.Analyzer.tokens(fieldRef(f)),
            lit(toks.toArray))

        // {"rule": {"organic": {...}, "ruleset_ids": [...],
        //  "match_criteria": {...}}} — ES 8.10 query rules. Criteria
        // match the REQUEST, so rules evaluate at compile time
        // (QueryRules.firedActions); filter-context semantics follow
        // pinned: organic ∪ fired-pinned ids, minus fired-excluded ids
        // (Search.ruleQueryTopK is the scoring path).
        case ("rule", JObject(parts)) =>
          val m = parts.toMap
          val organic = compileNode(m.getOrElse("organic",
            throw new IllegalArgumentException("rule needs organic")), idField, corpus)
          val rulesets = m.get("ruleset_ids") match {
            case Some(JArray(xs)) if xs.nonEmpty =>
              xs.map(x => RuleStore.resolve(lits(x).toString))
            case _ => throw new IllegalArgumentException("rule needs ruleset_ids")
          }
          val crit = m.get("match_criteria") match {
            case Some(JObject(ps)) =>
              ps.map { case JField(k2, v2) => k2 -> lits(v2).toString }.toMap
            case _ => throw new IllegalArgumentException("rule needs match_criteria")
          }
          val (pinnedIds, excludedIds) = QueryRules.firedActions(rulesets, crit)
          val base =
            if (pinnedIds.isEmpty) organic
            else organic || col(idField).isin(pinnedIds: _*)
          if (excludedIds.isEmpty) base
          else base && !col(idField).isin(excludedIds: _*)

        case ("bool", JObject(parts)) =>
          val m = parts.toMap
          QueryDsl.bool(
            must = clauses(m.getOrElse("must", JNothing), idField, corpus),
            filter = clauses(m.getOrElse("filter", JNothing), idField, corpus),
            should = clauses(m.getOrElse("should", JNothing), idField, corpus),
            mustNot = clauses(m.getOrElse("must_not", JNothing), idField, corpus),
            minimumShouldMatch = m.get("minimum_should_match")
              .map(lits(_).toString.toInt).getOrElse(0))

        case _ => throw new IllegalArgumentException(s"unsupported query clause: $op")
      }
    case JObject(Nil) => lit(true)
    case other => throw new IllegalArgumentException(s"expected a query object, got: $other")
  }
}
