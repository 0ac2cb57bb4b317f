package graft.dsl

import org.apache.spark.sql.Column
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The `_search` request-body front door (see `search` for the full
  * composed lifecycle): runtime_mappings, scored/filter queries,
  * top-level knn (single + list), retriever trees, collapse, rescore
  * chains, post_filter, min_score, search_after, highlight, suggest,
  * aggs, and response shaping — one JSON in, ONE Catalyst plan out,
  * unknown keys loud (`SupportedKeys`).
  *
  * ES runtime fields are computed at query time from a Painless
  * `emit(...)` script and are searchable/aggregatable like mapped
  * fields. Here each runtime field compiles (via `Painless`) to a
  * codegen'd projection added BEFORE the query predicate, so the query
  * can reference runtime fields exactly like ES — and Catalyst
  * collapses the projection into the scan stage, so an un-referenced
  * runtime field costs nothing and a referenced one is computed once.
  *
  * Numeric emits (`long`/`double`) cover the dominant runtime-field
  * use (derived measures); `keyword` passes the value through `cast
  * (string)`.
  */
object SearchBody {

  /** (runtime columns in declaration order, inner query JSON if any).
    * A payload that is NOT a body (a bare query-DSL object) comes back
    * unchanged as the query. */
  def parse(json: String): (Seq[(String, Column)], Option[String]) = {
    val rootFields = JsonMethods.parse(json) match {
      case JObject(fs) => fs
      case _ => return (Nil, Some(json))
    }
    val root = rootFields.toMap
    if (!root.contains("runtime_mappings") && !root.contains("query"))
      return (Nil, Some(json))
    val runtime = root.get("runtime_mappings").toSeq.flatMap {
      case JObject(fields) => fields.map {
        case JField(name, JObject(spec)) =>
          val m = spec.toMap
          val src = m.get("script") match {
            case Some(JObject(s)) => s.toMap.get("source") match {
              case Some(JString(code)) => code
              case _ => throw new IllegalArgumentException(
                s"runtime field '$name' script needs source")
            }
            case _ => throw new IllegalArgumentException(
              s"runtime field '$name' needs a script")
          }
          val inner = src.trim match {
            case e if e.startsWith("emit(") && e.endsWith(")") =>
              e.substring("emit(".length, e.length - 1)
            case e if e.startsWith("emit(") && e.endsWith(");") =>
              e.substring("emit(".length, e.length - 2)
            case _ => throw new IllegalArgumentException(
              s"runtime field '$name' script must be emit(<expr>): $src")
          }
          val c = Painless.compile(inner)
          val typed = m.get("type").collect { case JString(t) => t } match {
            case Some("long") => c.cast("long")
            case Some("double") | None => c
            case Some("keyword") => c.cast("string")
            case Some(other) => throw new IllegalArgumentException(
              s"unsupported runtime field type '$other' for '$name'")
          }
          name -> typed
        case other => throw new IllegalArgumentException(
          s"bad runtime field spec: $other")
      }
      case other => throw new IllegalArgumentException(
        s"runtime_mappings must be an object, got: $other")
    }
    val innerQ = root.get("query")
      .map(q => JsonMethods.compact(JsonMethods.render(q)))
    (runtime, innerQ)
  }

  /** Top-level `_search` body keys the front door composes. Anything
    * else fails LOUDLY — a silently-ignored body key would return
    * plausible-but-wrong results (ES likewise rejects unknown body
    * keys at parse time). */
  val SupportedKeys: Set[String] = Set(
    "runtime_mappings", "query", "aggs", "aggregations", "sort",
    "from", "size", "knn", "collapse", "highlight", "rescore",
    "post_filter", "min_score", "search_after", "_source",
    "script_fields", "docvalue_fields", "fields",
    // accepted with no effect: ES's accuracy knob for the hit-count
    // METADATA (clients send it by default); graft's counts are always
    // exact, so there is nothing to relax. `timeout` caps ES's
    // partial-results collection — graft results are always complete,
    // so there is no partial mode to bound.
    "track_total_hits", "timeout",
    "suggest", "retriever", "indices_boost", "rank",
    "explain", "terminate_after", "slice", "track_scores",
    "stored_fields")

  /** True when the payload is a search BODY carrying sections beyond
    * `runtime_mappings`+`query` — the connector routes such payloads
    * through `search()` so the extra sections compose (or fail
    * loudly on unknown keys) instead of being silently dropped by
    * the parse()-only path. A bare query-DSL object and a
    * runtime+query-only body keep the legacy predicate path. */
  def hasBodySections(json: String): Boolean =
    try JsonMethods.parse(json) match {
      case JObject(fs) =>
        val ks = fs.map(_._1).toSet
        (ks.contains("query") || ks.contains("runtime_mappings") ||
          ks.exists(SupportedKeys)) &&
          (ks -- Set("runtime_mappings", "query")).nonEmpty
      case _ => false
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Which non-hit sections (aggs/aggregations/suggest) a body
    * carries — such a request returns buckets/suggestions, not hits,
    * so hit-decorating features (the connector's es.read.metadata)
    * must refuse it loudly instead of failing on a missing id. */
  def nonHitSections(json: String): Seq[String] =
    try JsonMethods.parse(json) match {
      case JObject(fs) =>
        val ks = fs.map(_._1).toSet
        Seq("aggs", "aggregations", "suggest").filter(ks)
      case _ => Nil
    } catch { case scala.util.control.NonFatal(_) => Nil }

  /** True for any body-shaped payload (a `query`/`runtime_mappings`
    * wrapper or any other body section) as opposed to a bare
    * query-DSL object — for surfaces that can only evaluate a
    * predicate and must refuse bodies loudly (the DSv2 scan). */
  def isBody(json: String): Boolean =
    try JsonMethods.parse(json) match {
      case JObject(fs) => fs.map(_._1).exists(SupportedKeys)
      case _ => false
    } catch { case scala.util.control.NonFatal(_) => false }

  /** ES's collector cap, ONE definition for the hit and aggs paths.
    * ES stops each shard's collector after n arbitrary docs; the
    * deterministic single-frame reading is the first n matches in id
    * order (a TakeOrderedAndProject — top-n selection, not a full
    * sort). Documented delta: ES's per-shard arbitrary subset becomes
    * the id-ordered prefix. `terminate_after: 0` is ES's documented
    * "do not terminate early" default — a no-op, like `size: 0` on
    * an aggs request. */
  private def capTerminateAfter(df: org.apache.spark.sql.DataFrame,
      root: Map[String, JValue], idField: String): org.apache.spark.sql.DataFrame =
    root.get("terminate_after").map(jnum(_).toInt) match {
      case None | Some(0) => df
      case Some(n) =>
        require(n > 0, s"terminate_after must be non-negative: $n")
        import org.apache.spark.sql.functions.col
        df.orderBy(col(idField).asc).limit(n)
    }

  /** The agg-TYPE keys present anywhere in an aggs tree: the keys of
    * each NAMED agg's body object, minus the nesting/meta keys,
    * recursing through sub-aggs. Substring-matching the rendered JSON
    * would false-positive on field names, agg names, or string values
    * that merely contain a type word (a terms agg on field
    * "global_region" is not a `global` agg). */
  private def aggTypeKeys(aggs: JValue): Set[String] = aggs match {
    case JObject(named) => named.iterator.flatMap {
      case JField(_, JObject(body)) => body.flatMap {
        case JField("aggs" | "aggregations", sub) => aggTypeKeys(sub)
        case JField("meta", _) => Nil
        case JField(t, _) => Seq(t)
      }
      case _ => Nil
    }.toSet
    case _ => Set.empty
  }

  private def jnum(v: JValue): Double = v match {
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case other => throw new IllegalArgumentException(s"bad number: $other")
  }

  /** The single-field `match` shape — the query form that carries BM25
    * scores through the body front door (both ES spellings:
    * `{"match": {f: "text"}}` and `{"match": {f: {"query": "text"}}}`).
    * A match carrying semantics-CHANGING options (operator, fuzziness,
    * minimum_should_match, ...) returns None so the body falls back to
    * the filter-context path — the hit SET stays correct (the options
    * compile through QueryDslJson) at the documented constant-score
    * delta, instead of silently scoring the wrong OR hit set. */
  private def matchSpec(q: String): Option[(String, String)] =
    JsonMethods.parse(q) match {
      case JObject(JField("match", JObject(JField(f, body) :: Nil)) :: Nil) =>
        body match {
          case JString(text) => Some(f -> text)
          case JObject(parts) if parts.toMap.keySet == Set("query") =>
            parts.toMap.get("query").collect { case JString(t) => f -> t }
          case _ => None
        }
      case _ => None
    }

  /** The scored `multi_match` shape: query + fields (with `^boost`
    * suffixes) + best/most_fields type. Options beyond
    * query/fields/type (fuzziness, operator, ...) return None so the
    * body falls back to filter context — same stance as matchSpec. */
  private def multiMatchSpec(q: String): Option[(Seq[(String, Double)], String, String)] =
    JsonMethods.parse(q) match {
      case JObject(JField("multi_match", JObject(parts)) :: Nil) =>
        val m = parts.toMap
        if ((m.keySet -- Set("query", "fields", "type")).nonEmpty) None
        else {
          val mode = m.get("type").collect { case JString(t) => t }.getOrElse("best_fields")
          if (!Set("best_fields", "most_fields")(mode)) None
          else for {
            text <- m.get("query").collect { case JString(t) => t }
            fs <- m.get("fields").collect {
              case JArray(xs) => graft.search.Search.parseBoostFields(
                xs.map {
                  case JString(s) => s
                  case other => throw new IllegalArgumentException(s"bad field spec: $other")
                })
            }
          } yield (fs, text, mode)
        }
      case _ => None
    }

  /** The scored `match_phrase` shape (options beyond `query` — slop —
    * fall back to filter context, same stance as matchSpec). */
  private def phraseSpec(q: String): Option[(String, String)] =
    JsonMethods.parse(q) match {
      case JObject(JField("match_phrase", JObject(JField(f, body) :: Nil)) :: Nil) =>
        body match {
          case JString(text) => Some(f -> text)
          case JObject(parts) if parts.toMap.keySet == Set("query") =>
            parts.toMap.get("query").collect { case JString(t) => f -> t }
          case _ => None
        }
      case _ => None
    }

  /** A query-DSL object as an UNRANKED (id, score) frame — the scored
    * query phase shared by the body front door and the `standard`
    * retriever leaf: `match` (single-field BM25), `multi_match`
    * (one-pass per-field kernel, ^boosts, best/most_fields),
    * `match_phrase` (phrase-gated BM25), `bool` trees (hit set = the
    * full predicate; score = the SUM of matched scoring clauses'
    * BM25 via the one-pass clause kernel, filter/must_not contribute
    * 0), and pure filter shapes at the constant 1.0. */
  def scoredQueryFrame(df: org.apache.spark.sql.DataFrame, idField: String,
      q: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    matchSpec(q)
      .map { case (f, text) => graft.search.Search.bm25Scores(df, idField, f, text) }
      .orElse(multiMatchSpec(q).map { case (fs, text, mode) =>
        graft.search.Search.multiMatchScores(df, idField, fs, text, mode) })
      .orElse(phraseSpec(q).map { case (f, text) =>
        graft.search.Search.matchPhraseScores(df, idField, f, text) })
      .getOrElse {
        val clauses = QueryDslJson.scoringClauses(q)
        val hits = df.where(EsQuery.compile(q, idField, corpus = Some(df)))
          .select(col(idField).as("id"))
        if (clauses.isEmpty) hits.withColumn("score", lit(1.0))
        else hits
          .join(graft.search.Search.bm25BoolClausesScores(df, idField, clauses),
            Seq("id"), "left")
          .withColumn("score", coalesce(col("score"), lit(0.0)))
      }
  }

  /** The full `_search` request lifecycle over one frame, composed in
    * ES's evaluation order into ONE Catalyst plan:
    *
    *  1. `runtime_mappings` project (searchable like mapped fields)
    *  2. `query` — `match` (single-field BM25), `multi_match`
    *     (per-field BM25 via the one-pass kernel, `^boost` weights,
    *     best/most_fields) and `match_phrase` (phrase-gated BM25)
    *     carry real `_score`s when the body needs scoring (knn /
    *     min_score / rescore / sort-on-_score); other shapes filter
    *     with the FULL predicate and score the SUM of their match
    *     scoring clauses (top-level / bool must / should — the
    *     connector readMetadata formula; filter/must_not contribute
    *     0), falling back to the constant 1.0 only when no scoring
    *     clause exists (pure filter trees)
    *  3. `knn` — ES 8.4 hybrid: the knn leg retrieves its top-k by
    *     cosine (times optional `boost`) and a doc retrieved by BOTH
    *     legs sums its scores; by one leg, keeps that leg's score
    *  4. `post_filter` — hits-only filter AFTER scoring (scores and
    *     aggs never see it)
    *  5. `min_score` — absolute relevance floor
    *  6. `rescore` — top-`window_size` two-phase re-rank (a single
    *     stage or an ARRAY of chained stages); `rescore_query`
    *     supports `script_score` (Painless over doc fields, `_score`
    *     bound to the previous pass); hits beyond the window are
    *     dropped (standard usage keeps size <= window)
    *  7. `collapse` — one hit per field value, best by the search sort
    *  8. `sort` + `search_after` (lexicographic cursor predicate —
    *     deep paging costs one scan, never a global offset) +
    *     `from`/`size` paging
    *  9. `highlight` — snippet column next to the hit (single-term
    *     window or multi-term fragments, from the match query's terms)
    * 10. `script_fields` / `docvalue_fields` / `_source` response
    *     shaping (`_score` and `snippet` survive `_source` filtering,
    *     like the ES response's separate hit metadata)
    *
    * An aggregation request (`aggs` present) returns the bucket frame
    * via AggsJson instead of hits; combining it with a hit-path-only
    * key throws (this front door returns ONE frame — issue separate
    * requests, like es-hadoop's own one-result-per-read contract). */
  def search(df: org.apache.spark.sql.DataFrame, body: String,
      idField: String = "_id"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.util.Num
    val root = JsonMethods.parse(body) match {
      case JObject(fs) => fs.toMap
      case _ => throw new IllegalArgumentException(s"bad search body: $body")
    }
    val unknown = root.keySet -- SupportedKeys
    require(unknown.isEmpty,
      s"unsupported _search body key(s): ${unknown.toSeq.sorted.mkString(", ")} " +
        s"(supported: ${SupportedKeys.toSeq.sorted.mkString(", ")})")
    val (runtime, innerQ) = parse(body)
    val projected = runtime.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    // slice (sliced scroll): slice i of max n keeps the hits whose
    // hash lands in partition i — a plain pushable predicate, so N
    // slice workers each scan with their own filter. This partitions
    // the LIVE view only; ES-faithful snapshot consistency (pages
    // immune to concurrent appends/swaps — "slice inside a PIT")
    // comes from running the same predicate over an open PIT's pinned
    // manifest: Connector.openPit + pitSlice/pitScrollPages/
    // pitSearchAfter (PagingPitSpec proves page-union invariance).
    // The draw is the deterministic md5-48 content hash on the slice
    // field (ES hashes _id per shard; a content hash is the portable,
    // rerun-stable equivalent; a NULL slice-field value hashes the
    // empty string, so every doc lands in exactly one slice).
    // The predicate applies to the HIT SET, never the scoring frame:
    // BM25 statistics (df, n_docs, avgdl) come from the WHOLE index,
    // so the slices' union equals the unsliced request exactly —
    // per-slice IDF would make scores (and any min_score/rescore cut)
    // disagree across slices.
    val slicePred: Option[org.apache.spark.sql.Column] = root.get("slice").map {
      case JObject(ss) =>
        // rescore windows and collapse groups are GLOBAL constructs: a
        // per-slice top-window rescores docs outside the global window,
        // and a collapse group spanning slices yields one winner PER
        // slice — either silently breaks the union-over-slices
        // invariant, so the combinations are loud (ES likewise keeps
        // slicing to plain scroll hits)
        val incompatS = Seq("rescore", "collapse").filter(root.contains)
        require(incompatS.isEmpty,
          s"slice cannot be combined with ${incompatS.mkString(", ")} — " +
            "per-slice windows/groups would disagree with the unsliced request")
        val sm = ss.toMap
        val unknownS = sm.keySet -- Set("id", "max", "field")
        require(unknownS.isEmpty,
          s"unsupported slice key(s): ${unknownS.toSeq.sorted.mkString(", ")}")
        val sid = jnum(sm.getOrElse("id",
          throw new IllegalArgumentException("slice needs id"))).toLong
        val smax = jnum(sm.getOrElse("max",
          throw new IllegalArgumentException("slice needs max"))).toLong
        require(smax >= 2 && sid >= 0 && sid < smax,
          s"slice needs 0 <= id < max with max >= 2 (got id=$sid max=$smax)")
        val f = sm.get("field") match {
          case Some(JString(x)) => x
          case None => idField
          case Some(o) => throw new IllegalArgumentException(s"bad slice field: $o")
        }
        pmod(
          conv(substring(md5(concat(lit("slice:"),
            coalesce(col(f).cast("string"), lit("")))), 1, 12), 16, 10)
            .cast("long"), lit(smax)) === sid
      case other => throw new IllegalArgumentException(s"bad slice: $other")
    }
    // parse() echoes the whole body back as "the query" when it sees
    // neither runtime_mappings nor query — only use a real one
    val queryJson = innerQ.filter(_ => root.contains("query"))

    // retriever tree (ES 8.14+): the composable replacement for the
    // flat query+knn body — standard/knn leaves fused by rrf/linear.
    // Both leaf kinds read THIS frame (a hybrid corpus carries both
    // the text and the vector column); `size` caps the fused top-k.
    root.get("retriever") match {
      case Some(r) =>
        val others = root.keySet -- Set("retriever", "runtime_mappings",
          "size", "track_total_hits")
        require(others.isEmpty,
          s"retriever replaces the query/knn hit path — key(s) " +
            s"${others.toSeq.sorted.mkString(", ")} are not composable with it here")
        val k = root.get("size").collect { case JInt(i) => i.toInt }.getOrElse(10)
        return Retrievers.topK(projected, idField, projected, idField,
          JsonMethods.compact(JsonMethods.render(JObject(List(JField("retriever", r))))), k)
      case None => ()
    }

    // suggest section: returns the SUGGESTION frame (one-frame
    // contract — a suggester riding a hit/aggs request would be
    // silently dead, so it must stand alone)
    if (root.contains("suggest")) {
      val others = root.keySet -- Set("suggest", "runtime_mappings")
      require(others.isEmpty,
        s"a suggest request returns suggestions, not hits — key(s) " +
          s"${others.toSeq.sorted.mkString(", ")} would be silently dead; " +
          "issue a separate request")
      return compileSuggest(projected, root("suggest"))
    }

    if (root.contains("aggs") || root.contains("aggregations")) {
      val hitOnly = Seq("knn", "collapse", "highlight", "rescore", "min_score",
        "search_after", "post_filter", "_source", "script_fields",
        "docvalue_fields", "slice", "sort", "from", "fields", "stored_fields",
        "rank", "indices_boost", "track_scores", "explain").filter(root.contains)
      require(hitOnly.isEmpty,
        s"an aggs request returns buckets, not hits — hit-path key(s) " +
          s"${hitOnly.mkString(", ")} would be silently dead; issue a separate request")
      // `"size": 0` is THE canonical aggs-request idiom (suppress the
      // hits ES would otherwise attach) — accepted as a no-op here; a
      // POSITIVE size asks for hits the one-frame contract cannot
      // carry beside buckets, so it is loud, never silently dropped
      root.get("size").foreach { s =>
        require(jnum(s) == 0.0,
          "an aggs request returns buckets, not hits — size > 0 asks for " +
            "hits this one-frame response cannot carry; use size: 0 (or " +
            "issue a separate hits request)")
      }
      val pred = queryJson.map(q =>
        EsQuery.compile(q, idField, corpus = Some(projected)))
      val filtered0 = pred.fold(projected)(projected.where)
      // terminate_after caps the COLLECTED set feeding the aggs (the
      // shared id-order-prefix reading). The background-frame nodes
      // (significant_terms/_text, global) recompute their foreground
      // from fgPred + the UNCAPPED background, so a cap over them
      // would be silently dead — loud instead.
      val filtered = capTerminateAfter(filtered0, root, idField)
      if (root.get("terminate_after").exists(jnum(_) != 0.0)) {
        val bgNodes = Seq("significant_terms", "significant_text", "global")
          .filter(aggTypeKeys(root.getOrElse("aggs", root("aggregations"))))
        require(bgNodes.isEmpty,
          s"terminate_after cannot cap ${bgNodes.mkString(", ")} — those nodes " +
            "measure against the UNCAPPED background frame, so the cap would be " +
            "silently dead; issue the capped request without them")
      }
      // fgPred + the pre-query frame let significant_terms measure
      // uplift against the index background, like ES
      return AggsJson.compile(filtered, body, pred, Some(projected))
    }

    // ---- hit path ----
    val knnJson = root.get("knn")
    // `.keyword` multi-field suffix maps to the parent column, same as
    // in the query clauses (QueryDslJson.fieldRef); `_score` maps to
    // the computed score column
    def sortCol(f: String): org.apache.spark.sql.Column =
      if (f == "_score") col("_score")
      else col(if (f.endsWith(".keyword")) f.dropRight(".keyword".length) else f)
    // sort section — the FULL ES sort surface. Plain fields (incl. the
    // `.keyword` mapping and `_score`) compile here; rich entries
    // (multivalue `mode`, nested sort + filter, `_geo_distance`,
    // `_script`, `missing` placement) dispatch to search.Sorting so
    // the SAME computed key expression feeds the ordering AND the
    // search_after cursor predicate. (name, key, asc?, missing-last?)
    val sortSpecs: Seq[(String, org.apache.spark.sql.Column, Boolean, Boolean)] =
      root.get("sort") match {
        case Some(JArray(specs)) => specs.map {
          // ES: a bare "_score" sort string defaults DESC (relevance
          // order); bare field strings default ASC
          case JString("_score") => ("_score", col("_score"), false, true)
          case JString(f) => (f, sortCol(f), true, true)
          case JObject(JField(f, JString(order)) :: Nil)
              if f != "_geo_distance" && f != "_script" =>
            (f, sortCol(f), order != "desc", true)
          case JObject(JField(f, JObject(o)) :: Nil)
              if f != "_geo_distance" && f != "_script" &&
                (o.toMap.keySet -- Set("order")).isEmpty =>
            (f, sortCol(f), o.toMap.get("order") match {
              case Some(JString("desc")) => false
              case _ => true
            }, true)
          case rich =>
            val (k, asc, ml) = graft.search.Sorting.spec(rich)
            // synthetic name: never collides with the `_score`
            // scoring detection below
            ("__computed", k, asc, ml)
        }
        case None => Nil
        case Some(other) => throw new IllegalArgumentException(s"sort must be an array: $other")
      }
    // track_scores: compute `_score` even when the request sorts by a
    // field (ES's knob for "field-sorted hits still want relevance")
    val trackScores = root.get("track_scores") match {
      case None => false
      case Some(JBool(b)) => b
      case Some(other) => throw new IllegalArgumentException(s"bad track_scores: $other")
    }
    val scoring = knnJson.isDefined || root.contains("min_score") ||
      root.contains("rescore") || root.contains("indices_boost") ||
      sortSpecs.exists(_._1 == "_score") || trackScores

    // 1-2. query phase (scores only when the body needs them)
    val mSpec = queryJson.flatMap(matchSpec)
    val matched0 = (queryJson, scoring) match {
      case (Some(q), true) =>
        // the shared scored query phase (scoredQueryFrame): match /
        // multi_match / match_phrase carry real BM25; `bool` trees
        // score the SUM of their matched scoring clauses through the
        // one-pass clause kernel (the same per-clause formula the
        // connector's readMetadata `_score` uses, so the two front
        // doors can't diverge — a doc matching via filters alone
        // scores 0, ES's filter-context rule); pure filter shapes
        // evaluate at the constant 1.0
        val scored = scoredQueryFrame(projected, idField, q)
          .select(col("id").as("__qid"), col("score").as("_score"))
        projected.join(scored, col(idField) === col("__qid")).drop("__qid")
      case (Some(q), false) =>
        projected.where(EsQuery.compile(q, idField, corpus = Some(projected)))
      case (None, true) => projected.withColumn("_score", lit(1.0))
      case (None, false) => projected
    }

    // 2.5. terminate_after: cap the COLLECTED hit set at n before any
    // later phase sees it (shared helper — the aggs path applies the
    // same cap to the frame feeding the agg tree).
    val matched = capTerminateAfter(matched0, root, idField)

    // 3. knn leg + hybrid combine. ES 8.12 accepts a LIST of knn
    // clauses: each retrieves its own top-k and a doc's knn score
    // SUMS the clause similarities it appears in (ES's combined
    // semantics) — realized as a union + one groupBy, so N clauses
    // never multiply the combine cost.
    def knnLeg(kv: JValue): org.apache.spark.sql.DataFrame = {
      val kjson = JsonMethods.compact(JsonMethods.render(kv))
      val boost = kv match {
        case JObject(fs) => fs.toMap.get("boost").map(jnum).getOrElse(1.0)
        case _ => 1.0
      }
      graft.sim.Ann.knnSearch(projected, idField, kjson, idField)
        .select(col("id").as("__kid"), (col("cosine") * boost).as("__kscore"))
    }
    // `rank` (ES 8.8): REPLACE the hybrid score-sum combine with
    // reciprocal-rank fusion of the legs — the query leg and each knn
    // clause contribute their top rank_window_size ranks, a doc scores
    // sum of 1/(rank_constant + rank). Delegates to Search.rrfTopK:
    // fusion is union + one partial-agged groupBy over bounded
    // windows, never a corpus shuffle.
    val rankSpec: Option[(Int, Int)] = root.get("rank").map {
      case JObject(JField("rrf", JObject(ps)) :: Nil) =>
        val m = ps.toMap
        def intOr(key: String, d: Int) = m.get(key).map(jnum(_).toInt).getOrElse(d)
        val unknown = m.keySet -- Set("rank_constant", "rank_window_size")
        require(unknown.isEmpty, s"unknown rank.rrf key(s): ${unknown.mkString(", ")}")
        (intOr("rank_constant", 60), intOr("rank_window_size", 100))
      case other => throw new IllegalArgumentException(
        s"rank supports the rrf method: $other")
    }

    val afterKnn = (knnJson, rankSpec) match {
      case (None, Some(_)) => throw new IllegalArgumentException(
        "rank needs a knn section beside the query — the legs to fuse")
      case (Some(kv), Some((rankConst, rankWindow))) =>
        val knnLegs = kv match {
          case JArray(clauses) =>
            require(clauses.nonEmpty, "knn list must not be empty")
            clauses.map(knnLeg)
          case single => Seq(knnLeg(single))
        }
        val legs = (if (queryJson.isDefined)
          Seq(matched.select(col(idField).as("id"), col("_score").as("score")))
        else Seq.empty) ++
          knnLegs.map(_.select(col("__kid").as("id"), col("__kscore").as("score")))
        require(legs.size >= 2,
          "rank.rrf fuses at least two legs (query + knn, or several knn clauses)")
        val fused = graft.search.Search
          .rrfTopK(legs, rankConstant = rankConst, windowSize = rankWindow, k = rankWindow)
          .select(col("id").as("__rid"), col("rrf_score").as("_score"))
        // fused is window-bounded (≤ legs·rank_window_size rows) — the
        // join back to the hit frame broadcasts under AQE
        projected.join(fused, col(idField) === col("__rid")).drop("__rid")
      case (Some(kv), None) =>
        val knn = kv match {
          case JArray(clauses) =>
            require(clauses.nonEmpty, "knn list must not be empty")
            clauses.map(knnLeg).reduce(_ unionByName _)
              .groupBy(col("__kid"))
              .agg(Num.round(sum(col("__kscore")), 4).as("__kscore"))
          case single => knnLeg(single)
        }
        if (queryJson.isDefined) {
          val q = matched.select(col(idField).as("__hid"), col("_score").as("__qscore"))
          val union = q.join(knn, col("__hid") === col("__kid"), "full_outer")
            .select(coalesce(col("__hid"), col("__kid")).as("__uid"),
              Num.round(coalesce(col("__qscore"), lit(0.0)) +
                coalesce(col("__kscore"), lit(0.0)), 4).as("_score"))
          projected.join(union, col(idField) === col("__uid")).drop("__uid")
        } else {
          projected.join(knn, col(idField) === col("__kid")).drop("__kid")
            .withColumnRenamed("__kscore", "_score")
        }
      case (None, None) => matched
    }
    // slice partitions the HIT SET (scores above came from full-index
    // stats), so union-over-slices == the unsliced request, hit for hit
    val slicedHits = slicePred.fold(afterKnn)(afterKnn.where)

    // 3.5. indices_boost: per-index score multiplier — the hit's index
    // is the connector's __graft_src_index tag (last path segment);
    // entries match name-or-`*`-pattern, FIRST match wins, unmatched
    // indices keep factor 1.0 (ES semantics)
    val ibBoosted = root.get("indices_boost") match {
      case None => slicedHits
      case Some(JArray(entries)) =>
        require(slicedHits.columns.contains("__graft_src_index"),
          "indices_boost needs per-hit index metadata (__graft_src_index) — " +
            "read through the connector's multi-index request, or attach the column")
        val idxName = element_at(split(col("__graft_src_index"), "/"), -1)
        val factor = entries.foldLeft(lit(null).cast("double")) { (acc, e) =>
          e match {
            case JObject(JField(pat, b) :: Nil) =>
              val re = "^" + pat.split("\\*", -1)
                .map(java.util.regex.Pattern.quote).mkString(".*") + "$"
              when(acc.isNull && idxName.rlike(re), lit(jnum(b))).otherwise(acc)
            case other => throw new IllegalArgumentException(
              s"bad indices_boost entry (want one {index-or-pattern: boost}): $other")
          }
        }
        slicedHits.withColumn("_score",
          Num.round(col("_score") * coalesce(factor, lit(1.0)), 4))
      case Some(other) => throw new IllegalArgumentException(
        s"indices_boost must be an array: $other")
    }

    // 4. post_filter: hits-only, after scoring — scores are unchanged
    val postFiltered = root.get("post_filter")
      .map(pf => JsonMethods.compact(JsonMethods.render(pf)))
      .fold(ibBoosted)(pf => ibBoosted.where(EsQuery.compile(pf, idField)))

    // 5. min_score
    val floored = root.get("min_score").map(jnum)
      .fold(postFiltered)(m => postFiltered.where(col("_score") >= m))

    // 6. rescore: top-window two-phase re-rank; ES accepts a single
    // stage OR an ARRAY of stages (each re-ranks the previous stage's
    // window — windows are non-increasing in practice, every stage is
    // a bounded TakeOrderedAndProject)
    def applyRescore(d: org.apache.spark.sql.DataFrame, stage: JValue) = stage match {
      case JObject(rs) =>
        val m = rs.toMap
        val w = m.get("window_size").map(jnum(_).toInt).getOrElse(10)
        val rq = m.get("query") match {
          case Some(JObject(q)) => q.toMap
          case _ => throw new IllegalArgumentException("rescore needs a query object")
        }
        val qw = rq.get("query_weight").map(jnum).getOrElse(1.0)
        val rw = rq.get("rescore_query_weight").map(jnum).getOrElse(1.0)
        val secondary = rq.get("rescore_query") match {
          case Some(JObject(JField("script_score", JObject(ss)) :: Nil)) =>
            ss.toMap.get("script") match {
              case Some(JObject(s)) => s.toMap.get("source") match {
                case Some(JString(src)) => Painless.compile(src, score = col("_score"))
                case _ => throw new IllegalArgumentException(
                  "rescore script_score needs script.source")
              }
              case _ => throw new IllegalArgumentException(
                "rescore script_score needs a script")
            }
          case other => throw new IllegalArgumentException(
            s"rescore_query supports script_score; got: $other")
        }
        // the window is a bounded TakeOrderedAndProject; the secondary
        // expression evaluates on O(window) rows only
        d.orderBy(col("_score").desc, col(idField).asc).limit(w)
          .withColumn("_score", Num.round(col("_score") * qw + secondary * rw, 4))
      case other => throw new IllegalArgumentException(s"bad rescore stage: $other")
    }
    val rescored = root.get("rescore") match {
      case None => floored
      case Some(stage) =>
        val incompat = Seq("collapse", "search_after").filter(root.contains)
        require(incompat.isEmpty,
          s"rescore cannot be combined with ${incompat.mkString(", ")} (ES rejects this too)")
        stage match {
          case JArray(stages) =>
            require(stages.nonEmpty, "rescore array must not be empty")
            stages.foldLeft(floored)(applyRescore)
          case single => applyRescore(floored, single)
        }
    }

    // order columns shared by collapse / sort / search_after — ES
    // places missing values LAST by default regardless of direction
    // (Sorting's `missing: _first` flips it)
    val orderCols: Seq[org.apache.spark.sql.Column] =
      if (sortSpecs.nonEmpty) sortSpecs.map { case (_, k, asc, ml) =>
        (asc, ml) match {
          case (true, true) => k.asc_nulls_last
          case (true, false) => k.asc_nulls_first
          case (false, true) => k.desc_nulls_last
          case (false, false) => k.desc_nulls_first
        }
      }
      else if (scoring) Seq(col("_score").desc, col(idField).asc)
      else Nil

    // 7. collapse: one hit per group, best by the search sort.
    // `inner_hits` attaches the group's top-`size` ids (search-sort
    // order) as an array next to the collapsed hit — the ES response's
    // nested inner hits flattened to the one-frame shape.
    val collapsed = root.get("collapse") match {
      case None => rescored
      case Some(JObject(cs)) =>
        val cm = cs.toMap
        val unknownC = cm.keySet -- Set("field", "inner_hits")
        require(unknownC.isEmpty,
          s"unsupported collapse key(s): ${unknownC.toSeq.sorted.mkString(", ")}")
        val f = cm.get("field") match {
          case Some(JString(x)) => x
          case _ => throw new IllegalArgumentException("collapse needs a field")
        }
        require(orderCols.nonEmpty,
          "collapse needs a sort (or a scored query) to pick the top hit per group")
        // id tiebreak makes the per-group pick deterministic on sort ties
        val win = Window.partitionBy(sortCol(f))
          .orderBy(orderCols :+ col(idField).asc: _*)
        val ranked = rescored.withColumn("__cr", row_number().over(win))
        cm.get("inner_hits") match {
          case None => ranked.where(col("__cr") === 1).drop("__cr")
          case Some(JObject(ih)) =>
            val k = ih.toMap.get("size").map(jnum(_).toInt).getOrElse(3)
            // full-frame window: rows arrive in the window's sort
            // order, so the collected list IS the group's ranking
            val full = win.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ranked
              .withColumn("inner_hits", slice(collect_list(col(idField)).over(full), 1, k))
              .where(col("__cr") === 1).drop("__cr")
          case Some(other) => throw new IllegalArgumentException(s"bad inner_hits: $other")
        }
      case Some(other) => throw new IllegalArgumentException(s"bad collapse: $other")
    }

    // 8. search_after cursor + sort + from/size
    val cursored = root.get("search_after") match {
      case None => collapsed
      case Some(JArray(vals)) =>
        require(sortSpecs.nonEmpty, "search_after needs an explicit sort")
        require(!root.contains("from") || root.get("from").contains(JInt(0)),
          "search_after cannot be combined with from (ES rejects this too)")
        require(vals.length == sortSpecs.length,
          s"search_after has ${vals.length} values for ${sortSpecs.length} sort keys")
        def after(k: org.apache.spark.sql.Column, asc: Boolean, v: JValue) = {
          val l = v match {
            case JString(s) => lit(s)
            case n => lit(jnum(n))
          }
          if (asc) k > l else k < l
        }
        def eq(k: org.apache.spark.sql.Column, v: JValue) = v match {
          case JString(s) => k === lit(s)
          case n => k === lit(jnum(n))
        }
        // strictly-after in the sort's lexicographic order: plain
        // comparisons against the SAME computed key expressions the
        // ordering uses (a rich sort's cursor compares the geo
        // distance / script value / mode fold, not a raw column), so
        // deep paging stays one pushed-down scan
        val pred = sortSpecs.zip(vals).zipWithIndex.map { case (((_, k, asc, _), v), i) =>
          val prefix = sortSpecs.zip(vals).take(i)
            .map { case ((_, pk, _, _), pv) => eq(pk, pv) }
          (prefix :+ after(k, asc, v)).reduce(_ && _)
        }.reduce(_ || _)
        collapsed.where(pred)
      case Some(other) => throw new IllegalArgumentException(s"bad search_after: $other")
    }
    val sorted = if (orderCols.nonEmpty) cursored.orderBy(orderCols: _*) else cursored
    val from = root.get("from").collect { case JInt(i) => i.toInt }.getOrElse(0)
    val size = root.get("size").collect { case JInt(i) => i.toInt }
    val paged = size.fold(if (from > 0) sorted.offset(from) else sorted)(
      (if (from > 0) sorted.offset(from) else sorted).limit)

    // 9. highlight: one snippet column per requested field (ES
    // response shape — `snippet` when one field, `snippet_<field>`
    // each when several). Terms come from ANY scoring clause
    // targeting that field — match, match_phrase, multi_match (all
    // its fields), or a bool tree's scoring clauses — one-term
    // matches keep the single-window shape, multi-term matches the
    // per-term fragment shape (number_of_fragments honored, ES
    // default 5).
    val (highlighted, snippetCols) = root.get("highlight") match {
      case None => (paged, Seq.empty[String])
      case Some(JObject(hs)) =>
        val hm = hs.toMap
        val unknownH = hm.keySet -- Set("fields", "pre_tags", "post_tags")
        require(unknownH.isEmpty,
          s"unsupported highlight key(s): ${unknownH.toSeq.sorted.mkString(", ")} " +
            "(supported: fields, pre_tags, post_tags)")
        // ES accepts tag ARRAYS (per-term cycling, an FVH feature);
        // one pair is the portable subset — more is a loud error, not
        // a silently-collapsed one
        def oneTag(key: String, default: String): String = hm.get(key) match {
          case None => default
          case Some(JArray(List(JString(t)))) => t
          case Some(JString(t)) => t
          case Some(other) => throw new IllegalArgumentException(
            s"highlight $key supports exactly one tag: $other")
        }
        val (preTag, postTag) = (oneTag("pre_tags", "<em>"), oneTag("post_tags", "</em>"))
        val fields = hm.get("fields") match {
          case Some(JObject(fs)) => fs.map {
            case JField(f, JObject(o)) => (f, o.toMap)
            case JField(f, _) => (f, Map.empty[String, JValue])
          }
          case _ => throw new IllegalArgumentException("highlight needs a fields object")
        }
        // (field -> query text) from every scored query shape
        val clauseTexts: Seq[(String, String)] = queryJson.toSeq.flatMap { q =>
          mSpec.map(Seq(_))
            .orElse(multiMatchSpec(q).map { case (fs, text, _) => fs.map(_._1 -> text) })
            .orElse(phraseSpec(q).map(Seq(_)))
            .getOrElse(QueryDslJson.scoringClauses(q))
        }
        require(clauseTexts.nonEmpty,
          "highlight needs a scored query (match / match_phrase / multi_match / " +
            "bool with scoring clauses) to take its terms from")
        val cols = fields.map { case (f, opts) =>
          val unknownO = opts.keySet -- Set("number_of_fragments", "pre_tags", "post_tags")
          require(unknownO.isEmpty,
            s"unsupported highlight option(s) for field '$f': " +
              unknownO.toSeq.sorted.mkString(", "))
          val texts = clauseTexts.collect { case (cf, t) if cf == f => t }
          require(texts.nonEmpty,
            s"highlight field '$f' is targeted by no scoring clause — no terms to highlight")
          val text = texts.mkString(" ")
          val nFrags = opts.get("number_of_fragments").map(jnum(_).toInt).getOrElse(5)
          // per-field tags override the request-level pair (ES's rule)
          def fieldTag(key: String, default: String): String = opts.get(key) match {
            case None => default
            case Some(JArray(List(JString(t)))) => t
            case Some(JString(t)) => t
            case Some(other) => throw new IllegalArgumentException(
              s"highlight $key supports exactly one tag: $other")
          }
          val (pre, post) = (fieldTag("pre_tags", preTag), fieldTag("post_tags", postTag))
          val snippet =
            if (graft.analysis.Analyzer.analyze(text).distinct.length == 1)
              graft.search.Search.highlightCol(col(f), text, pre, post)
            else
              graft.search.Search.highlightFragmentsCol(col(f), text, nFrags, pre, post)
          (if (fields.size == 1) "snippet" else s"snippet_$f") -> snippet
        }
        (cols.foldLeft(paged) { case (d, (n, c)) => d.withColumn(n, c) },
          cols.map(_._1))
      case Some(other) => throw new IllegalArgumentException(s"bad highlight: $other")
    }

    // 9.5. explain: true — per-hit `_explanation` (the BM25 term
    // breakdown as one string, from the SAME component frame as the
    // score). Supported for the single-field match shape, which has a
    // well-defined term decomposition; other query shapes fail loudly
    // rather than attach a fake explanation. The join runs against
    // the already-sized hit frame, so it is hit-bounded.
    val explained = root.get("explain") match {
      case None | Some(JBool(false)) => highlighted
      case Some(JBool(true)) =>
        val (f, qtext) = mSpec.getOrElse(throw new IllegalArgumentException(
          "explain: true is supported for single-field match bodies (the BM25 " +
            "term breakdown); other query shapes have no term decomposition here"))
        val expl = graft.search.Search.explainStrings(projected, idField, f, qtext)
          .withColumnRenamed("id", "__eid")
        highlighted.join(expl, col(idField) === col("__eid"), "left").drop("__eid")
      case Some(other) => throw new IllegalArgumentException(s"bad explain: $other")
    }

    // 10. response shaping: script_fields / docvalue_fields / fields
    // project extra columns; _source prunes the doc columns. Hit
    // METADATA — _score, snippets, computed/retrieved fields, the
    // connector's __graft_src_index tag — survives the prune, like
    // the ES response's separate hit metadata.
    val scriptCols = scriptFields(body)
    val docvalueCols = root.get("docvalue_fields")
      .map(v => docvalueFields(JsonMethods.compact(JsonMethods.render(v))))
      .getOrElse(Nil)
    val fieldsCols = root.get("fields")
      .map(v => fieldsApi(projected.columns.toSeq,
        JsonMethods.compact(JsonMethods.render(v))))
      .getOrElse(Nil)
    val withExtras = (scriptCols ++ docvalueCols ++ fieldsCols)
      .foldLeft(explained) { case (d, (n, c)) => d.withColumn(n, c) }
    val metaCols = (Seq("_score", "inner_hits", "_explanation") ++ snippetCols ++
      scriptCols.map(_._1) ++ docvalueCols.map(_._1) ++ fieldsCols.map(_._1) ++
      Seq("__graft_src_index")).distinct
    // stored_fields (the legacy retrieval section): a keep-list of doc
    // columns, or `"_none_"` for id + hit metadata only. It REPLACES
    // the retrieval sections — combining with `_source`/`fields` is
    // ambiguous (ES's own interplay rules are version-dependent), so
    // the combination is loud.
    if (root.contains("stored_fields")) {
      require(!root.contains("_source") && !root.contains("fields"),
        "stored_fields replaces the retrieval sections — combining it with " +
          "_source/fields is ambiguous; pick one")
      val keep = root("stored_fields") match {
        case JString("_none_") => Seq.empty[String]
        case JArray(names) => names.map {
          case JString(n) => n
          case o => throw new IllegalArgumentException(s"bad stored_fields entry: $o")
        }
        case other => throw new IllegalArgumentException(s"bad stored_fields: $other")
      }
      keep.foreach(n => require(withExtras.columns.contains(n),
        s"stored_fields entry '$n' matches no column"))
      val cols = ((idField +: keep) ++ metaCols)
        .filter(withExtras.columns.contains).distinct
      return withExtras.select(cols.map(col): _*)
    }
    root.get("_source") match {
      case None => withExtras
      case Some(JBool(true)) => withExtras // explicit default
      case Some(JBool(false)) =>
        // `_source: false`: the hit id + metadata only, no doc fields
        // (with `fields`, the modern default request shape)
        val keep = ((idField +: metaCols))
          .filter(withExtras.columns.contains).distinct
        withExtras.select(keep.map(col): _*)
      case Some(v) =>
        val extras = metaCols.filter(withExtras.columns.contains)
        val base = applySourceFilter(withExtras.drop(extras: _*),
          JsonMethods.compact(JsonMethods.render(v)))
        // pure projection on the SAME frame — kept doc columns + hit
        // metadata, no join
        withExtras.select((base.columns.toSeq ++ extras).map(col): _*)
    }
  }

  /** The body `fields` retrieval section — ES 8's recommended
    * replacement for `_source` retrieval (clients send it by
    * default). Entries are bare field names or `{"field": f,
    * "format": p}` (date pattern or `epoch_millis`, like
    * docvalue_fields); `*` wildcards expand against the doc schema in
    * schema order. A no-match name or pattern fails LOUDLY (a typo'd
    * field would otherwise silently vanish from every hit). Retrieved
    * values keep the field's name — they ride as hit metadata through
    * `_source` filtering, so `"_source": false, "fields": [...]` is
    * the zero-copy projection it is in ES. */
  def fieldsApi(columns: Seq[String], json: String): Seq[(String, Column)] = {
    import org.apache.spark.sql.functions.{col, date_format, unix_millis}
    def expand(p: String): Seq[String] =
      if (!p.contains("*")) {
        require(columns.contains(p), s"fields entry '$p' matches no column")
        Seq(p)
      } else {
        val re = ("^" + p.split("\\*", -1)
          .map(java.util.regex.Pattern.quote).mkString(".*") + "$").r
        val hits = columns.filter(c => re.findFirstIn(c).isDefined)
        require(hits.nonEmpty, s"fields pattern '$p' matches no columns")
        hits
      }
    JsonMethods.parse(json) match {
      case JArray(specs) => specs.flatMap {
        case JString(f) => expand(f).map(n => n -> col(n))
        case JObject(spec) =>
          val m = spec.toMap
          val f = m.get("field") match {
            case Some(JString(n)) => n
            case _ => throw new IllegalArgumentException(
              s"fields entry needs a field: $spec")
          }
          m.get("format") match {
            case Some(JString("epoch_millis")) =>
              expand(f).map(n => n -> unix_millis(col(n).cast("timestamp")))
            case Some(JString(p)) => expand(f).map(n => n -> date_format(col(n), p))
            case None => expand(f).map(n => n -> col(n))
            case other => throw new IllegalArgumentException(
              s"bad fields format for '$f': $other")
          }
        case other => throw new IllegalArgumentException(s"bad fields entry: $other")
      }
      case other => throw new IllegalArgumentException(
        s"fields must be an array, got: $other")
    }
  }

  /** The body `suggest` section: ONE named suggester (the one-frame
    * contract), dispatching on its type object — `term` (with
    * `suggest_mode` always/popular/missing, ES default missing),
    * `phrase` (two-term bigram correction), or `completion` (prefix
    * FST analog; the index-time weight lives in a column, named via
    * the graft extension key `weight_field` — loud when absent). */
  private def compileSuggest(df: org.apache.spark.sql.DataFrame,
      spec: JValue): org.apache.spark.sql.DataFrame = spec match {
    case JObject(JField(name, JObject(s)) :: Nil) =>
      val m = s.toMap
      def text = m.get("text") match {
        case Some(JString(t)) => t
        case _ => throw new IllegalArgumentException(
          s"suggester '$name' needs a text field")
      }
      def size(sm: Map[String, JValue]) =
        sm.get("size").map(jnum(_).toInt).getOrElse(5)
      (m.get("term"), m.get("phrase"), m.get("completion")) match {
        case (Some(JObject(t)), None, None) =>
          val tm = t.toMap
          val field = tm.get("field") match {
            case Some(JString(f)) => f
            case _ => throw new IllegalArgumentException(
              s"term suggester '$name' needs a field")
          }
          val mode = tm.get("suggest_mode")
            .collect { case JString(x) => x }.getOrElse("missing") // ES default
          val maxEdits = tm.get("max_edits").map(jnum(_).toInt).getOrElse(2)
          graft.search.Search.suggestMode(df, field, text, mode, maxEdits, size(tm))
        case (None, Some(JObject(p)), None) =>
          val pm = p.toMap
          val field = pm.get("field") match {
            case Some(JString(f)) => f
            case _ => throw new IllegalArgumentException(
              s"phrase suggester '$name' needs a field")
          }
          val maxEdits = pm.get("max_edits").map(jnum(_).toInt).getOrElse(1)
          graft.search.Search.phraseSuggest(df, field, text, maxEdits, size(pm))
        case (None, None, Some(JObject(c))) =>
          val cm = c.toMap
          val field = cm.get("field") match {
            case Some(JString(f)) => f
            case _ => throw new IllegalArgumentException(
              s"completion suggester '$name' needs a field")
          }
          val weight = cm.get("weight_field") match {
            case Some(JString(w)) => w
            case _ => throw new IllegalArgumentException(
              s"completion suggester '$name' needs weight_field (the column " +
                "carrying ES's index-time suggestion weight)")
          }
          val prefix = m.get("prefix") match {
            case Some(JString(px)) => px
            case _ => throw new IllegalArgumentException(
              s"completion suggester '$name' needs a prefix")
          }
          graft.search.Search.suggestCompletion(df, field, weight, prefix, size(cm))
        case _ => throw new IllegalArgumentException(
          s"suggester '$name' needs exactly one of term/phrase/completion")
      }
    case JObject(many) => throw new IllegalArgumentException(
      "one named suggester per request (the front door returns ONE frame); got: " +
        many.map(_._1).mkString(", "))
    case other => throw new IllegalArgumentException(s"bad suggest section: $other")
  }

  /** `script_fields`: per-HIT computed outputs (unlike runtime fields
    * they are not searchable — they project AFTER the query predicate,
    * exactly ES's evaluation point). Each compiles via Painless to a
    * codegen'd column; params supported. */
  def scriptFields(json: String): Seq[(String, Column)] =
    JsonMethods.parse(json) match {
      case JObject(root) => root.toMap.get("script_fields").toSeq.flatMap {
        case JObject(fields) => fields.map {
          case JField(name, JObject(spec)) =>
            val m = spec.toMap
            val (src, params) = m.get("script") match {
              case Some(JObject(s)) =>
                val sm = s.toMap
                val code = sm.get("source") match {
                  case Some(JString(c)) => c
                  case _ => throw new IllegalArgumentException(
                    s"script_field '$name' needs script.source")
                }
                val ps: Map[String, Any] = sm.get("params") match {
                  case Some(JObject(pp)) => pp.collect {
                    case JField(k, JInt(i)) => k -> i.toLong
                    case JField(k, JDouble(d)) => k -> d
                    case JField(k, JString(v)) => k -> v
                  }.toMap
                  case _ => Map.empty
                }
                (code, ps)
              case _ => throw new IllegalArgumentException(
                s"script_field '$name' needs a script")
            }
            name -> Painless.compile(src, params)
          case other => throw new IllegalArgumentException(
            s"bad script_field spec: $other")
        }
        case other => throw new IllegalArgumentException(
          s"script_fields must be an object, got: $other")
      }
      case _ => Nil
    }

  /** `docvalue_fields` — the columnar-read response shaping (ES reads
    * these from doc values, never from `_source`; graft's scan IS
    * columnar, so this compiles to a pure projection Catalyst pushes
    * into the parquet read — exactly the optimization docvalue_fields
    * exists to buy). Accepts ES's two spellings per entry: a bare
    * field string, or `{"field": f, "format": p}` where `format` is a
    * date pattern (ES date-format syntax is Java's) or
    * `epoch_millis`. Formatted values keep the field's name, like the
    * ES response's `fields` map. */
  def docvalueFields(json: String): Seq[(String, Column)] = {
    import org.apache.spark.sql.functions.{col, date_format, unix_millis}
    JsonMethods.parse(json) match {
      case JArray(specs) => specs.map {
        case JString(f) => f -> col(f)
        case JObject(spec) =>
          val m = spec.toMap
          val f = m.get("field") match {
            case Some(JString(n)) => n
            case _ => throw new IllegalArgumentException(
              s"docvalue_fields entry needs a field: $spec")
          }
          m.get("format") match {
            case Some(JString("epoch_millis")) =>
              f -> unix_millis(col(f).cast("timestamp"))
            case Some(JString(p)) => f -> date_format(col(f), p)
            case None => f -> col(f)
            case other => throw new IllegalArgumentException(
              s"bad docvalue format for '$f': $other")
          }
        case other => throw new IllegalArgumentException(
          s"bad docvalue_fields entry: $other")
      }
      case other => throw new IllegalArgumentException(
        s"docvalue_fields must be an array, got: $other")
    }
  }

  /** `_source` filtering — the response-shaping twin of the
    * connector's es.read.field.include/exclude. Accepts the three ES
    * forms: a bare include array, a single pattern string, or
    * `{"includes": [...], "excludes": [...]}`; `*` wildcards expand
    * against the schema (includes keep pattern-list order with each
    * pattern's matches in schema order; a no-match include fails
    * loudly, a no-match exclude is a no-op). Pure projection —
    * Catalyst prunes the dropped columns out of the scan. */
  def applySourceFilter(df: org.apache.spark.sql.DataFrame, spec: String): org.apache.spark.sql.DataFrame = {
    def expand(pats: Seq[String], requireMatch: Boolean): Seq[String] =
      pats.flatMap { p =>
        if (!p.contains("*")) Seq(p)
        else {
          val re = ("^" + p.split("\\*", -1)
            .map(java.util.regex.Pattern.quote).mkString(".*") + "$").r
          val hits = df.columns.filter(c => re.findFirstIn(c).isDefined).toSeq
          require(!requireMatch || hits.nonEmpty,
            s"_source include pattern '$p' matches no columns")
          hits
        }
      }.distinct
    def strings(v: JValue, what: String): Seq[String] = v match {
      case JArray(xs) => xs.map {
        case JString(s) => s
        case other => throw new IllegalArgumentException(s"bad $what entry: $other")
      }
      case JString(s) => Seq(s)
      case other => throw new IllegalArgumentException(s"bad $what: $other")
    }
    val (includes, excludes) = JsonMethods.parse(spec) match {
      case JObject(fs) =>
        val m = fs.toMap
        (m.get("includes").map(strings(_, "includes")).getOrElse(Nil),
          m.get("excludes").map(strings(_, "excludes")).getOrElse(Nil))
      case arr @ JArray(_) => (strings(arr, "includes"), Nil)
      case JString(s) => (Seq(s), Nil)
      case other => throw new IllegalArgumentException(s"bad _source spec: $other")
    }
    val included =
      if (includes.isEmpty) df
      else df.select(expand(includes, requireMatch = true)
        .map(org.apache.spark.sql.functions.col): _*)
    expand(excludes, requireMatch = false)
      .filter(included.columns.contains).foldLeft(included)(_ drop _)
  }
}
