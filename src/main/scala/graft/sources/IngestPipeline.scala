package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** ES ingest-pipeline analog: a JSON `processors` chain applied to
  * every batch at WRITE time (`graft.ingest.pipeline` option on save).
  *
  * In ES the ingest node mutates each document before indexing; here
  * the whole chain compiles once to narrow Column transforms folded
  * into the write job — no per-document interpretation, no extra pass
  * over the data (Catalyst collapses consecutive projections into one).
  *
  * Supported processors (the common document-shaping subset):
  * set, rename, remove, convert, lowercase, uppercase, trim, gsub,
  * dissect, grok (via the ES|QL compilers — one anchored regex
  * each), date, kv, json (flat string maps), script (Painless
  * computed value), csv, split, join, append, urldecode, bytes,
  * fingerprint, drop (Painless `if`), foreach (per-element
  * lowercase/uppercase/trim/gsub over an array field), pipeline
  * (nested named pipeline, inlined), geoip (synthetic prefix table,
  * real output shape), html_strip, sort, dot_expander,
  * date_index_name, redact (grok-named capture masking, the shared
  * GrokPatterns library).
  *
  * Per-processor `on_failure` (convert/date/json/bytes): the primary
  * transform switches to its try_* form, rows where a present value
  * nulled out get the handler `set`s applied. Without `on_failure`
  * a bad value fails the job — ES likewise fails the request.
  */
object IngestPipeline {

  private def litOf(v: JValue, what: String): Column = v match {
    case JString(s) => lit(s)
    case JInt(i) => lit(i.toLong)
    case JLong(l) => lit(l)
    case JDouble(d) => lit(d)
    case JBool(b) => lit(b)
    case other => throw new IllegalArgumentException(
      s"unsupported $what value: $other")
  }

  /** Per-processor `on_failure` handlers (the `set` subset — the
    * error-tagging / fallback-value shape). ES runs the handler chain
    * when the processor throws; compiled columns can't throw per-row,
    * so "failed" = the try-form produced null from non-null input,
    * and each handler `set` merges conditionally on that flag. */
  private def failureHandlers(
      m: Map[String, JValue], op: String): Seq[(String, Column)] =
    m.get("on_failure") match {
      case Some(JArray(hs)) => hs.map {
        case JObject(JField("set", JObject(hspec)) :: Nil) =>
          val hm = hspec.toMap
          val hf = hm.get("field").collect { case JString(s) => s }
            .getOrElse(throw new IllegalArgumentException("on_failure set needs field"))
          (hf, litOf(hm.getOrElse("value",
            throw new IllegalArgumentException("on_failure set needs value")),
            "on_failure set"))
        case other => throw new IllegalArgumentException(
          s"unsupported on_failure handler under $op (set only): $other")
      }
      case Some(other) => throw new IllegalArgumentException(
        s"on_failure must be an array: $other")
      case None => Seq.empty
    }

  private def try_cast_double(c: Column): Column = c.try_cast("double")

  /** Write `tried` into `target`; when handlers exist, flag rows where
    * the source was present but the try-form nulled out, and merge
    * each handler's set under that flag. */
  private def withTried(
      df: DataFrame, srcField: String, target: String, tried: Column,
      handlers: Seq[(String, Column)]): DataFrame =
    if (handlers.isEmpty) df.withColumn(target, tried)
    else {
      val flagged = df
        .withColumn("_graft_failed", col(srcField).isNotNull && tried.isNull)
        .withColumn(target, tried)
      handlers.foldLeft(flagged) { case (d, (hf, hv)) =>
        val prev = if (d.columns.contains(hf)) col(hf) else lit(null)
        d.withColumn(hf, when(col("_graft_failed"), hv).otherwise(prev))
      }.drop("_graft_failed")
    }

  /** `POST _ingest/pipeline/_simulate` analog: run the pipeline over
    * the supplied sample docs (a JSON array of `_source` objects) and
    * return the transformed docs — the preview API, never a write.
    * The samples parse to one tiny local frame (simulate is bounded by
    * construction: it previews a handful of docs), then the SAME
    * compiled chain the write path uses applies, so what simulate
    * shows is exactly what indexing would store. */
  def simulate(
      spark: org.apache.spark.sql.SparkSession,
      pipelineJson: String,
      docsJson: String,
      registry: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    val docs = spark.read.json(Seq(docsJson).toDS)
    require(!docs.columns.contains("_corrupt_record"),
      s"_simulate docs must be a JSON array of objects: $docsJson")
    compile(pipelineJson, registry)(docs)
  }

  def compile(json: String): DataFrame => DataFrame = compile(json, Map.empty)

  def compile(
      json: String,
      registry: Map[String, String],
      depth: Int = 0,
      // named enrich policies: name -> (lookup frame, match-key column)
      // — the frame analog of ES's enrich index (an enrich POLICY
      // materializes a lookup table; here the caller hands it over
      // directly). Enriched values land as FLAT `<target>_<col>`
      // columns — the frame spelling of ES's target-field object,
      // same convention as the geo column pairs.
      enrich: Map[String, (DataFrame, String)] = Map.empty): DataFrame => DataFrame = {
    require(depth <= 5, "ingest pipeline nesting deeper than 5 (cycle?)")
    val procs = JsonMethods.parse(json) match {
      case JObject(fields) => fields.toMap.get("processors") match {
        case Some(JArray(xs)) => xs
        case _ => throw new IllegalArgumentException(
          "ingest pipeline needs a processors array")
      }
      case _ => throw new IllegalArgumentException(
        s"bad ingest pipeline: $json")
    }
    val steps: Seq[DataFrame => DataFrame] = procs.map {
      case JObject(JField(op, JObject(spec)) :: Nil) =>
        val m = spec.toMap
        def field = m.get("field").collect { case JString(s) => s }
          .getOrElse(throw new IllegalArgumentException(s"$op needs field"))
        op match {
          case "set" =>
            val v = m.getOrElse("value",
              throw new IllegalArgumentException("set needs value")) match {
              case JString(s) => lit(s)
              case JInt(i) => lit(i.toLong)
              case JLong(l) => lit(l)
              case JDouble(d) => lit(d)
              case JBool(b) => lit(b)
              case other => throw new IllegalArgumentException(
                s"unsupported set value: $other")
            }
            df => df.withColumn(field, v)
          case "rename" =>
            val target = m.get("target_field").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("rename needs target_field"))
            df => df.withColumnRenamed(field, target)
          case "remove" => df => df.drop(field)
          case "convert" =>
            val t = m.get("type").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("convert needs type"))
            val sparkType = t match {
              case "integer" => "int"
              case "long" => "long"
              case "float" => "float"
              case "double" => "double"
              case "string" => "string"
              case "boolean" => "boolean"
              case other => throw new IllegalArgumentException(
                s"unsupported convert type: $other")
            }
            val handlers = failureHandlers(m, op)
            // without on_failure a bad value fails the job (ANSI cast
            // throws — ES likewise fails the doc); with it, try_cast
            // nulls out and the handlers tag/fallback per row
            if (handlers.isEmpty) df => df.withColumn(field, col(field).cast(sparkType))
            else df => withTried(df, field, field,
              expr(s"try_cast(`$field` AS $sparkType)"), handlers)
          // ES `enrich` processor: look the doc's field up in the
          // policy's table and attach the matched row's columns. A
          // BROADCAST left join — enrich tables are dimension-sized
          // by construction (ES materializes them into a single-shard
          // enrich index), so 100 TB of docs never shuffles.
          case "enrich" =>
            val policy = m.get("policy_name").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("enrich needs policy_name"))
            val target = m.get("target_field").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("enrich needs target_field"))
            val unknownE = m.keySet -- Set("policy_name", "field", "target_field")
            require(unknownE.isEmpty,
              s"unsupported enrich option(s): ${unknownE.toSeq.sorted.mkString(", ")}")
            val (table, matchKey) = enrich.getOrElse(policy,
              throw new IllegalArgumentException(
                s"unknown enrich policy '$policy' (registered: " +
                  s"${enrich.keys.toSeq.sorted.mkString(", ")})"))
            // ES's enrich default is max_matches = 1; a duplicate
            // match key here would silently DUPLICATE every matching
            // document through the join — loud instead (one tiny job
            // over the dimension-sized policy table, once per compile)
            val dupKeys = table.groupBy(col(matchKey))
              .count().where(col("count") > 1).limit(1).count()
            require(dupKeys == 0,
              s"enrich policy '$policy' has duplicate '$matchKey' values — " +
                "a join would duplicate matching documents (ES max_matches=1); " +
                "de-duplicate the policy table first")
            val f = field
            df => {
              val renamed = table.columns.foldLeft(table) { (t, c) =>
                t.withColumnRenamed(c,
                  if (c == matchKey) "__graft_enrich_key" else s"${target}_$c")
              }
              df.join(broadcast(renamed),
                col(f) === col("__graft_enrich_key"), "left")
                .drop("__graft_enrich_key")
            }
          // ES `inference` processor: run the configured model on the
          // doc's field, write the prediction to target_field — routed
          // through the InferenceService seam (the deterministic stub
          // here; a deployment swaps Inference.service). model_id
          // names the deployment like ES; WHICH model actually runs is
          // the seam's concern, exactly as in the ES|QL COMPLETION row.
          case "inference" =>
            m.get("model_id").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("inference needs model_id"))
            val target = m.get("target_field").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("inference needs target_field"))
            val unknownI = m.keySet -- Set("model_id", "field", "target_field")
            require(unknownI.isEmpty,
              s"unsupported inference option(s): ${unknownI.toSeq.sorted.mkString(", ")}")
            val svc = graft.inference.Inference.service
            val f = field
            df => df.withColumn(target, svc.complete(col(f)))
          case "lowercase" => df => df.withColumn(field, lower(col(field)))
          case "uppercase" => df => df.withColumn(field, upper(col(field)))
          case "trim" => df => df.withColumn(field, trim(col(field)))
          case "gsub" =>
            val pattern = m.get("pattern").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("gsub needs pattern"))
            val replacement = m.get("replacement").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("gsub needs replacement"))
            df => df.withColumn(field, regexp_replace(col(field), pattern, replacement))
          // structured extraction: delegate to the SAME compilers the
          // ES|QL DISSECT/GROK commands use — one anchored regex,
          // narrow codegen'd columns
          case "dissect" =>
            val pattern = m.get("pattern").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("dissect needs pattern"))
            df => graft.dsl.Esql.applyCommand(df, s"""dissect $field "$pattern"""")
          case "grok" =>
            val pattern = m.get("patterns") match {
              case Some(JArray(JString(p) :: _)) => p
              case Some(JString(p)) => p
              case _ => throw new IllegalArgumentException("grok needs patterns")
            }
            df => graft.dsl.Esql.applyCommand(df, s"""grok $field "$pattern"""")
          case "date" =>
            val fmt = m.get("formats") match {
              case Some(JArray(JString(f) :: _)) => f
              case Some(JString(f)) => f
              case _ => throw new IllegalArgumentException("date needs formats")
            }
            val target = m.get("target_field").collect { case JString(s) => s }
              .getOrElse("@timestamp")
            val handlers = failureHandlers(m, op)
            if (handlers.isEmpty) df => df.withColumn(target, to_timestamp(col(field), fmt))
            else df => withTried(df, field, target,
              try_to_timestamp(col(field), lit(fmt)), handlers)
          case "kv" =>
            val fs = m.get("field_split").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("kv needs field_split"))
            val vs = m.get("value_split").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("kv needs value_split"))
            val target = m.get("target_field").collect { case JString(s) => s }
              .getOrElse(field)
            df => df.withColumn(target, str_to_map(col(field), lit(fs), lit(vs)))
          case "json" =>
            // schema-free subset: flat string-valued objects (the
            // common log-enrichment shape) land as map<string,string>
            val target = m.get("target_field").collect { case JString(s) => s }
              .getOrElse(field)
            val handlers = failureHandlers(m, op)
            val parsed = from_json(col(field), org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.StringType))
            df => withTried(df, field, target, parsed, handlers)
          case "script" =>
            // Painless subset (incl. statements) computing ONE value
            // into target_field — the dominant script-processor use
            val src = m.get("source").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("script needs source"))
            val target = m.get("target_field").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException(
                "script needs target_field (the computed-value subset)"))
            val params: Map[String, Any] = m.get("params") match {
              case Some(JObject(ps)) => ps.collect {
                case JField(k, JInt(i)) => k -> i.toLong
                case JField(k, JDouble(d)) => k -> d
                case JField(k, JString(s)) => k -> s
              }.toMap
              case _ => Map.empty
            }
            df => df.withColumn(target, graft.dsl.Painless.compile(src, params))
          case "csv" =>
            val targets = m.get("target_fields") match {
              case Some(JArray(xs)) => xs.collect { case JString(s) => s }
              case _ => throw new IllegalArgumentException("csv needs target_fields")
            }
            val sep = m.get("separator").collect { case JString(s) => s }.getOrElse(",")
            df => {
              val parts = split(col(field), java.util.regex.Pattern.quote(sep))
              targets.zipWithIndex.foldLeft(df) { case (d, (t, i)) =>
                d.withColumn(t, element_at(parts, i + 1))
              }
            }
          case "split" =>
            val sep = m.get("separator").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("split needs separator"))
            df => df.withColumn(field, split(col(field), sep)) // regex, like ES
          case "join" =>
            val sep = m.get("separator").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("join needs separator"))
            df => df.withColumn(field, array_join(col(field), sep))
          case "append" =>
            // appends to an array field, creating it from a missing /
            // null value like ES (scalar fields are the caller's bug)
            val v = m.getOrElse("value",
              throw new IllegalArgumentException("append needs value")) match {
              case JString(s) => lit(s)
              case JInt(i) => lit(i.toLong)
              case JDouble(d) => lit(d)
              case other => throw new IllegalArgumentException(
                s"unsupported append value: $other")
            }
            df => df.withColumn(field,
              if (df.columns.contains(field))
                concat(coalesce(col(field), array()), array(v))
              else array(v))
          case "urldecode" =>
            df => df.withColumn(field, url_decode(col(field)))
          case "bytes" =>
            // "1kb" -> 1024; case-insensitive units b..pb, ES semantics
            val t = m.get("target_field").collect { case JString(s) => s }.getOrElse(field)
            val handlers = failureHandlers(m, op)
            df => {
              val s = lower(trim(col(field)))
              val numStr = regexp_extract(s, "^(\\d+(?:\\.\\d+)?)", 1)
              val num =
                if (handlers.isEmpty) numStr.cast("double")
                else try_cast_double(numStr)
              val unit = regexp_extract(s, "([a-z]+)$", 1)
              val mult = when(unit === "b" || unit === "", 1L)
                .when(unit === "kb", 1L << 10).when(unit === "mb", 1L << 20)
                .when(unit === "gb", 1L << 30).when(unit === "tb", 1L << 40)
                .when(unit === "pb", 1L << 50)
              withTried(df, field, t, (num * mult).cast("long"), handlers)
            }
          case "fingerprint" =>
            val fields = m.get("fields") match {
              case Some(JArray(xs)) => xs.collect { case JString(s) => s }
              case _ => throw new IllegalArgumentException("fingerprint needs fields")
            }
            val t = m.get("target_field").collect { case JString(s) => s }
              .getOrElse("fingerprint")
            // ES hashes the ordered (field, value) sequence; the
            // separator keeps ("ab","c") distinct from ("a","bc")
            df => df.withColumn(t,
              md5(concat_ws("|", fields.map(f => col(f).cast("string")): _*)))
          case "drop" =>
            // drop the DOCUMENT when the Painless `if` holds — the only
            // row-removing processor; compiles to one filter predicate
            val cond = m.get("if").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("drop needs if"))
            df => df.where(graft.dsl.Painless.compile(cond, Map.empty) === 0.0)
          case "foreach" =>
            // per-element transform over an array field; the inner
            // processor references ES's _ingest._value cursor. The
            // lambda is a Spark HOF (interpreted) — fine on the write
            // path where the array is the unit of work anyway.
            val (subOp, subSpec) = m.get("processor") match {
              case Some(JObject(JField(o, JObject(sp)) :: Nil)) => (o, sp.toMap)
              case _ => throw new IllegalArgumentException("foreach needs processor")
            }
            val elemFn: Column => Column = subOp match {
              case "lowercase" => lower
              case "uppercase" => upper
              case "trim" => trim(_)
              case "gsub" =>
                val p = subSpec.get("pattern").collect { case JString(s) => s }
                  .getOrElse(throw new IllegalArgumentException("gsub needs pattern"))
                val r = subSpec.get("replacement").collect { case JString(s) => s }
                  .getOrElse(throw new IllegalArgumentException("gsub needs replacement"))
                x => regexp_replace(x, p, r)
              case other => throw new IllegalArgumentException(
                s"unsupported foreach sub-processor: $other")
            }
            df => df.withColumn(field, transform(col(field), elemFn))
          case "uri_parts" =>
            // URL decomposition (scheme/host/port/path/query/fragment)
            // as one struct — regexp_extract groups over RFC 3986's
            // own reference regex, all codegen'd
            val t = m.get("target_field").collect { case JString(s) => s }
              .getOrElse("url")
            df => {
              val u = col(field)
              df.withColumn(t, struct(
                regexp_extract(u, "^([a-z][a-z0-9+.-]*):", 1).as("scheme"),
                regexp_extract(u, "^[a-z][a-z0-9+.-]*://(?:[^@/]*@)?([^:/?#]+)", 1).as("host"),
                regexp_extract(u, "^[a-z][a-z0-9+.-]*://[^:/?#]+:(\\d+)", 1).as("port"),
                regexp_extract(u, "^(?:[a-z][a-z0-9+.-]*://[^/?#]*)?([^?#]*)", 1).as("path"),
                regexp_extract(u, "\\?([^#]*)", 1).as("query"),
                regexp_extract(u, "#(.*)$", 1).as("fragment")))
            }
          case "user_agent" =>
            // the common-browser heuristic subset of ES's UA parser
            // (the full processor ships a regex database; the fields
            // and shape match, the taxonomy is the big-five browsers)
            val t = m.get("target_field").collect { case JString(s) => s }
              .getOrElse("user_agent")
            df => {
              val ua = col(field)
              val name = when(ua.rlike("(?i)edg(e|a|ios)?/"), "Edge")
                .when(ua.rlike("(?i)opr/|opera"), "Opera")
                .when(ua.rlike("(?i)chrome/"), "Chrome")
                .when(ua.rlike("(?i)firefox/"), "Firefox")
                .when(ua.rlike("(?i)safari/") && !ua.rlike("(?i)chrome/"), "Safari")
                .otherwise("Other")
              val os = when(ua.rlike("(?i)windows"), "Windows")
                .when(ua.rlike("(?i)android"), "Android")
                .when(ua.rlike("(?i)iphone|ipad|ios"), "iOS")
                .when(ua.rlike("(?i)mac os"), "Mac OS X")
                .when(ua.rlike("(?i)linux"), "Linux")
                .otherwise("Other")
              val version = coalesce(
                regexp_extract(ua, "(?i)(?:edg[ea]?|opr|chrome|firefox|version)/(\\d+[\\d.]*)", 1),
                lit(""))
              df.withColumn(t, struct(
                name.as("name"), version.as("version"), os.as("os"),
                when(ua.rlike("(?i)mobile|iphone|android"), "Mobile Device")
                  .otherwise("Other").as("device")))
            }
          case "registered_domain" =>
            // eTLD+1 extraction with a built-in public-suffix SUBSET
            // (the common one- and two-label suffixes); ES ships the
            // full PSL — swap the list, the label logic is identical.
            // A bare suffix or single label yields null like ES.
            val t = m.get("target_field").collect { case JString(s) => s }
              .getOrElse("registered_domain")
            val twoLabel = Seq("co.uk", "org.uk", "ac.uk", "com.au",
              "net.au", "co.jp", "com.br", "co.in", "com.cn", "co.nz")
            df => {
              val parts = split(lower(trim(col(field))), "\\.")
              val nParts = size(parts)
              // try_element_at: ANSI element_at THROWS on short hosts
              val last2 = concat_ws(".",
                try_element_at(parts, lit(-2)), try_element_at(parts, lit(-1)))
              val isTwoLabelSuffix = twoLabel
                .map(sfx => last2 === sfx).reduce(_ || _)
              df.withColumn(t,
                when(isTwoLabelSuffix && nParts >= 3,
                  concat_ws(".", try_element_at(parts, lit(-3)),
                    try_element_at(parts, lit(-2)), try_element_at(parts, lit(-1))))
                  .when(!isTwoLabelSuffix && nParts >= 2, last2))
            }
          case "pipeline" =>
            // nested pipeline: processor-list inlining — the named
            // pipeline's compiled steps splice into this chain, so
            // Catalyst still collapses everything into one projection
            val name = m.get("name").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("pipeline needs name"))
            val sub = registry.getOrElse(name, throw new IllegalArgumentException(
              s"unknown pipeline '$name' (register named pipelines via " +
                "graft.ingest.pipeline.<name> options / the registry argument)"))
            compile(sub, registry, depth + 1)
          case "geoip" =>
            // geoip with the processor's REAL output shape (struct of
            // continent_name / country_iso_code / location{lat,lon})
            // over a SYNTHETIC deterministic prefix table — no GeoLite
            // database ships in this environment, so first-octet class
            // ranges stand in. Swapping a real prefix table in reuses
            // the same compiled range-match plumbing unchanged;
            // private ranges yield null like ES's no-match.
            val t = m.get("target_field").collect { case JString(s) => s }
              .getOrElse("geoip")
            df => {
              val o1 = split(col(field), "\\.").getItem(0).cast("long")
              val o2 = split(col(field), "\\.").getItem(1).cast("long")
              val isPrivate = o1 === 10L ||
                (o1 === 192L && o2 === 168L) ||
                (o1 === 172L && o2 >= 16L && o2 <= 31L) ||
                o1 === 127L
              def entry(cont: String, iso: String, la: Double, lo: Double) =
                struct(lit(cont).as("continent_name"),
                  lit(iso).as("country_iso_code"),
                  struct(lit(la).as("lat"), lit(lo).as("lon")).as("location"))
              df.withColumn(t,
                when(isPrivate, lit(null))
                  .when(o1 <= 63L, entry("North America", "US", 38.0, -97.0))
                  .when(o1 <= 126L, entry("Europe", "DE", 51.0, 9.0))
                  .when(o1 <= 191L, entry("Asia", "JP", 36.0, 138.0))
                  .when(o1 <= 223L, entry("Oceania", "AU", -25.0, 133.0))
                  .otherwise(entry("South America", "BR", -14.0, -51.0)))
            }
          case "html_strip" =>
            // same char-filter semantics as the analyzer chain: tags
            // out, five common entities decoded (&amp; last)
            df => df.withColumn(field, graft.analysis.Analyzer.htmlStrip(col(field)))
          case "sort" =>
            val asc = m.get("order").collect { case JString(s) => s }
              .getOrElse("asc") match {
                case "asc" => true
                case "desc" => false
                case other => throw new IllegalArgumentException(
                  s"bad sort order: $other")
              }
            df => df.withColumn(field, sort_array(col(field), asc))
          case "dot_expander" =>
            // "a.b.c" -> nested object a{b{c}}, dotted source dropped.
            // ES merges into an existing root object; only the
            // create-new path compiles — a pre-existing root column
            // fails loudly rather than silently clobbering it.
            val parts = field.split("\\.")
            require(parts.length >= 2, s"dot_expander needs a dotted field: $field")
            df => {
              require(!df.columns.contains(parts.head),
                s"dot_expander: root '${parts.head}' already exists (merge unsupported)")
              val nested = parts.drop(1).reverse
                .foldLeft(col(s"`$field`"))((c, n) => struct(c.as(n)))
              df.withColumn(parts.head, nested).drop(field)
            }
          case "date_index_name" =>
            // computes the time-based routing index `_index` =
            // prefix + rounded date — feeds saveDynamic's {field}
            // pattern for time-partitioned writes
            val prefix = m.get("index_name_prefix")
              .collect { case JString(s) => s }.getOrElse("")
            val unit = m.get("date_rounding")
              .collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException(
                "date_index_name needs date_rounding")) match {
                case "y" => "year"; case "M" => "month"; case "w" => "week"
                case "d" => "day"; case "h" => "hour"; case "m" => "minute"
                case "s" => "second"
                case other => throw new IllegalArgumentException(
                  s"bad date_rounding: $other")
              }
            val fmt = m.get("index_name_format")
              .collect { case JString(s) => s }.getOrElse("yyyy-MM-dd")
            df => df.withColumn("_index", concat(lit(prefix),
              date_format(date_trunc(unit, col(field).cast("timestamp")), fmt)))
          case "redact" =>
            // ES 8.7 redact: each grok-named capture is masked as
            // <name> in place (same public base patterns as the GROK
            // compilers, plus EMAILADDRESS). Sequential regexp_replace
            // per pattern — narrow, codegen'd.
            val pats = m.get("patterns") match {
              case Some(JArray(xs)) => xs.map {
                case JString(s) => s
                case other => throw new IllegalArgumentException(
                  s"bad redact pattern: $other")
              }
              case _ => throw new IllegalArgumentException("redact needs patterns")
            }
            val pre = m.get("prefix").collect { case JString(s) => s }.getOrElse("<")
            val suf = m.get("suffix").collect { case JString(s) => s }.getOrElse(">")
            val lib = graft.dsl.GrokPatterns.base
            val key = "%\\{([A-Z0-9_]+):([A-Za-z0-9_]+)\\}".r
            val compiled = pats.map {
              case key(pat, name) => (lib.getOrElse(pat,
                throw new IllegalArgumentException(s"unknown redact pattern: %{$pat}")),
                pre + name + suf)
              case other => throw new IllegalArgumentException(
                s"bad redact pattern: $other")
            }
            df => df.withColumn(field, compiled.foldLeft(col(field)) {
              case (c, (rx, mask)) => regexp_replace(c, rx, mask)
            })
          case other => throw new IllegalArgumentException(
            s"unsupported ingest processor: $other")
        }
      case other => throw new IllegalArgumentException(
        s"bad processor entry: $other")
    }
    df => steps.foldLeft(df)((d, f) => f(d))
  }
}
