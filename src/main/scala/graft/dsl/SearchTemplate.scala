package graft.dsl

import org.apache.spark.sql.Column
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The `_search/template` surface: a mustache-parameterized query
  * rendered then compiled through the Query-DSL compiler. The
  * reference's connector accepts stored/inline templates wherever it
  * accepts a query; graft supports the mustache subset templates
  * actually use:
  *
  *   - `{{var}}`            — scalar substitution (raw; quote string
  *                            vars in the template, like ES)
  *   - `{{#toJson}}var{{/toJson}}` — JSON-encode the value (arrays /
  *                            objects / properly-quoted strings)
  *   - `{{var}}{{^var}}default{{/var}}` — default when param absent
  *
  * Rendering is driver-side string work on a KB-sized template — the
  * output is one `Column` predicate, so the executed plan is identical
  * to the non-templated query (pushdown included).
  */
object SearchTemplate {

  private def jsonEncode(v: JValue): String = JsonMethods.compact(JsonMethods.render(v))

  /** Raw substitution value: strings bare (the template supplies any
    * quotes), everything else as compact JSON. */
  private def rawValue(v: JValue): String = v match {
    case JString(s) => s
    case other => jsonEncode(other)
  }

  /** Render a mustache template `source` against `params`. */
  def render(source: String, params: Map[String, JValue]): String = {
    // {{#toJson}}var{{/toJson}}
    val toJson = "\\{\\{#toJson\\}\\}\\s*([A-Za-z0-9_.]+)\\s*\\{\\{/toJson\\}\\}".r
    var out = toJson.replaceAllIn(source, m =>
      java.util.regex.Matcher.quoteReplacement(
        params.get(m.group(1)).map(jsonEncode).getOrElse("null")))
    // {{^var}}default{{/var}} — keep the default iff var is ABSENT
    val inverted = "\\{\\{\\^([A-Za-z0-9_.]+)\\}\\}(.*?)\\{\\{/\\1\\}\\}".r
    out = inverted.replaceAllIn(out, m =>
      java.util.regex.Matcher.quoteReplacement(
        if (params.contains(m.group(1))) "" else m.group(2)))
    // {{var}} — absent vars render empty (mustache semantics)
    val scalar = "\\{\\{([A-Za-z0-9_.]+)\\}\\}".r
    scalar.replaceAllIn(out, m =>
      java.util.regex.Matcher.quoteReplacement(
        params.get(m.group(1)).map(rawValue).getOrElse("")))
  }

  /** Compile a full `_search/template` body:
    * `{"source": <string|object>, "params": {...}}`. An object-form
    * source is serialized first (its parameters must then be
    * string-positioned, as in ES). */
  def compile(templateJson: String, idField: String = "_id"): Column = {
    val root = JsonMethods.parse(templateJson) match {
      case JObject(fields) => fields.toMap
      case other => throw new IllegalArgumentException(s"bad template body: $other")
    }
    val source = root.get("source") match {
      case Some(JString(s)) => s
      case Some(obj: JObject) => jsonEncode(obj)
      // {"id": "<stored>"} — a template registered via _scripts
      case None => root.get("id") match {
        case Some(JString(id)) => ScriptStore.resolve(id)
        case _ => throw new IllegalArgumentException("search template needs source or id")
      }
      case _ => throw new IllegalArgumentException("search template needs source")
    }
    val params = root.get("params") match {
      case Some(JObject(fields)) => fields.toMap
      case None => Map.empty[String, JValue]
      case other => throw new IllegalArgumentException(s"bad params: $other")
    }
    QueryDslJson.compile(render(source, params), idField)
  }
}
