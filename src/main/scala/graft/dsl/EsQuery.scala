package graft.dsl

import org.apache.spark.sql.Column

/** Unified `es.query` entry point: the reference accepts either a URI
  * query (`?q=...` Lucene syntax) or a full Query-DSL JSON object —
  * dispatch on the payload shape, exactly like the connector does. */
object EsQuery {
  def compile(q: String, idField: String = "_id", defaultField: String = "text",
      corpus: Option[org.apache.spark.sql.DataFrame] = None): Column = {
    val t = q.trim
    if (t.startsWith("{"))
      corpus.fold(QueryDslJson.compile(t, idField))(
        f => QueryDslJson.compile(t, idField, f))
    else {
      val body =
        if (t.startsWith("?q=")) t.substring(3)
        else if (t.startsWith("q=")) t.substring(2)
        else t
      UriQuery.compile(body, defaultField)
    }
  }
}
