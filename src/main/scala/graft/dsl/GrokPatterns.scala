package graft.dsl

/** The shared grok base-pattern library (public grok pattern names,
  * the commonly-used subset) for ES|QL GROK, the ingest `grok`
  * processor (which delegates to the ES|QL compiler) and the ingest
  * `redact` processor. QUOTEDSTRING and HOSTNAME are the simplified
  * forms (no escaped-quote handling / no trailing-dot labels) —
  * declared, like the rest of the subset-not-the-full-library stance.
  */
object GrokPatterns {
  val base: Map[String, String] = Map(
    "WORD" -> "\\w+",
    "NUMBER" -> "-?\\d+(?:\\.\\d+)?",
    "INT" -> "-?\\d+",
    "NOTSPACE" -> "\\S+",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "IP" -> "\\d{1,3}(?:\\.\\d{1,3}){3}",
    "LOGLEVEL" -> "TRACE|DEBUG|INFO|WARN|ERROR|FATAL",
    "TIMESTAMP_ISO8601" -> ("\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}:\\d{2}" +
      "(?:[.,]\\d+)?(?:Z|[+-]\\d{2}:?\\d{2})?"),
    "UUID" -> "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "MAC" -> "(?:[0-9a-fA-F]{2}[:-]){5}[0-9a-fA-F]{2}",
    "HOSTNAME" -> "(?:[A-Za-z0-9-]+\\.)+[A-Za-z]{2,}",
    "PATH" -> "(?:/[\\w.-]+)+",
    "EMAILADDRESS" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "QUOTEDSTRING" -> "\"[^\"]*\"",
    "USERNAME" -> "[a-zA-Z0-9._-]+")
}
