package graft.dsl

import org.json4s._
import org.json4s.jackson.JsonMethods

/** ES query rules (`_query_rules/{ruleset_id}`, ES 8.10): stored
  * rulesets whose rules fire when the request's `match_criteria`
  * satisfy the rule's `criteria`, promoting (`pinned`) or dropping
  * (`exclude`) fixed doc ids on top of an organic query.
  *
  * The store mirrors ScriptStore: driver-side cluster-state analog —
  * criteria are matched against the REQUEST (not documents), so rule
  * evaluation happens entirely at plan-construction time and the
  * executed plan only ever sees the resolved pinned/excluded id sets
  * (one CASE sort key + one NOT-IN predicate; rules never touch the
  * corpus scan).
  */
object RuleStore {
  private val store = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def put(id: String, rulesetJson: String): Unit = store.put(id, rulesetJson)
  def get(id: String): Option[String] = Option(store.get(id))
  def delete(id: String): Unit = store.remove(id)

  def resolve(id: String): String = get(id).getOrElse(
    throw new IllegalArgumentException(s"no stored query ruleset: $id"))
}

object QueryRules {

  /** Evaluate rulesets against the request's match_criteria and fold
    * the fired rules' actions: (pinned ids in rule order, deduped;
    * excluded ids). A rule fires when ALL its criteria match; a
    * criterion matches when the named metadata value satisfies ANY of
    * its `values` under the criterion's `type` — exactly ES's
    * semantics. Supported types: always, exact, contains, prefix,
    * suffix (the fuzzy/numeric family is loud, not silently false). */
  def firedActions(rulesetJsons: Seq[String],
      matchCriteria: Map[String, String]): (Seq[Long], Seq[Long]) = {
    val fired = rulesetJsons.flatMap(parseRules).filter(r =>
      r.criteria.forall(criterionMatches(_, matchCriteria)))
    val pinned = fired.filter(_.pin).flatMap(_.ids).distinct
    val excluded = fired.filter(!_.pin).flatMap(_.ids).distinct
    (pinned, excluded)
  }

  private case class Rule(pin: Boolean, criteria: Seq[Criterion], ids: Seq[Long])
  private case class Criterion(kind: String, metadata: Option[String], values: Seq[String])

  private def criterionMatches(c: Criterion, m: Map[String, String]): Boolean =
    c.kind match {
      case "always" => true
      case kind => c.metadata.flatMap(m.get) match {
        case None => false // request carries no such metadata -> no fire
        case Some(actual) => c.values.exists { v =>
          kind match {
            case "exact" => actual == v
            case "contains" => actual.contains(v)
            case "prefix" => actual.startsWith(v)
            case "suffix" => actual.endsWith(v)
            case other => throw new IllegalArgumentException(
              s"unsupported query-rule criterion type: $other")
          }
        }
      }
    }

  private def parseRules(json: String): Seq[Rule] = JsonMethods.parse(json) match {
    case JObject(fields) => fields.toMap.get("rules") match {
      case Some(JArray(rules)) => rules.map(parseRule)
      case _ => throw new IllegalArgumentException("query ruleset needs a rules array")
    }
    case other => throw new IllegalArgumentException(s"bad query ruleset: $other")
  }

  private def parseRule(r: JValue): Rule = r match {
    case JObject(fields) =>
      val m = fields.toMap
      val pin = m.get("type") match {
        case Some(JString("pinned")) => true
        case Some(JString("exclude")) => false
        case other => throw new IllegalArgumentException(
          s"query rule type must be pinned|exclude: $other")
      }
      val criteria = m.get("criteria") match {
        case Some(JArray(cs)) if cs.nonEmpty => cs.map {
          case JObject(cf) =>
            val cm = cf.toMap
            Criterion(
              cm.get("type") match {
                case Some(JString(t)) => t
                case other => throw new IllegalArgumentException(s"criterion needs type: $other")
              },
              cm.get("metadata").collect { case JString(k) => k },
              cm.get("values") match {
                case Some(JArray(vs)) => vs.map {
                  case JString(s) => s
                  case JInt(i) => i.toString
                  case JDouble(d) => d.toString
                  case other => throw new IllegalArgumentException(s"bad criterion value: $other")
                }
                case None => Nil
                case other => throw new IllegalArgumentException(s"bad criterion values: $other")
              })
          case other => throw new IllegalArgumentException(s"bad criterion: $other")
        }
        case _ => throw new IllegalArgumentException("query rule needs non-empty criteria")
      }
      val ids = m.get("actions") match {
        case Some(JObject(af)) => af.toMap.get("ids") match {
          case Some(JArray(xs)) if xs.nonEmpty => xs.map {
            case JInt(i) => i.toLong
            case JLong(l) => l
            case JString(s) => s.toLong
            case other => throw new IllegalArgumentException(s"bad action id: $other")
          }
          case _ => throw new IllegalArgumentException(
            "query rule actions need a non-empty ids list (docs form is unsupported)")
        }
        case other => throw new IllegalArgumentException(s"query rule needs actions: $other")
      }
      Rule(pin, criteria, ids)
    case other => throw new IllegalArgumentException(s"bad query rule: $other")
  }
}
