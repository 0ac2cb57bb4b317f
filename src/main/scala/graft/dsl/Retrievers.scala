package graft.dsl

import graft.search.Search
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The ES 8.16 `retriever` search-body tree: composable retrieval
  * stages replacing the flat query+knn body.
  *
  * Leaves:
  *   - `{"standard": {"query": {"match": {f: q}}}}` — BM25 scores
  *     over the docs frame's analyzed field
  *   - `{"knn": {"field": f, "query_vector": [...]}}` — cosine
  *     scores over the vectors frame
  * Composites (children must be leaves — one fusion level, like the
  * common production layouts; ES allows deeper trees):
  *   - `{"rrf": {"retrievers": [...], "rank_window_size",
  *     "rank_constant"}}` — reciprocal-rank fusion
  *   - `{"linear": {"retrievers": [{"retriever": r, "weight": w},
  *     ...], "rank_window_size"}}` — min-max-normalized weighted sum
  *
  * Each leaf yields an UNRANKED (id, score) frame; fusion windows it
  * (TakeOrderedAndProject) before any cross-retriever work, so the
  * fusion cost is rank_window_size-bounded regardless of corpus size
  * — identical plans to the hand-written hybrid operators.
  */
object Retrievers {

  def topK(
      docs: DataFrame, docId: String,
      vectors: DataFrame, vecId: String,
      json: String, k: Int): DataFrame = {
    val root = JsonMethods.parse(json) match {
      case JObject(JField("retriever", r) :: Nil) => r
      case r: JObject => r
      case other => throw new IllegalArgumentException(s"bad retriever body: $other")
    }
    root match {
      case JObject(JField("rrf", JObject(parts)) :: Nil) =>
        val m = parts.toMap
        Search.rrfTopK(
          children(m).map(leaf(docs, docId, vectors, vecId, _)),
          rankConstant = num(m, "rank_constant", 60),
          windowSize = num(m, "rank_window_size", 100), k = k)
      case JObject(JField("linear", JObject(parts)) :: Nil) =>
        val m = parts.toMap
        val weighted = children(m).map {
          case JObject(fields) =>
            val wm = fields.toMap
            val r = wm.getOrElse("retriever",
              throw new IllegalArgumentException("linear child needs retriever"))
            val w = wm.get("weight").map(numVal).getOrElse(1.0)
            (leaf(docs, docId, vectors, vecId, r), w)
          case other => throw new IllegalArgumentException(s"bad linear child: $other")
        }
        Search.linearTopK(weighted,
          windowSize = num(m, "rank_window_size", 100), k = k)
      case l =>
        leaf(docs, docId, vectors, vecId, l)
          .orderBy(col("score").desc, col("id").asc).limit(k)
    }
  }

  private def children(m: Map[String, JValue]): Seq[JValue] = m.get("retrievers") match {
    case Some(JArray(xs)) if xs.nonEmpty => xs
    case _ => throw new IllegalArgumentException("composite retriever needs retrievers")
  }

  private def numVal(v: JValue): Double = v match {
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case other => throw new IllegalArgumentException(s"expected a number: $other")
  }

  private def num(m: Map[String, JValue], key: String, default: Int): Int =
    m.get(key).map(numVal(_).toInt).getOrElse(default)

  private def leaf(
      docs: DataFrame, docId: String,
      vectors: DataFrame, vecId: String, rule: JValue): DataFrame = rule match {
    case JObject(JField("standard", JObject(parts)) :: Nil) =>
      parts.toMap.get("query") match {
        case Some(JObject(JField("match", JObject(JField(f, qv) :: Nil)) :: Nil)) =>
          val q = qv match {
            case JString(s) => s
            case JObject(fields) => fields.toMap.get("query") match {
              case Some(JString(s)) => s
              case _ => throw new IllegalArgumentException("standard match needs query")
            }
            case other => throw new IllegalArgumentException(s"bad match body: $other")
          }
          Search.bm25Scores(docs, docId, f, q)
        case other => throw new IllegalArgumentException(
          s"standard retriever supports a match query, got: $other")
      }
    case JObject(JField("knn", JObject(parts)) :: Nil) =>
      val m = parts.toMap
      val field = m.get("field") match {
        case Some(JString(f)) => f
        case _ => throw new IllegalArgumentException("knn retriever needs field")
      }
      val qv: Column = m.get("query_vector") match {
        case Some(JArray(xs)) => array(xs.map(x => lit(numVal(x))): _*)
        case _ => throw new IllegalArgumentException("knn retriever needs query_vector")
      }
      vectors.select(col(vecId).as("id"),
        graft.util.Num.round(graft.dedup.Vectors.cosine(
          col(field).cast("array<double>"), qv), 4).as("score"))
    case other => throw new IllegalArgumentException(s"unsupported retriever: $other")
  }
}
