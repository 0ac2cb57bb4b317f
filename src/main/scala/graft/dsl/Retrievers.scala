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
  * Composites (children may be leaves OR composites — ES 8.14+ nested
  * trees, e.g. rrf over linear-fused legs):
  *   - `{"rrf": {"retrievers": [...], "rank_window_size",
  *     "rank_constant"}}` — reciprocal-rank fusion
  *   - `{"linear": {"retrievers": [{"retriever": r, "weight": w},
  *     ...], "rank_window_size"}}` — min-max-normalized weighted sum
  *   - `{"text_similarity_reranker": {"retriever": r, "field",
  *     "inference_text", "rank_window_size"}}` — the ES 8.18 semantic
  *     reranker: the child's top rank_window_size hits are re-scored
  *     by `InferenceService.rerankScore` (deterministic term-overlap
  *     stub here; a production deployment swaps `Inference.service`)
  *   - `{"rule": {"retriever": r, "ruleset_ids", "match_criteria"}}`
  *     — ES 8.15 query rules over a child leg (criteria evaluated at
  *     plan time via QueryRules; promotion encoded as max-region
  *     scores so parent fusion reproduces the order)
  *   - `{"pinned": {"retriever": r, "ids": [...]}}` — ES 8.18 pinned
  *     retriever (fixed promotion, same encoding)
  *
  * Each leaf yields an UNRANKED (id, score) frame; fusion windows it
  * (TakeOrderedAndProject) before any cross-retriever work, so the
  * fusion cost is rank_window_size-bounded regardless of corpus size
  * — identical plans to the hand-written hybrid operators. A nested
  * composite contributes its fused top-rank_window_size as an
  * ordinary (id, score) leg, so nesting multiplies only the bounded
  * window work, never corpus passes.
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
          children(m).map(eval(docs, docId, vectors, vecId, _)),
          rankConstant = num(m, "rank_constant", 60),
          windowSize = num(m, "rank_window_size", 100), k = k)
      case JObject(JField("linear", JObject(parts)) :: Nil) =>
        val m = parts.toMap
        Search.linearTopK(weightedChildren(docs, docId, vectors, vecId, m),
          windowSize = num(m, "rank_window_size", 100), k = k)
      case l =>
        eval(docs, docId, vectors, vecId, l)
          .orderBy(col("score").desc, col("id").asc).limit(k)
    }
  }

  /** A retriever node as an (id, score) leg: leaves score directly;
    * composites fuse their children and contribute their top
    * rank_window_size under the standard column names. */
  private def eval(
      docs: DataFrame, docId: String,
      vectors: DataFrame, vecId: String, rule: JValue): DataFrame = rule match {
    case JObject(JField("rrf", JObject(parts)) :: Nil) =>
      val m = parts.toMap
      val w = num(m, "rank_window_size", 100)
      Search.rrfTopK(
        children(m).map(eval(docs, docId, vectors, vecId, _)),
        rankConstant = num(m, "rank_constant", 60), windowSize = w, k = w)
        .select(col("id"), col("rrf_score").as("score"))
    case JObject(JField("linear", JObject(parts)) :: Nil) =>
      val m = parts.toMap
      val w = num(m, "rank_window_size", 100)
      Search.linearTopK(weightedChildren(docs, docId, vectors, vecId, m),
        windowSize = w, k = w)
        .select(col("id"), col("linear_score").as("score"))
    case JObject(JField("rescorer", JObject(parts)) :: Nil) =>
      // the ES 8.18 rescorer retriever: a rescore block applied over
      // the child's top rank_window_size — score' = score * qw +
      // script_score(_score=score) * rw, same math as the body's
      // rescore section (bounded TakeOrderedAndProject window)
      val m = parts.toMap
      val child = m.getOrElse("retriever",
        throw new IllegalArgumentException("rescorer needs a retriever"))
      val w = num(m, "rank_window_size", 10)
      val rq = m.get("rescore") match {
        case Some(JObject(r)) => r.toMap.get("query") match {
          case Some(JObject(q)) => q.toMap
          case _ => throw new IllegalArgumentException("rescorer rescore needs a query object")
        }
        case _ => throw new IllegalArgumentException("rescorer needs a rescore block")
      }
      val qw = rq.get("query_weight").map(numVal).getOrElse(1.0)
      val rw = rq.get("rescore_query_weight").map(numVal).getOrElse(1.0)
      val secondary = rq.get("rescore_query") match {
        case Some(JObject(JField("script_score", JObject(ss)) :: Nil)) =>
          ss.toMap.get("script") match {
            case Some(JObject(s)) => s.toMap.get("source") match {
              case Some(JString(src)) => src
              case _ => throw new IllegalArgumentException(
                "rescorer script_score needs script.source")
            }
            case _ => throw new IllegalArgumentException("rescorer script_score needs a script")
          }
        case other => throw new IllegalArgumentException(
          s"rescorer rescore_query supports script_score; got: $other")
      }
      val top = eval(docs, docId, vectors, vecId, child)
        .orderBy(col("score").desc, col("id").asc).limit(w)
      top.join(docs, top("id") === docs(docId))
        .select(top("id"),
          graft.util.Num.round(top("score") * qw +
            Painless.compile(secondary, score = top("score")) * rw, 4).as("score"))
    case JObject(JField("text_similarity_reranker", JObject(parts)) :: Nil) =>
      val m = parts.toMap
      val child = m.getOrElse("retriever",
        throw new IllegalArgumentException("text_similarity_reranker needs a retriever"))
      val field = m.get("field") match {
        case Some(JString(f)) => f
        case _ => throw new IllegalArgumentException("text_similarity_reranker needs field")
      }
      val itext = m.get("inference_text") match {
        case Some(JString(t)) => t
        case _ => throw new IllegalArgumentException(
          "text_similarity_reranker needs inference_text")
      }
      val w = num(m, "rank_window_size", 10) // ES default 10
      // the child's top-w ids fetch their text and are re-scored by
      // the inference seam — the model call touches w rows, bounded
      val top = eval(docs, docId, vectors, vecId, child)
        .orderBy(col("score").desc, col("id").asc).limit(w)
        .select(col("id"))
      top.join(docs.select(col(docId).as("id"), col(field).as("__rr_text")), "id")
        .select(col("id"), graft.util.Num.round(
          graft.inference.Inference.service
            .rerankScore(itext, col("__rr_text")).cast("double"), 4).as("score"))
    // {"rule": {"retriever": r, "ruleset_ids": [...],
    //  "match_criteria": {...}}} — the ES 8.15 rule retriever:
    // criteria-gated pins/excludes over the child's scored frame.
    // The tree contract is (id, score), so promotion is encoded as
    // score = 1e9 - pin_index — above any organic BM25/cosine score,
    // the same device ES's pinned query uses (float-max-region
    // scores) — and a parent's rank-by-score reproduces the promoted
    // order; exclusion is one NOT-IN predicate. Pinned ids the child
    // never scored still promote (ES pins docs the organic query
    // doesn't match): a bounded isin probe unions them in at the
    // pin score.
    case JObject(JField("rule", JObject(parts)) :: Nil) =>
      val m = parts.toMap
      val child = m.getOrElse("retriever",
        throw new IllegalArgumentException("rule retriever needs a retriever"))
      val rulesets = m.get("ruleset_ids") match {
        case Some(JArray(xs)) if xs.nonEmpty =>
          xs.map(x => RuleStore.resolve(x match {
            case JString(s) => s
            case other => throw new IllegalArgumentException(s"bad ruleset id: $other")
          }))
        case _ => throw new IllegalArgumentException("rule retriever needs ruleset_ids")
      }
      val crit = m.get("match_criteria") match {
        case Some(JObject(ps)) => ps.map {
          case JField(k, JString(v)) => k -> v
          case JField(k, v) => k -> JsonMethods.compact(JsonMethods.render(v))
        }.toMap
        case _ => throw new IllegalArgumentException("rule retriever needs match_criteria")
      }
      val (pins, excl) = QueryRules.firedActions(rulesets, crit)
      pinnedOverChild(docs, docId, vectors, vecId, child, pins, excl)

    // {"pinned": {"retriever": r, "ids": [...]}} — the ES 8.18 pinned
    // RETRIEVER (the retriever-tree form of the pinned query): fixed
    // promotion, no criteria. Same score encoding as `rule`.
    case JObject(JField("pinned", JObject(parts)) :: Nil) =>
      val m = parts.toMap
      val child = m.getOrElse("retriever",
        throw new IllegalArgumentException("pinned retriever needs a retriever"))
      val pins = m.get("ids") match {
        case Some(JArray(xs)) if xs.nonEmpty => xs.map(numVal(_).toLong)
        case _ => throw new IllegalArgumentException("pinned retriever needs ids")
      }
      pinnedOverChild(docs, docId, vectors, vecId, child, pins, Nil)

    case l => leaf(docs, docId, vectors, vecId, l)
  }

  /** Shared pin/exclude application over a child retriever's scored
    * frame (rule + pinned retrievers). */
  private def pinnedOverChild(
      docs: DataFrame, docId: String,
      vectors: DataFrame, vecId: String,
      child: JValue, pins: Seq[Long], excl: Seq[Long]): DataFrame = {
    val base = eval(docs, docId, vectors, vecId, child)
    val kept = if (excl.isEmpty) base else base.where(!col("id").isin(excl: _*))
    if (pins.isEmpty) kept
    else {
      val pinScore = pins.zipWithIndex.foldLeft(
        when(lit(false), 0.0)) { case (acc, (id, i)) =>
          acc.when(col("id") === id, lit(1e9 - i)) }
      val missing = docs.select(col(docId).as("id"))
        .where(col("id").isin(pins: _*))
        .join(kept.select(col("id")), Seq("id"), "left_anti")
        .withColumn("score", lit(0.0))
      kept.unionByName(missing)
        .select(col("id"), coalesce(pinScore, col("score")).as("score"))
    }
  }

  private def weightedChildren(
      docs: DataFrame, docId: String,
      vectors: DataFrame, vecId: String,
      m: Map[String, JValue]): Seq[(DataFrame, Double)] =
    children(m).map {
      case JObject(fields) if fields.toMap.contains("retriever") =>
        val wm = fields.toMap
        (eval(docs, docId, vectors, vecId, wm("retriever")),
          wm.get("weight").map(numVal).getOrElse(1.0))
      case other => throw new IllegalArgumentException(s"bad linear child: $other")
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
        case Some(q) =>
          // the FULL scored query phase (shared with the body front
          // door): match / multi_match / match_phrase score BM25,
          // bool trees sum their scoring clauses, filter shapes gate
          // at the constant score
          SearchBody.scoredQueryFrame(docs, docId,
            JsonMethods.compact(JsonMethods.render(q)))
        case None => throw new IllegalArgumentException(
          "standard retriever needs a query")
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
      // `filter` PRE-filters the searched corpus (ES knn semantics) —
      // the predicate pushes into the vector scan
      val base = m.get("filter")
        .map(f => vectors.where(EsQuery.compile(
          JsonMethods.compact(JsonMethods.render(f)), vecId)))
        .getOrElse(vectors)
      base.select(col(vecId).as("id"),
        graft.util.Num.round(graft.dedup.Vectors.cosine(
          col(field).cast("array<double>"), qv), 4).as("score"))
    case other => throw new IllegalArgumentException(s"unsupported retriever: $other")
  }
}
