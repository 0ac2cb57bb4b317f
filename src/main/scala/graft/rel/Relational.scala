package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Num

/** Relational patterns a connector user runs on ES-sourced frames, plus
  * the connector's write-path semantics and geo filters.
  */
object Relational {

  /** Dimension enrich: explicit `broadcast()` so the fact side never
    * shuffles — at 100 TB the dim tables (nation/region/part at TPC-H
    * ratios) stay tiny relative to the facts. */
  def enrich(fact: DataFrame, dim: DataFrame, key: Seq[String]): DataFrame =
    fact.join(broadcast(dim), key, "inner")

  /** Per-group top-N via one window pass (rank <= n). */
  def topNPerGroup(
      df: DataFrame,
      partCols: Seq[String],
      orderCol: Column,
      tieBreak: Column,
      n: Int): DataFrame = {
    // the rank column is part of the OUTPUT contract ("rn"), so a
    // caller column of that name would be silently clobbered — the
    // asofLookup r2 bug class; fail loudly instead
    require(!df.columns.contains("rn"),
      "topNPerGroup writes its rank to 'rn'; rename the existing 'rn' column first")
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCol, tieBreak)
    df.withColumn("rn", row_number().over(w)).where(col("rn") <= n)
  }

  /** The connector's `es.mapping.id` + `es.write.operation=upsert`
    * semantics: last write wins per document id — equivalent to ES
    * applying the bulk ops in order, but computed distributed (no
    * per-doc round trips).
    *
    * Implemented as `max_by(struct(row), struct(version, tiebreak))`
    * rather than a row_number window: the aggregate PARTIALLY combines
    * on the map side (each task ships at most one row per id it saw)
    * and never sorts, where the window shuffles and sorts every op.
    * At 100 TB of ops with a bounded id space that is the difference
    * between a combine-shrunk exchange and a full-data sort. */
  def upsertLastWriteWins(
      ops: DataFrame,
      idCols: Seq[String],
      versionCol: Column,
      tieBreak: Column): DataFrame = {
    val payload = struct(ops.columns.map(col).toIndexedSeq: _*)
    ops.groupBy(idCols.map(col): _*)
      .agg(max_by(payload, struct(versionCol, tieBreak)).as("_latest"))
      .select(ops.columns.map(c => col("_latest").getField(c).as(c)).toIndexedSeq: _*)
  }

  /** ES `nested` documents: parent rows carry an array-of-structs child
    * field (the mapping's `nested` type). `nest` builds that shape from
    * a flat child table (one shuffle on the parent key — at 100 TB this
    * is the same co-location you'd get from index-time nesting);
    * `nestedExists` is the `{"nested": {"path": ..., "query": ...}}`
    * semantics: parents with at least one child matching the predicate,
    * evaluated per-row on the array (narrow; no re-join). */
  def nest(children: DataFrame, parentKey: String, as: String): DataFrame = {
    val childCols = children.columns.filter(_ != parentKey).map(col)
    children.groupBy(col(parentKey))
      .agg(collect_list(struct(childCols.toIndexedSeq: _*)).as(as))
  }

  def nestedExists(
      parents: DataFrame,
      nested: DataFrame,
      parentKey: String,
      nestedKey: String,
      as: String,
      pred: Column => Column): DataFrame =
    parents
      // dataframe-qualified keys: `nest` names its key after the child
      // FK, so a SHARED key name (parent order_id / child order_id)
      // made the unqualified condition ambiguous
      .join(nested, parents(parentKey) === nested(nestedKey))
      .where(exists(col(as), pred))

  /** ES `parent_id` query: every child of ONE parent — in ES a
    * term lookup on the join field's parent value; here a pushed-down
    * equality on the child FK (partition pruning / row-group stats do
    * the work, no join at all). */
  def parentId(children: DataFrame, childFk: String, id: Any): DataFrame =
    children.where(col(childFk) === lit(id))

  /** ES `join`-field `has_child`: parents with between `minChildren`
    * and `maxChildren` children matching the predicate. The common
    * min=1/unbounded case is a pure left_semi join (no child counts
    * materialize, the join short-circuits per key); the counted form
    * aggregates the FILTERED children first, so only matching
    * (parent, count) pairs shuffle. */
  def hasChild(
      parents: DataFrame,
      children: DataFrame,
      parentKey: String,
      childFk: String,
      pred: Column,
      minChildren: Int = 1,
      maxChildren: Int = Int.MaxValue): DataFrame = {
    // the left_semi shapes below can only return parents WITH matching
    // children; a zero lower bound would need a different (anti-join)
    // plan and silently behaved as 1 — make the contract loud
    require(minChildren >= 1,
      s"has_child needs minChildren >= 1 (got $minChildren); use an anti-join for the zero-children case")
    if (minChildren <= 1 && maxChildren == Int.MaxValue)
      parents.join(
        children.where(pred).select(col(childFk).as(parentKey)),
        Seq(parentKey), "left_semi")
    else
      parents.join(
        children.where(pred)
          .groupBy(col(childFk).as(parentKey))
          .agg(count(lit(1)).as("_nc"))
          .where(col("_nc") >= minChildren && col("_nc") <= maxChildren)
          .select(col(parentKey)),
        Seq(parentKey), "left_semi")
  }

  /** `has_parent` with `score: true` — each matching child inherits
    * its parent's relevance (ES propagates the parent score down).
    * One join against the FILTERED parent side (broadcast-eligible
    * when the parent query is selective), score computed on parent
    * rows before the join so it evaluates |matching parents| times. */
  def hasParentScore(
      children: DataFrame,
      parents: DataFrame,
      parentKey: String,
      childFk: String,
      pred: Column,
      parentScore: Column): DataFrame = {
    val scored = parents.where(pred)
      .select(col(parentKey).as(childFk),
        graft.util.Num.round(parentScore, 4).as("score"))
    children.join(scored, Seq(childFk))
  }

  /** `nested` query with `score_mode` (avg | sum | max | min |
    * none→count): the parent's relevance folds the scores of its
    * MATCHING nested docs. One partial-aggregating groupBy over the
    * filtered children (map-side combine ships one partial per
    * (partition, parent)) + a broadcast-eligible join back to the
    * parents — no window, no per-parent subquery. */
  def nestedScore(
      parents: DataFrame,
      children: DataFrame,
      parentKey: String,
      childFk: String,
      pred: Column,
      childScore: Column,
      scoreMode: String): DataFrame = {
    val folded = scoreMode match {
      case "avg" => avg(childScore)
      case "sum" => sum(childScore)
      case "max" => max(childScore)
      case "min" => min(childScore)
      // ES score_mode none: matching parents get score 0 (the child
      // scores contribute NOTHING) — the old match-count fold reordered
      // any relevance-sorted comparison against real ES
      case "none" => max(lit(0.0))
      case other => throw new IllegalArgumentException(s"bad nested score_mode: $other")
    }
    val childAgg = children.where(pred)
      .groupBy(col(childFk).as(parentKey))
      .agg(graft.util.Num.round(folded, 4).as("score"))
    parents.join(childAgg, Seq(parentKey))
  }

  /** AS-OF join (point-in-time lookup): each left row picks up the
    * right-side `valueCol` from the LATEST right row with
    * rightTs <= leftTs for the same key — the feature-store /
    * event-enrichment operator Spark lacks natively.
    *
    * One union + one key-partitioned window pass (no per-row range
    * probe, no join explosion): rows from both sides sort by
    * (ts, side) within each key — right rows first at equal ts, so
    * <= semantics hold — and `last(value, ignoreNulls)` carries the
    * most recent right value forward onto left rows. Windows are
    * key-local, so the single shuffle partitions by key and
    * parallelizes across keys at any scale. Right-side (key, ts)
    * pairs must be unique for determinism — pre-aggregate if not. */
  def asofLookup(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      valueCol: String,
      as: String): DataFrame = {
    val vType = right.schema(valueCol).dataType
    // the carried value rides inside a STRUCT: a right row whose value
    // is genuinely NULL still produces a non-null struct, so
    // last(ignoreNulls) skips only the union-fill nulls of LEFT rows —
    // "latest right row has NULL value" correctly yields NULL instead
    // of resurrecting an older value
    val wrapType = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("v", vType)))
    // internal working columns must not collide with caller columns
    // (a fixed "_ts" would silently overwrite and then drop a caller's
    // "_ts") — extend with "_" until the name is fresh on BOTH inputs
    val taken = (left.columns ++ right.columns).toSet
    def fresh(base: String): String = {
      var n = base
      while (taken.contains(n)) n += "_"
      n
    }
    val tsC = fresh("_graft_asof_ts")
    val sideC = fresh("_graft_asof_side")
    val vC = fresh("_graft_asof_v")
    val l = left
      .withColumn(tsC, col(leftTsCol))
      .withColumn(sideC, lit(1))
      .withColumn(vC, lit(null).cast(wrapType))
    val r = right.select(
      col(keyCol),
      col(rightTsCol).as(tsC),
      lit(0).as(sideC),
      struct(col(valueCol).cast(vType).as("v")).as(vC))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsC).asc, col(sideC).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(as, last(col(vC), ignoreNulls = true).over(w).getField("v"))
      .where(col(sideC) === 1)
      .drop(tsC, sideC, vC)
  }

  /** ES `terms` lookup query: filter docs whose `field` appears in a
    * value list read from ANOTHER index (the terms-lookup form of
    * `{"terms": {f: {"index": ..., "path": ...}}}`) — a left_semi join
    * against the (usually tiny, broadcastable) lookup column. */
  def termsLookup(
      docs: DataFrame,
      field: String,
      lookup: DataFrame,
      lookupField: String): DataFrame =
    docs.join(
      broadcast(lookup.select(col(lookupField).as(field))),
      Seq(field), "left_semi")

  /** ES `has_parent`: children whose parent matches the predicate —
    * left_semi from the child side; the filtered parent keys are
    * usually small enough to broadcast. */
  def hasParent(
      children: DataFrame,
      parents: DataFrame,
      parentKey: String,
      childFk: String,
      pred: Column): DataFrame =
    children.join(
      parents.where(pred).select(col(parentKey).as(childFk)),
      Seq(childFk), "left_semi")

  /** ES range-field relations (integer_range/date_range queries):
    * predicate for [lo, hi] vs the query range under INTERSECTS /
    * WITHIN / CONTAINS semantics. Plain comparisons — pushdown-safe. */
  def rangeRelation(
      lo: Column, hi: Column, qLo: Column, qHi: Column, relation: String): Column =
    relation.toLowerCase(java.util.Locale.ROOT) match {
      case "intersects" => lo <= qHi && hi >= qLo
      case "within" => lo >= qLo && hi <= qHi
      case "contains" => lo <= qLo && hi >= qHi
      case other => throw new IllegalArgumentException(s"unknown range relation: $other")
    }

  /** Interval overlap JOIN (range join): pairs (a, b) whose numeric
    * intervals overlap. Spark's default plan for an inequality-only
    * join is a cartesian product; this buckets each interval onto a
    * coarse grid (cells of `cellWidth`), joins on cell — the one
    * shuffle, same shape as LSH banding — dedups candidate pairs, and
    * applies the exact overlap check. Lossless: overlapping intervals
    * always share at least one grid cell. `cellWidth` trades shuffle
    * fan-out (interval_span / width cells per row) against candidate
    * selectivity; set it near the typical interval width. */
  def intervalOverlapJoin(
      a: DataFrame, b: DataFrame,
      aId: String, aLo: String, aHi: String,
      bId: String, bLo: String, bHi: String,
      cellWidth: Double): DataFrame = {
    // a zero/negative width degenerates to Infinity cell ids — either
    // a runtime sequence() blowup or a silent cartesian product
    require(cellWidth > 0, s"interval join cellWidth must be positive: $cellWidth")
    def cells(df: DataFrame, id: String, lo: String, hi: String, p: String) = df.select(
      col(id).as(s"${p}_id"), col(lo).cast("double").as(s"${p}_lo"),
      col(hi).cast("double").as(s"${p}_hi"),
      explode(sequence(
        floor(col(lo).cast("double") / cellWidth).cast("long"),
        floor(col(hi).cast("double") / cellWidth).cast("long"))).as("cell"))
    cells(a, aId, aLo, aHi, "a").as("ca")
      .join(cells(b, bId, bLo, bHi, "b").as("cb"), "cell")
      .where(col("a_lo") <= col("b_hi") && col("a_hi") >= col("b_lo"))
      .select(col("a_id"), col("b_id"))
      .distinct()
  }

  /** Haversine distance in km (the core of `geo_distance`). Pure
    * codegen'd math — safe in filter position. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2.0 * 6371.0) * asin(sqrt(a))
  }

  /** `{"geo_distance": {"distance": "...km", ...}}`. */
  def geoDistance(lat: Column, lon: Column, clat: Double, clon: Double, km: Double): Column =
    Num.round(haversineKm(lat, lon, lit(clat), lit(clon)), 4) <= km

  /** `{"geo_polygon": {...}}` — point-in-polygon via the even-odd ray
    * cast (public algorithm): count edges (i, j) whose lat interval
    * straddles the point and whose lon at the point's latitude lies to
    * the point's east; odd count = inside. The vertex list is a Scala
    * constant, so the test unrolls to pure +,-,*,/ column comparisons
    * (codegen'd, same IEEE ops as the oracle's identical formula). */
  def geoPolygon(lat: Column, lon: Column, vertices: Seq[(Double, Double)]): Column = {
    require(vertices.size >= 3, "geo_polygon needs at least 3 vertices")
    val crossings = vertices.indices.map { i =>
      val (lat1, lon1) = vertices(i)
      val (lat2, lon2) = vertices((i + 1) % vertices.size)
      val straddles = (lit(lat1) > lat) =!= (lit(lat2) > lat)
      val xLon = lit(lon2 - lon1) * (lat - lit(lat1)) / lit(lat2 - lat1) + lit(lon1)
      when(straddles && lon < xLon, 1).otherwise(0)
    }
    crossings.reduce(_ + _) % 2 === 1
  }

  /** `{"geo_bounding_box": {...}}` — plain range predicates, fully
    * pushdown-eligible (this is why ES itself grid-indexes: the bbox
    * prefilter is cheap; graft gets the same from parquet min/max). */
  def geoBoundingBox(
      lat: Column, lon: Column,
      top: Double, left: Double, bottom: Double, right: Double): Column = {
    // left > right = an ANTIMERIDIAN-crossing box (ES supports it):
    // the lon band wraps, so the predicate is a disjunction — the
    // conjunctive form was unsatisfiable and silently matched nothing
    val lonPred =
      if (left <= right) lon >= left && lon <= right
      else lon >= left || lon <= right
    lat <= top && lat >= bottom && lonPred
  }

  /** `geo_shape` with envelope geometry — the indexed-shape case where
    * each DOCUMENT carries a shape (here its bounding envelope:
    * minLat/maxLat/minLon/maxLon columns) and the query supplies an
    * envelope plus a spatial relation. Envelope-vs-envelope reduces to
    * interval overlap tests — plain range predicates that push to the
    * parquet scan (row-group min/max pruning), which is exactly the
    * grid-prefilter role ES's BKD tree plays. */
  def envelopeRelation(
      minLat: Column, maxLat: Column, minLon: Column, maxLon: Column,
      qMinLat: Double, qMaxLat: Double, qMinLon: Double, qMaxLon: Double,
      relation: String = "intersects"): Column =
    relation.toLowerCase(java.util.Locale.ROOT) match {
    case "intersects" =>
      maxLat >= qMinLat && minLat <= qMaxLat && maxLon >= qMinLon && minLon <= qMaxLon
    case "disjoint" =>
      maxLat < qMinLat || minLat > qMaxLat || maxLon < qMinLon || minLon > qMaxLon
    case "within" => // the doc shape entirely inside the query envelope
      minLat >= qMinLat && maxLat <= qMaxLat && minLon >= qMinLon && maxLon <= qMaxLon
    case "contains" => // the doc shape covers the query envelope
      minLat <= qMinLat && maxLat >= qMaxLat && minLon <= qMinLon && maxLon >= qMaxLon
    case other => throw new IllegalArgumentException(s"unknown geo_shape relation: $other")
  }

  /** `geo_shape` over FULL indexed polygons (not just envelopes): each
    * doc stores a vertex ring as parallel lat/lon double arrays.
    * `contains` (polygon covers the query point) runs the compiled
    * even-odd ray-cast kernel once per row — one whole-stage-codegen
    * loop, no HOF interpretation. */
  def shapeContainsPoint(
      latArr: Column, lonArr: Column, qLat: Double, qLon: Double): Column =
    org.apache.spark.sql.GraftBridge.column(graft.expr.PolygonContainsPoint(
      org.apache.spark.sql.GraftBridge.expression(latArr),
      org.apache.spark.sql.GraftBridge.expression(lonArr), qLat, qLon))

  /** Full-topology `geo_shape` containment: the doc stores a LIST of
    * vertex rings (array<array<double>> lat + lon). Even-odd parity
    * across rings — so outer+hole subtracts the hole and disjoint
    * multipolygon parts union — one compiled loop per row. Overlapping
    * parts follow even-odd (overlap = outside), the same rule GeoJSON
    * validators require disjointness to avoid. */
  def shapeRingsContainPoint(
      latRings: Column, lonRings: Column, qLat: Double, qLon: Double): Column =
    org.apache.spark.sql.GraftBridge.column(graft.expr.MultiRingContainsPoint(
      org.apache.spark.sql.GraftBridge.expression(latRings),
      org.apache.spark.sql.GraftBridge.expression(lonRings), qLat, qLon))

  /** `geo_shape` linestring-vs-envelope `intersects`: bbox reject then
    * the separating-axis corner test per segment, compiled (see
    * PolyKernels.linestringIntersectsBox). */
  def linestringIntersectsEnvelope(
      latArr: Column, lonArr: Column,
      top: Double, left: Double, bottom: Double, right: Double): Column =
    org.apache.spark.sql.GraftBridge.column(graft.expr.LinestringIntersectsBox(
      org.apache.spark.sql.GraftBridge.expression(latArr),
      org.apache.spark.sql.GraftBridge.expression(lonArr), top, left, bottom, right))

  /** `within` against a query envelope is exact on the vertex extremes
    * (a polygon lies in a box iff all vertices do) — array_min/max are
    * codegen'd builtins and the comparison stays narrow. */
  def shapeWithinEnvelope(
      latArr: Column, lonArr: Column,
      top: Double, left: Double, bottom: Double, right: Double): Column =
    array_min(latArr) >= bottom && array_max(latArr) <= top &&
      array_min(lonArr) >= left && array_max(lonArr) <= right
}
