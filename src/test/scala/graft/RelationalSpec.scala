package graft

import graft.rel.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("asofLookup: latest right value at ts <= left ts; NULL values are NOT skipped") {
    val clicks = Seq((1L, 7L, 30L), (2L, 7L, 5L), (3L, 8L, 50L))
      .toDF("event_id", "user_id", "ts")
    val views = Seq(
      (7L, 10L, Some(5.0)),
      (7L, 20L, None), // latest before ts=30 — must yield NULL, not 5.0
      (8L, 50L, Some(9.0))) // equal ts: <= semantics include it
      .toDF("user_id", "ts", "v")
    val r = Relational.asofLookup(clicks, views, "user_id", "ts", "ts", "v", "asof_v")
      .select(col("event_id"), col("asof_v"))
      .as[(Long, Option[Double])].collect().toMap
    assert(r(1L).isEmpty) // latest right row exists but its value is NULL
    assert(r(2L).isEmpty) // no right row at ts <= 5 at all
    assert(r(3L).contains(9.0)) // equal-ts right row qualifies
  }

  test("asofLookup: caller columns named like the old internal _ts/_side/_v survive") {
    // r2 used fixed internal names; a left frame already carrying "_ts"
    // was silently overwritten and dropped. Now the working columns are
    // collision-proofed, so caller columns pass through untouched.
    val clicks = Seq((1L, 7L, 30L, "keep_ts", "keep_side"))
      .toDF("event_id", "user_id", "ts", "_ts", "_side")
    val views = Seq((7L, 10L, 5.0)).toDF("user_id", "ts", "_v")
    val out = Relational.asofLookup(clicks, views, "user_id", "ts", "ts", "_v", "asof_v")
    assert(out.columns.toSet ==
      Set("event_id", "user_id", "ts", "_ts", "_side", "asof_v"))
    val row = out.select(col("_ts"), col("_side"), col("asof_v")).collect().head
    assert(row.getString(0) == "keep_ts" && row.getString(1) == "keep_side")
    assert(row.getDouble(2) == 5.0)
  }

  test("intervalOverlapJoin: grid bucketing is lossless vs the exact predicate") {
    val a = Seq((1L, 0.0, 5.0), (2L, 10.0, 12.0), (3L, 100.0, 101.0)).toDF("id", "lo", "hi")
    val b = Seq((10L, 4.0, 6.0), (11L, 13.0, 20.0), (12L, 99.5, 100.2)).toDF("id", "lo", "hi")
    val got = Relational.intervalOverlapJoin(a, b, "id", "lo", "hi", "id", "lo", "hi", 7.0)
      .as[(Long, Long)].collect().toSet
    val exact = a.as("a").join(b.as("b"),
      col("a.lo") <= col("b.hi") && col("a.hi") >= col("b.lo"))
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    assert(got == exact && got == Set((1L, 10L), (3L, 12L)))
  }

  test("rangeRelation semantics and locale-safe relation names") {
    val df = Seq((1L, 2.0, 4.0), (2L, 0.0, 10.0), (3L, 6.0, 8.0)).toDF("id", "lo", "hi")
    def ids(rel: String) = df.where(Relational.rangeRelation(
      col("lo"), col("hi"), lit(3.0), lit(7.0), rel)).select("id").as[Long].collect().toSet
    assert(ids("INTERSECTS") == Set(1L, 2L, 3L)) // uppercase accepted
    assert(ids("within") == Set.empty) // no [lo,hi] inside [3,7]
    assert(ids("contains") == Set(2L))
  }

  test("geoPolygon: even-odd ray cast classifies inside/outside") {
    val square = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    val pts = Seq(
      (1L, 5.0, 5.0), // inside
      (2L, 15.0, 5.0), // north of it
      (3L, 5.0, 15.0), // east of it
      (4L, -1.0, -1.0)) // southwest
      .toDF("id", "lat", "lon")
    val in = pts.where(Relational.geoPolygon(col("lat"), col("lon"), square))
      .select("id").as[Long].collect().toSet
    assert(in == Set(1L))
  }

  test("shapeContainsPoint: per-row polygons, non-convex, agrees with fixed-query ray cast") {
    // an L-shaped (non-convex) hexagon and a triangle, one per row
    val ell = (Seq(0.0, 10.0, 10.0, 4.0, 4.0, 0.0), Seq(0.0, 0.0, 3.0, 3.0, 8.0, 8.0))
    val tri = (Seq(20.0, 25.0, 20.0), Seq(20.0, 22.0, 24.0))
    val df = Seq((1L, ell._1, ell._2), (2L, tri._1, tri._2))
      .toDF("id", "lats", "lons")
    def containing(qLat: Double, qLon: Double): Set[Long] =
      df.where(Relational.shapeContainsPoint(col("lats"), col("lons"), qLat, qLon))
        .select("id").as[Long].collect().toSet
    assert(containing(2.0, 2.0) == Set(1L)) // in the L's thick arm
    assert(containing(2.0, 6.0) == Set(1L)) // in the L's thin arm
    assert(containing(8.0, 6.0) == Set.empty) // in the L's notch
    assert(containing(21.0, 21.5) == Set(2L)) // inside the triangle
    assert(containing(24.0, 21.0) == Set.empty) // above the triangle's slope
    // cross-check kernel vs the fixed-query-polygon ray cast on a grid
    // (geoPolygon unrolls literal column math; the kernel loops over
    // ArrayData — independent implementations of the same cast)
    val grid = for { la <- -1 to 11; lo <- -1 to 9 } yield (la + 0.5, lo + 0.5)
    val viaFixed = grid.toDF("lat", "lon")
      .where(Relational.geoPolygon(col("lat"), col("lon"), ell._1.zip(ell._2)))
      .select("lat", "lon").as[(Double, Double)].collect().toSet
    import org.apache.spark.sql.catalyst.util.ArrayData
    val latsAd = ArrayData.toArrayData(ell._1.toArray)
    val lonsAd = ArrayData.toArrayData(ell._2.toArray)
    val viaKernel = grid.filter { case (la, lo) =>
      graft.expr.PolyKernels.containsPoint(latsAd, lonsAd, la, lo)
    }.toSet
    assert(viaKernel == viaFixed)
  }

  test("shapeRingsContainPoint: hole subtracts, multipolygon unions, even-odd on overlap") {
    val sq = (y0: Double, x0: Double, s: Double) =>
      (Seq(y0, y0 + s, y0 + s, y0), Seq(x0, x0, x0 + s, x0 + s))
    val outer = sq(0.0, 0.0, 10.0)
    val hole = sq(3.0, 3.0, 4.0)
    val far = sq(20.0, 20.0, 2.0)
    // (id, latRings, lonRings)
    val df = Seq(
      (1L, Seq(outer._1, hole._1), Seq(outer._2, hole._2)), // donut
      (2L, Seq(outer._1, far._1), Seq(outer._2, far._2)))   // two parts
      .toDF("id", "latRings", "lonRings")
    def containing(qLat: Double, qLon: Double): Set[Long] =
      df.where(Relational.shapeRingsContainPoint(
          col("latRings"), col("lonRings"), qLat, qLon))
        .select("id").as[Long].collect().toSet
    assert(containing(1.0, 1.0) == Set(1L, 2L))  // in outer, not in hole
    assert(containing(5.0, 5.0) == Set(2L))      // in the donut hole
    assert(containing(21.0, 21.0) == Set(2L))    // second part only
    assert(containing(-1.0, 5.0) == Set.empty)   // outside everything
  }

  test("linestringIntersectsEnvelope: segment SAT vs box") {
    val df = Seq(
      (1L, Seq(0.0, 10.0), Seq(0.0, 10.0)),     // diagonal through box
      (2L, Seq(20.0, 30.0), Seq(20.0, 30.0)),   // far away
      (3L, Seq(-5.0, 15.0), Seq(4.0, 4.0)),     // vertical line crossing
      // bbox overlaps the box but the segment's supporting line
      // separates it (cuts across outside the corner) — SAT branch
      (4L, Seq(4.5, 6.0), Seq(6.0, 4.5)),
      (5L, Seq(-2.0, 3.0, -2.0), Seq(-2.0, 3.0, 9.0))) // enters via middle vertex
      .toDF("id", "lats", "lons")
    val in = df.where(Relational.linestringIntersectsEnvelope(
        col("lats"), col("lons"), top = 5.0, left = 0.0, bottom = 0.0, right = 5.0))
      .select("id").as[Long].collect().toSet
    assert(in == Set(1L, 3L, 5L))
  }

  test("shapeWithinEnvelope: vertex extremes decide exactly") {
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 0.5)), // inside [0,5]x[0,5]
      (2L, Seq(1.0, 6.0, 3.0), Seq(1.0, 2.0, 0.5)), // pokes north
      (3L, Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, -0.5))) // pokes west
      .toDF("id", "lats", "lons")
    val in = df.where(Relational.shapeWithinEnvelope(
        col("lats"), col("lons"), top = 5.0, left = 0.0, bottom = 0.0, right = 5.0))
      .select("id").as[Long].collect().toSet
    assert(in == Set(1L))
  }

  test("nestedScore: score_mode folds matching children; none counts") {
    val parents = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("pk", "name")
    val children = Seq(
      (1L, 10.0), (1L, 30.0), // parent 1: two matches
      (2L, 2.0),              // parent 2: below the pred
      (3L, 8.0)).toDF("fk", "w")
    def run(mode: String) = Relational.nestedScore(
      parents, children, "pk", "fk", col("w") >= 5.0, col("w"), mode)
      .select("pk", "score").as[(Long, Double)].collect().toMap
    assert(run("avg") == Map(1L -> 20.0, 3L -> 8.0))
    assert(run("sum") == Map(1L -> 40.0, 3L -> 8.0))
    assert(run("max") == Map(1L -> 30.0, 3L -> 8.0))
    assert(run("min") == Map(1L -> 10.0, 3L -> 8.0))
    // ES score_mode none: matching parents score 0 (no child fold)
    assert(run("none") == Map(1L -> 0.0, 3L -> 0.0))
  }
}
