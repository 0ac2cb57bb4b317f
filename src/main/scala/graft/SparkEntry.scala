package graft

import graft.agg.Aggs
import graft.dedup.Dedup
import graft.dsl.QueryDsl
import graft.rel.Relational
import graft.search.{Search, Sorting}
import graft.sim.Ann
import graft.streaming.EventStreams
import graft.text.TextAnalysis
import graft.multimodal.Multimodal
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Num

/** Driver contract — one `queries` entry per SURVEY.md §2 operator, one
  * `oracleSql` DuckDB-equivalent per entry (SURVEY.md §5 explains the
  * bit-for-bit parity conventions: shared tokenizer regex, md5-based
  * hashes, decimal big-sums, round(_,4) on floats, total ORDER BY).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship: BM25 relevance top-10 (the ES `_score` path) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Search.bm25TopK(
      Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text", "fast hash join", 10)

  // shared DuckDB CTE: analyzed documents (mirror of Analyzer.tokens)
  private val TokCte =
    "WITH tok AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS toks FROM documents)"

  // Deterministic plural-morphed token stream (SURVEY §3 synthetic-
  // column pattern, like withGeo/withIp): the testdata vocabulary has
  // no inflected forms, so stemmer coverage derives one — token i
  // (0-based) gains an "s" when (doc_id + i) % 3 == 0. The DuckDB
  // mirror is MTokCte below.
  private def morphedToks(): org.apache.spark.sql.Column =
    transform(graft.analysis.Analyzer.tokens(col("text")), (t, i) =>
      when(pmod(col("doc_id") + i, lit(3)) === 0 &&
          length(t) >= 3 && !t.endsWith("s"),
        concat(t, lit("s"))).otherwise(t))
  private val MTokCte =
    ", mtok AS (SELECT doc_id, list_transform(range(1, len(toks) + 1), i -> " +
    "CASE WHEN (doc_id + i - 1) % 3 = 0 AND len(toks[i]) >= 3 AND substr(toks[i], len(toks[i]), 1) != 's' " +
    "THEN toks[i] || 's' ELSE toks[i] END) AS toks FROM tok)"

  // German-morphed token stream (same synthetic-column pattern as
  // morphedToks): token i gains "en" when (doc_id + i) % 3 == 0 —
  // light_german's dominant suffix. DuckDB mirror is MTokDeCte.
  private def germanMorphToks(): org.apache.spark.sql.Column =
    transform(graft.analysis.Analyzer.tokens(col("text")), (t, i) =>
      when(pmod(col("doc_id") + i, lit(3)) === 0 &&
          length(t) >= 3 && !t.endsWith("n"),
        concat(t, lit("en"))).otherwise(t))
  private val MTokDeCte =
    ", mtokde AS (SELECT doc_id, list_transform(range(1, len(toks) + 1), i -> " +
    "CASE WHEN (doc_id + i - 1) % 3 = 0 AND len(toks[i]) >= 3 AND substr(toks[i], len(toks[i]), 1) != 'n' " +
    "THEN toks[i] || 'en' ELSE toks[i] END) AS toks FROM tok)"

  /** DuckDB mirrors of Stemmers.lightGerman's two steps over a token
    * expression `x` — same ordered rule CASEs (umlaut folding is a
    * no-op on the [a-z0-9] token alphabet, so it is omitted). */
  private def gstem1(x: String): String = {
    val st = "('b', 'd', 'f', 'g', 'h', 'k', 'l', 'm', 'n', 't')"
    s"(CASE WHEN len($x) > 5 AND substr($x, len($x) - 2, 3) = 'ern' THEN substr($x, 1, len($x) - 3) " +
    s"WHEN len($x) > 4 AND substr($x, len($x) - 1, 1) = 'e' AND substr($x, len($x), 1) IN ('m', 'n', 'r', 's') THEN substr($x, 1, len($x) - 2) " +
    s"WHEN len($x) > 3 AND substr($x, len($x), 1) = 'e' THEN substr($x, 1, len($x) - 1) " +
    s"WHEN len($x) > 3 AND substr($x, len($x), 1) = 's' AND substr($x, len($x) - 1, 1) IN $st THEN substr($x, 1, len($x) - 1) " +
    s"ELSE $x END)"
  }
  private def gstem2(x: String): String = {
    val st = "('b', 'd', 'f', 'g', 'h', 'k', 'l', 'm', 'n', 't')"
    s"(CASE WHEN len($x) > 5 AND substr($x, len($x) - 2, 3) = 'est' THEN substr($x, 1, len($x) - 3) " +
    s"WHEN len($x) > 4 AND substr($x, len($x) - 1, 2) IN ('er', 'en') THEN substr($x, 1, len($x) - 2) " +
    s"WHEN len($x) > 4 AND substr($x, len($x) - 1, 2) = 'st' AND substr($x, len($x) - 2, 1) IN $st THEN substr($x, 1, len($x) - 2) " +
    s"ELSE $x END)"
  }

  /** DuckDB mirror of Stemmers.minimalEnglish over a token expression
    * `x` — the same ordered rule CASE, so stemmed-match oracles are
    * hash-exact. */
  private def mstem(x: String): String =
    s"(CASE WHEN len($x) < 3 OR substr($x, len($x), 1) != 's' THEN $x " +
    s"WHEN substr($x, len($x) - 1, 2) IN ('us', 'ss') THEN $x " +
    s"WHEN substr($x, len($x) - 1, 2) = 'es' THEN " +
    s"(CASE WHEN len($x) > 3 AND substr($x, len($x) - 2, 1) = 'i' " +
    s"AND substr($x, len($x) - 3, 1) NOT IN ('a', 'e') THEN substr($x, 1, len($x) - 3) || 'y' " +
    s"WHEN substr($x, len($x) - 2, 1) IN ('i', 'a', 'o', 'e') THEN $x " +
    s"ELSE substr($x, 1, len($x) - 1) END) " +
    s"ELSE substr($x, 1, len($x) - 1) END)"

  // the English stop set as a SQL IN-list (mirror of Analyzer.EnglishStop)
  private val StopSql: String =
    graft.analysis.Analyzer.EnglishStop.map(w => s"'$w'").mkString(", ")

  // DuckDB mirror of Dedup.baseHash: fold 12 hex chars of md5 to BIGINT
  private def hexFold(expr: String, n: Int): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(regexp_extract_all(substr(md5($expr), 1, $n), '.'), " +
      "c -> (CASE WHEN ascii(c) <= 57 THEN ascii(c) - 48 ELSE ascii(c) - 87 END)::BIGINT)), (a, v) -> a * 16 + v)"

  /** Shared DuckDB CTE chain computing per-doc BM25 (k1=1.2, b=0.75,
    * round 4) over a (doc_id, toks) source CTE — appended as
    * dl/st/tf/df/sc with a distinguishing suffix. Single definition so
    * the BM25 formula can't silently diverge between the six scoring
    * oracles that use it. */
  private def bm25Ctes(p: String, tokSrc: String, terms: Seq[String]): String = {
    val in = terms.map(t => s"'$t'").mkString(",")
    s", dl$p AS (SELECT doc_id, len(toks)::DOUBLE AS dl, toks FROM $tokSrc), " +
      s"st$p AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl$p), " +
      s"tf$p AS (SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dl$p) " +
      s"WHERE term IN ($in) GROUP BY doc_id, dl, term), " +
      s"df$p AS (SELECT term, count(*)::DOUBLE AS df FROM tf$p GROUP BY term), " +
      s"sc$p AS (SELECT tf$p.doc_id AS id, round(sum(ln(1.0 + (st$p.n_docs - df$p.df + 0.5) / (df$p.df + 0.5)) * " +
      s"tf$p.tf * (1.2 + 1.0) / (tf$p.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf$p.dl / st$p.avgdl))), 4) AS score " +
      s"FROM tf$p JOIN df$p USING (term) CROSS JOIN st$p GROUP BY tf$p.doc_id)"
  }

  // source-field token CTE used by the two-field scoring oracles
  private val STokCte =
    ", stok AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(source), '[^a-z0-9]+'), x -> len(x) > 0) AS toks FROM documents)"

  // shared DuckDB CTE chain: MinHash-LSH verified near-dup pairs `vp`
  // (mirror of Dedup.minhashLsh; appended after TokCte)
  private lazy val MinhashCtes: String = ", " +
    "sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh FROM tok WHERE len(toks) >= 3), " +
    s"hs AS (SELECT doc_id, sh, list_transform(sh, x -> ${hexFold("x", 12)}) AS hs FROM sh), " +
    "sig AS (SELECT doc_id, sh, list_transform(range(0, 32), i -> " +
    "list_aggregate(list_transform(hs, h -> (h * (2*i + 3) + ((i + 1) * 2654435761) % 2305843009213693951) % 2305843009213693951), 'min')) AS sig FROM hs), " +
    "banded AS (SELECT doc_id, unnest(list_transform(range(0, 8), b -> " +
    "b::VARCHAR || ',' || sig[4*b+1]::VARCHAR || ',' || sig[4*b+2]::VARCHAR || ',' || sig[4*b+3]::VARCHAR || ',' || sig[4*b+4]::VARCHAR)) AS band FROM sig), " +
    "cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2 FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id), " +
    "vp AS (SELECT id1, id2, round(inter / (n1 + n2 - inter), 4) AS jaccard FROM " +
    "(SELECT id1, id2, len(list_intersect(sa.sh, sb.sh))::DOUBLE AS inter, len(sa.sh) AS n1, len(sb.sh) AS n2 " +
    "FROM cand JOIN sh sa ON sa.doc_id = id1 JOIN sh sb ON sb.doc_id = id2) " +
    "WHERE round(inter / (n1 + n2 - inter), 4) >= 0.8)"

  // monthly order-total buckets shared by the percentile pipeline aggs
  private def monthlyOrderSums(orders: DataFrame): DataFrame = orders
    .groupBy(trunc(col("o_orderdate"), "month").as("m"))
    .agg(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("msum"))
  // shared by q_downsample AND q_rollup_search: the rollup-search
  // merge must reproduce exactly the all-raw daily aggregation
  private val DownsampleOracle =
    "SELECT epoch_ns(ts) - epoch_ns(ts) % 86400000000000 AS bucket_ts, event_type, " +
    "count(*)::BIGINT AS doc_count, min(value) AS value_min, max(value) AS value_max, " +
    "round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS value_sum " +
    "FROM events GROUP BY 1, 2 ORDER BY 1, 2"

  private val MonthlySumCte =
    "WITH b AS (SELECT date_trunc('month', o_orderdate) AS m, " +
    "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS msum FROM orders GROUP BY m)"

  // deterministic synthetic geo columns (SURVEY.md §3)
  private def withGeo(c: DataFrame): DataFrame = c
    .withColumn("lat", (col("c_custkey") * 7919 % 18000) / 100.0 - 90.0)
    .withColumn("lon", (col("c_custkey") * 104729 % 36000) / 100.0 - 180.0)
  private val GeoCte =
    "WITH g AS (SELECT c_custkey, (c_custkey * 7919 % 18000) / 100.0 - 90.0 AS lat, (c_custkey * 104729 % 36000) / 100.0 - 180.0 AS lon FROM customer)"

  // deterministic synthetic IPv4 column over events (no ip field in
  // the testdata — same spirit as withGeo), + its DuckDB mirror with
  // the dotted-quad re-parsed to the numeric value like Aggs.ipValue
  private def withIp(e: DataFrame): DataFrame = e.withColumn("ip",
    concat_ws(".", lit(10L),
      pmod(col("user_id") * 7L, lit(256L)),
      pmod(col("user_id") * 13L, lit(256L)),
      pmod(col("user_id"), lit(256L))))
  private val IpCte =
    "WITH ips AS (SELECT *, 10 || '.' || (user_id * 7 % 256) || '.' || (user_id * 13 % 256) || '.' || (user_id % 256) AS ip FROM events), " +
    "ipv AS (SELECT *, string_split(ip, '.')[1]::BIGINT * 16777216 + string_split(ip, '.')[2]::BIGINT * 65536 + " +
    "string_split(ip, '.')[3]::BIGINT * 256 + string_split(ip, '.')[4]::BIGINT AS ipn FROM ips)"

  /** Shared polygon for q_geo_polygon — the ORACLE SQL is generated
    * from the same vertex list (same precomputed edge deltas as
    * Relational.geoPolygon), so the two ray casts are the identical
    * IEEE expression on both engines. */
  /** Deterministic 64-dim query vector shared by q_script_vector's
    * Spark side and its oracle SQL (two-decimal doubles: the literal
    * round-trips exactly through both engines' parsers). */
  private val ScriptQv: Seq[Double] = (0 until 64).map(i => (i * 37 % 100) / 100.0 - 0.5)
  private val ScriptQv2: Seq[Double] = (0 until 64).map(i => (i * 53 % 100) / 100.0 - 0.5)

  private val GeoPolygonVertices: Seq[(Double, Double)] =
    Seq((0.0, -120.0), (60.0, -30.0), (30.0, 60.0), (-30.0, 90.0), (-60.0, -45.0))

  // geohash cell (precision 2) of customer 1's synthetic location —
  // computed through the SAME kernel the query column uses
  private lazy val GeoGridQueryCell: String = {
    val lat = (1L * 7919 % 18000) / 100.0 - 90.0
    val lon = (1L * 104729 % 36000) / 100.0 - 180.0
    graft.expr.GeoKernels.geohashKernel(lat, lon, 2).toString
  }

  /** Mirror of Ann.bbqTopK: identical bit packing (two 32-bit halves
    * as BIGINTs), identical ascending-dim fold for the asymmetric
    * estimate, same cosine formulation as the other vector oracles. */
  private def bbqOracleSql(qv: Seq[Double], k: Int, ov: Int): String = {
    val loExpr = (0 until 32).map(i =>
      s"(CASE WHEN v[${i + 1}] > 0.0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
    val hiExpr = (32 until 64).map(i =>
      s"(CASE WHEN v[${i + 1}] > 0.0 THEN ${1L << (i - 32)} ELSE 0 END)").mkString(" + ")
    val est = (0 until 64).map { i =>
      val bits = if (i < 32) "b_lo" else "b_hi"
      val mask = 1L << (if (i < 32) i else i - 32)
      s"(CASE WHEN ($bits & $mask) != 0 THEN ${qv(i)} ELSE ${-qv(i)} END)"
    }.mkString(" + ")
    "WITH q AS (SELECT " + qv.mkString("[", ", ", "]") + "::DOUBLE[] AS w), " +
      "e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
      s"b AS (SELECT vec_id, $loExpr AS b_lo, $hiExpr AS b_hi FROM e), " +
      s"c AS (SELECT vec_id, $est AS bscore FROM b ORDER BY bscore DESC, vec_id LIMIT ${k * ov}), " +
      "ex AS (SELECT c.vec_id AS id, round(list_reduce(list_prepend(0.0, " +
      "list_transform(range(1, 65), i -> e.v[i] * w[i])), (a, b) -> a + b) / " +
      "(sqrt(list_reduce(list_prepend(0.0, list_transform(e.v, x -> x * x)), (a, b) -> a + b)) * " +
      "sqrt(list_reduce(list_prepend(0.0, list_transform(w, x -> x * x)), (a, b) -> a + b))), 4) AS cosine, " +
      "CAST(round(c.bscore, 4) AS DOUBLE) AS bscore FROM c JOIN e ON e.vec_id = c.vec_id CROSS JOIN q) " +
      s"SELECT id, cosine, bscore FROM ex ORDER BY cosine DESC, id LIMIT $k"
  }

  /** Mirror of Search.highlightFragmentsByScore: same per-term window
    * regexes, same idf formula, same fixed-order score fold, struct
    * sort on (-score, frag). */
  private def highlightOrderOracleSql(terms: Seq[String], n: Int): String = {
    val dfCols = terms.map(t =>
      s"sum(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END)::DOUBLE AS df_$t").mkString(", ")
    def idf(u: String) = s"ln(1.0 + (n_docs - df_$u + 0.5) / (df_$u + 0.5))"
    val fragCols = terms.map(t =>
      s"replace(regexp_extract(lower(text), '([a-z0-9]+ ){0,3}$t( [a-z0-9]+){0,3}'), " +
        s"'$t', '<em>$t</em>') AS f_$t").mkString(", ")
    def score(t: String) = terms.map(u =>
      s"(CASE WHEN list_contains(string_split(regexp_replace(f_$t, '</?em>', '', 'g'), ' '), '$u') " +
        s"THEN ${idf(u)} ELSE 0.0 END)").mkString(" + ")
    val structs = terms.map(t => s"{'ns': -(${score(t)}), 'frag': f_$t}").mkString("[", ", ", "]")
    val anyTerm = terms.map(t => s"'$t'").mkString("[", ", ", "]")
    TokCte +
      s", hdf AS (SELECT count(*)::DOUBLE AS n_docs, $dfCols FROM tok), " +
      s"fr AS (SELECT doc_id, $fragCols FROM documents JOIN tok USING (doc_id) " +
      s"WHERE list_has_any(toks, $anyTerm)), " +
      s"sc AS (SELECT doc_id, $structs AS frs FROM fr CROSS JOIN hdf) " +
      s"SELECT doc_id AS id, array_to_string(list_transform(" +
      s"list_sort(list_filter(frs, s -> struct_extract(s, 'frag') != ''))[1:$n], " +
      s"s -> struct_extract(s, 'frag')), ' ... ') AS snippet FROM sc ORDER BY id"
  }

  /** Closed-form diamond containment term for the geo_shape oracles:
    * |dy|/arm_y + |dx|/arm_x of the fixed query point, with the arm
    * picked by which side of the centre the point falls. Shares no
    * code path with the ray-cast kernel the Spark side runs. */
  private def diamondTSql(
      latC: String, lonC: String, n: String, s: String, e: String, w: String): String =
    s"((CASE WHEN 5.1234567 >= $latC THEN (5.1234567 - $latC) / $n ELSE ($latC - 5.1234567) / $s END) + " +
      s"(CASE WHEN 10.7654321 >= $lonC THEN (10.7654321 - $lonC) / $e ELSE ($lonC - 10.7654321) / $w END))"

  /** Segment-vs-box intersects (SQL): bbox reject, then the
    * separating-line corner test — the identical comparisons
    * PolyKernels.linestringIntersectsBox compiles, so the boolean
    * agrees bitwise with the kernel. */
  private def segBoxSql(
      y1: String, x1: String, y2: String, x2: String,
      top: Double, left: Double, bottom: Double, right: Double): String = {
    def cross(cx: Double, cy: Double): String =
      s"(($x2 - $x1) * ($cy - $y1) - ($y2 - $y1) * ($cx - $x1))"
    val d1 = cross(left, bottom); val d2 = cross(left, top)
    val d3 = cross(right, bottom); val d4 = cross(right, top)
    s"(NOT (GREATEST($x1, $x2) < $left OR LEAST($x1, $x2) > $right OR " +
      s"GREATEST($y1, $y2) < $bottom OR LEAST($y1, $y2) > $top) AND NOT " +
      s"(($d1 > 0 AND $d2 > 0 AND $d3 > 0 AND $d4 > 0) OR " +
      s"($d1 < 0 AND $d2 < 0 AND $d3 < 0 AND $d4 < 0)))"
  }

  private def geoPolygonOracleSql(vertices: Seq[(Double, Double)]): String = {
    val terms = vertices.indices.map { i =>
      val (lat1, lon1) = vertices(i)
      val (lat2, lon2) = vertices((i + 1) % vertices.size)
      val dLon = lon2 - lon1
      val dLat = lat2 - lat1
      s"(CASE WHEN (($lat1 > lat) != ($lat2 > lat)) AND " +
        s"(lon < $dLon * (lat - $lat1) / $dLat + $lon1) THEN 1 ELSE 0 END)"
    }
    GeoCte + " SELECT c_custkey, lat, lon FROM g WHERE " +
      s"(${terms.mkString(" + ")}) % 2 = 1 ORDER BY c_custkey"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A. Query DSL (filter context) ----
    "q_term" -> ((s, d) => t(s, d, "documents")
      .where(QueryDsl.term(col("lang"), "en"))
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))),
    "q_terms" -> ((s, d) => t(s, d, "lineitem")
      .where(QueryDsl.terms(col("l_returnflag"), Seq("A", "R")))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))),
    "q_range" -> ((s, d) => t(s, d, "orders")
      .where(QueryDsl.range(col("o_totalprice"), gte = Some(1000.0), lt = Some(5000.0)) &&
        QueryDsl.range(col("o_orderdate"), gte = Some("1996-01-01")))
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))),
    "q_exists" -> ((s, d) => Tables.events(s, d)
      .where(QueryDsl.exists(col("value")) && QueryDsl.exists(col("props")))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"))),
    "q_prefix" -> ((s, d) => t(s, d, "part")
      .where(QueryDsl.prefix(col("p_type"), "ECO"))
      .select(col("p_partkey"), col("p_type"))
      .orderBy(col("p_partkey"))),
    "q_wildcard" -> ((s, d) => t(s, d, "orders")
      .where(QueryDsl.wildcard(col("o_orderpriority"), "*-HIGH"))
      .select(col("o_orderkey"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))),
    "q_regexp" -> ((s, d) => t(s, d, "documents")
      .where(QueryDsl.regexp(col("source"), "src1[0-9]"))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))),
    "q_ids" -> ((s, d) => t(s, d, "documents")
      .where(QueryDsl.ids(col("doc_id"), Seq(3L, 7L, 11L, 19L)))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))),
    "q_bool" -> ((s, d) => t(s, d, "lineitem")
      .where(QueryDsl.bool(
        must = Seq(QueryDsl.range(col("l_shipdate"), gte = Some("1997-01-01"))),
        should = Seq(QueryDsl.term(col("l_returnflag"), "A"), QueryDsl.term(col("l_linestatus"), "F")),
        mustNot = Seq(col("l_quantity") > 45),
        minimumShouldMatch = 1))
      .select(col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))),
    "q_bool_msm" -> ((s, d) => t(s, d, "documents")
      .where(QueryDsl.bool(
        should = Seq(
          QueryDsl.term(col("lang"), "en"),
          QueryDsl.prefix(col("source"), "src1"),
          col("n_chars") > 300),
        minimumShouldMatch = 2))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))),
    "q_fuzzy" -> ((s, d) => t(s, d, "documents")
      .where(QueryDsl.fuzzy(col("source"), "src12", maxEdits = 1))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))),

    // intervals rule tree: any_of alternatives inside an ordered
    // all_of proximity — expands to OR of compiled span passes
    "q_intervals" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.QueryDslJson.compile(
        """{"intervals": {"text": {"all_of": {"intervals": [
          |  {"any_of": {"intervals": [{"match": {"query": "hash"}},
          |                            {"match": {"query": "merge"}}]}},
          |  {"match": {"query": "join"}}],
          |  "max_gaps": 2, "ordered": true}}}}""".stripMargin))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    // intervals filter: ordered "hash .. join" windows (gaps <= 3)
    // with NO "table" strictly inside — compiled position-list kernel
    "q_intervals_filter" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.QueryDslJson.compile(
        """{"intervals": {"text": {"match": {"query": "hash join",
          |  "max_gaps": 3, "ordered": true,
          |  "filter": {"not_containing": {"match": {"query": "table"}}}}}}}"""
          .stripMargin))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    // case_insensitive term-level queries (ES 7.10 option)
    "q_term_ci" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.QueryDslJson.compile(
        """{"bool": {"must": [
          |  {"term": {"lang": {"value": "EN", "case_insensitive": true}}},
          |  {"wildcard": {"source": {"value": "SRC1*", "case_insensitive": true}}}]}}"""
          .stripMargin))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))),
    // _terms_enum: sorted keyword-term discovery under a prefix
    "q_terms_enum" -> ((s, d) =>
      Search.termsEnum(t(s, d, "part"), "p_name", prefix = "b", size = 12)),
    // fuzzy with transpositions: true (the ES default): an adjacent
    // swap is ONE edit — "rsc3" reaches "src3" in 1 (sr swap), every
    // single-digit srcN in 2; plain levenshtein needs 2 for the swap
    // alone, so the clause matches 11x the docs here
    "q_fuzzy_damerau" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.QueryDslJson.compile(
        """{"fuzzy": {"source": {"value": "rsc3", "fuzziness": 2,
          |  "transpositions": true}}}""".stripMargin))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))),

    // runtime_mappings: a Painless-computed field projected BEFORE the
    // query so the range predicate targets it like a mapped field;
    // Catalyst folds the projection into the scan stage
    "q_runtime_fields" -> ((s, d) => {
      val (rf, inner) = graft.dsl.SearchBody.parse(
        """{"runtime_mappings": {
             "chars_per_100": {"type": "long",
               "script": {"source": "emit(doc['n_chars'].value / 100)"}}},
           "query": {"range": {"chars_per_100": {"gte": 2}}}}""")
      val df0 = rf.foldLeft(t(s, d, "documents")) {
        case (dd, (n, c)) => dd.withColumn(n, c)
      }
      val df1 = inner.fold(df0)(q => df0.where(graft.dsl.EsQuery.compile(q)))
      df1.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("chars_per_100")).as("s"))
        .orderBy(col("lang"))
    }),
    "q_dsl_json" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.QueryDslJson.compile(
        """{"bool": {"must": [{"term": {"lang": "en"}}],
                     "should": [{"prefix": {"source": "src1"}}, {"range": {"n_chars": {"gt": 300}}}],
                     "must_not": [{"wildcard": {"source": "src?"}}],
                     "minimum_should_match": 1}}"""))
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))),

    "q_uri_query" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.EsQuery.compile("?q=lang:en AND (n_chars:>300 OR source:src1*) AND NOT source:src19"))
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))),
    // Lucene /regex/ clauses: anchored value regex on keyword fields,
    // per-token regex on the analyzed default field
    "q_uri_regex" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.EsQuery.compile("?q=lang:/e[nl]/ AND /m.rge/"))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))),
    // multi_match cross_fields: terms match in DIFFERENT fields (one
    // blended field), operator=and satisfiable across fields
    "q_multi_match_cross" -> ((s, d) =>
      Search.multiMatchCrossTopK(t(s, d, "documents"), "doc_id",
        Seq("text", "source"), "merge src3", k = 10, operator = "and")),
    // Lucene +/- clause modifiers: +required -prohibited, plain clause
    // becomes optional (scoring-only, no filter effect)
    "q_uri_plusminus" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.UriQuery.compile("+lang:en -source:src19 n_chars:>300"))
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))),
    // fuzzy suffix on an analyzed field: any token within 1 edit
    "q_uri_fuzzy" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.UriQuery.compile("lang:en AND text:spak~1"))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))),
    // default_operator=AND: bare adjacency requires every term
    "q_uri_default_and" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.UriQuery.compile("merge sort", "text", "and"))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))),
    // boosted multi-field query_string: fields ["text^2","source"]
    "q_uri_boost" -> ((s, d) =>
      Search.queryStringTopK(t(s, d, "documents"), "doc_id",
        Search.parseBoostFields(Seq("text^2", "source")), "merge src5", 10)),
    // multi_match best_fields: max of per-field BM25
    "q_multi_match" -> ((s, d) =>
      Search.multiMatchTopK(t(s, d, "documents"), "doc_id",
        Seq("text", "source"), "merge src5", 10)),
    // multi_match type: phrase — per-field BM25 gated on the phrase
    // matching in THAT field, best-fields combine
    "q_multi_match_phrase" -> ((s, d) =>
      Search.multiMatchPhraseTopK(t(s, d, "documents"), "doc_id",
        Seq("text", "source"), "table scan", 10)),
    "q_rank_feature" -> ((s, d) =>
      Search.rankFeatureTopK(t(s, d, "documents"), "doc_id", "n_chars", 200.0, 15)),
    // rank_feature log + sigmoid function variants
    "q_rank_feature_log" -> ((s, d) =>
      Search.rankFeatureLogTopK(t(s, d, "documents"), "doc_id", "n_chars", 2.5, 15)),
    "q_rank_feature_sigmoid" -> ((s, d) =>
      Search.rankFeatureSigmoidTopK(t(s, d, "documents"), "doc_id", "n_chars",
        pivot = 300.0, exponent = 2.0, k = 15)),
    // dis_max with tie_breaker: best field's BM25 + 0.3x the other's
    "q_dis_max" -> ((s, d) => Search.disMaxTopK(
      Seq(
        Search.bm25Scores(t(s, d, "documents"), "doc_id", "text", "merge src5"),
        Search.bm25Scores(t(s, d, "documents"), "doc_id", "source", "merge src5")),
      tieBreaker = 0.3, k = 10)),
    // script_score: Painless subset compiled to codegen'd column math
    // span_near mixing an exact span_term with a span_multi prefix
    "q_span_multi" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.QueryDslJson.compile(
        """{"span_near": {"clauses": [
             {"span_term": {"text": "join"}},
             {"span_multi": {"match": {"prefix": {"text": "ha"}}}}],
           "slop": 3}}"""))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    // completion suggester: pushed prefix scan, best weight per entry
    "q_suggest_completion" -> ((s, d) =>
      Search.suggestCompletion(t(s, d, "documents"), "source", "n_chars", "src1", 8)),
    // suggest_mode popular: only corrections MORE frequent than the
    // input term survive
    "q_suggest_popular" -> ((s, d) =>
      Search.suggestMode(t(s, d, "documents"), "text", "joins", "popular",
        maxEdits = 1, k = 5)),
    // completion suggester with contexts: suggestions gated to docs
    // in the requested categories, weights boosted per context value
    "q_suggest_context" -> ((s, d) =>
      Search.suggestCompletionContexts(t(s, d, "documents"), "source", "n_chars",
        prefix = "src", contextCol = "lang",
        contexts = Seq("en" -> 2.0, "fr" -> 1.0), k = 8)),
    // min_score: absolute relevance floor, not a top-k
    "q_min_score" -> ((s, d) =>
      Search.bm25MinScore(t(s, d, "documents"), "doc_id", "text", "vector hash", 2.0)),
    // WEIGHTED_AVG over STATS
    "q_esql_weighted_avg" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from lineitem
        | stats w = weighted_avg(l_extendedprice, l_quantity) by l_returnflag
        | eval w = round(w, 2) | sort l_returnflag""")),
    // int8 quantization audit over the embedding corpus (map-only)
    "q_embed_quant" -> ((s, d) =>
      graft.dedup.Vectors.quantizeInt8Stats(t(s, d, "embeddings"), "vec_id", "embedding")),
    // script_score with dense-vector functions (ES semantic-search
    // scoring: cosineSimilarity over a stored embedding + 1.0)
    // Painless statement subset: a for-loop over the stored vector
    // compiles to ONE aggregate fold (no per-row interpreter)
    "q_script_loop" -> ((s, d) => Search.scriptScoreTopK(
      t(s, d, "embeddings"), "vec_id", query = lit(true),
      script = "def s = 0.0; for (x in doc['embedding']) { s += x * x } return Math.sqrt(s)",
      params = Map.empty, k = 15)),
    "q_script_vector" -> ((s, d) =>
      Search.scriptScoreTopK(t(s, d, "embeddings"), "vec_id",
        query = lit(true),
        script = "cosineSimilarity(params.qv, 'embedding') + 1.0",
        params = Map("qv" -> ScriptQv), k = 10)),
    "q_script_score" -> ((s, d) =>
      Search.scriptScoreTopK(t(s, d, "documents"), "doc_id",
        query = graft.dsl.QueryDslJson.compile(
          """{"script_score": {"query": {"range": {"n_chars": {"gte": 100}}},
             |"script": {"source": "ignored-here"}}}""".stripMargin),
        script = "saturation(doc['n_chars'].value, 250) * Math.log(2.0 + doc['n_chars'].value) + params.bump",
        params = Map("bump" -> 0.5), k = 12)),
    // relevance decaying with geo distance from an origin point
    "q_distance_feature" -> ((s, d) =>
      Search.distanceFeatureTopK(withGeo(t(s, d, "customer")), "c_custkey",
        "lat", "lon", originLat = 10.0, originLon = 20.0, pivotKm = 1000.0, k = 15)),
    // the ES wrapper query: base64-embedded query-dsl json
    "q_wrapper" -> ((s, d) => {
      val inner = """{"bool": {"must": [{"term": {"lang": "en"}}, {"range": {"n_chars": {"gte": 200}}}]}}"""
      val b64 = java.util.Base64.getEncoder.encodeToString(
        inner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      t(s, d, "documents")
        .where(graft.dsl.QueryDslJson.compile(s"""{"wrapper": {"query": "$b64"}}"""))
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),
    // unordered positional proximity (span_near in_order=false)
    "q_span_near" -> ((s, d) => t(s, d, "documents")
      .where(Search.spanNear(col("text"), "join hash", 3))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    // terms_set: >= 2 of the 3 terms present
    "q_terms_set" -> ((s, d) => t(s, d, "documents")
      .where(Search.termsSet(col("text"), Seq("merge", "hash", "scan"), lit(2)))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    // simple_query_string mini-language: (hash AND join) OR
    // (phrase AND NOT slow) under default_operator=and
    "q_simple_query_string" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.QueryDslJson.compile(
        """{"simple_query_string": {"query": "hash join | \"merge batch\" -slow",
           "fields": ["text"], "default_operator": "and"}}"""))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    // search-as-you-type: full terms anywhere + last term as prefix
    "q_match_bool_prefix" -> ((s, d) => t(s, d, "documents")
      .where(Search.matchBoolPrefix(col("text"), "merge bat"))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    // match with minimum_should_match: 50% of 4 terms (floor) = 2
    "q_match_msm" -> ((s, d) => t(s, d, "documents")
      .where(Search.matchQueryMsm(col("text"), "spark window merge batch", "50%"))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    // term-centric AND across text+source as one combined field
    "q_combined_fields" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.QueryDslJson.compile(
        """{"combined_fields": {"query": "hash src3", "fields": ["text", "source"]}}"""))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    // span_or: single-term span OR an unordered span_near
    "q_span_or" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.QueryDslJson.compile(
        """{"span_or": {"clauses": [
             {"span_term": {"text": "vector"}},
             {"span_near": {"clauses": [{"span_term": {"text": "join"}},
               {"span_term": {"text": "hash"}}], "slop": 1, "in_order": false}}]}}"""))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    // span_not: "vector" with no "join" within 3 positions either side
    "q_span_not" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.QueryDslJson.compile(
        """{"span_not": {"include": {"span_term": {"text": "vector"}},
             "exclude": {"span_term": {"text": "join"}}, "pre": 3, "post": 3}}"""))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    // little term inside a 2-term near-span window (same predicate
    // powers span_containing — see Search.spanWithin)
    "q_span_within" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.QueryDslJson.compile(
        """{"span_within": {"little": {"span_term": {"text": "hash"}},
             "big": {"span_near": {"clauses": [
               {"span_term": {"text": "fast"}},
               {"span_term": {"text": "join"}}], "slop": 6}}}}"""))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    "q_span_containing" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.QueryDslJson.compile(
        """{"span_containing": {"little": {"span_term": {"text": "vector"}},
             "big": {"span_near": {"clauses": [
               {"span_term": {"text": "fast"}},
               {"span_term": {"text": "hash"}}], "slop": 8}}}}"""))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    // _termvectors with term_statistics for one document
    "q_termvectors" -> ((s, d) =>
      Search.termVectors(t(s, d, "documents"), "doc_id", "text", docId = 42L)),
    // _mtermvectors: a batch of docs through ONE corpus pass
    "q_mtermvectors" -> ((s, d) =>
      Search.mtermVectors(t(s, d, "documents"), "doc_id", "text", Seq(7L, 42L))),
    // ES 8.16 linear retriever: min-max-normalized weighted fusion
    "q_hybrid_linear" -> ((s, d) => {
      val lex = Search.bm25Scores(t(s, d, "documents"), "doc_id", "text", "fast hash join")
      val qv = array((0 until 64).map(i => lit((i * 37 % 100) / 100.0 - 0.5)): _*)
      val sem = t(s, d, "embeddings").select(
        col("vec_id").as("id"),
        // CosineSim declares double-array inputs: Catalyst casts the
        // float array natively (a transform() HOF here is interpreted
        // and was 6x super-linear in the 30x probe)
        graft.util.Num.round(
          graft.dedup.Vectors.cosine(col("embedding"), qv), 4).as("score"))
      Search.linearTopK(Seq((lex, 0.7), (sem, 0.3)), windowSize = 50, k = 10)
    }),
    // ES|QL piped queries compiled onto the same Catalyst plan
    "q_esql_where" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from orders | where o_totalprice >= 1000 and o_orderstatus == "O"
        | eval bucket = round(o_totalprice / 1000.0, 0)
        | keep o_orderkey, bucket | sort o_orderkey | limit 500""")),
    "q_esql_stats" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from lineitem
        | stats sum_qty = sum(l_quantity), n = count(*), max_p = max(l_extendedprice) by l_returnflag
        | sort l_returnflag""")),
    // ES|QL BUCKET in STATS..BY: calendar buckets by exact ns math,
    // numeric buckets by floor-width
    "q_esql_bucket" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from events | stats n = count(*), mx = max(value) by day = bucket(ts_ns, "day")
        | eval mx = round(mx, 4) | sort day""")),
    // full-text functions inside ES|QL WHERE (8.17 surface): MATCH
    // composes with ordinary predicates in one Catalyst filter
    "q_esql_match" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from documents | where match(text, "spark window") and lang == "en"
        | keep doc_id, lang | sort doc_id""")),
    // QSTR embeds the Lucene query-string grammar (field:term, AND)
    "q_esql_qstr" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from documents | where qstr("lang:en AND spark")
        | stats n = count(*), max_chars = max(n_chars)""")),
    "q_esql_eval_agg" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from documents | where lang != "xx"
        | eval kchars = n_chars / 100
        | stats n = count(*), avg_k = avg(kchars) by lang
        | eval avg_k = round(avg_k, 4) | sort lang""")),
    // ENRICH (broadcast lookup join) + DISSECT (literal-anchored
    // field extraction) in one pipeline
    "q_esql_enrich" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from customer | enrich nation on c_nationkey == n_nationkey with n_name
        | stats n = count(*), acct = sum(c_acctbal) by n_name
        | eval acct = round(acct, 2) | sort n_name""")),
    "q_esql_dissect" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from orders | dissect o_orderpriority "%{pr_num}-%{pr_name}"
        | stats n = count(*) by pr_name | sort pr_name""")),
    // function long tail: SPLIT -> multivalue fold, string functions
    "q_esql_functions" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from documents | eval toks = split(text, " ")
        | eval n = mv_count(toks) | eval ini = to_upper(left(lang, 1))
        | where n >= 40 | stats c = count(*), mx = max(n) by ini | sort ini""")),
    // multivalue family over SPLIT output: sort/dedupe/first/last
    "q_esql_mv" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from documents | eval toks = split(text, " ")
        | eval u = mv_count(mv_dedupe(toks)), srt = mv_sort(toks)
        | eval first = mv_first(srt), last = mv_last(srt)
        | keep doc_id, u, first, last | sort doc_id | limit 200""")),
    // MV_MEDIAN (sorted middle; even counts average the two middles)
    // over the 64-dim embedding multivalue
    "q_esql_mv_median" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from embeddings | eval med = mv_median(embedding)
        | keep vec_id, med | sort vec_id | limit 100""")),
    // MV_PERCENTILE: linear interpolation at rank p/100*(n-1)
    "q_esql_mv_pctl" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from embeddings | eval p75 = mv_percentile(embedding, 75)
        | keep vec_id, p75 | sort vec_id | limit 100""")),
    // MV_EXPAND with ES|QL null semantics: a null multivalue stays as
    // ONE row with null (explode_outer), never a dropped row — the
    // non-en docs here keep exactly their doc count
    "q_esql_mv_expand" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from documents | eval toks = case(lang == "en", split(text, " "))
        | mv_expand toks | stats n = count(*) by lang | sort lang""")),
    // CASE with and without a default (absent default = null, which
    // STATS BY groups as its own bucket)
    "q_esql_case" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from orders | eval band = case(o_totalprice < 50000.0, "low",
            o_totalprice < 150000.0, "mid", "high")
        | eval urgent = case(o_orderpriority == "1-URGENT", 1)
        | stats n = count(*), u = count(urgent) by band | sort band""")),
    // sparse_vector / text_expansion: weighted term-frequency dot
    // product (one-pass compiled kernel), score-ordered top-k
    "q_sparse_vector" -> ((s, d) =>
      Search.sparseVectorTopK(t(s, d, "documents"), "doc_id", "text",
        Seq("vector" -> 1.2, "hash" -> 0.8, "merge" -> 0.5), 15)),
    // script filter clause: boolean Painless compiled to one codegen'd
    // predicate (params substituted at compile time)
    "q_script_filter" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.QueryDslJson.compile(
        """{"script": {"script": {
             "source": "doc['n_chars'].value * 2 > params.t",
             "params": {"t": 900}}}}"""))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    // ES SQL (`POST /_sql`): plain ANSI SQL routes straight through
    // spark.sql onto the same Catalyst plan shapes
    "q_sql_basic" -> ((s, d) => graft.dsl.EsSql.run(s, d,
      """SELECT lang, count(*) AS n, min(n_chars) AS lo, max(n_chars) AS hi
         FROM documents WHERE n_chars > 200 GROUP BY lang ORDER BY lang""")),
    // ES SQL MATCH() — full-text predicate inside the WHERE clause
    "q_sql_match" -> ((s, d) => graft.dsl.EsSql.run(s, d,
      """SELECT doc_id, lang FROM documents
         WHERE MATCH(text, 'vector hash', 'operator=and') AND n_chars > 150
         ORDER BY doc_id""")),
    // ES SQL SCORE() — BM25 relevance as a selectable/sortable column
    "q_sql_score" -> ((s, d) => graft.dsl.EsSql.run(s, d,
      """SELECT doc_id, SCORE() AS score FROM documents
         WHERE MATCH(text, 'vector join')
         ORDER BY score DESC, doc_id LIMIT 10""")),
    // ES SQL QUERY() — embedded Lucene query-string syntax (bare term
    // hits the default full-text field)
    "q_sql_query" -> ((s, d) => graft.dsl.EsSql.run(s, d,
      """SELECT doc_id FROM documents
         WHERE QUERY('lang:en AND merge') ORDER BY doc_id""")),
    // ES SQL PIVOT — rides Spark SQL's native PIVOT through the same
    // rewrite path (implicit GROUP BY on the non-pivot columns);
    // decimal cast keeps the cell sums order-independent exact
    "q_sql_pivot" -> ((s, d) => graft.dsl.EsSql.run(s, d,
      """SELECT bucket, CAST(s_o AS DOUBLE) AS s_o, CAST(s_f AS DOUBLE) AS s_f,
           CAST(s_p AS DOUBLE) AS s_p
         FROM (SELECT o_custkey % 10 AS bucket, o_orderstatus,
           CAST(o_totalprice AS DECIMAL(18,4)) AS price FROM orders)
         PIVOT (SUM(price) FOR o_orderstatus IN ('O' AS s_o, 'F' AS s_f, 'P' AS s_p))
         ORDER BY bucket""")),
    // ES SQL scalar-function spellings Spark lacks: IIF,
    // DATE_DIFF('unit',..)/DATE_ADD('unit',..) — text-rewritten to
    // IF/timestampdiff/timestampadd before spark.sql
    // ES SQL PERCENTILE (0-100 scale) / PERCENTILE_RANK aggregates;
    // rounding happens OUTSIDE the SQL via Num.round (Spark's SQL
    // ROUND diverges from DuckDB's on binary doubles)
    "q_sql_percentile" -> ((s, d) => graft.dsl.EsSql.run(s, d,
      """SELECT o_orderstatus, PERCENTILE(o_totalprice, 50) AS p50,
           PERCENTILE_RANK(o_totalprice, 100000) AS pr
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
      .select(col("o_orderstatus"),
        graft.util.Num.round(col("p50"), 4).as("p50"),
        graft.util.Num.round(col("pr"), 4).as("pr"))
      .orderBy(col("o_orderstatus"))),
    // ES SQL HISTOGRAM() grouping function -> bucket-start expression
    "q_sql_histogram" -> ((s, d) => graft.dsl.EsSql.run(s, d,
      """SELECT HISTOGRAM(o_totalprice, 50000) AS bucket, COUNT(*) AS n
         FROM orders GROUP BY bucket ORDER BY bucket""")),
    // ES|QL COMPLETION (9.x LLM operator): stubbed deterministic
    // inference — named output column, expression prompt, WITH ignored
    "q_esql_completion" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from documents
        | where doc_id < 20
        | completion summary = text with { "inference_id" : "stub" }
        | keep doc_id, summary
        | sort doc_id""")),
    "q_sql_funcs" -> ((s, d) => graft.dsl.EsSql.run(s, d,
      """SELECT o_orderkey AS id,
           IIF(o_totalprice > 200000, 'big', 'small') AS sz,
           DATE_DIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS dd,
           DATE_ADD('day', 30, o_orderdate) AS due
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1995-02-01 00:00:00'
         ORDER BY id""")),
    // _explain: BM25 term-by-term breakdown for one doc, index-wide stats
    "q_explain" -> ((s, d) =>
      Search.explainScore(t(s, d, "documents"), "doc_id", "text",
        "vector hash join", docId = 42L)),
    // VALUES / TOP multivalue aggregates (projected to scalars — the
    // driver's comparator can't sort list cells)
    "q_esql_values" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from documents
        | stats langs = values(lang), tops = top(n_chars, 3) by source
        | eval nl = mv_count(langs), l1 = mv_first(langs), ln = mv_last(langs),
               t1 = mv_first(tops), t3 = mv_last(tops)
        | keep source, nl, l1, ln, t1, t3
        | sort source | limit 20""")),
    // STATS ... WHERE: per-aggregate row filters sharing one agg pass
    "q_esql_stats_where" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from lineitem
        | stats n = count(*), nret = count(*) where l_returnflag == "R",
                rqty = sum(l_quantity) where l_returnflag == "R" by l_linestatus
        | sort l_linestatus""")),
    // FORK: branch sub-pipelines over one scan, tagged union
    "q_esql_fork" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from documents
        | fork ( where n_chars > 450 | keep doc_id, n_chars )
               ( sort n_chars desc, doc_id | limit 5 | keep doc_id, n_chars )
        | sort _fork, doc_id""")),
    // FUSE (ES|QL 9.x): RRF merge of FORK branches — per-branch rank
    // window over the LIMIT-ed fork outputs, one partial-agg groupBy
    "q_esql_fuse" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from documents
        | fork ( where n_chars > 450 | eval _score = n_chars + 0.0 | sort _score desc, doc_id | limit 20 | keep doc_id, _score )
               ( where source == "src3" | eval _score = doc_id + 0.0 | sort _score desc, doc_id | limit 20 | keep doc_id, _score )
        | fuse rrf key by doc_id with rank_constant = 60
        | eval _score = round(_score, 6)
        | sort _score desc, doc_id
        | limit 15""")),
    // GROK: named-pattern extraction (the log-pipeline sibling of
    // DISSECT) — one regexp_extract per capture, narrow codegen
    "q_esql_grok" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from events
        | grok props "{"k": %{INT:kval:long}}"
        | stats n = count(*), ktot = sum(kval), kmax = max(kval) by event_type
        | sort event_type""")),
    // RERANK (inference stubbed to the deterministic term-overlap
    // scorer): _score recompute + re-sort on the narrowed window
    "q_esql_rerank" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from documents
        | where match(text, "merge")
        | rerank "fast hash merge" on text
        | eval _score = round(_score, 4)
        | sort _score desc, doc_id
        | limit 10
        | keep doc_id, _score""")),
    // spatial family: ST_POINT/ST_X/ST_Y structs, ST_DISTANCE in
    // meters (great-circle) — pure codegen'd column math
    "q_esql_spatial" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from customer
        | eval lat = (c_custkey * 7919 % 18000) / 100.0 - 90.0,
               lon = (c_custkey * 104729 % 36000) / 100.0 - 180.0
        | eval p = st_point(lon, lat)
        | eval d_m = round(st_distance(p, st_point(0.0, 0.0)), 2), x = st_x(p), y = st_y(p)
        | where d_m < 2000000.0
        | keep c_custkey, d_m, x, y
        | sort c_custkey""")),
    // STD_DEV aggregate (8.15): per-group population stddev
    "q_esql_stddev" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from lineitem
        | stats sd = std_dev(l_quantity), n = count(*) by l_returnflag
        | eval sd = round(sd, 4)
        | sort l_returnflag""")),
    // function long tail: base64, angle conversions, 2-arg LOG, MV_ZIP
    "q_esql_functions2" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from documents
        | where doc_id <= 20
        | eval b64 = to_base64(lang), rt = from_base64(b64),
               deg = round(to_degrees(1.0), 4), rad = round(to_radians(180.0), 4),
               lg = round(log(2.0, 8.0), 4),
               z = mv_zip(split(lang, "n"), split(source, "rc"))
        | eval zn = mv_count(z), zl = mv_last(z)
        | keep doc_id, b64, rt, deg, rad, lg, zn, zl
        | sort doc_id""")),
    // date function family over ns-long event time
    "q_esql_dates" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from events
        | eval day = date_format("yyyy-MM-dd", ts_ns),
               age_h = date_diff("hour", ts_ns, 1710000000000000000),
               mo = date_extract("month", ts_ns)
        | stats n = count(*), mx = max(age_h), mom = max(mo) by day
        | sort day | limit 10""")),
    // DATE_TRUNC over ns-long event time (exact integer math)
    "q_esql_date_trunc" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from events | eval day = date_trunc("day", ts_ns)
        | stats n = count(*), lo = min(value), hi = max(value) by day
        | sort day | limit 14""")),
    // INLINESTATS: per-group aggregate appended to every row (the
    // partial-agg + broadcast-join-back plan), then filtered against
    "q_esql_inlinestats" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from lineitem | inlinestats mx = max(l_quantity) by l_returnflag
        | where l_quantity >= mx - 1
        | stats n = count(*) by l_returnflag | sort l_returnflag""")),
    // LOOKUP JOIN (ES 8.18): broadcast left join on the shared field
    "q_esql_lookup" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from customer | rename c_nationkey as n_nationkey
        | lookup join nation on n_nationkey
        | stats n = count(*) by n_name | sort n_name""")),
    // CHANGE_POINT: step-change detection over the daily value series
    "q_esql_change_point" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from events | eval day = date_trunc("day", ts_ns)
        | stats v = avg(value) by day | eval v = round(v, 4)
        | change_point v on day""")),
    // _search/template: mustache-rendered query -> DSL compile; the
    // min_chars param exercises scalar substitution, the absent
    // boost param exercises the inverted-section default
    "q_search_template" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.SearchTemplate.compile(
        """{"source": "{\"bool\": {\"must\": [{\"term\": {\"lang\": \"{{lang}}\"}}, {\"range\": {\"n_chars\": {\"gte\": {{min_chars}}{{^min_chars}}100{{/min_chars}}}}}]}}",
           "params": {"lang": "en", "min_chars": 200}}"""))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    // _rank_eval: precision/MRR/DCG/recall of the BM25 top-10 against
    // graded ratings (rating = matched-query-terms - 1)
    "q_rank_eval" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val results = Search.bm25TopK(docs, "doc_id", "text", "fast hash join", 10)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("score").desc, col("id").asc)))
        .select(lit(1L).as("query_id"), col("id"), col("rank"))
      val toks = graft.analysis.Analyzer.tokens(col("text"))
      val ratings = docs.select(
        lit(1L).as("query_id"),
        col("doc_id").as("id"),
        (Seq("fast", "hash", "join")
          .map(t => when(array_contains(toks, t), 1).otherwise(0))
          .reduce(_ + _) - 1).as("rating"))
        .where(col("rating") > 0)
      Search.rankEval(results, ratings, 10)
    }),
    // geo_shape envelope relation over doc-side envelopes
    "q_geo_shape" -> ((s, d) => {
      val c = withGeo(t(s, d, "customer"))
        .withColumn("min_lat", col("lat") - (col("c_custkey") % 10).cast("double") / 10.0)
        .withColumn("max_lat", col("lat") + (col("c_custkey") % 10).cast("double") / 10.0)
        .withColumn("min_lon", col("lon") - (col("c_custkey") % 7).cast("double") / 7.0)
        .withColumn("max_lon", col("lon") + (col("c_custkey") % 7).cast("double") / 7.0)
      c.where(Relational.envelopeRelation(
          col("min_lat"), col("max_lat"), col("min_lon"), col("max_lon"),
          -10.0, 10.0, -20.0, 20.0, "intersects"))
        .select(col("c_custkey"), col("min_lat"), col("max_lon"))
        .orderBy(col("c_custkey"))
    }),
    // indexed geo_shape POLYGONS: each doc carries its own vertex
    // ring; contains = compiled per-row ray cast, within = vertex
    // extremes vs envelope. The oracle checks the generic kernel
    // INDEPENDENTLY: test shapes are diamonds, whose containment has
    // a closed form (|dy|/armY + |dx|/armX <= 1) that shares no code
    // path with the ray cast.
    "q_geo_shape_indexed" -> ((s, d) => {
      val c = withGeo(t(s, d, "customer"))
        .withColumn("an", (col("c_custkey") % 7 + 2).cast("double"))
        .withColumn("ae", (col("c_custkey") % 5 + 2).cast("double"))
        .withColumn("aso", (col("c_custkey") % 3 + 2).cast("double"))
        .withColumn("aw", (col("c_custkey") % 11 + 2).cast("double"))
        .withColumn("lats", array(
          col("lat") + col("an"), col("lat"), col("lat") - col("aso"), col("lat")))
        .withColumn("lons", array(
          col("lon"), col("lon") + col("ae"), col("lon"), col("lon") - col("aw")))
      c.select(
          col("c_custkey"),
          Relational.shapeContainsPoint(col("lats"), col("lons"),
            5.1234567, 10.7654321).cast("int").as("contains_pt"),
          Relational.shapeWithinEnvelope(col("lats"), col("lons"),
            top = 29.876, left = -59.43, bottom = -29.954, right = 59.781)
            .cast("int").as("within_env"))
        .where(col("contains_pt") === 1 || col("within_env") === 1)
        .orderBy(col("c_custkey"))
    }),
    // geo_shape full topology 1: polygon WITH A HOLE. The shape is a
    // diamond with a concentric 1/3-scale diamond hole; containment is
    // even-odd parity across both rings (one compiled loop). The
    // oracle checks the generic kernel independently via the diamond
    // closed form: in_shape = outer <= 1 AND NOT hole <= 1.
    "q_geo_shape_holes" -> ((s, d) => {
      val c = withGeo(t(s, d, "customer"))
        .withColumn("an", (col("c_custkey") % 7 + 2).cast("double") * 8.0)
        .withColumn("ae", (col("c_custkey") % 5 + 2).cast("double") * 8.0)
        .withColumn("aso", (col("c_custkey") % 3 + 2).cast("double") * 8.0)
        .withColumn("aw", (col("c_custkey") % 11 + 2).cast("double") * 8.0)
        .withColumn("hn", col("an") / 3.0).withColumn("he", col("ae") / 3.0)
        .withColumn("hs", col("aso") / 3.0).withColumn("hw", col("aw") / 3.0)
      val outerLats = array(
        col("lat") + col("an"), col("lat"), col("lat") - col("aso"), col("lat"))
      val outerLons = array(
        col("lon"), col("lon") + col("ae"), col("lon"), col("lon") - col("aw"))
      val latRings = array(outerLats, array(
        col("lat") + col("hn"), col("lat"), col("lat") - col("hs"), col("lat")))
      val lonRings = array(outerLons, array(
        col("lon"), col("lon") + col("he"), col("lon"), col("lon") - col("hw")))
      c.select(
          col("c_custkey"),
          Relational.shapeContainsPoint(outerLats, outerLons,
            5.1234567, 10.7654321).cast("int").as("in_outer"),
          Relational.shapeRingsContainPoint(latRings, lonRings,
            5.1234567, 10.7654321).cast("int").as("in_shape"))
        .where(col("in_outer") === 1)
        .orderBy(col("c_custkey"))
    }),
    // geo_shape full topology 2: MULTIPOLYGON — two disjoint-by-
    // construction diamond parts (second centered at the negated
    // coordinates with rotated arms); even-odd across parts = union.
    "q_geo_shape_multi" -> ((s, d) => {
      val c = withGeo(t(s, d, "customer"))
        .withColumn("an", (col("c_custkey") % 7 + 2).cast("double") * 8.0)
        .withColumn("ae", (col("c_custkey") % 5 + 2).cast("double") * 8.0)
        .withColumn("aso", (col("c_custkey") % 3 + 2).cast("double") * 8.0)
        .withColumn("aw", (col("c_custkey") % 11 + 2).cast("double") * 8.0)
        .withColumn("lat2", -col("lat")).withColumn("lon2", -col("lon"))
      val latRings = array(
        array(col("lat") + col("an"), col("lat"), col("lat") - col("aso"), col("lat")),
        array(col("lat2") + col("ae"), col("lat2"), col("lat2") - col("aw"), col("lat2")))
      val lonRings = array(
        array(col("lon"), col("lon") + col("ae"), col("lon"), col("lon") - col("aw")),
        array(col("lon2"), col("lon2") + col("an"), col("lon2"), col("lon2") - col("aso")))
      c.select(
          col("c_custkey"),
          Relational.shapeRingsContainPoint(latRings, lonRings,
            5.1234567, 10.7654321).cast("int").as("in_shape"))
        .where(col("in_shape") === 1)
        .orderBy(col("c_custkey"))
    }),
    // geo_shape full topology 3: LINESTRING intersects envelope — a
    // 4-vertex per-row polyline vs a fixed query box; per segment,
    // bbox reject then the separating-axis corner test (compiled).
    // Oracle mirrors the identical closed-form comparisons.
    "q_geo_shape_line" -> ((s, d) => {
      val c = withGeo(t(s, d, "customer"))
        .withColumn("an", (col("c_custkey") % 7 + 2).cast("double") * 4.0)
        .withColumn("ae", (col("c_custkey") % 5 + 2).cast("double") * 4.0)
        .withColumn("aso", (col("c_custkey") % 3 + 2).cast("double") * 4.0)
        .withColumn("aw", (col("c_custkey") % 11 + 2).cast("double") * 4.0)
      val lats = array(
        col("lat"), col("lat") + col("an"),
        col("lat") - col("aso"), col("lat") + col("an") / 2.0)
      val lons = array(
        col("lon"), col("lon") + col("ae"),
        col("lon") + lit(2.0) * col("ae"), col("lon") - col("aw"))
      c.select(
          col("c_custkey"),
          Relational.linestringIntersectsEnvelope(lats, lons,
            top = 20.0, left = -30.0, bottom = -20.0, right = 30.0)
            .cast("int").as("hits"))
        .where(col("hits") === 1)
        .orderBy(col("c_custkey"))
    }),
    // ES 8 hybrid search: BM25 + vector retrievers fused by
    // reciprocal rank (retriever.rrf) — the RAG retrieval pattern
    "q_hybrid_rrf" -> ((s, d) => {
      val lex = Search.bm25Scores(t(s, d, "documents"), "doc_id", "text", "fast hash join")
      val qv = array((0 until 64).map(i => lit((i * 37 % 100) / 100.0 - 0.5)): _*)
      val sem = t(s, d, "embeddings").select(
        col("vec_id").as("id"),
        // CosineSim declares double-array inputs: Catalyst casts the
        // float array natively (a transform() HOF here is interpreted
        // and was 6x super-linear in the 30x probe)
        graft.util.Num.round(
          graft.dedup.Vectors.cosine(col("embedding"), qv), 4).as("score"))
      Search.rrfTopK(Seq(lex, sem), rankConstant = 60, windowSize = 50, k = 10)
    }),
    // search_as_you_type: bool_prefix candidates ranked by the
    // 2/3-gram shingle-subfield signals
    "q_sayt" -> ((s, d) =>
      Search.searchAsYouTypeTopK(t(s, d, "documents"), "doc_id", "text",
        "fast hash jo", 10)),
    // semantic query (8.15): model-free text-expansion degenerate —
    // unit-weight query tokens through the sparse-dot kernel
    "q_semantic" -> ((s, d) =>
      Search.semanticTopK(t(s, d, "documents"), "doc_id", "text",
        "vector hash merge", 15)),
    // the ES 8.16 retriever TREE (same fusion params as q_hybrid_rrf,
    // declared as the JSON retriever body instead of hand-wiring)
    "q_retriever_rrf" -> ((s, d) => {
      val vec = (0 until 64).map(i => (i * 37 % 100) / 100.0 - 0.5)
      graft.dsl.Retrievers.topK(
        t(s, d, "documents"), "doc_id", t(s, d, "embeddings"), "vec_id",
        s"""{"retriever": {"rrf": {"retrievers": [
            |  {"standard": {"query": {"match": {"text": "fast hash join"}}}},
            |  {"knn": {"field": "embedding", "query_vector": [${vec.mkString(",")}]}}],
            |  "rank_window_size": 50, "rank_constant": 60}}}""".stripMargin,
        k = 10)
    }),
    // ES 8 knn search surface: pre-filter + exact top-k at a
    // num_candidates budget that covers the corpus
    "q_knn" -> ((s, d) => {
      val vec = (0 until 64).map(i => (i * 37 % 100) / 100.0 - 0.5)
      Ann.knnSearch(t(s, d, "embeddings"), "vec_id",
        s"""{"knn": {"field": "embedding", "query_vector": [${vec.mkString(",")}],
            "k": 5, "num_candidates": 100000, "filter": {"term": {"label": 3}}}}""")
    }),
    // rank_vectors maxSim (ES 8.17 late interaction): multi-vector
    // docs scored by sum-of-best dot products against 2 query vectors
    "q_rank_vectors" -> ((s, d) => {
      val q1 = (0 until 64).map(i => (i * 37 % 100) / 100.0 - 0.5)
      val q2 = (0 until 64).map(i => (i * 53 % 100) / 100.0 - 0.5)
      Ann.maxSimTopK(
        t(s, d, "embeddings").withColumn("doc_id", pmod(col("vec_id"), lit(50))),
        "doc_id", "embedding", Seq(q1, q2), k = 10)
    }),
    // knn with a similarity cutoff (ES 8.8): only hits at cosine >=
    // s survive the top-k window
    "q_knn_similarity" -> ((s, d) => {
      val vec = (0 until 64).map(i => (i * 37 % 100) / 100.0 - 0.5)
      Ann.knnSearch(t(s, d, "embeddings"), "vec_id",
        s"""{"knn": {"field": "embedding", "query_vector": [${vec.mkString(",")}],
            "k": 20, "num_candidates": 100000, "similarity": 0.15}}""")
    }),
    // point-in-polygon geo filter (even-odd ray cast)
    "q_geo_polygon" -> ((s, d) =>
      withGeo(t(s, d, "customer"))
        .where(graft.rel.Relational.geoPolygon(col("lat"), col("lon"), GeoPolygonVertices))
        .select(col("c_custkey"), col("lat"), col("lon"))
        .orderBy(col("c_custkey"))),
    // two-phase ranking: BM25 window, re-ranked by a secondary signal
    "q_rescore" -> ((s, d) =>
      Search.rescoreTopK(t(s, d, "documents"), "doc_id", "text", "fast hash join",
        log(lit(1.0) + col("n_chars")), windowSize = 50, k = 10,
        queryWeight = 1.0, rescoreWeight = 0.5)),
    "q_text_clean" -> ((s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        TextAnalysis.cleanText(col("text")).as("clean"),
        length(TextAnalysis.cleanText(col("text"))).as("clean_len"))
      .orderBy(col("doc_id"))),
    // learning_to_rank rescorer: linear model over (bm25, doc
    // features) applied to the top-50 window only
    "q_ltr" -> ((s, d) => Search.ltrRescoreTopK(
      t(s, d, "documents"), "doc_id", "text", "fast hash join",
      features = Seq(
        "len" -> log(lit(1.0) + col("n_chars")),
        "is_en" -> (col("lang") === "en").cast("double")),
      weights = Map("_score" -> 0.6, "len" -> 0.2, "is_en" -> 1.5),
      windowSize = 50, k = 10)),
    // corpus n-gram heavy hitters (boilerplate mining): top document
    // frequencies over per-doc-distinct 3-gram shingles
    "q_ngram_topk" -> ((s, d) =>
      TextAnalysis.ngramTopK(t(s, d, "documents"), "text", n = 3, k = 20)),

    // ---- B. Full-text (query context) ----
    "q_match" -> ((s, d) => t(s, d, "documents")
      .where(Search.matchQuery(col("text"), "spark window"))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    "q_match_and" -> ((s, d) => t(s, d, "documents")
      .where(Search.matchQueryAnd(col("text"), "spark window"))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    "q_match_phrase" -> ((s, d) => t(s, d, "documents")
      .where(Search.matchPhrase(col("text"), "table scan"))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    "q_match_phrase_prefix" -> ((s, d) => t(s, d, "documents")
      .where(Search.matchPhrasePrefix(col("text"), "table sc"))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    "q_span_first" -> ((s, d) => t(s, d, "documents")
      .where(Search.spanFirst(col("text"), "spark", 10))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    "q_query_string" -> ((s, d) => t(s, d, "documents")
      .where(Search.queryString(Seq(col("text"), col("source")), "src5 merge"))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    "q_match_phrase_slop" -> ((s, d) => t(s, d, "documents")
      .where(Search.matchPhraseSlop(col("text"), "table scan", slop = 1))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    // analyzer chain: minimal_english stemmer — query "tables windows"
    // matches singular occurrences; raw_hit shows what a stemmerless
    // match would have seen on the same (morphed) stream
    "q_match_stemmed" -> ((s, d) => {
      import graft.analysis.Analyzer
      val m = morphedToks()
      val st = Analyzer.chain(m, stemmer = "minimal_english")
      t(s, d, "documents")
        .select(col("doc_id"), m.as("mt"), st.as("st"))
        .where(Search.matchChain(col("mt"), "tables windows",
          stemmer = "minimal_english"))
        .select(col("doc_id"),
          size(array_intersect(array_distinct(col("st")),
            lit(Array("table", "window")))).cast("long").as("n_terms"),
          arrays_overlap(col("mt"), lit(Array("tables", "windows"))).as("raw_hit"))
        .orderBy(col("doc_id"))
    }),
    // light_german stemming over the German-morphed stream: the query
    // terms 'vectoren hashen' and the morphed index forms both stem to
    // 'vector'/'hash'; raw_hit marks docs that held a morphed form
    "q_match_stemmed_de" -> ((s, d) => {
      import graft.analysis.Analyzer
      val m = germanMorphToks()
      val st = Analyzer.chain(m, stemmer = "light_german")
      t(s, d, "documents")
        .select(col("doc_id"), m.as("mt"), st.as("st"))
        .where(Search.matchChain(col("mt"), "vectoren hashen",
          stemmer = "light_german"))
        .select(col("doc_id"),
          size(array_intersect(array_distinct(col("st")),
            lit(Array("vector", "hash")))).cast("long").as("n_terms"),
          arrays_overlap(col("mt"), lit(Array("vectoren", "hashen"))).as("raw_hit"))
        .orderBy(col("doc_id"))
    }),
    // asciifolding: de docs get accented variants (a->ä, e->é), the
    // folded index matches 'merge' anyway; raw_hit shows the unfolded
    // tokenizer splitting 'mérgé' apart (accents are separators)
    "q_match_folded" -> ((s, d) => {
      import graft.analysis.Analyzer
      val raw = when(col("lang") === "de",
        translate(col("text"), "ae", "äé")).otherwise(col("text"))
      val folded = Analyzer.tokens(Analyzer.asciiFold(raw))
      t(s, d, "documents")
        .where(array_contains(folded, "merge") && col("lang").isin("de", "en"))
        .select(col("doc_id"), col("lang"),
          array_contains(Analyzer.tokens(raw), "merge").as("raw_hit"))
        .orderBy(col("doc_id"))
    }),
    // html_strip char filter: tags out, entities decoded (&amp; last),
    // then the standard chain — 'amp' must NOT surface as a token
    "q_analyze_html" -> ((s, d) => {
      import graft.analysis.Analyzer
      val html = concat(lit("<div class=\"x\"><p>"),
        substring(col("text"), 1, 60), lit(" &amp; more</p></div>"))
      val toks = Analyzer.tokens(Analyzer.htmlStrip(html))
      t(s, d, "documents")
        .groupBy(col("lang"))
        .agg(sum(size(toks)).as("n_toks"),
          sum(array_contains(toks, "more").cast("long")).as("n_more"),
          sum(array_contains(toks, "amp").cast("long")).as("n_amp"),
          sum(array_contains(toks, "div").cast("long")).as("n_div"))
        .orderBy(col("lang"))
    }),
    // analyzer chain: stop filter — "the" drops out of the AND query,
    // so docs lacking it still match (has_the marks them)
    "q_match_stopwords" -> ((s, d) => {
      import graft.analysis.Analyzer
      val toks = Analyzer.tokens(col("text"))
      t(s, d, "documents")
        .where(Search.matchChain(toks, "the fast table",
          stop = Analyzer.EnglishStop, operator = "and"))
        .select(col("doc_id"), array_contains(toks, "the").as("has_the"))
        .orderBy(col("doc_id"))
    }),
    // query-time synonym expansion: neither "rapid" nor "tbl" occurs in
    // the corpus; their synonym groups (fast/quick, table) do
    "q_match_synonyms" -> ((s, d) => {
      import graft.analysis.Analyzer
      val toks = Analyzer.tokens(col("text"))
      t(s, d, "documents")
        .where(Search.matchSynonyms(toks, "rapid tbl",
          Map("rapid" -> Seq("fast", "quick"), "tbl" -> Seq("table")),
          operator = "and"))
        .select(col("doc_id"),
          size(array_intersect(array_distinct(toks),
            lit(Array("rapid", "fast", "quick")))).cast("long").as("n_syn"))
        .orderBy(col("doc_id"))
    }),
    // BM25 over the full analyzed chain (stop + minimal_english): dl,
    // tf and df all change under the chain — the oracle recomputes the
    // whole scoring pipeline over the chained token stream
    "q_bm25_stemmed" -> ((s, d) => {
      import graft.analysis.Analyzer
      val toksDf = t(s, d, "documents").select(
        col("doc_id").as("id"),
        Analyzer.chain(morphedToks(),
          stop = Analyzer.EnglishStop, stemmer = "minimal_english").as("toks"))
      Search.bm25ScoresFromToks(toksDf,
        Analyzer.analyzeChain("tables fast", Analyzer.EnglishStop, "minimal_english"))
        .orderBy(col("score").desc, col("id").asc).limit(10)
    }),
    // index-time edge_ngram (2..4) — the sayt/completion index shape:
    // tf counts ngram tokens, showing the expansion is real
    "q_edge_ngram" -> ((s, d) => {
      import graft.analysis.Analyzer
      val eg = Analyzer.chain(Analyzer.tokens(col("text")), edge = Some((2, 4)))
      t(s, d, "documents")
        .select(col("doc_id"), eg.as("egs"))
        .where(array_contains(col("egs"), "tab"))
        .select(col("doc_id"),
          size(filter(col("egs"), g => g === "tab")).cast("long").as("tf"))
        .orderBy(col("doc_id"))
    }),
    "q_constant_score" -> ((s, d) =>
      Search.constantScore(t(s, d, "documents"), "doc_id",
        QueryDsl.term(col("lang"), "fr") && col("n_chars") > 300, 1.2)),
    "q_pinned" -> ((s, d) =>
      Search.pinnedTopK(t(s, d, "documents"), "doc_id", "text", "fast hash join", Seq(7L, 11L), 10)),
    "q_boosting" -> ((s, d) =>
      Search.boostingTopK(t(s, d, "documents"), "doc_id", "text", "fast hash join",
        QueryDsl.term(col("lang"), "de"), 0.5, 10)),
    "q_bm25" -> ((s, d) =>
      Search.bm25TopK(t(s, d, "documents"), "doc_id", "text", "fast hash join", 10)),
    "q_more_like_this" -> ((s, d) =>
      Search.moreLikeThis(t(s, d, "documents"), "doc_id", "text", seedId = 7L, m = 5, minMatch = 2)),
    // more_like_this with `unlike`: the negative example's terms are
    // excluded from the seed's interesting-term selection
    "q_mlt_unlike" -> ((s, d) =>
      Search.moreLikeThis(t(s, d, "documents"), "doc_id", "text", seedId = 7L,
        m = 5, minMatch = 2, unlikeId = Some(11L))),

    "q_function_score" -> ((s, d) =>
      Search.functionScoreTopK(t(s, d, "documents"), "doc_id", "n_chars", 300.0, 100.0, 15)),
    // _explain for a function_score hit: per-component breakdown
    // (field_value_factor, gauss, product) for one document
    "q_explain_function" -> ((s, d) =>
      Search.explainFunctionScore(t(s, d, "documents"), "doc_id", "n_chars",
        300.0, 100.0, docId = 42L)),
    // all three decay families over one numeric field, ES closed forms
    "q_score_decay" -> ((s, d) => t(s, d, "documents")
      .select(
        col("doc_id"),
        Num.round(Search.decayScore(col("n_chars"), "gauss", 300.0, 100.0, 50.0), 4).as("g"),
        Num.round(Search.decayScore(col("n_chars"), "exp", 300.0, 100.0, 50.0), 4).as("e"),
        Num.round(Search.decayScore(col("n_chars"), "linear", 300.0, 100.0, 50.0), 4).as("l"))
      .orderBy(col("doc_id"))),
    "q_collapse" -> ((s, d) =>
      Search.collapse(t(s, d, "documents"), "lang", "n_chars", "doc_id")
        .select(col("lang"), col("doc_id"), col("n_chars"))
        .orderBy(col("lang"))),
    "q_collapse_inner" -> ((s, d) =>
      Search.collapseInnerHits(t(s, d, "documents"), "lang", "n_chars", "doc_id", 3)),
    "q_search_after" -> ((s, d) =>
      Search.searchAfter(t(s, d, "documents"), "doc_id", "n_chars", 400L, 250L, 10)
        .select(col("doc_id"), col("n_chars"))),
    "q_suggest" -> ((s, d) => Search.suggest(t(s, d, "documents"), "text", "spak", 2, 5)),
    "q_highlight" -> ((s, d) =>
      Search.highlight(t(s, d, "documents"), "doc_id", "text", "merge").limit(20)),

    // es.read.metadata with a scored query: the connector read path
    // surfaces _score (BM25 over the match clause) alongside _id.
    // runtime_mappings: query-time computed fields (Painless emit
    // scripts), searchable like mapped fields — the predicate below
    // references one runtime and one mapped field
    "q_runtime_fields" -> ((s, d) => {
      import graft.sources.Connector.implicits._
      s.graftDF(s"$d/documents.parquet",
        """{"runtime_mappings": {
             "len_bucket": {"type": "long", "script": {"source": "emit(Math.floor(doc['n_chars'].value / 100))"}},
             "kchars": {"type": "double", "script": {"source": "emit(doc['n_chars'].value / 1000.0)"}}},
           "query": {"bool": {"must": [{"range": {"len_bucket": {"gte": 2}}}, {"term": {"lang": "en"}}]}}}""",
        idField = "doc_id")
        .select(col("doc_id"), col("len_bucket"), col("kchars"))
        .orderBy(col("doc_id"))
    }),
    // _mget: id-list point lookup in request order with found flags
    "q_mget" -> ((s, d) => {
      import graft.sources.Connector.implicits._
      s.graftMget(s"$d/documents.parquet", Seq(7L, 3L, 99999999L, 42L), "doc_id")
        .select(col("pos"), col("doc_id"), col("found"), col("lang"), col("n_chars"))
    }),
    // _msearch: a batch of queries answered in ONE shared scan
    "q_msearch" -> ((s, d) =>
      Search.msearch(t(s, d, "documents"), "doc_id",
        Seq(
          "m1" -> QueryDsl.term(col("lang"), "en"),
          "m2" -> (col("n_chars") >= 400L),
          "m3" -> Search.matchQueryAnd(col("text"), "hash join")),
        sortCol = "n_chars", k = 5)),
    "q_read_metadata_score" -> ((s, d) => {
      import graft.sources.Connector.implicits._
      s.graftDF(s"$d/documents.parquet", """{"match": {"text": "merge sort"}}""",
        idField = "doc_id", readMetadata = true)
        .select(col("_id").as("id"), col("_score").as("score"))
        .orderBy(col("score").desc, col("id").asc)
        .limit(15)
    }),

    "q_percolate" -> ((s, d) => Search.percolate(t(s, d, "documents"), "doc_id", Seq(
      "wants_spark" -> Search.matchQueryAnd(col("text"), "spark join"),
      "long_en" -> (QueryDsl.term(col("lang"), "en") && col("n_chars") > 350),
      "src1x_phrase" -> (QueryDsl.prefix(col("source"), "src1") &&
        Search.matchPhrase(col("text"), "table scan"))))),

    // inverted-index percolation: the registry is DATA, not plan
    "q_percolate_scale" -> ((s, d) => {
      import s.implicits._
      val registry = Seq(
        ("wants_spark", Seq("spark", "join")),
        ("table_scan", Seq("table", "scan")),
        ("merge_heavy", Seq("merge", "sort", "hash"))).toDF("query_id", "terms")
      Search.percolateTerms(t(s, d, "documents"), "doc_id", "text", registry)
    }),
    // registry-as-data percolation over the bounded DSL subset:
    // terms + numeric range + phrase per stored query (r8)
    "q_percolate_dsl" -> ((s, d) => {
      import s.implicits._
      val registry = Seq(
        ("r_spark_long", Seq("spark", "join"), Some("n_chars"),
          Some(300.0), Some(10000.0), None: Option[String]),
        ("r_table_phrase", Seq("table"), None: Option[String],
          None: Option[Double], None: Option[Double], Some("table scan")),
        ("r_merge", Seq("merge", "sort"), None: Option[String],
          None: Option[Double], None: Option[Double], None: Option[String]),
        ("r_fast_short", Seq("fast"), Some("n_chars"),
          Some(0.0), Some(350.0), None: Option[String]))
        .toDF("query_id", "terms", "range_field", "range_min", "range_max", "phrase")
      Search.percolateDsl(t(s, d, "documents"), "doc_id", "text",
        registry, Seq("n_chars"))
    }),

    // ---- C. Aggregations ----
    "q_agg_terms" -> ((s, d) => Aggs.termsAgg(t(s, d, "orders"), "o_orderpriority", 3)),
    // bucket_correlation: monthly doc counts vs a deterministic
    // indicator curve, corr on the tiny bucket frame
    "q_agg_bucket_corr" -> ((s, d) => Aggs.bucketCorrelation(
      Aggs.dateHistogramAgg(t(s, d, "orders"), "o_orderdate", "month"),
      "bucket", "doc_count",
      (0 until 80).map(i => (i * 37 % 100) / 100.0))),
    // terms agg keyed by a Painless script (price-band buckets)
    "q_agg_terms_script" -> ((s, d) => Aggs.termsAggScript(
      t(s, d, "orders"),
      "Math.floor(doc['o_totalprice'].value / params.band)",
      Map("band" -> 50000.0), size = 8)),
    // histogram offset + min_doc_count: shifted boundaries, sparse
    // buckets dropped
    "q_agg_histogram_offset" -> ((s, d) => Aggs.histogramOffsetAgg(
      t(s, d, "lineitem"), "l_extendedprice",
      interval = 5000.0, offset = 2500.0, minDocCount = 100L)),
    // terms `missing`: null keys count under a substitute bucket
    "q_agg_terms_missing" -> ((s, d) => Aggs.termsAggMissing(
      t(s, d, "documents").withColumn("maybe_lang",
        when(col("lang") === "xx", lit(null).cast("string")).otherwise(col("lang"))),
      "maybe_lang", 10, missing = "N/A")),
    // bucket order by a sub-aggregation metric, not doc_count
    "q_agg_terms_order" -> ((s, d) => Aggs.termsAggOrderBy(t(s, d, "orders"),
      "o_orderpriority", 3, Num.round(avg(col("o_totalprice")), 4), "avg_price")),
    // include.partition: the deterministic hash-slice pager for
    // high-cardinality term sets (1 of 4 slices here)
    "q_agg_terms_partition" -> ((s, d) => Aggs.termsAggPartition(t(s, d, "part"),
      "p_name", 10, partition = 1, numPartitions = 4)),
    "q_agg_stats" -> ((s, d) => Aggs.statsAgg(t(s, d, "lineitem"), "l_extendedprice")),
    "q_agg_extended_stats" -> ((s, d) => Aggs.extendedStatsAgg(t(s, d, "lineitem"), "l_quantity")),
    // distributed sort-selection, not the single-reducer percentile agg
    "q_agg_percentiles" -> ((s, d) => Aggs.percentilesExactDistributed(
      t(s, d, "lineitem"), "l_extendedprice",
      Seq("p25" -> 0.25, "p50" -> 0.50, "p95" -> 0.95))),
    // percentiles via t-digest (ES's actual sketch, compression knob
    // and all) — probe shape: sketch estimate, then re-rank against
    // the real data and assert the published rank-error bound, so the
    // exact oracle stays value-stable despite sketch nondeterminism
    "q_agg_percentiles_tdigest" -> ((s, d) => graft.agg.TDigest.percentilesProbe(
      t(s, d, "lineitem"), "l_extendedprice",
      Seq("p25" -> 0.25, "p50" -> 0.50, "p95" -> 0.95),
      compression = 100.0, epsRank = 0.015)),
    // percentiles, hdr method: deterministic significant-digit
    // buckets — the sketch itself is oracle-mirrored hash-exact
    "q_agg_percentiles_hdr" -> ((s, d) => Aggs.percentilesHdr(
      t(s, d, "lineitem"), "l_extendedprice",
      Seq("p25" -> 0.25, "p50" -> 0.50, "p95" -> 0.95), sigDigits = 3)),
    "q_agg_cardinality" -> ((s, d) => Aggs.cardinalityAgg(t(s, d, "lineitem"), "l_partkey")),
    "q_agg_histogram" -> ((s, d) => Aggs.histogramAgg(t(s, d, "lineitem"), "l_extendedprice", 5000.0)),
    "q_agg_date_histogram" -> ((s, d) => Aggs.dateHistogramAgg(t(s, d, "orders"), "o_orderdate", "month")),
    "q_agg_range" -> ((s, d) => Aggs.rangeAgg(t(s, d, "orders"), "o_totalprice", Seq(1000.0, 5000.0, 20000.0))),
    "q_agg_filters" -> ((s, d) => Aggs.filtersAgg(Tables.events(s, d), Seq(
      "high_value" -> (col("value") > 75),
      "clicks" -> (col("event_type") === "click"),
      "errors" -> (col("event_type") === "error")))),
    // TSDS time_series agg: one bucket per dimension tuple, keyed by
    // the deterministic _tsid
    "q_time_series" -> ((s, d) => graft.sources.Downsample.timeSeriesAgg(
      Tables.events(s, d)
        .withColumn("shard", pmod(col("user_id"), lit(3)).cast("string")),
      tsCol = "ts_ns", dims = Seq("event_type", "shard"), metric = "value")),
    // composite with a date_histogram source: month bucket + terms
    // key, after-key paging across the pair
    "q_agg_composite_date" -> ((s, d) => Aggs.compositeAgg(
      t(s, d, "orders").withColumn("month_key",
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")),
      keys = Seq("month_key", "o_orderpriority"),
      afterKey = Some(Seq("1995-06-01", "3-MEDIUM")), size = 12)),
    // composite missing_bucket: docs with a null source key get a
    // null-key bucket ordered first (asc nulls-first on both engines)
    "q_agg_composite_missing" -> ((s, d) => Aggs.compositeAgg(
      t(s, d, "documents").withColumn("maybe_lang",
        when(col("lang") === "xx", lit(null).cast("string")).otherwise(col("lang"))),
      keys = Seq("maybe_lang", "source"), afterKey = None, size = 15,
      missingBucket = true)),
    // other_bucket: docs matching NO named filter get their own count
    "q_agg_filters_other" -> ((s, d) => Aggs.filtersAggOther(Tables.events(s, d), Seq(
      "high_value" -> (col("value") > 75),
      "clicks" -> (col("event_type") === "click"),
      "errors" -> (col("event_type") === "error")), otherName = "other_docs")),
    "q_agg_top_hits" -> ((s, d) =>
      Aggs.topHitsAgg(t(s, d, "orders"), "o_orderpriority", "o_totalprice", "o_orderkey", 3)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_orderpriority"), col("rn"))),
    "q_agg_composite" -> ((s, d) =>
      Aggs.compositeAgg(t(s, d, "documents"), Seq("lang", "source"), Some(Seq("de", "src3")), 10)),
    // composite with a geotile_grid SOURCE (+ a terms source) and
    // after-key paging — the TSDB map-dashboard page shape; the grid
    // key is computed once, the after predicate pushes below the agg
    "q_agg_composite_geo" -> ((s, d) =>
      Aggs.compositeAggSources(withGeo(t(s, d, "customer")),
        Seq("tile" -> Aggs.geotileKey("lat", "lon", zoom = 4),
          "seg" -> col("c_mktsegment")),
        afterKey = Some(Seq("4/11/7", "BUILDING")), size = 12)),
    "q_agg_nested" -> ((s, d) => Aggs.nestedAgg(t(s, d, "documents"), "lang", "source", "n_chars")),
    "q_agg_top_metrics" -> ((s, d) => t(s, d, "documents")
      .groupBy(col("lang"))
      .agg(
        max_by(col("n_chars"), col("doc_id")).as("latest_n_chars"),
        max(col("doc_id")).as("latest_doc"))
      .orderBy(col("lang"))),
    // top_metrics with SEVERAL metrics from the same top document
    // (one max_by struct — atomically the same row's values, which
    // separate max_by calls would not guarantee under ties)
    "q_agg_top_metrics_multi" -> ((s, d) => t(s, d, "documents")
      .groupBy(col("lang"))
      .agg(max_by(struct(col("n_chars"), col("source")), col("doc_id")).as("m"),
        max(col("doc_id")).as("latest_doc"))
      .select(col("lang"), col("m.n_chars").as("latest_n_chars"),
        col("m.source").as("latest_source"), col("latest_doc"))
      .orderBy(col("lang"))),
    // date_histogram with offset: +10 days shifts bucket boundaries
    "q_agg_date_histogram_offset" -> ((s, d) =>
      Aggs.dateHistogramOffsetAgg(t(s, d, "orders"), "o_orderdate", "month", "10 days")),
    "q_agg_string_stats" -> ((s, d) => t(s, d, "documents")
      .agg(
        count(col("text")).as("cnt"),
        min(length(col("text"))).as("min_length"),
        max(length(col("text"))).as("max_length"),
        Num.round(avg(length(col("text"))), 4).as("avg_length"))),
    "q_agg_sampler" -> ((s, d) => t(s, d, "documents")
      // deterministic hash sampler (~20%): the shard-seeded sampler agg
      .where(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long") % 5 === 0)
      .agg(count(lit(1)).as("sample_size"), Num.round(avg(col("n_chars")), 4).as("avg_n_chars"))),
    "q_agg_date_range" -> ((s, d) => {
      val o = col("o_orderdate")
      t(s, d, "orders")
        .groupBy(
          when(o < "1997-01-01", "*-1997")
            .when(o >= "1997-01-01" && o < "1999-01-01", "1997-1999")
            .otherwise("1999-*").as("bucket"))
        .agg(count(lit(1)).as("doc_count"))
        .orderBy(col("bucket"))
    }),
    "q_agg_adjacency" -> ((s, d) => Aggs.adjacencyMatrix(t(s, d, "orders"), Seq(
      "urgent" -> (col("o_orderpriority") === "1-URGENT"),
      "big" -> (col("o_totalprice") > 20000),
      "open" -> (col("o_orderstatus") === "O")))),
    "q_agg_rare_terms" -> ((s, d) => Aggs.rareTermsAgg(t(s, d, "documents"), "source", 30L, 10)),
    "q_agg_weighted_avg" -> ((s, d) =>
      Aggs.weightedAvg(t(s, d, "lineitem"), "l_extendedprice", "l_quantity")),
    "q_agg_matrix_stats" -> ((s, d) =>
      Aggs.matrixStats(t(s, d, "lineitem"), "l_quantity", "l_extendedprice")),
    "q_geo_centroid" -> ((s, d) => {
      val g = withGeo(t(s, d, "customer"))
      Aggs.geoCentroid(g.where(col("c_mktsegment") === "BUILDING"), "lat", "lon")
    }),
    // moving_fn MovingFunctions.ewma: exponentially-weighted moving
    // average over a 6-bucket trailing window of the date_histogram —
    // the fold recurrence (acc*0.7 + x*0.3, seeded by the window's
    // first value) runs as one array fold per bucket, mirrored by
    // DuckDB's list_reduce bit-for-bit
    "q_agg_ewma" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val buckets = Tables.events(s, d)
        .groupBy(expr("ts_ns div 3600000000000").as("bucket"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy(col("bucket")).rowsBetween(-5, 0)
      val windowArr = collect_list(col("n").cast("double")).over(w)
      buckets
        .select(col("bucket"), col("n"),
          aggregate(windowArr, lit(null).cast("double"),
            (acc, x) => when(acc.isNull, x).otherwise(x * 0.3 + acc * 0.7))
            .as("raw_ewma"))
        .select(col("bucket"), col("n"),
          graft.util.Num.round(col("raw_ewma"), 4).as("ewma"))
        .orderBy(col("bucket"))
    }),
    // ES `histogram` FIELD type: per-user pre-aggregated (values[],
    // counts[]) histograms built once, then stats aggregate the
    // histograms — raw observations never re-aggregate (the rollup/
    // TSDB read path). Decimal partials make the sums order-free.
    "q_agg_histogram_field" -> ((s, d) => {
      val hist = Tables.events(s, d)
        .groupBy(col("user_id"), (floor(col("value") / 100.0) * 100.0).as("bv"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(struct(col("bv"), col("c")))).as("h"))
        .select(col("user_id"),
          transform(col("h"), x => x.getField("bv")).as("values"),
          transform(col("h"), x => x.getField("c")).as("counts"))
      Aggs.histogramFieldStats(hist, "values", "counts")
    }),
    "q_geo_grid" -> ((s, d) =>
      Aggs.geohashGridAgg(withGeo(t(s, d, "customer")), "lat", "lon", precision = 4, k = 15)),
    "q_geo_tile" -> ((s, d) =>
      Aggs.geotileGridAgg(withGeo(t(s, d, "customer")), "lat", "lon", zoom = 6, k = 15)),
    // the FULL _search body lifecycle in one JSON: runtime field ->
    // query on it -> aggs tree (ES's evaluation order)
    "q_search_body" -> ((s, d) => graft.dsl.SearchBody.search(t(s, d, "documents"),
      """{"runtime_mappings": {
           "kchars": {"type": "long", "script": {"source": "emit(doc['n_chars'].value / 100)"}}},
         "query": {"bool": {"filter": [
           {"range": {"kchars": {"gte": 1}}}, {"term": {"lang": "en"}}]}},
         "aggs": {"by_k": {"terms": {"field": "kchars"},
           "aggs": {"srcs": {"cardinality": {"field": "source"}}}}}}""",
      idField = "doc_id")),
    // _search body hit path: sort objects + from/size paging (ordered
    // offset+limit, never a collect)
    "q_search_paging" -> ((s, d) => graft.dsl.SearchBody.search(t(s, d, "documents"),
      """{"query": {"term": {"lang": "de"}},
         "sort": [{"n_chars": {"order": "desc"}}, {"doc_id": {"order": "asc"}}],
         "from": 5, "size": 10}""",
      idField = "doc_id")),
    // the _search body "aggs" JSON compiler: a nested bucket tree
    // (terms > terms > metrics) compiles to ONE flat groupBy
    "q_aggs_json" -> ((s, d) => graft.dsl.AggsJson.compile(t(s, d, "documents"),
      """{"aggs": {"by_lang": {"terms": {"field": "lang"}, "aggs": {
           "by_src": {"terms": {"field": "source"}, "aggs": {
             "avg_chars": {"avg": {"field": "n_chars"}},
             "n_vals": {"value_count": {"field": "n_chars"}}}}}}}}""")),
    // aggs JSON: date_histogram bucket + cardinality/sum metrics over
    // the event stream (the dashboard-panel request shape)
    "q_aggs_json_date" -> ((s, d) => graft.dsl.AggsJson.compile(Tables.events(s, d),
      """{"aggs": {"by_day": {"date_histogram": {"field": "ts_ns", "fixed_interval": "1d"},
           "aggs": {"users": {"cardinality": {"field": "user_id"}},
                    "total": {"sum": {"field": "value"}}}}}}""")),
    // aggs JSON: range buckets with ES's */from/to key labels;
    // out-of-range rows drop like ES
    "q_aggs_json_range" -> ((s, d) => graft.dsl.AggsJson.compile(Tables.events(s, d),
      """{"aggs": {"vr": {"range": {"field": "value", "ranges": [
           {"to": 100}, {"from": 100, "to": 300}, {"from": 300}]},
           "aggs": {"hi": {"max": {"field": "value"}}}}}}""")),
    // _mvt vector-tile search: per-tile features (count, centroid,
    // closed-form tile envelope) — the map-rendering read path
    "q_mvt" -> ((s, d) =>
      Aggs.mvtTiles(withGeo(t(s, d, "customer")), "lat", "lon", zoom = 5, k = 12)),
    "q_autocomplete" -> ((s, d) => t(s, d, "documents")
      .select(explode(graft.analysis.Analyzer.tokens(col("text"))).as("token"))
      .where(col("token").startsWith("s"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(8)),
    "q_agg_pipeline" -> ((s, d) =>
      Aggs.dateHistogramPipeline(t(s, d, "orders"), "o_orderdate", "month", "o_totalprice")),
    "q_agg_bucket_ops" -> ((s, d) =>
      Aggs.pipelineBucketOps(t(s, d, "orders"), "o_orderdate", "month", "o_totalprice",
        lagN = 12, minAvg = 250000.0)),
    "q_agg_percentile_ranks" -> ((s, d) =>
      Aggs.percentileRanksAgg(t(s, d, "lineitem"), "l_extendedprice", Seq(1000.0, 10000.0, 50000.0))),
    "q_agg_histogram_empty" -> ((s, d) =>
      Aggs.dateHistogramEmptyBuckets(t(s, d, "orders"), "o_orderdate")),
    "q_terms_lookup" -> ((s, d) =>
      Relational.termsLookup(t(s, d, "orders"), "o_custkey",
        t(s, d, "customer").where(col("c_mktsegment") === "MACHINERY"), "c_custkey")
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))),
    "q_agg_multi_terms" -> ((s, d) =>
      Aggs.multiTermsAgg(t(s, d, "documents"), Seq("lang", "source"), 10)),
    "q_agg_auto_date_histogram" -> ((s, d) =>
      Aggs.autoDateHistogramAgg(t(s, d, "orders"), "o_orderdate", 20)),
    "q_agg_diversified" -> ((s, d) =>
      Aggs.diversifiedSamplerAgg(t(s, d, "documents"), "doc_id", "lang", "n_chars", 40)),
    "q_agg_missing" -> ((s, d) => Aggs.missingAgg(Tables.events(s, d), "value")),
    "q_agg_bucket_stats" -> ((s, d) =>
      Aggs.bucketStatsAgg(t(s, d, "orders"), "o_orderdate", "month", "o_totalprice")),
    "q_agg_normalize" -> ((s, d) =>
      Aggs.normalizeAgg(t(s, d, "orders"), "o_orderdate", "month", "o_totalprice")),
    "q_agg_boxplot" -> ((s, d) => Aggs.boxplotAgg(t(s, d, "lineitem"), "l_extendedprice")),
    "q_agg_mad" -> ((s, d) =>
      Aggs.medianAbsoluteDeviation(t(s, d, "lineitem"), "l_extendedprice")),
    // significant_text: sampled + duplicate-text-filtered foreground
    "q_agg_sig_text" -> ((s, d) => Aggs.significantText(
      t(s, d, "documents"), "doc_id", "text", col("lang") === "en",
      sampleProb = 0.5, minFgCount = 5, k = 10)),
    "q_agg_t_test" -> ((s, d) => Aggs.tTestAgg(Tables.events(s, d), "value",
      col("event_type") === "click", col("event_type") === "view")),
    // cumulative_cardinality over integer hour buckets (exact ns math)
    "q_agg_cum_card" -> ((s, d) => Aggs.cumulativeCardinality(
      Tables.events(s, d), "user_id", expr("ts_ns div 3600000000000"))),
    "q_agg_variable_width" -> ((s, d) =>
      Aggs.variableWidthHistogram(t(s, d, "lineitem"), "l_quantity", 4)),
    // geo_line: per-nation polyline of customer points ordered by key
    "q_agg_geo_line" -> ((s, d) => Aggs.geoLineAgg(
      withGeo(t(s, d, "customer")), "c_nationkey", "c_custkey",
      col("lat"), col("lon"), 5)),
    "q_agg_rate" -> ((s, d) =>
      Aggs.rateAgg(t(s, d, "orders"), "o_orderdate", "month", "o_totalprice")),
    // geo_bounds: tightest envelope per market segment
    "q_agg_geo_bounds" -> ((s, d) =>
      Aggs.geoBounds(withGeo(t(s, d, "customer")), "c_mktsegment", "lat", "lon")),
    // scripted_metric: Painless map script compiled to codegen'd
    // column math, associative combine/reduce -> one partial agg
    "q_agg_scripted_metric" -> ((s, d) =>
      Aggs.scriptedMetric(t(s, d, "lineitem"), "l_returnflag",
        "doc['l_extendedprice'].value * (1 - doc['l_discount'].value)")),
    "q_agg_geo_distance" -> ((s, d) =>
      Aggs.geoDistanceAgg(withGeo(t(s, d, "customer")), "lat", "lon",
        originLat = 10.0, originLon = 20.0, edgesKm = Seq(2000.0, 5000.0, 10000.0))),
    "q_agg_moving_fn" -> ((s, d) =>
      Aggs.dateHistogramMovingFn(t(s, d, "orders"), "o_orderdate", "month", "o_totalprice", 3)),
    "q_agg_bucket_sort" -> ((s, d) =>
      Aggs.bucketSortAgg(t(s, d, "orders"), "o_orderdate", "month", "o_totalprice",
        from = 2, sz = 5)),
    "q_agg_children" -> ((s, d) =>
      Aggs.childrenAgg(t(s, d, "orders"), t(s, d, "lineitem"),
        "o_orderkey", "l_orderkey", "o_orderstatus", "l_quantity")),
    // bucket by the nested field, count PARENT docs per bucket
    "q_agg_reverse_nested" -> ((s, d) =>
      Aggs.reverseNestedAgg(t(s, d, "lineitem"), "l_orderkey", "l_returnflag")),
    // bucket CHILD docs by a PARENT field (inverse of children agg)
    "q_agg_parent" -> ((s, d) =>
      Aggs.parentAgg(t(s, d, "orders"), t(s, d, "lineitem"),
        "o_orderkey", "l_orderkey", "o_orderstatus", "l_quantity")),
    // hexagonal grid buckets (axial lattice, H3's role)
    "q_agg_geohex" -> ((s, d) =>
      Aggs.geohexGridAgg(withGeo(t(s, d, "customer")), "lat", "lon", size = 5.0, k = 15)),
    "q_agg_random_sampler" -> ((s, d) =>
      Aggs.randomSamplerAgg(t(s, d, "orders"), "o_orderkey", 0.1, "o_totalprice")),
    "q_suggest_phrase" -> ((s, d) =>
      Search.phraseSuggest(t(s, d, "documents"), "text", "table scin", maxEdits = 1, k = 5)),
    "q_match_fuzzy" -> ((s, d) => t(s, d, "documents")
      .where(graft.dsl.QueryDslJson.compile(
        """{"match": {"text": {"query": "spak window", "fuzziness": 1}}}"""))
      .select(col("doc_id")).orderBy(col("doc_id"))),
    "q_agg_sig_terms" -> ((s, d) =>
      Aggs.significantTerms(t(s, d, "documents"), "text", col("lang") === "en", minFgCount = 5, k = 10)),
    // significance heuristics are pluggable column math — chi_square
    // here, over the same one-pass (fg, bg) doc-count frame
    "q_agg_sig_chi2" -> ((s, d) =>
      Aggs.significantTerms(t(s, d, "documents"), "text", col("lang") === "en",
        minFgCount = 5, k = 10, heuristic = "chi_square")),
    // significant_terms, jlh heuristic (absolute x relative uplift)
    "q_agg_sig_jlh" -> ((s, d) =>
      Aggs.significantTerms(t(s, d, "documents"), "text", col("lang") === "en",
        minFgCount = 5, k = 10, heuristic = "jlh")),
    // significant_terms, mutual_information: textbook 2x2 MI over
    // term-presence x fg-membership doc counts (log2, bg superset)
    "q_agg_sig_mi" -> ((s, d) =>
      Aggs.significantTerms(t(s, d, "documents"), "text", col("lang") === "en",
        minFgCount = 5, k = 10, heuristic = "mutual_information")),
    // significant_terms, gnd: 1 - Google Normalized Distance between
    // the term and the foreground set (Cilibrasi & Vitanyi 2007)
    "q_agg_sig_gnd" -> ((s, d) =>
      Aggs.significantTerms(t(s, d, "documents"), "text", col("lang") === "en",
        minFgCount = 5, k = 10, heuristic = "gnd")),
    // significant_terms over a KEYWORD field: uplift math on field
    // values — one groupBy, no token explode
    "q_agg_sig_keyword" -> ((s, d) =>
      Aggs.significantTermsKeyword(t(s, d, "documents"), "source",
        col("lang") === "de", minFgCount = 2, k = 10)),
    // distributed terms accounting: per-shard top-N + ES's
    // doc_count_error_upper_bound from the unreporting shards' last
    // counts — the real coordinator protocol at 1000 executors
    "q_agg_terms_error" -> ((s, d) =>
      Aggs.termsAggShardError(t(s, d, "documents"), "source", "doc_id",
        size = 10, shards = 4, shardSize = 5)),
    // categorize_text over log-like event messages: the numeric
    // variable parts drop out, stable token patterns remain
    "q_agg_categorize" -> ((s, d) =>
      Aggs.categorizeText(Tables.events(s, d),
        concat_ws(" ", col("event_type"), col("props")), maxTokens = 4)),
    "q_agg_global" -> ((s, d) =>
      Aggs.globalWithFilter(t(s, d, "orders"), col("o_orderstatus") === "F", "o_totalprice")),
    // pipeline-agg percentile family over monthly bucket sums
    "q_agg_percentiles_bucket" -> ((s, d) =>
      Aggs.percentilesBucket(monthlyOrderSums(t(s, d, "orders")), "msum")),
    "q_agg_moving_percentiles" -> ((s, d) =>
      Aggs.movingPercentiles(monthlyOrderSums(t(s, d, "orders")), "m", "msum", 3)),
    // frequent_item_sets (pairs): brands co-occurring within an order
    "q_agg_frequent_items" -> ((s, d) =>
      Aggs.frequentItemSets(
        t(s, d, "lineitem").join(
          broadcast(t(s, d, "part").select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey")),
        "l_orderkey", "p_brand", minSupport = 50).limit(20)),

    // ---- D. Relational / enrich ----
    "q_tpch_q6" -> ((s, d) => t(s, d, "lineitem")
      .where(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01" &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .agg(Num.round(
        sum((col("l_extendedprice") * col("l_discount")).cast("decimal(28,8)")).cast("double"), 4)
        .as("revenue"))),
    "q_tpch_q1" -> ((s, d) => t(s, d, "lineitem")
      .where(col("l_shipdate") <= "1998-09-02")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Num.round(sum(col("l_quantity").cast("decimal(28,8)")).cast("double"), 4).as("sum_qty"),
        Num.round(sum(col("l_extendedprice").cast("decimal(28,8)")).cast("double"), 4).as("sum_base_price"),
        Num.round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(28,8)")).cast("double"), 4).as("sum_disc_price"),
        Num.round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).cast("decimal(28,8)")).cast("double"), 4).as("sum_charge"),
        Num.round(avg(col("l_quantity")), 4).as("avg_qty"),
        Num.round(avg(col("l_extendedprice")), 4).as("avg_price"),
        Num.round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))),
    // TPC-H Q5: the 6-table join showcase — dims broadcast, the two
    // fact-fact joins shuffle on their keys, AQE handles skew.
    "q_tpch_q5" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
        .where(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
      val l = t(s, d, "lineitem")
      val su = t(s, d, "supplier")
      val n = t(s, d, "nation")
      val r = t(s, d, "region").where(col("r_name") === "ASIA")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(Num.round(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(28,8)"))
            .cast("double"), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),
    "q_join_enrich" -> ((s, d) =>
      Relational.enrich(
        Relational.enrich(
          t(s, d, "customer").withColumnRenamed("c_nationkey", "n_nationkey"),
          t(s, d, "nation"), Seq("n_nationkey")),
        t(s, d, "region").withColumnRenamed("r_regionkey", "n_regionkey"), Seq("n_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"), Num.round(avg(col("c_acctbal")), 4).as("avg_bal"))
        .orderBy(col("r_name"))),
    "q_join_revenue" -> ((s, d) => {
      val c = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders").where(col("o_orderdate") < "1998-01-01")
      val l = t(s, d, "lineitem").where(col("l_shipdate") > "1998-01-01")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(Num.round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),
    "q_semi_join" -> ((s, d) => t(s, d, "customer")
      .join(t(s, d, "orders").where(col("o_totalprice") > 10000)
        .select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name")).orderBy(col("c_custkey"))),
    "q_anti_join" -> ((s, d) => t(s, d, "customer")
      .join(t(s, d, "orders").where(col("o_totalprice") > 24000)
        .select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name")).orderBy(col("c_custkey"))),
    "q_nested" -> ((s, d) => {
      // ES nested docs: orders with lineitems as an array-of-structs
      // child field; the nested query = "a child matches the predicate"
      val nested = Relational.nest(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_quantity"), col("l_returnflag")),
        "l_orderkey", "lines")
      Relational.nestedExists(
        t(s, d, "orders"), nested, "o_orderkey", "l_orderkey", "lines",
        ln => ln.getField("l_quantity") > 48 && ln.getField("l_returnflag") === "A")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),
    // nested query with inner_hits: the matching INNER docs come
    // back per parent (filter over the struct array — no unnest join)
    "q_nested_inner" -> ((s, d) => {
      val nested = Relational.nest(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_quantity"), col("l_returnflag")),
        "l_orderkey", "lines")
      Relational.nestedExists(
        t(s, d, "orders"), nested, "o_orderkey", "l_orderkey", "lines",
        ln => ln.getField("l_quantity") > 48 && ln.getField("l_returnflag") === "A")
        .select(col("o_orderkey"),
          size(filter(col("lines"), ln =>
            ln.getField("l_quantity") > 48 && ln.getField("l_returnflag") === "A"))
            .as("n_inner"),
          Num.round(aggregate(
            filter(col("lines"), ln =>
              ln.getField("l_quantity") > 48 && ln.getField("l_returnflag") === "A"),
            lit(0.0), (a, ln) => a + ln.getField("l_quantity")), 4).as("inner_qty"))
        .orderBy(col("o_orderkey"))
    }),
    // ES join-field parent/child: has_child with min_children, has_parent
    "q_has_child" -> ((s, d) =>
      Relational.hasChild(t(s, d, "orders"), t(s, d, "lineitem"),
        "o_orderkey", "l_orderkey", col("l_quantity") > 45, minChildren = 3)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),
    "q_has_parent" -> ((s, d) =>
      Relational.hasParent(t(s, d, "lineitem"), t(s, d, "orders"),
        "o_orderkey", "l_orderkey", col("o_orderpriority") === "1-URGENT")
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),
    // ES range fields: one agg over all three relation semantics
    "q_range_field" -> ((s, d) => {
      val lo = col("o_orderdate")
      val hi = col("o_orderdate") + expr("interval 90 days")
      val qlo = lit("1997-06-01").cast("timestamp")
      val qhi = lit("1997-08-01").cast("timestamp")
      t(s, d, "orders").agg(
        count(when(Relational.rangeRelation(lo, hi, qlo, qhi, "intersects"), 1)).as("n_intersects"),
        count(when(Relational.rangeRelation(lo, hi, qlo, qhi, "within"), 1)).as("n_within"),
        count(when(Relational.rangeRelation(lo, hi, qlo, qhi, "contains"), 1)).as("n_contains"))
    }),
    // interval overlap join via grid bucketing (range join)
    "q_interval_join" -> ((s, d) => {
      val docs = t(s, d, "documents")
      def iv(src: String) = docs.where(col("source") === src).select(
        col("doc_id"),
        (col("doc_id") * 7 % 500).cast("double").as("lo"),
        (col("doc_id") * 7 % 500 + 9).cast("double").as("hi"))
      Relational.intervalOverlapJoin(
        iv("src0"), iv("src1"), "doc_id", "lo", "hi", "doc_id", "lo", "hi", cellWidth = 8.0)
    }),
    // as-of join: each click picks up the latest prior view's value
    "q_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val views = ev.where(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts_ns")).agg(max(col("value")).as("view_value"))
      Relational.asofLookup(
        ev.where(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts_ns"), col("value")),
        views, "user_id", "ts_ns", "ts_ns", "view_value", "asof_view_value")
        .select(col("event_id"), col("user_id"), col("value"), col("asof_view_value"))
        .orderBy(col("event_id"))
    }),
    "q_window_topn" -> ((s, d) =>
      Relational.topNPerGroup(t(s, d, "orders"), Seq("o_custkey"),
        col("o_totalprice").desc, col("o_orderkey").asc, 2)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))),

    // ---- search-body sort surface (graft.search.Sorting) ----
    // multivalued-field sort mode (ES MultiValueMode): each order's
    // lineitem quantities fold to ONE sort key (median) — the
    // array_sort + middle-pick is per-row narrow math, and the ordered
    // limit still plans as TakeOrderedAndProject
    "q_sort_mode" -> ((s, d) => {
      val qty = t(s, d, "lineitem").groupBy(col("l_orderkey"))
        .agg(collect_list(col("l_quantity")).as("qtys"))
      t(s, d, "orders").join(qty, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"),
          Num.round(Sorting.key("""{"qtys": {"mode": "median"}}"""), 4).as("qty_median"))
        .orderBy(col("qty_median").desc, col("o_orderkey"))
        .limit(100)
    }),
    // nested sort: mode fold over inner docs RESTRICTED by a filter —
    // orders ranked by their min returned-item quantity; orders with
    // no matching inner doc sort as missing (last)
    "q_sort_nested" -> ((s, d) => {
      val items = t(s, d, "lineitem").groupBy(col("l_orderkey"))
        .agg(collect_list(struct(col("l_quantity"), col("l_returnflag"))).as("items"))
      t(s, d, "orders").join(items, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"),
          Num.round(Sorting.key(
            """{"items.l_quantity": {"order": "asc", "mode": "min",
              |  "nested": {"path": "items",
              |             "filter": {"term": {"l_returnflag": "R"}}}}}"""
              .stripMargin), 4).as("min_r_qty"))
        .orderBy(col("min_r_qty").asc_nulls_last, col("o_orderkey"))
        .limit(100)
    }),
    // _geo_distance sort: haversine km from the query point as the
    // key; sorted on the ROUNDED value so the limit boundary is
    // engine-deterministic
    "q_sort_geo" -> ((s, d) => {
      val g = withGeo(t(s, d, "customer"))
        .withColumnRenamed("lat", "loc_lat").withColumnRenamed("lon", "loc_lon")
      g.select(col("c_custkey"),
          Num.round(Sorting.key(
            """{"_geo_distance": {"loc": {"lat": 0.0, "lon": 0.0}, "order": "asc", "unit": "km"}}"""), 4)
            .as("dist_km"))
        .orderBy(col("dist_km"), col("c_custkey"))
        .limit(50)
    }),
    // _script sort: a Painless sort key compiles to codegen'd column
    // math — non-monotonic in any mapped field, so it exercises the
    // script path rather than a field alias
    "q_sort_script" -> ((s, d) => t(s, d, "orders")
      .select(col("o_orderkey"),
        Num.round(Sorting.key(
          """{"_script": {"script": {"source":
            |"Math.abs(doc['o_totalprice'].value - params.pivot)",
            |"params": {"pivot": 150000.0}}, "order": "asc"}}""".stripMargin), 4)
          .as("sort_key"))
      .orderBy(col("sort_key"), col("o_orderkey"))
      .limit(20)),
    // missing-value placement: ES puts missing keys _last by default
    // regardless of direction; _first inverts that
    "q_sort_missing" -> ((s, d) => t(s, d, "orders")
      .withColumn("pri", when(col("o_orderpriority") === "1-URGENT",
        lit(null).cast("string")).otherwise(col("o_orderpriority")))
      .select(col("o_orderkey"), col("pri"))
      .orderBy(Sorting.compile(
        """[{"pri": {"order": "asc", "missing": "_first"}}]""") :+ col("o_orderkey"): _*)
      .limit(100)),

    // ---- E. Write path / geo ----
    "q_upsert_id" -> ((s, d) =>
      Relational.upsertLastWriteWins(Tables.events(s, d), Seq("user_id"), col("ts_ns"), col("event_id"))
        .select(col("user_id"), col("event_type").as("last_type"), col("value").as("last_value"))
        .orderBy(col("user_id"))),
    "q_write_roundtrip" -> ((s, d) => {
      val out = s"/tmp/graft_roundtrip_${System.getProperty("user.name")}"
      Multimodal.mediaTable(t(s, d, "documents"))
        .write.mode("overwrite").partitionBy("mime").parquet(out)
      s.read.parquet(out).groupBy(col("mime")).agg(count(lit(1)).as("n"))
        .orderBy(col("mime"))
    }),
    "q_geo_distance" -> ((s, d) => {
      val g = withGeo(t(s, d, "customer"))
      g.withColumn("dist_km",
        Num.round(Relational.haversineKm(col("lat"), col("lon"), lit(0.0), lit(0.0)), 4))
        .where(col("dist_km") <= 3000.0)
        .select(col("c_custkey"), col("dist_km"))
        .orderBy(col("c_custkey"))
    }),
    "q_geo_bbox" -> ((s, d) => withGeo(t(s, d, "customer"))
      .where(Relational.geoBoundingBox(col("lat"), col("lon"), 40.0, -60.0, -30.0, 90.0))
      .select(col("c_custkey"), col("lat"), col("lon"))
      .orderBy(col("c_custkey"))),

    // ---- F. LLM-data-pipeline ----
    "q_dedup_exact" -> ((s, d) => Dedup.exactDuplicates(Tables.events(s, d), "event_id", "props")),
    "q_dedup_minhash" -> ((s, d) => Dedup.minhashLsh(t(s, d, "documents"), "doc_id", "text", 0.8)),
    // cluster-level dedup: connected components over the verified pairs
    "q_dedup_cluster" -> ((s, d) =>
      Dedup.dedupClusters(Dedup.minhashLshUnsorted(t(s, d, "documents"), "doc_id", "text", 0.8))),
    // canonical selection: per cluster keep the BEST member by quality
    // (one max_by partial agg over the tiny cluster frame)
    "q_dedup_canonical" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.canonicalPerCluster(
        Dedup.dedupClusters(Dedup.minhashLshUnsorted(docs, "doc_id", "text", 0.8)),
        docs, "doc_id", "n_chars")
    }),
    // incremental dedup: new docs (odd ids) dropped when near-dupping
    // an existing (even-id) doc — the daily-ingestion keep set
    "q_dedup_incremental" -> ((s, d) =>
      Dedup.dedupIncrementalNewIds(t(s, d, "documents"), "doc_id", "text",
        pmod(col("doc_id"), lit(2L)) === 1L, 0.8)),
    // exact substring-duplication screen (the published stride-1
    // window form): any 20-token span appearing >1x in the corpus
    // marks its positions; per-doc duplicated-span ratio
    "q_dedup_substring" -> ((s, d) =>
      graft.text.TextAnalysis.substringDupSpans(
        t(s, d, "documents"), "doc_id", "text", k = 20)),
    // bloom-screened membership dedup: seen-side filter broadcast
    // (MB at 10^10 docs), map-side prune, exact verify — output is
    // exactly batch ANTI JOIN seen, so the oracle is hash-exact;
    // overlapping id ranges make the screen drop real rows
    "q_dedup_bloom" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.bloomScreenNew(
        docs.where(col("doc_id") >= 200),
        docs.where(col("doc_id") < 300),
        "doc_id", "text", expectedSeen = 1000L, fpp = 0.01)
    }),
    // temperature-2 mix flattening: deterministic per-source keep
    // rates sqrt(n_min/n_s), content-hash draws
    "q_mix_sample" -> ((s, d) =>
      graft.text.TextAnalysis.mixSample(t(s, d, "documents"), "source", "doc_id")),
    // CCNet-style line-level boilerplate dedup: per-source header + a
    // corpus-wide footer wrapped around each body; lines shared by > 4
    // docs are machinery and get stripped, bodies survive in order
    "q_dedup_lines" -> ((s, d) => {
      val docs = t(s, d, "documents").withColumn("page",
        concat(lit("home | about | "), col("source"), lit("\n"),
          col("text"), lit("\ncopyright 2024 example.com")))
      Dedup.dedupLines(docs, "doc_id", "page", maxDocs = 4)
        .select(col("doc_id"), col("n_lines"), md5(col("text_clean")).as("h"))
        .orderBy(col("doc_id"))
    }),
    "q_dedup_simhash" -> ((s, d) => Dedup.simhashPairs(t(s, d, "documents"), "doc_id", "text", 3)),
    "q_dedup_ngram" -> ((s, d) =>
      Dedup.ngramJaccardTopK(t(s, d, "documents").where(col("source") === "src0"), "doc_id", "text", 20)),
    // blocking key COMPUTED from the vector (SRP buckets), not assumed
    // from a label column — the unlabeled-corpus scale path (r8)
    "q_dedup_embed" -> ((s, d) =>
      Dedup.embeddingTopKPairsLsh(t(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, k = 20)),
    // the labeled-block variant stays covered under its own key
    "q_dedup_embed_block" -> ((s, d) =>
      Dedup.embeddingTopKPairs(t(s, d, "embeddings"), "vec_id", "embedding", "label", 20)),
    "q_ann_brute" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Ann.bruteForceTopK(e, e.where(col("vec_id") < 5), "vec_id", "embedding", 10)
    }),
    "q_ann_lsh" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Ann.lshTopK(e, e.where(col("vec_id") < 5), "vec_id", "embedding", dim = 64, k = 10)
    }),
    "q_ann_ivf" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Ann.ivfTopK(e, e.where(col("vec_id") < 5), "vec_id", "embedding",
        nCentroids = 16, nprobe = 4, k = 10)
    }),
    // _explain for a knn hit: dot / norms / cosine breakdown for one
    // (query vector, document) pair
    "q_explain_knn" -> ((s, d) =>
      Ann.explainKnn(t(s, d, "embeddings"), "vec_id", "embedding",
        ScriptQv, docId = 42L)),
    // graph ANN (the HNSW family, ES's actual knn index): one NSW
    // graph per partition (= per Lucene segment), beam-searched per
    // query, merged top-k; recall@10 asserted in-plan vs brute force
    "q_ann_hnsw" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Ann.hnswRecallProbe(e, e.where(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, minRecall = 0.9)
    }),
    // ingest kv processor at read time: str_to_map split, map lookups
    // feed a normal agg — all inside one codegen'd projection
    "q_ingest_kv" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("kvs",
        concat(lit("t="), col("event_type"), lit(";u="), pmod(col("user_id"), lit(7L))))
      graft.sources.IngestPipeline.compile(
        """{"processors": [{"kv": {"field": "kvs", "field_split": ";", "value_split": "="}}]}""")(ev)
        .select(element_at(col("kvs"), "t").as("t"),
          element_at(col("kvs"), "u").cast("long").as("u"))
        .groupBy(col("t"), col("u")).agg(count(lit(1)).as("n"))
        .orderBy(col("t"), col("u"))
    }),
    // ingest json processor: schema-free props -> map<string,string>,
    // typed downstream by the consumer
    "q_ingest_json" -> ((s, d) =>
      graft.sources.IngestPipeline.compile(
        """{"processors": [{"json": {"field": "props", "target_field": "pj"}}]}""")(
        Tables.events(s, d))
        .select(col("event_type"), element_at(col("pj"), "k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(min(col("k")).as("kmin"), max(col("k")).as("kmax"))
        .orderBy(col("event_type"))),
    // ingest on_failure: mixed clean/failing values — failures tag
    // `err` via the handler chain, clean rows convert; one aggregate
    // proves the per-row routing at scale
    "q_ingest_fail" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("mn",
        when(pmod(col("user_id"), lit(3L)) === 0, col("value").cast("string"))
          .otherwise(col("event_type")))
      graft.sources.IngestPipeline.compile(
        """{"processors": [{"convert": {"field": "mn", "type": "double",
           "on_failure": [{"set": {"field": "err", "value": "parse_error"}}]}}]}""")(ev)
        .groupBy(coalesce(col("err"), lit("ok")).as("err"))
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("mn"), lit(0.0)).cast("decimal(18,4)"))
            .cast("double").as("total"))
        .orderBy(col("err"))
    }),
    "q_pipeline_clean" -> ((s, d) => {
      // composed cleaning pipeline: quality gate + near-dup removal
      // (drop the higher id of each verified near-dup pair)
      val docs = t(s, d, "documents")
      // unsorted pair core: the anti-join reshuffles anyway
      val dups = Dedup.minhashLshUnsorted(docs, "doc_id", "text", 0.8)
        .select(col("id2").as("doc_id"))
      TextAnalysis.qualityScore(col("text"))(docs)
        .where(col("quality") >= 0.45 && col("n_chars") >= 100)
        .join(dups, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("quality"))
        .orderBy(col("doc_id"))
    }),
    "q_lang_id" -> ((s, d) => {
      val (pl, ps) = TextAnalysis.languageId(col("text"))
      t(s, d, "documents")
        .select(col("doc_id"), pl.as("pred_lang"), ps.as("lang_score"))
        .orderBy(col("doc_id"))
    }),
    "q_quality" -> ((s, d) =>
      TextAnalysis.qualityScore(col("text"))(t(s, d, "documents"))
        .select(col("doc_id"), col("n_tokens"), col("punct_ratio"),
          col("stopword_ratio"), col("ttr"), col("quality"))
        .orderBy(col("doc_id"))),
    "q_tokens" -> ((s, d) => {
      val cs = TextAnalysis.tokenCounts(col("text"))
      t(s, d, "documents")
        .select(col("doc_id") +: cs.map { case (n, c) => c.as(n) }: _*)
        .orderBy(col("doc_id"))
    }),
    "q_fingerprint" -> ((s, d) => t(s, d, "documents")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))),
    "q_keywords" -> ((s, d) =>
      TextAnalysis.keywordsTopK(t(s, d, "documents"), "doc_id", "text", 3)),
    "q_pii" -> ((s, d) => {
      val sig = TextAnalysis.piiSignals(col("text"))
      t(s, d, "documents")
        .select(col("doc_id") +: sig.map { case (n, c) => c.as(n) }: _*)
        .orderBy(col("doc_id"))
    }),
    // training-batch sequence packing, group-local (parallel) windows
    "q_pack" -> ((s, d) =>
      TextAnalysis.packSequences(t(s, d, "documents"), "doc_id", col("n_chars"), "source", 5000L)
        .groupBy(col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("size")).as("pack_chars"))
        .orderBy(col("pack_id"))),
    "q_multimodal_meta" -> ((s, d) =>
      Multimodal.metadata(Multimodal.mediaTable(t(s, d, "documents")))),
    // context-window chunking: 64-token windows, 16-token overlap
    "q_chunk" -> ((s, d) =>
      TextAnalysis.chunkTokens(t(s, d, "documents"), "doc_id", "text", 64, 16)
        .orderBy(col("id"), col("chunk_idx"))),
    // deterministic data-mixing sample: per-language keep rates
    "q_sample_strat" -> ((s, d) =>
      TextAnalysis.stratifiedSample(t(s, d, "documents"), "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 0.2), defaultRate = 0.1)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),
    // benchmark-contamination screen: corpus (id >= 25) vs eval set (id < 25)
    "q_contamination" -> ((s, d) => {
      val docs = t(s, d, "documents")
      TextAnalysis.contaminationScreen(
        docs.where(col("doc_id") >= 25), "doc_id", "text",
        docs.where(col("doc_id") < 25), "text")
    }),
    "q_pii_redact" -> ((s, d) => t(s, d, "documents")
      .select(col("doc_id"), TextAnalysis.redactPii(col("text")).as("redacted"))
      .orderBy(col("doc_id"))),
    "q_repetition" -> ((s, d) => t(s, d, "documents")
      .select(col("doc_id"), TextAnalysis.repetitionRatio(col("text")).as("rep_ratio"))
      .orderBy(col("doc_id"))),
    // sub-document duplication: share of 32-token chunks repeated
    // anywhere in the corpus (C4/RefinedWeb-style signal)
    "q_dedup_paragraph" -> ((s, d) =>
      TextAnalysis.paragraphDupRatio(t(s, d, "documents"), "doc_id", "text", 32)),
    // unigram-LM mean surprisal (cheap perplexity-filter stand-in)
    "q_lm_score" -> ((s, d) =>
      TextAnalysis.unigramSurprisal(t(s, d, "documents"), "doc_id", "text")),
    // domain-mix rebalancing weights toward a uniform source mix
    "q_domain_mix" -> ((s, d) =>
      TextAnalysis.domainMixWeights(t(s, d, "documents"), "source")),

    // ---- G. Streaming-shaped ----
    "q_stream_window" -> ((s, d) => EventStreams.hourlyTypeCounts(Tables.events(s, d))),
    // _downsample: the time-series index aggregated to 1-day buckets
    "q_downsample" -> ((s, d) =>
      graft.sources.Downsample.downsample(
        Tables.events(s, d), "ts_ns", 86400L * 1000000000L, Seq("event_type"), "value")
        .select(col("bucket_ts"), col("event_type"), col("doc_count"),
          col("value_min"), col("value_max"),
          graft.util.Num.round(col("value_sum").cast("double"), 4).as("value_sum"))
        .orderBy(col("bucket_ts"), col("event_type"))),
    // rollup search: downsampled HISTORIC + raw RECENT merged without
    // double counting — must equal the all-raw aggregation (the oracle
    // aggregates raw directly; only the Spark path goes through the
    // split + associative merge)
    "q_rollup_search" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val splitNs = 1706745600000000000L // 2024-02-01T00:00:00Z
      val rolled = graft.sources.Downsample.downsample(
        ev.where(col("ts_ns") < splitNs), "ts_ns",
        86400L * 1000000000L, Seq("event_type"), "value")
      graft.sources.Downsample.rollupSearch(
        rolled, ev.where(col("ts_ns") >= splitNs), "ts_ns",
        86400L * 1000000000L, Seq("event_type"), "value")
        .select(col("bucket_ts"), col("event_type"), col("doc_count"),
          col("value_min"), col("value_max"),
          graft.util.Num.round(col("value_sum").cast("double"), 4).as("value_sum"))
        .orderBy(col("bucket_ts"), col("event_type"))
    }),
    "q_sessionize" -> ((s, d) => EventStreams.sessionize(Tables.events(s, d), 30)),
    "q_props_json" -> ((s, d) => EventStreams.propsField(Tables.events(s, d), "k")),

    // ---- r7 additions ----
    // Painless while: data-independent trip count (6 Newton sqrt
    // steps) unrolls at compile time — whole-stage codegen, no
    // interpreter, no recursion in the plan
    "q_script_while" -> ((s, d) => Search.scriptScoreTopK(
      t(s, d, "documents"), "doc_id", query = lit(true),
      script = "def x = doc['n_chars'].value; def g = 100.0; def i = 0; " +
        "while (i < 6) { g = (g + x / g) / 2.0; i = i + 1 } return g",
      params = Map.empty, k = 12)),
    // function_score random_score: seeded reproducible shuffle
    "q_function_random" -> ((s, d) => t(s, d, "documents")
      .select(col("doc_id").as("id"),
        Num.round(Search.randomScore(col("doc_id"), 42L), 6).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(20)),
    // full function_score: filtered functions combined per score_mode
    // (max), folded into the base per boost_mode (multiply), max_boost
    // cap — inline predicates, zero joins
    "q_function_modes" -> ((s, d) => t(s, d, "documents")
      .select(col("doc_id").as("id"),
        Num.round(Search.functionScoreModes(
          base = lit(1.0),
          functions = Seq(
            (col("lang") === "en", log(lit(1.0) + col("n_chars") * lit(0.01)), 2.0),
            (col("source") === "src3", lit(1.0), 3.0),
            (col("n_chars") > 400, sqrt(col("n_chars").cast("double")), 0.1)),
          scoreMode = "max", boostMode = "multiply", maxBoost = 5.0), 4).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(25)),
    // post_filter: aggregations see the QUERY hits; the hit list is
    // additionally narrowed — bucket counts computed BEFORE the
    // narrowing ride back in on a broadcast join
    "q_post_filter" -> ((s, d) => {
      val hits = t(s, d, "documents").where(col("n_chars") >= 200)
      val langCounts = hits.groupBy(col("lang")).agg(count(lit(1)).as("lang_hits"))
      hits.where(col("source") === "src1")
        .join(broadcast(langCounts), "lang")
        .select(col("doc_id"), col("lang"), col("lang_hits"))
        .orderBy(col("doc_id"))
    }),
    // sliced scroll: slice {id: 1, max: 4} — disjoint deterministic
    // hash partitions; each export worker scans only its slice and the
    // union of slices is exactly the full export
    // _count API: pushed-down predicate + one partial-agg count
    "q_count" -> ((s, d) => graft.sources.Connector.countQuery(
      t(s, d, "documents"),
      """{"bool": {"must": [{"term": {"lang": "en"}}, {"range": {"n_chars": {"gte": 200}}}]}}""",
      "doc_id")),
    // _source response filtering: includes/excludes with wildcards,
    // pruned out of the scan by Catalyst
    "q_source_filter" -> ((s, d) => graft.dsl.SearchBody.applySourceFilter(
      t(s, d, "documents").where(col("lang") === "en"),
      """{"includes": ["doc_id", "n_*", "s*"], "excludes": ["source"]}""")
      .orderBy(col("doc_id"))),
    "q_slice" -> ((s, d) => t(s, d, "documents")
      .where(pmod(conv(substring(md5(concat(lit("slice:"), col("doc_id"))), 1, 12), 16, 10)
        .cast("long"), lit(4L)) === 1L)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))),
    // chained rescorers (ES takes a LIST): stage 2 re-ranks only
    // stage 1's window — each stage is a broadcast join, the corpus
    // is scanned once by the first-pass BM25
    "q_rescore_multi" -> ((s, d) => Search.rescoreChainTopK(
      t(s, d, "documents"), "doc_id", "text", "fast hash join",
      stages = Seq(
        (log(lit(1.0) + col("n_chars")), 50, 1.0, 0.5),
        ((col("lang") === "en").cast("double"), 20, 1.0, 2.0)),
      k = 10)),
    // two-phase quantized knn (ES 8.18 rescore_vector.oversample):
    // the int8 index ranks a coarse 4x window, raw vectors rescore
    "q_knn_rescore" -> ((s, d) =>
      graft.sim.Ann.knnRescoreTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        ScriptQv, k = 10, oversample = 4)),
    // ES 8.16 BBQ (1-bit binary quantization): coarse asymmetric
    // dot(q, sign(v)) from TWO PACKED LONGS per doc, oversampled
    // window rescored with exact cosine — the 32x-compressed storage
    // path beyond int8
    "q_knn_bbq" -> ((s, d) =>
      graft.sim.Ann.bbqTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        ScriptQv, k = 10, oversample = 4)),
    // ip_range agg over the synthetic ip column (from-inclusive,
    // to-exclusive, unbounded sides open; one scan, N count_ifs)
    "q_agg_ip_range" -> ((s, d) => Aggs.ipRange(withIp(Tables.events(s, d)), "ip",
      Seq(("low", None, Some("10.64.0.0")),
        ("mid", Some("10.64.0.0"), Some("10.192.0.0")),
        ("high", Some("10.192.0.0"), None)))),
    // ip_prefix agg: /12 network buckets via integer mask math
    "q_agg_ip_prefix" -> ((s, d) => Aggs.ipPrefix(withIp(Tables.events(s, d)), "ip", 12)),
    // _transform pivot (one-shot): group_by + aggs, flat dest table
    "q_transform_pivot" -> ((s, d) =>
      graft.streaming.Transforms.pivot(Tables.events(s, d), "event_type", "value")
        .select(col("event_type"), col("doc_count"),
          Num.round(col("value_sum"), 4).as("value_sum"), col("value_max"))
        .orderBy(col("event_type"))),
    // _transform latest: newest doc per user — ONE max_by groupBy, no
    // window/sort; ordered on µs-truncated time so the oracle (whose
    // parquet reader truncates ns to µs) sees identical sort keys
    "q_transform_latest" -> ((s, d) =>
      graft.streaming.Transforms.latest(
        Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000")),
        "user_id", "ts_us", "event_id", Seq("event_id", "event_type", "value"))
        .orderBy(col("user_id"))),
    // search-body script_fields: per-hit computed outputs evaluated
    // AFTER the query predicate (ES's evaluation point), Painless →
    // codegen'd projections
    "q_script_fields" -> ((s, d) => {
      val body = """{"query": {"range": {"n_chars": {"gt": 400}}},
        "script_fields": {
          "hundreds": {"script": {"source": "doc['n_chars'].value / params.div",
                                  "params": {"div": 100.0}}},
          "mod7": {"script": {"source": "doc['n_chars'].value % 7"}}}}"""
      val sf = graft.dsl.SearchBody.scriptFields(body)
      t(s, d, "documents")
        .where(graft.dsl.QueryDslJson.compile("""{"range": {"n_chars": {"gt": 400}}}"""))
        .select(col("doc_id") +: sf.map { case (n, c) => Num.round(c, 4).as(n) }: _*)
        .orderBy(col("doc_id"))
    }),
    // fields API with a date `format`: pattern render + epoch_millis
    "q_fields_format" -> ((s, d) => t(s, d, "orders")
      .where(col("o_totalprice") > 5000)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy/MM/dd").as("od_fmt"),
        // NTZ -> instant is identity under the UTC session zone
        unix_millis(col("o_orderdate").cast("timestamp")).as("od_ms"))
      .orderBy(col("o_orderkey"))),
    // indices_boost: per-index score multiplier — the lang partitions
    // act as the boosted indices; broadcast of the scored postings
    "q_indices_boost" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val scored = Search.bm25Scores(docs, "doc_id", "text", "fast hash join")
      docs.join(broadcast(scored), col("doc_id") === scored("id"))
        .select(scored("id"),
          Num.round(scored("score") *
            when(col("lang") === "en", 2.0).otherwise(1.0), 4).as("score"))
        .orderBy(col("score").desc, col("id").asc)
        .limit(15)
    }),
    // multi-term highlight with number_of_fragments
    "q_highlight_fragments" -> ((s, d) =>
      Search.highlightFragments(t(s, d, "documents"), "doc_id", "text",
        "fast hash", numFragments = 2)),
    // highlight order:score — fragments ranked by contained-term idf
    // sum (FVH mode), not term order
    "q_highlight_order" -> ((s, d) =>
      Search.highlightFragmentsByScore(t(s, d, "documents"), "doc_id", "text",
        "fast hash join", numFragments = 2)),
    // fuzzy completion suggester: typed prefix within 1 DL edit
    // ("rsc1" reaches "src1..." via one transposition)
    "q_suggest_fuzzy" -> ((s, d) =>
      Search.suggestCompletionFuzzy(t(s, d, "documents"), "source", "n_chars",
        prefix = "rsc1", fuzziness = 1, k = 5)),
    // multiple knn clauses in one search: per-clause windows, summed
    // similarities on the merged hits
    "q_knn_multi" -> ((s, d) =>
      graft.sim.Ann.knnMultiTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        Seq((ScriptQv, 20), (ScriptQv2, 20)), k = 10)),
    // nested query with score_mode: parent relevance folds matching
    // child scores (integral l_quantity keeps the fold order-exact)
    "q_nested_score" -> ((s, d) =>
      Relational.nestedScore(t(s, d, "orders"), t(s, d, "lineitem"),
        "o_orderkey", "l_orderkey", col("l_quantity") > 45,
        col("l_quantity"), "avg")
        .select(col("o_orderkey"), col("score"))
        .orderBy(col("o_orderkey"))),
    // query rules (8.15 rule retriever): pinned + excluded ids over an
    // organic BM25 retriever
    "q_retriever_rule" -> ((s, d) =>
      Search.ruleTopK(t(s, d, "documents"), "doc_id", "text", "fast hash join",
        pinned = Seq(42L, 7L), excluded = Seq(11L, 13L), k = 10)),
    // geo_grid QUERY (not the agg): docs inside one geohash cell —
    // the cell of customer 1's location, precision 2
    "q_geo_grid_query" -> ((s, d) => {
      val g = withGeo(t(s, d, "customer"))
      val key = org.apache.spark.sql.GraftBridge.column(graft.expr.GeoHash(
        org.apache.spark.sql.GraftBridge.expression(col("lat").cast("double")),
        org.apache.spark.sql.GraftBridge.expression(col("lon").cast("double")), 2))
      g.where(key === lit(GeoGridQueryCell))
        .select(col("c_custkey"), col("lat"), col("lon"))
        .orderBy(col("c_custkey"))
    }),
    // _graph/explore analog: seeded significance-ranked co-occurrence
    // expansion, 2 hops, 5 vertices/hop — one persisted (doc, term)
    // edge frame reused per hop; only top-N vertex lists hit the driver
    "q_graph_explore" -> ((s, d) => graft.search.GraphExplore.explore(
      t(s, d, "documents"), "doc_id", "text", Seq("spark"),
      hops = 2, verticesPerHop = 5, minDocCount = 3)),
    // the `connections` half: doc co-occurrence between vertex pairs
    "q_graph_connections" -> ((s, d) => graft.search.GraphExplore.connections(
      t(s, d, "documents"), "doc_id", "text",
      Seq("spark", "agg", "scan", "merge", "window"), minDocCount = 3)),
    // METRICS command (8.16 TSDS sugar): desugars to FROM + STATS
    "q_esql_metrics" -> ((s, d) => graft.dsl.Esql.run(s, d,
      "metrics events mx = max(value), n = count(*) by event_type | sort event_type")),
    // STATS BY CATEGORIZE(f) (8.18): log-pattern grouping key
    "q_esql_categorize" -> ((s, d) => graft.dsl.Esql.run(s, d,
      "from events | stats n = count(*) by cat = categorize(event_type) | sort cat")),
    // ES|QL IP family: CIDR_MATCH compiles to numeric range
    // predicates (one per block, OR-folded) over the dotted-quad
    "q_esql_cidr" -> ((s, d) => graft.dsl.Esql.run(s, d,
      "from events " +
        "| eval ip = concat(to_string(10), \".\", to_string(user_id * 7 % 256), " +
        "\".\", to_string(user_id * 13 % 256), \".\", to_string(user_id % 256)) " +
        "| where cidr_match(ip, \"10.64.0.0/10\", \"10.192.0.0/12\") " +
        "| stats n = count(*)")),
    // EQL simple event query
    "q_eql_simple" -> ((s, d) => graft.dsl.Eql.run(s, d,
      "error where value > 300")),
    // EQL sequence correlation: the view -> click -> purchase funnel
    // within 24h per user (as-of-join shape, no self-join)
    "q_eql_sequence" -> ((s, d) => graft.dsl.Eql.run(s, d,
      "sequence by user_id with maxspan=24h [view] [click where value > 50] [purchase]")),
    // EQL missing events (8.x): ![error] between the steps — a
    // view->purchase chain only matches when NO error intervened
    "q_eql_missing" -> ((s, d) => graft.dsl.Eql.sequence(
      Tables.events(s, d), "user_id", "ts_ns", "event_id",
      Seq(("view", lit(true)), ("purchase", lit(true))),
      maxspanNs = 24L * 3600 * 1000000000L,
      missing = Seq((0, "error", lit(true))))),
    // EQL sample: unordered correlation, one partial-agg groupBy
    "q_eql_sample" -> ((s, d) => graft.dsl.Eql.run(s, d,
      "sample by user_id [error where value > 200] [purchase where value > 200]")),
    // EQL tail: LAST n matches in sort order (ordered limit over the
    // reversed sort, re-sorted — never a global collect)
    "q_eql_tail" -> ((s, d) => graft.dsl.Eql.run(s, d,
      "purchase where value > 100 | tail 5")),
    // EQL `with runs=2`: the step repeats — two successive qualifying
    // clicks must follow the view. Expansion to duplicate-type steps
    // rides on the per-level match flags (one event can extend a
    // different chain per level, never two slots of one chain).
    "q_eql_runs" -> ((s, d) => graft.dsl.Eql.run(s, d,
      "sequence by user_id with maxspan=24h [view] [click where value > 100] with runs=2")),
    // EQL `any` type wildcard + EQL-spelled functions (wildcard →
    // LIKE, stringContains → contains) compiled into the one scan
    "q_eql_funcs" -> ((s, d) => graft.dsl.Eql.run(s, d,
      """any where (wildcard(event_type, "c*", "s?gnup") or stringContains(event_type, "rror")) and value > 300""")),
    // significant_terms with background_filter: uplift measured
    // against a RESTRICTED comparison set (fg kept inside bg so no
    // zero-background terms arise)
    "q_agg_sig_bg" -> ((s, d) =>
      Aggs.significantTerms(t(s, d, "documents"), "text",
        pred = col("lang") === "de" && col("n_chars") > 100,
        minFgCount = 5, k = 10,
        backgroundFilter = col("n_chars") > 100)),
    // has_parent with score: true — children inherit the parent's
    // relevance through one broadcast-eligible join
    "q_has_parent_score" -> ((s, d) =>
      Relational.hasParentScore(t(s, d, "lineitem"), t(s, d, "orders"),
        "o_orderkey", "l_orderkey",
        col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 5000,
        log(lit(1.0) + col("o_totalprice")))
        .select(col("l_orderkey"), col("l_linenumber"), col("score"))
        .orderBy(col("l_orderkey"), col("l_linenumber")))
  )

  def oracleSql: Map[String, String] = Map(
    // ---- A ----
    "q_term" -> "SELECT doc_id, source, n_chars FROM documents WHERE lang = 'en' ORDER BY doc_id",
    "q_terms" -> "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_returnflag IN ('A','R') ORDER BY l_orderkey, l_linenumber",
    "q_range" -> "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice >= 1000 AND o_totalprice < 5000 AND o_orderdate >= TIMESTAMP '1996-01-01' ORDER BY o_orderkey",
    "q_exists" -> "SELECT event_type, count(*)::BIGINT AS n FROM events WHERE value IS NOT NULL AND props IS NOT NULL GROUP BY event_type ORDER BY event_type",
    "q_prefix" -> "SELECT p_partkey, p_type FROM part WHERE p_type LIKE 'ECO%' ORDER BY p_partkey",
    "q_wildcard" -> "SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority LIKE '%-HIGH' ORDER BY o_orderkey",
    "q_regexp" -> "SELECT doc_id, source FROM documents WHERE regexp_matches(source, '^(?:src1[0-9])$') ORDER BY doc_id",
    "q_ids" -> "SELECT doc_id, lang FROM documents WHERE doc_id IN (3, 7, 11, 19) ORDER BY doc_id",
    "q_bool" -> ("SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' " +
      "AND (l_returnflag = 'A' OR l_linestatus = 'F') AND NOT (l_quantity > 45) ORDER BY l_orderkey, l_linenumber"),
    "q_bool_msm" -> ("SELECT doc_id, lang, source, n_chars FROM documents WHERE " +
      "(CASE WHEN lang = 'en' THEN 1 ELSE 0 END + CASE WHEN source LIKE 'src1%' THEN 1 ELSE 0 END + " +
      "CASE WHEN n_chars > 300 THEN 1 ELSE 0 END) >= 2 ORDER BY doc_id"),
    "q_fuzzy" -> "SELECT doc_id, source FROM documents WHERE levenshtein(source, 'src12') <= 1 ORDER BY doc_id",
    "q_fuzzy_damerau" -> ("SELECT doc_id, source FROM documents " +
      "WHERE damerau_levenshtein(source, 'rsc3') <= 2 ORDER BY doc_id"),
    "q_intervals_filter" -> (TokCte + ", p AS (SELECT doc_id, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'hash') AS ph, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'join') AS pj, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'table') AS pt FROM tok) " +
      "SELECT doc_id FROM p WHERE len(list_filter(ph, a -> len(list_filter(pj, " +
      "b -> b > a AND b - a <= 4 AND len(list_filter(pt, t -> t > a AND t < b)) = 0)) > 0)) > 0 " +
      "ORDER BY doc_id"),
    "q_intervals" -> (TokCte + ", p AS (SELECT doc_id, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'hash') AS ph, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'merge') AS pm, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'join') AS pj FROM tok) " +
      "SELECT doc_id FROM p WHERE " +
      "len(list_filter(ph, a -> len(list_filter(pj, b -> b > a AND b - a <= 3)) > 0)) > 0 OR " +
      "len(list_filter(pm, a -> len(list_filter(pj, b -> b > a AND b - a <= 3)) > 0)) > 0 " +
      "ORDER BY doc_id"),
    "q_term_ci" -> ("SELECT doc_id, lang, source FROM documents " +
      "WHERE lower(lang) = 'en' AND lower(source) LIKE 'src1%' ORDER BY doc_id"),
    "q_terms_enum" -> ("SELECT DISTINCT p_name AS term FROM part " +
      "WHERE p_name LIKE 'b%' ORDER BY term LIMIT 12"),

    "q_runtime_fields" -> ("WITH r AS (SELECT lang, CAST(trunc(n_chars / 100.0) AS BIGINT) AS cp " +
      "FROM documents) SELECT lang, count(*)::BIGINT AS n, sum(cp)::BIGINT AS s " +
      "FROM r WHERE cp >= 2 GROUP BY lang ORDER BY lang"),
    "q_dsl_json" -> ("SELECT doc_id, source, n_chars FROM documents WHERE lang = 'en' " +
      "AND (source LIKE 'src1%' OR n_chars > 300) AND NOT (source LIKE 'src_') ORDER BY doc_id"),

    "q_uri_query" -> ("SELECT doc_id, source, n_chars FROM documents WHERE lang = 'en' " +
      "AND (n_chars > 300 OR source LIKE 'src1%') AND NOT source = 'src19' ORDER BY doc_id"),
    "q_uri_plusminus" -> ("SELECT doc_id, source, n_chars FROM documents " +
      "WHERE lang = 'en' AND NOT source = 'src19' ORDER BY doc_id"),
    "q_uri_regex" -> (TokCte + " SELECT d.doc_id, d.lang FROM documents d " +
      "JOIN tok ON tok.doc_id = d.doc_id " +
      "WHERE regexp_full_match(d.lang, '(?:e[nl])') " +
      "AND len(list_filter(tok.toks, t -> regexp_full_match(t, '(?:m.rge)'))) > 0 " +
      "ORDER BY d.doc_id"),
    "q_multi_match_cross" -> (TokCte +
      ", xtok AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text || ' ' || source), '[^a-z0-9]+'), x -> len(x) > 0) AS toks FROM documents)" +
      bm25Ctes("x", "xtok", Seq("merge", "src3")) +
      " SELECT id, score FROM scx JOIN xtok ON xtok.doc_id = scx.id " +
      "WHERE list_has_all(xtok.toks, ['merge', 'src3']) " +
      "ORDER BY score DESC, id LIMIT 10"),
    "q_uri_fuzzy" -> (TokCte.replace("FROM documents", "FROM documents WHERE lang = 'en'") +
      " SELECT doc_id FROM tok WHERE len(list_filter(toks, t -> levenshtein(t, 'spak') <= 1)) > 0 ORDER BY doc_id"),
    "q_uri_default_and" -> (TokCte +
      " SELECT doc_id FROM tok WHERE list_has_all(toks, ['merge','sort']) ORDER BY doc_id"),
    "q_uri_boost" -> (TokCte + STokCte +
      bm25Ctes("1", "tok", Seq("merge", "src5")) +
      bm25Ctes("2", "stok", Seq("merge", "src5")) +
      ", u AS (SELECT id, score * 2.0 AS s FROM sc1 UNION ALL SELECT id, score * 1.0 FROM sc2) " +
      "SELECT id, round(sum(s), 4) AS score FROM u GROUP BY id ORDER BY score DESC, id LIMIT 10"),
    "q_multi_match" -> (TokCte + STokCte +
      bm25Ctes("1", "tok", Seq("merge", "src5")) +
      bm25Ctes("2", "stok", Seq("merge", "src5")) +
      ", u AS (SELECT id, score AS s FROM sc1 UNION ALL SELECT id, score FROM sc2) " +
      "SELECT id, round(max(s), 4) AS score FROM u GROUP BY id ORDER BY score DESC, id LIMIT 10"),
    "q_rank_feature_log" -> ("SELECT doc_id AS id, round(2.5 * ln(1.0 + n_chars), 4) AS score " +
      "FROM documents ORDER BY score DESC, id LIMIT 15"),
    "q_rank_feature_sigmoid" -> ("SELECT doc_id AS id, " +
      "round(pow(n_chars, 2.0) / (pow(n_chars, 2.0) + pow(300.0, 2.0)), 4) AS score " +
      "FROM documents ORDER BY score DESC, id LIMIT 15"),
    "q_dis_max" -> (TokCte + STokCte +
      bm25Ctes("1", "tok", Seq("merge", "src5")) +
      bm25Ctes("2", "stok", Seq("merge", "src5")) +
      ", u AS (SELECT id, score AS s FROM sc1 UNION ALL SELECT id, score FROM sc2) " +
      "SELECT id, round(max(s) + 0.3 * (sum(s) - max(s)), 4) AS score FROM u " +
      "GROUP BY id ORDER BY score DESC, id LIMIT 10"),
    "q_multi_match_phrase" -> (TokCte + STokCte +
      bm25Ctes("1", "tok", Seq("table", "scan")) +
      bm25Ctes("2", "stok", Seq("table", "scan")) +
      ", g1 AS (SELECT doc_id FROM tok WHERE contains(' ' || array_to_string(toks, ' ') || ' ', ' table scan ')), " +
      "g2 AS (SELECT doc_id FROM stok WHERE contains(' ' || array_to_string(toks, ' ') || ' ', ' table scan ')), " +
      "u AS (SELECT id, score AS s FROM sc1 WHERE id IN (SELECT doc_id FROM g1) " +
      "UNION ALL SELECT id, score FROM sc2 WHERE id IN (SELECT doc_id FROM g2)) " +
      "SELECT id, round(max(s), 4) AS score FROM u GROUP BY id ORDER BY score DESC, id LIMIT 10"),
    "q_distance_feature" -> (GeoCte + " SELECT c_custkey AS id, " +
      "round(1000.0 / (1000.0 + 2 * 6371 * asin(sqrt(pow(sin(radians(10.0 - lat) / 2), 2) + " +
      "cos(radians(lat)) * cos(radians(10.0)) * pow(sin(radians(20.0 - lon) / 2), 2)))), 4) AS score " +
      "FROM g ORDER BY score DESC, id LIMIT 15"),
    "q_wrapper" -> ("SELECT doc_id, n_chars FROM documents " +
      "WHERE lang = 'en' AND n_chars >= 200 ORDER BY doc_id"),
    "q_geo_polygon" -> geoPolygonOracleSql(GeoPolygonVertices),
    "q_span_near" -> (TokCte + ", pos AS (SELECT doc_id, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'join') AS p1, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'hash') AS p2 FROM tok) " +
      "SELECT doc_id FROM pos WHERE len(p1) > 0 AND len(p2) > 0 AND " +
      "len(list_filter(p1, i -> len(list_filter(p2, j -> greatest(i, j) - least(i, j) + 1 - 2 <= 3)) > 0)) > 0 " +
      "ORDER BY doc_id"),
    "q_terms_set" -> (TokCte + " SELECT doc_id FROM tok " +
      "WHERE len(list_intersect(list_distinct(toks), ['merge', 'hash', 'scan'])) >= 2 " +
      "ORDER BY doc_id"),
    // (hash AND join) OR (phrase("merge batch") AND NOT slow)
    "q_simple_query_string" -> (TokCte + " SELECT doc_id FROM tok WHERE " +
      "(list_contains(toks, 'hash') AND list_contains(toks, 'join')) OR " +
      "(contains(' ' || array_to_string(toks, ' ') || ' ', ' merge batch ') " +
      "AND NOT list_contains(toks, 'slow')) ORDER BY doc_id"),
    "q_match_bool_prefix" -> (TokCte + " SELECT doc_id FROM tok WHERE " +
      "list_contains(toks, 'merge') AND " +
      "contains(' ' || array_to_string(toks, ' ') || ' ', ' bat') ORDER BY doc_id"),
    "q_match_msm" -> (TokCte + " SELECT doc_id FROM tok WHERE " +
      "(list_contains(toks, 'spark')::INT + list_contains(toks, 'window')::INT + " +
      "list_contains(toks, 'merge')::INT + list_contains(toks, 'batch')::INT) >= 2 " +
      "ORDER BY doc_id"),
    "q_agg_sig_text" -> (
      s"WITH s AS (SELECT doc_id, text FROM documents WHERE lang = 'en' AND ${hexFold("doc_id::VARCHAR", 12)} / 281474976710656.0 < 0.5), " +
      "d AS (SELECT text FROM (SELECT text, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM s) WHERE rn = 1), " +
      "ft AS (SELECT unnest(list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0))) AS term FROM d), " +
      "fc AS (SELECT term, count(*)::BIGINT AS fg_count FROM ft GROUP BY 1), " +
      "bt AS (SELECT unnest(list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0))) AS term FROM documents), " +
      "bc AS (SELECT term, count(*)::BIGINT AS bg_count FROM bt GROUP BY 1), " +
      "tot AS (SELECT (SELECT count(*) FROM d)::DOUBLE AS fg_total, (SELECT count(*) FROM documents)::DOUBLE AS bg_total) " +
      "SELECT term, fg_count, bg_count, " +
      "round((fg_count / fg_total) * ln((fg_count / fg_total) / (bg_count / bg_total)), 4) AS score " +
      "FROM fc JOIN bc USING (term) CROSS JOIN tot WHERE fg_count >= 5 " +
      "ORDER BY score DESC, term LIMIT 10"),
    "q_combined_fields" -> (TokCte + STokCte +
      " SELECT t.doc_id FROM tok t JOIN stok s USING (doc_id) WHERE " +
      "(list_contains(t.toks, 'hash') OR list_contains(s.toks, 'hash')) AND " +
      "(list_contains(t.toks, 'src3') OR list_contains(s.toks, 'src3')) " +
      "ORDER BY t.doc_id"),
    // vector-term OR unordered window(join, hash, slop 1)
    "q_span_or" -> (TokCte + ", pos AS (SELECT doc_id, toks, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'join') AS p1, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'hash') AS p2 FROM tok) " +
      "SELECT doc_id FROM pos WHERE list_contains(toks, 'vector') OR " +
      "(len(p1) > 0 AND len(p2) > 0 AND " +
      "len(list_filter(p1, i -> len(list_filter(p2, j -> greatest(i, j) - least(i, j) + 1 - 2 <= 1)) > 0)) > 0) " +
      "ORDER BY doc_id"),
    "q_span_not" -> (TokCte + ", pos AS (SELECT doc_id, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'vector') AS pinc, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'join') AS pexc FROM tok) " +
      "SELECT doc_id FROM pos WHERE len(list_filter(pinc, " +
      "p -> len(list_filter(pexc, q -> q >= p - 3 AND q <= p + 3)) = 0)) > 0 " +
      "ORDER BY doc_id"),
    "q_span_within" -> (TokCte + ", pos AS (SELECT doc_id, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'hash') AS p0, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'fast') AS p1, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'join') AS p2 FROM tok) " +
      "SELECT doc_id FROM pos WHERE len(list_filter(p1, i -> len(list_filter(p2, " +
      "j -> greatest(i, j) - least(i, j) - 1 <= 6 AND len(list_filter(p0, " +
      "k -> k >= least(i, j) AND k <= greatest(i, j))) > 0)) > 0)) > 0 ORDER BY doc_id"),
    "q_span_containing" -> (TokCte + ", pos AS (SELECT doc_id, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'vector') AS p0, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'fast') AS p1, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'hash') AS p2 FROM tok) " +
      "SELECT doc_id FROM pos WHERE len(list_filter(p1, i -> len(list_filter(p2, " +
      "j -> greatest(i, j) - least(i, j) - 1 <= 8 AND len(list_filter(p0, " +
      "k -> k >= least(i, j) AND k <= greatest(i, j))) > 0)) > 0)) > 0 ORDER BY doc_id"),
    "q_mtermvectors" -> (TokCte + ", doc AS (SELECT doc_id AS id, unnest(toks) AS term FROM tok WHERE doc_id IN (7, 42)), " +
      "dtf AS (SELECT id, term, count(*)::BIGINT AS term_freq FROM doc GROUP BY id, term), " +
      "corpus AS (SELECT doc_id, unnest(toks) AS term FROM tok), " +
      "st AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS doc_freq, count(*)::BIGINT AS ttf " +
      "FROM corpus WHERE term IN (SELECT DISTINCT term FROM dtf) GROUP BY term) " +
      "SELECT id, term, term_freq, doc_freq, ttf FROM dtf JOIN st USING (term) ORDER BY id, term"),
    "q_termvectors" -> (TokCte + ", doc AS (SELECT unnest(toks) AS term FROM tok WHERE doc_id = 42), " +
      "dtf AS (SELECT term, count(*)::BIGINT AS term_freq FROM doc GROUP BY term), " +
      "corpus AS (SELECT doc_id, unnest(toks) AS term FROM tok), " +
      "st AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS doc_freq, count(*)::BIGINT AS ttf " +
      "FROM corpus WHERE term IN (SELECT term FROM dtf) GROUP BY term) " +
      "SELECT term, term_freq, doc_freq, ttf FROM dtf JOIN st USING (term) ORDER BY term"),
    "q_hybrid_linear" -> (TokCte + bm25Ctes("", "tok", Seq("fast", "hash", "join")) +
      ", e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
      "q AS (SELECT list_transform(range(0, 64), i -> (i * 37 % 100) / 100.0 - 0.5) AS qv), " +
      "n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e), " +
      "qn AS (SELECT qv, sqrt(list_reduce(list_prepend(0.0, list_transform(qv, x -> x * x)), (a, b) -> a + b)) AS qnrm FROM q), " +
      "sem AS (SELECT vec_id AS id, " +
      "round(list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])), (x, y) -> x + y) / (nrm * qnrm), 4) AS score " +
      "FROM n CROSS JOIN qn), " +
      "wl AS (SELECT id, score FROM sc ORDER BY score DESC, id LIMIT 50), " +
      "ws AS (SELECT id, score FROM sem ORDER BY score DESC, id LIMIT 50), " +
      "ml AS (SELECT min(score) AS mn, max(score) AS mx FROM wl), " +
      "ms AS (SELECT min(score) AS mn, max(score) AS mx FROM ws), " +
      "u AS (SELECT id, (CASE WHEN mx > mn THEN (score - mn) / (mx - mn) ELSE 1.0 END) * 0.7 AS c FROM wl CROSS JOIN ml " +
      "UNION ALL SELECT id, (CASE WHEN mx > mn THEN (score - mn) / (mx - mn) ELSE 1.0 END) * 0.3 AS c FROM ws CROSS JOIN ms) " +
      "SELECT id, round(sum(c), 4) AS linear_score, count(*)::INT AS matched FROM u " +
      "GROUP BY id ORDER BY linear_score DESC, id LIMIT 10"),
    "q_esql_where" -> ("SELECT o_orderkey, round(o_totalprice / 1000.0, 0) AS bucket " +
      "FROM orders WHERE o_totalprice >= 1000 AND o_orderstatus = 'O' " +
      "ORDER BY o_orderkey LIMIT 500"),
    "q_esql_stats" -> ("SELECT l_returnflag, sum(l_quantity) AS sum_qty, " +
      "count(*)::BIGINT AS n, max(l_extendedprice) AS max_p " +
      "FROM lineitem GROUP BY 1 ORDER BY l_returnflag"),
    "q_esql_bucket" -> ("SELECT epoch_ns(ts) - epoch_ns(ts) % 86400000000000 AS day, " +
      "count(*)::BIGINT AS n, round(max(value), 4) AS mx FROM events " +
      "GROUP BY 1 ORDER BY day"),
    "q_esql_match" -> (TokCte.replace(
      "SELECT doc_id, list_filter", "SELECT doc_id, lang, list_filter") +
      " SELECT doc_id, lang FROM tok " +
      "WHERE list_has_any(toks, ['spark','window']) AND lang = 'en' ORDER BY doc_id"),
    "q_esql_qstr" -> (TokCte.replace(
      "SELECT doc_id, list_filter", "SELECT doc_id, lang, n_chars, list_filter") +
      " SELECT count(*)::BIGINT AS n, max(n_chars)::BIGINT AS max_chars FROM tok " +
      "WHERE lang = 'en' AND list_contains(toks, 'spark')"),
    "q_esql_eval_agg" -> ("SELECT lang, count(*)::BIGINT AS n, " +
      "round(avg(n_chars / 100), 4) AS avg_k FROM documents " +
      "WHERE lang <> 'xx' GROUP BY 1 ORDER BY lang"),
    "q_esql_enrich" -> ("SELECT n_name, count(*)::BIGINT AS n, " +
      "round(sum(c_acctbal), 2) AS acct FROM customer " +
      "LEFT JOIN nation ON c_nationkey = n_nationkey " +
      "GROUP BY 1 ORDER BY n_name"),
    "q_esql_functions" -> ("WITH s AS (SELECT len(string_split(text, ' ')) AS n, " +
      "upper(left(lang, 1)) AS ini FROM documents) " +
      "SELECT ini, count(*)::BIGINT AS c, max(n)::INT AS mx FROM s WHERE n >= 40 " +
      "GROUP BY ini ORDER BY ini"),
    "q_esql_mv" -> ("SELECT doc_id, len(list_distinct(string_split(text, ' ')))::INT AS u, " +
      "list_sort(string_split(text, ' '))[1] AS first, " +
      "list_sort(string_split(text, ' '))[-1] AS last " +
      "FROM documents ORDER BY doc_id LIMIT 200"),
    "q_esql_mv_median" -> ("SELECT vec_id, " +
      "(list_sort(embedding)[32]::DOUBLE + list_sort(embedding)[33]::DOUBLE) / 2.0 AS med " +
      "FROM embeddings ORDER BY vec_id LIMIT 100"),
    // rank 0.75*(64-1) = 47.25 exactly: lo index 48 (1-based), frac .25
    "q_esql_mv_pctl" -> ("SELECT vec_id, " +
      "list_sort(embedding)[48]::DOUBLE + " +
      "(list_sort(embedding)[49]::DOUBLE - list_sort(embedding)[48]::DOUBLE) * 0.25 AS p75 " +
      "FROM embeddings ORDER BY vec_id LIMIT 100"),
    "q_sayt" -> (TokCte + ", g AS (SELECT doc_id, toks, " +
      "list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS sh2, " +
      "list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS sh3 FROM tok) " +
      "SELECT doc_id AS id, (" +
      "list_contains(toks, 'fast')::INT + list_contains(toks, 'hash')::INT + list_contains(toks, 'jo')::INT + " +
      "(CASE WHEN list_contains(sh2, 'fast hash') THEN 2 ELSE 0 END) + " +
      "(CASE WHEN list_contains(sh2, 'hash jo') THEN 2 ELSE 0 END) + " +
      "(CASE WHEN list_contains(sh3, 'fast hash jo') THEN 3 ELSE 0 END) + " +
      "(len(list_filter(toks, t -> starts_with(t, 'jo'))) > 0)::INT) AS score FROM g " +
      "WHERE list_contains(toks, 'fast') AND list_contains(toks, 'hash') " +
      "AND len(list_filter(toks, t -> starts_with(t, 'jo'))) > 0 " +
      "ORDER BY score DESC, id LIMIT 10"),
    "q_semantic" -> (TokCte + " SELECT doc_id AS id, CAST(round(" +
      "1.0 * len(list_filter(toks, t -> t = 'vector')) + " +
      "1.0 * len(list_filter(toks, t -> t = 'hash')) + " +
      "1.0 * len(list_filter(toks, t -> t = 'merge')), 4) AS DOUBLE) AS score " +
      "FROM tok WHERE score > 0 ORDER BY score DESC, id LIMIT 15"),
    "q_sparse_vector" -> (TokCte + " SELECT doc_id AS id, CAST(round(" +
      "1.2 * len(list_filter(toks, t -> t = 'vector')) + " +
      "0.8 * len(list_filter(toks, t -> t = 'hash')) + " +
      "0.5 * len(list_filter(toks, t -> t = 'merge')), 4) AS DOUBLE) AS score " +
      "FROM tok WHERE score > 0 ORDER BY score DESC, id LIMIT 15"),
    "q_script_filter" -> "SELECT doc_id FROM documents WHERE n_chars * 2 > 900 ORDER BY doc_id",
    "q_sql_basic" -> ("SELECT lang, count(*)::BIGINT AS n, min(n_chars) AS lo, max(n_chars) AS hi " +
      "FROM documents WHERE n_chars > 200 GROUP BY lang ORDER BY lang"),
    "q_sql_match" -> ("WITH tok AS (SELECT doc_id, lang, n_chars, " +
      "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS toks FROM documents) " +
      "SELECT doc_id, lang FROM tok WHERE list_contains(toks, 'vector') AND list_contains(toks, 'hash') " +
      "AND n_chars > 150 ORDER BY doc_id"),
    "q_sql_score" -> (TokCte + bm25Ctes("", "tok", Seq("vector", "join")) +
      " SELECT id AS doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 10"),
    "q_sql_query" -> (TokCte.replace("SELECT doc_id,", "SELECT doc_id, lang,") +
      " SELECT doc_id FROM tok WHERE lang = 'en' AND list_contains(toks, 'merge') ORDER BY doc_id"),
    "q_sql_pivot" -> ("SELECT o_custkey % 10 AS bucket, " +
      "CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS s_o, " +
      "CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS s_f, " +
      "CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS s_p " +
      "FROM orders GROUP BY 1 ORDER BY bucket"),
    "q_sql_percentile" -> ("SELECT o_orderstatus, " +
      "round(quantile_cont(o_totalprice, 0.50), 4) AS p50, " +
      "round(100.0 * avg(CASE WHEN o_totalprice <= 100000 THEN 1.0 ELSE 0.0 END), 4) AS pr " +
      "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "q_sql_histogram" -> ("SELECT CAST(floor(o_totalprice / 50000) AS DOUBLE) * 50000 AS bucket, " +
      "count(*)::BIGINT AS n FROM orders GROUP BY 1 ORDER BY bucket"),
    "q_esql_completion" -> (TokCte +
      " SELECT doc_id, 'stub: ' || array_to_string(list_reverse(toks[1:8]), ' ') AS summary " +
      "FROM tok WHERE doc_id < 20 ORDER BY doc_id"),
    "q_sql_funcs" -> ("SELECT o_orderkey AS id, " +
      "CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS sz, " +
      "date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS dd, " +
      "o_orderdate + INTERVAL 30 DAY AS due FROM orders " +
      "WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' " +
      "AND o_orderdate < TIMESTAMP '1995-02-01 00:00:00' ORDER BY id"),
    "q_explain" -> (TokCte + ", dl AS (SELECT doc_id, len(toks)::DOUBLE AS dl, toks FROM tok), " +
      "st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl), " +
      "tf AS (SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM " +
      "(SELECT doc_id, dl, unnest(toks) AS term FROM dl) " +
      "WHERE term IN ('vector','hash','join') GROUP BY doc_id, dl, term), " +
      "df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term) " +
      "SELECT tf.term, tf.tf, df.df, " +
      "round(ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5)), 4) AS idf, " +
      "round(ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5)) * tf.tf * (1.2 + 1.0) / " +
      "(tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / st.avgdl)), 4) AS weight " +
      "FROM tf JOIN df USING (term) CROSS JOIN st WHERE tf.doc_id = 42 ORDER BY term"),
    "q_esql_values" -> ("SELECT source, len(ll)::INT AS nl, ll[1] AS l1, ll[-1] AS ln, " +
      "tt[1] AS t1, tt[-1] AS t3 FROM (SELECT source, " +
      "list_sort(list_distinct(list(lang))) AS ll, " +
      "list_sort(list(n_chars), 'DESC')[1:3] AS tt FROM documents GROUP BY source) " +
      "ORDER BY source LIMIT 20"),
    "q_esql_stats_where" -> ("SELECT l_linestatus, count(*)::BIGINT AS n, " +
      "(count(*) FILTER (l_returnflag = 'R'))::BIGINT AS nret, " +
      "sum(l_quantity) FILTER (l_returnflag = 'R') AS rqty " +
      "FROM lineitem GROUP BY 1 ORDER BY 1"),
    "q_esql_fork" -> ("SELECT doc_id, n_chars, 'fork1' AS _fork FROM documents WHERE n_chars > 450 " +
      "UNION ALL SELECT doc_id, n_chars, 'fork2' AS _fork FROM " +
      "(SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 5) " +
      "ORDER BY _fork, doc_id"),
    "q_esql_fuse" -> ("WITH f1 AS (SELECT doc_id, n_chars + 0.0 AS _score FROM documents " +
      "WHERE n_chars > 450 ORDER BY _score DESC, doc_id LIMIT 20), " +
      "f2 AS (SELECT doc_id, doc_id + 0.0 AS _score FROM documents " +
      "WHERE source = 'src3' ORDER BY _score DESC, doc_id LIMIT 20), " +
      "r AS (SELECT doc_id, row_number() OVER (ORDER BY _score DESC, doc_id) AS rnk FROM f1 " +
      "UNION ALL SELECT doc_id, row_number() OVER (ORDER BY _score DESC, doc_id) AS rnk FROM f2) " +
      "SELECT doc_id, round(sum(1.0 / (60.0 + rnk)), 6) AS _score FROM r GROUP BY doc_id " +
      "ORDER BY _score DESC, doc_id LIMIT 15"),
    "q_esql_grok" -> ("SELECT event_type, count(*)::BIGINT AS n, " +
      "sum(CAST(regexp_extract(props, '\\{\"k\": (-?\\d+)\\}', 1) AS BIGINT))::BIGINT AS ktot, " +
      "max(CAST(regexp_extract(props, '\\{\"k\": (-?\\d+)\\}', 1) AS BIGINT))::BIGINT AS kmax " +
      "FROM events GROUP BY event_type ORDER BY event_type"),
    "q_esql_spatial" -> (GeoCte +
      " SELECT c_custkey, d_m, x, y FROM (SELECT c_custkey, " +
      "round((2 * 6371 * asin(sqrt(pow(sin(radians(0.0 - lat) / 2), 2) + " +
      "cos(radians(lat)) * cos(radians(0.0)) * pow(sin(radians(0.0 - lon) / 2), 2)))) * 1000, 2) AS d_m, " +
      "lon AS x, lat AS y FROM g) WHERE d_m < 2000000.0 ORDER BY c_custkey"),
    "q_esql_stddev" -> ("SELECT l_returnflag, round(stddev_pop(l_quantity), 4) AS sd, " +
      "count(*)::BIGINT AS n FROM lineitem GROUP BY 1 ORDER BY 1"),
    "q_esql_functions2" -> ("SELECT doc_id, to_base64(encode(lang)) AS b64, " +
      "decode(from_base64(to_base64(encode(lang)))) AS rt, " +
      "round(degrees(1.0), 4) AS deg, round(radians(180.0), 4) AS rad, " +
      "round(ln(8.0) / ln(2.0), 4) AS lg, " +
      "greatest(len(string_split(lang, 'n')), len(string_split(source, 'rc')))::INT AS zn, " +
      "list_last(list_transform(range(1, greatest(len(string_split(lang, 'n')), len(string_split(source, 'rc'))) + 1), " +
      "i -> concat_ws(',', string_split(lang, 'n')[i], string_split(source, 'rc')[i]))) AS zl " +
      "FROM documents WHERE doc_id <= 20 ORDER BY doc_id"),
    "q_esql_dates" -> ("SELECT strftime(ts, '%Y-%m-%d') AS day, count(*)::BIGINT AS n, " +
      "max((1710000000000000000 - epoch_ns(ts)) // 3600000000000)::BIGINT AS mx, " +
      "max(month(ts))::BIGINT AS mom FROM events GROUP BY 1 ORDER BY day LIMIT 10"),
    "q_esql_date_trunc" -> ("SELECT epoch_ns(ts) - epoch_ns(ts) % 86400000000000 AS day, " +
      "count(*)::BIGINT AS n, min(value) AS lo, max(value) AS hi FROM events " +
      "GROUP BY day ORDER BY day LIMIT 14"),
    "q_esql_dissect" -> ("SELECT regexp_extract(o_orderpriority, '^(.*?)-(.*)$', 2) AS pr_name, " +
      "count(*)::BIGINT AS n FROM orders GROUP BY 1 ORDER BY pr_name"),
    "q_esql_mv_expand" -> ("WITH t AS (SELECT lang, CASE WHEN lang = 'en' " +
      "THEN regexp_split_to_array(text, ' ') END AS toks FROM documents), " +
      "e AS (SELECT lang, unnest(toks) FROM t WHERE toks IS NOT NULL " +
      "UNION ALL SELECT lang, NULL FROM t WHERE toks IS NULL) " +
      "SELECT lang, count(*)::BIGINT AS n FROM e GROUP BY lang ORDER BY lang"),
    "q_esql_case" -> ("WITH t AS (SELECT CASE WHEN o_totalprice < 50000.0 THEN 'low' " +
      "WHEN o_totalprice < 150000.0 THEN 'mid' ELSE 'high' END AS band, " +
      "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END AS urgent FROM orders) " +
      "SELECT band, count(*)::BIGINT AS n, count(urgent)::BIGINT AS u " +
      "FROM t GROUP BY band ORDER BY band"),
    "q_esql_inlinestats" -> ("WITH s AS (SELECT l_returnflag, max(l_quantity) AS mx " +
      "FROM lineitem GROUP BY 1) " +
      "SELECT l.l_returnflag, count(*)::BIGINT AS n FROM lineitem l " +
      "JOIN s USING (l_returnflag) WHERE l_quantity >= mx - 1 " +
      "GROUP BY 1 ORDER BY l_returnflag"),
    "q_esql_lookup" -> ("SELECT n_name, count(*)::BIGINT AS n FROM customer " +
      "LEFT JOIN nation ON c_nationkey = n_nationkey " +
      "GROUP BY 1 ORDER BY n_name"),
    "q_esql_change_point" -> ("WITH b AS (SELECT epoch_ns(ts) - epoch_ns(ts) % 86400000000000 AS day, " +
      "round(avg(value), 4) AS v FROM events GROUP BY day), " +
      "t AS (SELECT count(v)::DOUBLE AS n, CAST(sum(CAST(v AS DECIMAL(24,6))) AS DOUBLE) AS s FROM b), " +
      "c AS (SELECT day, v, " +
      "(count(v) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE AS n1, " +
      "sum(v) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1 FROM b), " +
      "st AS (SELECT day, v, round(n1 * ((s1/n1) - (s/n)) * ((s1/n1) - (s/n)) + " +
      "(n - n1) * (((s-s1)/(n-n1)) - (s/n)) * (((s-s1)/(n-n1)) - (s/n)), 4) AS cp_stat " +
      "FROM c CROSS JOIN t WHERE n1 < n) " +
      "SELECT day, v, cp_stat FROM st ORDER BY cp_stat DESC, day LIMIT 1"),
    "q_search_template" -> ("SELECT doc_id FROM documents " +
      "WHERE lang = 'en' AND n_chars >= 200 ORDER BY doc_id"),
    "q_rank_eval" -> (TokCte + bm25Ctes("", "tok", Seq("fast", "hash", "join")) +
      ", rk AS (SELECT id, rank FROM (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank FROM sc) WHERE rank <= 10), " +
      "rt AS (SELECT doc_id AS id, (list_contains(toks, 'fast')::INT + list_contains(toks, 'hash')::INT + list_contains(toks, 'join')::INT) - 1 AS rating " +
      "FROM tok WHERE (list_contains(toks, 'fast')::INT + list_contains(toks, 'hash')::INT + list_contains(toks, 'join')::INT) - 1 > 0), " +
      "j AS (SELECT rk.rank, rt.rating FROM rk LEFT JOIN rt USING (id)) " +
      "SELECT 1::BIGINT AS query_id, " +
      "round(sum(CASE WHEN rating > 0 THEN 1.0 ELSE 0.0 END) / 10, 4) AS precision_k, " +
      "round(coalesce(1.0 / min(CASE WHEN rating > 0 THEN rank END), 0.0), 4) AS mrr, " +
      "round(sum(CASE WHEN rating > 0 THEN (pow(2.0, rating) - 1.0) / (ln(rank + 1.0) / ln(2.0)) ELSE 0.0 END), 4) AS dcg_k, " +
      "round(sum(CASE WHEN rating > 0 THEN 1 ELSE 0 END)::DOUBLE / (SELECT count(*) FROM rt), 4) AS recall_k " +
      "FROM j"),
    "q_geo_shape" -> (GeoCte +
      ", env AS (SELECT c_custkey, " +
      "lat - (c_custkey % 10) / 10.0 AS min_lat, lat + (c_custkey % 10) / 10.0 AS max_lat, " +
      "lon - (c_custkey % 7) / 7.0 AS min_lon, lon + (c_custkey % 7) / 7.0 AS max_lon FROM g) " +
      "SELECT c_custkey, min_lat, max_lon FROM env " +
      "WHERE max_lat >= -10.0 AND min_lat <= 10.0 AND max_lon >= -20.0 AND min_lon <= 20.0 " +
      "ORDER BY c_custkey"),
    "q_geo_shape_indexed" -> (GeoCte +
      ", a AS (SELECT c_custkey, lat, lon, " +
      "CAST(c_custkey % 7 + 2 AS DOUBLE) AS an, CAST(c_custkey % 5 + 2 AS DOUBLE) AS ae, " +
      "CAST(c_custkey % 3 + 2 AS DOUBLE) AS aso, CAST(c_custkey % 11 + 2 AS DOUBLE) AS aw FROM g), " +
      "f AS (SELECT c_custkey, " +
      "(CASE ((CASE WHEN 5.1234567 >= lat THEN (5.1234567 - lat) / an ELSE (lat - 5.1234567) / aso END) + " +
      "(CASE WHEN 10.7654321 >= lon THEN (10.7654321 - lon) / ae ELSE (lon - 10.7654321) / aw END)) <= 1.0 " +
      "WHEN TRUE THEN 1 ELSE 0 END)::INT AS contains_pt, " +
      "(CASE WHEN lat - aso >= -29.954 AND lat + an <= 29.876 AND lon - aw >= -59.43 AND lon + ae <= 59.781 " +
      "THEN 1 ELSE 0 END)::INT AS within_env FROM a) " +
      "SELECT c_custkey, contains_pt, within_env FROM f " +
      "WHERE contains_pt = 1 OR within_env = 1 ORDER BY c_custkey"),
    "q_geo_shape_holes" -> (GeoCte +
      ", a AS (SELECT c_custkey, lat, lon, " +
      "CAST(c_custkey % 7 + 2 AS DOUBLE) * 8.0 AS an, CAST(c_custkey % 5 + 2 AS DOUBLE) * 8.0 AS ae, " +
      "CAST(c_custkey % 3 + 2 AS DOUBLE) * 8.0 AS aso, CAST(c_custkey % 11 + 2 AS DOUBLE) * 8.0 AS aw FROM g), " +
      "h AS (SELECT *, an / 3.0 AS hn, ae / 3.0 AS he, aso / 3.0 AS hs, aw / 3.0 AS hw FROM a), " +
      "f AS (SELECT c_custkey, " +
      s"(CASE WHEN ${diamondTSql("lat", "lon", "an", "aso", "ae", "aw")} <= 1.0 THEN 1 ELSE 0 END)::INT AS in_outer, " +
      s"(CASE WHEN ${diamondTSql("lat", "lon", "an", "aso", "ae", "aw")} <= 1.0 AND " +
      s"NOT (${diamondTSql("lat", "lon", "hn", "hs", "he", "hw")} <= 1.0) THEN 1 ELSE 0 END)::INT AS in_shape FROM h) " +
      "SELECT c_custkey, in_outer, in_shape FROM f WHERE in_outer = 1 ORDER BY c_custkey"),
    "q_geo_shape_multi" -> (GeoCte +
      ", a AS (SELECT c_custkey, lat, lon, -lat AS lat2, -lon AS lon2, " +
      "CAST(c_custkey % 7 + 2 AS DOUBLE) * 8.0 AS an, CAST(c_custkey % 5 + 2 AS DOUBLE) * 8.0 AS ae, " +
      "CAST(c_custkey % 3 + 2 AS DOUBLE) * 8.0 AS aso, CAST(c_custkey % 11 + 2 AS DOUBLE) * 8.0 AS aw FROM g), " +
      "f AS (SELECT c_custkey, " +
      s"(CASE WHEN (${diamondTSql("lat", "lon", "an", "aso", "ae", "aw")} <= 1.0) != " +
      s"(${diamondTSql("lat2", "lon2", "ae", "aw", "an", "aso")} <= 1.0) THEN 1 ELSE 0 END)::INT AS in_shape FROM a) " +
      "SELECT c_custkey, in_shape FROM f WHERE in_shape = 1 ORDER BY c_custkey"),
    "q_geo_shape_line" -> (GeoCte +
      ", a AS (SELECT c_custkey, lat, lon, " +
      "CAST(c_custkey % 7 + 2 AS DOUBLE) * 4.0 AS an, CAST(c_custkey % 5 + 2 AS DOUBLE) * 4.0 AS ae, " +
      "CAST(c_custkey % 3 + 2 AS DOUBLE) * 4.0 AS aso, CAST(c_custkey % 11 + 2 AS DOUBLE) * 4.0 AS aw FROM g), " +
      "v AS (SELECT c_custkey, lat AS y1, lon AS x1, lat + an AS y2, lon + ae AS x2, " +
      "lat - aso AS y3, lon + 2.0 * ae AS x3, lat + an / 2.0 AS y4, lon - aw AS x4 FROM a), " +
      "f AS (SELECT c_custkey, (CASE WHEN " +
      s"${segBoxSql("y1", "x1", "y2", "x2", 20.0, -30.0, -20.0, 30.0)} OR " +
      s"${segBoxSql("y2", "x2", "y3", "x3", 20.0, -30.0, -20.0, 30.0)} OR " +
      s"${segBoxSql("y3", "x3", "y4", "x4", 20.0, -30.0, -20.0, 30.0)} " +
      "THEN 1 ELSE 0 END)::INT AS hits FROM v) " +
      "SELECT c_custkey, hits FROM f WHERE hits = 1 ORDER BY c_custkey"),
    // identical fusion as q_hybrid_rrf: the retriever-tree body must
    // reproduce the hand-wired pipeline bit-for-bit
    "q_retriever_rrf" -> (TokCte + bm25Ctes("", "tok", Seq("fast", "hash", "join")) +
      ", e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
      "q AS (SELECT list_transform(range(0, 64), i -> (i * 37 % 100) / 100.0 - 0.5) AS qv), " +
      "n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e), " +
      "qn AS (SELECT qv, sqrt(list_reduce(list_prepend(0.0, list_transform(qv, x -> x * x)), (a, b) -> a + b)) AS qnrm FROM q), " +
      "sem AS (SELECT vec_id AS id, " +
      "round(list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])), (x, y) -> x + y) / (nrm * qnrm), 4) AS score " +
      "FROM n CROSS JOIN qn), " +
      "rl AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank FROM sc), " +
      "rs AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank FROM sem), " +
      "u AS (SELECT id, 1.0 / (60 + rank) AS c FROM rl WHERE rank <= 50 " +
      "UNION ALL SELECT id, 1.0 / (60 + rank) AS c FROM rs WHERE rank <= 50) " +
      "SELECT id, round(sum(c), 4) AS rrf_score, count(*)::INT AS matched FROM u " +
      "GROUP BY id ORDER BY rrf_score DESC, id LIMIT 10"),
    "q_hybrid_rrf" -> (TokCte + bm25Ctes("", "tok", Seq("fast", "hash", "join")) +
      ", e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
      "q AS (SELECT list_transform(range(0, 64), i -> (i * 37 % 100) / 100.0 - 0.5) AS qv), " +
      "n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e), " +
      "qn AS (SELECT qv, sqrt(list_reduce(list_prepend(0.0, list_transform(qv, x -> x * x)), (a, b) -> a + b)) AS qnrm FROM q), " +
      "sem AS (SELECT vec_id AS id, " +
      "round(list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])), (x, y) -> x + y) / (nrm * qnrm), 4) AS score " +
      "FROM n CROSS JOIN qn), " +
      "rl AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank FROM sc), " +
      "rs AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank FROM sem), " +
      "u AS (SELECT id, 1.0 / (60 + rank) AS c FROM rl WHERE rank <= 50 " +
      "UNION ALL SELECT id, 1.0 / (60 + rank) AS c FROM rs WHERE rank <= 50) " +
      "SELECT id, round(sum(c), 4) AS rrf_score, count(*)::INT AS matched FROM u " +
      "GROUP BY id ORDER BY rrf_score DESC, id LIMIT 10"),
    "q_knn" -> ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v " +
      "FROM embeddings WHERE label = 3), " +
      "q AS (SELECT list_transform(range(0, 64), i -> (i * 37 % 100) / 100.0 - 0.5) AS qv), " +
      "n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e), " +
      "qn AS (SELECT qv, sqrt(list_reduce(list_prepend(0.0, list_transform(qv, x -> x * x)), (a, b) -> a + b)) AS qnrm FROM q), " +
      "p AS (SELECT vec_id AS id, " +
      "round(list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])), (x, y) -> x + y) / (nrm * qnrm), 4) AS cosine " +
      "FROM n CROSS JOIN qn) " +
      "SELECT id, cosine, rank FROM (SELECT *, row_number() OVER (ORDER BY cosine DESC, id) AS rank FROM p) " +
      "WHERE rank <= 5 ORDER BY rank"),
    "q_rank_vectors" -> ("WITH e AS (SELECT vec_id % 50 AS doc_id, " +
      "list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
      "q AS (SELECT list_transform(range(0, 64), i -> (i * 37 % 100) / 100.0 - 0.5) AS q1, " +
      "list_transform(range(0, 64), i -> (i * 53 % 100) / 100.0 - 0.5) AS q2), " +
      "p AS (SELECT doc_id, " +
      "list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> v[i] * q1[i])), (x, y) -> x + y) AS d1, " +
      "list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> v[i] * q2[i])), (x, y) -> x + y) AS d2 " +
      "FROM e CROSS JOIN q) " +
      "SELECT doc_id AS id, round(max(d1) + max(d2), 4) AS maxsim FROM p " +
      "GROUP BY 1 ORDER BY maxsim DESC, id LIMIT 10"),
    "q_knn_similarity" -> ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v " +
      "FROM embeddings), " +
      "q AS (SELECT list_transform(range(0, 64), i -> (i * 37 % 100) / 100.0 - 0.5) AS qv), " +
      "n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e), " +
      "qn AS (SELECT qv, sqrt(list_reduce(list_prepend(0.0, list_transform(qv, x -> x * x)), (a, b) -> a + b)) AS qnrm FROM q), " +
      "p AS (SELECT vec_id AS id, " +
      "round(list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])), (x, y) -> x + y) / (nrm * qnrm), 4) AS cosine " +
      "FROM n CROSS JOIN qn) " +
      "SELECT id, cosine, rank FROM (SELECT *, row_number() OVER (ORDER BY cosine DESC, id) AS rank FROM p) " +
      "WHERE rank <= 20 AND cosine >= 0.15 ORDER BY rank"),
    "q_rank_feature" -> ("SELECT doc_id AS id, " +
      "round(CAST(n_chars AS DOUBLE) / (CAST(n_chars AS DOUBLE) + 200.0), 4) AS score " +
      "FROM documents ORDER BY score DESC, id LIMIT 15"),
    "q_span_multi" -> (TokCte + ", pos AS (SELECT doc_id, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'join') AS p1, " +
      "list_filter(range(1, len(toks) + 1), i -> starts_with(toks[i], 'ha')) AS p2 FROM tok) " +
      "SELECT doc_id FROM pos WHERE len(p1) > 0 AND len(p2) > 0 AND " +
      "len(list_filter(p1, i -> len(list_filter(p2, j -> greatest(i, j) - least(i, j) + 1 - 2 <= 3)) > 0)) > 0 " +
      "ORDER BY doc_id"),
    "q_suggest_completion" -> ("SELECT source AS suggestion, max(n_chars) AS weight " +
      "FROM documents WHERE starts_with(source, 'src1') GROUP BY 1 " +
      "ORDER BY weight DESC, suggestion LIMIT 8"),
    "q_suggest_context" -> ("SELECT source AS suggestion, " +
      "CAST(round(max(n_chars * (CASE lang WHEN 'en' THEN 2.0 WHEN 'fr' THEN 1.0 ELSE 0.0 END)), 4) AS DOUBLE) AS weight " +
      "FROM documents WHERE starts_with(source, 'src') AND lang IN ('en', 'fr') " +
      "GROUP BY 1 ORDER BY weight DESC, suggestion LIMIT 8"),
    "q_min_score" -> (TokCte + bm25Ctes("", "tok", Seq("vector", "hash")) +
      " SELECT id, score FROM sc WHERE score >= 2.0 ORDER BY score DESC, id"),
    "q_esql_weighted_avg" -> ("SELECT l_returnflag, " +
      "round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS w " +
      "FROM lineitem GROUP BY 1 ORDER BY 1"),
    "q_embed_quant" -> ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
      "s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e), " +
      "r AS (SELECT vec_id, scale, CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0) ELSE " +
      "list_transform(v, x -> abs(least(greatest(floor(x / scale + 0.5), -127.0), 127.0) * scale - x)) END AS errs FROM s) " +
      "SELECT vec_id AS id, round(scale, 6) AS scale, round(list_max(errs), 6) AS max_err, " +
      "round(list_reduce(list_prepend(0.0, list_transform(errs, e -> e * e)), (a, b) -> a + b) / len(v), 6) AS mse " +
      "FROM r JOIN e USING (vec_id) ORDER BY id"),
    "q_script_loop" -> ("SELECT vec_id AS id, round(sqrt(list_reduce(list_prepend(0.0, " +
      "list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)), (a, b) -> a + b)), 4) AS score " +
      "FROM embeddings ORDER BY score DESC, id LIMIT 15"),
    "q_script_vector" -> ("WITH q AS (SELECT " + ScriptQv.mkString("[", ", ", "]") + "::DOUBLE[] AS v), " +
      "e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
      "n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e), " +
      "qn AS (SELECT v, sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm FROM q) " +
      "SELECT vec_id AS id, round(list_reduce(list_prepend(0.0, " +
      "list_transform(range(1, 65), i -> n.v[i] * qn.v[i])), (x, y) -> x + y) / (n.nrm * qn.nrm) + 1.0, 4) AS score " +
      "FROM n CROSS JOIN qn ORDER BY score DESC, id LIMIT 10"),
    "q_script_score" -> ("SELECT doc_id AS id, " +
      "round((CAST(n_chars AS DOUBLE) / (CAST(n_chars AS DOUBLE) + 250.0)) * " +
      "ln(2.0 + CAST(n_chars AS DOUBLE)) + 0.5, 4) AS score " +
      "FROM documents WHERE n_chars >= 100 ORDER BY score DESC, id LIMIT 12"),
    "q_rescore" -> (TokCte + bm25Ctes("", "tok", Seq("fast", "hash", "join")) +
      ", w AS (SELECT id, score FROM sc ORDER BY score DESC, id LIMIT 50) " +
      "SELECT w.id, round(w.score * 1.0 + ln(1.0 + d.n_chars) * 0.5, 4) AS score " +
      "FROM w JOIN documents d ON d.doc_id = w.id ORDER BY score DESC, id LIMIT 10"),
    "q_ltr" -> (TokCte + bm25Ctes("", "tok", Seq("fast", "hash", "join")) +
      ", w AS (SELECT id, score FROM sc ORDER BY score DESC, id LIMIT 50) " +
      "SELECT w.id, round(w.score * 0.6 + ln(1.0 + d.n_chars) * 0.2 + " +
      "(CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END) * 1.5, 4) AS ltr_score " +
      "FROM w JOIN documents d ON d.doc_id = w.id ORDER BY ltr_score DESC, id LIMIT 10"),
    "q_ngram_topk" -> (TokCte + ", sh AS (SELECT doc_id, " +
      "unnest(list_distinct(list_transform(range(1, len(toks) - 1), " +
      "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS ngram FROM tok) " +
      "SELECT ngram, count(*)::BIGINT AS df FROM sh GROUP BY 1 " +
      "ORDER BY df DESC, ngram LIMIT 20"),
    "q_text_clean" -> ("SELECT doc_id, " +
      "trim(regexp_replace(regexp_replace(regexp_replace(text, 'https?://[^ \\t\\n\\f\\r]+', ' ', 'g'), " +
      "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', ' ', 'g'), '[ \\t\\n\\f\\r]+', ' ', 'g')) AS clean, " +
      "length(trim(regexp_replace(regexp_replace(regexp_replace(text, 'https?://[^ \\t\\n\\f\\r]+', ' ', 'g'), " +
      "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', ' ', 'g'), '[ \\t\\n\\f\\r]+', ' ', 'g')))::INT AS clean_len " +
      "FROM documents ORDER BY doc_id"),
    "q_agg_pipeline" -> ("WITH b AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket, " +
      "count(*)::BIGINT AS doc_count, " +
      "round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_v FROM orders GROUP BY 1) " +
      "SELECT bucket, doc_count, sum_v, " +
      "round(sum(sum_v) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING), 4) AS cum_sum, " +
      "round(sum_v - lag(sum_v) OVER (ORDER BY bucket), 4) AS deriv, " +
      "round(avg(sum_v) OVER (ORDER BY bucket ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg " +
      "FROM b ORDER BY bucket"),

    // ---- B ----
    "q_match" -> s"$TokCte SELECT doc_id FROM tok WHERE list_has_any(toks, ['spark','window']) ORDER BY doc_id",
    "q_match_and" -> s"$TokCte SELECT doc_id FROM tok WHERE list_has_all(toks, ['spark','window']) ORDER BY doc_id",
    "q_match_phrase" -> s"$TokCte SELECT doc_id FROM tok WHERE contains(' ' || array_to_string(toks, ' ') || ' ', ' table scan ') ORDER BY doc_id",
    "q_match_phrase_prefix" -> s"$TokCte SELECT doc_id FROM tok WHERE contains(' ' || array_to_string(toks, ' ') || ' ', ' table sc') ORDER BY doc_id",
    "q_span_first" -> (s"$TokCte SELECT doc_id FROM tok WHERE " +
      "list_position(toks, 'spark') >= 1 AND list_position(toks, 'spark') <= 10 ORDER BY doc_id"),
    "q_query_string" -> ("WITH f AS (SELECT doc_id, " +
      "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS toks, " +
      "list_filter(regexp_split_to_array(lower(source), '[^a-z0-9]+'), x -> len(x) > 0) AS stoks FROM documents) " +
      "SELECT doc_id FROM f WHERE list_has_any(toks, ['src5','merge']) OR list_has_any(stoks, ['src5','merge']) ORDER BY doc_id"),
    "q_match_phrase_slop" -> (TokCte + ", p AS (SELECT doc_id, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'table') AS p0, " +
      "list_filter(range(1, len(toks) + 1), i -> toks[i] = 'scan') AS p1 FROM tok) " +
      "SELECT doc_id FROM p WHERE len(list_filter(p0, a -> len(list_filter(p1, b -> b > a AND b - a <= 2)) > 0)) > 0 ORDER BY doc_id"),
    "q_match_stemmed" -> (TokCte + MTokCte +
      ", mst AS (SELECT doc_id, toks, list_transform(toks, x -> " + mstem("x") + ") AS st FROM mtok) " +
      "SELECT doc_id, len(list_intersect(list_distinct(st), ['table', 'window']))::BIGINT AS n_terms, " +
      "list_has_any(toks, ['tables', 'windows']) AS raw_hit " +
      "FROM mst WHERE list_has_any(st, ['table', 'window']) ORDER BY doc_id"),
    "q_match_stemmed_de" -> (TokCte + MTokDeCte +
      ", g1 AS (SELECT doc_id, toks, list_transform(toks, x -> " + gstem1("x") + ") AS s1 FROM mtokde) " +
      ", gst AS (SELECT doc_id, toks, list_transform(s1, x -> " + gstem2("x") + ") AS st FROM g1) " +
      "SELECT doc_id, len(list_intersect(list_distinct(st), ['vector', 'hash']))::BIGINT AS n_terms, " +
      "list_has_any(toks, ['vectoren', 'hashen']) AS raw_hit " +
      "FROM gst WHERE list_has_any(st, ['vector', 'hash']) ORDER BY doc_id"),
    "q_match_folded" -> ("WITH r AS (SELECT doc_id, lang, CASE WHEN lang = 'de' " +
      "THEN translate(text, 'ae', 'äé') ELSE text END AS raw FROM documents), " +
      s"f AS (SELECT doc_id, lang, raw, list_filter(regexp_split_to_array(" +
      s"translate(raw, '${graft.analysis.Analyzer.FoldFrom}', '${graft.analysis.Analyzer.FoldTo}'), " +
      "'[^a-z0-9]+'), x -> len(x) > 0) AS ftoks FROM r) " +
      "SELECT doc_id, lang, list_contains(list_filter(regexp_split_to_array(raw, '[^a-z0-9]+'), " +
      "x -> len(x) > 0), 'merge') AS raw_hit " +
      "FROM f WHERE list_contains(ftoks, 'merge') AND lang IN ('de', 'en') ORDER BY doc_id"),
    "q_analyze_html" -> ("WITH h AS (SELECT lang, '<div class=\"x\"><p>' || substring(text, 1, 60) || " +
      "' &amp; more</p></div>' AS html FROM documents), " +
      "s AS (SELECT lang, replace(replace(replace(replace(replace(replace(" +
      "regexp_replace(html, '<[^>]*>', ' ', 'g'), " +
      "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&') AS txt FROM h), " +
      "t AS (SELECT lang, list_filter(regexp_split_to_array(lower(txt), '[^a-z0-9]+'), x -> len(x) > 0) AS toks FROM s) " +
      "SELECT lang, sum(len(toks))::BIGINT AS n_toks, " +
      "sum(CASE WHEN list_contains(toks, 'more') THEN 1 ELSE 0 END)::BIGINT AS n_more, " +
      "sum(CASE WHEN list_contains(toks, 'amp') THEN 1 ELSE 0 END)::BIGINT AS n_amp, " +
      "sum(CASE WHEN list_contains(toks, 'div') THEN 1 ELSE 0 END)::BIGINT AS n_div " +
      "FROM t GROUP BY lang ORDER BY lang"),
    "q_match_stopwords" -> (TokCte +
      " SELECT doc_id, list_contains(toks, 'the') AS has_the FROM tok " +
      "WHERE list_contains(toks, 'fast') AND list_contains(toks, 'table') ORDER BY doc_id"),
    "q_match_synonyms" -> (TokCte +
      " SELECT doc_id, len(list_intersect(list_distinct(toks), ['rapid', 'fast', 'quick']))::BIGINT AS n_syn " +
      "FROM tok WHERE list_has_any(toks, ['rapid', 'fast', 'quick']) " +
      "AND list_has_any(toks, ['tbl', 'table']) ORDER BY doc_id"),
    "q_bm25_stemmed" -> (TokCte + MTokCte +
      ", cst AS (SELECT doc_id, list_transform(list_filter(toks, t2 -> t2 NOT IN (" + StopSql + ")), x -> " +
      mstem("x") + ") AS toks FROM mtok)" +
      bm25Ctes("m", "cst", Seq("table", "fast")) +
      " SELECT id, score FROM scm ORDER BY score DESC, id LIMIT 10"),
    "q_edge_ngram" -> (TokCte +
      ", eg AS (SELECT doc_id, flatten(list_transform(toks, t2 -> " +
      "list_transform(range(2, least(len(t2), 4) + 1), i -> substr(t2, 1, i)))) AS egs FROM tok) " +
      "SELECT doc_id, len(list_filter(egs, g -> g = 'tab'))::BIGINT AS tf " +
      "FROM eg WHERE list_contains(egs, 'tab') ORDER BY doc_id"),
    "q_constant_score" -> ("SELECT doc_id AS id, CAST(1.2 AS DOUBLE) AS score FROM documents " +
      "WHERE lang = 'fr' AND n_chars > 300 ORDER BY id"),
    "q_pinned" -> (TokCte + bm25Ctes("", "tok", Seq("fast", "hash", "join")) +
      " SELECT id, score, (CASE WHEN id = 7 THEN 0 WHEN id = 11 THEN 1 ELSE 2147483647 END) < 2147483647 AS pinned " +
      "FROM sc ORDER BY CASE WHEN id = 7 THEN 0 WHEN id = 11 THEN 1 ELSE 2147483647 END, score DESC, id LIMIT 10"),
    "q_boosting" -> (TokCte + bm25Ctes("", "tok", Seq("fast", "hash", "join")) +
      " SELECT sc.id, round(sc.score * CASE WHEN d.lang = 'de' THEN 0.5 ELSE 1.0 END, 4) AS score " +
      "FROM sc JOIN documents d ON d.doc_id = sc.id ORDER BY score DESC, id LIMIT 10"),
    "q_bm25" -> (TokCte + bm25Ctes("", "tok", Seq("fast", "hash", "join")) +
      " SELECT id, score FROM sc ORDER BY score DESC, id LIMIT 10"),
    "q_more_like_this" -> (TokCte + ", " +
      "seed AS (SELECT term FROM (SELECT unnest(toks) AS term FROM tok WHERE doc_id = 7) GROUP BY term ORDER BY count(*) DESC, term LIMIT 5), " +
      "st AS (SELECT list(term) AS terms FROM seed) " +
      "SELECT doc_id AS id, len(list_intersect(list_distinct(toks), st.terms))::INT AS overlap FROM tok, st " +
      "WHERE doc_id <> 7 AND len(list_intersect(list_distinct(toks), st.terms)) >= 2 ORDER BY overlap DESC, id"),

    "q_mlt_unlike" -> (TokCte + ", " +
      "neg AS (SELECT DISTINCT unnest(toks) AS term FROM tok WHERE doc_id = 11), " +
      "seed AS (SELECT term FROM (SELECT unnest(toks) AS term FROM tok WHERE doc_id = 7) " +
      "WHERE term NOT IN (SELECT term FROM neg) GROUP BY term ORDER BY count(*) DESC, term LIMIT 5), " +
      "st AS (SELECT list(term) AS terms FROM seed) " +
      "SELECT doc_id AS id, len(list_intersect(list_distinct(toks), st.terms))::INT AS overlap FROM tok, st " +
      "WHERE doc_id <> 7 AND len(list_intersect(list_distinct(toks), st.terms)) >= 2 ORDER BY overlap DESC, id"),
    "q_explain_function" -> ("WITH d AS (SELECT CAST(n_chars AS DOUBLE) AS x " +
      "FROM documents WHERE doc_id = 42) " +
      "SELECT component, value FROM (" +
      "SELECT 'field_value_factor' AS component, round(ln(1.0 + x), 4) AS value FROM d " +
      "UNION ALL SELECT 'gauss', round(exp(ln(0.5) * pow(x - 300.0, 2) / (100.0 * 100.0)), 4) FROM d " +
      "UNION ALL SELECT 'score', round(ln(1.0 + x) * " +
      "exp(ln(0.5) * pow(x - 300.0, 2) / (100.0 * 100.0)), 4) FROM d) ORDER BY component"),
    "q_function_score" -> ("SELECT doc_id AS id, round(ln(1.0 + CAST(n_chars AS DOUBLE)) * " +
      "exp(ln(0.5) * pow(CAST(n_chars AS DOUBLE) - 300.0, 2) / (100.0 * 100.0)), 4) AS score " +
      "FROM documents ORDER BY score DESC, id LIMIT 15"),
    "q_score_decay" -> ("SELECT doc_id, " +
      "round(exp(d * d * ln(0.5) / (100.0 * 100.0)), 4) AS g, " +
      "round(exp(d * ln(0.5) / 100.0), 4) AS e, " +
      "round(greatest(0.0, (200.0 - d) / 200.0), 4) AS l " +
      "FROM (SELECT doc_id, greatest(abs(CAST(n_chars AS DOUBLE) - 300.0) - 50.0, 0.0) AS d " +
      "FROM documents) ORDER BY doc_id"),
    "q_collapse" -> ("SELECT lang, doc_id, n_chars FROM (SELECT lang, doc_id, n_chars, " +
      "row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn FROM documents) " +
      "WHERE rn = 1 ORDER BY lang"),
    "q_collapse_inner" -> ("SELECT lang, rank, doc_id, n_chars FROM (SELECT lang, doc_id, n_chars, " +
      "row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rank FROM documents) " +
      "WHERE rank <= 3 ORDER BY lang, rank"),
    "q_agg_percentiles_bucket" -> (MonthlySumCte +
      " SELECT round(quantile_cont(msum, 0.25), 4) AS p25, " +
      "round(quantile_cont(msum, 0.50), 4) AS p50, " +
      "round(quantile_cont(msum, 0.75), 4) AS p75 FROM b"),
    "q_agg_moving_percentiles" -> (MonthlySumCte +
      " SELECT m, round(msum, 4) AS msum, " +
      "round(quantile_cont(msum, 0.5) OVER (ORDER BY m ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_p50 " +
      "FROM b ORDER BY m"),
    "q_agg_frequent_items" -> ("WITH items AS (SELECT DISTINCT l_orderkey AS b, p_brand AS item " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey), " +
      "p AS (SELECT a.item AS item1, c.item AS item2 FROM items a JOIN items c " +
      "ON a.b = c.b AND a.item < c.item) " +
      "SELECT item1, item2, count(*)::BIGINT AS support FROM p GROUP BY item1, item2 " +
      "HAVING count(*) >= 50 ORDER BY support DESC, item1, item2 LIMIT 20"),
    "q_search_after" -> ("SELECT doc_id, n_chars FROM documents WHERE n_chars < 400 " +
      "OR (n_chars = 400 AND doc_id > 250) ORDER BY n_chars DESC, doc_id LIMIT 10"),
    "q_suggest_popular" -> (TokCte + ", v AS (SELECT token, count(*)::BIGINT AS freq FROM " +
      "(SELECT unnest(list_distinct(toks)) AS token FROM tok) GROUP BY token), " +
      "inp AS (SELECT coalesce(max(freq), 0) AS input_freq FROM v WHERE token = 'joins') " +
      "SELECT token, freq FROM v CROSS JOIN inp " +
      "WHERE token <> 'joins' AND levenshtein(token, 'joins') <= 1 AND freq > input_freq " +
      "ORDER BY freq DESC, token LIMIT 5"),
    "q_suggest" -> (TokCte + " SELECT token, count(*)::BIGINT AS freq FROM " +
      "(SELECT unnest(toks) AS token FROM tok) GROUP BY token " +
      "HAVING token <> 'spak' AND levenshtein(token, 'spak') <= 2 " +
      "ORDER BY freq DESC, token LIMIT 5"),
    "q_highlight" -> ("SELECT doc_id AS id, replace(regexp_extract(lower(text), " +
      "'([a-z0-9]+ ){0,3}merge( [a-z0-9]+){0,3}'), 'merge', '<em>merge</em>') AS snippet " +
      "FROM documents WHERE list_contains(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), " +
      "x -> len(x) > 0), 'merge') ORDER BY id LIMIT 20"),

    "q_mget" -> ("WITH req(pos, rid) AS (VALUES (1, 7), (2, 3), (3, 99999999), (4, 42)) " +
      "SELECT pos::BIGINT AS pos, rid::BIGINT AS doc_id, " +
      "(doc_id IS NOT NULL)::INT AS found, lang, n_chars " +
      "FROM req LEFT JOIN documents ON doc_id = rid ORDER BY pos"),
    "q_msearch" -> (TokCte + ", m AS (" +
      "SELECT 'm1' AS qid, doc_id, n_chars FROM documents WHERE lang = 'en' " +
      "UNION ALL SELECT 'm2', doc_id, n_chars FROM documents WHERE n_chars >= 400 " +
      "UNION ALL SELECT 'm3', d.doc_id, d.n_chars FROM documents d JOIN tok ON tok.doc_id = d.doc_id " +
      "WHERE list_has_all(toks, ['hash', 'join'])), " +
      "r AS (SELECT qid, doc_id AS id, n_chars, " +
      "row_number() OVER (PARTITION BY qid ORDER BY n_chars DESC, doc_id) AS rank FROM m) " +
      "SELECT qid, rank, id, n_chars FROM r WHERE rank <= 5 ORDER BY qid, rank"),
    "q_runtime_fields" -> ("SELECT doc_id, CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket, " +
      "n_chars / 1000.0 AS kchars FROM documents " +
      "WHERE floor(n_chars / 100) >= 2 AND lang = 'en' ORDER BY doc_id"),
    "q_read_metadata_score" -> (TokCte + bm25Ctes("", "tok", Seq("merge", "sort")) +
      " SELECT id, score FROM sc ORDER BY score DESC, id LIMIT 15"),

    "q_percolate_scale" -> (TokCte + ", " +
      "reg AS (SELECT * FROM (VALUES ('wants_spark', ['spark','join']), " +
      "('table_scan', ['table','scan']), ('merge_heavy', ['merge','sort','hash'])) AS t(query_id, terms)), " +
      "qx AS (SELECT query_id, unnest(terms) AS term, len(terms) AS n_terms FROM reg), " +
      "dx AS (SELECT doc_id AS id, unnest(list_distinct(toks)) AS term FROM tok) " +
      "SELECT id, query_id FROM dx JOIN qx USING (term) " +
      "GROUP BY id, query_id, n_terms HAVING count(*) = n_terms ORDER BY id, query_id"),
    "q_percolate_dsl" -> (TokCte + ", " +
      "reg AS (SELECT * FROM (VALUES " +
      "('r_spark_long', ['spark','join'], 'n_chars', 300.0, 10000.0, NULL), " +
      "('r_table_phrase', ['table'], NULL, NULL, NULL, 'table scan'), " +
      "('r_merge', ['merge','sort'], NULL, NULL, NULL, NULL), " +
      "('r_fast_short', ['fast'], 'n_chars', 0.0, 350.0, NULL)) " +
      "AS t(query_id, terms, range_field, range_min, range_max, phrase)), " +
      "qx AS (SELECT query_id, unnest(terms) AS term, len(terms) AS n_terms FROM reg), " +
      "dx AS (SELECT doc_id AS id, unnest(list_distinct(toks)) AS term FROM tok), " +
      "cand AS (SELECT id, query_id FROM dx JOIN qx USING (term) " +
      "GROUP BY id, query_id, n_terms HAVING count(*) = n_terms), " +
      "j AS (SELECT doc_id AS id, ' ' || array_to_string(toks, ' ') || ' ' AS joined, n_chars " +
      "FROM tok JOIN documents USING (doc_id)) " +
      "SELECT cand.id AS id, cand.query_id AS query_id FROM cand JOIN j ON j.id = cand.id JOIN reg USING (query_id) " +
      "WHERE (range_field IS NULL OR " +
      "((CASE WHEN range_field = 'n_chars' THEN n_chars::DOUBLE END) >= range_min AND " +
      "(CASE WHEN range_field = 'n_chars' THEN n_chars::DOUBLE END) < range_max)) " +
      "AND (phrase IS NULL OR contains(joined, ' ' || phrase || ' ')) " +
      "ORDER BY cand.id, cand.query_id"),
    "q_percolate" -> (TokCte.replace("SELECT doc_id,", "SELECT doc_id, lang, source, n_chars,") +
      ", m AS (SELECT doc_id, " +
      "CASE WHEN list_has_all(toks, ['spark','join']) THEN 'wants_spark' END AS q1, " +
      "CASE WHEN lang = 'en' AND n_chars > 350 THEN 'long_en' END AS q2, " +
      "CASE WHEN source LIKE 'src1%' AND contains(' ' || array_to_string(toks, ' ') || ' ', ' table scan ') THEN 'src1x_phrase' END AS q3 " +
      "FROM tok) " +
      "SELECT doc_id AS id, query_id FROM (SELECT doc_id, unnest([q1, q2, q3]) AS query_id FROM m) " +
      "WHERE query_id IS NOT NULL ORDER BY id, query_id"),

    // ---- C ----
    "q_agg_bucket_ops" -> ("WITH b AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket, " +
      "count(*)::BIGINT AS doc_count, " +
      "round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_v FROM orders GROUP BY 1), " +
      "p AS (SELECT bucket, doc_count, sum_v, round(sum_v / doc_count::DOUBLE, 4) AS avg_per_doc, " +
      "round(sum_v - lag(sum_v, 12) OVER (ORDER BY bucket), 4) AS serial_diff FROM b) " +
      "SELECT bucket, doc_count, sum_v, avg_per_doc, serial_diff FROM p " +
      "WHERE avg_per_doc >= 250000.0 ORDER BY bucket"),
    "q_agg_percentile_ranks" -> ("SELECT " +
      "round(count_if(l_extendedprice <= 1000.0)::DOUBLE / count(*)::DOUBLE * 100.0, 4) AS rank_1000_0, " +
      "round(count_if(l_extendedprice <= 10000.0)::DOUBLE / count(*)::DOUBLE * 100.0, 4) AS rank_10000_0, " +
      "round(count_if(l_extendedprice <= 50000.0)::DOUBLE / count(*)::DOUBLE * 100.0, 4) AS rank_50000_0 " +
      "FROM lineitem"),
    "q_agg_multi_terms" -> ("SELECT lang, source, count(*)::BIGINT AS doc_count FROM documents " +
      "GROUP BY lang, source ORDER BY doc_count DESC, lang, source LIMIT 10"),
    "q_agg_histogram_empty" -> ("WITH mm AS (SELECT date_trunc('month', min(o_orderdate)) AS lo, " +
      "date_trunc('month', max(o_orderdate)) AS hi FROM orders), " +
      "spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS bucket FROM mm), " +
      "c AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket, count(*)::BIGINT AS n FROM orders GROUP BY 1) " +
      "SELECT spine.bucket, coalesce(c.n, 0)::BIGINT AS doc_count FROM spine LEFT JOIN c USING (bucket) ORDER BY bucket"),
    "q_terms_lookup" -> ("SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey IN " +
      "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY') ORDER BY o_orderkey"),
    "q_agg_auto_date_histogram" -> ("WITH sp AS (SELECT date_diff('day', min(o_orderdate), max(o_orderdate)) AS days FROM orders), " +
      "st AS (SELECT CASE WHEN days * 24 <= 20 THEN 'hour' WHEN days <= 20 THEN 'day' " +
      "WHEN days / 31.0 <= 20 THEN 'month' ELSE 'year' END AS iv FROM sp), " +
      "b AS (SELECT iv, CASE iv WHEN 'hour' THEN strftime(date_trunc('hour', o_orderdate), '%Y-%m-%d %H:%M:%S') " +
      "WHEN 'day' THEN strftime(date_trunc('day', o_orderdate), '%Y-%m-%d %H:%M:%S') " +
      "WHEN 'month' THEN strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') " +
      "ELSE strftime(date_trunc('year', o_orderdate), '%Y-%m-%d %H:%M:%S') END AS bucket " +
      "FROM orders CROSS JOIN st) " +
      "SELECT iv AS interval, bucket, count(*)::BIGINT AS doc_count FROM b GROUP BY 1, 2 ORDER BY bucket"),
    "q_agg_missing" -> ("SELECT sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT " +
      "AS missing_count FROM events"),
    "q_agg_bucket_stats" -> ("WITH b AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket, " +
      "count(*)::BIGINT AS doc_count, " +
      "round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_v FROM orders GROUP BY 1) " +
      "SELECT count(*)::BIGINT AS n_buckets, round(CAST(sum(CAST(sum_v AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_bucket, " +
      "round(max(sum_v), 4) AS max_bucket, round(min(sum_v), 4) AS min_bucket, " +
      "round(CAST(sum(CAST(sum_v AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_bucket FROM b"),
    "q_agg_normalize" -> ("WITH b AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket, " +
      "count(*)::BIGINT AS doc_count, " +
      "round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_v FROM orders GROUP BY 1) " +
      "SELECT bucket, doc_count, sum_v, " +
      "round(sum_v / CAST(sum(CAST(sum_v AS DECIMAL(18,4))) OVER () AS DOUBLE) * 100.0, 4) AS pct_of_sum " +
      "FROM b ORDER BY bucket"),
    "q_agg_boxplot" -> ("SELECT round(quantile_cont(l_extendedprice, 0.0), 4) AS min_v, " +
      "round(quantile_cont(l_extendedprice, 0.25), 4) AS q1, " +
      "round(quantile_cont(l_extendedprice, 0.5), 4) AS q2, " +
      "round(quantile_cont(l_extendedprice, 0.75), 4) AS q3, " +
      "round(quantile_cont(l_extendedprice, 1.0), 4) AS max_v FROM lineitem"),
    "q_agg_mad" -> ("SELECT round(quantile_cont(abs(l_extendedprice - " +
      "(SELECT round(quantile_cont(l_extendedprice, 0.5), 4) FROM lineitem)), 0.5), 4) AS mad " +
      "FROM lineitem"),
    "q_agg_t_test" -> ("WITH m AS (SELECT " +
      "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::DOUBLE AS n1, " +
      "sum(CASE WHEN event_type = 'click' THEN value::DECIMAL(28,8) ELSE 0::DECIMAL(28,8) END)::DOUBLE AS s1, " +
      "sum(CASE WHEN event_type = 'click' THEN value * value ELSE 0.0 END) AS q1, " +
      "sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::DOUBLE AS n2, " +
      "sum(CASE WHEN event_type = 'view' THEN value::DECIMAL(28,8) ELSE 0::DECIMAL(28,8) END)::DOUBLE AS s2, " +
      "sum(CASE WHEN event_type = 'view' THEN value * value ELSE 0.0 END) AS q2 FROM events) " +
      "SELECT n1::BIGINT AS n1, n2::BIGINT AS n2, " +
      "round(s1 / n1, 4) AS mean1, round(s2 / n2, 4) AS mean2, " +
      "round((s1 / n1 - s2 / n2) / sqrt(((q1 - s1 * s1 / n1) / (n1 - 1)) / n1 + " +
      "((q2 - s2 * s2 / n2) / (n2 - 1)) / n2), 4) AS t_stat FROM m"),
    "q_agg_cum_card" -> ("WITH fs AS (SELECT user_id, " +
      "min(epoch_ns(ts) // 3600000000000) AS bucket FROM events GROUP BY 1), " +
      "pb AS (SELECT bucket, count(*)::BIGINT AS new_users FROM fs GROUP BY 1) " +
      "SELECT bucket, new_users, " +
      "(sum(new_users) OVER (ORDER BY bucket))::BIGINT AS cum_users FROM pb ORDER BY bucket"),
    "q_agg_variable_width" -> ("WITH ed AS (SELECT " +
      "round(quantile_cont(l_quantity, 0.25), 4) AS e1, " +
      "round(quantile_cont(l_quantity, 0.50), 4) AS e2, " +
      "round(quantile_cont(l_quantity, 0.75), 4) AS e3 FROM lineitem) " +
      "SELECT ((l_quantity >= e1)::INT + (l_quantity >= e2)::INT + (l_quantity >= e3)::INT) AS bucket, " +
      "round(min(l_quantity), 4) AS min_v, round(max(l_quantity), 4) AS max_v, " +
      "count(*)::BIGINT AS doc_count, " +
      "round(sum(l_quantity::DECIMAL(18,4))::DOUBLE / count(*), 4) AS avg_v " +
      "FROM lineitem CROSS JOIN ed GROUP BY 1 ORDER BY 1"),
    "q_agg_geo_line" -> (GeoCte +
      " SELECT c.c_nationkey AS key, " +
      "array_to_string((list(printf('%.4f,%.4f', g.lat, g.lon) ORDER BY g.c_custkey))[1:5], '|') AS line, " +
      "least(count(*), 5)::INT AS n_points " +
      "FROM g JOIN customer c ON c.c_custkey = g.c_custkey " +
      "GROUP BY 1 ORDER BY 1"),
    "q_agg_geo_bounds" -> ("WITH g AS (SELECT c_mktsegment, " +
      "(c_custkey * 7919 % 18000) / 100.0 - 90.0 AS lat, " +
      "(c_custkey * 104729 % 36000) / 100.0 - 180.0 AS lon FROM customer) " +
      "SELECT c_mktsegment AS key, round(max(lat), 4) AS top, round(min(lon), 4) AS \"left\", " +
      "round(min(lat), 4) AS bottom, round(max(lon), 4) AS \"right\", count(*)::BIGINT AS doc_count " +
      "FROM g GROUP BY 1 ORDER BY key"),
    "q_agg_scripted_metric" -> ("SELECT l_returnflag AS key, " +
      "round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS DOUBLE), 4) AS value, " +
      "count(*)::BIGINT AS doc_count FROM lineitem GROUP BY 1 ORDER BY key"),
    "q_agg_rate" -> ("WITH b AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket, " +
      "count(*)::BIGINT AS doc_count, " +
      "round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_v FROM orders GROUP BY 1) " +
      "SELECT bucket, doc_count, sum_v, " +
      "round(sum_v / date_part('day', last_day(bucket))::DOUBLE, 4) AS per_day " +
      "FROM b ORDER BY bucket"),
    "q_agg_geo_distance" -> (GeoCte + ", d AS (SELECT " +
      "2 * 6371 * asin(sqrt(pow(sin(radians(10.0 - lat) / 2), 2) + " +
      "cos(radians(lat)) * cos(radians(10.0)) * pow(sin(radians(20.0 - lon) / 2), 2))) AS km FROM g) " +
      "SELECT CASE WHEN km < 2000.0 THEN '*-2000.0' WHEN km >= 2000.0 AND km < 5000.0 THEN '2000.0-5000.0' " +
      "WHEN km >= 5000.0 AND km < 10000.0 THEN '5000.0-10000.0' ELSE '10000.0-*' END AS ring, " +
      "count(*)::BIGINT AS doc_count FROM d GROUP BY 1 ORDER BY ring"),
    "q_agg_moving_fn" -> ("WITH b AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket, " +
      "count(*)::BIGINT AS doc_count, " +
      "round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_v FROM orders GROUP BY 1) " +
      "SELECT bucket, doc_count, sum_v, " +
      "round(max(sum_v) OVER w, 4) AS moving_max, " +
      "round(min(sum_v) OVER w, 4) AS moving_min, " +
      "round(CAST(sum(CAST(sum_v AS DECIMAL(18,4))) OVER w AS DOUBLE), 4) AS moving_sum " +
      "FROM b WINDOW w AS (ORDER BY bucket ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) " +
      "ORDER BY bucket"),
    "q_agg_bucket_sort" -> ("WITH b AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket, " +
      "count(*)::BIGINT AS doc_count, " +
      "round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_v FROM orders GROUP BY 1), " +
      "r AS (SELECT row_number() OVER (ORDER BY sum_v DESC, bucket)::INT AS rank, " +
      "bucket, doc_count, sum_v FROM b) " +
      "SELECT rank, bucket, doc_count, sum_v FROM r WHERE rank > 2 AND rank <= 7 ORDER BY rank"),
    "q_agg_reverse_nested" -> ("SELECT l_returnflag AS key, count(*)::BIGINT AS doc_count, " +
      "count(DISTINCT l_orderkey)::BIGINT AS parent_count FROM lineitem GROUP BY 1 ORDER BY 1"),
    "q_agg_parent" -> ("SELECT o_orderstatus AS key, count(*)::BIGINT AS child_count, " +
      "round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS metric_sum " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1 ORDER BY 1"),
    "q_agg_geohex" -> (GeoCte +
      s", h AS (SELECT (${graft.agg.Aggs.Sqrt3Over3} * lon - lat / 3.0) / 5.0 AS q, " +
      s"lat * ${2.0 / 3.0} / 5.0 AS r FROM g), " +
      "c AS (SELECT q, r, -q - r AS s3, floor(q + 0.5) AS rq0, floor(r + 0.5) AS rr0, " +
      "floor((-q - r) + 0.5) AS rs0 FROM h), " +
      "d AS (SELECT *, abs(rq0 - q) AS dq, abs(rr0 - r) AS dr, abs(rs0 - s3) AS ds3 FROM c), " +
      "e AS (SELECT CASE WHEN dq > dr AND dq > ds3 THEN -rr0 - rs0 ELSE rq0 END AS rq, " +
      "CASE WHEN NOT (dq > dr AND dq > ds3) AND dr > ds3 THEN -rq0 - rs0 ELSE rr0 END AS rr FROM d) " +
      "SELECT rq::BIGINT::VARCHAR || ',' || rr::BIGINT::VARCHAR AS key, count(*)::BIGINT AS doc_count " +
      "FROM e GROUP BY 1 ORDER BY doc_count DESC, key LIMIT 15"),
    "q_agg_children" -> ("WITH pp AS (SELECT l_orderkey AS o_orderkey, count(*)::BIGINT AS n_children, " +
      "sum(CAST(l_quantity AS DECIMAL(18,4))) AS m_sum FROM lineitem GROUP BY 1) " +
      "SELECT o_orderstatus AS key, count(*)::BIGINT AS parent_count, " +
      "sum(n_children)::BIGINT AS child_count, " +
      "round(CAST(sum(m_sum) AS DOUBLE), 4) AS metric_sum " +
      "FROM orders JOIN pp USING (o_orderkey) GROUP BY 1 ORDER BY key"),
    "q_agg_random_sampler" -> ("SELECT count(*)::BIGINT AS sampled_count, " +
      "floor(count(*)::DOUBLE / 0.1)::BIGINT AS est_total, " +
      "round(avg(o_totalprice), 4) AS sample_avg FROM orders " +
      s"WHERE ${hexFold("o_orderkey::VARCHAR", 12)} / 281474976710656.0 < 0.1"),
    "q_agg_diversified" -> ("WITH s AS (SELECT doc_id, lang, n_chars FROM documents " +
      "QUALIFY row_number() OVER (PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id) <= 40) " +
      "SELECT count(*)::BIGINT AS sample_size, round(avg(n_chars), 4) AS avg_metric FROM s"),
    "q_suggest_phrase" -> (TokCte + ", bg AS (SELECT doc_id, " +
      "unnest(list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))) AS bigram FROM tok WHERE len(toks) >= 2), " +
      "v AS (SELECT bigram, count(*)::BIGINT AS freq FROM bg GROUP BY bigram) " +
      "SELECT bigram AS suggestion, freq FROM v " +
      "WHERE bigram <> 'table scin' " +
      "AND levenshtein(split_part(bigram, ' ', 1), 'table') <= 1 " +
      "AND levenshtein(split_part(bigram, ' ', 2), 'scin') <= 1 " +
      "ORDER BY freq DESC, suggestion LIMIT 5"),
    "q_match_fuzzy" -> (TokCte + " SELECT doc_id FROM tok WHERE " +
      "len(list_filter(toks, t -> levenshtein(t, 'spak') <= 1)) > 0 " +
      "OR len(list_filter(toks, t -> levenshtein(t, 'window') <= 1)) > 0 ORDER BY doc_id"),
    "q_agg_terms" -> "SELECT o_orderpriority AS key, count(*)::BIGINT AS doc_count FROM orders GROUP BY 1 ORDER BY doc_count DESC, key LIMIT 3",
    "q_agg_bucket_corr" -> ("WITH b AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket, " +
      "count(*)::BIGINT AS doc_count FROM orders GROUP BY 1), " +
      "r AS (SELECT doc_count, row_number() OVER (ORDER BY bucket) AS rn FROM b), " +
      "c AS (SELECT unnest(range(1, 81)) AS rn, unnest(list_transform(range(0, 80), " +
      "i -> (i * 37 % 100) / 100.0)) AS ind) " +
      "SELECT round(corr(doc_count::DOUBLE, ind), 4) AS correlation, " +
      "count(*)::BIGINT AS n_buckets FROM r JOIN c USING (rn)"),
    "q_agg_terms_script" -> ("SELECT floor(o_totalprice / 50000.0) AS key, " +
      "count(*)::BIGINT AS doc_count FROM orders GROUP BY 1 " +
      "ORDER BY doc_count DESC, key LIMIT 8"),
    "q_agg_histogram_offset" -> ("SELECT floor((l_extendedprice - 2500.0) / 5000.0) * 5000.0 " +
      "+ 2500.0 AS bucket, count(*)::BIGINT AS doc_count FROM lineitem " +
      "GROUP BY 1 HAVING count(*) >= 100 ORDER BY bucket"),
    "q_agg_terms_missing" -> ("SELECT coalesce(CASE WHEN lang = 'xx' THEN NULL ELSE lang END, " +
      "'N/A') AS key, count(*)::BIGINT AS doc_count FROM documents GROUP BY 1 " +
      "ORDER BY doc_count DESC, key LIMIT 10"),
    "q_agg_terms_order" -> ("SELECT o_orderpriority AS key, count(*)::BIGINT AS doc_count, " +
      "round(avg(o_totalprice), 4) AS avg_price FROM orders GROUP BY 1 " +
      "ORDER BY avg_price DESC, key LIMIT 3"),
    "q_agg_terms_partition" -> (s"SELECT p_name AS key, count(*)::BIGINT AS doc_count " +
      s"FROM part WHERE ${hexFold("p_name", 12)} % 4 = 1 GROUP BY 1 " +
      "ORDER BY doc_count DESC, key LIMIT 10"),
    "q_agg_stats" -> ("SELECT count(l_extendedprice)::BIGINT AS cnt, round(min(l_extendedprice), 4) AS min_v, " +
      "round(max(l_extendedprice), 4) AS max_v, round(avg(l_extendedprice), 4) AS avg_v, " +
      "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_v FROM lineitem"),
    "q_agg_extended_stats" -> ("SELECT count(l_quantity)::BIGINT AS cnt, round(avg(l_quantity), 4) AS avg_v, " +
      "round(sum(l_quantity * l_quantity), 4) AS sum_sq, round(var_pop(l_quantity), 4) AS variance, " +
      "round(stddev_pop(l_quantity), 4) AS std_dev FROM lineitem"),
    "q_agg_percentiles" -> ("SELECT round(quantile_cont(l_extendedprice, 0.25), 4) AS p25, " +
      "round(quantile_cont(l_extendedprice, 0.50), 4) AS p50, round(quantile_cont(l_extendedprice, 0.95), 4) AS p95 FROM lineitem"),
    "q_agg_percentiles_tdigest" -> ("SELECT true AS p25_ok, true AS p50_ok, " +
      "true AS p95_ok, count(*)::BIGINT AS n FROM lineitem"),
    "q_agg_percentiles_hdr" -> ("WITH b AS (SELECT " +
      "floor(round(l_extendedprice / pow(10, floor(round(log10(l_extendedprice), 9)) - 2), 9)) * " +
      "pow(10, floor(round(log10(l_extendedprice), 9)) - 2) AS bucket " +
      "FROM lineitem WHERE l_extendedprice > 0), " +
      "c AS (SELECT bucket, count(*)::BIGINT AS c FROM b GROUP BY 1), " +
      "s AS (SELECT bucket, sum(c) OVER (ORDER BY bucket) AS cum, sum(c) OVER () AS n FROM c) " +
      "SELECT min(CASE WHEN cum >= n * 0.25 THEN bucket END) AS p25, " +
      "min(CASE WHEN cum >= n * 0.50 THEN bucket END) AS p50, " +
      "min(CASE WHEN cum >= n * 0.95 THEN bucket END) AS p95 FROM s"),
    "q_agg_cardinality" -> "SELECT count(DISTINCT l_partkey)::BIGINT AS cardinality FROM lineitem",
    "q_agg_histogram" -> ("SELECT CAST(floor(l_extendedprice / 5000.0) * 5000.0 AS DOUBLE) AS bucket, " +
      "count(*)::BIGINT AS doc_count FROM lineitem GROUP BY 1 ORDER BY bucket"),
    "q_agg_date_histogram" -> ("SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket, " +
      "count(*)::BIGINT AS doc_count FROM orders GROUP BY 1 ORDER BY bucket"),
    "q_agg_range" -> ("SELECT CASE WHEN o_totalprice < 1000.0 THEN '*-1000.0' " +
      "WHEN o_totalprice >= 1000.0 AND o_totalprice < 5000.0 THEN '1000.0-5000.0' " +
      "WHEN o_totalprice >= 5000.0 AND o_totalprice < 20000.0 THEN '5000.0-20000.0' " +
      "ELSE '20000.0-*' END AS bucket, count(*)::BIGINT AS doc_count, " +
      "round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_v " +
      "FROM orders GROUP BY 1 ORDER BY bucket"),
    "q_agg_filters" -> ("SELECT count_if(value > 75)::BIGINT AS high_value, " +
      "count_if(event_type = 'click')::BIGINT AS clicks, count_if(event_type = 'error')::BIGINT AS errors FROM events"),
    "q_time_series" -> ("WITH s AS (SELECT event_type, (user_id % 3)::VARCHAR AS shard, " +
      "epoch_ns(ts) AS tsn, value FROM events), " +
      s"t AS (SELECT ${hexFold("event_type || '|' || shard", 12)} AS _tsid, event_type, shard, " +
      "tsn, value FROM s) " +
      "SELECT _tsid, event_type, shard, count(*)::BIGINT AS doc_count, " +
      "min(tsn) // 1000000 AS ts_min, max(tsn) // 1000000 AS ts_max, " +
      "round(min(value), 4) AS value_min, round(max(value), 4) AS value_max, " +
      "round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS value_sum " +
      "FROM t GROUP BY 1, 2, 3 ORDER BY _tsid"),
    "q_agg_composite_date" -> ("WITH b AS (SELECT strftime(date_trunc('month', o_orderdate), " +
      "'%Y-%m-%d') AS month_key, o_orderpriority, count(*)::BIGINT AS doc_count " +
      "FROM orders GROUP BY 1, 2) " +
      "SELECT month_key, o_orderpriority, doc_count FROM b " +
      "WHERE month_key > '1995-06-01' OR (month_key = '1995-06-01' AND o_orderpriority > '3-MEDIUM') " +
      "ORDER BY month_key, o_orderpriority LIMIT 12"),
    "q_agg_composite_missing" -> ("SELECT CASE WHEN lang = 'xx' THEN NULL ELSE lang END " +
      "AS maybe_lang, source, count(*)::BIGINT AS doc_count FROM documents GROUP BY 1, 2 " +
      "ORDER BY maybe_lang ASC NULLS FIRST, source ASC LIMIT 15"),
    "q_agg_filters_other" -> ("SELECT count_if(value > 75)::BIGINT AS high_value, " +
      "count_if(event_type = 'click')::BIGINT AS clicks, " +
      "count_if(event_type = 'error')::BIGINT AS errors, " +
      "count_if(NOT (coalesce(value > 75, false) OR coalesce(event_type = 'click', false) " +
      "OR coalesce(event_type = 'error', false)))::BIGINT AS other_docs FROM events"),
    "q_agg_top_hits" -> ("SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM " +
      "(SELECT o_orderpriority, o_orderkey, o_totalprice, " +
      "row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) " +
      "WHERE rn <= 3 ORDER BY o_orderpriority, rn"),
    "q_agg_composite" -> ("SELECT lang, source, count(*)::BIGINT AS doc_count FROM documents " +
      "WHERE lang > 'de' OR (lang = 'de' AND source > 'src3') GROUP BY lang, source ORDER BY lang, source LIMIT 10"),
    "q_agg_nested" -> ("SELECT lang, source, count(*)::BIGINT AS doc_count, round(avg(n_chars), 4) AS avg_metric " +
      "FROM documents GROUP BY lang, source ORDER BY lang, source"),
    "q_agg_sig_terms" -> ("WITH terms AS (SELECT lang = 'en' AS fg, " +
      "unnest(list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0))) AS term FROM documents), " +
      "tot AS (SELECT count_if(lang = 'en')::DOUBLE AS fg_total, count(*)::DOUBLE AS bg_total FROM documents), " +
      "g AS (SELECT term, count_if(fg)::BIGINT AS fg_count, count(*)::BIGINT AS bg_count FROM terms GROUP BY term HAVING count_if(fg) >= 5) " +
      "SELECT term, fg_count, bg_count, " +
      "round((fg_count / fg_total) * ln((fg_count / fg_total) / (bg_count / bg_total)), 4) AS score " +
      "FROM g CROSS JOIN tot ORDER BY score DESC, term LIMIT 10"),
    "q_agg_sig_chi2" -> ("WITH terms AS (SELECT lang = 'en' AS fg, " +
      "unnest(list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0))) AS term FROM documents), " +
      "tot AS (SELECT count_if(lang = 'en')::DOUBLE AS fg_total, count(*)::DOUBLE AS bg_total FROM documents), " +
      "g AS (SELECT term, count_if(fg)::BIGINT AS fg_count, count(*)::BIGINT AS bg_count FROM terms GROUP BY term HAVING count_if(fg) >= 5) " +
      "SELECT term, fg_count, bg_count, " +
      "round(pow((fg_count / fg_total) - (bg_count / bg_total), 2) / ((fg_count / fg_total) + (bg_count / bg_total)), 6) AS score " +
      "FROM g CROSS JOIN tot ORDER BY score DESC, term LIMIT 10"),
    "q_agg_sig_jlh" -> ("WITH terms AS (SELECT lang = 'en' AS fg, " +
      "unnest(list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0))) AS term FROM documents), " +
      "tot AS (SELECT count_if(lang = 'en')::DOUBLE AS fg_total, count(*)::DOUBLE AS bg_total FROM documents), " +
      "g AS (SELECT term, count_if(fg)::BIGINT AS fg_count, count(*)::BIGINT AS bg_count FROM terms GROUP BY term HAVING count_if(fg) >= 5) " +
      "SELECT term, fg_count, bg_count, " +
      "round(((fg_count / fg_total) - (bg_count / bg_total)) * ((fg_count / fg_total) / (bg_count / bg_total)), 6) AS score " +
      "FROM g CROSS JOIN tot ORDER BY score DESC, term LIMIT 10"),
    "q_agg_sig_mi" -> ("WITH terms AS (SELECT lang = 'en' AS fg, " +
      "unnest(list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0))) AS term FROM documents), " +
      "tot AS (SELECT count_if(lang = 'en')::DOUBLE AS fg_total, count(*)::DOUBLE AS bg_total FROM documents), " +
      "g AS (SELECT term, count_if(fg)::BIGINT AS fg_count, count(*)::BIGINT AS bg_count FROM terms GROUP BY term HAVING count_if(fg) >= 5), " +
      "c AS (SELECT term, fg_count, bg_count, bg_total AS n, fg_count::DOUBLE AS n11, " +
      "(bg_count - fg_count)::DOUBLE AS n10, (fg_total - fg_count)::DOUBLE AS n01, " +
      "(bg_total - bg_count - fg_total + fg_count)::DOUBLE AS n00, " +
      "bg_count::DOUBLE AS r1, (bg_total - bg_count)::DOUBLE AS r0, " +
      "fg_total AS c1, (bg_total - fg_total) AS c0 FROM g CROSS JOIN tot) " +
      "SELECT term, fg_count, bg_count, round(" +
      "(CASE WHEN n11 > 0 THEN (n11/n) * log2(n*n11/(r1*c1)) ELSE 0 END) + " +
      "(CASE WHEN n10 > 0 THEN (n10/n) * log2(n*n10/(r1*c0)) ELSE 0 END) + " +
      "(CASE WHEN n01 > 0 THEN (n01/n) * log2(n*n01/(r0*c1)) ELSE 0 END) + " +
      "(CASE WHEN n00 > 0 THEN (n00/n) * log2(n*n00/(r0*c0)) ELSE 0 END), 6) AS score " +
      "FROM c ORDER BY score DESC, term LIMIT 10"),
    "q_agg_sig_gnd" -> ("WITH terms AS (SELECT lang = 'en' AS fg, " +
      "unnest(list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0))) AS term FROM documents), " +
      "tot AS (SELECT count_if(lang = 'en')::DOUBLE AS fg_total, count(*)::DOUBLE AS bg_total FROM documents), " +
      "g AS (SELECT term, count_if(fg)::BIGINT AS fg_count, count(*)::BIGINT AS bg_count FROM terms GROUP BY term HAVING count_if(fg) >= 5) " +
      "SELECT term, fg_count, bg_count, " +
      "round(1 - (greatest(ln(bg_count::DOUBLE), ln(fg_total)) - ln(fg_count::DOUBLE)) / " +
      "(ln(bg_total) - least(ln(bg_count::DOUBLE), ln(fg_total))), 6) AS score " +
      "FROM g CROSS JOIN tot ORDER BY score DESC, term LIMIT 10"),
    "q_agg_sig_keyword" -> ("WITH tot AS (SELECT count_if(lang = 'de')::DOUBLE AS fg_total, count(*)::DOUBLE AS bg_total FROM documents), " +
      "g AS (SELECT source AS term, count_if(lang = 'de')::BIGINT AS fg_count, count(*)::BIGINT AS bg_count " +
      "FROM documents GROUP BY source HAVING count_if(lang = 'de') >= 2) " +
      "SELECT term, fg_count, bg_count, " +
      "round((fg_count / fg_total) * ln((fg_count / fg_total) / (bg_count / bg_total)), 4) AS score " +
      "FROM g CROSS JOIN tot ORDER BY score DESC, term LIMIT 10"),
    "q_agg_terms_error" -> (s"WITH s AS (SELECT source AS key, ${hexFold("'shard:' || doc_id::VARCHAR", 12)} % 4 AS sh FROM documents), " +
      "ps AS (SELECT sh, key, count(*)::BIGINT AS cnt FROM s GROUP BY sh, key), " +
      "rk AS (SELECT *, row_number() OVER (PARTITION BY sh ORDER BY cnt DESC, key) AS rk FROM ps), " +
      "kept AS (SELECT * FROM rk WHERE rk <= 5), " +
      "th AS (SELECT sh, CASE WHEN count(*) < 5 THEN 0 ELSE min(cnt) END AS th FROM kept GROUP BY sh), " +
      "tot AS (SELECT sum(th) AS total FROM th), " +
      "m AS (SELECT key, sum(cnt)::BIGINT AS doc_count, sum(th) AS rep FROM kept JOIN th USING (sh) GROUP BY key) " +
      "SELECT key, doc_count, (total - rep)::BIGINT AS doc_count_error_upper_bound " +
      "FROM m CROSS JOIN tot ORDER BY doc_count DESC, key LIMIT 10"),
    "q_count" -> ("SELECT count(*)::BIGINT AS count FROM documents " +
      "WHERE lang = 'en' AND n_chars >= 200"),
    "q_source_filter" -> ("SELECT doc_id, n_chars FROM documents " +
      "WHERE lang = 'en' ORDER BY doc_id"),
    "q_agg_sig_bg" -> ("WITH terms AS (SELECT (lang = 'de' AND n_chars > 100) AS fg, n_chars > 100 AS bg, " +
      "unnest(list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0))) AS term FROM documents), " +
      "tot AS (SELECT count_if(lang = 'de' AND n_chars > 100)::DOUBLE AS fg_total, count_if(n_chars > 100)::DOUBLE AS bg_total FROM documents), " +
      "g AS (SELECT term, count_if(fg)::BIGINT AS fg_count, count_if(bg)::BIGINT AS bg_count FROM terms GROUP BY term HAVING count_if(fg) >= 5) " +
      "SELECT term, fg_count, bg_count, " +
      "round((fg_count / fg_total) * ln((fg_count / fg_total) / (bg_count / bg_total)), 4) AS score " +
      "FROM g CROSS JOIN tot ORDER BY score DESC, term LIMIT 10"),
    "q_agg_categorize" -> ("WITH m AS (SELECT list_filter(" +
      "regexp_split_to_array(lower(concat_ws(' ', event_type, props)), '[^a-z0-9]+'), x -> len(x) > 0) AS toks FROM events), " +
      "c AS (SELECT array_to_string(list_filter(toks, t -> NOT regexp_matches(t, '^[0-9]+$'))[1:4], ' ') AS category FROM m) " +
      "SELECT category, count(*)::BIGINT AS doc_count FROM c WHERE len(category) > 0 " +
      "GROUP BY category ORDER BY doc_count DESC, category"),
    "q_agg_global" -> ("SELECT count(*)::BIGINT AS global_count, round(avg(o_totalprice), 4) AS global_avg, " +
      "count_if(o_orderstatus = 'F')::BIGINT AS filtered_count, " +
      "round(avg(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 4) AS filtered_avg FROM orders"),

    "q_agg_top_metrics" -> ("SELECT lang, max_by(n_chars, doc_id) AS latest_n_chars, " +
      "max(doc_id) AS latest_doc FROM documents GROUP BY lang ORDER BY lang"),
    "q_agg_top_metrics_multi" -> ("SELECT lang, max_by(n_chars, doc_id) AS latest_n_chars, " +
      "max_by(source, doc_id) AS latest_source, max(doc_id) AS latest_doc " +
      "FROM documents GROUP BY lang ORDER BY lang"),
    "q_agg_date_histogram_offset" -> ("SELECT date_trunc('month', o_orderdate - INTERVAL 10 DAY) " +
      "+ INTERVAL 10 DAY AS bucket, count(*)::BIGINT AS doc_count FROM orders " +
      "GROUP BY 1 ORDER BY bucket"),
    "q_agg_string_stats" -> ("SELECT count(text)::BIGINT AS cnt, min(length(text))::INT AS min_length, " +
      "max(length(text))::INT AS max_length, round(avg(length(text)), 4) AS avg_length FROM documents"),
    "q_agg_sampler" -> ("WITH h AS (SELECT *, list_reduce(list_prepend(0::BIGINT, " +
      "list_transform(regexp_extract_all(substr(md5(doc_id::VARCHAR), 1, 4), '.'), " +
      "c -> (CASE WHEN ascii(c) <= 57 THEN ascii(c) - 48 ELSE ascii(c) - 87 END)::BIGINT)), (a, v) -> a * 16 + v) AS hv " +
      "FROM documents) SELECT count(*)::BIGINT AS sample_size, round(avg(n_chars), 4) AS avg_n_chars " +
      "FROM h WHERE hv % 5 = 0"),
    "q_agg_date_range" -> ("SELECT CASE WHEN o_orderdate < TIMESTAMP '1997-01-01' THEN '*-1997' " +
      "WHEN o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1999-01-01' THEN '1997-1999' " +
      "ELSE '1999-*' END AS bucket, count(*)::BIGINT AS doc_count FROM orders GROUP BY 1 ORDER BY bucket"),
    "q_tpch_q6" -> ("SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,8))) AS DOUBLE), 4) AS revenue " +
      "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' " +
      "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"),
    "q_agg_adjacency" -> ("SELECT count_if(o_orderpriority = '1-URGENT')::BIGINT AS urgent, " +
      "count_if(o_totalprice > 20000)::BIGINT AS big, count_if(o_orderstatus = 'O')::BIGINT AS open, " +
      "count_if(o_orderpriority = '1-URGENT' AND o_totalprice > 20000)::BIGINT AS \"urgent&big\", " +
      "count_if(o_orderpriority = '1-URGENT' AND o_orderstatus = 'O')::BIGINT AS \"urgent&open\", " +
      "count_if(o_totalprice > 20000 AND o_orderstatus = 'O')::BIGINT AS \"big&open\" FROM orders"),
    "q_agg_rare_terms" -> ("SELECT source AS key, count(*)::BIGINT AS doc_count FROM documents " +
      "GROUP BY source HAVING count(*) <= 30 ORDER BY doc_count, key LIMIT 10"),
    "q_agg_weighted_avg" -> ("SELECT round(CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(28,8))) AS DOUBLE) / " +
      "CAST(sum(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE), 4) AS weighted_avg FROM lineitem"),
    "q_agg_matrix_stats" -> ("SELECT count(*)::BIGINT AS cnt, " +
      "round(covar_pop(l_quantity, l_extendedprice), 4) AS covariance, " +
      "round(corr(l_quantity, l_extendedprice), 4) AS correlation FROM lineitem"),
    "q_agg_ewma" -> ("WITH b AS (SELECT epoch_us(ts) // 3600000000 AS bucket, count(*)::BIGINT AS n " +
      "FROM events GROUP BY 1), " +
      "w AS (SELECT bucket, n, list(n::DOUBLE) OVER " +
      "(ORDER BY bucket ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS arr FROM b) " +
      "SELECT bucket, n, round(list_reduce(arr, (a, x) -> x * 0.3 + a * 0.7), 4) AS ewma " +
      "FROM w ORDER BY bucket"),
    "q_agg_histogram_field" -> ("WITH b AS (SELECT user_id, floor(value / 100.0) * 100.0 AS bv, " +
      "count(*)::BIGINT AS c FROM events GROUP BY 1, 2) " +
      "SELECT sum(c)::BIGINT AS value_count, " +
      "CAST(sum(CAST(bv * c AS DECIMAL(18,4))) AS DOUBLE) AS total, " +
      "min(bv) AS lo, max(bv) AS hi FROM b"),
    "q_geo_centroid" -> (GeoCte.replace("FROM customer", "FROM customer WHERE c_mktsegment = 'BUILDING'") +
      " SELECT round(avg(lat), 4) AS centroid_lat, round(avg(lon), 4) AS centroid_lon, " +
      "count(*)::BIGINT AS doc_count FROM g"),
    // geohash p=4: 20 interleaved bits (lon 10 + lat 10), base32 chars.
    // Same fixed-point floor construction as the GeoHash kernel —
    // pure arithmetic, so both engines agree bit-for-bit.
    "q_geo_grid" -> (GeoCte + ", b AS (SELECT " +
      "least(CAST(floor((lon + 180.0) / 360.0 * 1024) AS BIGINT), 1023) AS loni, " +
      "least(CAST(floor((lat + 90.0) / 180.0 * 1024) AS BIGINT), 1023) AS lati FROM g), " +
      "v AS (SELECT list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 20), k -> " +
      "CASE WHEN k % 2 = 0 THEN (loni >> (9 - k // 2)::INT) & 1 ELSE (lati >> (9 - k // 2)::INT) & 1 END)), " +
      "(a, b) -> a * 2 + b) AS v FROM b), " +
      "h AS (SELECT substr('0123456789bcdefghjkmnpqrstuvwxyz', (((v >> 15) & 31))::INT + 1, 1) || " +
      "substr('0123456789bcdefghjkmnpqrstuvwxyz', (((v >> 10) & 31))::INT + 1, 1) || " +
      "substr('0123456789bcdefghjkmnpqrstuvwxyz', (((v >> 5) & 31))::INT + 1, 1) || " +
      "substr('0123456789bcdefghjkmnpqrstuvwxyz', ((v & 31))::INT + 1, 1) AS key FROM v) " +
      "SELECT key, count(*)::BIGINT AS doc_count FROM h GROUP BY key " +
      "ORDER BY doc_count DESC, key LIMIT 15"),
    "q_agg_composite_geo" -> (GeoCte.replace("SELECT c_custkey,", "SELECT c_custkey, c_mktsegment AS seg,")
      + ", c AS (SELECT seg, greatest(least(lat, 85.05112878), -85.05112878) AS latc, lon FROM g), " +
      "tt AS (SELECT seg, '4/' || CAST(least(floor((lon + 180.0) / 360.0 * 16.0), 15.0) AS BIGINT)::VARCHAR || '/' || " +
      "CAST(greatest(least(floor(round((1.0 - ln(tan(radians(latc)) + 1.0 / cos(radians(latc))) / pi()) / 2.0 * 16.0, 9)), 15.0), 0.0) AS BIGINT)::VARCHAR AS tile FROM c), " +
      "b AS (SELECT tile, seg, count(*)::BIGINT AS doc_count FROM tt GROUP BY 1, 2) " +
      "SELECT tile, seg, doc_count FROM b WHERE tile > '4/11/7' OR (tile = '4/11/7' AND seg > 'BUILDING') " +
      "ORDER BY tile, seg LIMIT 12"),
    "q_geo_tile" -> (GeoCte + ", c AS (SELECT greatest(least(lat, 85.05112878), -85.05112878) AS latc, lon FROM g), " +
      "t AS (SELECT CAST(least(floor((lon + 180.0) / 360.0 * 64.0), 63.0) AS BIGINT) AS x, " +
      "CAST(greatest(least(floor(round((1.0 - ln(tan(radians(latc)) + 1.0 / cos(radians(latc))) / pi()) / 2.0 * 64.0, 9)), 63.0), 0.0) AS BIGINT) AS y FROM c) " +
      "SELECT '6/' || x::VARCHAR || '/' || y::VARCHAR AS key, count(*)::BIGINT AS doc_count " +
      "FROM t GROUP BY 1 ORDER BY doc_count DESC, key LIMIT 15"),
    "q_search_body" -> ("WITH r AS (SELECT source, CAST(trunc(n_chars / 100.0) AS BIGINT) AS kchars " +
      "FROM documents WHERE lang = 'en') " +
      "SELECT kchars AS by_k, count(*)::BIGINT AS doc_count, " +
      "count(DISTINCT source)::BIGINT AS srcs FROM r WHERE kchars >= 1 " +
      "GROUP BY 1 ORDER BY by_k"),
    "q_search_paging" -> ("SELECT * FROM documents WHERE lang = 'de' " +
      "ORDER BY n_chars DESC, doc_id ASC LIMIT 10 OFFSET 5"),
    "q_aggs_json" -> ("SELECT lang AS by_lang, source AS by_src, count(*)::BIGINT AS doc_count, " +
      "round(avg(n_chars), 4) AS avg_chars, count(n_chars)::BIGINT AS n_vals " +
      "FROM documents GROUP BY 1, 2 ORDER BY by_lang, by_src"),
    "q_aggs_json_date" -> ("SELECT (epoch_us(ts) // 86400000000) * 86400000000000 AS by_day, " +
      "count(*)::BIGINT AS doc_count, count(DISTINCT user_id)::BIGINT AS users, " +
      "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total FROM events GROUP BY 1 ORDER BY by_day"),
    "q_aggs_json_range" -> ("WITH r AS (SELECT value, CASE WHEN value < 100 THEN '*-100.0' " +
      "WHEN value >= 100 AND value < 300 THEN '100.0-300.0' " +
      "WHEN value >= 300 THEN '300.0-*' END AS vr FROM events) " +
      "SELECT vr, count(*)::BIGINT AS doc_count, max(value) AS hi FROM r " +
      "WHERE vr IS NOT NULL GROUP BY vr ORDER BY vr"),
    "q_mvt" -> (GeoCte + ", c AS (SELECT lat, lon, greatest(least(lat, 85.05112878), -85.05112878) AS latc FROM g), " +
      "t AS (SELECT lat, lon, CAST(least(floor((lon + 180.0) / 360.0 * 32.0), 31.0) AS BIGINT) AS x, " +
      "CAST(greatest(least(floor(round((1.0 - ln(tan(radians(latc)) + 1.0 / cos(radians(latc))) / pi()) / 2.0 * 32.0, 9)), 31.0), 0.0) AS BIGINT) AS y FROM c), " +
      "a AS (SELECT x, y, count(*)::BIGINT AS doc_count, round(avg(lat), 4) AS centroid_lat, round(avg(lon), 4) AS centroid_lon FROM t GROUP BY x, y) " +
      "SELECT '5/' || x::VARCHAR || '/' || y::VARCHAR AS key, doc_count, centroid_lat, centroid_lon, " +
      "round(x / 32.0 * 360.0 - 180.0, 6) AS west, round((x + 1) / 32.0 * 360.0 - 180.0, 6) AS east, " +
      "round(degrees(atan((exp(pi() * (1.0 - 2.0 * y / 32.0)) - exp(-(pi() * (1.0 - 2.0 * y / 32.0)))) / 2.0)), 6) AS north, " +
      "round(degrees(atan((exp(pi() * (1.0 - 2.0 * (y + 1) / 32.0)) - exp(-(pi() * (1.0 - 2.0 * (y + 1) / 32.0)))) / 2.0)), 6) AS south " +
      "FROM a ORDER BY doc_count DESC, key LIMIT 12"),
    "q_autocomplete" -> (TokCte + " SELECT token, count(*)::BIGINT AS freq FROM " +
      "(SELECT unnest(toks) AS token FROM tok) WHERE token LIKE 's%' " +
      "GROUP BY token ORDER BY freq DESC, token LIMIT 8"),

    // ---- D ----
    "q_join_enrich" -> ("SELECT r_name, count(*)::BIGINT AS n_customers, round(avg(c_acctbal), 4) AS avg_bal " +
      "FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
      "GROUP BY r_name ORDER BY r_name"),
    "q_join_revenue" -> ("SELECT l_orderkey, round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue " +
      "FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey " +
      "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01' " +
      "GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10"),
    "q_tpch_q5" -> ("SELECT n_name, round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,8))) AS DOUBLE), 4) AS revenue " +
      "FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey " +
      "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
      "JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
      "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' " +
      "GROUP BY n_name ORDER BY revenue DESC, n_name"),
    "q_semi_join" -> ("SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
      "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 10000) ORDER BY c_custkey"),
    "q_anti_join" -> ("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
      "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 24000) ORDER BY c_custkey"),
    "q_range_field" -> ("SELECT " +
      "count_if(o_orderdate <= TIMESTAMP '1997-08-01' AND o_orderdate + INTERVAL 90 DAY >= TIMESTAMP '1997-06-01')::BIGINT AS n_intersects, " +
      "count_if(o_orderdate >= TIMESTAMP '1997-06-01' AND o_orderdate + INTERVAL 90 DAY <= TIMESTAMP '1997-08-01')::BIGINT AS n_within, " +
      "count_if(o_orderdate <= TIMESTAMP '1997-06-01' AND o_orderdate + INTERVAL 90 DAY >= TIMESTAMP '1997-08-01')::BIGINT AS n_contains " +
      "FROM orders"),
    "q_interval_join" -> ("WITH a AS (SELECT doc_id, (doc_id * 7 % 500)::DOUBLE AS lo, (doc_id * 7 % 500 + 9)::DOUBLE AS hi FROM documents WHERE source = 'src0'), " +
      "b AS (SELECT doc_id, (doc_id * 7 % 500)::DOUBLE AS lo, (doc_id * 7 % 500 + 9)::DOUBLE AS hi FROM documents WHERE source = 'src1') " +
      "SELECT a.doc_id AS a_id, b.doc_id AS b_id FROM a JOIN b ON a.lo <= b.hi AND a.hi >= b.lo " +
      "ORDER BY a_id, b_id"),
    "q_asof" -> ("WITH v AS (SELECT user_id, epoch_ns(ts) AS tn, max(value) AS view_value FROM events " +
      "WHERE event_type = 'view' GROUP BY user_id, epoch_ns(ts)), " +
      "c AS (SELECT event_id, user_id, epoch_ns(ts) AS tn, value FROM events WHERE event_type = 'click') " +
      "SELECT c.event_id, c.user_id, c.value, v.view_value AS asof_view_value " +
      "FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.tn >= v.tn ORDER BY c.event_id"),
    "q_window_topn" -> ("SELECT o_custkey, o_orderkey, o_totalprice, rn FROM " +
      "(SELECT o_custkey, o_orderkey, o_totalprice, " +
      "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) " +
      "WHERE rn <= 2 ORDER BY o_custkey, rn"),

    "q_sort_mode" -> ("WITH q AS (SELECT l_orderkey, list_sort(list(l_quantity)) AS ql " +
      "FROM lineitem GROUP BY 1), " +
      "m AS (SELECT o_orderkey, (ql[(len(ql)+1)//2] + ql[len(ql)//2+1]) / 2.0 AS med " +
      "FROM orders JOIN q ON o_orderkey = l_orderkey) " +
      "SELECT o_orderkey, round(med, 4) AS qty_median FROM m " +
      "ORDER BY round(med, 4) DESC, o_orderkey LIMIT 100"),
    "q_sort_nested" -> ("WITH m AS (SELECT l_orderkey, " +
      "min(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS k FROM lineitem GROUP BY 1) " +
      "SELECT o_orderkey, round(k, 4) AS min_r_qty FROM orders JOIN m ON o_orderkey = l_orderkey " +
      "ORDER BY min_r_qty ASC NULLS LAST, o_orderkey LIMIT 100"),
    "q_sort_geo" -> (GeoCte + " SELECT c_custkey, dist_km FROM (SELECT c_custkey, " +
      "round(2 * 6371 * asin(sqrt(pow(sin(radians(0.0 - lat) / 2), 2) + " +
      "cos(radians(lat)) * cos(radians(0.0)) * pow(sin(radians(0.0 - lon) / 2), 2))), 4) AS dist_km " +
      "FROM g) ORDER BY dist_km, c_custkey LIMIT 50"),
    "q_sort_script" -> ("SELECT o_orderkey, round(abs(o_totalprice - 150000.0), 4) AS sort_key " +
      "FROM orders ORDER BY round(abs(o_totalprice - 150000.0), 4), o_orderkey LIMIT 20"),
    "q_sort_missing" -> ("SELECT o_orderkey, CASE WHEN o_orderpriority = '1-URGENT' " +
      "THEN NULL ELSE o_orderpriority END AS pri FROM orders " +
      "ORDER BY pri ASC NULLS FIRST, o_orderkey LIMIT 100"),

    "q_has_child" -> ("SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey IN " +
      "(SELECT l_orderkey FROM lineitem WHERE l_quantity > 45 GROUP BY l_orderkey HAVING count(*) >= 3) " +
      "ORDER BY o_orderkey"),
    "q_has_parent" -> ("SELECT l_orderkey, l_linenumber FROM lineitem WHERE EXISTS " +
      "(SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND o_orderpriority = '1-URGENT') " +
      "ORDER BY l_orderkey, l_linenumber"),
    "q_nested" -> ("SELECT o_orderkey, o_totalprice FROM orders WHERE EXISTS " +
      "(SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 48 " +
      "AND l_returnflag = 'A') ORDER BY o_orderkey"),
    "q_nested_inner" -> ("SELECT o_orderkey, count(*)::INT AS n_inner, " +
      "round(sum(l_quantity), 4) AS inner_qty FROM orders JOIN lineitem ON l_orderkey = o_orderkey " +
      "WHERE l_quantity > 48 AND l_returnflag = 'A' GROUP BY 1 ORDER BY o_orderkey"),

    // ---- E ----
    "q_upsert_id" -> ("SELECT user_id, event_type AS last_type, value AS last_value FROM events " +
      "QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) DESC, event_id DESC) = 1 ORDER BY user_id"),
    // the write-path oracle reads the parquet the query itself WROTE
    // (Verify runs the query before the checker runs the oracle), so
    // rows+schema+hash all verify the on-disk bytes, not a re-derive
    // Spark URL-escapes partition-dir values (mime=image%2Fpng) and
    // unescapes them on read; DuckDB's hive_partitioning reads the
    // raw dir name, so the oracle undoes the one escape mime can hit
    "q_write_roundtrip" -> ("SELECT replace(mime, '%2F', '/') AS mime, count(*) AS n " +
      s"FROM read_parquet('/tmp/graft_roundtrip_${System.getProperty("user.name")}/*/*.parquet', " +
      "hive_partitioning=true) GROUP BY 1 ORDER BY 1"),
    "q_geo_distance" -> (GeoCte + " SELECT * FROM (SELECT c_custkey, " +
      "round(2 * 6371 * asin(sqrt(pow(sin(radians(0.0 - lat) / 2), 2) + " +
      "cos(radians(lat)) * cos(radians(0.0)) * pow(sin(radians(0.0 - lon) / 2), 2))), 4) AS dist_km " +
      "FROM g) WHERE dist_km <= 3000.0 ORDER BY c_custkey"),
    "q_geo_bbox" -> (GeoCte + " SELECT c_custkey, lat, lon FROM g " +
      "WHERE lat <= 40.0 AND lat >= -30.0 AND lon >= -60.0 AND lon <= 90.0 ORDER BY c_custkey"),

"q_ann_ivf" -> ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
      "n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e), " +
      "cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n WHERE vec_id < 16), " +
      "asg AS (SELECT id, cent_id FROM (SELECT c.vec_id AS id, cents.cent_id, " +
      "row_number() OVER (PARTITION BY c.vec_id ORDER BY round(list_reduce(list_prepend(0.0, list_transform(range(1, len(c.v) + 1), i -> c.v[i] * cv[i])), (x, y) -> x + y) / (c.nrm * cnrm), 4) DESC, cents.cent_id) AS rn " +
      "FROM n c CROSS JOIN cents) WHERE rn = 1), " +
      "qp AS (SELECT query_id, cent_id FROM (SELECT q.vec_id AS query_id, cents.cent_id, " +
      "row_number() OVER (PARTITION BY q.vec_id ORDER BY round(list_reduce(list_prepend(0.0, list_transform(range(1, len(q.v) + 1), i -> q.v[i] * cv[i])), (x, y) -> x + y) / (q.nrm * cnrm), 4) DESC, cents.cent_id) AS rn " +
      "FROM n q CROSS JOIN cents WHERE q.vec_id < 5) WHERE rn <= 4), " +
      "cand AS (SELECT DISTINCT query_id, id FROM qp JOIN asg USING (cent_id) WHERE id <> query_id), " +
      "p AS (SELECT query_id, id, round(list_reduce(list_prepend(0.0, list_transform(range(1, len(c.v) + 1), i -> c.v[i] * q.v[i])), (x, y) -> x + y) / (c.nrm * q.nrm), 4) AS cosine " +
      "FROM cand JOIN n c ON c.vec_id = cand.id JOIN n q ON q.vec_id = cand.query_id) " +
      "SELECT query_id, id, cosine, rank FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rank FROM p) " +
      "WHERE rank <= 10 ORDER BY query_id, rank"),
"q_tpch_q1" -> ("SELECT l_returnflag, l_linestatus, " +
      "round(CAST(sum(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE), 4) AS sum_qty, " +
      "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,8))) AS DOUBLE), 4) AS sum_base_price, " +
      "round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,8))) AS DOUBLE), 4) AS sum_disc_price, " +
      "round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,8))) AS DOUBLE), 4) AS sum_charge, " +
      "round(avg(l_quantity), 4) AS avg_qty, round(avg(l_extendedprice), 4) AS avg_price, " +
      "round(avg(l_discount), 4) AS avg_disc, count(*)::BIGINT AS count_order " +
      "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
      "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    // ---- F ----
    "q_dedup_exact" -> ("SELECT md5(props) AS content_hash, count(*)::BIGINT AS n_dups, min(event_id) AS keep_id " +
      "FROM events GROUP BY 1 HAVING count(*) >= 2 ORDER BY keep_id"),
    "q_dedup_minhash" -> (TokCte + MinhashCtes +
      " SELECT id1, id2, jaccard FROM vp ORDER BY id1, id2"),
    // connected components over vp: recursive reachable-min label
    "q_dedup_cluster" -> (TokCte.replace("WITH ", "WITH RECURSIVE ") + MinhashCtes + ", " +
      "e AS (SELECT id1 AS a, id2 AS b FROM vp UNION SELECT id2, id1 FROM vp), " +
      "n AS (SELECT DISTINCT a AS id FROM e), " +
      "r AS (SELECT id, id AS m FROM n UNION SELECT e.a, r.m FROM e JOIN r ON e.b = r.id) " +
      "SELECT id AS doc_id, min(m) AS cluster_id FROM r GROUP BY id ORDER BY doc_id"),
    "q_dedup_canonical" -> (TokCte.replace("WITH ", "WITH RECURSIVE ") + MinhashCtes + ", " +
      "e AS (SELECT id1 AS a, id2 AS b FROM vp UNION SELECT id2, id1 FROM vp), " +
      "n AS (SELECT DISTINCT a AS id FROM e), " +
      "r AS (SELECT id, id AS m FROM n UNION SELECT e.a, r.m FROM e JOIN r ON e.b = r.id), " +
      "cl AS (SELECT id AS doc_id, min(m) AS cluster_id FROM r GROUP BY id), " +
      "j AS (SELECT cl.cluster_id, cl.doc_id, d.n_chars::DOUBLE AS q, " +
      "count(*) OVER (PARTITION BY cl.cluster_id) AS members, " +
      "row_number() OVER (PARTITION BY cl.cluster_id ORDER BY d.n_chars DESC, cl.doc_id) AS rn " +
      "FROM cl JOIN documents d ON d.doc_id = cl.doc_id) " +
      "SELECT cluster_id, members::BIGINT AS members, doc_id AS canonical_id, q AS best_quality " +
      "FROM j WHERE rn = 1 ORDER BY cluster_id"),
    "q_dedup_incremental" -> (TokCte + MinhashCtes + ", " +
      "dup AS (SELECT CASE WHEN id1 % 2 = 1 THEN id1 ELSE id2 END AS doc_id " +
      "FROM vp WHERE id1 % 2 <> id2 % 2) " +
      "SELECT doc_id FROM documents WHERE doc_id % 2 = 1 " +
      "AND doc_id NOT IN (SELECT doc_id FROM dup) ORDER BY doc_id"),
    "q_dedup_substring" -> (TokCte +
      s", th AS (SELECT doc_id, list_transform(toks, t -> ${hexFold("t", 12)} % 1000000007) AS hs FROM tok WHERE len(toks) >= 20)" +
      ", w AS (SELECT doc_id, unnest(list_transform(range(1, len(hs) - 18), i -> " +
      "list_reduce(list_prepend(0::BIGINT, hs[i:i+19]), (a, v) -> (a * 31 + v) % 1000000007))) AS h FROM th)" +
      ", f AS (SELECT h, count(*)::BIGINT AS n FROM w GROUP BY h) " +
      "SELECT doc_id AS id, count(*)::BIGINT AS n_spans, " +
      "sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::BIGINT AS dup_spans, " +
      "round(CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS dup_ratio " +
      "FROM w JOIN f USING (h) GROUP BY doc_id ORDER BY id"),
    "q_dedup_bloom" -> ("WITH seen AS (SELECT DISTINCT substring(md5(text), 1, 15) AS h " +
      "FROM documents WHERE doc_id < 300), " +
      "b AS (SELECT doc_id, substring(md5(text), 1, 15) AS h FROM documents WHERE doc_id >= 200) " +
      "SELECT doc_id FROM b WHERE h NOT IN (SELECT h FROM seen) ORDER BY doc_id"),
    "q_mix_sample" -> ("WITH c AS (SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY source), " +
      "mn AS (SELECT min(n_docs) AS n_min FROM c), " +
      "rt AS (SELECT source, sqrt(n_min::DOUBLE / n_docs::DOUBLE) AS rate FROM c CROSS JOIN mn) " +
      s"SELECT rt.source, count(*)::BIGINT AS n_kept FROM documents d JOIN rt ON d.source = rt.source " +
      s"WHERE ${hexFold("'mix:' || d.doc_id::VARCHAR", 12)} / 281474976710656.0 < rt.rate " +
      "GROUP BY rt.source ORDER BY rt.source"),
    "q_esql_rerank" -> (TokCte + " SELECT doc_id, CAST(round(" +
      "1.0 * len(list_filter(toks, t -> t = 'fast')) + " +
      "1.0 * len(list_filter(toks, t -> t = 'hash')) + " +
      "1.0 * len(list_filter(toks, t -> t = 'merge')), 4) AS DOUBLE) AS _score " +
      "FROM tok WHERE list_contains(toks, 'merge') " +
      "ORDER BY _score DESC, doc_id LIMIT 10"),
    // 64-bit simhash as TWO 32-bit halves (hi = bits 1..32, lo = bits
    // 33..64): folding all 64 into one BIGINT overflows DuckDB, but
    // each half stays < 2^32 and hamming is the sum of half-hammings.
    "q_dedup_lines" -> ("WITH p AS (SELECT doc_id, 'home | about | ' || source || chr(10) || text || " +
      "chr(10) || 'copyright 2024 example.com' AS page FROM documents), " +
      "l AS (SELECT doc_id, string_split(page, chr(10)) AS ls FROM p), " +
      "x AS (SELECT doc_id, unnest(ls) AS line FROM l), " +
      "bp AS (SELECT line FROM (SELECT line, count(DISTINCT doc_id) AS nd FROM x " +
      "WHERE len(trim(line)) > 0 GROUP BY line) WHERE nd > 4), " +
      "bpl AS (SELECT coalesce(list(line), []) AS bl FROM bp), " +
      "cl AS (SELECT doc_id, list_filter(ls, y -> NOT list_contains(bl, y)) AS kept " +
      "FROM l CROSS JOIN bpl) " +
      "SELECT doc_id, len(kept)::BIGINT AS n_lines, md5(array_to_string(kept, chr(10))) AS h " +
      "FROM cl WHERE len(kept) > 0 ORDER BY doc_id"),
    "q_dedup_simhash" -> ("WITH tok AS (SELECT doc_id, list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS toks FROM documents), " +
      "md AS (SELECT doc_id, list_transform(toks, t -> md5(t)) AS md5s FROM tok), " +
      "bits AS (SELECT doc_id, list_transform(range(0, 64), j -> CASE WHEN " +
      "list_reduce(list_prepend(0, list_transform(md5s, m -> CASE WHEN " +
      "(((CASE WHEN ascii(substr(m, (j // 4)::INT + 1, 1)) <= 57 THEN ascii(substr(m, (j // 4)::INT + 1, 1)) - 48 " +
      "ELSE ascii(substr(m, (j // 4)::INT + 1, 1)) - 87 END) // (2 ** (3 - j % 4))::INT) % 2) = 1 THEN 1 ELSE -1 END)), (a, v) -> a + v) > 0 " +
      "THEN 1::BIGINT ELSE 0::BIGINT END) AS bs FROM md), " +
      "sig AS (SELECT doc_id, list_reduce(list_prepend(0::BIGINT, bs[1:32]), (a, b) -> a * 2 + b) AS hi, " +
      "list_reduce(list_prepend(0::BIGINT, bs[33:64]), (a, b) -> a * 2 + b) AS lo FROM bits) " +
      "SELECT a.doc_id AS id1, b.doc_id AS id2, " +
      "(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)))::INT AS hamming " +
      "FROM sig a JOIN sig b ON a.doc_id < b.doc_id " +
      "WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3 ORDER BY id1, id2"),
    "q_dedup_ngram" -> ("WITH tok AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS toks FROM documents WHERE source = 'src0'), " +
      "sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh FROM tok WHERE len(toks) >= 3) " +
      "SELECT a.doc_id AS id1, b.doc_id AS id2, " +
      "round(len(list_intersect(a.sh, b.sh))::DOUBLE / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard " +
      "FROM sh a JOIN sh b ON a.doc_id < b.doc_id ORDER BY jaccard DESC, id1, id2 LIMIT 20"),
    "q_dedup_embed" -> {
      // identical SRP bucket generation to the q_ann_lsh oracle
      val comp = "((" + hexFold("'h:' || t::VARCHAR || ':' || p::VARCHAR || ':' || d::VARCHAR", 8) +
        ") / 4294967296.0 - 0.5)"
      val dotp = s"list_reduce(list_transform(range(0, 64), d -> v[d + 1] * $comp), (x, y) -> x + y)"
      val bucketT = "list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 8), p -> " +
        s"CASE WHEN $dotp >= 0 THEN (1::BIGINT << (7 - p)) ELSE 0::BIGINT END)), (a, b) -> a + b)"
      val buckets = s"list_transform(range(0, 4), t -> t::VARCHAR || '|' || ($bucketT)::VARCHAR)"
      "WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
        "n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e), " +
        s"b AS (SELECT vec_id, unnest($buckets) AS bucket FROM e), " +
        "cand AS (SELECT DISTINCT a.vec_id AS cid1, b2.vec_id AS cid2 FROM b a JOIN b b2 USING (bucket) WHERE a.vec_id < b2.vec_id) " +
        "SELECT cid1 AS id1, cid2 AS id2, " +
        "round(list_reduce(list_prepend(0.0, list_transform(range(1, len(x.v) + 1), i -> x.v[i] * y.v[i])), (p, q) -> p + q) / (x.nrm * y.nrm), 4) AS cosine " +
        "FROM cand JOIN n x ON x.vec_id = cid1 JOIN n y ON y.vec_id = cid2 ORDER BY cosine DESC, id1, id2 LIMIT 20"
    },
    "q_dedup_embed_block" -> ("WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
      "n AS (SELECT vec_id, label, v, sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e) " +
      "SELECT a.vec_id AS id1, b.vec_id AS id2, " +
      "round(list_reduce(list_prepend(0.0, list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])), (x, y) -> x + y) / (a.nrm * b.nrm), 4) AS cosine " +
      "FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id ORDER BY cosine DESC, id1, id2 LIMIT 20"),
    "q_ann_hnsw" -> ("SELECT vec_id AS query_id, true AS recall_ok " +
      "FROM embeddings WHERE vec_id < 5 ORDER BY query_id"),
    "q_explain_knn" -> {
      val qv = (0 until 64).map(i => (i * 37 % 100) / 100.0 - 0.5)
      val qlist = qv.mkString("[", ", ", "]")
      val nq = math.sqrt(qv.map(x => x * x).sum)
      "WITH e AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS v " +
        "FROM embeddings WHERE vec_id = 42), " +
        s"q AS (SELECT $qlist::DOUBLE[] AS w), " +
        "c AS (SELECT list_reduce(list_prepend(0.0, list_transform(range(1, 65), i -> e.v[i] * w[i])), (a, b) -> a + b) AS d, " +
        "sqrt(list_reduce(list_prepend(0.0, list_transform(e.v, x -> x * x)), (a, b) -> a + b)) AS nv FROM e CROSS JOIN q) " +
        "SELECT component, value FROM (" +
        "SELECT 'dot' AS component, round(d, 4) AS value FROM c " +
        "UNION ALL SELECT 'norm_doc', round(nv, 4) FROM c " +
        s"UNION ALL SELECT 'norm_query', round($nq, 4) FROM c " +
        s"UNION ALL SELECT 'cosine', round(d / (nv * $nq), 4) FROM c) ORDER BY component"
    },
    "q_ann_brute" -> ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
      "n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e), " +
      "p AS (SELECT q.vec_id AS query_id, c.vec_id AS id, " +
      "round(list_reduce(list_prepend(0.0, list_transform(range(1, len(c.v) + 1), i -> c.v[i] * q.v[i])), (x, y) -> x + y) / (c.nrm * q.nrm), 4) AS cosine " +
      "FROM n c CROSS JOIN (SELECT * FROM n WHERE vec_id < 5) q WHERE c.vec_id <> q.vec_id) " +
      "SELECT query_id, id, cosine, rank FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rank FROM p) " +
      "WHERE rank <= 10 ORDER BY query_id, rank"),
    "q_ann_lsh" -> {
      // mirror of Ann.tableBuckets / planeComponent: 4 tables x 8 planes,
      // components from md5("h:t:p:d") folded to a 32-bit uniform
      val comp = "((" + hexFold("'h:' || t::VARCHAR || ':' || p::VARCHAR || ':' || d::VARCHAR", 8) +
        ") / 4294967296.0 - 0.5)"
      val dotp = s"list_reduce(list_transform(range(0, 64), d -> v[d + 1] * $comp), (x, y) -> x + y)"
      val bucketT = "list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 8), p -> " +
        s"CASE WHEN $dotp >= 0 THEN (1::BIGINT << (7 - p)) ELSE 0::BIGINT END)), (a, b) -> a + b)"
      val buckets = s"list_transform(range(0, 4), t -> t::VARCHAR || '|' || ($bucketT)::VARCHAR)"
      "WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
        "n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e), " +
        s"b AS (SELECT vec_id, unnest($buckets) AS bucket FROM e), " +
        "qb AS (SELECT vec_id AS query_id, bucket FROM b WHERE vec_id < 5), " +
        "cand AS (SELECT DISTINCT qb.query_id, b2.vec_id AS id FROM b b2 JOIN qb USING (bucket) WHERE b2.vec_id <> qb.query_id), " +
        "p AS (SELECT query_id, id, round(list_reduce(list_prepend(0.0, list_transform(range(1, len(c.v) + 1), i -> c.v[i] * q.v[i])), (x, y) -> x + y) / (c.nrm * q.nrm), 4) AS cosine " +
        "FROM cand JOIN n c ON c.vec_id = cand.id JOIN n q ON q.vec_id = cand.query_id) " +
        "SELECT query_id, id, cosine, rank FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rank FROM p) " +
        "WHERE rank <= 10 ORDER BY query_id, rank"
    },
    "q_ingest_kv" -> ("SELECT event_type AS t, (user_id % 7)::BIGINT AS u, count(*)::BIGINT AS n " +
      "FROM events GROUP BY t, u ORDER BY t, u"),
    "q_ingest_fail" -> ("WITH m AS (SELECT CASE WHEN user_id % 3 = 0 THEN value::VARCHAR " +
      "ELSE event_type END AS mn FROM events), " +
      "c AS (SELECT TRY_CAST(mn AS DOUBLE) AS mnd, " +
      "CASE WHEN mn IS NOT NULL AND TRY_CAST(mn AS DOUBLE) IS NULL THEN 'parse_error' END AS err FROM m) " +
      "SELECT coalesce(err, 'ok') AS err, count(*)::BIGINT AS n, " +
      "CAST(sum(CAST(coalesce(mnd, 0.0) AS DECIMAL(18,4))) AS DOUBLE) AS total FROM c GROUP BY 1 ORDER BY err"),
    "q_ingest_json" -> ("SELECT event_type, " +
      "min(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS kmin, " +
      "max(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS kmax " +
      "FROM events GROUP BY event_type ORDER BY event_type"),
    "q_pipeline_clean" -> {
      val en = TextAnalysis.stopwords.toMap.apply("en").map(w => s"'$w'").mkString(", ")
      TokCte + MinhashCtes + ", " +
      "dups AS (SELECT DISTINCT id2 FROM vp), " +
      "m AS (SELECT d.doc_id, len(b.toks)::BIGINT AS n_tokens, d.n_chars, " +
      "round(len(regexp_replace(lower(d.text), '[a-z0-9 ]', '', 'g'))::DOUBLE / greatest(len(d.text), 1)::DOUBLE, 4) AS punct_ratio, " +
      s"round(len(list_filter(b.toks, t -> list_contains([$en], t)))::DOUBLE / greatest(len(b.toks), 1)::DOUBLE, 4) AS stopword_ratio, " +
      "round(len(list_distinct(b.toks))::DOUBLE / greatest(len(b.toks), 1)::DOUBLE, 4) AS ttr " +
      "FROM documents d JOIN tok b USING (doc_id)), " +
      "scored AS (SELECT doc_id, n_chars, " +
      "round(least(n_tokens / 100.0, 1.0) * 0.3 + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2 + " +
      "least(stopword_ratio * 5.0, 1.0) * 0.2 + ttr * 0.3, 4) AS quality FROM m) " +
      "SELECT doc_id, quality FROM scored WHERE quality >= 0.45 AND n_chars >= 100 " +
      "AND doc_id NOT IN (SELECT id2 FROM dups) ORDER BY doc_id"
    },
    "q_lang_id" -> {
      val langs = TextAnalysis.stopwords
      val ratios = langs.map { case (l, ws) =>
        val wl = ws.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(toks, t -> list_contains([$wl], t)))::DOUBLE / greatest(len(toks), 1)::DOUBLE AS r_$l"
      }.mkString(", ")
      // mirror of the fold in TextAnalysis.languageId: later lang wins only on strict >
      TokCte + s", r AS (SELECT doc_id, $ratios FROM tok) " +
        "SELECT doc_id, CASE " +
        "WHEN r_zh > greatest(r_de, r_en, r_es, r_fr) THEN 'zh' " +
        "WHEN r_fr > greatest(r_de, r_en, r_es) THEN 'fr' " +
        "WHEN r_es > greatest(r_de, r_en) THEN 'es' " +
        "WHEN r_en > r_de THEN 'en' ELSE 'de' END AS pred_lang, " +
        "round(greatest(r_de, r_en, r_es, r_fr, r_zh), 4) AS lang_score FROM r ORDER BY doc_id"
    },
    "q_quality" -> {
      val en = TextAnalysis.stopwords.toMap.apply("en").map(w => s"'$w'").mkString(", ")
      "WITH b AS (SELECT doc_id, text, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS toks FROM documents), " +
        "m AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens, " +
        "round(len(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))::DOUBLE / greatest(len(text), 1)::DOUBLE, 4) AS punct_ratio, " +
        s"round(len(list_filter(toks, t -> list_contains([$en], t)))::DOUBLE / greatest(len(toks), 1)::DOUBLE, 4) AS stopword_ratio, " +
        "round(len(list_distinct(toks))::DOUBLE / greatest(len(toks), 1)::DOUBLE, 4) AS ttr FROM b) " +
        "SELECT doc_id, n_tokens, punct_ratio, stopword_ratio, ttr, " +
        "round(least(n_tokens / 100.0, 1.0) * 0.3 + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2 + " +
        "least(stopword_ratio * 5.0, 1.0) * 0.2 + ttr * 0.3, 4) AS quality FROM m ORDER BY doc_id"
    },
    "q_tokens" -> ("SELECT doc_id, " +
      "len(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0))::BIGINT AS ws_tokens, " +
      "len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]'))::BIGINT AS bpe_tokens " +
      "FROM documents ORDER BY doc_id"),
    "q_keywords" -> (TokCte + ", " +
      "tf AS (SELECT doc_id AS id, term, count(*)::DOUBLE AS tf FROM (SELECT doc_id, unnest(toks) AS term FROM tok) GROUP BY 1, 2), " +
      "nd AS (SELECT count(*)::DOUBLE AS n_docs FROM documents), " +
      "dfreq AS (SELECT term, count(*)::DOUBLE AS dfreq FROM tf GROUP BY term), " +
      "sc AS (SELECT id, term, round(tf * ln(nd.n_docs / dfreq.dfreq), 4) AS score FROM tf JOIN dfreq USING (term) CROSS JOIN nd), " +
      "r AS (SELECT id, term, score, row_number() OVER (PARTITION BY id ORDER BY score DESC, term) AS rank FROM sc) " +
      "SELECT id, rank, term, score FROM r WHERE rank <= 3 ORDER BY id, rank"),
    "q_pii" -> ("SELECT doc_id, " +
      "regexp_matches(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}') AS has_email, " +
      "regexp_matches(text, 'https?://') AS has_url, " +
      "len(regexp_extract_all(text, '[0-9]+'))::BIGINT AS n_digit_runs, " +
      "len(regexp_extract_all(text, '[0-9]{6,}'))::BIGINT AS n_long_numbers " +
      "FROM documents ORDER BY doc_id"),
    "q_fingerprint" -> (TokCte + " SELECT doc_id, " +
      s"list_reduce(list_prepend(0::BIGINT, list_transform(toks, t -> ${hexFold("t", 12)} % 1000000007)), " +
      "(a, v) -> (a * 31 + v) % 1000000007) AS fp FROM tok ORDER BY doc_id"),
    "q_pack" -> ("WITH p AS (SELECT doc_id, source, n_chars, " +
      "source || '/' || CAST(floor(CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_chars AS DOUBLE) / 5000) AS BIGINT)::VARCHAR AS pack_id " +
      "FROM documents) " +
      "SELECT pack_id, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS pack_chars " +
      "FROM p GROUP BY pack_id ORDER BY pack_id"),
    "q_multimodal_meta" -> ("SELECT doc_id AS media_id, " +
      "CASE WHEN doc_id % 3 = 0 THEN 'image/png' WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime, " +
      "octet_length(encode(text))::BIGINT AS n_bytes, " +
      "(doc_id % 640 + 32)::INT AS width, (doc_id % 480 + 32)::INT AS height, " +
      "(doc_id % 640 + 32)::BIGINT * (doc_id % 480 + 32)::BIGINT AS pixels, " +
      "md5(text) AS content_hash FROM documents ORDER BY media_id"),
    "q_chunk" -> (TokCte +
      ", c AS (SELECT doc_id, unnest(range(0, greatest((len(toks) - 1) // 48, 0) + 1)) AS s, toks " +
      "FROM tok WHERE len(toks) > 0) " +
      "SELECT doc_id AS id, s::INT AS chunk_idx, " +
      "len(toks[s*48 + 1 : s*48 + 64])::BIGINT AS n_tokens, " +
      "array_to_string(toks[s*48 + 1 : s*48 + 64], ' ') AS chunk_text " +
      "FROM c ORDER BY id, chunk_idx"),
    "q_sample_strat" -> ("SELECT doc_id, lang FROM documents " +
      s"WHERE ${hexFold("doc_id::VARCHAR", 12)} / 281474976710656.0 < " +
      "(CASE WHEN lang = 'en' THEN 0.5 WHEN lang = 'de' THEN 0.2 ELSE 0.1 END) " +
      "ORDER BY doc_id"),
    "q_contamination" -> (TokCte +
      ", shd AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1), " +
      "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh FROM tok WHERE len(toks) >= 3), " +
      "bench AS (SELECT DISTINCT unnest(sh) AS s FROM shd WHERE doc_id < 25), " +
      "ds AS (SELECT doc_id, unnest(sh) AS s FROM shd WHERE doc_id >= 25) " +
      "SELECT doc_id AS id, count(*)::BIGINT AS n_shared FROM ds JOIN bench USING (s) " +
      "GROUP BY 1 HAVING count(*) >= 1 ORDER BY id"),
    "q_pii_redact" -> ("SELECT doc_id, " +
      "regexp_replace(regexp_replace(regexp_replace(text, " +
      "'https?://[^ \\t\\n\\f\\r]+', '[URL]', 'g'), " +
      "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'), " +
      "'[0-9]{6,}', '[NUM]', 'g') AS redacted FROM documents ORDER BY doc_id"),
    "q_repetition" -> (TokCte + " SELECT doc_id, " +
      "round(CASE WHEN greatest(len(toks) - 2, 0) > 0 THEN " +
      "(greatest(len(toks) - 2, 0)::DOUBLE - len(list_distinct(list_transform(range(1, len(toks) - 1), " +
      "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))::DOUBLE) / greatest(len(toks) - 2, 0)::DOUBLE " +
      "ELSE 0.0 END, 4) AS rep_ratio FROM tok ORDER BY doc_id"),
    // non-overlapping 32-token chunks; share of chunks repeated
    // corpus-wide (mirror of TextAnalysis.paragraphDupRatio; grouping
    // by chunk text == grouping by its md5)
    "q_dedup_paragraph" -> (TokCte +
      ", c AS (SELECT doc_id, array_to_string(toks[s*32 + 1 : s*32 + 32], ' ') AS chunk " +
      "FROM (SELECT doc_id, unnest(range(0, greatest((len(toks) - 1) // 32, 0) + 1)) AS s, toks " +
      "FROM tok WHERE len(toks) > 0)), " +
      "f AS (SELECT chunk, count(*)::BIGINT AS n FROM c GROUP BY 1) " +
      "SELECT doc_id AS id, count(*)::BIGINT AS n_chunks, " +
      "sum(CASE WHEN f.n > 1 THEN 1 ELSE 0 END)::BIGINT AS dup_chunks, " +
      "round(sum(CASE WHEN f.n > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS dup_ratio " +
      "FROM c JOIN f USING (chunk) GROUP BY 1 ORDER BY 1"),
    // corpus-unigram mean surprisal per doc (decimal per-token sums)
    "q_lm_score" -> (TokCte +
      ", tk AS (SELECT doc_id, unnest(toks) AS term FROM tok), " +
      "ct AS (SELECT term, count(*)::BIGINT AS ct FROM tk GROUP BY 1), " +
      "tt AS (SELECT sum(ct)::DOUBLE AS tt FROM ct) " +
      "SELECT doc_id AS id, " +
      "round(sum((-ln(ct::DOUBLE / tt))::DECIMAL(28,12))::DOUBLE / count(*), 4) AS surprisal " +
      "FROM tk JOIN ct USING (term) CROSS JOIN tt GROUP BY 1 ORDER BY 1"),
    "q_domain_mix" -> ("WITH c AS (SELECT source, count(*)::BIGINT AS n_docs " +
      "FROM documents GROUP BY 1), " +
      "t AS (SELECT sum(n_docs)::DOUBLE AS total, count(*)::DOUBLE AS n_sources FROM c) " +
      "SELECT source, n_docs, round(n_docs / total, 4) AS share, " +
      "round((1.0 / n_sources) / (n_docs / total), 4) AS weight " +
      "FROM c CROSS JOIN t ORDER BY source"),

    // ---- G ----
    "q_downsample" -> DownsampleOracle,
    "q_rollup_search" -> DownsampleOracle,
    "q_stream_window" -> ("SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type, " +
      "count(*)::BIGINT AS n_events, round(sum(value), 4) AS sum_value FROM events GROUP BY 1, 2 ORDER BY hour_bucket, event_type"),
    "q_sessionize" -> ("WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tn FROM events), " +
      "l AS (SELECT *, lag(tn) OVER (PARTITION BY user_id ORDER BY tn, event_id) AS prev FROM e), " +
      "n AS (SELECT *, CASE WHEN prev IS NULL OR tn - prev > 1800000000000 THEN 1 ELSE 0 END AS ns FROM l), " +
      "s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY tn, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id FROM n) " +
      "SELECT user_id, session_id, count(*)::BIGINT AS n_events, round((max(tn) - min(tn)) / 1e9, 3) AS duration_sec " +
      "FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id"),
    "q_props_json" -> ("SELECT event_type, count(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS n, " +
      "round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k FROM events GROUP BY event_type ORDER BY event_type"),

    // ---- r7 additions ----
    // fold over range(6) with a prepended seed == the unrolled Newton
    // iteration, identical double op order
    "q_script_while" -> ("SELECT doc_id AS id, round(list_reduce(" +
      "list_prepend(100.0::DOUBLE, list_transform(range(6), i -> 0.0::DOUBLE)), " +
      "(g, e) -> (g + CAST(n_chars AS DOUBLE) / g) / 2.0::DOUBLE), 4) AS score " +
      "FROM documents ORDER BY score DESC, id LIMIT 12"),
    "q_function_random" -> (s"SELECT doc_id AS id, round(${hexFold("'42:' || doc_id", 12)} / 281474976710656.0, 6) AS score " +
      "FROM documents ORDER BY score DESC, id LIMIT 20"),
    "q_function_modes" -> ("WITH f AS (SELECT doc_id, " +
      "CASE WHEN lang = 'en' THEN ln(1.0 + n_chars * 0.01) * 2.0 END AS f1, " +
      "CASE WHEN source = 'src3' THEN 1.0 * 3.0 END AS f2, " +
      "CASE WHEN n_chars > 400 THEN sqrt(CAST(n_chars AS DOUBLE)) * 0.1 END AS f3 " +
      "FROM documents) " +
      "SELECT doc_id AS id, round(1.0 * least(CASE WHEN f1 IS NULL AND f2 IS NULL AND f3 IS NULL THEN 1.0 " +
      "ELSE greatest(coalesce(f1, -1.7976931348623157e308), coalesce(f2, -1.7976931348623157e308), " +
      "coalesce(f3, -1.7976931348623157e308)) END, 5.0), 4) AS score " +
      "FROM f ORDER BY score DESC, id LIMIT 25"),
    "q_post_filter" -> ("WITH h AS (SELECT * FROM documents WHERE n_chars >= 200), " +
      "lc AS (SELECT lang, count(*)::BIGINT AS lang_hits FROM h GROUP BY lang) " +
      "SELECT doc_id, lang, lang_hits FROM h JOIN lc USING (lang) " +
      "WHERE source = 'src1' ORDER BY doc_id"),
    "q_slice" -> (s"SELECT doc_id, lang FROM documents " +
      s"WHERE ${hexFold("'slice:' || doc_id", 12)} % 4 = 1 ORDER BY doc_id"),
    "q_rescore_multi" -> (TokCte + bm25Ctes("", "tok", Seq("fast", "hash", "join")) +
      ", w1 AS (SELECT id, score FROM sc ORDER BY score DESC, id LIMIT 50), " +
      "r1 AS (SELECT id, round(score * 1.0 + ln(1.0 + n_chars) * 0.5, 4) AS score " +
      "FROM w1 JOIN documents ON doc_id = id), " +
      "w2 AS (SELECT id, score FROM r1 ORDER BY score DESC, id LIMIT 20), " +
      "r2 AS (SELECT id, round(score * 1.0 + (CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END) * 2.0, 4) AS score " +
      "FROM w2 JOIN documents ON doc_id = id) " +
      "SELECT id, score FROM r2 ORDER BY score DESC, id LIMIT 10"),
    "q_knn_rescore" -> ("WITH q AS (SELECT " + ScriptQv.mkString("[", ", ", "]") + "::DOUBLE[] AS w), " +
      "e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
      "s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e), " +
      "dq AS (SELECT vec_id, v, CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0) ELSE " +
      "list_transform(v, x -> least(greatest(floor(x / scale + 0.5), -127.0), 127.0) * scale) END AS qv FROM s), " +
      "coarse AS (SELECT vec_id, list_reduce(list_prepend(0.0, list_transform(range(1, 65), i -> qv[i] * w[i])), (a, b) -> a + b) / " +
      "(sqrt(list_reduce(list_prepend(0.0, list_transform(qv, x -> x * x)), (a, b) -> a + b)) * " +
      "sqrt(list_reduce(list_prepend(0.0, list_transform(w, x -> x * x)), (a, b) -> a + b))) AS qscore " +
      "FROM dq CROSS JOIN q ORDER BY qscore DESC, vec_id LIMIT 40), " +
      "ex AS (SELECT c.vec_id AS id, round(list_reduce(list_prepend(0.0, list_transform(range(1, 65), i -> e.v[i] * w[i])), (a, b) -> a + b) / " +
      "(sqrt(list_reduce(list_prepend(0.0, list_transform(e.v, x -> x * x)), (a, b) -> a + b)) * " +
      "sqrt(list_reduce(list_prepend(0.0, list_transform(w, x -> x * x)), (a, b) -> a + b))), 4) AS cosine, " +
      "round(c.qscore, 4) AS quantized FROM coarse c JOIN e ON e.vec_id = c.vec_id CROSS JOIN q) " +
      "SELECT id, cosine, quantized FROM ex ORDER BY cosine DESC, id LIMIT 10"),
    "q_knn_bbq" -> bbqOracleSql(ScriptQv, 10, 4),
    "q_agg_ip_range" -> (IpCte +
      " SELECT key, doc_count FROM (" +
      "SELECT 0 AS o, 'low' AS key, count(*) FILTER (WHERE ipn < 10 * 16777216 + 64 * 65536)::BIGINT AS doc_count FROM ipv " +
      "UNION ALL SELECT 1, 'mid', count(*) FILTER (WHERE ipn >= 10 * 16777216 + 64 * 65536 AND ipn < 10 * 16777216 + 192 * 65536)::BIGINT FROM ipv " +
      "UNION ALL SELECT 2, 'high', count(*) FILTER (WHERE ipn >= 10 * 16777216 + 192 * 65536)::BIGINT FROM ipv) " +
      "ORDER BY o"),
    "q_agg_ip_prefix" -> (IpCte +
      ", n AS (SELECT (ipn // 1048576) * 1048576 AS net FROM ipv) " +
      "SELECT (net // 16777216 % 256) || '.' || (net // 65536 % 256) || '.' || (net // 256 % 256) || '.' || (net % 256) || '/12' AS key, " +
      "count(*)::BIGINT AS doc_count FROM n GROUP BY net ORDER BY net"),
    "q_transform_pivot" -> ("SELECT event_type, count(*)::BIGINT AS doc_count, " +
      "round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS value_sum, max(value) AS value_max " +
      "FROM events GROUP BY event_type ORDER BY event_type"),
    "q_transform_latest" -> ("SELECT user_id, event_id, event_type, value FROM (" +
      "SELECT user_id, event_id, event_type, value, " +
      "row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events) " +
      "WHERE rn = 1 ORDER BY user_id"),
    "q_script_fields" -> ("SELECT doc_id, round(CAST(n_chars AS DOUBLE) / 100.0, 4) AS hundreds, " +
      "round(CAST(n_chars AS DOUBLE) % 7, 4) AS mod7 FROM documents WHERE n_chars > 400 ORDER BY doc_id"),
    "q_fields_format" -> ("SELECT o_orderkey, strftime(o_orderdate, '%Y/%m/%d') AS od_fmt, " +
      "epoch_ms(o_orderdate) AS od_ms FROM orders WHERE o_totalprice > 5000 ORDER BY o_orderkey"),
    "q_indices_boost" -> (TokCte + bm25Ctes("", "tok", Seq("fast", "hash", "join")) +
      " SELECT sc.id, round(sc.score * (CASE WHEN lang = 'en' THEN 2.0 ELSE 1.0 END), 4) AS score " +
      "FROM sc JOIN documents ON doc_id = sc.id ORDER BY score DESC, id LIMIT 15"),
    "q_suggest_fuzzy" -> ("SELECT source AS suggestion, " +
      "max(CASE WHEN starts_with(source, 'rsc1') THEN 1 ELSE 0 END)::INT AS exact_prefix, " +
      "max(n_chars) AS weight FROM documents " +
      "WHERE damerau_levenshtein(left(source, 4), 'rsc1') <= 1 " +
      "GROUP BY source ORDER BY exact_prefix DESC, weight DESC, suggestion LIMIT 5"),
    "q_knn_multi" -> ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
      "q1 AS (SELECT " + ScriptQv.mkString("[", ", ", "]") + "::DOUBLE[] AS w), " +
      "q2 AS (SELECT " + ScriptQv2.mkString("[", ", ", "]") + "::DOUBLE[] AS w), " +
      "c1 AS (SELECT vec_id, list_reduce(list_prepend(0.0, list_transform(range(1, 65), i -> v[i] * w[i])), (a, b) -> a + b) / " +
      "(sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) * " +
      "sqrt(list_reduce(list_prepend(0.0, list_transform(w, x -> x * x)), (a, b) -> a + b))) AS cosine " +
      "FROM e CROSS JOIN q1 ORDER BY cosine DESC, vec_id LIMIT 20), " +
      "c2 AS (SELECT vec_id, list_reduce(list_prepend(0.0, list_transform(range(1, 65), i -> v[i] * w[i])), (a, b) -> a + b) / " +
      "(sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) * " +
      "sqrt(list_reduce(list_prepend(0.0, list_transform(w, x -> x * x)), (a, b) -> a + b))) AS cosine " +
      "FROM e CROSS JOIN q2 ORDER BY cosine DESC, vec_id LIMIT 20), " +
      "u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2) " +
      "SELECT vec_id AS id, round(sum(cosine), 4) AS score, count(*)::INT AS matched_clauses " +
      "FROM u GROUP BY vec_id ORDER BY score DESC, id LIMIT 10"),
    "q_nested_score" -> ("SELECT o_orderkey, round(avg(l_quantity), 4) AS score " +
      "FROM lineitem JOIN orders ON o_orderkey = l_orderkey WHERE l_quantity > 45 " +
      "GROUP BY o_orderkey ORDER BY o_orderkey"),
    "q_graph_explore" -> ("WITH toks AS (SELECT doc_id, " +
      "unnest(list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0))) AS term FROM documents), " +
      "bg AS (SELECT term, count(*)::BIGINT AS bg_count FROM toks GROUP BY term), " +
      "tot AS (SELECT count(*)::DOUBLE AS n FROM documents), " +
      "f1 AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'), " +
      "f1t AS (SELECT count(*)::DOUBLE AS fg FROM f1), " +
      "s1 AS (SELECT term, fg_count, bg_count, round((fg_count/fg)*ln((fg_count/fg)/(bg_count/n)), 6) AS score " +
      "FROM (SELECT term, count(*)::BIGINT AS fg_count FROM toks JOIN f1 USING (doc_id) " +
      "WHERE term <> 'spark' GROUP BY term HAVING count(*) >= 3) h " +
      "JOIN bg USING (term) CROSS JOIN f1t CROSS JOIN tot ORDER BY score DESC, term LIMIT 5), " +
      "f2 AS (SELECT DISTINCT doc_id FROM toks WHERE term IN (SELECT term FROM s1)), " +
      "f2t AS (SELECT count(*)::DOUBLE AS fg FROM f2), " +
      "s2 AS (SELECT term, fg_count, bg_count, round((fg_count/fg)*ln((fg_count/fg)/(bg_count/n)), 6) AS score " +
      "FROM (SELECT term, count(*)::BIGINT AS fg_count FROM toks JOIN f2 USING (doc_id) " +
      "WHERE term <> 'spark' AND term NOT IN (SELECT term FROM s1) GROUP BY term HAVING count(*) >= 3) h " +
      "JOIN bg USING (term) CROSS JOIN f2t CROSS JOIN tot ORDER BY score DESC, term LIMIT 5) " +
      "SELECT term, hop, fg_count, bg_count, score FROM (" +
      "SELECT term, 0 AS hop, bg_count AS fg_count, bg_count, 1.0::DOUBLE AS score FROM bg WHERE term = 'spark' " +
      "UNION ALL SELECT term, 1, fg_count, bg_count, score FROM s1 " +
      "UNION ALL SELECT term, 2, fg_count, bg_count, score FROM s2) " +
      "ORDER BY hop, score DESC, term"),
    "q_graph_connections" -> ("WITH toks AS (SELECT doc_id, term FROM (SELECT doc_id, " +
      "unnest(list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0))) AS term FROM documents) " +
      "WHERE term IN ('spark', 'agg', 'scan', 'merge', 'window')) " +
      "SELECT a.term AS source, b.term AS target, count(*)::BIGINT AS doc_count " +
      "FROM toks a JOIN toks b USING (doc_id) WHERE a.term < b.term " +
      "GROUP BY 1, 2 HAVING count(*) >= 3 " +
      "ORDER BY doc_count DESC, source, target"),
    "q_retriever_rule" -> (TokCte + bm25Ctes("", "tok", Seq("fast", "hash", "join")) +
      ", r AS (SELECT id, score, " +
      "CASE WHEN id = 42 THEN 0 WHEN id = 7 THEN 1 ELSE 2147483647 END AS pin_rank " +
      "FROM sc WHERE id NOT IN (11, 13)) " +
      "SELECT id, score, pin_rank < 2147483647 AS pinned FROM r " +
      "ORDER BY pin_rank, score DESC, id LIMIT 10"),
    "q_geo_grid_query" -> (GeoCte + ", b AS (SELECT c_custkey, lat, lon, " +
      "least(CAST(floor((lon + 180.0) / 360.0 * 32) AS BIGINT), 31) AS loni, " +
      "least(CAST(floor((lat + 90.0) / 180.0 * 32) AS BIGINT), 31) AS lati FROM g), " +
      "v AS (SELECT c_custkey, lat, lon, list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 10), k -> " +
      "CASE WHEN k % 2 = 0 THEN (loni >> (4 - k // 2)::INT) & 1 ELSE (lati >> (4 - k // 2)::INT) & 1 END)), " +
      "(a, b) -> a * 2 + b) AS v FROM b), " +
      "h AS (SELECT c_custkey, lat, lon, " +
      "substr('0123456789bcdefghjkmnpqrstuvwxyz', (((v >> 5) & 31))::INT + 1, 1) || " +
      "substr('0123456789bcdefghjkmnpqrstuvwxyz', ((v & 31))::INT + 1, 1) AS key FROM v) " +
      s"SELECT c_custkey, lat, lon FROM h WHERE key = '$GeoGridQueryCell' ORDER BY c_custkey"),
    "q_esql_metrics" -> ("SELECT event_type, max(value) AS mx, count(*)::BIGINT AS n " +
      "FROM events GROUP BY event_type ORDER BY event_type"),
    "q_esql_cidr" -> (IpCte +
      " SELECT count(*)::BIGINT AS n FROM ipv WHERE " +
      "(ipn >= 10 * 16777216 + 64 * 65536 AND ipn < 10 * 16777216 + 64 * 65536 + 4194304) OR " +
      "(ipn >= 10 * 16777216 + 192 * 65536 AND ipn < 10 * 16777216 + 192 * 65536 + 1048576)"),
    "q_eql_simple" -> ("SELECT event_id, user_id, value FROM events " +
      "WHERE event_type = 'error' AND value > 300 ORDER BY event_id"),
    "q_eql_sample" -> ("SELECT user_id, " +
      "min(CASE WHEN event_type = 'error' AND value > 200 THEN event_id END) AS e1_id, " +
      "min(CASE WHEN event_type = 'purchase' AND value > 200 THEN event_id END) AS e2_id " +
      "FROM events GROUP BY user_id " +
      "HAVING e1_id IS NOT NULL AND e2_id IS NOT NULL ORDER BY user_id"),
    "q_eql_tail" -> ("SELECT event_id, user_id, value FROM " +
      "(SELECT event_id, user_id, value FROM events " +
      "WHERE event_type = 'purchase' AND value > 100 " +
      "ORDER BY event_id DESC LIMIT 5) ORDER BY event_id"),
    "q_eql_funcs" -> ("SELECT event_id, user_id, value FROM events " +
      "WHERE (event_type LIKE 'c%' OR event_type LIKE 's_gnup' " +
      "OR contains(event_type, 'rror')) AND value > 300 ORDER BY event_id"),
    "q_has_parent_score" -> ("SELECT l_orderkey, l_linenumber, " +
      "round(ln(1.0 + o_totalprice), 4) AS score FROM lineitem " +
      "JOIN orders ON o_orderkey = l_orderkey " +
      "WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 5000 " +
      "ORDER BY l_orderkey, l_linenumber"),
    // mirror of Eql.sequence: µs timestamps, latest-predecessor carry
    // via last_value IGNORE NULLS over UNBOUNDED..1 PRECEDING
    // mirror of the Spark window-carry with the kill sentinel: an
    // error row writes -1 into the level-0 chain columns, and the
    // level-1 extension requires the carried t0 to be a live chain
    "q_eql_missing" -> ("WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS tu FROM events " +
      "WHERE event_type IN ('view', 'purchase', 'error')), " +
      "t AS (SELECT *, CASE WHEN event_type = 'view' THEN 0 " +
      "WHEN event_type = 'purchase' THEN 1 END AS step, " +
      "event_type = 'error' AS kill0 FROM e), " +
      "s AS (SELECT * FROM t WHERE step IS NOT NULL OR kill0), " +
      "l0 AS (SELECT *, CASE WHEN kill0 THEN -1 WHEN step = 0 THEN tu END AS c0_t0, " +
      "CASE WHEN kill0 THEN -1 WHEN step = 0 THEN event_id END AS c0_i0 FROM s), " +
      "l1p AS (SELECT *, last_value(c0_t0 IGNORE NULLS) OVER w AS p_t0, " +
      "last_value(c0_i0 IGNORE NULLS) OVER w AS p_i0 FROM l0 " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), " +
      "l1 AS (SELECT *, CASE WHEN step = 1 AND p_t0 IS NOT NULL AND p_t0 <> -1 AND tu - p_t0 <= 86400000000 THEN p_t0 END AS c1_t0, " +
      "CASE WHEN step = 1 AND p_t0 IS NOT NULL AND p_t0 <> -1 AND tu - p_t0 <= 86400000000 THEN p_i0 END AS c1_i0, " +
      "CASE WHEN step = 1 AND p_t0 IS NOT NULL AND p_t0 <> -1 AND tu - p_t0 <= 86400000000 THEN tu END AS c1_t1, " +
      "CASE WHEN step = 1 AND p_t0 IS NOT NULL AND p_t0 <> -1 AND tu - p_t0 <= 86400000000 THEN event_id END AS c1_i1 FROM l1p) " +
      "SELECT user_id, c1_i0 AS e1_id, c1_i1 AS e2_id, (c1_t1 - c1_t0) // 1000 AS span_ms " +
      "FROM l1 WHERE c1_t1 IS NOT NULL ORDER BY user_id, e2_id"),
    "q_eql_sequence" -> ("WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS tu FROM events " +
      "WHERE event_type IN ('view', 'click', 'purchase')), " +
      "t AS (SELECT *, CASE WHEN event_type = 'view' THEN 0 " +
      "WHEN event_type = 'click' AND value > 50 THEN 1 " +
      "WHEN event_type = 'purchase' THEN 2 END AS step FROM e), " +
      "s AS (SELECT * FROM t WHERE step IS NOT NULL), " +
      "l0 AS (SELECT *, CASE WHEN step = 0 THEN tu END AS c0_t0, " +
      "CASE WHEN step = 0 THEN event_id END AS c0_i0 FROM s), " +
      "l1p AS (SELECT *, last_value(c0_t0 IGNORE NULLS) OVER w AS p_t0, " +
      "last_value(c0_i0 IGNORE NULLS) OVER w AS p_i0 FROM l0 " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), " +
      "l1 AS (SELECT *, CASE WHEN step = 1 AND p_t0 IS NOT NULL AND tu - p_t0 <= 86400000000 THEN p_t0 END AS c1_t0, " +
      "CASE WHEN step = 1 AND p_t0 IS NOT NULL AND tu - p_t0 <= 86400000000 THEN p_i0 END AS c1_i0, " +
      "CASE WHEN step = 1 AND p_t0 IS NOT NULL AND tu - p_t0 <= 86400000000 THEN tu END AS c1_t1, " +
      "CASE WHEN step = 1 AND p_t0 IS NOT NULL AND tu - p_t0 <= 86400000000 THEN event_id END AS c1_i1 FROM l1p), " +
      "l2p AS (SELECT *, last_value(c1_t0 IGNORE NULLS) OVER w AS q_t0, " +
      "last_value(c1_i0 IGNORE NULLS) OVER w AS q_i0, " +
      "last_value(c1_t1 IGNORE NULLS) OVER w AS q_t1, " +
      "last_value(c1_i1 IGNORE NULLS) OVER w AS q_i1 FROM l1 " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) " +
      "SELECT user_id, q_i0 AS e1_id, q_i1 AS e2_id, event_id AS e3_id, " +
      "(tu - q_t0) // 1000 AS span_ms FROM l2p " +
      "WHERE step = 2 AND q_t0 IS NOT NULL AND tu - q_t0 <= 86400000000 " +
      "ORDER BY user_id, e3_id"),
    "q_eql_runs" -> ("WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS tu FROM events " +
      "WHERE event_type = 'view' OR (event_type = 'click' AND value > 100)), " +
      "s AS (SELECT *, (event_type = 'view') AS m0, (event_type = 'click' AND value > 100) AS m1 FROM e), " +
      "l0 AS (SELECT *, CASE WHEN m0 THEN tu END AS c0_t0, " +
      "CASE WHEN m0 THEN event_id END AS c0_i0 FROM s), " +
      "l1p AS (SELECT *, last_value(c0_t0 IGNORE NULLS) OVER w AS p_t0, " +
      "last_value(c0_i0 IGNORE NULLS) OVER w AS p_i0 FROM l0 " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), " +
      "l1 AS (SELECT *, CASE WHEN m1 AND p_t0 IS NOT NULL AND tu - p_t0 <= 86400000000 THEN p_t0 END AS c1_t0, " +
      "CASE WHEN m1 AND p_t0 IS NOT NULL AND tu - p_t0 <= 86400000000 THEN p_i0 END AS c1_i0, " +
      "CASE WHEN m1 AND p_t0 IS NOT NULL AND tu - p_t0 <= 86400000000 THEN tu END AS c1_t1, " +
      "CASE WHEN m1 AND p_t0 IS NOT NULL AND tu - p_t0 <= 86400000000 THEN event_id END AS c1_i1 FROM l1p), " +
      "l2p AS (SELECT *, last_value(c1_t0 IGNORE NULLS) OVER w AS q_t0, " +
      "last_value(c1_i0 IGNORE NULLS) OVER w AS q_i0, " +
      "last_value(c1_t1 IGNORE NULLS) OVER w AS q_t1, " +
      "last_value(c1_i1 IGNORE NULLS) OVER w AS q_i1 FROM l1 " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) " +
      "SELECT user_id, q_i0 AS e1_id, q_i1 AS e2_id, event_id AS e3_id, " +
      "(tu - q_t0) // 1000 AS span_ms FROM l2p " +
      "WHERE m1 AND q_t0 IS NOT NULL AND tu - q_t0 <= 86400000000 " +
      "ORDER BY user_id, e3_id"),
    "q_esql_categorize" -> ("WITH c AS (SELECT array_to_string(list_filter(list_filter(" +
      "regexp_split_to_array(lower(event_type), '[^a-z0-9]+'), x -> len(x) > 0), " +
      "t -> NOT regexp_matches(t, '^[0-9]+$'))[1:4], ' ') AS cat FROM events) " +
      "SELECT cat, count(*)::BIGINT AS n FROM c GROUP BY cat ORDER BY cat"),
    "q_highlight_order" -> highlightOrderOracleSql(Seq("fast", "hash", "join"), 2),
    "q_highlight_fragments" -> (TokCte +
      ", h AS (SELECT doc_id, " +
      "replace(regexp_extract(lower(text), '([a-z0-9]+ ){0,3}fast( [a-z0-9]+){0,3}'), 'fast', '<em>fast</em>') AS f1, " +
      "replace(regexp_extract(lower(text), '([a-z0-9]+ ){0,3}hash( [a-z0-9]+){0,3}'), 'hash', '<em>hash</em>') AS f2 " +
      "FROM documents JOIN tok USING (doc_id) WHERE list_has_any(toks, ['fast','hash'])) " +
      "SELECT doc_id AS id, array_to_string(list_filter([f1, f2], x -> x != '')[1:2], ' ... ') AS snippet " +
      "FROM h ORDER BY id")
  )
}
