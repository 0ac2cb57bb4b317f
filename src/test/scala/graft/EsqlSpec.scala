package graft

import graft.dsl.Esql
import org.apache.spark.sql.functions._

class EsqlSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "a", 10.0, "xfoo"),
    (2L, "a", 20.0, "bar"),
    (3L, "b", 30.0, "foo2"),
    (4L, "b", 40.0, null),
    (5L, "c", 50.5, "baz")).toDF("id", "k", "v", "s")

  private def run(pipes: String*) = pipes.foldLeft(df)(Esql.applyCommand(_, _))

  test("WHERE: comparisons, boolean ops, LIKE, IS NULL") {
    assert(run("""where v >= 20 and k != "c"""").select("id").as[Long].collect().toSet
      == Set(2L, 3L, 4L))
    // ES|QL LIKE wildcards are * and ? (Lucene style), not SQL % _
    assert(run("""where s like "*foo*" or s is null""").select("id").as[Long]
      .collect().toSet == Set(1L, 3L, 4L))
    // a literal % in the pattern is NOT a wildcard in ES|QL
    assert(run("""where s like "%foo%"""").select("id").as[Long]
      .collect().isEmpty)
    assert(run("""where not (k == "a") and v < 45""").select("id").as[Long]
      .collect().toSet == Set(3L, 4L))
  }

  test("EVAL + KEEP + SORT + LIMIT compose") {
    val r = run(
      "eval v2 = round(v * 2, 1), tag = concat(k, \"!\")",
      "keep id, v2, tag",
      "sort v2 desc, id",
      "limit 2")
      .as[(Long, Double, String)].collect().toSeq
    assert(r == Seq((5L, 101.0, "c!"), (4L, 80.0, "b!")))
  }

  test("STATS..BY: aggregates with group keys; bare STATS = global") {
    val r = run("stats n = count(*), sv = sum(v), mx = max(v) by k", "sort k")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(r == Seq(("a", 2L, 30.0, 20.0), ("b", 2L, 70.0, 40.0), ("c", 1L, 50.5, 50.5)))
    val g = run("stats n = count(*), md = median(v)")
      .as[(Long, Double)].collect().head
    assert(g == ((5L, 30.0)))
    // inline BY alias: group key computed in the same segment
    val byExpr = run("""stats n = count(*) by band = round(v / 20.0, 0)""", "sort band")
      .as[(Double, Long)].collect().toSeq
    assert(byExpr == Seq((1.0, 2L), (2.0, 2L), (3.0, 1L)))
  }

  test("full pipeline through run() against the parquet tables") {
    val r = Esql.run(spark, sfDir,
      """from documents | where lang == "en" | stats n = count(*), cmax = max(n_chars) by source | sort source | limit 3""")
      .as[(String, Long, Long)].collect()
    assert(r.nonEmpty && r.length <= 3)
    assert(r.map(_._1).toSeq == r.map(_._1).toSeq.sorted)
  }

  test("errors are loud: unknown command / function / aggregate") {
    intercept[IllegalArgumentException](run("explode v"))
    intercept[IllegalArgumentException](run("eval x = frobnicate(v)"))
    intercept[IllegalArgumentException](run("stats x = welford(v)"))
  }

  test("RENAME / MV_EXPAND / DISSECT") {
    val r = run("rename v as score, k as grp", "keep id, grp, score")
    assert(r.columns.toSeq == Seq("id", "grp", "score"))

    val mv = Seq((1L, Seq("a", "b")), (2L, Seq("c")))
      .toDF("id", "tags")
    val expanded = Esql.applyCommand(mv, "mv_expand tags")
      .as[(Long, String)].collect().toSet
    assert(expanded == Set((1L, "a"), (1L, "b"), (2L, "c")))

    val logs = Seq("1-URGENT done", "5-LOW waiting").toDF("line")
    val d = Esql.applyCommand(logs, """dissect line "%{pri}-%{label} %{state}"""")
      .select("pri", "label", "state").as[(String, String, String)].collect().toSet
    assert(d == Set(("1", "URGENT", "done"), ("5", "LOW", "waiting")))
  }

  test("DISSECT modifiers: append, skip, right padding, separator") {
    // %{+t} appends with APPEND_SEPARATOR; %{?x} matches and discards
    val logs = Seq("svc1 WARN:disk full", "svc2 INFO:boot ok").toDF("line")
    val d = Esql.applyCommand(logs,
      """dissect line "%{?svc} %{t}:%{+t} %{state}" append_separator="-"""")
      .select("t", "state").as[(String, String)].collect().toSet
    assert(d == Set(("WARN-disk", "full"), ("INFO-boot", "ok")))
    assert(!Esql.applyCommand(logs,
      """dissect line "%{?svc} %{t}:%{+t} %{state}"""").columns.contains("svc"))
    // default separator is empty
    val d2 = Esql.applyCommand(logs,
      """dissect line "%{?svc} %{t}:%{+t} %{state}"""")
      .select("t").as[String].collect().toSet
    assert(d2 == Set("WARNdisk", "INFOboot"))
    // %{a->}: the delimiter after a may repeat (column-aligned logs)
    val padded = Seq("a      b", "cc  d").toDF("line")
    val p = Esql.applyCommand(padded, """dissect line "%{l->} %{r}"""")
      .select("l", "r").as[(String, String)].collect().toSet
    assert(p == Set(("a", "b"), ("cc", "d")))
    // a pattern with only skips fails loudly
    intercept[IllegalArgumentException](
      Esql.applyCommand(logs, """dissect line "%{?a} %{}""""))
  }

  test("IN, CASE, GROK") {
    assert(run("""where k in ("a", "c")""").select("id").as[Long].collect().toSet
      == Set(1L, 2L, 5L))
    val c = run("""eval tier = case(v < 15, "low", v < 45, "mid", "high")""")
      .select("id", "tier").as[(Long, String)].collect().toMap
    assert(c == Map(1L -> "low", 2L -> "mid", 3L -> "mid", 4L -> "mid", 5L -> "high"))

    val logs = Seq("alice 404 ERROR from 10.0.0.1").toDF("line")
    val g = Esql.applyCommand(logs,
      """grok line "%{WORD:user} %{NUMBER:code:int} %{LOGLEVEL:level} from %{IP:ip}"""")
      .select("user", "code", "level", "ip")
      .as[(String, Int, String, String)].collect().head
    assert(g == (("alice", 404, "ERROR", "10.0.0.1")))
    intercept[IllegalArgumentException](
      Esql.applyCommand(logs, """grok line "%{NOPE:x}""""))

    // the extended base-pattern library (shared with ingest redact)
    val rich = Seq("2024-03-05T10:30:00Z 3f2a8a5e-0000-4000-8000-1234567890ab " +
      "aa:bb:cc:dd:ee:11 api.example.com /var/log/app a@b.io").toDF("line")
    val r = Esql.applyCommand(rich,
      """grok line "%{TIMESTAMP_ISO8601:ts} %{UUID:uid} %{MAC:mac} %{HOSTNAME:host} %{PATH:path} %{EMAILADDRESS:mail}"""")
      .select("ts", "uid", "mac", "host", "path", "mail")
      .as[(String, String, String, String, String, String)].collect().head
    assert(r == (("2024-03-05T10:30:00Z", "3f2a8a5e-0000-4000-8000-1234567890ab",
      "aa:bb:cc:dd:ee:11", "api.example.com", "/var/log/app", "a@b.io")))
  }

  test("ENRICH: broadcast lookup join with column selection") {
    val dims = Seq(("a", "alpha"), ("b", "beta")).toDF("kk", "label")
    val r = Esql.applyCommand(df, "enrich dims on k == kk with label", _ => dims)
      .select("id", "label").as[(Long, Option[String])].collect().toMap
    assert(r(1L).contains("alpha") && r(3L).contains("beta") && r(5L).isEmpty)
    // without a resolver, ENRICH fails loudly
    intercept[IllegalArgumentException](run("enrich dims on k == kk"))
    // WITH new_name = field renames at join time
    val r2 = Esql.applyCommand(df,
      "enrich dims on k == kk with tag = label", _ => dims)
      .select("id", "tag").as[(Long, Option[String])].collect().toMap
    assert(r2(1L).contains("alpha") && r2(5L).isEmpty)
  }

  test("function long tail: split/mv family, string fns, math, casts") {
    val r = run(
      """eval toks = split(s, "o")""",
      "eval n = mv_count(toks), up = to_upper(s), l2 = left(s, 2)",
      "where s is not null",
      "keep id, n, up, l2",
      "sort id")
      .as[(Long, Int, String, String)].collect().toSeq
    assert(r == Seq(
      (1L, 3, "XFOO", "xf"), (2L, 1, "BAR", "ba"),
      (3L, 3, "FOO2", "fo"), (5L, 1, "BAZ", "ba")))
    val m = run(
      "eval a = mv_sum(split(\"1;2;3\", \";\")), b = floor(v), c = greatest(v, 25.0)",
      "where id == 1",
      "keep a, b, c")
      .as[(Double, Long, Double)].collect().head
    assert(m == (6.0, 10L, 25.0))
    val dt = run(
      "eval ns = to_long(id * 90000) * 1000000000",
      "eval bucket = date_trunc(\"minute\", ns)",
      "keep id, bucket", "sort id", "limit 3")
      .as[(Long, Long)].collect().toSeq
    // 90000s*id ns truncated to minutes
    assert(dt == Seq(
      (1L, 90000L / 60 * 60 * 1000000000L),
      (2L, 180000L / 60 * 60 * 1000000000L),
      (3L, 270000L / 60 * 60 * 1000000000L)))
  }

  test("BUCKET: calendar form on ns longs, numeric width form") {
    val cal = run(
      "eval ns = to_long(id) * 90000000000000",
      "eval day = bucket(ns, \"day\")",
      "keep id, day", "sort id", "limit 2")
      .as[(Long, Long)].collect().toSeq
    assert(cal == Seq(
      (1L, 90000000000000L - 90000000000000L % 86400000000000L),
      (2L, 180000000000000L - 180000000000000L % 86400000000000L)))
    val num = run("eval b = bucket(v, 15.0)", "keep id, b", "sort id")
      .as[(Long, Double)].collect().toSeq
    assert(num == Seq((1L, 0.0), (2L, 15.0), (3L, 30.0), (4L, 30.0), (5L, 45.0)))
  }

  test("INLINESTATS: per-group aggregate appended to every row") {
    val r = run("inlinestats mx = max(v) by k", "keep id, mx", "sort id")
      .as[(Long, Double)].collect().toSeq
    assert(r == Seq((1L, 20.0), (2L, 20.0), (3L, 40.0), (4L, 40.0), (5L, 50.5)))
    // bare (global) form: one 1-row aggregate cross-joined back
    val g = run("inlinestats n = count(*)", "keep id, n", "sort id", "limit 1")
      .as[(Long, Long)].collect().toSeq
    assert(g == Seq((1L, 5L)))
  }

  test("LOOKUP JOIN: broadcast left join on the shared field name") {
    val dims = Seq(("a", "alpha"), ("b", "beta")).toDF("k", "label")
    val r = Esql.applyCommand(df, "lookup join dims on k", _ => dims)
      .select("id", "label").as[(Long, Option[String])].collect().toMap
    assert(r(1L).contains("alpha") && r(4L).contains("beta") && r(5L).isEmpty)
    intercept[IllegalArgumentException](
      Esql.applyCommand(df, "lookup garbage", _ => dims))
  }

  test("LOOKUP JOIN: multi-key ON f1, f2 (the 9.x option surface)") {
    // composite key: only the (k, v-band) pair that matches BOTH
    // fields joins — a single-field join would over-match
    val withBand = df.withColumn("band", (col("v") / 20).cast("long"))
    val dims = Seq(("a", 0L, "a-low"), ("a", 1L, "a-mid"), ("b", 2L, "b-high"))
      .toDF("k", "band", "label")
    val r = Esql.applyCommand(withBand, "lookup join dims on k, band", _ => dims)
      .select("id", "label").as[(Long, Option[String])].collect().toMap
    // df rows: (1,a,v=10->band0), (2,a,v=20->band1), (3,b,v=30->band1),
    // (4,b,v=40->band2), (5,c,...): composite matching only
    assert(r(1L).contains("a-low") && r(2L).contains("a-mid"))
    assert(r(3L).isEmpty) // b/band1 has no dim row — single-key would over-match
    assert(r(4L).contains("b-high"))
    assert(r(5L).isEmpty)
    // lookup-side non-key columns overwrite same-named input columns
    val clash = withBand.withColumn("label", lit("old"))
    val r2 = Esql.applyCommand(clash, "lookup join dims on k, band", _ => dims)
      .select("id", "label").as[(Long, Option[String])].collect().toMap
    assert(r2(1L).contains("a-low") && r2(3L).isEmpty)
  }

  test("math/string/hash function batch") {
    val r = run(
      """eval t = round(sin(pi() / 2), 6), c = round(cos(0), 6),
             a2 = round(atan2(1, 1) * 4, 6), sg = signum(v - 30),
             cb = round(cbrt(27), 6)""",
      "keep id, t, c, a2, sg, cb", "sort id", "limit 1")
      .as[(Long, Double, Double, Double, Double, Double)].collect().head
    assert(r == ((1L, 1.0, 1.0, math.Pi.formatted("%.6f").toDouble, -1.0, 3.0)))
    val s = run(
      """eval loc = locate(s, "foo"), rev = reverse(k), bl = bit_length(k),
             r2 = right(s, 3), h = md5(k)""",
      "keep id, loc, rev, bl, r2, h", "sort id", "limit 1")
      .as[(Long, Int, String, Int, String, String)].collect().head
    assert(s._2 == 2 && s._3 == "a" && s._4 == 8 && s._5 == "foo")
    assert(s._6 == java.security.MessageDigest.getInstance("MD5")
      .digest("a".getBytes).map("%02x".format(_)).mkString)
  }

  test("STATS..WHERE: per-aggregate filter, null-masked into one pass") {
    val r = run(
      """stats n = count(*), na = count(*) where k == "a",
              sa = sum(v) where v >= 20 by k""",
      "sort k")
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    assert(r == Seq(
      ("a", 2L, 2L, Some(20.0)), ("b", 2L, 0L, Some(70.0)), ("c", 1L, 0L, Some(50.5))))
    // WHERE inside the agg parens must NOT split
    val g = run("""stats m = max(v) where not (k == "c")""")
      .as[Double].collect().toSeq
    assert(g == Seq(40.0))
  }

  test("WEIGHTED_AVG / VALUES / TOP aggregates") {
    val r = run("stats w = weighted_avg(v, id) by k", "sort k")
      .as[(String, Double)].collect().toMap
    // a: (10*1+20*2)/3 ; b: (30*3+40*4)/7
    assert(math.abs(r("a") - 50.0 / 3) < 1e-12 && math.abs(r("b") - 250.0 / 7) < 1e-12)
    assert(run("stats l = values(k)").as[Seq[String]].head() == Seq("a", "b", "c"))
    assert(run("stats t = top(v, 2)").as[Seq[Double]].head() == Seq(50.5, 40.0))
    assert(run("""stats t = top(v, 2, "asc")""").as[Seq[Double]].head() == Seq(10.0, 20.0))
  }

  test("FORK: tagged union of branch sub-pipelines") {
    val r = run(
      "fork ( where v >= 40 | keep id ) ( sort v | limit 2 | keep id )",
      "sort _fork, id")
      .as[(Long, String)].collect().toSeq
    assert(r == Seq(
      (4L, "fork1"), (5L, "fork1"), (1L, "fork2"), (2L, "fork2")))
    intercept[IllegalArgumentException](run("fork ( where v > 1 )"))
    intercept[IllegalArgumentException](run("fork garbage ( where v > 1 )"))
  }

  test("date functions: extract/format/diff/parse over ns longs") {
    // 2024-03-15T12:30:45Z in ns
    val ns = 1710505845L * 1000000000L
    val d2 = Seq((1L, ns)).toDF("id", "ts_ns")
    val r = Esql.applyCommand(d2,
      """eval y = date_extract("year", ts_ns), mo = date_extract("month", ts_ns),
             hh = date_extract("hour", ts_ns), day = date_format("yyyy-MM-dd", ts_ns),
             dh = date_diff("hour", ts_ns - 7200000000000, ts_ns),
             back = date_parse("yyyy-MM-dd", day)""")
      .select("y", "mo", "hh", "day", "dh", "back")
      .as[(Long, Long, Long, String, Long, Long)].collect().head
    assert(r == ((2024L, 3L, 12L, "2024-03-15", 2L, 1710460800L * 1000000000L)))
    intercept[IllegalArgumentException](
      Esql.applyCommand(d2, """eval z = date_extract("century", ts_ns)"""))
  }

  test("KEEP / DROP wildcards expand against the schema") {
    val wide = Seq((1L, "a", 2.0, 3.0)).toDF("id", "k", "v_min", "v_max")
    assert(Esql.applyCommand(wide, "keep id, v_*").columns.toSeq
      == Seq("id", "v_min", "v_max"))
    assert(Esql.applyCommand(wide, "drop v_*").columns.toSeq == Seq("id", "k"))
    assert(Esql.applyCommand(wide, "keep *max, id").columns.toSeq
      == Seq("v_max", "id"))
    intercept[IllegalArgumentException](Esql.applyCommand(wide, "keep z_*"))
  }

  test("SORT null placement: ES|QL nulls-are-largest default + overrides") {
    val ids = (pipe: String) =>
      Esql.applyCommand(df, pipe).select("id").as[Long].collect().toSeq
    // s is null for id 4; default: nulls last ascending, first descending
    assert(ids("sort s") == Seq(2L, 5L, 3L, 1L, 4L))
    assert(ids("sort s desc") == Seq(4L, 1L, 3L, 5L, 2L))
    assert(ids("sort s desc nulls last") == Seq(1L, 3L, 5L, 2L, 4L))
    assert(ids("sort s nulls first") == Seq(4L, 2L, 5L, 3L, 1L))
  }

  test("full-text functions in WHERE: MATCH / QSTR / KQL") {
    val docs = Seq(
      (1L, "Spark window functions", "en"),
      (2L, "spark shuffle internals", "en"),
      (3L, "fenetre coulissante", "fr"),
      (4L, "window shopping guide", "en")).toDF("id", "text", "lang")
    def ids(pipe: String): Set[Long] =
      Esql.applyCommand(docs, pipe).select("id").as[Long].collect().toSet
    // MATCH: OR over analyzed tokens, composes with other predicates
    assert(ids("""where match(text, "spark window")""") == Set(1L, 2L, 4L))
    assert(ids("""where match(text, "spark window") and lang == "fr"""") == Set.empty)
    // QSTR: Lucene grammar (uppercase operators; bare term = default field)
    assert(ids("""where qstr("spark AND window")""") == Set(1L))
    assert(ids("""where qstr("lang:en AND spark")""") == Set(1L, 2L))
    // KQL: same grammar with case-insensitive keywords
    assert(ids("""where kql("spark and window")""") == Set(1L))
    assert(ids("""where kql("lang:fr or window")""") == Set(1L, 3L, 4L))
    // query text must be a literal (it selects the compiled predicate)
    intercept[IllegalArgumentException](ids("where match(text, lang)"))
  }

  test("CHANGE_POINT: finds the step in a mean-shifted series") {
    // flat 10s then flat 50s: the split at the boundary maximizes the
    // between-segment sum of squares
    val series = Seq(
      (1L, 10.0), (2L, 10.0), (3L, 10.0), (4L, 10.0),
      (5L, 50.0), (6L, 50.0), (7L, 50.0), (8L, 50.0)).toDF("t", "x")
    val r = Esql.applyCommand(series, "change_point x on t")
      .select("t", "x", "cp_stat").as[(Long, Double, Double)].collect().toSeq
    assert(r.length == 1)
    assert(r.head._1 == 4L) // last row of the pre-shift segment
    assert(r.head._3 == 3200.0) // 4*(10-30)^2 + 4*(50-30)^2
  }

  test("CATEGORIZE grouping key: head tokens, numerics dropped") {
    val logs = Seq(
      "Connected to 10.1.0.1", "Connected to 10.1.0.2",
      "Disconnected abruptly").toDF("msg")
    val r = Esql.applyCommand(logs, "stats n = count(*) by cat = categorize(msg)")
      .orderBy("cat").as[(String, Long)].collect().toSeq
    assert(r == Seq(("connected to", 2L), ("disconnected abruptly", 1L)))
  }

  test("FUSE rrf: rank-reciprocal merge of FORK branches") {
    val df = Seq(
      (1L, "fork1", 10.0), (2L, "fork1", 5.0), (3L, "fork1", 1.0),
      (2L, "fork2", 9.0), (1L, "fork2", 2.0)).toDF("id", "_fork", "_score")
    val r = Esql.applyCommand(df, "fuse rrf key by id with rank_constant = 10")
      .orderBy(col("_score").desc, col("id"))
      .as[(Long, Double)].collect().toSeq
    // id1: rank1+rank2 -> 1/11 + 1/12; id2: rank2+rank1 -> same sum;
    // tie breaks by id; id3: rank3 only
    assert(r.map(_._1) == Seq(1L, 2L, 3L))
    assert(math.abs(r(0)._2 - (1.0 / 11 + 1.0 / 12)) < 1e-12)
    assert(r(0)._2 == r(1)._2)
    assert(math.abs(r(2)._2 - 1.0 / 13) < 1e-12)
  }

  test("FUSE linear: per-branch min-max normalized sum") {
    val df = Seq(
      (1L, "fork1", 10.0), (2L, "fork1", 0.0),
      (2L, "fork2", 100.0), (1L, "fork2", 50.0)).toDF("id", "_fork", "_score")
    val r = Esql.applyCommand(df, "fuse linear")
      .orderBy("id").as[(Long, Double)].collect().toMap
    assert(r(1L) == 1.0 + 0.0) // best in fork1, worst in fork2
    assert(r(2L) == 0.0 + 1.0)
  }

  test("GROK: non-matching rows yield null captures, not cast errors") {
    val df = Seq("user=bob bytes=42", "garbage").toDF("line")
    val r = Esql.applyCommand(df,
      """grok line "user=%{WORD:user} bytes=%{INT:bytes:long}"""")
      .select("user", "bytes").as[(Option[String], Option[Long])].collect().toSeq
    assert(r == Seq((Some("bob"), Some(42L)), (None, None)))
  }

  test("RERANK: deterministic stub scorer recomputes _score and re-sorts") {
    val df = Seq(
      (1L, "alpha beta alpha"), (2L, "alpha"), (3L, "gamma")).toDF("id", "txt")
    val r = Esql.applyCommand(df, """rerank "alpha beta" on txt""")
      .select("id", "_score").as[(Long, Double)].collect().toSeq
    assert(r.head == ((1L, 3.0))) // 2x alpha + 1x beta
    assert(r.map(_._1).take(2) == Seq(1L, 2L))
    assert(r.find(_._1 == 3L).get._2 == 0.0)
  }

  test("SHOW INFO: one-row descriptor, composes with pipes") {
    val r = Esql.run(spark, "/root/testdata/sf0.001",
      "show info | keep name, version")
      .collect().head
    assert(r.getString(0) == "graft")
    assert(r.getString(1).nonEmpty)
  }

  test("COMPLETION: stubbed inference, named column, WITH ignored") {
    val df = Seq((1L, "Alpha, beta gamma!"), (2L, "one")).toDF("id", "txt")
    val r = Esql.applyCommand(df,
      """completion out = txt with { "inference_id" : "x" }""")
      .select("id", "out").as[(Long, String)].collect().toMap
    assert(r(1L) == "stub: gamma beta alpha") // first 8 tokens, reversed
    assert(r(2L) == "stub: one")
    intercept[IllegalArgumentException] {
      Esql.applyCommand(df, "completion = missing-name")
    }
  }

  test("spatial: ST_DISTANCE meters, ST_X/ST_Y accessors") {
    val df = Seq((0.0, 0.0), (90.0, 0.0)).toDF("lon", "lat")
    val r = Esql.applyCommand(df,
      "eval d = st_distance(st_point(lon, lat), st_point(0.0, 0.0)), x = st_x(st_point(lon, lat))")
      .select("d", "x").as[(Double, Double)].collect().toSeq
    assert(r(0)._1 == 0.0)
    // a quarter of the equator: pi/2 * 6371 km
    assert(math.abs(r(1)._1 - math.Pi / 2 * 6371000.0) < 1.0)
    assert(r(1)._2 == 90.0)
  }

  test("TS is the 9.x alias of METRICS: identical result") {
    val viaTs = Esql.run(spark, sfDir,
      "ts events mx = max(value), n = count(*) by event_type | sort event_type")
      .collect().toSeq
    val viaMetrics = Esql.run(spark, sfDir,
      "metrics events mx = max(value), n = count(*) by event_type | sort event_type")
      .collect().toSeq
    assert(viaTs == viaMetrics && viaTs.nonEmpty)
  }

  test("r13 hardening: exact long literals, trailing-token guard, ROUND -n, quoted BY, grok unnamed refs, enrich overwrite") {
    // 64-bit integer literals survive exactly (no Double round-trip):
    // 2^53 + 1 is NOT representable as a double
    val big = Seq((9007199254740993L, 1L), (9007199254740992L, 2L)).toDF("ts", "id")
    assert(Esql.applyCommand(big, "where ts == 9007199254740993")
      .select("id").as[Long].collect().toSeq == Seq(1L))
    // a forgotten AND fails loudly instead of silently dropping terms
    intercept[IllegalArgumentException] {
      Esql.applyCommand(df, """where v > 10 k == "a"""")
    }
    // negative ROUND scale (round to tens)
    assert(Esql.applyCommand(df, "eval r = round(v + 14.0, -1)")
      .where(col("id") === 1L).select("r").as[Double].collect().head == 20.0)
    // ' by ' inside a string literal must not split the STATS body
    val withS = df.withColumn("s2", coalesce(col("s"), lit("none")))
    val r = Esql.applyCommand(withS,
      """stats n = count(*) where s2 == "fix by tuesday"""")
    assert(r.select("n").as[Long].collect().head == 0L)
    // grok: unnamed %{PATTERN} matches without capturing; escaped
    // literal idiom \[ means a literal bracket
    val logs = Seq((1L, "[INFO] alice 42"), (2L, "nope")).toDF("id", "line")
    val g = Esql.applyCommand(logs,
      """grok line "\[%{LOGLEVEL:lvl}\] %{WORD} %{INT:n:long}"""")
    val row = g.where(col("id") === 1L).select("lvl", "n").collect().head
    assert(row.getString(0) == "INFO" && row.getLong(1) == 42L)
    assert(g.where(col("id") === 2L).select("lvl").collect().head.isNullAt(0))
    // enrich overwrites a same-named input column (no ambiguous dup)
    val enr = Seq(("a", "alpha"), ("b", "beta")).toDF("kk", "s")
    val e = Esql.applyCommand(df.withColumnRenamed("k", "kk"),
      "enrich __mem on kk == kk", _ => enr)
    assert(e.columns.count(_ == "s") == 1)
    assert(e.where(col("id") === 1L).select("s").as[String].collect().head == "alpha")
  }
}
