package graft
import org.apache.spark.sql.SparkSession

/** Local diagnostic: run a declared query through the noop sink, then
  * report operator counts from the POST-EXECUTION (AQE-final) plan —
  * FileScan / Exchange / ReusedExchange — so within-plan reuse claims
  * can be checked against what actually ran (the pre-execution plan
  * shows duplicate subtrees that AQE later collapses). Env knobs match
  * Bench (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS). */
object PlanCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args.toSeq) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      // collect() executes df's OWN QueryExecution (a noop write spawns
      // a separate one and leaves df's AdaptiveSparkPlan un-finalized,
      // so its string would show the pre-AQE duplicate subtrees)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      def n(re: String) = re.r.findAllIn(p).length
      println(s"$name: ${n("FileScan")} FileScan, " +
        s"${n("Exchange (hash|range|Single|RoundRobin)")} Exchange, " +
        s"${n("ReusedExchange|ReusedQueryStage")} Reused, " +
        s"${n("ShuffleQueryStage")} ShuffleQueryStage, " +
        s"${n("(?m)^\\s*[+:]?[- ]*InMemoryTableScan")} InMemoryTableScan")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
