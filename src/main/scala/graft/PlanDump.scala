package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (name <- args.toSeq) {
      println(s"==== $name")
      val p = SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString
      println(p.linesIterator.map(_.take(140)).mkString("\n"))
    }
    spark.stop()
  }
}
