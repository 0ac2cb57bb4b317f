package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Optimization-round profiling harness (guide §1): per query, split
  * wall time into plan-build / planning / execution, count jobs,
  * stages and tasks, and run each query twice so fixed JVM warm-up
  * (codegen compile, first-touch caches) separates from steady-state
  * cost. Same session shape and noop-sink methodology as Bench. Not
  * part of the driver contract — a local measurement aid.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "documents", "embeddings").foreach { t =>
      Tables.load(spark, sfDir, t).count()
    }
    Tables.events(spark, sfDir).count()

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobSecs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double)]()
    val stageCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobStart.put(js.jobId, System.nanoTime())
        stageCount.addAndGet(js.stageInfos.size)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = jobStart.getOrDefault(je.jobId, System.nanoTime())
        jobSecs.add((je.jobId, (System.nanoTime() - t0) / 1e9))
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        taskCount.incrementAndGet(); ()
      }
    })

    def once(name: String): Unit = {
      val fn = SparkEntry.queries(name)
      jobSecs.clear(); stageCount.set(0); taskCount.set(0)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      // listener bus is async; give it a beat before reading counters
      Thread.sleep(300)
      val jobs = {
        val it = jobSecs.iterator(); val b = Seq.newBuilder[(Int, Double)]
        while (it.hasNext) b += it.next(); b.result().sortBy(_._1)
      }
      println(f"$name%-38s build=${(t1 - t0) / 1e9}%6.3f plan=${(t2 - t1) / 1e9}%6.3f " +
        f"exec=${(t3 - t2) / 1e9}%6.3f jobs=${jobs.size}%3d stages=${stageCount.get}%3d tasks=${taskCount.get}%5d")
      if (sys.env.contains("PROF_JOBS"))
        jobs.foreach { case (id, s) => println(f"    job $id%4d ${s}%7.3f s") }
      spark.catalog.clearCache()
    }

    for (name <- args.toSeq) { once(name); once(name) }
    spark.stop()
  }
}
