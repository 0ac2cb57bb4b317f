package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the file-index + parquet footers so the first timed query
    // isn't charged for session bring-up
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "documents", "embeddings").foreach { t =>
      Tables.load(spark, sfDir, t).count()
    }
    Tables.events(spark, sfDir).count()
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    // optional args: run only the named queries (local iteration aid);
    // the driver passes none and gets the full suite
    val selected =
      if (args.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else SparkEntry.queries.toSeq.sortBy(_._1).filter(q => args.contains(q._1))
    val results = selected.map { case (name, fn) =>
      // stderr progress line per query: when a run stalls (codegen
      // storms, storage-pool contention) the log shows WHICH query,
      // not just frozen executor warnings
      System.err.println(s"[bench] $name")
      val t0 = System.nanoTime()
      // noop sink: every projected column is fully computed and
      // serialized (a bare count() lets Spark prune per-row compute in
      // select-shaped queries and under-bill them)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => failed += name }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators cache intermediates (LSH shingles, CC labels) that
      // stay referenced after the action; dropping them between queries
      // keeps the 107-query suite from accumulating heap pressure that
      // inflates later queries (each query is billed standalone, same
      // as the oracle runs them)
      spark.catalog.clearCache()
      name -> dt
    }
    // 3-decimal times keep the line compact, and the headline fields
    // go LAST: the driver records a bounded TAIL of the log, so the
    // r1 layout (total first) lost the total when the line outgrew
    // the capture window
    // Locale.ROOT: the f-interpolator uses the default locale, and a
    // comma-decimal locale would emit invalid JSON
    def d3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // host 1/5/15-min loadavg: r4's headline (584 s vs a quiet 184 s on the
    // same code) was host CPU starvation outside the container's visibility;
    // recording load next to the timing lets the reader adjudicate that
    // without a re-run
    val loadavg = try {
      scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).mkString(",")
    } catch { case _: Throwable => "" }
    // Two lines: the full per-query map first (humans / archaeology),
    // then a COMPACT summary line LAST. The driver records a bounded
    // tail of the log and parses the JSON it finds there; with 170+
    // queries the full line is ~4 KB and outgrows the capture window
    // (r3's BENCH parse came back null for exactly this reason), so
    // the parseable line carries only the slowest 25 queries.
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + d3(v) }
      .mkString("{", ",", "}")
    println(s"""{"detail":"full","queries":$fullQs}""")
    val top = results.sortBy(-_._2).take(25)
      .map { case (k, v) => "\"" + k + "\":" + d3(v) }
      .mkString("{", ",", "}")
    // a broken query must be visible as "failed", not as a
    // suspiciously fast total
    println(s"""{"queries":$top,"queries_total_count":${results.size},"queries_shown":"slowest 25","failed":$failedJson,"host_loadavg":"$loadavg","sf":"$sfDir","metric":"total","unit":"sec","value":${d3(total)}}""")
    spark.stop()
  }
}
