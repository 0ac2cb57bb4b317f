package graft

import org.apache.spark.sql.SparkSession

/** Session bootstrap with graft's extensions and the configuration a
  * 100 TB deployment wants by default: AQE (runtime re-planning + skew
  * join handling), UTC session time, and the SQL functions registered.
  * `shufflePartitions` should track the cluster's total cores (the
  * local default of 200 is wrong in both directions).
  */
object GraftSession {
  def builder(appName: String = "graft", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // post-shuffle coalescing keeps reducer partitions near target
      // size when a filter/agg shrinks the data mid-plan
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // 128m splits: the scan parallelism knob — at 100 TB this yields
      // ~800k input splits, which AQE then coalesces after pruning
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      .config("spark.sql.session.timeZone", "UTC")
}
