package graft.util

import org.apache.spark.sql.DataFrame

/** Stage-boundary materialization for iterative and multi-consumer
  * plans — the dedupClusters connected-components recipe, shared so
  * the policy can't drift per call site:
  *
  *   - EAGER reliable checkpoint when a checkpoint dir is configured
  *     (cluster resilience: blocks survive executor loss and
  *     decommission, unlike executor-local checkpoint blocks);
  *   - eager localCheckpoint otherwise (single-JVM local mode, where
  *     executor loss is process death anyway).
  *
  * Both truncate plan lineage — the fix for the ~4x/round logical-
  * tree growth that OOM'd the driver in iterative consumers (a 2 GB
  * plan string at nine CC rounds) — and double as the stage's
  * materialization barrier, so concurrent consumer branches of one
  * action can't race a lazy cache into recomputing the upstream
  * pipeline. Superseded blocks are dropped by the ContextCleaner when
  * the frame goes out of scope; reliable-checkpoint files live until
  * the application clears its checkpoint dir.
  */
object Stages {
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Scale-adaptive fan-out for CPU-bound map kernels (r17): a tiny
    * input (single-row-group parquet, a just-written sidecar file)
    * scans as 1-2 splits, so a decode/tokenize/score kernel downstream
    * runs on 1-2 of the session's cores. When the input's size
    * ESTIMATE is under cores x 4 MB, round-robin repartition to the
    * default parallelism so the per-row compute uses the machine; the
    * shuffled bytes are bounded by the same guard. Above the
    * threshold the input already splits past the core count and this
    * is the identity — at 100 TB the guard never fires and no
    * exchange is added. Decision reads the plan's stats estimate;
    * it never runs a job. */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < BigInt(target.toLong * 4L * 1024 * 1024)) df.repartition(target)
    else df
  }
}
