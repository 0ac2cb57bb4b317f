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
}
