package graft.operators

import org.apache.spark.sql.DataFrame

/** The iterative operators' frame-storage discipline, shared by
  * [[Graph]] and [[SuffixArray]] (it was triplicated before — one fix
  * here reaches every loop).
  *
  * [[materializeCut]]: eagerly materialize with lineage TRUNCATED —
  * reliable `checkpoint` when the session has a checkpoint dir
  * (survives executor loss), `localCheckpoint` otherwise
  * (non-replicated executor storage: fast, fine for local/bench use;
  * the caller must consume or persist the result promptly on a real
  * cluster). Truncation is load-bearing for convergence loops: without
  * it each round's plan nests the previous round's full analyzed plan
  * and Catalyst analysis cost grows super-linearly with depth.
  *
  * [[free]]: drop the executor-storage blocks behind a truncated frame
  * once its consumer is materialized — keeps a loop's footprint at one
  * frame per live table instead of waiting on driver GC +
  * ContextCleaner. Reliable checkpoints have no storage blocks; their
  * files follow the session's checkpoint lifecycle. */
private[graft] object Frames {

  def materializeCut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)

  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
