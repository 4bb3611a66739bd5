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

  /** Plan-board stage recorder (VERDICT r19 item 5): lineage
    * truncation makes a staged funnel's work INVISIBLE to the final
    * frame's plan — `doc_repeated_spans` signed as 0 scans / 0
    * exchanges on the r19 board, so a lost pushdown inside a stage
    * could not trip the checker. When `graft.tools.DumpPlans` installs
    * a buffer here (thread-local — frame building is single-threaded
    * in the board tool, and a no-op everywhere else), every cut
    * records the stage frame's EXECUTED plan before truncation, and
    * the board signs main plan + stages together. */
  private val recorder =
    new ThreadLocal[scala.collection.mutable.Buffer[
      org.apache.spark.sql.execution.SparkPlan]]()

  private[graft] def recordStagesInto(
      buf: scala.collection.mutable.Buffer[
        org.apache.spark.sql.execution.SparkPlan]): Unit =
    recorder.set(buf)

  private[graft] def stopRecordingStages(): Unit = recorder.remove()

  private def record(df: DataFrame): Unit = {
    val buf = recorder.get
    if (buf != null) buf += df.queryExecution.executedPlan
  }

  def materializeCut(df: DataFrame): DataFrame = {
    record(df)
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)
  }

  /** A plain eager `localCheckpoint` routed through the stage
    * recorder — for loop/stage frames that deliberately stay on
    * executor storage even when a reliable checkpoint dir exists
    * (edge tables, glue graphs: regenerating them on executor loss is
    * cheaper than replicating every round). Behavior is IDENTICAL to
    * `df.localCheckpoint()`; the only addition is board visibility. */
  def cutLocal(df: DataFrame): DataFrame = {
    record(df)
    df.localCheckpoint(true)
  }

  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
