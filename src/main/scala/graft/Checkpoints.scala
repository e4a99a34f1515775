package graft

import org.apache.spark.sql.DataFrame

/** Shared localCheckpoint hygiene for iterative operators (the CC loops
  * in operators.Dedup, the Lloyd loop in sources.PqCodebook). */
object Checkpoints {

  /** Unpersist the RDD behind a localCheckpoint'd frame. Each
    * localCheckpoint persists blocks that Spark never evicts on its own;
    * a loop that abandons its intermediate frames without this leaks one
    * persisted RDD per iteration for the life of the session (and a
    * long-lived service session runs MANY such loops). Only frames that
    * are never read again may be released — a localCheckpoint has no
    * lineage to recompute from. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Unpersist EVERY localCheckpoint referenced by a frame's plan — for
    * results that have been copied out (e.g. written to a file): a loop
    * body whose helper returns a lazy frame over its own internal
    * checkpoints (the CC label frames) can release the whole residue in
    * one call once nothing will read the frame again. */
  def releaseAll(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))
}
