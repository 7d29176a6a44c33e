package org.apache.spark.sql.graftvec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage-control helpers for checkpoint-based iterative loops.
  *
  * `Dataset.localCheckpoint` truncates lineage by swapping the plan for a
  * `LogicalRDD` over a persisted internal RDD, but offers no API to release
  * those blocks — they live until the ContextCleaner garbage-collects the
  * RDD. An iterative algorithm that checkpoints every round wants to free
  * round N's blocks as soon as round N+1 is materialized; this helper digs
  * the backing RDD out of the checkpointed plan (package-private Spark
  * internals, hence the org.apache.spark.sql placement — same convention
  * as QuantizedDot). */
object RddUtils {

  /** Unpersist the RDD backing a `localCheckpoint`ed DataFrame, if that is
    * what `df` is; no-op otherwise. Non-blocking. */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
