package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared physical-plan helpers for operators that reuse an intermediate
  * on both sides of a self-join (or across two downstream consumers).
  */
private[graft] object Phys {

  /** Eager local checkpoint with origin stats dropped. Unlike
    * `persist()`, the blocks are GC-scoped — freed by the ContextCleaner
    * once the caller drops the frame — so repeated calls in a long-lived
    * session can't accumulate pinned executor memory; and unlike a bare
    * checkpoint, the estimator stats don't compound across generations
    * (see `org.apache.spark.sql.graftbridge.CheckpointBridge`).
    */
  def materialized(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftbridge.CheckpointBridge.dropOriginStats(df.localCheckpoint(true))
}
