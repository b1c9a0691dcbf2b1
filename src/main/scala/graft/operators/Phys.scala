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

  /** [[materialized]], hash-laid-out on `cols`: repartitions with an
    * EXPLICIT partition count (so AQE cannot coalesce the layout),
    * checkpoints, and re-declares the resulting `HashPartitioning` on
    * the checkpointed frame (a checkpoint under AQE otherwise reports
    * `UnknownPartitioning`). Downstream joins keyed on `cols` — notably
    * self-joins — then plan with no exchange on this side.
    */
  def materializedHashedBy(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    org.apache.spark.sql.graftbridge.CheckpointBridge.withDeclaredHashPartitioning(
      df.repartition(n, cols.map(col): _*).localCheckpoint(true),
      cols,
      n)
  }
}
