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

  /** Distributed dense global rank (0-based, appended as `rankName`) in
    * the total order of `orderCols`: range-repartition + sort-within-
    * partitions, then RDD `zipWithIndex`'s two-phase count-then-offset —
    * never the single-partition global sort a `row_number() OVER
    * (ORDER BY …)` window with no PARTITION BY plans to. Range
    * partition k holds strictly smaller keys than partition k+1, so the
    * partition-major index IS the global rank. Ties order arbitrarily
    * within a partition (RangePartitioner never splits equal keys
    * across partitions); callers must be tie-safe — unique keys, or
    * tie-invariant downstream aggregates.
    */
  def globalRank(
      df: DataFrame,
      orderCols: Seq[org.apache.spark.sql.Column],
      rankName: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df.repartitionByRange(n, orderCols: _*).sortWithinPartitions(orderCols: _*)
    val schema =
      StructType(sorted.schema.fields :+ StructField(rankName, LongType, nullable = false))
    val rows = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    sorted.sparkSession.createDataFrame(rows, schema)
  }

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
