package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Statistics hygiene for checkpoint-based iterative loops.
  *
  * Spark 4's `Dataset.localCheckpoint` wraps the checkpointed RDD in a
  * `LogicalRDD` that CARRIES OVER the origin plan's estimated statistics
  * (`originStats`). In an iterative driver loop that is a time bomb: the
  * size-only estimator multiplies child `sizeInBytes` at every join, so a
  * state built from k checkpointed generations carries a size estimate
  * whose BigInt bit-length DOUBLES per round — by round 20 the driver
  * spends minutes in Karatsuba multiplication inside
  * `LogicalPlan.stats` (measured: 92-million-bit sizeInBytes, 97 s/round
  * of pure driver CPU, executors idle).
  *
  * This shim rebuilds the checkpointed frame as a fresh `LogicalRDD`
  * with NO origin stats (falling back to the conf default size) while
  * preserving the output attributes, the RDD, its partitioning, and its
  * ordering — so joins planned against the checkpoint still avoid
  * re-exchanges, and AQE still sees true sizes at runtime.
  *
  * Lives in the `org.apache.spark.sql` namespace because `LogicalRDD`
  * and `Dataset.ofRows` are `private[sql]` — same technique as
  * [[ColumnBridge]].
  */
object CheckpointBridge {
  def dropOriginStats(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val session = df.sparkSession.asInstanceOf[ClassicSession]
        ClassicDataset.ofRows(
          session,
          new LogicalRDD(
            l.output,
            l.rdd,
            l.outputPartitioning,
            l.outputOrdering,
            l.isStreaming,
            l.stream)(session, None, None))
      case _ => df
    }

  /** Non-blocking read of an [[org.apache.spark.sql.Observation]]'s
    * metrics (`getOrEmpty` is `private[sql]`): empty map if the observed
    * action has not reported — callers fall back to an explicit job
    * instead of blocking on `get`.
    */
  def observedMetrics(obs: org.apache.spark.sql.Observation): Map[String, Any] =
    obs.getOrEmpty

  /** Block until all queued listener events are delivered
    * (`listenerBus` is `private[spark]`): a metrics listener read right
    * after an action would otherwise race the async event bus.
    */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Unload every cached state-store provider (`StateStore.unloadAll`
    * is `private[sql]`). A bounded harness stream run leaves its
    * providers in the executor-level cache keyed by a runId that will
    * never run again, with a checkpoint dir the harness is about to
    * delete — the 60 s maintenance tick then walks a growing orphan
    * list (dozens of providers per stream-stream join), which is
    * exactly the positional per-batch slowdown the round-15 arbiter
    * repro measured (identical trigger counts, 2–3× work-ms late in a
    * long child). Providers reload from their checkpoint on demand, so
    * unloading between SEQUENTIAL runs is always safe.
    */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()

  /** [[dropOriginStats]] plus a DECLARED hash partitioning: a checkpoint
    * taken under AQE reports `UnknownPartitioning`, so every downstream
    * join re-exchanges rows that are already laid out on the join key.
    * When the caller just produced the checkpoint from an explicit
    * `repartition(numParts, cols…)` — explicit numParts, which AQE must
    * not coalesce — the physical layout IS `HashPartitioning(cols,
    * numParts)`, and declaring it lets self-joins on those keys plan
    * with zero exchanges. The partition-count assertion refuses the
    * claim if the layout can't match.
    */
  def withDeclaredHashPartitioning(df: DataFrame, cols: Seq[String], numParts: Int): DataFrame =
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        require(
          l.rdd.getNumPartitions == numParts,
          s"checkpointed RDD has ${l.rdd.getNumPartitions} partitions, declared $numParts")
        val attrs = cols.map(c =>
          l.output
            .find(_.name == c)
            .getOrElse(throw new IllegalArgumentException(s"no output column '$c'")))
        val session = df.sparkSession.asInstanceOf[ClassicSession]
        ClassicDataset.ofRows(
          session,
          new LogicalRDD(
            l.output,
            l.rdd,
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(attrs, numParts),
            l.outputOrdering,
            l.isStreaming,
            l.stream)(session, None, None))
      case _ => df
    }
}
