package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.EventOps

/** Structured Streaming face of the event operators.
  *
  * The reference is batch-only (SURVEY.md §2.2: no streaming), so this is
  * a north-star extension: the SAME windowed-aggregation logic as
  * `EventOps.tumbling` run as an incremental streaming query with a
  * watermark. Batch/stream parity is by construction — both call the same
  * groupBy(window(...)) composition — and is asserted in StreamOpsSpec.
  */
object StreamOps {

  /** Schema of the events table (explicit: readStream requires one). The
    * parquet carries TIMESTAMP(NANOS); it is read as nanos-since-epoch
    * BIGINT (see model.eventsTable) and normalized below.
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over a directory of event parquet files, timestamp
    * normalized to microseconds exactly as the batch path does.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Watermarked tumbling-window aggregation over a streaming events
    * frame. 20-minute watermark: late state is dropped two windows back,
    * which bounds state size — the property that matters when this runs
    * against an unbounded 100 TB/day firehose.
    */
  def tumblingStream(events: DataFrame): DataFrame =
    EventOps.tumbling(events.withWatermark("ts", "20 minutes"))

  /** Run the streaming aggregation over a static directory to completion
    * (memory sink), returning the final result table. Used by tests to
    * assert batch/stream parity.
    */
  def runToCompletion(spark: SparkSession, dir: String, name: String): DataFrame = {
    val q = tumblingStream(readEventStream(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
