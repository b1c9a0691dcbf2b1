package graft

import graft.operators.EventOps
import graft.streaming.StreamOps

/** Batch/stream parity for the windowed event aggregation: the streaming
  * query over the same parquet directory must converge to exactly the
  * batch result.
  */
class StreamOpsSpec extends SparkSpec {

  test("streaming tumbling agg equals batch tumbling agg at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventOps
      .tumbling(model.eventsTable(spark, dir))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // file-stream sources need a directory; stage the single parquet file
    val staged = java.nio.file.Files.createTempDirectory("stream-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val streamed = StreamOps
      .runToCompletion(spark, staged.toString, "stream_parity_test")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }
}
