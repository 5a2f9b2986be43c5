package graft

import graft.ext.Events
import graft.streaming.Streams

/** X9: streaming results replayed from files must agree with their batch
  * twins (tumbling exactly; watermarked sessions = batch minus the
  * withheld tail).
  */
class StreamingSpec extends SparkSuite {

  test("streaming tumbling equals batch tumbling") {
    val batch = Events.tumbling(spark, sf).collect().toSeq
    val stream = Streams.tumbling(spark, sf).collect().toSeq
    assert(stream === batch)
  }

  test("watermarked streaming sessions are a subset of batch sessions") {
    val batch = Events.sessions(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val stream = Streams.sessionsWatermarked(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(stream.nonEmpty)
    assert(stream.subsetOf(batch),
      s"streaming emitted sessions absent from batch: ${stream.diff(batch).take(3)}")
  }
}
