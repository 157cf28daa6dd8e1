package graft.streaming

import graft.SparkTestBase
import graft.queries.TextQueries

/**
 * q79 contract: the streamed dedup census equals the batch q15 census (the
 * order-free-count claim behind the shared oracle) for any slicing, the run
 * is genuinely multi-micro-batch, and the dedup face genuinely carries
 * keyed state (the survivor log is load-bearing, not recomputed in batch).
 */
class StreamDedupSpec extends SparkTestBase {

  private def batch = TextQueries.dedupExact(spark, sf("sf0.001"))
    .collect().map(_.toString).toSeq

  test("streamed dedup census == batch census at sf0.001, over >=3 micro-batches") {
    val streamed = StreamDedup.streamDedupCensus(spark, sf("sf0.001"))
      .collect().map(_.toString).toSeq
    assert(streamed === batch)
    assert(StreamDedup.lastRunBatches >= 3,
      s"expected >=3 data micro-batches, got ${StreamDedup.lastRunBatches}")
    // the dedup operator must have committed one state row per distinct
    // hash it admitted — zero state rows would mean the survivor log was
    // produced by something other than the stateful dedup
    assert(StreamDedup.lastDedupStateRows > 0L)
  }

  test("slice count cannot change the census (counts are order-free)") {
    val oneSlice = StreamDedup.streamDedupCensus(spark, sf("sf0.001"), slices = 1)
      .collect().map(_.toString).toSeq
    val fiveSlices = StreamDedup.streamDedupCensus(spark, sf("sf0.001"), slices = 5)
      .collect().map(_.toString).toSeq
    assert(oneSlice === batch)
    assert(fiveSlices === batch)
  }
}
