package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.SparkTestBase
import graft.agg.SketchFunctions._
import graft.sketch.{CountMinSketch, HyperLogLog}

/**
 * Structured Streaming compatibility: the sketches are mergeable monoids, so
 * they drop into streaming `groupBy().agg()` in update/complete mode
 * unchanged (SURVEY.md §2.9 — not a north-rule deliverable, but the merge
 * design makes it free; this proves it).
 */
class StreamingSpec extends SparkTestBase {

  import spark.implicits._

  test("file source -> sketch agg -> parquet sink with checkpoint (full IO path)") {
    // the readStream → transforms → writeStream contract over REAL files:
    // parquet file source discovered incrementally, sketch aggregate in a
    // foreachBatch parquet sink, offsets tracked in a checkpoint dir
    val root = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val srcDir = s"$root/in"; val outDir = s"$root/out"; val ckpt = s"$root/ckpt"
    new java.io.File(srcDir).mkdirs()
    val batch1 = Seq(("a", 3L), ("b", 1L), ("a", 2L)).toDF("k", "w")
    batch1.write.parquet(s"$srcDir/p1")
    val schema = batch1.schema
    val q = spark.readStream.schema(schema)
      .option("path", s"$srcDir/*").format("parquet").load()
      .groupBy(col("k"))
      .agg(cm_sketch(col("k"), col("w"), eps = 1e-3).as("sk"))
      .select(col("k"), cm_query(col("sk"), col("k")).as("est"))
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.write.mode("overwrite").parquet(outDir)
      }
      .start()
    q.processAllAvailable()
    val batch2 = Seq(("a", 5L), ("c", 7L)).toDF("k", "w")
    batch2.write.parquet(s"$srcDir/p2")
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(outDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 10L, "b" -> 1L, "c" -> 7L))
    // the checkpoint recorded both discovered files
    assert(new java.io.File(s"$ckpt/sources").exists())
  }

  test("cm_sketch in a streaming aggregation over micro-batches == batch build") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = mem.toDF().toDF("k", "w")
      .agg(cm_sketch(col("k"), col("w"), eps = 1e-3).as("sk"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("cm_stream")
      .start()
    val stream = graft.sketch.StreamFixtures.weightedZipfStream(20000, 1000)
    // three micro-batches
    stream.grouped(7000).foreach { batch =>
      mem.addData(batch)
      q.processAllAvailable()
    }
    val got = spark.sql("SELECT sk FROM cm_stream").head().getAs[Array[Byte]]("sk")
    q.stop()
    val single = CountMinSketch.fromErrorBounds(1e-3, 0.01)
    stream.foreach { case (k, w) => single.update(k, w) }
    assert(java.util.Arrays.equals(got, single.serialize()))
  }

  test("native Catalyst aggregates in streaming micro-batches == batch build") {
    // the TypedImperativeAggregate tier (cm_sketch_fast / topk_sketch_fast)
    // must behave in streaming groupBy().agg() exactly like the udaf tier —
    // partial buffers serialize through the sketch binary layout across
    // micro-batch state, so the final sketch equals a single-pass build
    implicit val sqlCtx = spark.sqlContext
    graft.agg.NativeCountMinAgg.register(spark, eps = 1e-3, delta = 0.01)
    graft.agg.NativeTopKAgg.register(spark, capacity = 2048, eps = 1e-3, delta = 0.01)
    graft.agg.NativeHllAgg.register(spark, p = 14)
    val mem = MemoryStream[(String, Long)]
    val q = mem.toDF().toDF("k", "w")
      .agg(expr("cm_sketch_fast(k, w)").as("cm"),
        expr("topk_sketch_fast(k, w)").as("tk"),
        expr("hll_sketch_fast(k)").as("hll"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("native_stream")
      .start()
    val stream = graft.sketch.StreamFixtures.weightedZipfStream(20000, 1000)
    stream.grouped(7000).foreach { batch =>
      mem.addData(batch)
      q.processAllAvailable()
    }
    val row = spark.sql("SELECT cm, tk, hll FROM native_stream").head()
    q.stop()
    val cmSingle = CountMinSketch.fromErrorBounds(1e-3, 0.01)
    stream.foreach { case (k, w) => cmSingle.update(k, w) }
    assert(java.util.Arrays.equals(row.getAs[Array[Byte]]("cm"), cmSingle.serialize()))
    // hll (round 4): register max is order/batching-independent — the
    // streaming state merge must be bit-identical to a single-pass kernel
    val hllSingle = graft.sketch.HyperLogLog(14)
    stream.foreach { case (k, _) => hllSingle.add(k) }
    assert(java.util.Arrays.equals(
      row.getAs[Array[Byte]]("hll"), hllSingle.serialize()))
    // topk twin = the BATCH native build over the same rows: a sequential
    // kernel loop stores each key's estimate AT LAST TOUCH, while every
    // merge re-estimates candidates against the merged CM — so the
    // streaming result (state merge per micro-batch) matches the batch
    // aggregation (partial/final merge), not the raw loop. With capacity ≥
    // keyspace no trim happens, so merge shape can't change the set either.
    val tk = graft.sketch.TopKSketch.deserialize(row.getAs[Array[Byte]]("tk"))
    val tkBatch = graft.sketch.TopKSketch.deserialize(
      stream.toDF("k", "w").repartition(8)
        .agg(expr("topk_sketch_fast(k, w)").as("tk"))
        .head().getAs[Array[Byte]]("tk"))
    assert(tk.totalWeight === tkBatch.totalWeight)
    assert(tk.topK(2048).toSeq === tkBatch.topK(2048).toSeq)
    // and the listing's estimates equal final-CM point queries (candidate
    // set complete at this capacity; CM equality proven above)
    val listed = tk.topK(2048).toMap
    assert(listed.forall { case (k, est) => est == cmSingle.query(k) })
  }

  test("hll_sketch per-group streaming distinct counts (update mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = mem.toDF().toDF("grp", "k")
      .groupBy(col("grp"))
      .agg(hll_sketch(col("k"), p = 12).as("sk"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_stream")
      .start()
    val data = (0 until 5000).map(i => (s"g${i % 3}", s"user_${i % 500}"))
    data.grouped(2000).foreach { batch =>
      mem.addData(batch)
      q.processAllAvailable()
    }
    val rows = spark.sql("SELECT grp, sk FROM hll_stream").collect()
    q.stop()
    assert(rows.length === 3)
    rows.foreach { r =>
      val est = HyperLogLog.deserialize(r.getAs[Array[Byte]]("sk")).estimate()
      val exact = data.filter(_._1 == r.getString(0)).map(_._2).distinct.size
      assert(math.abs(est - exact) <= 0.05 * exact + 2, s"grp=${r.getString(0)}")
    }
  }

  test("event-time windowed sketch aggregation with watermark (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val q = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("k"))
      .agg(cm_sketch(col("k"), lit(1L), eps = 1e-3).as("sk"))
      .select(col("window.start").as("ws"), col("k"),
        cm_query(col("sk"), col("k")).as("est"))
      .writeStream.outputMode("append")
      .format("memory").queryName("windowed_cm")
      .start()
    def t(hhmm: String) = Timestamp.valueOf(s"2026-01-01 $hhmm:00")
    // hour 10: 3x a, 1x b; hour 11: 2x a — then advance watermark past both
    mem.addData(Seq((t("10:05"), "a"), (t("10:20"), "a"), (t("10:40"), "a"), (t("10:50"), "b")))
    q.processAllAvailable()
    mem.addData(Seq((t("11:10"), "a"), (t("11:30"), "a")))
    q.processAllAvailable()
    mem.addData(Seq((t("13:00"), "z"))) // advances watermark, closes windows
    q.processAllAvailable()
    val rows = spark.sql("SELECT ws, k, est FROM windowed_cm").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(rows.contains(("2026-01-01 10:00:00.0", "a", 3L)))
    assert(rows.contains(("2026-01-01 10:00:00.0", "b", 1L)))
    assert(rows.contains(("2026-01-01 11:00:00.0", "a", 2L)))
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark across micro-batches") {
    // the q15 dedup family's streaming face: duplicate content hashes
    // arriving in later micro-batches (within the watermark window) must
    // emit once, with state BOUNDED by the watermark — the 100 TB shape
    // for deduplicating a document firehose
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val q = mem.toDF().toDF("ts", "h")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("h")
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_dedup")
      .start()
    def t(hhmm: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00")
    mem.addData(Seq((t("10:00"), "a"), (t("10:05"), "b"), (t("10:06"), "a")))
    q.processAllAvailable()
    // "a" recurs across the batch boundary: still a duplicate
    mem.addData(Seq((t("10:10"), "a"), (t("10:20"), "c")))
    q.processAllAvailable()
    mem.addData(Seq((t("14:00"), "z"))) // advances the watermark past all
    q.processAllAvailable()
    val got = spark.sql("SELECT h FROM stream_dedup").collect()
      .map(_.getString(0)).sorted.toSeq
    q.stop()
    assert(got === Seq("a", "b", "c", "z"))
  }

  test("streaming sessionization == batch sessionization (state across micro-batches)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the q54 gap rule as mapGroupsWithState: state = (last ts, sessions so
    // far); a session must survive a micro-batch boundary iff the gap is
    // within 30 min, and split iff it is not — both cases constructed below
    val GapUs = 1800000000L
    val mem = MemoryStream[(Long, Long)] // (user_id, ts_us)
    def fn(user: Long, rows: Iterator[(Long, Long)],
        state: GroupState[(Long, Long)]): Iterator[(Long, Long)] = {
      var (lastTs, sessions) = state.getOption.getOrElse((Long.MinValue, 0L))
      rows.toSeq.sortBy(_._2).foreach { case (_, ts) =>
        if (lastTs == Long.MinValue || ts - lastTs > GapUs) sessions += 1
        lastTs = ts
      }
      state.update((lastTs, sessions))
      Iterator((user, sessions))
    }
    val q = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
      .toDF("user_id", "n_sessions")
      .writeStream.outputMode("update")
      .format("memory").queryName("stream_sessions")
      .start()
    val H = 3600000000L // 1h in us
    // user 1: batch2 continues the session (+10 min); user 2: batch2 splits
    mem.addData(Seq((1L, 0L), (1L, H), (2L, 0L)))
    q.processAllAvailable()
    mem.addData(Seq((1L, H + GapUs / 3), (2L, 3 * H)))
    q.processAllAvailable()
    val got = spark.sql("SELECT user_id, max(n_sessions) FROM stream_sessions GROUP BY 1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    q.stop()
    // batch reference: user 1 has gaps {1h} then +10min → 2 sessions;
    // user 2 has one event then a 3h gap → 2 sessions
    assert(got === Map(1L -> 2L, 2L -> 2L))
  }

  test("flatMapGroupsWithState: per-group HLL sketch carried as explicit state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    // state = serialized HLL per group; emit running distinct estimate
    def fn(key: String, rows: Iterator[(String, String)],
        state: GroupState[Array[Byte]]): Iterator[(String, Long)] = {
      val hll = state.getOption.map(HyperLogLog.deserialize)
        .getOrElse(HyperLogLog(12))
      rows.foreach { case (_, v) => hll.add(v) }
      state.update(hll.serialize())
      Iterator((key, hll.estimateLong()))
    }
    val q = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
      .toDF("grp", "running_distinct")
      .writeStream.outputMode("update")
      .format("memory").queryName("stateful_hll")
      .start()
    mem.addData((0 until 300).map(i => ("g1", s"u${i % 100}")))
    q.processAllAvailable()
    mem.addData((0 until 300).map(i => ("g1", s"u${100 + (i % 50)}")))
    q.processAllAvailable()
    val last = spark.sql(
      "SELECT running_distinct FROM stateful_hll").collect().map(_.getLong(0)).max
    q.stop()
    // 150 true distinct across both batches; HLL p=12 well within 5%
    assert(math.abs(last - 150L) <= 10, s"est=$last")
  }
}
