package graft.agg

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String
import graft.sketch.HyperLogLog

/**
 * Native Catalyst aggregate for the HyperLogLog build (round 4, VERDICT r3
 * item 5): the profile showed the udaf build peaking at ~39% of the
 * platform scan baseline while its per-row kernel work is one hash + one
 * register max — the encoder round-trip (UTF8String → java.lang.String →
 * Tuple input) plus Kryo partial-buffer serialization is the gap. This
 * reads the `UTF8String` straight off the InternalRow, hashes its bytes in
 * place with Spark's XXH64 (bit-identical to `XxHash64.hashString` on the
 * decoded string — parity pinned in HashingSpec), and serializes partials
 * through the sketch's fixed binary layout. Bit-identical registers to the
 * udaf build (NativeAggSpec pattern).
 */
case class NativeHllAgg(
    child: Expression,
    p: Int,
    seed: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HyperLogLog] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_sketch_fast expects a STRING key, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): HyperLogLog = HyperLogLog(p, seed)

  override def update(buffer: HyperLogLog, input: InternalRow): HyperLogLog = {
    val k = child.eval(input)
    if (k != null) {
      val utf8 = k.asInstanceOf[UTF8String]
      // same hash stream as HllAggregator's add(String): XXH64 over the
      // UTF-8 bytes with the sketch seed — zero-copy, zero-alloc
      buffer.addHash(XXH64.hashUnsafeBytes(
        utf8.getBaseObject, utf8.getBaseOffset, utf8.numBytes, seed))
    }
    buffer
  }

  override def merge(buffer: HyperLogLog, other: HyperLogLog): HyperLogLog =
    buffer.merge(other)

  override def eval(buffer: HyperLogLog): Any = buffer.serialize()

  override def serialize(buffer: HyperLogLog): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): HyperLogLog =
    HyperLogLog.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch_fast"

  override def withNewMutableAggBufferOffset(newOffset: Int): NativeHllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NativeHllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): NativeHllAgg =
    copy(child = newChild)
}

object NativeHllAgg {
  /** Register `hll_sketch_fast(key)` in the session's function registry. */
  def register(spark: org.apache.spark.sql.SparkSession,
      p: Int = 14, seed: Long = HyperLogLog.DefaultSeed): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_sketch_fast",
      exprs => {
        // this registration binds p/seed from Scala; reject extra SQL args
        // instead of silently ignoring them (the GraftExtensions path is
        // the one that parses literal p/seed arguments)
        require(exprs.length == 1,
          s"hll_sketch_fast(key): expected 1 argument, got ${exprs.length} " +
            "(p/seed are fixed by this registration; use the " +
            "GraftExtensions surface for literal arguments)")
        NativeHllAgg(exprs.head, p, seed)
      },
      "built-in")
  }
}
