package graft.agg

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{BinaryType, ByteType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.sketch.{CountMinSketch, Hash128}

/**
 * Native Catalyst aggregate for the Count-Min build — the "custom
 * `Expression` beats a Scala UDF" tier of the task's preference order.
 *
 * Versus the `functions.udaf` wrapper (which stays the portable default),
 * this skips the encoder round-trip entirely: `update` reads the
 * `UTF8String` key straight from the InternalRow and hashes its bytes — no
 * Tuple2, no java.lang.String decode/re-encode, no boxing — and partial
 * buffers serialize through the sketch's own fixed binary layout instead of
 * Kryo. Same kernel, same seed, bit-identical results (asserted in
 * NativeAggSpec).
 */
case class NativeCountMinAgg(
    left: Expression,
    right: Expression,
    eps: Double,
    delta: Double,
    seed: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] with BinaryLike[Expression] {

  def keyExpr: Expression = left
  def weightExpr: Expression = right

  /** Checked input types: mistyped SQL (e.g. a non-string key) fails at
    * ANALYSIS with a clear message instead of a runtime ClassCastException
    * in update(). Any integral weight type is accepted (coerced in update). */
  override def checkInputDataTypes(): TypeCheckResult = {
    val okKey = left.dataType == StringType
    val okW = right.dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (okKey && okW) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cm_sketch_fast expects (STRING key, integral weight), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.fromErrorBounds(eps, delta, seed)

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val k = left.eval(input)
    if (k != null) {
      val w = right.eval(input)
      val weight = if (w == null) 1L else w.asInstanceOf[Number].longValue
      val utf8 = k.asInstanceOf[UTF8String]
      // zero-copy, zero-alloc: hash the UTF8String bytes in place with
      // Spark's XXH64 (bit-identical to graft.sketch.XxHash64 — parity
      // pinned in HashingSpec), same double-hash halves as Hash128.ofBytes
      buffer.updateRaw(Utf8Hash.h1(utf8, seed), Utf8Hash.h2(utf8, seed), weight)
    }
    buffer
  }

  override def merge(buffer: CountMinSketch, other: CountMinSketch): CountMinSketch =
    buffer.merge(other)

  override def eval(buffer: CountMinSketch): Any = buffer.serialize()

  override def serialize(buffer: CountMinSketch): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cm_sketch_fast"

  override def withNewMutableAggBufferOffset(newOffset: Int): NativeCountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NativeCountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NativeCountMinAgg =
    copy(left = newLeft, right = newRight)
}

object NativeCountMinAgg {
  /** Register `cm_sketch_fast(key, weight)` in the session's function
    * registry (SQL + expr() access). */
  def register(spark: org.apache.spark.sql.SparkSession,
      eps: Double = 1e-4, delta: Double = 0.01,
      seed: Long = CountMinSketch.DefaultSeed): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cm_sketch_fast",
      exprs => {
        // eps/delta/seed bind from Scala here; reject extra SQL args instead
        // of silently ignoring them (GraftExtensions parses literal args)
        require(exprs.length == 2,
          s"cm_sketch_fast(key, weight): expected 2 arguments, got ${exprs.length}")
        NativeCountMinAgg(exprs.head, exprs(1), eps, delta, seed)
      },
      "built-in")
  }
}
