package graft.agg

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{BinaryType, ByteType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.sketch.{CountMinSketch, Hash128, TopKSketch}

/**
 * Native Catalyst aggregate for the CM+heap heavy-hitter build — the same
 * encoder-free tier as [[NativeCountMinAgg]], applied to the north-star
 * heavy-hitter operator (the slowest build path in BENCH_r02: 11.4 Mrows/s
 * vs CM's 21–23 via the udaf wrapper).
 *
 * `update` hashes the `UTF8String` key bytes in place (zero-copy XXH64,
 * bit-identical to `Hash128.ofString` — parity pinned in HashingSpec) and
 * feeds [[TopKSketch.updateRaw]], which only materializes a java.lang.String
 * on the COLD path (the key enters or displaces a heap candidate); the hot
 * non-candidate row pays two hashes and d counter bumps, no decode, no
 * boxing, no Tuple2 encoder round-trip. Partial buffers serialize through
 * the sketch's own binary layout. Same kernel, same seed, bit-identical
 * results vs the udaf path (asserted in NativeAggSpec).
 */
case class NativeTopKAgg(
    left: Expression,
    right: Expression,
    capacity: Int,
    eps: Double,
    delta: Double,
    seed: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKSketch] with BinaryLike[Expression] {

  def keyExpr: Expression = left
  def weightExpr: Expression = right

  override def checkInputDataTypes(): TypeCheckResult = {
    val okKey = left.dataType == StringType
    val okW = right.dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (okKey && okW) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_sketch_fast expects (STRING key, integral weight), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def createAggregationBuffer(): TopKSketch =
    TopKSketch(capacity, eps, delta, seed)

  override def update(buffer: TopKSketch, input: InternalRow): TopKSketch = {
    val k = left.eval(input)
    if (k != null) {
      val w = right.eval(input)
      val weight = if (w == null) 1L else w.asInstanceOf[Number].longValue
      val utf8 = k.asInstanceOf[UTF8String]
      // the thunk runs synchronously inside updateRaw (before the row
      // buffer can be reused), see TopKSketch.updateRaw's contract
      buffer.updateRaw(Utf8Hash.h1(utf8, seed), Utf8Hash.h2(utf8, seed),
        weight, () => utf8.toString)
    }
    buffer
  }

  override def merge(buffer: TopKSketch, other: TopKSketch): TopKSketch =
    buffer.merge(other)

  override def eval(buffer: TopKSketch): Any = buffer.serialize()

  override def serialize(buffer: TopKSketch): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): TopKSketch =
    TopKSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "topk_sketch_fast"

  override def withNewMutableAggBufferOffset(newOffset: Int): NativeTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NativeTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NativeTopKAgg =
    copy(left = newLeft, right = newRight)
}

object NativeTopKAgg {
  /** Register `topk_sketch_fast(key, weight)` in the session's function
    * registry (SQL + expr() access). */
  def register(spark: org.apache.spark.sql.SparkSession,
      capacity: Int = 4096, eps: Double = 1e-4, delta: Double = 0.01,
      seed: Long = CountMinSketch.DefaultSeed): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_sketch_fast",
      exprs => {
        // capacity/eps/delta/seed bind from Scala here; reject extra SQL
        // args instead of silently ignoring them (GraftExtensions parses
        // literal arguments)
        require(exprs.length == 2,
          s"topk_sketch_fast(key, weight): expected 2 arguments, got ${exprs.length}")
        NativeTopKAgg(exprs.head, exprs(1), capacity, eps, delta, seed)
      },
      "built-in")
  }
}
