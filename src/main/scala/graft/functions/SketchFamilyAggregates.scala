package graft.sql

import graft.core.{BloomFilter, CountMinSketch, KllSketch, TDigest}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

private[graft] object NumericExtract {
  /** Extractor of a double from an internal value of `dt`, or null if
    * unsupported.
    */
  def extractorFor(dt: DataType): Any => Double = dt match {
    case DoubleType => v => v.asInstanceOf[Double]
    case FloatType => v => v.asInstanceOf[Float].toDouble
    case LongType => v => v.asInstanceOf[Long].toDouble
    case IntegerType => v => v.asInstanceOf[Int].toDouble
    case ShortType => v => v.asInstanceOf[Short].toDouble
    case ByteType => v => v.asInstanceOf[Byte].toDouble
    case _: DecimalType => v => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case _ => null
  }
}

/** Bloom-filter aggregate: build a mergeable membership filter of the distinct
  * values of `child` (hashed with the engine's canonical wyhash). Merge at the
  * shuffle boundary is bitwise OR.
  */
case class BloomFilterAgg(
    child: Expression,
    expectedItems: Long = 1000000L,
    fpp: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  @transient private lazy val hasher: Any => Long = SketchHashing.hasherFor(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (expectedItems <= 0) TypeCheckResult.TypeCheckFailure("expectedItems must be positive")
    else if (fpp <= 0 || fpp >= 1) TypeCheckResult.TypeCheckFailure("fpp must be in (0,1)")
    else if (!SketchHashing.supported(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"bloom_agg does not support input type ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.forExpected(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putHash(hasher(v))
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = buffer.serialize()
  override def serialize(buffer: BloomFilter): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): BloomFilter = BloomFilter.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
  override def prettyName: String = "bloom_agg"
}

/** Count-min sketch aggregate: mergeable frequency table of `child` values. */
case class CountMinAgg(
    child: Expression,
    depth: Int = 5,
    width: Int = 4096,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] with UnaryLike[Expression] {

  @transient private lazy val hasher: Any => Long = SketchHashing.hasherFor(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (depth < 1 || depth > CountMinSketch.MaxDepth)
      TypeCheckResult.TypeCheckFailure(s"depth must be in [1..16], got $depth")
    else if (width < 8 || width > CountMinSketch.MaxWidth)
      TypeCheckResult.TypeCheckFailure(s"width must be in [8..2^24], got $width")
    else if (!SketchHashing.supported(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"cms_agg does not support input type ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): CountMinSketch = new CountMinSketch(depth, width)

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) buffer.addHash(hasher(v))
    buffer
  }

  override def merge(buffer: CountMinSketch, other: CountMinSketch): CountMinSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: CountMinSketch): Any = buffer.serialize()
  override def serialize(buffer: CountMinSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): CountMinAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
  override def prettyName: String = "cms_agg"
}

/** t-digest aggregate: mergeable quantile sketch of a numeric column. */
case class TDigestAgg(
    child: Expression,
    compression: Double = 100.0,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with UnaryLike[Expression] {

  @transient private lazy val extract: Any => Double =
    NumericExtract.extractorFor(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (compression < 20 || compression > 10000)
      TypeCheckResult.TypeCheckFailure(s"compression must be in [20..10000], got $compression")
    else if (NumericExtract.extractorFor(child.dataType) == null)
      TypeCheckResult.TypeCheckFailure(
        s"tdigest_agg expects a numeric column, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TDigest = TDigest(compression)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) {
      val d = extract(v)
      if (!d.isNaN) buffer.add(d)
    }
    buffer
  }

  override def merge(buffer: TDigest, other: TDigest): TDigest = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: TDigest): Any = buffer.serialize()
  override def serialize(buffer: TDigest): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): TDigestAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TDigestAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): TDigestAgg =
    copy(child = newChild)
  override def prettyName: String = "tdigest_agg"
}

/** KLL aggregate: mergeable rank/quantile sketch of a numeric column. */
case class KllAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch] with UnaryLike[Expression] {

  @transient private lazy val extract: Any => Double =
    NumericExtract.extractorFor(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 8 || k > 65536)
      TypeCheckResult.TypeCheckFailure(s"k must be in [8..65536], got $k")
    else if (NumericExtract.extractorFor(child.dataType) == null)
      TypeCheckResult.TypeCheckFailure(
        s"kll_agg expects a numeric column, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): KllSketch = KllSketch(k)

  override def update(buffer: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v != null) {
      val d = extract(v)
      if (!d.isNaN) buffer.add(d)
    }
    buffer
  }

  override def merge(buffer: KllSketch, other: KllSketch): KllSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllSketch): Any = buffer.serialize()
  override def serialize(buffer: KllSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KllSketch = KllSketch.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): KllAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_agg"
}

/** Mutable holder for a decoded sketch of any family. */
private[graft] final class AnySketchBuffer(var sk: AnyRef)

/** Per-family decode/merge/encode used by SketchUnionAgg. Keeping the DECODED
  * object in the aggregation buffer means each input row pays one deserialize
  * + in-place merge, not a deserialize-merge-reserialize round trip.
  */
private[graft] final case class SketchOps(
    deserialize: Array[Byte] => AnyRef,
    mergeInPlace: (AnyRef, AnyRef) => Unit,
    serialize: AnyRef => Array[Byte]) extends Serializable

/** Generic re-aggregation (union) over a column of serialized sketches of one
  * family — the ce_merge pattern for the whole sketch library. Deserialize
  * validates headers, so mixing families fails loudly.
  */
case class SketchUnionAgg(
    child: Expression,
    kind: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[AnySketchBuffer] with UnaryLike[Expression] {

  @transient private lazy val ops: SketchOps = SketchUnionAgg.ops(kind)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!SketchUnionAgg.ops.contains(kind))
      TypeCheckResult.TypeCheckFailure(
        s"unknown sketch kind '$kind' (expected one of ${SketchUnionAgg.ops.keys.mkString(", ")})")
    else if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"${kind}_merge expects a binary sketch column, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): AnySketchBuffer = new AnySketchBuffer(null)

  override def update(buffer: AnySketchBuffer, input: InternalRow): AnySketchBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val sk = ops.deserialize(v.asInstanceOf[Array[Byte]])
      if (buffer.sk == null) buffer.sk = sk else ops.mergeInPlace(buffer.sk, sk)
    }
    buffer
  }

  override def merge(buffer: AnySketchBuffer, other: AnySketchBuffer): AnySketchBuffer = {
    if (buffer.sk == null) buffer.sk = other.sk
    else if (other.sk != null) ops.mergeInPlace(buffer.sk, other.sk)
    buffer
  }

  override def eval(buffer: AnySketchBuffer): Any =
    if (buffer.sk == null) null else ops.serialize(buffer.sk)

  override def serialize(buffer: AnySketchBuffer): Array[Byte] =
    if (buffer.sk == null) Array.emptyByteArray else ops.serialize(buffer.sk)

  override def deserialize(bytes: Array[Byte]): AnySketchBuffer =
    if (bytes.isEmpty) new AnySketchBuffer(null)
    else new AnySketchBuffer(ops.deserialize(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(n: Int): SketchUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SketchUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): SketchUnionAgg =
    copy(child = newChild)
  override def prettyName: String = s"${kind}_merge"
}

object SketchUnionAgg {
  val ops: Map[String, SketchOps] = Map(
    "bloom" -> SketchOps(
      BloomFilter.deserialize,
      (a, b) => a.asInstanceOf[BloomFilter].merge(b.asInstanceOf[BloomFilter]),
      _.asInstanceOf[BloomFilter].serialize()),
    "cms" -> SketchOps(
      CountMinSketch.deserialize,
      (a, b) => a.asInstanceOf[CountMinSketch].merge(b.asInstanceOf[CountMinSketch]),
      _.asInstanceOf[CountMinSketch].serialize()),
    "tdigest" -> SketchOps(
      TDigest.deserialize,
      (a, b) => a.asInstanceOf[TDigest].merge(b.asInstanceOf[TDigest]),
      _.asInstanceOf[TDigest].serialize()),
    "kll" -> SketchOps(
      KllSketch.deserialize,
      (a, b) => a.asInstanceOf[KllSketch].merge(b.asInstanceOf[KllSketch]),
      _.asInstanceOf[KllSketch].serialize()))
}
