package graft.typed

import graft.core.{CardinalitySketch, WyHash}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` flavor of the cardinality sketch — the reference's
  * zero/insert/merge/estimate lifecycle expressed in the Dataset typed API
  * (SURVEY.md §2.2: the crate IS a UDAF in spirit). Use with
  * `ds.groupByKey(...).agg(CardinalityAggregator.ofLong().toColumn)` or
  * register via `functions.udaf(...)`. The Catalyst
  * `CardinalitySketchAgg` expression remains the primary (faster) path; this
  * exists for typed pipelines and `functions.udaf` interop.
  */
class CardinalityAggregator[IN](hash: IN => Long, p: Int = 12, w: Int = 6)
  extends Aggregator[IN, Array[Byte], Long] with Serializable {

  override def zero: Array[Byte] = new CardinalitySketch(p, w).serialize()

  override def reduce(buffer: Array[Byte], item: IN): Array[Byte] = {
    val sk = CardinalitySketch.deserialize(buffer)
    if (item != null) sk.insertHash(hash(item))
    sk.serialize()
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    CardinalitySketch.union(a, b)

  override def finish(buffer: Array[Byte]): Long =
    CardinalitySketch.estimateBytes(buffer)

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object CardinalityAggregator {
  def ofLong(p: Int = 12, w: Int = 6): CardinalityAggregator[Long] =
    new CardinalityAggregator[Long](WyHash.hashLong, p, w)

  def ofString(p: Int = 12, w: Int = 6): CardinalityAggregator[String] =
    new CardinalityAggregator[String](s => {
      val b = s.getBytes("UTF-8")
      WyHash.hash(b, 0, b.length, 0L)
    }, p, w)
}
