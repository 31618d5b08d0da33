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
  *
  * The buffer is the live `CardinalitySketch` OBJECT (Kryo-encoded): because
  * the encoder is opaque/object-typed, Spark plans this as a
  * `ComplexTypedAggregateExpression` over `ObjectHashAggregateExec`, so
  * `reduce` mutates the in-memory sketch per row and Kryo serialization
  * happens only at partial/final exchange boundaries — the same
  * serialize-only-at-shuffle shape as the Catalyst path (an earlier version
  * buffered serialized bytes and paid a full sketch decode+encode per input
  * row, ~3 KB of copying per row in HLL mode).
  */
class CardinalityAggregator[IN](hash: IN => Long, p: Int = 12, w: Int = 6)
  extends Aggregator[IN, CardinalitySketch, Long] with Serializable {

  override def zero: CardinalitySketch = new CardinalitySketch(p, w)

  override def reduce(buffer: CardinalitySketch, item: IN): CardinalitySketch = {
    if (item != null) buffer.insertHash(hash(item))
    buffer
  }

  override def merge(a: CardinalitySketch, b: CardinalitySketch): CardinalitySketch = {
    a.merge(b)
    a
  }

  override def finish(buffer: CardinalitySketch): Long = buffer.estimate

  override def bufferEncoder: Encoder[CardinalitySketch] =
    Encoders.kryo[CardinalitySketch]
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
