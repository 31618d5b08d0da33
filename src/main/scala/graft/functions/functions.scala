package graft

import graft.sql._

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftshim.ColumnShim

/** Public Column API of the sketch library — the Spark-native equivalent of
  * the reference crate's user contract (README.md:22-30: new / insert /
  * estimate / merge / serde), lifted to DataFrame aggregation:
  *
  * {{{
  * import graft.functions._
  * pages.groupBy($"lang").agg(ce_approx_distinct($"url") as "distinct_urls")
  * pages.groupBy($"lang", $"day").agg(ce_sketch($"url") as "sk")   // store
  *      .groupBy($"lang").agg(ce_merge_estimate($"sk"))            // roll up
  * }}}
  */
object functions {

  private def toCol(e: Expression): Column = ColumnShim.column(e)
  private def ex(c: Column): Expression = ColumnShim.expression(c)

  /** Aggregate: approximate COUNT(DISTINCT col) as a Long. Exact for groups
    * with <= 128 distinct values (Small/Array representations); HLL with
    * LogLog-Beta above, error ~1.04/sqrt(2^p).
    */
  def ce_approx_distinct(col: Column, p: Int = 12, w: Int = 6): Column =
    toCol(CardinalitySketchAgg(ex(col), p, w, emitEstimate = true).toAggregateExpression())

  /** Aggregate: build a mergeable serialized sketch (BinaryType) of the
    * distinct values of col. Store it, re-aggregate it with ce_merge /
    * ce_merge_estimate, or read it with ce_estimate.
    */
  def ce_sketch(col: Column, p: Int = 12, w: Int = 6): Column =
    toCol(CardinalitySketchAgg(ex(col), p, w, emitEstimate = false).toAggregateExpression())

  /** Aggregate: union a column of serialized sketches into one sketch. */
  def ce_merge(col: Column): Column =
    toCol(CardinalityUnionAgg(ex(col), emitEstimate = false).toAggregateExpression())

  /** Aggregate: union a column of serialized sketches and return the estimate. */
  def ce_merge_estimate(col: Column): Column =
    toCol(CardinalityUnionAgg(ex(col), emitEstimate = true).toAggregateExpression())

  /** Scalar: estimate of a serialized sketch. */
  def ce_estimate(col: Column): Column = toCol(CeEstimate(ex(col)))

  /** Scalar: pairwise union of two serialized sketches. */
  def ce_union(a: Column, b: Column): Column = toCol(CeUnion(ex(a), ex(b)))

  /** Scalar: the engine's canonical wyhash-v1 64-bit hash of a column. */
  def wyhash64(col: Column): Column = toCol(WyHash64Expr(ex(col)))

  // ---------------------------------------------------------------------
  // SQL registration
  // ---------------------------------------------------------------------

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private val sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "ce_approx_distinct" -> {
      case Seq(c) => CardinalitySketchAgg(c).toAggregateExpression()
      case Seq(c, p) =>
        CardinalitySketchAgg(c, intArg(p, "p")).toAggregateExpression()
      case Seq(c, p, w) =>
        CardinalitySketchAgg(c, intArg(p, "p"), intArg(w, "w")).toAggregateExpression()
      case args => throw new IllegalArgumentException(
        s"ce_approx_distinct expects (col[, p[, w]]), got ${args.size} args")
    },
    "ce_sketch" -> {
      case Seq(c) => CardinalitySketchAgg(c, emitEstimate = false).toAggregateExpression()
      case Seq(c, p) =>
        CardinalitySketchAgg(c, intArg(p, "p"), emitEstimate = false).toAggregateExpression()
      case Seq(c, p, w) =>
        CardinalitySketchAgg(c, intArg(p, "p"), intArg(w, "w"), emitEstimate = false)
          .toAggregateExpression()
      case args => throw new IllegalArgumentException(
        s"ce_sketch expects (col[, p[, w]]), got ${args.size} args")
    },
    "ce_merge" -> { args => CardinalityUnionAgg(args.head).toAggregateExpression() },
    "ce_merge_estimate" -> { args =>
      CardinalityUnionAgg(args.head, emitEstimate = true).toAggregateExpression()
    },
    "ce_estimate" -> { args => CeEstimate(args.head) },
    "ce_union" -> { args => CeUnion(args(0), args(1)) },
    "wyhash64" -> { args => WyHash64Expr(args.head) }
  )

  /** Register the sketch functions for SQL use in an existing session:
    * `graft.functions.registerAll(spark)` then
    * `spark.sql("SELECT lang, ce_approx_distinct(url) FROM pages GROUP BY lang")`.
    */
  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    sqlBuilders.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** SparkSessionExtensions hook:
  * `--conf spark.sql.extensions=graft.GraftExtensions` makes the sketch
  * functions available in every session without code changes.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import graft.sql._
    ext.injectFunction((
      FunctionIdentifier("ce_approx_distinct"),
      new ExpressionInfo(classOf[CardinalitySketchAgg].getName, "ce_approx_distinct"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => CardinalitySketchAgg(c).toAggregateExpression()
        case Seq(c, Literal(p: Int, _)) => CardinalitySketchAgg(c, p).toAggregateExpression()
        case Seq(c, Literal(p: Int, _), Literal(w: Int, _)) =>
          CardinalitySketchAgg(c, p, w).toAggregateExpression()
        case other => throw new IllegalArgumentException(s"bad args: $other")
      }))
    ext.injectFunction((
      FunctionIdentifier("ce_sketch"),
      new ExpressionInfo(classOf[CardinalitySketchAgg].getName, "ce_sketch"),
      (args: Seq[Expression]) =>
        CardinalitySketchAgg(args.head, emitEstimate = false).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("ce_merge_estimate"),
      new ExpressionInfo(classOf[CardinalityUnionAgg].getName, "ce_merge_estimate"),
      (args: Seq[Expression]) =>
        CardinalityUnionAgg(args.head, emitEstimate = true).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("ce_estimate"),
      new ExpressionInfo(classOf[CeEstimate].getName, "ce_estimate"),
      (args: Seq[Expression]) => CeEstimate(args.head)))
  }
}
