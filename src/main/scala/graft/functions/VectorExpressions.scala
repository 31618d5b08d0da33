package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector kernels for embedding math.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`, `transform`) are
  * `CodegenFallback` expressions: every row pays interpreted lambda dispatch
  * and boxing per ELEMENT. These expressions compute the same results with a
  * tight primitive loop emitted straight into whole-stage codegen.
  *
  * Numeric parity is bit-exact with the column-algebra formulations they
  * replace:
  *   - float x float multiplies in FLOAT, accumulates in double (that is what
  *     `aggregate(zip_with(a, b, _ * _), 0.0d, _ + _)` does element-wise);
  *   - any double operand promotes the multiply to double;
  *   - a null element, or length mismatch (zip_with null-pads), or a null
  *     input yields NULL — exactly like the lambda pipeline.
  */
object VecOps {

  /** Boxed Double so null can signal "null element / length mismatch". */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    if (aFloat && bFloat) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += (a.getFloat(i) * b.getFloat(i)).toDouble
        i += 1
      }
    } else {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        acc += x * y
        i += 1
      }
    }
    java.lang.Double.valueOf(acc)
  }

  def norm(a: ArrayData, aFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    if (aFloat) {
      while (i < n) {
        if (a.isNullAt(i)) return null
        acc += (a.getFloat(i) * a.getFloat(i)).toDouble
        i += 1
      }
    } else {
      while (i < n) {
        if (a.isNullAt(i)) return null
        val x = a.getDouble(i)
        acc += x * x
        i += 1
      }
    }
    java.lang.Double.valueOf(math.sqrt(acc))
  }

  /** See VecEqFraction. Boxed so null can signal the empty-left case. */
  def eqFraction(a: ArrayData, b: ArrayData): java.lang.Double = {
    val denom = a.numElements()
    if (denom == 0) return null
    val n = math.min(denom, b.numElements())
    var matches = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) matches += 1
      i += 1
    }
    java.lang.Double.valueOf(matches.toDouble / denom)
  }

  private[sql] def isVec(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(FloatType, _) => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _ => None
  }
}

/** Fraction of positionally-equal slots of two array<bigint> columns — the
  * MinHash signature-similarity estimator. Bit-identical to
  * `aggregate(zip_with(a, b, (x,y) => when(x===y,1).otherwise(0)), 0, _+_)
  *  .cast(double) / size(a)`: zip_with's null padding and null elements
  * contribute 0 matches and the denominator is size(a) — except that
  * size(a) == 0 yields NULL (`try_divide` semantics; the raw formulation
  * under Spark 4's default ANSI mode would throw DIVIDE_BY_ZERO, and an
  * empty signature has no meaningful similarity).
  */
case class VecEqFraction(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_eq_fraction expects array<bigint> columns, got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.eqFraction(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("eqf")
      s"""
         |java.lang.Double $r = graft.sql.VecOps.eqFraction($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecEqFraction =
    copy(left = l, right = r)
  override def prettyName: String = "vec_eq_fraction"
}

/** Codegen'd dot product of two array<float>/array<double> columns. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  private def lFloat = VecOps.isVec(left.dataType).get
  private def rFloat = VecOps.isVec(right.dataType).get

  override def checkInputDataTypes(): TypeCheckResult =
    (VecOps.isVec(left.dataType), VecOps.isVec(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float|double> columns, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lFloat, rFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dot")
      s"""
         |java.lang.Double $r = graft.sql.VecOps.dot($a, $b, $lFloat, $rFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** Codegen'd L2 norm of an array<float>/array<double> column. */
case class VecNorm(child: Expression) extends UnaryExpression {
  private def cFloat = VecOps.isVec(child.dataType).get

  override def checkInputDataTypes(): TypeCheckResult =
    VecOps.isVec(child.dataType) match {
      case Some(_) => TypeCheckResult.TypeCheckSuccess
      case None => TypeCheckResult.TypeCheckFailure(
        s"vec_norm expects an array<float|double> column, got ${child.dataType.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    VecOps.norm(a.asInstanceOf[ArrayData], cFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("norm")
      s"""
         |java.lang.Double $r = graft.sql.VecOps.norm($a, $cFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
  override def prettyName: String = "vec_norm"
}
