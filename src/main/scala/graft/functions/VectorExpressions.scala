package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd vector kernels (SURVEY.md §7.2: custom `Expression` where
  * codegen matters).
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`) evaluate the
  * lambda per element through the interpreter — fine for small data,
  * dominant cost for similarity search over millions of pairs. These
  * expressions emit a tight primitive loop inside whole-stage codegen
  * instead.
  *
  * Numeric contract: strict ascending-index left fold
  * (`s += a(i)*b(i)`), bit-identical to the previous `aggregate`-based
  * fold and to the DuckDB oracle's `list_reduce` — so swapping the
  * implementation cannot change any oracle-checked result.
  */
object VectorExpressions {

  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    // declared input types make Catalyst INSERT the cast for
    // array<float>/array<int> arguments (or fail analysis for
    // non-arrays) — without this, getDouble over a float-packed
    // UnsafeArrayData reads 8 bytes from 4-byte slots and returns
    // garbage silently
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;
        """
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  case class VecNormSq(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var s = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val v = ctx.freshName("v")
        s"""
        int $n = $a.numElements();
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $v = $a.getDouble($i);
          $s += $v * $v;
        }
        ${ev.value} = $s;
        """
      })
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Optional SQL registration (`SELECT vec_dot(a, b)`). Arity is
    * checked here — without it a wrong argument count either crashes
    * with an index error or silently DROPS the extra argument. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def arity(name: String, n: Int, es: Seq[Expression]): Unit =
      require(es.length == n,
        s"$name expects $n argument(s), got ${es.length}")
    reg.createOrReplaceTempFunction("vec_dot",
      es => { arity("vec_dot", 2, es); VecDot(es.head, es(1)) },
      "built-in")
    reg.createOrReplaceTempFunction("vec_normsq",
      es => { arity("vec_normsq", 1, es); VecNormSq(es.head) },
      "built-in")
  }

  import org.apache.spark.sql.GraftShim

  def vecDot(a: Column, b: Column): Column =
    GraftShim.column(VecDot(GraftShim.expression(a), GraftShim.expression(b)))
  def vecNormSq(a: Column): Column =
    GraftShim.column(VecNormSq(GraftShim.expression(a)))
}
