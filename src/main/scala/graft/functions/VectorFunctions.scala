package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Σ aᵢ·bᵢ over two numeric arrays as a native Catalyst expression —
  * a tight sequential loop over the unsafe array data, with a
  * `doGenCode` implementation so the loop compiles INTO the enclosing
  * whole-stage-codegen function (no per-row virtual dispatch, no
  * boxing). Spark's higher-order `zip_with` + `aggregate` compute the
  * same value but allocate an intermediate array per row and evaluate
  * the lambda interpreted (higher-order functions don't join
  * whole-stage codegen), which dominates brute-force similarity scans.
  * The accumulation order in both the compiled and interpreted paths is
  * exactly the left-to-right fold the declared oracle arithmetic uses,
  * so results stay bitwise identical.
  *
  * Null elements contribute 0 (the embeddings schema declares
  * non-null elements; this is belt-and-braces, not semantics).
  *
  * Mismatched lengths produce NULL, never a silently-truncated partial
  * sum: a dimension bug upstream must surface as a null similarity (and
  * null-rejecting downstream filters), not as a plausible wrong number.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val (at, bt) = (elemType(left), elemType(right))
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = at match {
          case FloatType => a.getFloat(i).toDouble
          case DoubleType => a.getDouble(i)
          case _ => throw new IllegalArgumentException(s"graft_dot: $at")
        }
        val y = bt match {
          case FloatType => b.getFloat(i).toDouble
          case DoubleType => b.getDouble(i)
          case _ => throw new IllegalArgumentException(s"graft_dot: $bt")
        }
        sum += x * y
      }
      i += 1
    }
    sum
  }

  private def accessor(e: Expression, arr: String, i: String): String =
    elemType(e) match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case t => throw new IllegalArgumentException(s"graft_dot: $t")
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |      $acc += ${accessor(left, a, i)} * ${accessor(right, b, i)};
         |    }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Vector math over ArrayType(FloatType) embedding columns. The dot
  * product is the native [[DotProduct]] expression (registered as
  * `graft_dot` by [[VectorFunctions.register]]); derived forms are plain
  * column arithmetic, so the whole similarity pipeline stays deterministic
  * and oracle-comparable (sequential per-row folds, IEEE doubles).
  */
object VectorFunctions {

  /** Idempotent session registration of `graft_dot`. Every caller that
    * builds columns through [[dot]] must register first (the query
    * builders and [[graft.operators.Ann]] do).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")

  /** Σ aᵢ·bᵢ as double (elements cast up before multiplying). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Σ aᵢ² as double. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity written exactly as dot/(√Σa²·√Σb²) — the same
    * operation order as the declared oracle arithmetic (SURVEY §2B Q23),
    * so both engines produce the identical IEEE double.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Cosine from a precomputed squared-norm pair (per-row norms computed
    * once, not per candidate pair — the O(n·k) → O(n²) saving that matters
    * on the brute-force path).
    */
  def cosineWithNorms(dotAb: Column, normSqA: Column, normSqB: Column): Column =
    dotAb / (sqrt(normSqA) * sqrt(normSqB))
}
