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

/** All `tables` random-hyperplane LSH sign-buckets of an embedding in
  * ONE native pass — `ArrayType(IntegerType)` of length `tables`, where
  * slot t is the `nPlanes`-bit sign pattern of the embedding against
  * table t's deterministic Gaussian hyperplanes (`Random(seed + t)`,
  * identical to [[graft.operators.Ann.hyperplanes]]).
  *
  * Exists because composing the same value from column primitives
  * (`tables × nPlanes` separate `graft_dot`s against literal arrays)
  * builds an expression tree that grows past what whole-stage codegen
  * compiles well — measured 4× superlinear blowup going 8 → 16 tables
  * on the q98 path. Here the planes live in ONE flat referenced
  * double[] and the whole bucket matrix is three tight loops.
  *
  * Null/ragged contract matches the composed form: wrong-length input
  * (or a NaN dot) yields a NULL array — the row drops out of every
  * table's bucket join rather than aliasing into bucket 0. Null
  * elements contribute 0, as in [[DotProduct]].
  */
case class SignBuckets(
    child: Expression, nPlanes: Int, tables: Int, seed: Long, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sign_buckets"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(s"graft_sign_buckets: $t")
    }

  @transient private lazy val planesFlat: Array[Double] =
    SignBuckets.flatPlanes(dim, nPlanes, tables, seed)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    val isF = elemIsFloat
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bits = 0
      var p = 0
      while (p < nPlanes) {
        val base = (t * nPlanes + p) * dim
        var s = 0.0
        var i = 0
        while (i < dim) {
          if (!a.isNullAt(i)) {
            val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
            s += x * planesFlat(base + i)
          }
          i += 1
        }
        if (java.lang.Double.isNaN(s)) return null
        if (s >= 0.0) bits |= 1 << p
        p += 1
      }
      out(t) = bits
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planesRef = ctx.addReferenceObj("planesFlat", planesFlat, "double[]")
      val acc = elemIsFloat match {
        case true => s"(double) $a.getFloat"
        case false => s"$a.getDouble"
      }
      val out = ctx.freshName("out")
      val nan = ctx.freshName("nan")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val bits = ctx.freshName("bits")
      val base = ctx.freshName("base")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $out = new int[$tables];
         |  boolean $nan = false;
         |  for (int $t = 0; $t < $tables && !$nan; $t++) {
         |    int $bits = 0;
         |    for (int $p = 0; $p < $nPlanes; $p++) {
         |      final int $base = ($t * $nPlanes + $p) * $dim;
         |      double $s = 0.0;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        if (!$a.isNullAt($i)) {
         |          $s += $acc($i) * $planesRef[$base + $i];
         |        }
         |      }
         |      if (Double.isNaN($s)) { $nan = true; break; }
         |      if ($s >= 0.0) $bits |= 1 << $p;
         |    }
         |    $out[$t] = $bits;
         |  }
         |  if ($nan) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBuckets {
  /** Flat (table, plane, dim)-major Gaussian planes; table t draws from
    * `Random(seed + t)` in the exact order `Ann.hyperplanes` fills, so
    * the two definitions can never drift.
    */
  def flatPlanes(dim: Int, nPlanes: Int, tables: Int, seed: Long): Array[Double] = {
    val out = new Array[Double](tables * nPlanes * dim)
    var t = 0
    while (t < tables) {
      val rnd = new java.util.Random(seed + t)
      var p = 0
      while (p < nPlanes) {
        var i = 0
        while (i < dim) {
          out((t * nPlanes + p) * dim + i) = rnd.nextGaussian()
          i += 1
        }
        p += 1
      }
      t += 1
    }
    out
  }
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
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sign_buckets",
      exprs => SignBuckets(exprs.head,
        nPlanes = HashFunctions.intArg("graft_sign_buckets", exprs(1)),
        tables = HashFunctions.intArg("graft_sign_buckets", exprs(2)),
        seed = HashFunctions.longArg("graft_sign_buckets", exprs(3)),
        dim = HashFunctions.intArg("graft_sign_buckets", exprs(4))),
      "built-in")
  }

  /** All `tables` LSH sign-buckets at once (see [[SignBuckets]]). */
  def signBuckets(
      emb: Column, nPlanes: Int, tables: Int, seed: Long, dim: Int): Column =
    call_function("graft_sign_buckets", emb,
      lit(nPlanes), lit(tables), lit(seed), lit(dim))

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
