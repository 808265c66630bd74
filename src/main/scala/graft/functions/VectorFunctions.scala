package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns, built from
  * Spark's codegen'd higher-order functions (`zip_with` + `aggregate`) —
  * no UDFs, so the whole similarity pipeline stays inside whole-stage
  * codegen. Folds are sequential per row, which keeps results bitwise
  * deterministic and oracle-comparable.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ as double (elements cast up before multiplying). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

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
