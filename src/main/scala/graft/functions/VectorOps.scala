package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns. The dot product — the
  * hot inner loop of every similarity operator — is the custom codegen'd
  * Catalyst expression [[DotProductExpr]] (registered per session by
  * [[GraftFunctions.register]], see graft.Tables.load); derived quantities
  * (norm, cosine, L2) compose it with built-ins. Accumulation is in double.
  */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    call_function(GraftFunctions.DotName, a, b)

  /** Built-in-only formulation (no custom expression) — kept as the
    * reference semantics for tests and as the portable fallback. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d),
      (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Σᵢ (codes[i] & 0xFF)·weights[i] over (binary, array<double>) — the
    * SQ8 asymmetric-distance inner loop ([[ByteDotExpr]]). */
  def byteDot(codes: Column, weights: Column): Column =
    call_function(GraftFunctions.ByteDotName, codes, weights)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d),
      (acc, x) => acc + x))
}
