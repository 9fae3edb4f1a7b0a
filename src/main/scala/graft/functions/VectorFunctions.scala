package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.call_function

/** Vector math over `array<float>` embedding columns as native higher-order
  * Catalyst expressions (`zip_with` / `aggregate`) — no UDFs, no
  * serialization boundary, evaluated inside the row pipeline.
  *
  * All arithmetic is done in double with an explicit sequential left fold:
  * `aggregate(zip_with(...), 0.0, _+_)` — the same evaluation order as the
  * DuckDB oracle's `list_reduce(list_prepend(0.0, ...))`, so results are
  * bit-identical across engines (IEEE ops on identical operands).
  */
object VectorFunctions {

  /** Cast an array<float> column to array<double> (exact widening). */
  def toDoubleVec(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product of two array<double> columns — the codegen'd
    * [[VecDot]] expression (same sequential left fold as the HOF
    * formulation `aggregate(zip_with(...))`, bit-identical results, no
    * per-row allocation). Requires [[graft.GraftExtensions]] on the session.
    */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Element-wise vector SUM aggregate ([[VecSum]]): `sum()` for
    * array<double> columns, map-side-combining like any native aggregate.
    */
  def vecSum(v: Column): Column = call_function("vec_sum", v)

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))
}
