package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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

  /** Dot product of two array<double> columns (sequential left fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))
}
