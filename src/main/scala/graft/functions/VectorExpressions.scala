package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of two array<double> columns as a codegen'd binary
  * expression: a tight primitive loop instead of
  * `aggregate(zip_with(...))`, which materializes an intermediate struct
  * array per row pair. Accumulation is the SAME sequential left fold
  * (((0+x₀)+x₁)+…), so results are bit-identical to the HOF formulation and
  * to the DuckDB oracle's `list_reduce` — only the constant factor changes.
  * This is the hot inner loop of every similarity operator: at 2M candidate
  * pairs × 64 dims the HOF version allocates ~2M transient arrays; this
  * allocates none.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $x.getDouble($i) * $y.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Element-wise SUM aggregate over an `array<double>` column — the vector
  * analog of `sum()`, as a `TypedImperativeAggregate` with a primitive
  * `Array[Double]` buffer.
  *
  * Why custom (round 6): a distributed k-means mean update otherwise needs
  * `posexplode` → per-(cell, dim) average → `collect_list`/`array_sort`
  * re-assembly — dim× the rows through TWO hash aggregates plus a sort,
  * per Lloyd step. This aggregate keeps rows whole: update adds dim
  * doubles into the buffer, partials merge map-side exactly like `sum`,
  * and the shuffle carries one partial vector per (task, group). Same
  * mathematical result (floating-point summation order differs across
  * partitionings in both formulations alike).
  *
  * Buffer length is fixed by the first row; a length mismatch is a data
  * error and fails loudly. Null/absent inputs contribute nothing; a group
  * of only nulls evaluates to null (like `sum`).
  */
case class VecSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Double]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double],
                      input: org.apache.spark.sql.catalyst.InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val buf = if (buffer.isEmpty && n > 0) new Array[Double](n) else buffer
      require(buf.length == n, s"vec_sum: vector length $n != buffer ${buf.length}")
      var i = 0
      while (i < n) { buf(i) += arr.getDouble(i); i += 1 }
      buf
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      require(b1.length == b2.length,
        s"vec_sum: partial lengths ${b1.length} != ${b2.length}")
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.isEmpty) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble())
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum"

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSum =
    copy(child = newChild)
}
