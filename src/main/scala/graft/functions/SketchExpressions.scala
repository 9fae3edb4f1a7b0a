package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for sketch-based dedup (SURVEY.md §2.10: the
  * reference needs none for parity; these implement the north-star MinHash /
  * SimHash operators Spark lacks).
  *
  * Why custom expressions instead of composed built-ins: a k=128 MinHash
  * signature as 128 separate `array_min(transform(...))` columns walks the
  * shingle array 128 times and defeats codegen fusion; these walk it ONCE
  * with a tight primitive loop, generate Java directly into the
  * WholeStageCodegen pipeline (`doGenCode`), and allocate nothing per row
  * but the output buffer. Preference order (b) of the build brief — a
  * scalar-function extension, not a full operator, so no custom
  * LogicalPlan/Strategy is warranted.
  */
object SketchExpressions {

  /** splitmix64 finalizer — full-avalanche 64-bit mixer (public-domain
    * constant set; same scheme as java.util.SplittableRandom).
    */
  @inline final def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def seeds(numHashes: Int, seed: Long): Array[Long] =
    Array.tabulate(numHashes)(i => mix64(seed + i * 0x9e3779b97f4a7c15L))
}

/** MinHash signature: for each of `numHashes` seeded permutations
  * π_i(h) = mix64(h ^ seed_i), the minimum over the input array<long> of
  * element hashes. One pass over the array per row.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  private lazy val hashSeeds: Array[Long] = SketchExpressions.seeds(numHashes, seed)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = SketchExpressions.mix64(h ^ hashSeeds(j))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("seeds", hashSeeds, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  long $h = $arr.getLong($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = $h ^ $seedsRef[$j];
         |    $v = ($v ^ ($v >>> 30)) * 0xbf58476d1ce4e5b9L;
         |    $v = ($v ^ ($v >>> 27)) * 0x94d049bb133111ebL;
         |    $v = $v ^ ($v >>> 31);
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** MinHash LSH band buckets in one pass: the [[MinHashSignature]] minima
  * folded per band with the rotate-xor combiner
  * `acc' = rotl(acc, 1) ^ min_i` (seeded at 17) — the same fold
  * [[graft.operators.Dedup.minhashPairs]] round 1 expressed as `bands`
  * separate interpreted `aggregate()` HOF lambdas over a materialized
  * signature array. Fusing signature + banding into one codegen'd loop
  * removes the intermediate array column, the HOF interpretation, and a
  * materialization barrier from the pipeline. Output: array<long> of
  * length `bands` (index = band, value = bucket hash).
  */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int, seed: Long)
    extends UnaryExpression {
  require(numHashes % bands == 0, "numHashes must divide into bands")

  private lazy val hashSeeds: Array[Long] = SketchExpressions.seeds(numHashes, seed)
  private val rows = numHashes / bands

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = SketchExpressions.mix64(h ^ hashSeeds(j))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 17L
      var r = 0
      while (r < rows) {
        acc = (java.lang.Long.rotateLeft(acc, 1)) ^ mins(b * rows + r)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("seeds", hashSeeds, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val acc = ctx.freshName("acc")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  long $h = $arr.getLong($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = $h ^ $seedsRef[$j];
         |    $v = ($v ^ ($v >>> 30)) * 0xbf58476d1ce4e5b9L;
         |    $v = ($v ^ ($v >>> 27)) * 0x94d049bb133111ebL;
         |    $v = $v ^ ($v >>> 31);
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $acc = 17L;
         |  for (int $r = 0; $r < $rows; $r++) {
         |    $acc = java.lang.Long.rotateLeft($acc, 1) ^ $mins[$b * $rows + $r];
         |  }
         |  $out[$b] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** SimHash over an array<long> of token hashes: bit j of the result is 1
  * iff Σ_tokens (±1 by bit j of the token hash) > 0. `bits` ≤ 63. One pass.
  */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](bits)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < bits) {
        counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      s"""
         |int[] $counts = new int[$bits];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  long $h = $arr.getLong($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    $counts[$j] += (((($h >>> $j) & 1L) == 1L) ? 1 : -1);
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if ($counts[$j] > 0) ${ev.value} |= (1L << $j);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** Column-API wrappers — resolve through the session function registry
  * (requires `spark.sql.extensions=graft.GraftExtensions`, see
  * [[graft.GraftExtensions]]).
  */
object Sketches {
  def minhashSignature(c: Column, numHashes: Int = 128, seed: Long = 42L): Column =
    call_function("minhash_signature", c, lit(numHashes), lit(seed))
  def minhashBands(c: Column, numHashes: Int = 128, bands: Int = 32,
                   seed: Long = 42L): Column =
    call_function("minhash_bands", c, lit(numHashes), lit(bands), lit(seed))
  def simhash(c: Column, bits: Int = 30): Column =
    call_function("simhash", c, lit(bits))
}
