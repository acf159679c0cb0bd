package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** All random-hyperplane LSH bucket ids of a vector as ONE codegen
  * expression: element t = the K sign bits of table t packed into an int.
  *
  * Replaces `tables × bits` separate VecDot-vs-literal expressions: that
  * formulation generates a projection far past the JVM/codegen method-size
  * limits (192 inlined 64-element loops), which knocks the whole stage back
  * to interpreted evaluation. Here the hyperplane tensor is materialized
  * once per (tables, bits, dim, seed) and the signature is a primitive
  * triple loop — bit-identical to the Column formulation
  * (same splitmix64 plane generation in the same fill order, same
  * sequential double accumulation, same `> 0` sign test).
  */
object LshBuckets {

  /** Deterministic Rademacher hyperplanes, row-major (t, b, d) consumption
    * of splitmix64 — must stay in lock-step with the reference formulation
    * in graft.operators.AnnIndex.
    */
  def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] = {
    var x = seed
    def next(): Long = { // splitmix64
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.fill(tables, bits, dim)(if ((next() & 1L) == 0L) -1.0 else 1.0)
  }

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int, Long), Array[Array[Array[Double]]]]()

  private def planes(tables: Int, bits: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] =
    planeCache.computeIfAbsent((tables, bits, dim, seed),
      _ => hyperplanes(tables, bits, dim, seed))

  /** Static entry point shared by interpreted eval and generated code.
    * `isFloat` selects the element reader (embeddings are array<float>).
    */
  def buckets(v: ArrayData, tables: Int, bits: Int, dim: Int, seed: Long,
              isFloat: Boolean): ArrayData = {
    val p = planes(tables, bits, dim, seed)
    val n = math.min(v.numElements(), dim)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < bits) {
        val row = p(t)(b)
        var sum = 0.0
        var i = 0
        while (i < n) {
          val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          sum += x * row(i)
          i += 1
        }
        if (sum > 0) bucket |= (1 << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: array<int> of bucket ids, one per table. */
  def lsh_buckets(v: Column, tables: Int, bits: Int, dim: Int, seed: Long = 42L): Column =
    ColumnBridge.column(
      LshBucketsExpr(ColumnBridge.expression(v), tables, bits, dim, seed))
}

case class LshBucketsExpr(child: Expression, tables: Int, bits: Int, dim: Int,
                          seed: Long) extends UnaryExpression {

  require(tables >= 1, s"lsh_buckets: tables must be >= 1, got $tables")
  require(bits >= 1 && bits <= 31, // bucket ids pack the bits into one INT
    s"lsh_buckets: bits must be in [1, 31], got $bits")
  require(dim >= 1, s"lsh_buckets: dim must be >= 1, got $dim")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets needs array<float|double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    LshBuckets.buckets(input.asInstanceOf[ArrayData], tables, bits, dim, seed, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshBuckets.buckets($c, $tables, $bits, $dim, ${seed}L, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}
