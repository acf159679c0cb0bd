package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** splitmix64 of a long column, as a native codegen expression.
  *
  * Why an Expression and not Column arithmetic: Spark 4 runs with ANSI
  * mode ON, where the wrapping multiplies of the finalizer
  * (`z * 0x9e3779b9…`) raise ARITHMETIC_OVERFLOW instead of wrapping —
  * Java's `*` inside generated code wraps silently, which is the defined
  * behavior of the hash. The DuckDB oracles replay the same function via
  * the 32-bit-halves HUGEINT decomposition (see the knn_lsh oracle), so
  * sketches built on this hash gate exactly.
  */
case class SplitMix64Expr(child: Expression, seed: Long = 0L)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"splitmix64 needs a BIGINT input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    SplitMix64.hash(input.asInstanceOf[Long] + seed) // wrapping add

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val z = ctx.freshName("z")
      s"""
         |long $z = ($c + ${seed}L) * 0x9e3779b97f4a7c15L;
         |$z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |${ev.value} = $z ^ ($z >>> 31);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SplitMix64Expr =
    copy(child = newChild)
}

/** Count of leading zero bits of a long (0 → 64), codegen'd to
  * `Long.numberOfLeadingZeros` — the HyperLogLog rank primitive. The
  * DuckDB replay is `64 - length(bin(w::UBIGINT))` (bin() prints no
  * leading zeros; bin(0) = '0' gives 63, which callers cap anyway).
  */
case class LeadingZeros64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"leading_zeros64 needs a BIGINT input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.numberOfLeadingZeros(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = java.lang.Long.numberOfLeadingZeros($c);")

  override protected def withNewChildInternal(newChild: Expression): LeadingZeros64Expr =
    copy(child = newChild)
}

object SplitMix64 {
  /** The scalar reference — fixtures and the interpreted eval share it. */
  def hash(k: Long): Long = {
    var z = k * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def splitmix64(c: Column): Column =
    ColumnBridge.column(SplitMix64Expr(ColumnBridge.expression(c)))

  /** hash(v + seed) with a WRAPPING add (ANSI-safe: the add happens inside
    * generated Java) — the row-seeded family for Count-Min's d hash rows.
    */
  def splitmix64Seeded(c: Column, seed: Long): Column =
    ColumnBridge.column(SplitMix64Expr(ColumnBridge.expression(c), seed))

  def leading_zeros64(c: Column): Column =
    ColumnBridge.column(LeadingZeros64Expr(ColumnBridge.expression(c)))
}
