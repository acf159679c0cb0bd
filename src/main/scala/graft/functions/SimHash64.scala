package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** 64-bit SimHash of an array<long> of shingle hashes as one codegen
  * expression: bit b of the result is set iff more input hashes have bit b
  * set than cleared (majority vote; exact ties vote 0, bit cleared).
  *
  * Bit-identical to the Column formulation in `graft.operators.SimHash`
  * (aggregate + zip_with vote vector), which runs interpreted and boxes a
  * 64-element array per input hash — |shingles| × 64 lambda calls per row.
  * This is a primitive double loop, the same treatment MinHashSigExpr and
  * WinnowingFingerprintExpr received.
  */
object SimHash64 {

  /** Static entry point shared by interpreted eval and generated code. */
  def fingerprint(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  def simhash64(hashes: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(hashes)))
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.fingerprint(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}
