package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingle hashes of a text column as ONE codegen
  * expression: array<long> of `xxhash64(shingle)` in first-occurrence order.
  *
  * Bit-identical to the three-step Column formulation
  * `transform(array_distinct(transform(sequence, i -> concat_ws(" ",
  * slice(split(text, " "), i+1, n)))), s -> xxhash64(s))` because a word
  * n-gram joined with single spaces IS a byte range of the original text
  * (tokens come from splitting on single spaces, so rejoining reconstructs
  * the exact substring, empty tokens included) — the hash runs directly
  * over that range with xxhash64's seed 42, and no shingle string is ever
  * materialized. The HOF chain builds |words| token strings plus
  * |words|-n+1 shingle strings per row, all interpreted; this is a single
  * primitive pass over the UTF-8 bytes.
  */
object ShingleHash {

  /** Static entry point shared by interpreted eval and generated code. */
  def hashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes // space (0x20) never occurs inside UTF-8 multibyte
    val len = bytes.length
    // token start offsets: 0 and every position after a space (split keeps
    // empty tokens, limit -1 semantics — same as Spark's split(text, " "))
    var numTokens = 1
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) numTokens += 1; i += 1 }
    if (numTokens < n) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](numTokens)
    var t = 1
    i = 0
    while (i < len) { if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }; i += 1 }
    val m = numTokens - n + 1
    val out = new Array[Long](m)
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    var outLen = 0
    i = 0
    while (i < m) {
      val from = starts(i)
      val to = if (i + n < numTokens) starts(i + n) - 1 else len // excl. trailing space
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from, to - from, 42L)
      if (seen.add(h)) { out(outLen) = h; outLen += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outLen))
  }

  def shingle_hashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashExpr(ColumnBridge.expression(text), n))

  /** ALL m = |tokens|−n+1 shingle hashes IN POSITION ORDER, duplicates
    * kept — index i of the output is the hash of the n-gram starting at
    * token i. Same byte-range hashing (xxhash64 seed 42) as [[hashes]],
    * minus the dedup set: the positional form is what exact
    * duplicate-SPAN detection needs (`TextDedup.exactSubstringSpans`),
    * where position identity, not membership, carries the signal.
    */
  def positionalHashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var numTokens = 1
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) numTokens += 1; i += 1 }
    if (numTokens < n) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](numTokens)
    var t = 1
    i = 0
    while (i < len) { if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }; i += 1 }
    val m = numTokens - n + 1
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      val from = starts(i)
      val to = if (i + n < numTokens) starts(i + n) - 1 else len
      out(i) = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + from, to - from, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  def positional_shingle_hashes(text: Column, n: Int): Column =
    ColumnBridge.column(
      PositionalShingleHashExpr(ColumnBridge.expression(text), n))
}

case class PositionalShingleHashExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"positional_shingle_hashes: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.positionalHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHash.positionalHashes($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): PositionalShingleHashExpr =
    copy(child = newChild)
}

case class ShingleHashExpr(child: Expression, n: Int) extends UnaryExpression {

  // construction-time = analysis-time for SQL callers: shingle_hashes(t, 0)
  // must fail the query, not throw ArrayIndexOutOfBounds per row at runtime
  require(n >= 1, s"shingle_hashes: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashExpr =
    copy(child = newChild)
}
