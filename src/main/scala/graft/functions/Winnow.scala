package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints as ONE codegen expression (Schleimer et al.,
  * SIGMOD'03): md5 every k-char gram, keep the lexicographic minimum of
  * each sliding window of `w` gram hashes, de-duplicate preserving first
  * occurrence.
  *
  * Why not the HOF formulation (`transform` + `slice` + `array_min` +
  * `array_distinct`): higher-order functions are interpreted — every gram,
  * window element and comparison is a boxed lambda call, ~6× slower than
  * this single static call with primitive loops. Output is IDENTICAL
  * (lowercase md5 hex; UTF8String ordering == String ordering for ASCII
  * hex), so the DuckDB oracle hash is unchanged.
  */
object Winnow {

  /** Static entry point used by both interpreted eval and generated code. */
  def fingerprint(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val nGrams = s.length - (k - 1)
    if (nGrams < w) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    // Encode the whole string ONCE and digest each gram as a byte range —
    // the per-gram substring+getBytes pair allocates two objects and runs
    // the encoder ~|text| times per row. Byte offsets per UTF-16 index are
    // exact for surrogate-free text (each BMP char encodes independently);
    // any surrogate falls back to the per-gram path, whose lone-surrogate
    // replacement behavior byte slicing can't reproduce.
    val all = s.getBytes(StandardCharsets.UTF_8)
    val offs = new Array[Int](s.length + 1)
    var hasSurrogate = false
    var ci = 0
    var bo = 0
    while (ci < s.length) {
      offs(ci) = bo
      val c = s.charAt(ci)
      if (Character.isSurrogate(c)) hasSurrogate = true
      bo += (if (c < 0x80) 1 else if (c < 0x800) 2 else 3)
      ci += 1
    }
    offs(s.length) = all.length
    val grams = new Array[String](nGrams)
    var i = 0
    while (i < nGrams) {
      val d =
        if (hasSurrogate)
          md.digest(s.substring(i, i + k).getBytes(StandardCharsets.UTF_8))
        else {
          md.update(all, offs(i), offs(i + k) - offs(i))
          md.digest()
        }
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = Character.forDigit((d(b) >> 4) & 0xF, 16)
        hex(b * 2 + 1) = Character.forDigit(d(b) & 0xF, 16)
        b += 1
      }
      grams(i) = new String(hex)
      md.reset()
      i += 1
    }
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    while (j <= nGrams - w) {
      var m = grams(j)
      var t = j + 1
      while (t < j + w) {
        if (grams(t).compareTo(m) < 0) m = grams(t)
        t += 1
      }
      seen.add(m)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }
}

case class WinnowingFingerprintExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1, s"winnow_fingerprint: k must be >= 1, got $k")
  require(w >= 1, s"winnow_fingerprint: w must be >= 1, got $w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    Winnow.fingerprint(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Winnow.fingerprint($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowingFingerprintExpr =
    copy(child = newChild)
}

object WinnowingFingerprintExpr {
  def winnow(text: Column, k: Int = 8, w: Int = 4): Column =
    ColumnBridge.column(
      WinnowingFingerprintExpr(ColumnBridge.expression(text), k, w))
}
