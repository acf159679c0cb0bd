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

  /** md5 hex of every k-char gram of `s` — the shared first stage of the
    * fingerprint and super-fingerprint entry points.
    */
  private def gramHashes(s: String, k: Int): Array[String] = {
    val nGrams = s.length - (k - 1)
    if (nGrams <= 0) return Array.empty
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
    grams
  }

  /** Static entry point used by both interpreted eval and generated code. */
  def fingerprint(text: UTF8String, k: Int, w: Int): ArrayData = {
    val grams = gramHashes(text.toString, k)
    val nGrams = grams.length
    if (nGrams < w) return new GenericArrayData(Array.empty[Any])
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

  /** SUPER-fingerprints: 64-bit keys over `s` CONSECUTIVE recorded window
    * minima — Broder's super-shingle idea (STOC'97 resemblance sketches)
    * applied to the winnowing minima sequence. "Recorded" = the positional
    * window-min sequence with adjacent repeats collapsed (the original
    * winnowing recording rule), so two docs sharing a verbatim run agree
    * on the interior of their recorded sequences and share a key whenever
    * the run spans s recorded minima — in expectation a run of
    * ~ k+w−1 + (s−1)·(w+1)/2 chars (≈ 38 chars at the 8/4/12 defaults,
    * matching the 30–50-char evidence class of `substringOverlap`'s
    * minShared=10 floor). One key is therefore MUCH stronger evidence
    * than one fingerprint, which is what lets the cluster operator drop
    * the pair-wise `minShared` count and still avoid noise components.
    * The default s=12 is measured, not guessed: on the sf0.01 gate corpus
    * the cluster structure vs s is 459 docs/1 giant component (s=6),
    * 218/47 (s=8), 78/36 (s=10), then a stable plateau 47 docs/23
    * clusters/max size 3 across s=12..16 that covers all 37 docs of the
    * pair query's graph — s=12 is the plateau's edge.
    *
    * Keys are the first 8 bytes (big-endian) of the md5 of the
    * '|'-joined minima — an injective-modulo-collisions surrogate whose
    * GROUPING equals grouping by the joined string itself (what the
    * DuckDB oracle does); 8-byte keys keep the exploded index ~40×
    * smaller than the raw ~200-char concatenations at 100 TB.
    */
  def superFingerprint(text: UTF8String, k: Int, w: Int, s: Int): ArrayData = {
    val grams = gramHashes(text.toString, k)
    val nGrams = grams.length
    if (nGrams < w) return new GenericArrayData(Array.empty[Any])
    // recorded minima: per-window min, adjacent duplicates collapsed
    val rec = new Array[String](nGrams - w + 1)
    var nRec = 0
    var j = 0
    while (j <= nGrams - w) {
      var m = grams(j)
      var t = j + 1
      while (t < j + w) {
        if (grams(t).compareTo(m) < 0) m = grams(t)
        t += 1
      }
      if (nRec == 0 || rec(nRec - 1) != m) { rec(nRec) = m; nRec += 1 }
      j += 1
    }
    if (nRec < s) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= nRec - s) {
      val sb = new java.lang.StringBuilder(33 * s)
      var u = i
      while (u < i + s) {
        if (u > i) sb.append('|')
        sb.append(rec(u))
        u += 1
      }
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      md.reset()
      var key = 0L
      var b = 0
      while (b < 8) { key = (key << 8) | (d(b) & 0xFFL); b += 1 }
      seen.add(key)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
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

case class WinnowingSuperExpr(child: Expression, k: Int, w: Int, s: Int)
    extends UnaryExpression {

  require(k >= 1, s"winnow_super: k must be >= 1, got $k")
  require(w >= 1, s"winnow_super: w must be >= 1, got $w")
  require(s >= 1, s"winnow_super: s must be >= 1, got $s")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    Winnow.superFingerprint(input.asInstanceOf[UTF8String], k, w, s)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Winnow.superFingerprint($c, $k, $w, $s)")

  override protected def withNewChildInternal(newChild: Expression): WinnowingSuperExpr =
    copy(child = newChild)
}

object WinnowingSuperExpr {
  def winnowSuper(text: Column, k: Int = 8, w: Int = 4, s: Int = 12): Column =
    ColumnBridge.column(
      WinnowingSuperExpr(ColumnBridge.expression(text), k, w, s))
}
