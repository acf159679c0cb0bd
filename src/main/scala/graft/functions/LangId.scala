package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole language-ID decision as ONE codegen expression, bit-identical to
  * the Column formulation in graft.operators.TextAnalysis.langIdReference:
  * per-language stopword density argmax (score tie → lexicographically
  * larger code, matching array_max struct compare) with a CJK-script
  * override. The Column form re-splits the text once per language and runs
  * four interpreted filter() HOFs per row; this is one tokenize pass.
  *
  * Profiles are compiled in (they are part of the operator's semantics and
  * the oracle SQL); the tokenizer mirrors `split(lower(text), "\\s+")`
  * exactly — UTF8String.toLowerCase then Java regex split with limit -1.
  */
object LangId {

  // Must stay in lock-step with TextAnalysis.stopwordProfiles (ascending
  // language code — the argmax iteration relies on the order).
  private val langs = Array("de", "en", "es", "fr")
  private val profiles: Array[java.util.HashSet[String]] = {
    val p = Map(
      "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "ein", "nicht", "auf"),
      "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "with"),
      "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "una", "por", "con"),
      "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "dans", "une", "pour"))
    langs.map { l =>
      val s = new java.util.HashSet[String]()
      p(l).foreach(s.add)
      s
    }
  }

  private val ws = java.util.regex.Pattern.compile("\\s+")

  private val ZH = UTF8String.fromString("zh")
  private val UND = UTF8String.fromString("und")
  private val LANG_U8 = langs.map(UTF8String.fromString)

  /** Static entry point shared by interpreted eval and generated code. */
  def langId(text: UTF8String): UTF8String = {
    val s = text.toString
    // CJK ratio over CODE POINTS of the original text (Spark's length())
    var cjk = 0
    var total = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if ((cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0x3040 && cp <= 0x30ff)) cjk += 1
      total += 1
      i += Character.charCount(cp)
    }
    if (cjk.toDouble / math.max(total, 1).toDouble > 0.3) return ZH
    val words = ws.split(text.toLowerCase.toString, -1)
    val hits = new Array[Int](langs.length)
    var w = 0
    while (w < words.length) {
      var l = 0
      while (l < langs.length) {
        if (profiles(l).contains(words(w))) hits(l) += 1
        l += 1
      }
      w += 1
    }
    val den = math.max(words.length, 1).toDouble
    var bestScore = -1.0
    var best = -1
    var l = 0
    while (l < langs.length) { // ascending lang code: >= realizes the struct-max tiebreak
      val score = hits(l).toDouble / den
      if (score >= bestScore) { bestScore = score; best = l }
      l += 1
    }
    if (bestScore > 0) LANG_U8(best) else UND
  }

  def lang_id(text: Column): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(text)))
}

case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    LangId.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangId.langId($c)")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}
