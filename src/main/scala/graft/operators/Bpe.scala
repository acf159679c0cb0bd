package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Real byte-pair encoding: learned merges, applied left-to-right — the
  * token-counting surface of a training-data pipeline (builder brief),
  * upgraded from the round-3 regex-pre-token proxy to an actual BPE
  * tokenizer.
  *
  * Pre-tokenizer: `[a-z]+|[0-9]+|[^a-z0-9\s]` over lowercased text (the
  * same boundary rule the proxy used); each pre-token splits into
  * characters and the learned merge list applies IN RANK ORDER, each merge
  * replacing adjacent symbol pairs left-to-right non-overlapping —
  * standard BPE inference.
  *
  * Training (`train`) is the classic Sennrich/Gage loop over word-type
  * frequencies: the corpus-wide word count is distributed (one shuffle);
  * the merge loop runs on the driver over the BOUNDED word-type vocabulary
  * (vocab size is corpus-independent for fixed languages, so this holds at
  * 100 TB the same way any production tokenizer trainer does).
  * Deterministic: pairs rank by (count desc, pair lexicographic), so the
  * same corpus always yields the same table.
  *
  * Both engines apply merges through the same mechanism: a symbol sequence
  * serializes as `<SEP>sym<SEP>` units (SEP = U+0001, each symbol carries
  * its OWN delimiters), and applying merge (a, b) -> ab is
  * `replace(s, <SEP>a<SEP><SEP>b<SEP>, <SEP>ab<SEP>)`. String replace is
  * left-to-right non-overlapping in both the JVM and DuckDB — exactly
  * BPE's greedy application order — and adjacent matches never share
  * characters because of the per-symbol delimiters ([a,a,a] merges to
  * [aa,a], [a,a,a,a] to [aa,aa]). The oracle builds identical patterns
  * with `chr(1)` over the same literal merge table, so the comparison is
  * structural, not approximate.
  */
object Bpe {

  val Sep = "\u0001"

  /** The merge table the declared `doc_bpe_tokens` query (and its oracle)
    * uses: 60 merges trained by `train` on the `documents` corpus
    * (sf0.01). Pinned as a literal — like any production tokenizer, the
    * merge table is a versioned artifact, not recomputed per query — and
    * provenance-checked by BpeSpec, which retrains and asserts equality.
    */
  val Merges60: Array[(String, String)] = Array(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"), ("s", "mall"),
    ("g", "e"), ("l", "ow"), ("mer", "ge"), ("s", "low"), ("c", "t"),
    ("ct", "or"), ("d", "er"), ("e", "ctor"), ("or", "der"),
    ("v", "ector"), ("in", "e"), ("l", "ine"), ("a", "b"), ("ab", "l"),
    ("abl", "e"), ("at", "a"), ("d", "ata"), ("t", "able"), ("u", "p"),
    ("a", "g"), ("ag", "g"), ("a", "lu"))


  private val preToken =
    java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")

  /** Lowercased pre-tokens of one text (the proxy's regex, kept). */
  def preTokens(text: String): Iterator[String] = {
    val m = preToken.matcher(text.toLowerCase(java.util.Locale.ROOT))
    new Iterator[String] {
      private var has = m.find()
      override def hasNext: Boolean = has
      override def next(): String = { val t = m.group(); has = m.find(); t }
    }
  }

  /** Apply a merge table to one pre-token; returns its BPE token count.
    * `flat` holds merges as [a0, b0, a1, b1, ...] in rank order.
    */
  def tokenCount(word: String, flat: Array[String]): Int = {
    val sb = new java.lang.StringBuilder(word.length * 3)
    var c = 0
    while (c < word.length) {
      sb.append(Sep).append(word.charAt(c)).append(Sep)
      c += 1
    }
    var s = sb.toString
    var i = 0
    while (i < flat.length) {
      val pat = Sep + flat(i) + Sep + Sep + flat(i + 1) + Sep
      if (s.contains(pat)) s = s.replace(pat, Sep + flat(i) + flat(i + 1) + Sep)
      i += 2
    }
    // tokens = wrapped units = 1 + number of internal SepSep boundaries
    var n = 1
    var j = s.indexOf(Sep + Sep)
    while (j >= 0) { n += 1; j = s.indexOf(Sep + Sep, j + 2) }
    if (s.isEmpty) 0 else n
  }

  // words repeat heavily: one decode per distinct word per thread. Keys
  // hold the merge-table ARRAY itself: tuple equality compares arrays by
  // reference, so two distinct tables can never cross-contaminate even if
  // their identity hash codes collide (hash collisions only share buckets).
  private val localCache = ThreadLocal.withInitial(() =>
    new java.util.HashMap[(Array[String], String), Integer]())

  /** Static entry point shared by interpreted eval and generated code. */
  def countTokens(text: UTF8String, flat: Array[String]): Long = {
    val cache = localCache.get()
    var total = 0L
    val it = preTokens(text.toString)
    while (it.hasNext) {
      val w = it.next()
      val key = (flat, w)
      var c = cache.get(key)
      if (c == null) {
        c = tokenCount(w, flat)
        if (cache.size < 65536) cache.put(key, c)
      }
      total += c.intValue()
    }
    total
  }

  /** Column form over a literal merge table (codegen expression). */
  def bpe_token_count(text: Column, merges: Array[(String, String)]): Column =
    ColumnBridge.column(BpeCountExpr(ColumnBridge.expression(text),
      merges.flatMap(m => Seq(m._1, m._2))))

  /** Distributed word-type count feeding the trainer's driver loop, with
    * the two bounds every production BPE trainer applies BEFORE collecting:
    * a frequency floor (`minCount` — singleton/rare types cannot win a
    * merge on their own and at web scale there are 10⁸+ of them, so an
    * unfloored collect is a driver OOM) and a top-N cap (`maxWordTypes`,
    * 0 = uncapped) evaluated as a distributed TakeOrdered, so the driver
    * only ever receives min(maxWordTypes, surviving types) rows.
    * Deterministic: the cap breaks count ties lexicographically.
    */
  def trainWordTypes(docs: DataFrame, textCol: String, minCount: Long,
      maxWordTypes: Int): Array[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counted = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("chunk"))
      .as[String]
      .flatMap(c => preTokens(c))
      .groupBy("value").count()
      .filter(col("count") >= minCount)
    val capped =
      if (maxWordTypes > 0)
        counted.orderBy(col("count").desc, col("value")).limit(maxWordTypes)
      else counted
    capped.as[(String, Long)].collect()
  }

  /** Classic BPE training over a text column. Returns up to `numMerges`
    * merges in rank order (fewer once every pair count drops below 2).
    *
    * The driver only holds the FLOORED word-type table (`minCount`, default
    * 2): a type seen once contributes 1 to each of its pairs, and a merge
    * needs a pair count ≥ 2, so singletons can only matter through
    * cross-type accumulation of near-threshold pairs — the standard trade
    * every BPE trainer makes to keep vocab collection bounded. The
    * provenance test (BpeSpec) pins that Merges60 is invariant under the
    * floor on the training corpus. `maxWordTypes` (default 2²², 0 = off)
    * hard-bounds driver memory even on adversarial corpora.
    *
    * BEHAVIOR NOTE for pre-round-7 callers: the floor CAN change merges on
    * corpora where singleton types accumulate near-threshold pair counts.
    * Pass `minCount = 1` for classic unfloored BPE — `maxWordTypes` alone
    * still bounds the driver (the collect is a distributed TakeOrdered),
    * at the cost of the cap now choosing WHICH rare types survive on
    * corpora that exceed it.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 2L, maxWordTypes: Int = 1 << 22): Array[(String, String)] = {
    val words = trainWordTypes(docs, textCol, minCount, maxWordTypes)
    require(words.forall(!_._1.contains(Sep)),
      "corpus contains the BPE separator character U+0001")

    var vocab: Map[Vector[String], Long] =
      words.groupBy(w => w._1.map(_.toString).toVector)
        .map { case (syms, ws) => syms -> ws.map(_._2).sum }
    val merges = Vector.newBuilder[(String, String)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          pairCounts.merge((syms(i), syms(i + 1)), n, _ + _)
          i += 1
        }
      }
      import scala.jdk.CollectionConverters._
      val best = pairCounts.asScala.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }
        .headOption.filter(_._2 >= 2).map(_._1)
      best match {
        case None => done = true
        case Some((a, b)) =>
          merges += ((a, b))
          vocab = vocab.toSeq.map { case (syms, n) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += syms(i); i += 1 }
            }
            out.result() -> n
          }.groupMapReduce(_._1)(_._2)(_ + _)
          r += 1
      }
    }
    merges.result().toArray
  }
}

/** BPE token count of a text column under a fixed merge table — codegen
  * (static call + reference object), no UDF in the scan pipeline.
  */
case class BpeCountExpr(child: Expression, flatMerges: Array[String])
    extends UnaryExpression {

  require(flatMerges.length % 2 == 0,
    "flatMerges must hold (a, b) pairs interleaved")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Bpe.countTokens(input.asInstanceOf[UTF8String], flatMerges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flatMerges, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.operators.Bpe.countTokens($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}
