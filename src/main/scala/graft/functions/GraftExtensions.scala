package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers graft's native functions into the
  * SQL function registry, so `spark.sql("… WHERE subject_matches(s, p)")`
  * works for SQL-surface users exactly like the Column API.
  *
  * Enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * (stackable with other extension classes, comma-separated).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** SQL-literal integer argument (e.g. the `n` in shingle_hashes(text, 3)). */
  private def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def litLong(e: Expression, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)  => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, clazz: Class[_], arity: String)(
        build: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        (children: Seq[Expression]) => {
          require(arity.split(",").map(_.toInt).contains(children.length),
            s"$name takes $arity arguments")
          build(children)
        }))

    register("subject_matches", classOf[SubjectMatchesExpr], "2")(c =>
      SubjectMatchesExpr(c.head, c(1)))
    register("vec_dot", classOf[VecDot], "2")(c => VecDot(c.head, c(1)))
    register("shingle_hashes", classOf[ShingleHashExpr], "2")(c =>
      ShingleHashExpr(c.head, litInt(c(1), "n")))
    register("minhash_signature", classOf[MinHashSigExpr], "2")(c =>
      MinHashSigExpr(c.head, litInt(c(1), "numHashes")))
    register("simhash64", classOf[SimHash64Expr], "1")(c => SimHash64Expr(c.head))
    register("winnow_fingerprint", classOf[WinnowingFingerprintExpr], "3")(c =>
      WinnowingFingerprintExpr(c.head, litInt(c(1), "k"), litInt(c(2), "w")))
    register("lang_id", classOf[LangIdExpr], "1")(c => LangIdExpr(c.head))
    register("lsh_buckets", classOf[LshBucketsExpr], "4,5")(c =>
      LshBucketsExpr(c.head, litInt(c(1), "tables"), litInt(c(2), "bits"),
        litInt(c(3), "dim"),
        if (c.length == 5) litLong(c(4), "seed") else 42L))
    register("shingle_md5", classOf[ShingleMd5Expr], "2")(c =>
      ShingleMd5Expr(c.head, litInt(c(1), "n")))
    register("winnow_super", classOf[WinnowingSuperExpr], "4")(c =>
      WinnowingSuperExpr(c.head, litInt(c(1), "k"), litInt(c(2), "w"),
        litInt(c(3), "s")))
    register("splitmix64", classOf[SplitMix64Expr], "1,2")(c =>
      SplitMix64Expr(c.head,
        if (c.length == 2) litLong(c(1), "seed") else 0L))
    register("leading_zeros64", classOf[LeadingZeros64Expr], "1")(c =>
      LeadingZeros64Expr(c.head))
    // aggregates: the registry builder returns the bare AggregateFunction;
    // the analyzer wraps it in an AggregateExpression like any builtin agg
    register("topk_doubles", classOf[TopKDoublesAgg], "2")(c =>
      TopKDoublesAgg(c.head, litInt(c(1), "k")))
    register("topk_structs", classOf[TopKStructsAgg], "3")(c =>
      TopKStructsAgg(c.head, c(1), litInt(c(2), "k")))
    register("freq_items", classOf[FreqItemsAgg], "2")(c =>
      FreqItemsAgg(c.head, litInt(c(1), "m")))
  }
}
