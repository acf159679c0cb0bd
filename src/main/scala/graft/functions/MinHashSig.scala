package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** MinHash signature as one codegen expression: slot i = min over the
  * shingle-hash array of `xxhash64(h, i)`.
  *
  * Bit-identical to the Column formulation
  * `transform(seq, i => array_min(transform(hashes, h => xxhash64(h, i))))`:
  * Spark's xxhash64 folds its arguments as
  * `seed=42 → XXH64.hashLong(h, seed) → XXH64.hashLong(i, ·)`, which is
  * exactly what the static loop below computes — so LSH buckets, and the
  * doc_dedup_near oracle output, are unchanged. The HOF version runs
  * interpreted (numHashes × |shingles| boxed lambda calls per row); this is
  * a primitive double loop.
  */
object MinHashSig {

  /** Static entry point shared by interpreted eval and generated code. */
  def signature(hashes: ArrayData, numHashes: Int): ArrayData = {
    val n = hashes.numElements()
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = XXH64.hashLong(i.toLong, XXH64.hashLong(hashes.getLong(j), 42L))
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  def minhash_signature(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSigExpr(ColumnBridge.expression(hashes), numHashes))
}

case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1,
    s"minhash_signature: numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.signature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSig.signature($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}
