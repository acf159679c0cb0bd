package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: Z-order (Morton) clustering for
  * multi-dimensional scan pruning — the Delta `OPTIMIZE ZORDER BY`
  * capability, built on vanilla Spark writes.
  *
  * Why it matters at 100 TB: a table range-partitioned/sorted on ONE
  * column prunes row groups only for predicates on that column; sorting
  * by the bit-interleaved Z-value of TWO columns gives every file a
  * narrow min/max envelope in BOTH dimensions, so parquet footer stats
  * prune selective predicates on either column (or both) — measured in
  * `LayoutSpec`: a one-user filter over a 32-file events table touches
  * ~1 file z-ordered vs ~all 32 time-sorted, while time-range filters
  * stay prunable too.
  *
  * The interleave is pure BITWISE Column arithmetic (shiftleft /
  * bitwiseAND / bitwiseOR — no overflow semantics in play, ANSI-safe),
  * and replays verbatim in DuckDB on UBIGINT, so Z-values sit under the
  * exactness gate like everything else.
  */
object Layout {

  /** Classic parallel-prefix bit spread: the low 31 bits of x moved to
    * the even bit positions of a 62-bit word.
    */
  private def spread(x: Column): Column = {
    def step(c: Column, shift: Int, mask: Long): Column =
      (c.bitwiseOR(shiftleft(c, shift))).bitwiseAND(lit(mask))
    val masked = x.bitwiseAND(lit(0x7FFFFFFFL))
    val s1 = step(masked, 16, 0x0000FFFF0000FFFFL)
    val s2 = step(s1, 8, 0x00FF00FF00FF00FFL)
    val s3 = step(s2, 4, 0x0F0F0F0F0F0F0F0FL)
    val s4 = step(s3, 2, 0x3333333333333333L)
    step(s4, 1, 0x5555555555555555L)
  }

  /** The scalar reference for specs/oracles. */
  def zValueRef(a: Long, b: Long): Long = {
    def spread(x0: Long): Long = {
      var x = x0 & 0x7FFFFFFFL
      x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
      x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x << 2)) & 0x3333333333333333L
      (x | (x << 1)) & 0x5555555555555555L
    }
    spread(a) | (spread(b) << 1)
  }

  /** Morton Z-value of two dimensions' LOW 31 BITS (62-bit result, always
    * non-negative — stays in BIGINT range on every engine). Dimensions
    * wider than 31 bits should be bucketed/ranked first (interleaving
    * raw high bits would let one dimension's magnitude drown the other's
    * locality anyway).
    */
  def zValue(a: Column, b: Column): Column =
    spread(a.cast("long")).bitwiseOR(shiftleft(spread(b.cast("long")), 1))

  /** Cluster `df` for two-dimensional pruning: range-partition into
    * `numFiles` splits of the Z-value and sort inside each — one file
    * per partition on write, each with a tight (a, b) min/max envelope.
    * The `_z` column is retained so callers can inspect/verify; drop it
    * before writing if the schema must stay closed.
    *
    * Dimensions are min/max-NORMALIZED to a common 16-bit width before
    * interleaving — interleaving raw values lets the wider dimension's
    * high bits monopolize the sort (measured: 8-bit user ids against
    * 14-bit minute offsets left every user scattered across ALL files,
    * because minute bits 8..13 sat above every user bit; after scaling,
    * a one-user filter touches numFiles/4). The bounds ride a broadcast
    * one-row aggregate — no driver action, no extra pass; the double
    * division is layout-internal and never reaches a gated value.
    */
  def zorderBy(df: DataFrame, colA: String, colB: String,
               numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val a = col(colA).cast("long")
    val b = col(colB).cast("long")
    val bounds = df.agg(
      min(a).as("_alo"), max(a).as("_ahi"),
      min(b).as("_blo"), max(b).as("_bhi"))
    def rank16(v: Column, lo: Column, hi: Column): Column =
      floor((v - lo).cast("double") /
        greatest(hi - lo, lit(1L)).cast("double") * 65535.0).cast("long")
    df.crossJoin(broadcast(bounds))
      .withColumn("_z", zValue(
        rank16(a, col("_alo"), col("_ahi")),
        rank16(b, col("_blo"), col("_bhi"))))
      .drop("_alo", "_ahi", "_blo", "_bhi")
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
  }
}
