package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed key derivation for the hash-sketch family ([[Hll]], [[Kmv]]) —
  * the shared answer to the `cast("long")` trap: a non-integral value
  * column (a string user id, a wide decimal) silently casts to NULL,
  * every sketch update skips it, and the sketch reports 0 distinct for a
  * populated set with no error anywhere.
  *
  * Contract per input type:
  *
  *  - integral / date / timestamp columns map losslessly to the long the
  *    splitmix64 mix expects — the oracle replays them verbatim;
  *  - strings ride the repo's md5-52-bit surrogate
  *    (`conv(substring(md5(s),1,13),16,10)` — DuckDB:
  *    `('0x' || substring(md5(s),1,13))::BIGINT`, the [[Profiler]] /
  *    Curation idiom), a replayable 52-bit key whose collision mass
  *    (~n²/2^53) sits far below the sketch's own k-error band at any
  *    cardinality the sketches are honest for;
  *  - decimals up to precision 18 use the exact unscaled long (never a
  *    double round-trip);
  *  - anything else — float/double (equality on them is not a distinct
  *    count), binary, arrays — is REFUSED with a typed error instead of
  *    the silent empty sketch.
  *
  * MIGRATION NOTE (round 11 → 12): this object changed timestamp keys
  * from the old `cast("long")` (epoch SECONDS) to `unix_micros`, and
  * date/string/decimal keys from a silent NULL to real derivations. Any
  * PERSISTED HLL/KMV sketch state (BatchTables sketch tables) built
  * before that change and keyed on a timestamp/date/string/decimal
  * column hashes the same element differently across the epochs —
  * merging old partitions with new batches inflates estimates. Rebuild
  * such sketch tables from source once; integral-keyed sketches are
  * unaffected (`cast("long")` and the typed key agree).
  */
private[operators] object SketchKeys {

  /** The long key for `df(valueCol)`, typed by the column's dataType.
    * Throws `IllegalArgumentException` for types with no sound key.
    */
  def longKey(df: DataFrame, valueCol: String): Column = {
    val c = col(valueCol)
    df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => c.cast("long")
      case TimestampType => unix_micros(c)
      case DateType => datediff(c, lit("1970-01-01").cast("date")).cast("long")
      case StringType => conv(substring(md5(c), 1, 13), 16, 10).cast("long")
      case d: DecimalType if d.precision <= 18 =>
        (c * lit(BigDecimal(10).pow(d.scale))).cast("long")
      case other => throw new IllegalArgumentException(
        s"no sketch key for column `$valueCol` of type ${other.simpleString}: " +
          "integral/date/timestamp/string/decimal(<=18) are supported — " +
          "cast or hash the column to one of these explicitly")
    }
  }
}
