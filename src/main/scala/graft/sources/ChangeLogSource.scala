package graft.sources

import java.util
import scala.collection.immutable.TreeMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-changelog`: the binlog-tailing CDC source (O-1) re-expressed as a
  * Spark DataSourceV2 source over a replayable file-backed change ledger —
  * the Spark-native analog of Debezium tailing MariaDB's binlog and
  * publishing to JetStream (reference
  * `config/debezium/application.properties:4-16`, `docker-compose.yml:42`).
  *
  * Physical layout: `<root>/<db>/<table>/<segment>.jsonl`, each segment an
  * immutable append-only file of envelope JSON lines
  * (`docs/cdc-guide.md:134-151`). Segments are consumed in lexicographic
  * order; a micro-batch offset is the per-`db/table` count of consumed
  * segments, so planning from (start, end] is deterministic — replaying a
  * checkpointed batch after a crash reads exactly the same lines (O-30).
  *
  * Wire schema (one row per change event):
  * `subject, value, db, table, op, ts_ms` — the typed per-table envelope is
  * recovered downstream with `ChangeStream.deserialize` (explicit schema,
  * never inferred). `db`/`table` are top-level columns so equality/IN
  * predicates push down (O-3) and prune WHOLE DIRECTORIES at listing time:
  * a 1000-executor job subscribed to one table never lists, opens, or
  * parses the other tables' ledgers.
  *
  * Options:
  *  - `path` (required) — ledger root (any Hadoop scheme: file/HDFS/S3A)
  *  - `database` — include only this database's subtree
  *  - `tables` — comma-separated table include list (`table.include.list`,
  *    application.properties:16)
  *  - `maxFilesPerTrigger` — admission control per micro-batch (O-27)
  */
class ChangeLogDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-changelog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeLog.WireSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChangeLogTable(new CaseInsensitiveStringMap(properties))
  override def supportsExternalMetadata(): Boolean = false
}

object ChangeLog {
  val WireSchema: StructType = StructType(Seq(
    StructField("subject", StringType, nullable = false),
    StructField("value", StringType, nullable = false),
    StructField("db", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  val SubjectPrefix = "HCM.CDC.HR" // application.properties:12, README.md:117

  /** One ledger directory (`db/table`) with its sorted immutable segments. */
  final case class TableDir(db: String, table: String, files: Seq[FileStatus])

  /** List segments under `<root>/<db>/<table>/` applying include pruning — the
    * source-level pushdown: pruned tables are never even listed.
    */
  def listDirs(root: Path, conf: Configuration,
               dbFilter: Option[Set[String]],
               tableFilter: Option[Set[String]]): Seq[TableDir] = {
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Seq.empty
    for {
      dbDir <- fs.listStatus(root).toSeq.filter(_.isDirectory)
        .sortBy(_.getPath.getName)
      if dbFilter.forall(_.contains(dbDir.getPath.getName))
      tblDir <- fs.listStatus(dbDir.getPath).toSeq.filter(_.isDirectory)
        .sortBy(_.getPath.getName)
      if tableFilter.forall(_.contains(tblDir.getPath.getName))
    } yield TableDir(
      dbDir.getPath.getName, tblDir.getPath.getName,
      fs.listStatus(tblDir.getPath).toSeq
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
          && !f.getPath.getName.startsWith("."))
        .sortBy(_.getPath.getName))
  }

  def dirKey(db: String, table: String): String = s"$db/$table"

  /** Split one segment into byte-range partitions so a FAT segment does not
    * serialize its whole parse into one task — the same line-boundary
    * convention as Hadoop's LineRecordReader: a split owns every line whose
    * first byte is at `start <= pos <= start+length` exclusive of the first
    * (possibly partial) line when `start > 0`, which the previous split
    * reads by running one line past its end.
    */
  def splitFile(db: String, table: String, f: FileStatus,
                maxBytes: Long): Seq[ChangeLogPartition] = {
    val len = f.getLen
    val path = f.getPath.toString
    if (len <= maxBytes) Seq(ChangeLogPartition(db, table, path, 0L, len))
    else {
      val nSplits = ((len + maxBytes - 1) / maxBytes).toInt
      val per = (len + nSplits - 1) / nSplits // even sizes, not one runt split
      (0 until nSplits).map { i =>
        val start = i * per
        ChangeLogPartition(db, table, path, start, math.min(per, len - start))
      }
    }
  }
}

class ChangeLogTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-changelog(${options.get("path")})"
  override def schema(): StructType = ChangeLog.WireSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ChangeLogScanBuilder(opts)
}

class ChangeLogScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushedDb: Option[Set[String]] = None
  private var pushedTables: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty
  private var requiredSchema: StructType = ChangeLog.WireSchema

  /** Accept equality/IN on db/table — they become directory pruning. The
    * accepted filters are still re-evaluated by Spark above us (returning
    * them from pushFilters keeps correctness simple and pruning exact).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def inter(cur: Option[Set[String]], vs: Set[String]) =
      Some(cur.fold(vs)(_ intersect vs))
    val accepted = filters.filter {
      case EqualTo("db", v: String)    => pushedDb = inter(pushedDb, Set(v)); true
      case EqualTo("table", v: String) => pushedTables = inter(pushedTables, Set(v)); true
      case In("db", vs) if vs.forall(_.isInstanceOf[String]) =>
        pushedDb = inter(pushedDb, vs.map(_.asInstanceOf[String]).toSet); true
      case In("table", vs) if vs.forall(_.isInstanceOf[String]) =>
        pushedTables = inter(pushedTables, vs.map(_.asInstanceOf[String]).toSet); true
      case _ => false
    }
    pushed = accepted
    filters // all filters re-evaluated post-scan (pruning is an optimization)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(schema: StructType): Unit =
    requiredSchema = schema

  override def build(): Scan =
    new ChangeLogScan(options, requiredSchema, pushedDb, pushedTables)
}

class ChangeLogScan(options: CaseInsensitiveStringMap,
                    requiredSchema: StructType,
                    pushedDb: Option[Set[String]],
                    pushedTables: Option[Set[String]]) extends Scan {

  private val root = new Path(Option(options.get("path"))
    .getOrElse(throw new IllegalArgumentException(
      "graft-changelog requires a 'path' option")))

  /** Option-level include list (application.properties:15-16) intersected
    * with pushed-down predicates.
    */
  private def optSet(key: String): Option[Set[String]] =
    Option(options.get(key)).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
  private val dbFilter: Option[Set[String]] =
    (optSet("database"), pushedDb) match {
      case (Some(a), Some(b)) => Some(a intersect b)
      case (a, b)             => a.orElse(b)
    }
  private val tableFilter: Option[Set[String]] =
    (optSet("tables"), pushedTables) match {
      case (Some(a), Some(b)) => Some(a intersect b)
      case (a, b)             => a.orElse(b)
    }

  private def hadoopConf: Configuration =
    SparkSession.active.sessionState.newHadoopConf()

  private[sources] def currentDirs: Seq[ChangeLog.TableDir] =
    ChangeLog.listDirs(root, hadoopConf, dbFilter, tableFilter)

  override def readSchema(): StructType = requiredSchema

  override def description(): String = {
    val db = dbFilter.map(_.toSeq.sorted.mkString("db=[", ",", "]")).getOrElse("db=*")
    val tb = tableFilter.map(_.toSeq.sorted.mkString("tables=[", ",", "]")).getOrElse("tables=*")
    s"graft-changelog $root $db $tb"
  }

  private[sources] def maxPartitionBytes: Long =
    Option(options.get("maxPartitionBytes")).map(_.toLong)
      .getOrElse(32L * 1024 * 1024)

  /** Optional floor on partition COUNT: when set, the per-batch split size
    * shrinks (never below 64 KiB) so the planned partitions number at least
    * this many — a small admission-controlled micro-batch then parses on
    * every core instead of one task per segment. Latency lever for the
    * streaming pipeline; off by default so batch reads keep one partition
    * per small segment.
    */
  private[sources] def minBatchPartitions: Option[Int] =
    Option(options.get("minBatchPartitions")).map(_.toInt)

  /** Split size for a planned set of files: `maxPartitionBytes`, shrunk to
    * hit `minBatchPartitions` when configured.
    */
  private[sources] def splitBytesFor(totalBytes: Long): Long =
    minBatchPartitions.filter(_ > 0).fold(maxPartitionBytes) { target =>
      math.min(maxPartitionBytes,
        math.max(64L * 1024, totalBytes / target + 1))
    }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val dirs = currentDirs
      val split = splitBytesFor(dirs.flatMap(_.files).map(_.getLen).sum)
      dirs.flatMap(d => d.files.flatMap(f =>
        ChangeLog.splitFile(d.db, d.table, f, split))).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new ChangeLogReaderFactory(requiredSchema,
        new org.apache.spark.util.SerializableConfiguration(hadoopConf))
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ChangeLogMicroBatchStream(this, options, requiredSchema)
}

/** Offset = per-`db/table` count of consumed segment files (sorted order).
  * Monotonic because segments are immutable and append-only.
  */
case class ChangeLogOffset(fileCounts: TreeMap[String, Int]) extends Offset {
  // Jackson-serialized (symmetric with parse): directory names containing
  // quotes/backslashes must round-trip through the streaming checkpoint.
  override def json(): String = {
    val node = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.objectNode()
    fileCounts.foreach { case (k, v) => node.put(k, v) }
    node.toString
  }
}

object ChangeLogOffset {
  val zero: ChangeLogOffset = ChangeLogOffset(TreeMap.empty)
  def parse(json: String): ChangeLogOffset = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json)
    var tm = TreeMap.empty[String, Int]
    m.fields().asScala.foreach(e => tm += (e.getKey -> e.getValue.asInt()))
    ChangeLogOffset(tm)
  }
}

class ChangeLogMicroBatchStream(scan: ChangeLogScan,
                                options: CaseInsensitiveStringMap,
                                requiredSchema: StructType)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val maxFilesPerTrigger: Option[Int] =
    Option(options.get("maxFilesPerTrigger")).map(_.toInt)

  private val conf = new org.apache.spark.util.SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())

  // Fixed target for Trigger.AvailableNow: capture the ledger end once, then
  // drain up to it in admission-controlled batches and stop.
  @volatile private var availableNowTarget: Option[ChangeLogOffset] = None

  private def snapshotOffset(): ChangeLogOffset =
    ChangeLogOffset(TreeMap(scan.currentDirs.map(d =>
      ChangeLog.dirKey(d.db, d.table) -> d.files.size): _*))

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(snapshotOffset())

  override def initialOffset(): Offset = ChangeLogOffset.zero

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val end = availableNowTarget.getOrElse(snapshotOffset())
    val from = start.asInstanceOf[ChangeLogOffset]
    limit match {
      case mf: ReadMaxFiles =>
        // Admit at most N new segment files, in deterministic dir order.
        var budget = mf.maxFiles()
        val admitted = end.fileCounts.map { case (key, endCount) =>
          val startCount = from.fileCounts.getOrElse(key, 0)
          val take = math.min(endCount - startCount, math.max(budget, 0))
          budget -= take
          key -> (startCount + take)
        }
        ChangeLogOffset(admitted)
      case _ => end
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[ChangeLogOffset]
    val to = end.asInstanceOf[ChangeLogOffset]
    val dirs = scan.currentDirs.map(d => ChangeLog.dirKey(d.db, d.table) -> d).toMap
    val admitted = to.fileCounts.iterator.flatMap { case (key, endCount) =>
      val startCount = from.fileCounts.getOrElse(key, 0)
      dirs.get(key).toSeq.flatMap(d =>
        d.files.slice(startCount, endCount).map(f => (d.db, d.table, f)))
    }.toSeq
    val split = scan.splitBytesFor(admitted.map(_._3.getLen).sum)
    admitted.flatMap { case (db, table, f) =>
      ChangeLog.splitFile(db, table, f, split)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangeLogReaderFactory(requiredSchema, conf)

  override def deserializeOffset(json: String): Offset = ChangeLogOffset.parse(json)
  override def commit(end: Offset): Unit = () // segments are immutable; nothing to ack
  override def stop(): Unit = ()
}

/** One byte range of one segment = one partition (`[start, start+length)`
  * with LineRecordReader boundary semantics): small segments stay one task,
  * fat segments fan out across executors instead of serializing their
  * whole parse into one core.
  */
case class ChangeLogPartition(db: String, table: String, file: String,
                              start: Long, length: Long)
    extends InputPartition

class ChangeLogReaderFactory(
    requiredSchema: StructType,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChangeLogPartition]
    new ChangeLogReader(p, requiredSchema, conf.value)
  }
}

/** Streams one segment's JSON lines into pruned wire rows. Only `op`/`ts_ms`
  * require looking inside the line, extracted with a streaming JSON tokenizer
  * that skips the envelope bodies — full typed parsing happens downstream
  * (and only for the columns the query actually asked for).
  */
class ChangeLogReader(partition: ChangeLogPartition,
                      requiredSchema: StructType,
                      conf: Configuration)
    extends PartitionReader[InternalRow] {

  private val path = new Path(partition.file)
  private val in = path.getFileSystem(conf).open(path)
  private val end = partition.start + partition.length
  // LineRecordReader convention: a non-first split discards its first
  // (possibly partial) line — the previous split read it by running one
  // line past its end — and every split keeps reading while the line
  // STARTS at pos <= end.
  private var pos: Long = {
    if (partition.start > 0) in.seek(partition.start)
    partition.start
  }
  private val lineReader = new org.apache.hadoop.util.LineReader(in)
  private val text = new org.apache.hadoop.io.Text()
  if (partition.start > 0) pos += lineReader.readLine(text)

  private val jsonFactory = new JsonFactory()

  private val subject = UTF8String.fromString(
    s"${ChangeLog.SubjectPrefix}.${partition.db}.${partition.table}")
  private val dbU = UTF8String.fromString(partition.db)
  private val tableU = UTF8String.fromString(partition.table)
  private val needsEnvelopeFields =
    requiredSchema.fieldNames.exists(n => n == "op" || n == "ts_ms")

  private var line: String = _

  override def next(): Boolean = {
    line = null
    while (line == null && pos <= end) {
      val n = lineReader.readLine(text)
      if (n == 0) return false // EOF
      pos += n
      val s = text.toString
      if (!s.trim.isEmpty) line = s
    }
    line != null
  }

  override def get(): InternalRow = {
    var op: UTF8String = null
    var tsMs: Long = 0L
    var tsSet = false
    if (needsEnvelopeFields) {
      val p = jsonFactory.createParser(line)
      try {
        if (p.nextToken() == JsonToken.START_OBJECT) {
          while (p.nextToken() == JsonToken.FIELD_NAME) {
            val name = p.currentName()
            p.nextToken()
            name match {
              case "op"    => op = UTF8String.fromString(p.getValueAsString)
              case "ts_ms" => tsMs = p.getValueAsLong; tsSet = true
              case _       => p.skipChildren()
            }
          }
        }
      } finally p.close()
    }
    val values: Array[Any] = requiredSchema.fieldNames.map {
      case "subject" => subject
      case "value"   => UTF8String.fromString(line)
      case "db"      => dbU
      case "table"   => tableU
      case "op"      => op
      case "ts_ms"   => if (tsSet) tsMs else null
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = lineReader.close()
}
