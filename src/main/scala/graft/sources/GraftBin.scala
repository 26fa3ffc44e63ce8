package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * A complete DataSource V2 connector for a length-prefixed binary document
 * format ("graftbin") — the custom-source slot of the architecture: when a
 * corpus arrives in a format Spark has no reader for (a crawler's record
 * log, an annotation tool's dump), the RIGHT integration is a `TableProvider`
 * so Catalyst sees a real table — with column pruning and filter pushdown —
 * instead of an opaque RDD of decoded blobs.
 *
 * Record layout (big-endian, DataOutput framing):
 *   [long doc_id][int |lang|][lang utf8][int |text|][text utf8][long n_chars]
 *
 * Why this demonstrates the two scan contracts for real, not as theater:
 *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): the text
 *    length prefix lets the reader `skipBytes` the payload when `text` is
 *    pruned — a projection that drops the fat column genuinely skips its
 *    decode (and its UTF8String allocation), the binary-format analogue of
 *    parquet's column skipping.
 *  - **Filter pushdown** ([[SupportsPushDownFilters]]): comparisons on
 *    `doc_id` evaluate right after the 8-byte id read, BEFORE the variable
 *    payload is touched; non-matching records are skipped at frame level.
 *    Only doc_id comparisons are accepted — everything else is returned to
 *    Spark as post-scan filters (correctness never depends on the source's
 *    ambition).
 *
 * Write path ([[SupportsWrite]] + truncate): one part file per task, named
 * `part-b<jobTag>-<partitionId>` where jobTag derives from the write job's
 * queryId — task retries overwrite their own file, aborts delete it, and
 * APPEND jobs (`mode("append")`) are collision-free against every earlier
 * job's files. `mode("overwrite")` plans OverwriteByExpression(true), which
 * lands in `truncate()` and clears the directory. Parallelism is the
 * writing query's partitioning, exactly like the built-in file sources.
 *
 * Scale posture: one [[InputPartition]] per file (the staging writer cuts
 * one file per upstream partition, so read parallelism mirrors write
 * parallelism); the Hadoop `Configuration` travels to executors via the
 * writable-serialization wrapper below, so the same code runs against
 * HDFS/S3A, not just file://.
 */
class GraftBin extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftBin.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftBinTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = true
}

object GraftBin {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = false)))

  val format: String = classOf[GraftBin].getName

  /** Hadoop Configuration is not java-serializable; wrap its own Writable
    * protocol so factories can carry it to executors. */
  class SerializableConf(@transient var conf: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit =
      conf.write(out)
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      conf = new Configuration(false)
      conf.readFields(in)
    }
  }

  private[sources] def hadoopConf(): Configuration =
    SparkSession.active.sessionState.newHadoopConf()

  // ---- file-statistics manifest: data skipping at planning time ----

  /** Write a manifest shard recording per-file (min doc_id, max doc_id,
    * rows) for one commit — line-oriented JSON under `_manifest/`.
    * Deterministic shard names make streaming-epoch replays idempotent. */
  private[sources] def writeManifest(conf: Configuration, dir: String,
      shard: String, entries: Seq[GraftBinCommit]): Unit = {
    val p = new Path(dir, s"_manifest/$shard.json")
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    val body = entries.map { e =>
      org.json4s.jackson.JsonMethods.compact(org.json4s.JObject(
        "file" -> org.json4s.JString(new Path(e.file).getName),
        "min" -> org.json4s.JLong(e.minId),
        "max" -> org.json4s.JLong(e.maxId),
        "rows" -> org.json4s.JLong(e.rows)))
    }.mkString("", "\n", "\n")
    out.write(body.getBytes("UTF-8"))
    out.close()
  }

  private def readManifest(conf: Configuration, dir: String): Map[String, (Long, Long)] = {
    val p = new Path(dir, "_manifest")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Map.empty
    else fs.listStatus(p).filter(_.getPath.getName.endsWith(".json")).flatMap { st =>
      val in = fs.open(st.getPath)
      val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      in.close()
      lines.filter(_.nonEmpty).flatMap { line =>
        org.json4s.jackson.JsonMethods.parse(line) match {
          case o: org.json4s.JObject =>
            val m = o.obj.toMap
            (m.get("file"), m.get("min"), m.get("max")) match {
              case (Some(org.json4s.JString(f)), Some(min: org.json4s.JValue),
                  Some(max: org.json4s.JValue)) =>
                def l(v: org.json4s.JValue): Option[Long] = v match {
                  case org.json4s.JLong(x) => Some(x)
                  case org.json4s.JInt(x) => Some(x.toLong)
                  case _ => None
                }
                for (mn <- l(min); mx <- l(max)) yield f -> (mn, mx)
              case _ => None
            }
          case _ => None
        }
      }
    }.toMap
  }

  /** doc_id bounds implied by the pushed filters: (lower, upper),
    * inclusive, None = unbounded. */
  private def filterBounds(pushed: Array[Filter]): (Option[Long], Option[Long]) = {
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    def tighterLo(v: Long): Unit = lo = Some(lo.fold(v)(math.max(_, v)))
    def tighterHi(v: Long): Unit = hi = Some(hi.fold(v)(math.min(_, v)))
    pushed.foreach {
      case EqualTo("doc_id", v: java.lang.Long) => tighterLo(v); tighterHi(v)
      case GreaterThan("doc_id", v: java.lang.Long) => tighterLo(v + 1)
      case GreaterThanOrEqual("doc_id", v: java.lang.Long) => tighterLo(v)
      case LessThan("doc_id", v: java.lang.Long) => tighterHi(v - 1)
      case LessThanOrEqual("doc_id", v: java.lang.Long) => tighterHi(v)
      case _ =>
    }
    (lo, hi)
  }

  /** The data files a scan with `pushed` must read: every `.graftbin`
    * file in the directory MINUS those whose manifest [min, max] doc_id
    * range provably cannot satisfy the pushed bounds. Files with no
    * manifest entry (hand-copied, pre-manifest) are always kept —
    * skipping is an optimization, never a correctness bet. This is the
    * same min/max zone-map pruning parquet row groups give, lifted to
    * whole files at PLANNING time: at 100 TB the driver plans thousands
    * of tasks instead of millions before a byte of data is read. */
  private[graft] def pruneFiles(conf: Configuration, dir: String,
      pushed: Array[Filter]): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Seq.empty
    val files = fs.listStatus(p).filter(_.getPath.getName.endsWith(".graftbin"))
      .map(_.getPath).sortBy(_.getName)
    val stats = readManifest(conf, dir)
    val (lo, hi) = filterBounds(pushed)
    files.filter { f =>
      stats.get(f.getName) match {
        case Some((mn, mx)) =>
          lo.forall(_ <= mx) && hi.forall(_ >= mn)
        case None => true
      }
    }.map(_.toString).toSeq
  }
}

class GraftBinTable(path: String) extends Table
    with SupportsRead with SupportsWrite {
  require(path != null, "graftbin requires a path")

  override def name(): String = s"graftbin:$path"
  override def schema(): StructType = GraftBin.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftBinScanBuilder(path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftBinWriteBuilder(path, info)
}

// ---------------------------------------------------------------- read side

class GraftBinScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = GraftBin.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accept, reject) = filters.partition {
      case EqualTo("doc_id", _: java.lang.Long) => true
      case GreaterThan("doc_id", _: java.lang.Long) => true
      case GreaterThanOrEqual("doc_id", _: java.lang.Long) => true
      case LessThan("doc_id", _: java.lang.Long) => true
      case LessThanOrEqual("doc_id", _: java.lang.Long) => true
      case _ => false
    }
    pushed = accept
    reject // Spark re-applies these after the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new GraftBinScan(path, required, pushed)
}

class GraftBinScan(path: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftBinMicroBatchStream(path, required, pushed,
      new GraftBin.SerializableConf(GraftBin.hadoopConf()))

  // surfaces in `.explain` via BatchScanExec's description — the plan pin
  // asserts against this string
  override def description(): String =
    s"graftbin $path PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.map(_.name).mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    GraftBin.pruneFiles(GraftBin.hadoopConf(), path, pushed)
      .map(f => GraftBinPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftBinReaderFactory(required, pushed,
      new GraftBin.SerializableConf(GraftBin.hadoopConf()))
}

case class GraftBinPartition(file: String) extends InputPartition

class GraftBinReaderFactory(required: StructType, pushed: Array[Filter],
    conf: GraftBin.SerializableConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftBinReader(partition.asInstanceOf[GraftBinPartition].file,
      required, pushed, conf.conf)
}

class GraftBinReader(file: String, required: StructType, pushed: Array[Filter],
    conf: Configuration) extends PartitionReader[InternalRow] {

  private val p = new Path(file)
  private val in = new DataInputStream(
    new java.io.BufferedInputStream(p.getFileSystem(conf).open(p), 1 << 16))
  private val needLang = required.fieldNames.contains("lang")
  private val needText = required.fieldNames.contains("text")
  private val fieldOrder = required.fieldNames

  private var row: InternalRow = _

  private def keep(id: Long): Boolean = pushed.forall {
    case EqualTo("doc_id", v: java.lang.Long) => id == v.longValue()
    case GreaterThan("doc_id", v: java.lang.Long) => id > v.longValue()
    case GreaterThanOrEqual("doc_id", v: java.lang.Long) => id >= v.longValue()
    case LessThan("doc_id", v: java.lang.Long) => id < v.longValue()
    case LessThanOrEqual("doc_id", v: java.lang.Long) => id <= v.longValue()
    case _ => true
  }

  private def readUtf8(materialize: Boolean): UTF8String = {
    val len = in.readInt()
    if (len < 0) null
    else if (!materialize) { var left = len
      while (left > 0) left -= in.skipBytes(left); null
    } else {
      val buf = new Array[Byte](len)
      in.readFully(buf)
      UTF8String.fromBytes(buf)
    }
  }

  override def next(): Boolean = {
    while (true) {
      val id = try in.readLong() catch { case _: EOFException => return false }
      if (keep(id)) {
        val lang = readUtf8(needLang)
        val text = readUtf8(needText)
        val nChars = in.readLong()
        val values = fieldOrder.map {
          case "doc_id" => id.asInstanceOf[AnyRef]
          case "lang" => lang
          case "text" => text
          case "n_chars" => nChars.asInstanceOf[AnyRef]
        }
        row = new GenericInternalRow(values.asInstanceOf[Array[Any]])
        return true
      } else { // frame-level skip: payload bytes never decoded
        readUtf8(materialize = false)
        readUtf8(materialize = false)
        in.readLong()
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

// ----------------------------------------------------------- streaming read

/** Offset = the SET of part files already consumed (serialized as a JSON
  * array). A count-of-files offset would silently skip or replay data when
  * a late-arriving file sorts before an already-consumed name; set
  * difference is immune to arrival order. Each micro-batch plans exactly
  * the files present now but not in the start offset — the same
  * file-granularity incremental model as Spark's own FileStreamSource,
  * re-expressed through the DSv2 streaming API. */
class GraftBinMicroBatchStream(path: String, required: StructType,
    pushed: Array[Filter], conf: GraftBin.SerializableConf)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {

  import org.apache.spark.sql.connector.read.streaming.Offset

  private def listFiles(): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.conf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.getPath.getName.endsWith(".graftbin"))
      .map(_.getPath.toString).sorted.toSeq
  }

  override def initialOffset(): Offset = GraftBinOffset(Seq.empty)
  override def latestOffset(): Offset = GraftBinOffset(listFiles())
  override def deserializeOffset(json: String): Offset =
    GraftBinOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[GraftBinOffset].files.toSet
    val keep = GraftBin.pruneFiles(conf.conf, path, pushed).toSet
    end.asInstanceOf[GraftBinOffset].files
      .filterNot(seen).filter(keep).sorted
      .map(f => GraftBinPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftBinReaderFactory(required, pushed, conf)
}

case class GraftBinOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  // single-line JSON: the checkpoint OffsetSeqLog is line-oriented
  override def json(): String =
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.JArray(files.map(org.json4s.JString(_)).toList))
}

object GraftBinOffset {
  def fromJson(s: String): GraftBinOffset = GraftBinOffset(
    org.json4s.jackson.JsonMethods.parse(s) match {
      case org.json4s.JArray(vs) => vs.collect { case org.json4s.JString(f) => f }
      case _ => Seq.empty
    })
}

// --------------------------------------------------------------- write side

class GraftBinWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {

  require(info.schema().fieldNames.sameElements(GraftBin.schema.fieldNames),
    s"graftbin writes require columns ${GraftBin.schema.fieldNames.mkString(", ")} " +
      s"in order; got ${info.schema().fieldNames.mkString(", ")}")

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    // Batch part names carry a fragment of the write job's queryId, so
    // APPEND jobs into a populated directory are real: two jobs can never
    // collide on `part-$partitionId` names (the pre-r15 trap — a second
    // batch write without truncate silently overwrote the first job's
    // files while stacking a second manifest shard over the same names).
    // Within ONE job the fragment is constant, so a task retry still
    // overwrites its predecessor's file (create(overwrite=true)) and
    // idempotency per (job, partition) is preserved.
    override def toBatch: BatchWrite =
      new GraftBinBatchWrite(path, doTruncate,
        info.queryId().replaceAll("[^A-Za-z0-9]", "").take(8).toLowerCase,
        new GraftBin.SerializableConf(GraftBin.hadoopConf()))
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new GraftBinStreamingWrite(path,
        new GraftBin.SerializableConf(GraftBin.hadoopConf()))
  }
}

/** Streaming SINK: each epoch's tasks write part files named by
  * (epochId, partitionId) — a replayed micro-batch after a crash
  * re-creates the SAME file names with the same content
  * (create(overwrite=true)), so the sink is idempotent and the
  * checkpoint's epoch replay gives exactly-once file contents without a
  * commit log. Append-mode only (the natural mode for an ingestion
  * sink); the directory is then a valid graftbin table for the batch
  * and micro-batch readers. SINGLE-WRITER directory contract: epoch
  * names are unique within one query's checkpoint lineage — two
  * concurrent streams (or a stream plus batch writes) into the same
  * directory can collide on names, exactly as with Spark's built-in
  * file sink; give each writer its own directory. */
class GraftBinStreamingWrite(path: String, conf: GraftBin.SerializableConf)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.conf)
    fs.mkdirs(p)
    new GraftBinStreamingWriterFactory(path, conf)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val entries = messages.collect { case c: GraftBinCommit if c.rows > 0 => c }.toSeq
    if (entries.nonEmpty)
      GraftBin.writeManifest(conf.conf, path, f"epoch-$epochId%05d", entries)
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

class GraftBinStreamingWriterFactory(path: String,
    conf: GraftBin.SerializableConf)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftBinEpochWriter(path, epochId, partitionId, conf.conf)
}

class GraftBinEpochWriter(dir: String, epochId: Long, partitionId: Int,
    conf: Configuration) extends DataWriter[InternalRow] {
  private val p = new Path(dir, f"part-e$epochId%05d-$partitionId%05d.graftbin")
  private val out = new DataOutputStream(
    new java.io.BufferedOutputStream(p.getFileSystem(conf).create(p, true), 1 << 16))

  private var minId = Long.MaxValue
  private var maxId = Long.MinValue
  private var rows = 0L

  private def writeUtf8(s: UTF8String): Unit =
    if (s == null) out.writeInt(-1)
    else { val b = s.getBytes; out.writeInt(b.length); out.write(b) }

  override def write(r: InternalRow): Unit = {
    val id = r.getLong(0)
    minId = math.min(minId, id); maxId = math.max(maxId, id); rows += 1
    out.writeLong(id)
    writeUtf8(if (r.isNullAt(1)) null else r.getUTF8String(1))
    writeUtf8(if (r.isNullAt(2)) null else r.getUTF8String(2))
    out.writeLong(r.getLong(3))
  }
  override def commit(): WriterCommitMessage =
    { out.close(); GraftBinCommit(p.toString, minId, maxId, rows) }
  override def abort(): Unit = {
    out.close()
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, false)
  }
  override def close(): Unit = ()
}

/** Batch write: append-or-truncate into the directory. Job-unique part
  * names (`part-b<jobTag>-<partitionId>`) make appends collision-free —
  * see the builder's note. CRASH SEMANTICS, matching Spark's own file
  * sinks without a metadata log: committed tasks of an ABORTED job are
  * cleaned up in [[abort]] (their files are named in the commit
  * messages); a driver lost before abort can leave orphan part files
  * that a later read WILL see — the manifest is a stats cache for
  * skipping, never a commit log deciding visibility (files without an
  * entry are always read; see [[GraftBin.pruneFiles]]). */
class GraftBinBatchWrite(path: String, doTruncate: Boolean, jobTag: String,
    conf: GraftBin.SerializableConf) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.conf)
    if (doTruncate && fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
    new GraftBinWriterFactory(path, jobTag, conf)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // shard name derives from the committed file set, so re-running the
    // same job overwrites its own manifest instead of stacking shards;
    // an APPEND job's file set is disjoint from every earlier job's
    // (job-tagged names), so its shard stacks BESIDE earlier shards and
    // the union manifest stays per-file consistent.
    val entries = messages.collect { case c: GraftBinCommit if c.rows > 0 => c }.toSeq
    if (entries.nonEmpty) {
      val shard = "batch-" + Integer.toHexString(
        entries.map(e => new Path(e.file).getName).sorted.mkString(",").hashCode)
      GraftBin.writeManifest(conf.conf, path, shard, entries)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // tasks that committed before the JOB aborted named their files in
    // the messages — delete them so a failed append leaves no debris
    // (each task's own abort already covers the uncommitted ones)
    val fs = new Path(path).getFileSystem(conf.conf)
    messages.collect { case c: GraftBinCommit => new Path(c.file) }
      .foreach(f => if (fs.exists(f)) fs.delete(f, false))
  }
}

class GraftBinWriterFactory(path: String, jobTag: String,
    conf: GraftBin.SerializableConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftBinWriter(path, jobTag, partitionId, conf.conf)
}

case class GraftBinCommit(file: String, minId: Long, maxId: Long,
    rows: Long) extends WriterCommitMessage

class GraftBinWriter(dir: String, jobTag: String, partitionId: Int,
    conf: Configuration) extends DataWriter[InternalRow] {

  // deterministic per-(job, partition) name: a task retry OVERWRITES its
  // predecessor's file instead of duplicating it (create(overwrite=true));
  // the `b` prefix keeps batch names disjoint from the streaming sink's
  // `part-e<epoch>-…` namespace.
  private val p = new Path(dir, f"part-b$jobTag-$partitionId%05d.graftbin")
  private val out = new DataOutputStream(
    new java.io.BufferedOutputStream(p.getFileSystem(conf).create(p, true), 1 << 16))
  private var minId = Long.MaxValue
  private var maxId = Long.MinValue
  private var rows = 0L

  private def writeUtf8(s: UTF8String): Unit =
    if (s == null) out.writeInt(-1)
    else { val b = s.getBytes; out.writeInt(b.length); out.write(b) }

  override def write(r: InternalRow): Unit = {
    val id = r.getLong(0)
    minId = math.min(minId, id); maxId = math.max(maxId, id); rows += 1
    out.writeLong(id)
    writeUtf8(if (r.isNullAt(1)) null else r.getUTF8String(1))
    writeUtf8(if (r.isNullAt(2)) null else r.getUTF8String(2))
    out.writeLong(r.getLong(3))
  }

  override def commit(): WriterCommitMessage =
    { out.close(); GraftBinCommit(p.toString, minId, maxId, rows) }
  override def abort(): Unit = {
    out.close()
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, false)
  }
  override def close(): Unit = ()
}
