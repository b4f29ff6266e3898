package graft.sources.arrivals

import java.util
import java.nio.charset.Charset
import java.time.format.DateTimeFormatter
import java.time.Instant

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `arrivals` — a Structured Streaming source that watches a directory and
  * emits one row of file METADATA per newly-arrived file, then marks the
  * file consumed by renaming it with a completed suffix. A Spark-native
  * rebuild of the reference's Flume directory source (CephFsSource.java /
  * CephFSEventReader.java), with its semantics preserved and its defects
  * fixed:
  *
  *   - schema `{file_name, file_path, last_modified, body}` — the typed
  *     form of the reference's 3-field CSV event
  *     (CephFSEventReader.java:89-94); `body` carries the exact CSV bytes
  *     (scheme-less absolute path and non-padded `yyyy-MM-dd H:m:s`
  *     timestamp, CephFSEventReader.java:230-235) encoded in the
  *     configured charset (:94). `file_path` is the FULLY-QUALIFIED URI
  *     (file:/…, s3a://…), directly loadable with `spark.read` on any
  *     filesystem the session reaches.
  *   - candidate filter (CephFSEventReader.java:111-121): skips dirs,
  *     completed-suffix files, dot-hidden files — and ENFORCES
  *     `ignorePattern`, which the reference documents (README.md:26) but
  *     never applies (dead config in its accept()).
  *   - consumeOrder OLDEST|YOUNGEST|RANDOM (CephFsSourceConfigrationConstants
  *     .java:26-30) with the lexicographic tiebreak (CephFSEventReader.java:
  *     161-166), applied to the whole pending set per micro-batch: list
  *     once, sort once, take N — O(n log n) per batch vs the reference's
  *     O(n²) drain (re-list per file, README.md:31 warns about it).
  *   - commit-by-rename happens AFTER the micro-batch is durably
  *     committed — the reference renames BEFORE delivery
  *     (CephFSEventReader.java:96 before CephFsSource.java:148) and loses
  *     the event if the channel put fails. Rename is idempotent on replay
  *     (dest-exists with source gone = already committed, SURVEY.md §7.4-1);
  *     a genuine collision (source AND dest exist) still throws, matching
  *     CephFSEventReader.java:189-192.
  *   - startup canary (CephFSEventReader.java:52-66): create/write/read/
  *     delete a probe file, failing fast if the directory isn't read-write.
  *   - operational metrics (ref R8, the SourceCounter accept/append
  *     counters in CephFsSource.java:39,144-145,162-163): pendingFiles,
  *     filesOffered, filesRenamed, renameFailures, lastBatchFiles/Seq via
  *     DSv2 `ReportsSourceMetrics`, visible in every
  *     `StreamingQueryProgress.sources[i].metrics` alongside the
  *     engine's own numInputRows.
  *
  * Scale: the driver only LISTS the directory and ships plain metadata;
  * executors never touch the filesystem — partitions carry their rows.
  * Listing is CURSORED, not per-trigger: one full listing builds an
  * ordered in-memory backlog that subsequent triggers drain with zero
  * listing calls (a million-file backlog costs ONE directory scan per
  * drain cycle, not one per trigger). `listingRefreshTriggers` opts into
  * mid-drain refresh listings that admit every candidate not already
  * queued or in flight — including clock-skewed/late-copied gap files —
  * and the drained-backlog full list covers the refresh-off case; a
  * (mtime, name) watermark persisted in every offset records the cursor
  * position. The `listingCalls` source metric exposes the complexity
  * class. The filesystem is resolved
  * through the active SparkSession's Hadoop configuration, so `path` may
  * be any scheme the session is configured for (file://, hdfs://, s3a://;
  * a CephFS mount is just file:// as in the reference, README.md:3).
  * Backpressure is `maxFilesPerTrigger` admission control — Structured
  * Streaming pulls per trigger, so the reference's channel-full
  * exponential backoff (CephFsSource.java:149-160) has no analog.
  *
  * NOTE: the rename-on-commit makes a stream CONSUME files; run at most
  * one streaming query per watched directory (use the read-only batch
  * mode, or chain downstream queries off the first query's sink, for
  * additional consumers).
  */
class ArrivalsDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "arrivals"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    ArrivalsOptions.from(options.asScala.toMap) // eager validation + inert-key warn
    ArrivalsTable.schema
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ArrivalsTable(ArrivalsOptions.from(properties.asScala.toMap))
}

/** Parsed, validated options — mirrors CephFsSourceConfigrationConstants
  * .java:7-30 (path ⇔ cephFS dir, fileSuffix, ignorePattern, inputCharset,
  * consumeOrder, plus maxFilesPerTrigger for batch admission). */
final case class ArrivalsOptions(
    path: String,
    fileSuffix: String,
    ignorePattern: String,
    inputCharset: String,
    consumeOrder: String,
    maxFilesPerTrigger: Int,
    executorRenameThreshold: Int,
    timeZone: String,
    listingRefreshTriggers: Int) {
  require(path.nonEmpty, "option 'path' is required")
  require(Set("OLDEST", "YOUNGEST", "RANDOM").contains(consumeOrder),
    s"consumeOrder must be OLDEST|YOUNGEST|RANDOM, got '$consumeOrder'")
  Charset.forName(inputCharset) // fail fast on bad charset
  if (ignorePattern.nonEmpty) ignorePattern.r // fail fast on bad regex
  require(executorRenameThreshold > 0, "executorRenameThreshold must be > 0")
  java.time.ZoneId.of(timeZone) // fail fast on bad zone id
  require(listingRefreshTriggers >= 0, "listingRefreshTriggers must be >= 0")
}

object ArrivalsOptions {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  def from(m: Map[String, String]): ArrivalsOptions = {
    val norm = m.map { case (k, v) => k.toLowerCase(java.util.Locale.ENGLISH) -> v }
    val opts = ArrivalsOptions(
      path = norm.getOrElse("path", ""),
      fileSuffix = norm.getOrElse("filesuffix", ".COMPLETED"),
      ignorePattern = norm.getOrElse("ignorepattern", ""),
      inputCharset = norm.getOrElse("inputcharset", "UTF-8"),
      consumeOrder = norm.getOrElse("consumeorder", "OLDEST").toUpperCase(java.util.Locale.ENGLISH),
      maxFilesPerTrigger = norm.getOrElse("maxfilespertrigger", "1000").toInt,
      // commits at or above this many files fan the renames out to
      // executors (driver-side sequential renames below it)
      executorRenameThreshold = norm.getOrElse("executorrenamethreshold", "5000").toInt,
      // zone for the body CSV's rendered timestamp. The reference renders
      // with a default-zone Calendar (CephFSEventReader.java:230-235);
      // set this to the ingest host's zone for byte-fidelity with it.
      // Default stays UTC — the typed last_modified column is zoneless
      // either way (epoch micros).
      timeZone = norm.getOrElse("timezone", "UTC"),
      // with a backlog in hand the source does NOT re-list per trigger
      // (the scale fix for million-file backlogs); >0 re-lists
      // incrementally past the watermark every N drain triggers so
      // mid-backlog arrivals are seen with bounded staleness. 0 (default)
      // re-lists only when the backlog drains — the reference's own
      // cached-listing-iterator semantics (CephFSEventReader.java:32-33).
      listingRefreshTriggers = norm.getOrElse("listingrefreshtriggers", "0").toInt)
    // backoff keys are inert (see warnInertOptions) but must still be
    // VALIDATED AND WARNED on every construction path — a user-supplied
    // schema bypasses inferSchema entirely, so neither can live there
    warnInertOptions(m).foreach(log.warn)
    opts
  }

  /** The reference's channel-backoff knobs (`maxBackoffSleep`,
    * `backoffSleepIncrement`, `CephFsSourceConfigrationConstants.java:
    * 19-23`) have NO effect under Structured Streaming's pull model —
    * the engine asks for data per trigger instead of the source pushing
    * into a channel that can fill. A migrated reference config may still
    * carry them: accept and VALIDATE them (so a typo'd config still
    * fails fast) but warn that they are inert rather than silently
    * absorbing or hard-rejecting the keys. */
  private val backoffKeys = Seq("maxbackoffsleep", "backoffsleepincrement")
  def warnInertOptions(m: Map[String, String]): Seq[String] = {
    val norm = m.map { case (k, v) => k.toLowerCase(java.util.Locale.ENGLISH) -> v }
    backoffKeys.flatMap { k =>
      norm.get(k).map { v =>
        require(v.toLong >= 0, s"option '$k' must be a non-negative duration (ms), got '$v'")
        s"arrivals option '$k'=$v is accepted for reference-config compatibility " +
          "but has no effect: the pull model has no channel to back off from " +
          "(use maxFilesPerTrigger + trigger cadence for admission control)"
      }
    }
  }
}

/** Minimal serializable Hadoop-Configuration carrier (the Spark-internal
  * one is private[spark]); Configuration itself is a Writable. */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object ArrivalsTable {
  val schema: StructType = StructType(Seq(
    StructField("file_name", StringType, nullable = false),
    StructField("file_path", StringType, nullable = false),
    StructField("last_modified", TimestampType, nullable = false),
    StructField("body", BinaryType, nullable = false)))
}

/** Driver-side helpers shared by the streaming and batch paths — one
  * definition of the candidate predicate, pending-set listing, partition
  * slicing, and filesystem resolution (through the active session's
  * Hadoop conf, so spark.hadoop.* settings apply). */
object ArrivalsUtil {
  def hadoopConf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Candidate predicate (ref R2, CephFSEventReader.java:111-121) with
    * ignorePattern enforced as documented (fixing the dead config). */
  def isCandidate(opts: ArrivalsOptions, ignoreRe: Option[scala.util.matching.Regex])(
      st: FileStatus): Boolean = {
    val n = st.getPath.getName
    st.isFile && !n.endsWith(opts.fileSuffix) && !n.startsWith(".") &&
      ignoreRe.forall(_.findFirstIn(n).isEmpty)
  }

  /** All current candidates, unordered and uncapped. Stores the
    * FULLY-QUALIFIED URI (scheme + authority + path): the emitted
    * file_path must stay readable by spark.read on non-default
    * filesystems (s3a://, hdfs://) — a scheme-less path silently rebinds
    * to the default FS downstream. */
  def listCandidates(fs: FileSystem, dirPath: Path, opts: ArrivalsOptions,
      ignoreRe: Option[scala.util.matching.Regex]): Seq[FileMeta] =
    fs.listStatus(dirPath).toSeq.filter(isCandidate(opts, ignoreRe))
      .map(st => FileMeta(st.getPath.toString, st.getModificationTime))

  /** List once, order the whole pending set (ref R3 semantics batched:
    * SURVEY.md §7.4-3), admit up to maxFilesPerTrigger. */
  def listPending(fs: FileSystem, dirPath: Path, opts: ArrivalsOptions,
      ignoreRe: Option[scala.util.matching.Regex]): Seq[FileMeta] =
    ConsumeOrder.order(listCandidates(fs, dirPath, opts, ignoreRe), opts.consumeOrder)
      .take(opts.maxFilesPerTrigger)

  /** Round-robin partition slicing (metadata rows are tiny; 32 slices
    * bound scheduler overhead). */
  def slice(files: Seq[FileMeta], opts: ArrivalsOptions): Array[InputPartition] =
    if (files.isEmpty) Array.empty
    else {
      val slices = math.min(files.size, 32)
      files.zipWithIndex.groupBy(_._2 % slices).values
        .map(g => ArrivalsPartition(g.map(_._1), opts.inputCharset, opts.timeZone): InputPartition)
        .toArray
    }

  val readerFactory: PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
      new ArrivalsPartitionReader(partition.asInstanceOf[ArrivalsPartition])
  }

  /** One commit-rename attempt — the single definition shared by the
    * driver-sequential and executor-fan-out paths (ref R5 semantics:
    * collision-loud, idempotent on replay). Returns Right(true) if a
    * rename happened, Right(false) if already committed / vanished,
    * Left(message) on collision or failed rename. */
  def renameOne(fs: FileSystem, path: String, suffix: String): Either[String, Boolean] = {
    val src = new Path(path)
    val dst = new Path(path + suffix)
    val srcExists = fs.exists(src)
    val dstExists = fs.exists(dst)
    if (srcExists && dstExists) {
      // matches the reference's refusal to overwrite (CephFSEventReader
      // .java:189-192): a different file reused a consumed name
      Left(s"Name re-used: both $path and $dst exist; refusing to overwrite")
    } else if (srcExists) {
      if (fs.rename(src, dst)) Right(true)
      else Left(s"Failed to rename $path to $dst")
    } else Right(false)
    // !srcExists && dstExists: already committed (post-crash replay) — ok
    // neither exists: file vanished externally; nothing to mark
  }
}

class ArrivalsTable(opts: ArrivalsOptions) extends Table with SupportsRead {
  override def name(): String = s"arrivals(${opts.path})"
  override def schema(): StructType = ArrivalsTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ArrivalsTable.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ArrivalsMicroBatchStream(opts)
        // Batch mode: a read-only snapshot of the current pending set
        // (same candidate filter + consumeOrder + cap); nothing is
        // renamed — consumption semantics belong to the stream.
        override def toBatch(): Batch = new ArrivalsBatch(opts)
      }
    }
}

class ArrivalsBatch(opts: ArrivalsOptions) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val dirPath = new Path(opts.path)
    val fs = dirPath.getFileSystem(ArrivalsUtil.hadoopConf())
    val ignoreRe = if (opts.ignorePattern.nonEmpty) Some(opts.ignorePattern.r) else None
    ArrivalsUtil.slice(
      ArrivalsUtil.listPending(fs, dirPath, opts, ignoreRe), opts)
  }
  override def createReaderFactory(): PartitionReaderFactory = ArrivalsUtil.readerFactory
}

/** One pending file's metadata — the unit of both offsets and rows. */
final case class FileMeta(path: String, mtimeMs: Long) extends Serializable {
  def name: String = path.substring(path.lastIndexOf('/') + 1)
}

/** consumeOrder semantics as a pure function (ref R3,
  * CephFSEventReader.java:127-157): OLDEST = mtime asc, YOUNGEST = mtime
  * desc, tie in both → lexicographically smallest name (:139-140,:150-151,
  * :161-166); RANDOM = input (listing) order. Property-tested equal to the
  * reference's repeated single-pick on a quiescent directory. */
object ConsumeOrder {
  def order(files: Seq[FileMeta], mode: String): Seq[FileMeta] = mode match {
    case "OLDEST" => files.sortBy(f => (f.mtimeMs, f.name))
    case "YOUNGEST" => files.sortBy(f => (-f.mtimeMs, f.name))
    case "RANDOM" => files
  }
}

/** Offset = (monotonic batch seq, the exact file set of that batch, and
  * the listing cursor's high-watermark — the largest (mtime, name) the
  * source has admitted to its backlog, persisted so the cursor position
  * survives restarts and is inspectable in the offset log; the header
  * record is `seq` alone — also the pre-cursor legacy layout, still
  * parsed — or `seq\tw mtime\tw name`).
  * Self-contained: replay after restart re-emits rows from the offset log
  * alone, never from a re-listing (the files may already be renamed).
  *
  * Encoding MUST be a single line with NO \n or \r — Spark's offset log
  * is read line-by-line (BufferedReader.readLine treats both as
  * terminators); a raw line break here is parsed as a second source and
  * fails the restart with "N sources in the checkpoint offsets". Records
  * are -separated, fields \t-separated, with \\ \n \r \t  escaped in
  * paths (file paths are arbitrary byte-ish strings). */
final case class ArrivalsOffset(seq: Long, files: Seq[FileMeta],
    watermark: Option[(Long, String)] = None) extends Offset {
  override def json(): String = {
    val header = seq.toString + watermark.map { case (m, n) =>
      s"\t$m\t${ArrivalsOffset.esc(n)}"
    }.getOrElse("")
    (header +: files.map(f => s"${f.mtimeMs}\t${ArrivalsOffset.esc(f.path)}"))
      .mkString("\u0001")
  }
}

object ArrivalsOffset {
  def esc(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"; case '\n' => "\\n"; case '\r' => "\\r"
      case '\t' => "\\t"; case '\u0001' => "\\1"; case c => c.toString
    }
  def unesc(s: String): String = {
    val b = new StringBuilder; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b.append('\n'); case 'r' => b.append('\r')
          case 't' => b.append('\t'); case '1' => b.append('\u0001')
          case '\\' => b.append('\\')
          case other => b.append(other)
        }
        i += 2
      } else { b.append(c); i += 1 }
    }
    b.toString
  }
  def fromJson(json: String): ArrivalsOffset = {
    val recs = json.split("\u0001", -1)
    // header: `seq` (legacy, pre-watermark layout) or `seq\tmtime\tname`
    val head = recs.head.split('\t')
    val wm = if (head.length >= 3) Some((head(1).toLong, unesc(head(2)))) else None
    val files = recs.drop(1).filter(_.nonEmpty).map { l =>
      val tab = l.indexOf('\t')
      FileMeta(unesc(l.substring(tab + 1)), l.substring(0, tab).toLong)
    }
    ArrivalsOffset(head(0).toLong, files.toSeq, wm)
  }
}

class ArrivalsMicroBatchStream(opts: ArrivalsOptions) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.ReportsSourceMetrics {
  private val dirPath = new Path(opts.path)
  private val fs: FileSystem = dirPath.getFileSystem(ArrivalsUtil.hadoopConf())
  private val ignoreRe = if (opts.ignorePattern.nonEmpty) Some(opts.ignorePattern.r) else None

  // Operational counters (ref R8 — the SourceCounter accept/append
  // analogs, CephFsSource.java:39,144-145,162-163), surfaced per
  // progress event through DSv2 ReportsSourceMetrics into
  // StreamingQueryProgress.sources[i].metrics. All driver-side.
  private val filesOffered = new java.util.concurrent.atomic.AtomicLong()
  private val filesRenamed = new java.util.concurrent.atomic.AtomicLong()
  private val renameFailures = new java.util.concurrent.atomic.AtomicLong()
  private val pendingGauge = new java.util.concurrent.atomic.AtomicLong()
  private val listingCalls = new java.util.concurrent.atomic.AtomicLong()

  override def metrics(latestConsumedOffset: java.util.Optional[Offset]): java.util.Map[String, String] =
    Map(
      "pendingFiles" -> pendingGauge.get.toString,
      "filesOffered" -> filesOffered.get.toString,
      "filesRenamed" -> filesRenamed.get.toString,
      "renameFailures" -> renameFailures.get.toString,
      "lastBatchFiles" -> lastOffset.files.size.toString,
      "lastBatchSeq" -> lastOffset.seq.toString,
      // directory-listing RPCs issued since start: with a backlog in hand
      // this must NOT grow per trigger (the million-file-backlog scale
      // guard — specs pin the complexity class through this counter)
      "listingCalls" -> listingCalls.get.toString,
      "listingWatermark" -> watermark.map { case (m, n) => s"$m/$n" }.getOrElse("")).asJava
  // The most recent offset the engine is working against: either the last
  // offset WE returned this run, or (until we return one) the offset
  // restored from the checkpoint. Its files are excluded from new batches
  // and renamed once the engine moves past them.
  @volatile private var lastOffset: ArrivalsOffset = ArrivalsOffset(0L, Nil)
  @volatile private var offeredAny: Boolean = false

  // Startup canary (ref R9, CephFSEventReader.java:42-66): directory must
  // exist, be a directory, and be read-write — probed with a real file.
  {
    require(fs.exists(dirPath), s"arrivals path does not exist: ${opts.path}")
    require(fs.getFileStatus(dirPath).isDirectory, s"arrivals path is not a directory: ${opts.path}")
    val canary = new Path(dirPath, s".arrivals-canary-${java.util.UUID.randomUUID()}")
    try {
      val out = fs.create(canary, false)
      out.write("canary".getBytes("UTF-8")); out.close()
      val in = fs.open(canary)
      val buf = new Array[Byte](6); in.readFully(buf); in.close()
      require(new String(buf, "UTF-8") == "canary", "canary read-back mismatch")
    } catch {
      case e: Exception =>
        throw new IllegalStateException(
          s"Directory ${opts.path} failed read/write probe: ${e.getMessage}", e)
    } finally {
      if (fs.exists(canary)) fs.delete(canary, false)
    }
  }

  // Ordered pending backlog — ONE listing builds it, subsequent triggers
  // drain it with ZERO listing calls (the scale fix for million-file
  // backlogs: per-trigger re-listing is O(dir) × O(backlog/trigger)
  // driver work; FS APIs can't filter a listing server-side, so NOT
  // listing beats listing incrementally). This generalizes the
  // reference's cached-listing-iterator (CephFSEventReader.java:
  // 32-33,107-110,123-124: re-lists ONLY when the iterator drains —
  // files arriving mid-drain wait for the next rescan) from RANDOM to
  // every consumeOrder; `listingRefreshTriggers` bounds the staleness
  // with periodic incremental refreshes past the watermark. Driver-only
  // state, rebuilt from a fresh full listing after restart; replay
  // safety is unaffected because rows always come from the offset log,
  // never from this queue.
  private val backlog = scala.collection.mutable.Queue.empty[FileMeta]
  // Largest (mtime, name) ever admitted to the backlog in this listing
  // cycle — the incremental-refresh cursor, persisted in each offset.
  @volatile private var watermark: Option[(Long, String)] = None
  private var triggersSinceListing = 0

  private def wmKey(f: FileMeta): (Long, String) = (f.mtimeMs, f.name)

  private def enumerate(): Seq[FileMeta] = {
    listingCalls.incrementAndGet()
    ArrivalsUtil.listCandidates(fs, dirPath, opts, ignoreRe)
  }

  /** Pending = up to maxFilesPerTrigger files dequeued from the backlog.
    * Empty backlog → one FULL listing (minus the current offset's files:
    * offered-but-not-yet-renamed; re-admitting them would duplicate)
    * rebuilds it and resets the watermark cursor. Non-empty backlog →
    * no listing at all, unless `listingRefreshTriggers` is due, in
    * which case one refresh listing admits every candidate not already
    * queued or in flight (set-difference, NOT a watermark comparison:
    * the enumeration the refresh already pays dominates the backlog
    * set-build, and admission-by-set-diff means gap files — failed
    * renames, clock-skewed or late-copied arrivals whose (mtime, name)
    * sits at or below the watermark — are picked up at refresh cadence
    * even when sustained load keeps the backlog from ever draining).
    * With refreshes off, the drain-time full list is the gap catch, so
    * either way no file is lost, only deferred. The watermark tracks the
    * max (mtime, name) admitted — the persisted, inspectable cursor
    * position. The pendingFiles gauge reports the backlog's remainder
    * (what the source still intends to offer before the next rescan). */
  private def pending(): Seq[FileMeta] = {
    val offered = lastOffset.files.map(_.path).toSet
    if (backlog.isEmpty) {
      val cand = enumerate().filterNot(f => offered.contains(f.path))
      backlog.enqueueAll(ConsumeOrder.order(cand, opts.consumeOrder))
      watermark = if (cand.isEmpty) None else Some(cand.map(wmKey).max)
      triggersSinceListing = 0
    } else {
      triggersSinceListing += 1
      if (opts.listingRefreshTriggers > 0 &&
          triggersSinceListing >= opts.listingRefreshTriggers) {
        val known = backlog.iterator.map(_.path).toSet
        val fresh = enumerate()
          .filter(f => !known.contains(f.path) && !offered.contains(f.path))
        if (fresh.nonEmpty) {
          watermark = Some((watermark.toSeq ++ fresh.map(wmKey)).max)
          // RANDOM appends (cached-iterator spirit: new arrivals go last);
          // ordered modes re-order the merged set — O(backlog log backlog)
          // per refresh, amortized by the refresh interval
          val merged =
            if (opts.consumeOrder == "RANDOM") backlog.toSeq ++ fresh
            else ConsumeOrder.order(backlog.toSeq ++ fresh, opts.consumeOrder)
          backlog.clear()
          backlog.enqueueAll(merged)
        }
        triggersSinceListing = 0
      }
    }
    pendingGauge.set(backlog.size)
    (0 until math.min(opts.maxFilesPerTrigger, backlog.size))
      .map(_ => backlog.dequeue())
  }

  override def initialOffset(): Offset = ArrivalsOffset(0L, Nil)

  override def latestOffset(): Offset = {
    // Batches are strictly sequential: by the time the engine asks for the
    // next offset, every previously-returned offset's batch has completed
    // and is durably logged — so the previous batch's files can be marked
    // consumed NOW. (The engine's own commit() callback only fires when a
    // LATER batch runs, which would leave the final batch's files
    // unrenamed indefinitely on a quiet directory.) Replay stays safe
    // either way: rows are materialized from the offset log, never from
    // re-reading the files.
    renameConsumed(lastOffset.files)
    val p = pending()
    if (p.isEmpty) lastOffset
    else {
      lastOffset = ArrivalsOffset(lastOffset.seq + 1, p, watermark)
      offeredAny = true
      filesOffered.addAndGet(p.size)
      lastOffset
    }
  }

  override def deserializeOffset(json: String): Offset = {
    val raw = ArrivalsOffset.fromJson(json)
    // Migrate offsets checkpointed before FileMeta switched to
    // fully-qualified URIs: a scheme-less '/dir/f' from an old offset
    // log would never set-match the 'file:/dir/f' a fresh listing
    // produces, re-emitting the whole crash window. Qualify through the
    // SAME filesystem handle the listing uses.
    val o = raw.copy(files = raw.files.map { f =>
      if (new Path(f.path).toUri.getScheme == null)
        f.copy(path = fs.makeQualified(new Path(f.path)).toString)
      else f
    })
    // The checkpointed offset seeds our cursor ONLY until we have offered
    // an offset ourselves: once latestOffset() has returned one, the
    // engine is driving batches against OUR offsets and the checkpoint
    // deserialization (start-offset restore / replay) must not displace
    // them. Comparing seq numbers here would be wrong — in-memory seqs
    // reset on restart and can be arbitrarily behind or colliding with
    // checkpointed ones (either direction loses or duplicates files).
    // The restored watermark is diagnostic continuity only: the restart's
    // first pending() finds an empty backlog and does a FULL list (which
    // resets the cursor) — filtering that rebuild by a restored watermark
    // would LOSE the listed-but-not-yet-offered files below it that died
    // with the previous process's in-memory backlog.
    if (!offeredAny) {
      lastOffset = o
      watermark = o.watermark
    }
    o
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ArrivalsOffset]
    val e = end.asInstanceOf[ArrivalsOffset]
    // A batch emits exactly end.files MINUS start.files: the start offset's
    // files were already emitted by the previous batch. This must NOT
    // compare seq numbers — on restart the engine may call latestOffset()
    // on a fresh instance BEFORE deserializeOffset(), so an in-memory seq
    // can collide with the checkpointed one (observed: the collision made
    // a seq-equality check plan an empty batch while the offset advanced —
    // silent data loss). Set difference is also what makes the
    // crash-window replay safe: files already in the start offset are
    // never re-emitted, and engine-driven no-data batches (start == end)
    // naturally plan nothing.
    val startSet = s.files.toSet
    // rows come from the offset itself — executors never list/read the
    // FS, so replay is deterministic even after files were renamed
    ArrivalsUtil.slice(e.files.filterNot(startSet.contains), opts)
  }

  override def createReaderFactory(): PartitionReaderFactory = ArrivalsUtil.readerFactory

  /** Commit-by-rename (ref R5) AFTER durable checkpoint commit — idempotent
    * for replay, loud for genuine name collisions. */
  override def commit(end: Offset): Unit =
    renameConsumed(end.asInstanceOf[ArrivalsOffset].files)

  /** Commit renames: sequential on the driver for normal batches; for
    * very large commits (≥ executorRenameThreshold files) the renames
    * fan out to executors — the driver-side rename wall is the one
    * scale bottleneck of this source (ARCHITECTURE.md). Executors ship
    * back only (renamedCount, firstError) per partition, so driver
    * traffic stays bounded regardless of batch size; any error is
    * rethrown driver-side with the reference's collision semantics. */
  private def renameConsumed(files: Seq[FileMeta]): Unit = {
    if (files.isEmpty) return
    val active = SparkSession.getActiveSession
    if (files.size >= opts.executorRenameThreshold && active.isDefined) {
      val sc = active.get.sparkContext
      val confSer = new SerializableHadoopConf(ArrivalsUtil.hadoopConf())
      val suffix = opts.fileSuffix // local val: the stream itself must not be captured
      val paths = files.map(_.path)
      val slices = math.max(1, math.min(32, paths.size / 512 + 1))
      val results = sc.parallelize(paths, slices).mapPartitions { it =>
        var renamed = 0L
        var firstErr: Option[String] = None
        var pfs: FileSystem = null
        it.foreach { p =>
          if (firstErr.isEmpty) {
            if (pfs == null) pfs = new Path(p).getFileSystem(confSer.value)
            ArrivalsUtil.renameOne(pfs, p, suffix) match {
              case Left(e) => firstErr = Some(e)
              case Right(r) => if (r) renamed += 1
            }
          }
        }
        Iterator.single((renamed, firstErr))
      }.collect() // ≤ 32 small tuples — control traffic, not data
      filesRenamed.addAndGet(results.map(_._1).sum)
      results.flatMap(_._2).headOption.foreach { err =>
        renameFailures.incrementAndGet()
        throw new IllegalStateException(err)
      }
    } else {
      files.foreach { f =>
        ArrivalsUtil.renameOne(fs, f.path, opts.fileSuffix) match {
          case Left(err) =>
            renameFailures.incrementAndGet()
            throw new IllegalStateException(err)
          case Right(r) => if (r) filesRenamed.incrementAndGet()
        }
      }
    }
  }

  override def stop(): Unit = ()
}

final case class ArrivalsPartition(files: Seq[FileMeta], charset: String, timeZone: String)
  extends InputPartition

class ArrivalsPartitionReader(p: ArrivalsPartition) extends PartitionReader[InternalRow] {
  // Non-padded H:m:s (ref CephFSEventReader.java:230-235) rendered in the
  // configured zone. The default (UTC) matches the harness session
  // timezone, so `body` ≡ concat_ws over the typed columns; setting
  // timeZone to the ingest host's zone reproduces the reference's
  // default-zone Calendar rendering byte-for-byte.
  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd H:m:s")
    .withZone(java.time.ZoneId.of(p.timeZone))
  private val cs = Charset.forName(p.charset)
  private val it = p.files.iterator
  private var cur: FileMeta = _
  override def next(): Boolean = { if (it.hasNext) { cur = it.next(); true } else false }
  override def get(): InternalRow = {
    // body keeps the reference's CSV byte-for-byte (scheme-less absolute
    // path, CephFSEventReader.java:89-94); the TYPED file_path column is
    // the fully-qualified URI so spark.read works on any filesystem
    val refPath = new Path(cur.path).toUri.getPath
    val body = s"${cur.name},$refPath,${fmt.format(Instant.ofEpochMilli(cur.mtimeMs))}"
    InternalRow(
      UTF8String.fromString(cur.name),
      UTF8String.fromString(cur.path),
      cur.mtimeMs * 1000L, // TimestampType micros
      body.getBytes(cs))
  }
  override def close(): Unit = ()
}
