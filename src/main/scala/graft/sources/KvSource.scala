package graft.sources

import java.util
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage, SupportsTruncate}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `graftkv` — the WRITE side of the DSv2 story (q26/SeqSource is the
  * read connector; this one implements the full batch COMMIT PROTOCOL a
  * real sink must get right): a trivially-simple storage format (one
  * `k\tv` line per row, files named `part-<partition>.gkv`) so that every
  * byte is attributable to the protocol, not the codec.
  *
  * The protocol surface, exactly as Spark drives it on a 1000-executor
  * cluster:
  *  - [[WriteBuilder]] (+ [[SupportsTruncate]] so `mode("overwrite")`
  *    works) → [[BatchWrite]] → a serializable [[DataWriterFactory]]
  *    shipped to executors;
  *  - each task's [[DataWriter]] streams rows to a STAGED file
  *    (`_staged-p<partition>-<uuid>`) — never the final name — and its
  *    `commit()` returns a [[WriterCommitMessage]] carrying the staged
  *    path; `abort()` deletes the staging, so a failed/speculative task
  *    leaves no trace;
  *  - the driver's `BatchWrite.commit` PUBLISHES atomically: only
  *    messages from the one committed attempt per partition are renamed
  *    to `part-<partition>.gkv` (truncate deletes prior parts first);
  *    `BatchWrite.abort` deletes the stragglers. Readers only ever list
  *    `part-*.gkv`, so a concurrent reader sees the old table or the new
  *    one, never a torn mix — the same visibility contract as a Hive/
  *    Iceberg-style rename commit.
  *
  * Read support is included so q27 can prove the ROUNDTRIP: one input
  * partition per part file — the file is this format's unit of read
  * parallelism (like an ORC stripe set or an unsplittable-codec text
  * file), so write-side partitioning decides read-side parallelism; a
  * production evolution would add row-group framing for sub-file splits.
  * Schema is fixed `(k BIGINT, v BIGINT)`. All file I/O goes through the
  * Hadoop FileSystem API, so the same connector runs against HDFS/S3A
  * paths, not just local disk.
  */
class KvSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "graftkv requires option 'path'")
    new KvTable(path)
  }
}

object KvSource {
  val schema: StructType = new StructType()
    .add("k", LongType, nullable = false)
    .add("v", LongType, nullable = false)

  private[sources] def fs(path: String): FileSystem =
    new Path(path).getFileSystem(new Configuration())

  private[sources] def partFiles(path: String): Seq[Path] = {
    val f = fs(path)
    val dir = new Path(path)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".gkv"))
      .sortBy(_.getName)
  }
}

private class KvTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graftkv($path)"
  override def schema(): StructType = KvSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new KvScan(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    require(s.fields.length == 2 && s.fields.forall(_.dataType == LongType),
      s"graftkv writes exactly (BIGINT, BIGINT), got ${s.simpleString}")
    new KvWriteBuilder(path, truncate = false)
  }
}

private class KvWriteBuilder(path: String, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder = new KvWriteBuilder(path, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new KvBatchWrite(path, truncate)
  }
}

private[graft] case class KvCommit(staged: String, partition: Int, rows: Long)
  extends WriterCommitMessage

private class KvBatchWrite(path: String, truncate: Boolean) extends BatchWrite {
  // one id per WRITE JOB — final names are unique across jobs, so append
  // never collides with an earlier job's parts (the real-connector naming
  // contract); re-commit of THIS job stays idempotent via delete+rename
  private val jobId = UUID.randomUUID().toString.take(8)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KvWriterFactory(path)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = KvSource.fs(path)
    if (truncate) KvSource.partFiles(path).foreach(p => f.delete(p, false))
    messages.map(_.asInstanceOf[KvCommit]).sortBy(_.partition).foreach { m =>
      val fin = new Path(path, f"part-$jobId%s-${m.partition}%05d.gkv")
      f.delete(fin, false)                      // idempotent re-commit
      require(f.rename(new Path(m.staged), fin),
        s"graftkv commit: rename ${m.staged} -> $fin failed")
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = KvSource.fs(path)
    messages.collect { case m: KvCommit => f.delete(new Path(m.staged), false) }
  }
}

private class KvWriterFactory(path: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvWriter(path, partitionId)
}

private[graft] class KvWriter(path: String, partitionId: Int) extends DataWriter[InternalRow] {
  private val staged = new Path(path,
    s"_staged-p$partitionId-${UUID.randomUUID().toString}")
  private val f = KvSource.fs(path)
  private lazy val out = {
    f.mkdirs(new Path(path))
    f.create(staged, true)
  }
  private var rows = 0L
  override def write(r: InternalRow): Unit = {
    out.write(s"${r.getLong(0)}\t${r.getLong(1)}\n".getBytes("UTF-8"))
    rows += 1L
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    KvCommit(staged.toString, partitionId, rows)
  }
  override def abort(): Unit = {
    try out.close() catch { case _: Throwable => () }
    f.delete(staged, false)
  }
  override def close(): Unit = ()
}

private class KvScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = KvSource.schema
  override def toBatch: Batch = this
  override def description(): String = s"graftkv $path"
  override def planInputPartitions(): Array[InputPartition] =
    KvSource.partFiles(path).map(p => KvFilePartition(p.toString): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => new KvFileReader(p.asInstanceOf[KvFilePartition].file)
}

private case class KvFilePartition(file: String) extends InputPartition

private class KvFileReader(file: String) extends PartitionReader[InternalRow] {
  private val in = new java.io.BufferedReader(new java.io.InputStreamReader(
    KvSource.fs(file).open(new Path(file)), "UTF-8"))
  private var line: String = _
  override def next(): Boolean = { line = in.readLine(); line != null }
  override def get(): InternalRow = {
    val t = line.indexOf('\t')
    InternalRow(line.substring(0, t).toLong, line.substring(t + 1).toLong)
  }
  override def close(): Unit = in.close()
}
