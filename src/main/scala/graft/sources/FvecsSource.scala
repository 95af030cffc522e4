package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.io.{BufferedOutputStream, DataOutputStream, EOFException}
import java.nio.{ByteBuffer, ByteOrder}
import java.util

/** DataSource V2 reader for `.fvecs` vector files — the de-facto
  * interchange format of the ANN-benchmark world (TexMex/SIFT corpora):
  * each record is a little-endian int32 dimension followed by that many
  * float32 values. An embedding pipeline meets these files at its
  * boundary with training/eval tooling, and Spark has no native reader.
  *
  * This is the level-(c) extension point from the build's preference
  * ladder, applied to a SOURCE: a whole-format reader that the built-in
  * sources genuinely cannot express (binaryFile hands back one blob per
  * FILE — no record structure, no splitting).
  *
  * Scale design: with a constant per-file dimension the record size is
  * constant, so byte ranges align to record boundaries and every file
  * SPLITS into `nSplits` independent partitions — a 100 GB fvecs file
  * fans out across executors like parquet row groups, each reader
  * seeking straight to its first record. `vec_id` is the global record
  * index (files ordered by name, cumulative record counts), so ids are
  * stable regardless of the split plan.
  */
class FvecsDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-fvecs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FvecsSchema.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FvecsTable(properties.get("path"))
}

private[sources] object FvecsSchema {
  val schema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
}

private[sources] class FvecsTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft-fvecs requires a load path")
  override def name(): String = s"fvecs:$path"
  override def schema(): StructType = FvecsSchema.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new FvecsScan(path, options.getInt("nSplits", 4))
    }
}

private[sources] class FvecsScan(path: String, nSplits: Int) extends Scan with Batch {
  override def readSchema(): StructType = FvecsSchema.schema
  override def toBatch: Batch = this

  /** Plan: list files (name order = id order), probe each file's dim
    * from its first 4 bytes, then carve whole-record byte ranges. This
    * runs on the driver once per query — a metadata-scale pass, like
    * parquet footer reads.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).filter(s => s.isFile && s.getPath.getName.endsWith(".fvecs"))
          .sortBy(_.getPath.getName)
      else Array(fs.getFileStatus(root))
    var baseId = 0L
    files.flatMap { st =>
      val in = fs.open(st.getPath)
      val dim = try {
        val b = new Array[Byte](4)
        in.readFully(0L, b)
        ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
      } finally in.close()
      require(dim > 0, s"${st.getPath}: non-positive leading dim $dim")
      val recordSize = 4L + 4L * dim
      require(st.getLen % recordSize == 0,
        s"${st.getPath}: length ${st.getLen} not a multiple of record size $recordSize")
      val nRecords = st.getLen / recordSize
      val fileBase = baseId
      baseId += nRecords
      val per = math.max(1L, (nRecords + nSplits - 1) / nSplits)
      (0L until nRecords by per).map { start =>
        val end = math.min(start + per, nRecords)
        FvecsPartition(st.getPath.toString, dim, start, end, fileBase + start)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new FvecsPartitionReader(partition.asInstanceOf[FvecsPartition])
}

private[sources] case class FvecsPartition(
    path: String, dim: Int, startRec: Long, endRec: Long, baseId: Long)
  extends InputPartition

/** Executor-side reader: seek to the first owned record, stream whole
  * records forward. Only path/offsets cross the wire (the partition is
  * a small case class); the Hadoop FS is re-opened locally.
  */
private[sources] class FvecsPartitionReader(p: FvecsPartition)
  extends PartitionReader[InternalRow] {
  private val recordSize = 4 + 4 * p.dim
  private val fs = new Path(p.path).getFileSystem(new Configuration())
  private val in = fs.open(new Path(p.path))
  in.seek(p.startRec * recordSize)
  private val buf = new Array[Byte](recordSize)
  private var rec = p.startRec
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (rec >= p.endRec) return false
    try in.readFully(buf, 0, recordSize)
    catch { case _: EOFException =>
      throw new IllegalStateException(s"${p.path}: truncated record at $rec")
    }
    val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
    val d = bb.getInt
    require(d == p.dim, s"${p.path}: record $rec has dim $d, expected ${p.dim}")
    val floats = new Array[Float](d)
    bb.asFloatBuffer().get(floats)
    current = new GenericInternalRow(Array[Any](
      p.baseId + (rec - p.startRec),
      UnsafeArrayData.fromPrimitiveArray(floats)))
    rec += 1
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

/** Distributed fvecs writer: range-partition by id + sort within, then
  * every partition streams its records to `part-NNNNN.fvecs` (names
  * sort in partition order, so read-back ids reproduce the global id
  * order). No driver materialization at any size.
  */
object FvecsIO {
  def write(df: DataFrame, outDir: String, nFiles: Int = 4): Unit = {
    val conf = new Configuration()
    new Path(outDir).getFileSystem(conf).mkdirs(new Path(outDir))
    df.select(col("vec_id"), col("embedding"))
      .repartitionByRange(nFiles, col("vec_id"))
      .sortWithinPartitions("vec_id")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.nonEmpty) {
          val pid = TaskContext.getPartitionId()
          val path = new Path(f"$outDir/part-$pid%05d.fvecs")
          val out = new DataOutputStream(new BufferedOutputStream(
            path.getFileSystem(new Configuration()).create(path, true)))
          try rows.foreach { r =>
            val v = r.getSeq[Float](1)
            val bb = ByteBuffer.allocate(4 + 4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
            bb.putInt(v.length)
            v.foreach(bb.putFloat)
            out.write(bb.array())
          } finally out.close()
        }
      }
  }
}
