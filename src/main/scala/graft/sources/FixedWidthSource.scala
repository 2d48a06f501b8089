package graft.sources

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSourceV2 reader for fixed-width text records (the mainframe/TMS
  * extract format the reference's claims domain ships alongside CSV —
  * config.py's tables are delimited here, but fixed-width is the other
  * standard delivery for the same feeds).
  *
  * This is the §2.1 source-format tier exercised through Spark's REAL
  * connector API, not a parse-in-a-projection shortcut:
  *  - `TableProvider` → `Table` → `ScanBuilder` with
  *    `SupportsPushDownRequiredColumns`: column pruning reaches the
  *    PARSER — an unreferenced field's byte range is never sliced or
  *    cast (the DSv2 equivalent of parquet's ReadSchema pruning).
  *  - `SupportsPushDownFilters`: comparison/null filters on any field
  *    are accepted into the scan and evaluated DURING the row parse, so
  *    non-matching records die before reaching Spark — and are reported
  *    back to the optimizer as pushed (visible in the physical plan's
  *    `PushedFilters`). Unsupported predicates stay residual and Spark
  *    re-applies them above the scan, so correctness never depends on
  *    the pushdown.
  *  - one `InputPartition` per file: split parallelism follows the
  *    delivery's file layout (Hadoop `FileSystem`, so the same code
  *    reads file://, hdfs:// or object stores).
  *
  * Field spec (option `fields`): `name:width:type,...` — types `long`,
  * `double`, `string` (strings are space-trimmed; numerics are
  * zero-padded by the writer). Widths are sequential; offsets derive
  * from the spec, so the schema IS the layout.
  */
class FixedWidthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FixedWidth.schemaOf(FixedWidth.parseFields(options.get("fields")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FwTable(properties.get("path"), properties.get("fields"))

  override def supportsExternalMetadata(): Boolean = false
}

object FixedWidth {
  final case class Field(name: String, width: Int, tpe: String, start: Int)

  def parseFields(spec: String): Seq[Field] = {
    var off = 0
    spec.split(",").toSeq.map { f =>
      val Array(name, w, t) = f.trim.split(":")
      val fld = Field(name, w.toInt, t, off)
      off += w.toInt
      fld
    }
  }

  def schemaOf(fields: Seq[Field]): StructType =
    StructType(fields.map(f => StructField(f.name, f.tpe match {
      case "long" => LongType
      case "double" => DoubleType
      case _ => StringType
    }, nullable = true)))

  /** Parse one field's slice of a record to its external value (null on
    * blank — fixed-width's NULL convention). */
  def parse(line: String, f: Field): Any = {
    val raw = line.substring(f.start, math.min(f.start + f.width, line.length)).trim
    if (raw.isEmpty) null
    else f.tpe match {
      case "long" => raw.toLong
      case "double" => raw.toDouble
      case _ => raw
    }
  }

  /** Compile one v1 source filter to a predicate over parsed values; None
    * if the filter shape is not supported (stays residual in Spark). */
  def compile(fields: Seq[Field], flt: Filter): Option[(String, Any => Boolean)] = {
    def cmp(a: Any, b: Any): Int = (a, b) match {
      case (x: Long, y: Number) => java.lang.Long.compare(x, y.longValue())
      case (x: Double, y: Number) => java.lang.Double.compare(x, y.doubleValue())
      case (x: String, y: String) => x.compareTo(y)
      case _ => throw new IllegalArgumentException(s"uncomparable $a vs $b")
    }
    val names = fields.map(_.name).toSet
    flt match {
      case EqualTo(a, v) if names(a) => Some((a, x => x != null && cmp(x, v) == 0))
      case GreaterThan(a, v) if names(a) => Some((a, x => x != null && cmp(x, v) > 0))
      case GreaterThanOrEqual(a, v) if names(a) => Some((a, x => x != null && cmp(x, v) >= 0))
      case LessThan(a, v) if names(a) => Some((a, x => x != null && cmp(x, v) < 0))
      case LessThanOrEqual(a, v) if names(a) => Some((a, x => x != null && cmp(x, v) <= 0))
      case IsNotNull(a) if names(a) => Some((a, x => x != null))
      case IsNull(a) if names(a) => Some((a, x => x == null))
      case _ => None
    }
  }
}

class FwTable(path: String, fieldSpec: String) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  private val fields = FixedWidth.parseFields(fieldSpec)
  override def name(): String = s"fixed_width($path)"
  override def schema(): StructType = FixedWidth.schemaOf(fields)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FwScanBuilder(path, fields)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new FwWriteBuilder(path, fields, info.schema())
}

class FwScanBuilder(path: String, fields: Seq[FixedWidth.Field])
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = FixedWidth.schemaOf(fields)
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) =
      filters.partition(f => FixedWidth.compile(fields, f).isDefined)
    pushed = supported
    residual // Spark re-applies these above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new FwScan(path, fields, required, pushed)
}

class FwScan(path: String, fields: Seq[FixedWidth.Field],
    required: StructType, pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"FixedWidthScan path=$path, ReadFields=[${required.fieldNames.mkString(",")}], " +
      s"PushedFixedWidthFilters=[${pushed.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
          .map(_.getPath.toString).sorted
      else Array(path)
    files.map(f => FwPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FwReaderFactory(fields, required.fieldNames, pushed)
}

final case class FwPartition(file: String) extends InputPartition

class FwReaderFactory(fields: Seq[FixedWidth.Field], required: Array[String],
    pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[FwPartition].file
    new PartitionReader[InternalRow] {
      private val preds = pushed.flatMap(FixedWidth.compile(fields, _))
      // parse the union of output fields and pushed-filter fields; slice
      // NOTHING else — pruning reaches the parser
      private val needed: Seq[FixedWidth.Field] = {
        val names = (required ++ preds.map(_._1)).toSet
        fields.filter(f => names(f.name))
      }
      private val byName = needed.map(f => f.name -> f).toMap
      private val p = new Path(file)
      private val in = p.getFileSystem(new Configuration()).open(p)
      private val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
      private var row: InternalRow = _

      override def next(): Boolean = {
        var line = reader.readLine()
        while (line != null) {
          if (line.nonEmpty) {
            val vals = needed.map(f => f.name -> FixedWidth.parse(line, f)).toMap
            if (preds.forall { case (n, p) => p(vals(n)) }) {
              row = InternalRow.fromSeq(required.toSeq.map { n =>
                vals(n) match {
                  case s: String => UTF8String.fromString(s)
                  case v => v
                }
              })
              return true
            }
          }
          line = reader.readLine()
        }
        false
      }

      override def get(): InternalRow = row
      override def close(): Unit = reader.close()
    }
  }
}

// ---------------------------------------------------------------------------
// Write path — the DSv2 two-phase commit protocol for the same layout.
//
// Each task writes its partition to a UUID-named temp file and reports the
// name in its commit message; the DRIVER's commit() renames the complete
// set into place and abort() deletes strays — so a failed/speculative task
// can never leave a half-visible file (the same task-attempt isolation
// contract as Spark's FileFormatWriter, expressed through the public
// connector API). TRUNCATE capability maps mode("overwrite") to "clear the
// directory in commit", keeping even overwrites atomic-per-job.
// ---------------------------------------------------------------------------

import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}

class FwWriteBuilder(path: String, fields: Seq[FixedWidth.Field],
    schema: StructType) extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new FwBatchWrite(path, fields, schema, truncateFirst)
  }
}

final case class FwCommit(tempFile: String) extends WriterCommitMessage

class FwBatchWrite(path: String, fields: Seq[FixedWidth.Field],
    schema: StructType, truncateFirst: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    require(schema.fieldNames.sameElements(fields.map(_.name)),
      s"write schema ${schema.fieldNames.mkString(",")} must match the fixed-width layout")
    new FwWriterFactory(path, fields)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new Configuration())
    if (truncateFirst && fs.exists(dir))
      fs.listStatus(dir).filter(_.isFile).foreach(s => fs.delete(s.getPath, false))
    fs.mkdirs(dir)
    messages.zipWithIndex.foreach { case (m, i) =>
      val tmp = new Path(m.asInstanceOf[FwCommit].tempFile)
      fs.rename(tmp, new Path(dir, f"part-$i%05d.fw"))
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(new Configuration())
    messages.filter(_ != null).foreach { m =>
      fs.delete(new Path(m.asInstanceOf[FwCommit].tempFile), false)
    }
  }
}

class FwWriterFactory(path: String, fields: Seq[FixedWidth.Field])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val tmp = new Path(path + "_tmp",
        s"task-$partitionId-$taskId-${java.util.UUID.randomUUID()}.fw")
      private val fs = tmp.getFileSystem(new Configuration())
      private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        fs.create(tmp, true), java.nio.charset.StandardCharsets.UTF_8))

      override def write(row: InternalRow): Unit = {
        val sb = new StringBuilder
        fields.zipWithIndex.foreach { case (f, i) =>
          val s = f.tpe match {
            case "long" => row.getLong(i).toString.reverse.padTo(f.width, '0').reverse.toString
            case "double" => row.getDouble(i).toString.reverse.padTo(f.width, '0').reverse.toString
            case _ => row.getUTF8String(i).toString.padTo(f.width, ' ').toString
          }
          require(s.length == f.width, s"value '$s' overflows field ${f.name}(${f.width})")
          sb.append(s)
        }
        out.write(sb.toString); out.newLine()
      }

      override def commit(): WriterCommitMessage = { out.close(); FwCommit(tmp.toString) }
      override def abort(): Unit = { out.close(); fs.delete(tmp, false) }
      override def close(): Unit = ()
    }
}
