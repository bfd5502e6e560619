package graft.sources.v2

import graft.sources.{BlockConfig, BlockField, BlockText, NBody6}
import java.util
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** NBODY6 block text as a REGISTERED Spark data source (DataSource V2):
  *
  * {{{
  *   spark.read.format("nbody6")
  *     .option("format", "out34")       // out34|out9|fort82|fort83|fort19|denscentre
  *     .option("table", "rows")         // rows (default) | headers
  *     .load(simGlob)                   // e.g. "/surveys/&#42;/OUT34"
  * }}}
  *
  * The imperative reader (sources/BlockText.read) already parallelizes
  * by file; the V2 wrapper adds what a *library user* expects of a
  * first-class format: discovery through the standard reader API, a
  * schema visible to Catalyst before any job runs, and COLUMN PRUNING
  * pushed into the parse (SupportsPushDownRequiredColumns — a
  * projection of 2 columns tokenizes every line but converts only 2
  * fields, and the scan's ReadSchema shows exactly that). One
  * InputPartition per file, so block boundaries never straddle a
  * split; `sim_id` is the parent directory, duplicate block
  * timestamps resolve last-wins exactly like the imperative path
  * (reference parser behavior: src/nbody6/parser/base.py:215-229).
  */
class Nbody6DataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "nbody6"

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (cfg, headers) = Nbody6DataSource.resolve(options)
    Nbody6DataSource.schemaFor(cfg, headers)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val (cfg, headers) = Nbody6DataSource.resolve(options)
    new Nbody6Table(cfg, headers, options.get("path"))
  }
}

object Nbody6DataSource {
  val FORMATS: Map[String, BlockConfig] = Map(
    "out34" -> NBody6.OUT34, "out9" -> NBody6.OUT9,
    "fort82" -> NBody6.FORT82, "fort83" -> NBody6.FORT83,
    "fort19" -> NBody6.FORT19, "denscentre" -> NBody6.DENS_CENTRE)

  def resolve(options: CaseInsensitiveStringMap): (BlockConfig, Boolean) = {
    val fmt = Option(options.get("format")).getOrElse("out34").toLowerCase
    val cfg = FORMATS.getOrElse(fmt, throw new IllegalArgumentException(
      s"unknown nbody6 format '$fmt' (expected one of ${FORMATS.keys.mkString(", ")})"))
    val table = Option(options.get("table")).getOrElse("rows").toLowerCase
    (cfg, table == "headers")
  }

  private def sparkType(kind: String): DataType = kind match {
    case "double" => DoubleType
    case "long" => LongType
    case "vec" => ArrayType(DoubleType, containsNull = false)
  }

  /** sim_id + time + the format's header or data fields — identical
    * to the imperative reader's frames.
    */
  def schemaFor(cfg: BlockConfig, headers: Boolean): StructType = {
    val fields =
      if (headers) cfg.header.filter(_.name != "time")
      else cfg.data
    StructType(
      StructField("sim_id", StringType) :: StructField("time", DoubleType) ::
        fields.map(f => StructField(f.name, sparkType(f.kind))).toList)
  }
}

class Nbody6Table(cfg: BlockConfig, headers: Boolean, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"nbody6($path)"
  override def schema(): StructType = Nbody6DataSource.schemaFor(cfg, headers)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new Nbody6ScanBuilder(cfg, headers, path, schema())
}

class Nbody6ScanBuilder(cfg: BlockConfig, headers: Boolean, path: String,
    full: StructType) extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the source's field order; Catalyst may hand fields in
    // projection order
    required = StructType(full.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new Nbody6Scan(cfg, headers, path, required)
}

/** One InputPartition per file. */
final case class Nbody6FilePartition(file: String) extends InputPartition

class Nbody6Scan(cfg: BlockConfig, headers: Boolean, path: String,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"nbody6 $path ReadSchema: ${required.fieldNames.mkString(",")}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf)
    val matched = Option(fs.globStatus(p)).getOrElse(Array.empty)
    matched.filter(_.isFile)
      .map(s => Nbody6FilePartition(s.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new Nbody6ReaderFactory(cfg, headers, required.fieldNames)
}

class Nbody6ReaderFactory(cfg: BlockConfig, headers: Boolean,
    requiredNames: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new Nbody6PartitionReader(
      partition.asInstanceOf[Nbody6FilePartition].file, cfg, headers,
      requiredNames)
}

class Nbody6PartitionReader(file: String, cfg: BlockConfig, headers: Boolean,
    requiredNames: Array[String]) extends PartitionReader[InternalRow] {

  private val simId = file.stripSuffix("/").split('/')
    .dropRight(1).lastOption.getOrElse("sim")

  private def convert(tokens: Array[String], f: BlockField): Any = f.kind match {
    case "double" => tokens(f.indices.head).toDouble
    case "long" => tokens(f.indices.head).toDouble.toLong
    case "vec" =>
      ArrayData.toArrayData(f.indices.map(i => tokens(i).toDouble).toArray)
  }

  private def blockTime(h: Array[String]): Double =
    math.rint(cfg.header.find(_.name == "time")
      .map(f => f.indices.head).map(i => h(i).toDouble).getOrElse(0.0) * 100) / 100

  // parsed lazily on first next(): one file = one block map; last
  // block per rounded time wins, mirroring BlockText.read
  private var it: Iterator[InternalRow] = _
  private var current: InternalRow = _

  private def ensureIt(): Unit = if (it == null) {
    val p = new Path(file)
    val fs = FileSystem.get(p.toUri, new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    val byTime = scala.collection.mutable
      .LinkedHashMap[Double, (Array[String], Seq[Array[String]])]()
    try {
      val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
        in, java.nio.charset.StandardCharsets.UTF_8))
      val lines = Iterator.continually(reader.readLine()).takeWhile(_ != null)
      BlockText.blockIter(lines, cfg).foreach(b => byTime(blockTime(b._1)) = b)
    } finally in.close()

    val fields =
      if (headers) cfg.header.filter(_.name != "time") else cfg.data
    val simUtf = UTF8String.fromString(simId)
    def build(time: Double, tokens: Array[String]): InternalRow = {
      val values = requiredNames.map {
        case "sim_id" => simUtf
        case "time" => time
        case n => convert(tokens, fields.find(_.name == n).get)
      }
      InternalRow.fromSeq(values.toIndexedSeq)
    }
    it =
      if (headers)
        byTime.iterator.map { case (t, (h, _)) => build(t, h) }
      else
        byTime.iterator.flatMap { case (t, (_, rs)) => rs.map(build(t, _)) }
  }

  override def next(): Boolean = {
    ensureIt()
    if (it.hasNext) { current = it.next(); true } else false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
