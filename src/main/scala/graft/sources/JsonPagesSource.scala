package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for paginated-REST-style JSON pages — the
  * at-scale form of the reference's ArcGIS ingest loop (cv-api.py:47-99,
  * SURVEY.md §2.1 S2). Each page body (one `{"features":[{"attributes":
  * {...}}]}` document, as the reference's fetcher would spool to storage)
  * becomes one `InputPartition`, so a 10k-page spool reads with 10k-way
  * parallelism instead of the reference's sequential 2s-per-page loop.
  *
  * Implements the two pushdowns the reference performed server-side:
  *  - `SupportsPushDownRequiredColumns` ≡ ArcGIS `outFields` — only the
  *    pruned attributes are materialized into rows;
  *  - `SupportsPushDownFilters` ≡ ArcGIS `where` — equality / comparison /
  *    starts-with (and NOT thereof) evaluate inside the reader, before
  *    rows reach Spark.
  *
  * Registered as `spark.read.format("jsonpages").load(dir)` via
  * DataSourceRegister (META-INF/services).
  */
class JsonPagesDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "jsonpages"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JsonPages.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new JsonPagesTable(properties.get("path"))
}

object JsonPages {
  /** The ArcGIS attribute shape (cv-api.py:107-120). */
  val schema: StructType = StructType(Seq(
    StructField("ObjectId", IntegerType),
    StructField("County", StringType),
    StructField("Age", StringType),
    StructField("Gender", StringType),
    StructField("Travel_related", StringType),
    StructField("Origin", StringType),
    StructField("Contact", StringType),
    StructField("Case_", StringType),
    StructField("Case1", LongType),
    StructField("Died", StringType),
    StructField("Hospitalized", StringType),
    StructField("EDvisit", StringType)))

  /** Source-side filter evaluation over the parsed attribute node.
    * Supported shapes mirror what the reference pushed into ArcGIS.
    */
  /** Exact numeric compare via BigDecimal — `longValue()` would truncate
    * fractional page values (1.5 > 1 becomes 1 > 1) and overflow-wrap
    * beyond Long range.
    */
  private def cmp(n: Number, v: Number): Int =
    new java.math.BigDecimal(n.toString)
      .compareTo(new java.math.BigDecimal(v.toString))

  def eval(f: Filter, get: String => Any): Boolean = f match {
    case EqualTo(a, v) => get(a) == v
    case GreaterThan(a, v: Number) => get(a) match {
      case n: Number => cmp(n, v) > 0
      case _ => false
    }
    case LessThan(a, v: Number) => get(a) match {
      case n: Number => cmp(n, v) < 0
      case _ => false
    }
    case IsNotNull(a) => get(a) != null
    case IsNull(a) => get(a) == null
    case StringStartsWith(a, p) => get(a) match {
      case s: String => s.startsWith(p)
      case _ => false
    }
    case Not(child) => !eval(child, get)
    case And(l, r) => eval(l, get) && eval(r, get)
    case Or(l, r) => eval(l, get) || eval(r, get)
    case _ => true // unreachable: pushFilters only accepts the above
  }

  def evaluable(f: Filter): Boolean = f match {
    case EqualTo(_, _: String) | EqualTo(_, _: Number) => true
    case GreaterThan(_, _: Number) | LessThan(_, _: Number) => true
    case IsNotNull(_) | IsNull(_) => true
    case StringStartsWith(_, _) => true
    case Not(c) => evaluable(c)
    case And(l, r) => evaluable(l) && evaluable(r)
    case Or(l, r) => evaluable(l) && evaluable(r)
    case _ => false
  }
}

class JsonPagesTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"jsonpages($path)"
  override def schema(): StructType = JsonPages.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonPagesScanBuilder(path)
}

class JsonPagesScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = JsonPages.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition(JsonPages.evaluable)
    pushed = ours
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new JsonPagesScan(path, required, pushed)
}

class JsonPagesScan(path: String, required: StructType,
                    filters: Array[Filter]) extends Scan with Batch {
  // Session hadoop conf captured at planning time (driver) and shipped to
  // readers serialized — a fresh `new Configuration()` would drop session
  // overrides (credentials, fs.* implementations) and break on object
  // stores where path access is configured per-session.
  private val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"jsonpages($path) pushed=[${filters.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf.value)
    fs.listStatus(p).filter(_.isFile).map(_.getPath.toString)
      .sorted.map(PagePartition(_): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonPagesReaderFactory(required, filters, hadoopConf)
}

case class PagePartition(file: String) extends InputPartition

class JsonPagesReaderFactory(required: StructType, filters: Array[Filter],
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new JsonPageReader(partition.asInstanceOf[PagePartition].file,
      required, filters, hadoopConf)
}

/** Parses one page document and streams its matching attribute rows. */
class JsonPageReader(file: String, required: StructType,
    filters: Array[Filter],
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val features: Iterator[JsonNode] = {
    val p = new Path(file)
    val fs: FileSystem = p.getFileSystem(hadoopConf.value)
    val in = fs.open(p)
    val root = try new ObjectMapper().readTree(in) finally in.close()
    val fs0 = root.get("features")
    if (fs0 == null) Iterator.empty else fs0.elements().asScala
  }

  private var current: InternalRow = _

  private def attrValue(attrs: JsonNode, name: String): Any = {
    val n = attrs.get(name)
    if (n == null || n.isNull) null
    else if (n.isNumber) n.numberValue()
    else n.asText()
  }

  override def next(): Boolean = {
    while (features.hasNext) {
      val attrs = features.next().get("attributes")
      if (attrs != null) {
        val get = (name: String) => attrValue(attrs, name)
        if (filters.forall(JsonPages.eval(_, get))) {
          current = InternalRow.fromSeq(required.fields.toSeq.map { f =>
            (attrValue(attrs, f.name), f.dataType) match {
              case (null, _) => null
              case (v: Number, IntegerType) => v.intValue()
              case (v: Number, LongType) => v.longValue()
              case (v: Number, _) => UTF8String.fromString(v.toString)
              case (v, _) => UTF8String.fromString(v.toString)
            }
          })
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
