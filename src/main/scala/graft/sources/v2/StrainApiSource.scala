package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's per-key REST fetch
  * loop (SURVEY.md S2: `num = 1..41` GETs, `Scraper.py:218-233,
  * 286-294`) — the production-shaped form of the JSON-fixture
  * stand-ins.
  *
  * The driver plans one `InputPartition` per key RANGE
  * (`keysPerPartition`), so fetch parallelism — and therefore the
  * concurrent-request pressure on a rate-limited API — is an explicit
  * plan-time knob, and each executor-side `PartitionReader` "fetches"
  * only its own key range (at 100 TB: millions of keys, bounded
  * connections per partition, retries local to a partition).
  *
  * Zero-egress build: the reader synthesizes the API payload
  * deterministically from the key — the same record shape
  * `{"id", "race", "flavors": [...]}` as `JsonSources.strainSchema` —
  * so the connector machinery (TableProvider → ScanBuilder → Batch →
  * InputPartition → PartitionReader) is fully real and
  * oracle-checkable while the network call is the only stub. Swapping
  * `StrainApiTable.payload` for an HTTP GET is the entire production
  * diff.
  */
class StrainApiSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StrainApiTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // getTable receives the case-SENSITIVE option map — normalize
    val opts = new CaseInsensitiveStringMap(properties)
    new StrainApiTable(
      opts.getOrDefault("keys", "41").toInt,
      opts.getOrDefault("keysperpartition", "8").toInt)
  }
}

object StrainApiTable {
  val schema: StructType = StructType(Seq(
    StructField("num", IntegerType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** Deterministic stand-in for `GET /strain/{num}` — record-shaped
    * JSON derived from the key alone (so a DuckDB oracle can derive
    * the same rows from `range()`). */
  def payload(k: Int): String = {
    val nFlavors = k % 3 + 1
    val flavors = (1 to nFlavors)
      .map(i => s""""flavor_${(k * 7 + i) % 11}"""").mkString(",")
    s"""{"id": $k, "race": "R${k % 5}", "flavors": [$flavors]}"""
  }
}

class StrainApiTable(keys: Int, keysPerPartition: Int)
    extends Table with SupportsRead {
  override def name(): String = s"strain_api($keys)"
  override def schema(): StructType = StrainApiTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = StrainApiTable.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        (1 to keys by keysPerPartition).map { lo =>
          KeyRangePartition(lo, math.min(lo + keysPerPartition - 1, keys))
            : InputPartition
        }.toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new StrainApiReaderFactory
    }
}

/** A contiguous key range = one simulated fetch batch. */
case class KeyRangePartition(lo: Int, hi: Int) extends InputPartition

class StrainApiReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val kr = p.asInstanceOf[KeyRangePartition]
    new PartitionReader[InternalRow] {
      private var k = kr.lo - 1
      override def next(): Boolean = { k += 1; k <= kr.hi }
      override def get(): InternalRow =
        InternalRow(k, UTF8String.fromString(StrainApiTable.payload(k)))
      override def close(): Unit = ()
    }
  }
}
