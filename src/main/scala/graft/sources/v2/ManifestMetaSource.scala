package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.ManifestTable

/** A custom DataSourceV2 connector serving a [[ManifestTable]]'s
  * METADATA as a queryable table — the `_delta_log`-introspection idea
  * (`DESCRIBE HISTORY` / files tables) for the manifest format:
  *
  * {{{
  *   spark.read.format("graft-manifest-meta")
  *     .option("path", tableDir).load()
  *   // version | file | stats_column | stats_min | stats_max
  * }}}
  *
  * Why a V2 source and not a helper returning a DataFrame: the
  * connector surface makes the metadata a real TABLE — usable from
  * pure SQL sessions, joinable against the data, cacheable — and
  * exercises the full provider → table → scan → batch → reader
  * contract the engine's storage layer sits on.
  *
  * Planning shape, deliberately metadata-table-like: manifests are
  * driver-readable text (KBs even for 40k-file tables at 100 TB), so
  * entries parse ONCE at scan planning and ship inside the
  * InputPartitions — one partition PER VERSION, so a big history still
  * parallelizes across the cluster while executors never re-list the
  * filesystem. Rows are built as InternalRow directly (no Row→encoder
  * round trip). */
final class ManifestMetaSource extends TableProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-manifest-meta"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ManifestMetaSource.Schema

  override def getTable(schema: StructType,
                        partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-manifest-meta requires .option(\"path\", <tableDir>)"))
    new ManifestMetaTable(path)
  }
}

object ManifestMetaSource {
  val Schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("stats_column", StringType, nullable = true),
    StructField("stats_min", LongType, nullable = true),
    StructField("stats_max", LongType, nullable = true)))
}

private final class ManifestMetaTable(path: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft_manifest_meta($path)"
  override def schema(): StructType = ManifestMetaSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
  : ScanBuilder = new ManifestMetaScan(path)
}

/** One row as plain serializable values (null stats = no-stats line). */
private final case class MetaRow(version: Long, file: String,
                                 statsCol: String, min: Long, max: Long,
                                 hasStats: Boolean)

private final case class VersionPartition(rows: Array[MetaRow])
  extends InputPartition

/** Shared reader for [[VersionPartition]]s — the batch scan and the
  * CDC micro-batch stream emit the same row shape. */
private object MetaRowReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
  : PartitionReader[InternalRow] = {
    val rows = p.asInstanceOf[VersionPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val r = rows(i)
        InternalRow(r.version, UTF8String.fromString(r.file),
          if (r.hasStats) UTF8String.fromString(r.statsCol) else null,
          if (r.hasStats) r.min else null,
          if (r.hasStats) r.max else null)
      }
      override def close(): Unit = ()
    }
  }
}

private final class ManifestMetaScan(path: String)
    extends ScanBuilder with Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}

  override def build(): Scan = this
  override def readSchema(): StructType = ManifestMetaSource.Schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-manifest-meta $path version∈[$lo,$hi]"

  // version-bound pushdown: PRUNES whole per-version partitions at
  // planning. Coarse-and-safe contract: every filter is ALSO returned
  // as residual, so Spark re-applies exact semantics post-scan and a
  // bound bug can only over-read, never wrong-read.
  private var lo = Long.MinValue
  private var hi = Long.MaxValue
  private var accepted: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.flatMap {
      case f @ EqualTo("version", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v); Some(f)
      case f @ GreaterThan("version", v: Long) =>
        lo = math.max(lo, v + 1); Some(f)
      case f @ GreaterThanOrEqual("version", v: Long) =>
        lo = math.max(lo, v); Some(f)
      case f @ LessThan("version", v: Long) =>
        hi = math.min(hi, v - 1); Some(f)
      case f @ LessThanOrEqual("version", v: Long) =>
        hi = math.min(hi, v); Some(f)
      case _ => None
    }
    filters // all residual: exactness stays Spark's job
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def planInputPartitions(): Array[InputPartition] =
    ManifestTable.allEntries(SparkSession.active, path)
      .groupBy(_._1).toSeq.sortBy(_._1)
      .filter { case (v, _) => v >= lo && v <= hi }
      .map { case (_, entries) =>
        VersionPartition(entries.map { case (v, f, st) =>
          MetaRow(v, f, st.map(_._1).orNull,
            st.map(_._2).getOrElse(0L), st.map(_._3).getOrElse(0L),
            st.isDefined)
        }.toArray): InputPartition
      }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    MetaRowReaderFactory
}
