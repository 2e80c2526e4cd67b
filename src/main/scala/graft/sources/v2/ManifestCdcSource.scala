package graft.sources.v2

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.ManifestTable

/** STREAMING change feed over a [[ManifestTable]] — "subscribe to the
  * table": a DataSourceV2 `MicroBatchStream` whose offset IS the
  * manifest version, emitting one row per file ADDED at each new
  * version (path + commit-time footer stats, the
  * [[ManifestMetaSource]] row shape):
  *
  * {{{
  *   spark.readStream.format("graft-manifest-cdc")
  *     .option("path", tableDir)
  *     .option("startingVersion", "0")   // emit versions > this
  *     .load()
  * }}}
  *
  * This is the Delta-streaming-source shape for the manifest format:
  * Structured Streaming's checkpoint persists the version offset, so
  * a restarted stream resumes exactly after the last committed
  * version — exactly-once delivery of commit events with ZERO source
  * state of our own. The feed is metadata-only by design (rows are
  * file paths + stats, never data): executors never re-list storage,
  * and incremental DATA ingest composes downstream as
  * `foreachBatch { spark.read.parquet(batch's files) }` — keeping the
  * heavy read on the scan path Spark already optimizes instead of
  * inside a hand-rolled reader.
  *
  * Semantics: additions only — new(v) = files(v) \ files(v−1), so an
  * overwrite/compaction emits its (re)written files and removals are
  * not represented (consumers needing removal tracking diff snapshots
  * via [[ManifestTable.read]]'s time travel). Planning runs on the
  * driver over the KB-scale manifests (the [[ManifestMetaSource]]
  * posture); each emitted version is one InputPartition, so a
  * catch-up batch spanning many versions parallelizes.
  */
final class ManifestCdcSource extends TableProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-manifest-cdc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ManifestMetaSource.Schema

  override def getTable(schema: StructType,
                        partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-manifest-cdc requires .option(\"path\", <tableDir>)"))
    val startingVersion =
      Option(properties.get("startingVersion")).map(_.toLong).getOrElse(0L)
    new ManifestCdcTable(path, startingVersion)
  }
}

private final class ManifestCdcTable(path: String, startingVersion: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_manifest_cdc($path)"
  override def schema(): StructType = ManifestMetaSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
  : ScanBuilder = new ManifestCdcScan(path, startingVersion)
}

private final class ManifestCdcScan(path: String, startingVersion: Long)
    extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = ManifestMetaSource.Schema
  override def description(): String =
    s"graft-manifest-cdc $path startingVersion=$startingVersion"
  override def toMicroBatchStream(checkpointLocation: String)
  : MicroBatchStream = new ManifestCdcStream(path, startingVersion)
}

/** The stream offset IS the manifest version — already a total order
  * with durable meaning, so checkpoint recovery needs no translation. */
private final case class VersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

private final class ManifestCdcStream(path: String, startingVersion: Long)
    extends MicroBatchStream {

  override def initialOffset(): Offset = VersionOffset(startingVersion)

  override def latestOffset(): Offset = {
    // latestVersion returns 0 for a not-yet-committed table, so an
    // empty table idles naturally; real IO failures (permissions,
    // corrupt listing) PROPAGATE — swallowing them would freeze the
    // feed silently, the worst failure mode a source can have.
    val head = ManifestTable.latestVersion(SparkSession.active, path)
    VersionOffset(math.max(head, startingVersion))
  }

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset)
  : Array[InputPartition] = {
    val lo = start.asInstanceOf[VersionOffset].v
    val hi = end.asInstanceOf[VersionOffset].v
    if (hi <= lo) return Array.empty
    val byVersion = ManifestTable
      .allEntries(SparkSession.active, path)
      .groupBy(_._1)
    (lo + 1 to hi).map { v =>
      val prev =
        if (v <= 1) Set.empty[String]
        else byVersion.getOrElse(v - 1, Nil).map(_._2).toSet
      val added = byVersion.getOrElse(v, Nil).filterNot(e => prev(e._2))
      VersionPartition(added.map { case (_, f, st) =>
        MetaRow(v, f, st.map(_._1).orNull,
          st.map(_._2).getOrElse(0L), st.map(_._3).getOrElse(0L),
          st.isDefined)
      }.toArray): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    MetaRowReaderFactory

  // The version offset is durable table state; nothing to clean up.
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
