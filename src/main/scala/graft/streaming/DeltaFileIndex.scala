package graft.streaming

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, BoundReference, Cast, Expression, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{StringType, StructType}

/** A Catalyst [[FileIndex]] backed by the Delta transaction log — the
  * NATIVE integration tier for the lakehouse format (public Delta
  * connectors sit on exactly this seam): instead of [[DeltaLog.read]]'s
  * per-partition scan union with literal partition columns, the live
  * file set and the log's `partitionValues` become a first-class file
  * index, so Catalyst plans ONE `FileSourceScanExec` whose
  * `PartitionFilters` — static predicates AND runtime
  * DynamicPruningExpressions alike — are evaluated HERE, against
  * log metadata, before any file is listed or read.
  *
  * What that buys at 100 TB: partition pruning is a driver-side
  * in-memory filter over the replayed log (no object-store LIST at
  * all — the index never touches the filesystem), dynamic partition
  * pruning over Delta facts works exactly as over Hive layouts, and
  * every downstream optimization keyed on `HadoopFsRelation`
  * (pushdown, column pruning, vectorized parquet) applies unchanged.
  *
  * Values are PROTOCOL-LITERAL like [[DeltaLog.readPartitioned]]: the
  * partition column is rebuilt from `partitionValues` (cast per the
  * schema, null for JSON null), never parsed from file paths, so
  * foreign flat-layout tables index identically.
  *
  * `adds` carries (absolute file path, size, partition values in
  * partition-schema order) for the live set at the pinned version —
  * the index is an immutable snapshot, matching Delta's read
  * semantics (`refresh` is deliberately a no-op; a new version is a
  * NEW index, the same way it is a new log replay).
  */
final class DeltaFileIndex(
    spark: SparkSession,
    table: String,
    adds: Seq[(String, Long, Seq[(String, Option[String])])],
    override val partitionSchema: StructType)
  extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(new Path(table))

  /** Typed partition-value row per the log's stringified encoding —
    * the same string→type cast Spark applies to Hive directory names,
    * here applied to the log's partitionValues. */
  private def typedRow(vals: Seq[(String, Option[String])]): InternalRow = {
    val byName = vals.toMap
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    InternalRow.fromSeq(partitionSchema.fields.toSeq.map { f =>
      byName.getOrElse(f.name, None) match {
        case Some(s) =>
          Cast(Literal.create(s, StringType), f.dataType, Some(tz)).eval(InternalRow.empty)
        case None => null
      }
    })
  }

  /** Group the live set by partition tuple once; (typed row, files). */
  private lazy val directories: Seq[(InternalRow, Seq[FileStatus])] =
    adds.groupBy(_._3).toSeq
      .sortBy(_._1.map(_._2.getOrElse("")).mkString("/"))
      .map { case (vals, fs) =>
        typedRow(vals) -> fs.map { case (p, size, _) =>
          new FileStatus(size, false, 1, 128L * 1024 * 1024, 0L, new Path(p))
        }
      }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val pruned =
      if (partitionFilters.isEmpty || partitionSchema.isEmpty) directories
      else {
        // Bind the filters to the partition schema by NAME (the scan
        // hands us attributes of the relation's partition columns) and
        // evaluate interpreted — the directory count is log-metadata
        // sized, never data sized.
        val bound = partitionFilters.reduce(And).transform {
          case a: Attribute =>
            val idx = partitionSchema.fieldIndex(a.name)
            BoundReference(idx, partitionSchema(idx).dataType, nullable = true)
        }
        val predicate = Predicate.createInterpreted(bound)
        predicate.initialize(0)
        directories.filter { case (row, _) => predicate.eval(row) }
      }
    pruned.map { case (row, fs) => PartitionDirectory(row, fs.toArray) }
  }

  override def inputFiles: Array[String] = adds.map(_._1).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = adds.map(_._2).sum
}
