package graft.sources.connector

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SQL MERGE-ON-READ row-level DML (r16): `SupportsDelta` — Spark's
  * delta-based rewrite protocol, the public interface behind
  * deletion-vector DML in the lakehouse formats. Where the group-based
  * copy-on-write operation rewrites every file holding a matching row,
  * the delta operation receives the matched rows THEMSELVES
  * (delete/update/insert, each row carrying its pk identity and its
  * `_file`), stages ONLY the new row images as data files, and publishes
  * the removals as a deletion vector bound to exactly the files that
  * held them — a 1-row SQL `UPDATE` appends one tiny file and one tiny
  * vector instead of rewriting anything (Cassandra's write path, through
  * SQL). Opt-in per table: `TBLPROPERTIES('dml'='mor')`, refused for
  * clustered tables (the pk must be the whole row identity — CQL's model
  * — or a key-grained vector would over-delete sibling ck rows).
  *
  * PK-UNIQUENESS OBLIGATION (the mor contract, review r16): the vector
  * is pk-grained, so a table holding DUPLICATE rows of one pk (possible
  * via raw blind appends — the sink never reads) would lose unmatched
  * siblings when a predicate DML matches one of them. CQL's own model:
  * INSERT is an upsert and the primary key IS the row identity — write
  * mor tables through INSERT-once/upsert flows (or compact first). The
  * group-based copy-on-write default stays exact under duplicates;
  * tables that need duplicate rows should keep it.
  *
  * Concurrency: the operation pins one snapshot; the vector publish
  * validates its bindings against the CAS base and the pinned version
  * ([[TokenRangeSource.publishManifest]] `dvBind`/`dvSeenVersion`), so a
  * racing rewrite fails the statement like a serializable-txn abort —
  * the same contract as the copy-on-write path.
  *
  * Reference semantics anchor: server.py's message delete/update on a
  * hot partition — the frequent-small-DML shape the copy-on-write wall
  * penalizes most. */
private[connector] final class TokenRangeDeltaOperation(
    cmd: RowLevelOperation.Command,
    tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends RowLevelOperation with SupportsDelta {

  private val path = TokenRangeSource.pathOf(options)
  private val pinned: Option[Int] = TokenRangeSource.currentVersion(path)
  private val pkCols: Seq[String] = TokenRangeSource.recordedPk(path)
    .getOrElse(throw new IllegalArgumentException(
      s"token-range merge-on-read DML at $path requires a recorded pk"))
    .split(',').map(_.trim).toSeq

  override def command(): RowLevelOperation.Command = cmd

  /** Row identity = the partition key (CQL's model; the catalog refuses
    * `dml=mor` on clustered tables so this is the WHOLE primary key). */
  override def rowId(): Array[NamedReference] =
    pkCols.map(Expressions.column).toArray

  /** `_file` rides each matched row so the removal binds a vector to
    * exactly the file that held it. */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(TokenRangeSource.FileCol))

  override def newScanBuilder(o: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder = {
    val merged = new java.util.HashMap[String, String](options)
    merged.putAll(o)
    pinned.foreach(v => merged.put("version", v.toString))
    new TokenRangeScanBuilder(tableSchema, new CaseInsensitiveStringMap(merged))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new TokenRangeDeltaBatchWrite(path, tableSchema, info.schema(),
            pkCols, pinned, cmd)
      }
    }
}

/** One task's removals: `(fileRel, pk components as strings)` — typed
  * back through the pk dtypes at commit. */
private[connector] final case class TokenRangeDeltaCommit(
    files: Array[String], tombs: Array[Array[String]])
    extends WriterCommitMessage

private[connector] final class TokenRangeDeltaBatchWrite(path: String,
    tableSchema: StructType, rowSchema: StructType, pkCols: Seq[String],
    pinned: Option[Int], cmd: RowLevelOperation.Command)
    extends DeltaBatchWrite {

  private val writeId = java.util.UUID.randomUUID().toString.take(8)

  /** Bulk-DML guard: the vector path is for the frequent-small-DML
    * shape; a statement matching millions of rows should take the
    * copy-on-write table mode instead (the vector would bloat every
    * subsequent read until compaction). */
  private val MaxTombstones = 1000000

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DeltaWriterFactory = {
    new java.io.File(path).mkdirs()
    // a pure DELETE stages no row images: its write schema is EMPTY and
    // the data writer is never constructed (lazy in the task writer)
    val pkIdx =
      if (rowSchema.fields.isEmpty) Nil
      else pkCols.map(n => rowSchema.fieldIndex(
        rowSchema.fieldNames.find(_.equalsIgnoreCase(n)).getOrElse(n)))
    val idFields: Array[DataType] = pkCols.map(n =>
      tableSchema.fields.find(_.name.equalsIgnoreCase(n)).get.dataType).toArray
    new TokenRangeDeltaWriterFactory(path, rowSchema, pkIdx, idFields,
      writeId)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.flatMap {
      case TokenRangeDeltaCommit(fs, _) => fs
      case _ => Array.empty[String]
    }
    val tombs: Array[Array[String]] = messages.flatMap {
      case TokenRangeDeltaCommit(_, ts) => ts
      case _ => Array.empty[Array[String]]
    }
    require(tombs.length <= MaxTombstones,
      s"token-range merge-on-read DML at $path matched ${tombs.length} " +
        s"rows (> $MaxTombstones) — run bulk rewrites on a copy-on-write " +
        "table (dml=cow) or compact first")
    if (staged.isEmpty && tombs.isEmpty) return // matched nothing: no-op
    val spark = org.apache.spark.sql.SparkSession.active
    val kind = cmd match {
      case RowLevelOperation.Command.DELETE => "delete"
      case _ => "upsert"
    }
    // the vector: distinct removed keys, typed through the pk dtypes
    val pkFields = pkCols.map(n =>
      tableSchema.fields.find(_.name.equalsIgnoreCase(n)).get)
    val touchedRel = tombs.map(_.head).distinct.toSeq.sorted
    // the removed identities, typed through the pk dtypes — the vector's
    // content AND the CDF classification's key frame
    val keysDf: Option[org.apache.spark.sql.DataFrame] =
      if (tombs.isEmpty) None
      else {
        val rows = tombs.map { t =>
          org.apache.spark.sql.Row.fromSeq(t.tail.toSeq.zip(pkFields).map {
            case (v, f) => f.dataType match {
              case LongType => v.toLong
              case IntegerType => v.toInt
              case StringType => v
              case other => throw new IllegalStateException(
                s"merge-on-read pk dtype $other unsupported")
            }
          })
        }.distinct.toSeq
        Some(spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1),
          StructType(pkFields.map(f => StructField(f.name, f.dataType)).toArray)))
      }
    val dvRel: Option[String] = keysDf.map { df =>
      val rel = s"_dv/${java.util.UUID.randomUUID().toString.take(12)}"
      df.coalesce(1).write.mode("error")
        .parquet(new java.io.File(path, rel).getAbsolutePath)
      rel
    }
    // CHANGE DATA FEED: pre-images are the removed keys' rows read
    // VECTOR-MERGED at the pinned version from exactly the touched
    // files; staged rows classify as post-images (key also removed) or
    // inserts — the same classification every other op records
    val cdfRel: Option[String] =
      if (!TokenRangeSource.changeFeedEnabled(path)) None
      else Some(TokenRangeOps.stageDeltaDmlSidecar(spark, path, pinned,
        if (keysDf.isEmpty) Nil else touchedRel, staged.toSeq,
        keysDf.getOrElse(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(pkFields.map(f => StructField(f.name, f.dataType)).toArray)))))
    try {
      TokenRangeSource.withCommitLock(path) {
        val placedRel = staged.map { f =>
          val file = new java.io.File(f)
          val bucketName = file.getParentFile.getName
          val dst = new java.io.File(new java.io.File(path, bucketName), file.getName)
          dst.getParentFile.mkdirs()
          java.nio.file.Files.move(file.toPath, dst.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          s"$bucketName/${file.getName}"
        }.toSeq
        TokenRangeSource.publishManifest(path, placedRel, truncate = false,
          opKind = kind, cdfRel = cdfRel,
          dvBind = dvRel.map(dv => touchedRel.map(_ -> dv)).getOrElse(Nil),
          dvSeenVersion = pinned)
      }
      TokenRangeOps.retentionSweep(path)
    } finally
      TokenRangeSource.deleteRecursively(TokenRangeSource.stagingDir(path, writeId))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case TokenRangeDeltaCommit(files, _) =>
        files.foreach(f => new java.io.File(f).delete())
      case _ => ()
    }
    TokenRangeSource.deleteRecursively(TokenRangeSource.stagingDir(path, writeId))
  }
}

private[connector] final case class TokenRangeDeltaWriterFactory(path: String,
    rowSchema: StructType, pkIdx: Seq[Int], idFields: Array[DataType],
    writeId: String) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DeltaWriter[InternalRow] =
    new TokenRangeDeltaWriter(path, rowSchema, pkIdx, idFields,
      partitionId, taskId, writeId)
}

/** Routes INSERT/UPDATE images through the ordinary staged task writer
  * (same ring routing, same file naming) and collects each DELETE/UPDATE
  * identity as a `(file, pk)` tombstone for the commit's vector. */
private[connector] final class TokenRangeDeltaWriter(path: String,
    rowSchema: StructType, pkIdx: Seq[Int], idFields: Array[DataType],
    partitionId: Int, taskId: Long, writeId: String)
    extends DeltaWriter[InternalRow] {

  // LAZY: a pure DELETE's write schema is empty — no image is ever
  // written and no staging file should be opened
  private var dataOrNull: TokenRangeDataWriter = null
  private def data: TokenRangeDataWriter = {
    if (dataOrNull == null)
      dataOrNull = new TokenRangeDataWriter(path, rowSchema, pkIdx,
        partitionId, taskId, writeId)
    dataOrNull
  }
  private val tombs = scala.collection.mutable.ArrayBuffer.empty[Array[String]]

  private def tomb(meta: InternalRow, id: InternalRow): Unit = {
    val rel = meta.getUTF8String(0).toString
    val vals = new Array[String](idFields.length + 1)
    vals(0) = rel
    var i = 0
    while (i < idFields.length) {
      vals(i + 1) = idFields(i) match {
        case LongType => id.getLong(i).toString
        case IntegerType => id.getInt(i).toString
        case StringType => id.getUTF8String(i).toString
        case other => throw new IllegalStateException(
          s"merge-on-read pk dtype $other unsupported")
      }
      i += 1
    }
    tombs += vals
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit = tomb(meta, id)

  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    tomb(meta, id) // remove the OLD identity (covers pk-changing updates)
    data.write(row)
  }

  override def insert(row: InternalRow): Unit = data.write(row)

  override def commit(): WriterCommitMessage = {
    val files =
      if (dataOrNull == null) Array.empty[String]
      else dataOrNull.commit().asInstanceOf[TokenRangeCommit].files
    TokenRangeDeltaCommit(files, tombs.toArray)
  }

  override def abort(): Unit = if (dataOrNull != null) dataOrNull.abort()
  override def close(): Unit = if (dataOrNull != null) dataOrNull.close()
}
