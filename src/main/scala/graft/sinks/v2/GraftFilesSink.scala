package graft.sinks.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BooleanType, DateType, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * A complete DataSource V2 STREAMING SINK — the write-side half of the
 * connector protocol (`sources.v2.GraftSeqSource` covers both read
 * halves): `TableProvider` → `SupportsWrite` → `WriteBuilder` → `Write`
 * → `StreamingWrite` → `StreamingDataWriterFactory` → per-partition
 * `DataWriter`, registered under the short name `graft-files`.
 *
 * This is the epoch-commit machinery a Delta/Kafka-class sink implements,
 * runnable offline:
 *  - executors write each (partition, epoch)'s rows to a UNIQUELY-named
 *    file under `path/data/` (JSON lines, encoded per field from the
 *    DECLARED StructType — longs/ints/doubles/floats/booleans/strings/
 *    timestamps/dates, nulls as JSON null; round 11 generalized the codec
 *    beyond the all-long demonstration schema, round-10 verdict #3) and
 *    return the file name as their [[WriterCommitMessage]];
 *  - the driver's `commit(epochId, messages)` writes the collected file
 *    list to `path/commits/<epochId>` ATOMICALLY (temp file + move), the
 *    visibility flip. Data files not named by any commit manifest do not
 *    exist to readers — the two-phase rule everywhere in this repo;
 *  - a replayed epoch (sink re-invoked for an epochId whose manifest
 *    already exists) is SKIPPED: the first manifest stays authoritative,
 *    the replay attempt's orphan data files stay invisible — that is
 *    exactly-once in the presence of retries, the `txnAppId/txnVersion`
 *    guarantee at the connector layer (`IdempotentParquetWriter` is the
 *    same contract at the foreachBatch layer);
 *  - `abort` deletes the attempt's files — failed tasks leak nothing
 *    visible either way.
 *
 * [[GraftFilesSink.committed]] is the read side: the union of all commit
 * manifests' files as a DataFrame (committed rows, exactly once).
 */
class GraftFilesSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-files"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // sink-only: schema comes from the query
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    require(path != null && path.nonEmpty, "graft-files requires option 'path'")
    new GraftFilesTable(path, schema)
  }
}

object GraftFilesSink {
  /** The timestamp wire format (UTC, microsecond precision) shared by the
    * DataWriter's encoder and [[committed]]'s reader. */
  private[v2] val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** All rows named by commit manifests under `path`, exactly once. */
  def committed(spark: SparkSession, path: String, schema: String): DataFrame = {
    val commits = Paths.get(path, "commits")
    val files =
      if (!Files.isDirectory(commits)) Seq.empty[String]
      else {
        val s = Files.list(commits)
        try s.iterator().asScala
          .filter(_.getFileName.toString.forall(_.isDigit))
          .flatMap(m => Files.readAllLines(m).asScala)
          .filter(_.nonEmpty)
          .map(f => Paths.get(path, "data", f).toString)
          .toSeq
        finally s.close()
      }
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL(schema))
    else spark.read.schema(StructType.fromDDL(schema))
      .option("timestampFormat", TsFormat)
      .json(files: _*)
  }
}

private[v2] class GraftFilesTable(path: String, schema: StructType)
  extends Table with SupportsWrite {
  override def name(): String = s"graft_files($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.STREAMING_WRITE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          new GraftFilesStreamingWrite(path, info.schema())
      }
    }
}

private[v2] case class FileCommit(file: String) extends WriterCommitMessage

private[v2] class GraftFilesStreamingWrite(path: String, schema: StructType)
  extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftFilesWriterFactory(path, schema)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val commits = Paths.get(path, "commits")
    Files.createDirectories(commits)
    val manifest = commits.resolve(epochId.toString)
    // replayed epoch: the first manifest is authoritative; this attempt's
    // data files are orphans no reader will ever list
    if (Files.exists(manifest)) return
    val tmp = commits.resolve(s".${epochId}.${UUID.randomUUID()}.tmp")
    Files.write(tmp, messages.collect { case FileCommit(f) => f }
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    try Files.move(tmp, manifest, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      Files.deleteIfExists(tmp) // lost a commit race on replay: same outcome
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case FileCommit(f) => Files.deleteIfExists(Paths.get(path, "data", f))
      case _ => ()
    }
}

/**
 * Per-partition writer with a GENERAL row codec: each field encodes from
 * the declared [[StructType]] to JSON-lines — numeric types as JSON
 * numbers (`Double.toString` is the shortest round-trip form; NaN and
 * ±Infinity as bare tokens, which Spark's JSON reader accepts by
 * default), strings JSON-escaped, timestamps as UTC microsecond ISO-8601
 * ([[GraftFilesSink.TsFormat]], the read side's `timestampFormat`), dates
 * as ISO local dates, nulls as JSON null. Round 12 made the codec
 * RECURSIVE over the declared type (`SpecializedGetters` is the common
 * cursor of rows, arrays, and map entry arrays): decimals as plain-form
 * numbers at their declared (precision, scale), arrays as JSON arrays,
 * structs as nested objects, string-keyed maps as objects — so the d98
 * epoch protocol carries the full nested surface a Delta-class sink
 * would. The epoch-manifest protocol around the codec is unchanged.
 */
private[v2] class GraftFilesWriterFactory(path: String, schema: StructType)
  extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val name = s"e$epochId-p$partitionId-${UUID.randomUUID()}.jsonl"
      private val file: Path = {
        val dir = Paths.get(path, "data")
        Files.createDirectories(dir)
        dir.resolve(name)
      }
      private val tsFmt = java.time.format.DateTimeFormatter
        .ofPattern(GraftFilesSink.TsFormat).withZone(java.time.ZoneOffset.UTC)
      private val out = Files.newBufferedWriter(file, StandardCharsets.UTF_8,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)

      private def jsonEscape(s: String): String = {
        val b = new StringBuilder(s.length + 2)
        b.append('"')
        s.foreach {
          case '"' => b.append("\\\"")
          case '\\' => b.append("\\\\")
          case '\n' => b.append("\\n")
          case '\r' => b.append("\\r")
          case '\t' => b.append("\\t")
          case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
          case c => b.append(c)
        }
        b.append('"').toString
      }

      /** Value encoder for `dt` over any [[SpecializedGetters]] cursor —
        * an InternalRow field, an ArrayData element, or a map's key/value
        * arrays — which is what makes the codec compose to any nesting
        * depth. Null handling stays at each CALLER (rows and arrays carry
        * their own null bitmaps). */
      private def encoderFor(
          dt: org.apache.spark.sql.types.DataType,
          where: String): (SpecializedGetters, Int) => String = dt match {
        case LongType => (g, i) => g.getLong(i).toString
        case IntegerType => (g, i) => g.getInt(i).toString
        case ShortType => (g, i) => g.getShort(i).toString
        case BooleanType => (g, i) => g.getBoolean(i).toString
        case DoubleType => (g, i) => g.getDouble(i).toString
        case FloatType => (g, i) => g.getFloat(i).toString
        case StringType => (g, i) => jsonEscape(g.getUTF8String(i).toString)
        case d: DecimalType => (g, i) =>
          g.getDecimal(i, d.precision, d.scale).toJavaBigDecimal.toPlainString
        case TimestampType => (g, i) => {
          val micros = g.getLong(i)
          val inst = java.time.Instant.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            Math.floorMod(micros, 1000000L) * 1000L)
          jsonEscape(tsFmt.format(inst))
        }
        case DateType => (g, i) =>
          jsonEscape(java.time.LocalDate.ofEpochDay(g.getInt(i).toLong).toString)
        case org.apache.spark.sql.types.ArrayType(et, _) =>
          val enc = encoderFor(et, where)
          (g, i) => {
            val arr = g.getArray(i)
            val b = new StringBuilder(16)
            b.append('[')
            var j = 0
            while (j < arr.numElements()) {
              if (j > 0) b.append(',')
              if (arr.isNullAt(j)) b.append("null") else b.append(enc(arr, j))
              j += 1
            }
            b.append(']').toString
          }
        case st: StructType =>
          val encs = st.fields.map(f => encoderFor(f.dataType, s"$where.${f.name}"))
          val nms = st.fieldNames.map(jsonEscape)
          (g, i) => {
            val row = g.getStruct(i, st.length)
            val b = new StringBuilder(32)
            b.append('{')
            var j = 0
            while (j < encs.length) {
              if (j > 0) b.append(',')
              b.append(nms(j)).append(':')
              if (row.isNullAt(j)) b.append("null") else b.append(encs(j)(row, j))
              j += 1
            }
            b.append('}').toString
          }
        case org.apache.spark.sql.types.MapType(StringType, vt, _) =>
          // JSON objects key on strings, so only string-keyed maps encode;
          // other key types fall through to the loud error below
          val venc = encoderFor(vt, where)
          (g, i) => {
            val m = g.getMap(i)
            val ks = m.keyArray()
            val vs = m.valueArray()
            val b = new StringBuilder(32)
            b.append('{')
            var j = 0
            while (j < m.numElements()) {
              if (j > 0) b.append(',')
              b.append(jsonEscape(ks.getUTF8String(j).toString)).append(':')
              if (vs.isNullAt(j)) b.append("null") else b.append(venc(vs, j))
              j += 1
            }
            b.append('}').toString
          }
        case other => throw new IllegalArgumentException(
          s"graft-files cannot encode '$where' of type $other")
      }

      private val encoders: Array[(InternalRow, Int) => String] =
        schema.fields.map { f =>
          val enc = encoderFor(f.dataType, f.name)
          (r: InternalRow, i: Int) => enc(r, i)
        }
      private val names: Array[String] = schema.fieldNames.map(jsonEscape)

      override def write(row: InternalRow): Unit = {
        val b = new StringBuilder(64)
        b.append('{')
        var i = 0
        while (i < encoders.length) {
          if (i > 0) b.append(',')
          b.append(names(i)).append(':')
          if (row.isNullAt(i)) b.append("null") else b.append(encoders(i)(row, i))
          i += 1
        }
        b.append('}')
        out.write(b.toString)
        out.write("\n")
      }
      override def commit(): WriterCommitMessage = { out.close(); FileCommit(name) }
      override def abort(): Unit = { out.close(); Files.deleteIfExists(file) }
      override def close(): Unit = out.close()
    }
}
