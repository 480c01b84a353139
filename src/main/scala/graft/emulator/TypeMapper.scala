package graft.emulator

import org.apache.spark.sql.types._

/** The two one-way type maps of the reference (deliberately not inverses):
  * Snowflake declared type -> storage type (reference
  * `pkg/types/snowflake.go:45-76`, `pkg/contentdata/repository.go:191-246`)
  * and engine result type -> Snowflake result metadata
  * (`pkg/query/type_mapper.go:22-66`, metadata inference `:69-103`).
  *
  * Spark plays DuckDB's storage role, so here the first map targets Spark
  * `DataType` and the second maps Spark result schemas to Snowflake-shaped
  * `ColumnMetadata`.
  */
object TypeMapper {

  /** Result-side column metadata (reference `server/types/types.go:122-129`). */
  final case class ColumnMetadata(
      name: String,
      snowflakeType: String,
      nullable: Boolean,
      length: Long = 0L,
      precision: Long = 0L,
      scale: Long = 0L)

  /** Snowflake declared type -> Spark storage type. Follows the authoritative
    * enum (`snowflake.go:45-76`) with the SURVEY §1.2 choice of DecimalType
    * for NUMBER (the contentdata path, `contentdata/repository.go:198`) and
    * JSON-as-string for VARIANT/OBJECT/ARRAY (`snowflake.go:65-68`).
    * TIME is string-backed — Spark has no TimeType (`type_mapper.go:43`).
    * Unknown -> StringType (`snowflake.go:73-74`).
    */
  def toSparkType(snowflakeType: String): DataType = {
    val u = snowflakeType.trim.toUpperCase(java.util.Locale.ROOT)
    val base = u.takeWhile(c => c != '(' && c != ' ')
    val args: Seq[Int] =
      if (u.contains('(') && u.contains(')'))
        u.substring(u.indexOf('(') + 1, u.indexOf(')'))
          .split(',').toSeq.map(_.trim).filter(_.nonEmpty)
          .flatMap(s => scala.util.Try(s.toInt).toOption)
      else Seq.empty
    base match {
      case "NUMBER" | "DECIMAL" | "NUMERIC" =>
        val p = args.headOption.getOrElse(38)
        val s = args.drop(1).headOption.getOrElse(0)
        DecimalType(p, s)
      case "INT" | "INTEGER" => IntegerType
      case "BIGINT" => LongType
      case "SMALLINT" => ShortType
      case "TINYINT" | "BYTEINT" => ByteType
      case "FLOAT" | "FLOAT4" | "FLOAT8" | "DOUBLE" | "REAL" => DoubleType
      case "VARCHAR" | "STRING" | "TEXT" | "CHAR" | "CHARACTER" => StringType
      case "BOOLEAN" => BooleanType
      case "DATE" => DateType
      case "TIME" => StringType // no Spark TimeType; report TIME in metadata
      case "DATETIME" | "TIMESTAMP" | "TIMESTAMP_NTZ" => TimestampNTZType
      case "TIMESTAMP_LTZ" | "TIMESTAMP_TZ" => TimestampType
      case "VARIANT" | "OBJECT" | "ARRAY" => StringType // JSON text model
      case "BINARY" | "VARBINARY" => BinaryType
      case "GEOGRAPHY" | "GEOMETRY" => StringType // WKT (snowflake.go:71-72)
      case _ => StringType
    }
  }

  /** Spark result type -> Snowflake type name, mirroring the collapse rules
    * of `type_mapper.go:22-66`: all integer widths and decimals -> NUMBER,
    * floats -> FLOAT, strings -> TEXT, TIMESTAMP* -> TIMESTAMP_NTZ,
    * TIMESTAMPTZ -> TIMESTAMP_TZ, arrays -> ARRAY, structs/maps -> OBJECT,
    * binary -> BINARY, unknown -> TEXT.
    */
  def toSnowflakeTypeName(t: DataType): String = t match {
    case ByteType | ShortType | IntegerType | LongType | _: DecimalType => "NUMBER"
    case FloatType | DoubleType => "FLOAT"
    case StringType => "TEXT"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampNTZType => "TIMESTAMP_NTZ"
    case TimestampType => "TIMESTAMP_TZ"
    case BinaryType => "BINARY"
    case _: ArrayType => "ARRAY"
    case _: StructType | _: MapType => "OBJECT"
    case _ => "TEXT"
  }

  /** Column metadata inference from a result schema (the analog of
    * `type_mapper.go:69-103`, which infers from live `sql.Rows`). */
  def inferRowType(schema: StructType): Seq[ColumnMetadata] =
    schema.fields.toSeq.map { f =>
      val (precision, scale) = f.dataType match {
        case d: DecimalType => (d.precision.toLong, d.scale.toLong)
        case ByteType => (3L, 0L)
        case ShortType => (5L, 0L)
        case IntegerType => (10L, 0L)
        case LongType => (19L, 0L)
        case _ => (0L, 0L)
      }
      val length = f.dataType match {
        case StringType => 16777216L // Snowflake VARCHAR default max
        case BinaryType => 8388608L
        case _ => 0L
      }
      ColumnMetadata(f.name, toSnowflakeTypeName(f.dataType), f.nullable,
        length, precision, scale)
    }
}
