package graft.sources.cdc

import java.time.{LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MariaDB SQL type string → Spark `DataType` (SURVEY.md §1.3).
  *
  * The reference carries these strings verbatim in `m_types`
  * (cdc_connector.h:225-228, populated cdc_connector.cpp:250-286) and never
  * interprets them; typed mode is this engine's documented improvement.
  * MariaDB-isms handled: display widths (`int(11)` → int), unsigned
  * markers, `varchar(N)` lengths (length doesn't change the Spark type).
  */
object SqlTypes {

  private val Paren = """^([a-zA-Z_ ]+?)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?\s*(unsigned)?\s*$""".r

  def toSpark(sqlType: String): DataType = sqlType.trim.toLowerCase match {
    case Paren(base, p, s, unsigned) =>
      val prec = Option(p).map(_.toInt)
      val scale = Option(s).map(_.toInt)
      val isUnsigned = unsigned != null
      base.trim match {
        case "bool" | "boolean"            => BooleanType
        case "tinyint"                     => if (isUnsigned) ShortType else ByteType
        case "smallint"                    => if (isUnsigned) IntegerType else ShortType
        case "mediumint"                   => IntegerType
        case "int" | "integer"             => if (isUnsigned) LongType else IntegerType
        case "bigint"                      => if (isUnsigned) DecimalType(20, 0) else LongType
        case "float"                       => FloatType
        case "double" | "real" | "double precision" => DoubleType
        case "decimal" | "numeric" | "fixed" =>
          // MariaDB allows decimal(65,38); Spark caps precision at 38 —
          // clamp (documented narrowing; raw mode remains lossless).
          val p = math.min(prec.getOrElse(10), DecimalType.MAX_PRECISION)
          DecimalType(p, math.min(scale.getOrElse(0), p))
        case "date"                        => DateType
        case "datetime" | "timestamp"      => TimestampType
        case "year"                        => IntegerType
        // TIME has no direct Spark scalar; keep the wire string.
        case "time"                        => StringType
        case "binary" | "varbinary" | "blob" | "tinyblob" | "mediumblob" | "longblob" =>
          BinaryType
        case _ => StringType // char/varchar/*text/enum/set/json/uuid/undefined/avro fallbacks
      }
    case _ => StringType
  }

  /** Typed schema for a CDC field list; the original SQL type string is
    * preserved in column metadata (SURVEY.md §1.5 `fields()` mapping). */
  def toStructType(fields: Seq[CdcField], typed: Boolean): StructType =
    StructType(fields.map { f =>
      val dt = if (typed) toSpark(f.sqlType) else StringType
      StructField(f.name, dt, nullable = true,
        metadata = new MetadataBuilder().putString("cdc.sqlType", f.sqlType).build())
    })

  /** MariaDB datetime/timestamp wire text: optional time part, 0-6
    * fractional digits (datetime(0)..datetime(6) all occur — a fixed
    * `.SSSSSS` pattern would reject e.g. '… 10:00:00.123' from a
    * timestamp(3) column and silently null it in typed mode). */
  private val DateTimeFmt = new java.time.format.DateTimeFormatterBuilder()
    .appendPattern("yyyy-MM-dd")
    .optionalStart()
    .appendLiteral(' ')
    .appendPattern("HH:mm:ss")
    .optionalStart()
    .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 0, 6, true)
    .optionalEnd()
    .optionalEnd()
    .parseDefaulting(java.time.temporal.ChronoField.HOUR_OF_DAY, 0)
    .parseDefaulting(java.time.temporal.ChronoField.MINUTE_OF_HOUR, 0)
    .parseDefaulting(java.time.temporal.ChronoField.SECOND_OF_MINUTE, 0)
    .toFormatter

  /** Wire string → Catalyst value for one field. Returns null on JSON null
    * (typed mode's NULL, vs the reference's "" conflation,
    * cdc_connector.cpp:106-107) and on unparseable values (permissive,
    * like Spark's PERMISSIVE JSON mode). */
  def cast(value: String, isNull: Boolean, dt: DataType): Any = {
    if (isNull || value == null) return null
    try dt match {
      case StringType    => UTF8String.fromString(value)
      case BooleanType   => value == "1" || value.equalsIgnoreCase("true")
      case ByteType      => value.toByte
      case ShortType     => value.toShort
      case IntegerType   => value.toInt
      case LongType      => value.toLong
      case FloatType     => value.toFloat
      case DoubleType    => value.toDouble
      case d: DecimalType =>
        org.apache.spark.sql.types.Decimal(BigDecimal(value), d.precision, d.scale)
      case DateType      => LocalDate.parse(value).toEpochDay.toInt
      case TimestampType =>
        val ldt = LocalDateTime.parse(value, DateTimeFmt)
        ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
      case BinaryType    => value.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case _             => UTF8String.fromString(value)
    } catch { case _: RuntimeException | _: java.time.DateTimeException => null }
  }
}
