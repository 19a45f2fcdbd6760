package graft

import org.apache.spark.sql.types._

/** Arrow/DataFusion → Spark type mapping (SURVEY.md §1; reference:
  * `ArrowType`, datafusion.proto:863-898).
  *
  * The deliberate widenings: Spark has no unsigned integers, so each UIntN
  * maps to the next-wider signed type (UInt64 → Decimal(20,0), the only
  * signed container for 2^64-1); Float16 loses to Float32; nanosecond
  * timestamps truncate to microseconds (Spark's resolution); Time32/64 have
  * no Spark type and surface as the raw count. Used by schema translation
  * when registering external tables whose declared schemas come from an
  * Arrow-typed system.
  */
object ArrowTypes {

  /** Map an Arrow/DataFusion type name (proto enum spelling, case-
    * insensitive) to the Spark type. */
  def toSpark(arrowType: String): DataType = arrowType.toUpperCase match {
    case "NULL" => NullType
    case "BOOL" | "BOOLEAN" => BooleanType
    case "INT8" => ByteType
    case "INT16" => ShortType
    case "INT32" => IntegerType
    case "INT64" => LongType
    // unsigned widening: smallest signed type that holds the full range
    case "UINT8" => ShortType
    case "UINT16" => IntegerType
    case "UINT32" => LongType
    case "UINT64" => DecimalType(20, 0)
    case "FLOAT16" | "FLOAT32" => FloatType
    case "FLOAT64" => DoubleType
    case "UTF8" | "LARGE_UTF8" | "LARGEUTF8" => StringType
    case "BINARY" | "LARGE_BINARY" | "LARGEBINARY" | "FIXED_SIZE_BINARY" => BinaryType
    case "DATE32" | "DATE64" => DateType
    case "TIME32" => IntegerType // no TimeType in Spark: raw unit count
    case "TIME64" => LongType
    case "DURATION" => DayTimeIntervalType()
    case "TIMESTAMP" => TimestampType // any unit; ns truncates to us
    case "INTERVAL_YEARMONTH" => YearMonthIntervalType()
    case "INTERVAL_DAYTIME" => DayTimeIntervalType()
    case "INTERVAL_MONTHDAYNANO" => CalendarIntervalType
    case other => throw new IllegalArgumentException(s"unsupported Arrow type: $other")
  }

  def decimal(precision: Int, scale: Int): DataType = {
    require(precision <= DecimalType.MAX_PRECISION,
      s"precision $precision exceeds Spark max ${DecimalType.MAX_PRECISION}")
    DecimalType(precision, scale)
  }

  def list(element: DataType, nullable: Boolean = true): DataType =
    ArrayType(element, nullable)

  def struct(fields: (String, DataType)*): DataType =
    StructType(fields.map { case (n, t) => StructField(n, t) })
}
