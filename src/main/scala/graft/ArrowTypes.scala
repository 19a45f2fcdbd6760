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

  /** Arrow dense/sparse Union (datafusion.proto's Union arrow type): Spark
    * has no sum type, so the standard lowering is a tagged struct — an
    * int8 `type_id` discriminant plus one nullable field per variant, of
    * which exactly one is non-null per row. Round-trippable (the
    * discriminant preserves which variant was set, including between
    * variants of the same type) and columnar-friendly (each variant is its
    * own column, so pruning still works). */
  def union(variants: (String, DataType)*): DataType = {
    require(!variants.exists(_._1 == "type_id"),
      "union variant named 'type_id' collides with the discriminant field")
    require(variants.map(_._1).distinct.length == variants.length,
      "union variant names must be distinct")
    StructType(
      StructField("type_id", ByteType, nullable = false) +:
        variants.map { case (n, t) => StructField(n, t, nullable = true) })
  }

  /** FixedSizeBinary(n): Spark's BinaryType carries no length constraint,
    * so the constraint travels in field metadata (readable by schema
    * translation on the way back out) and is enforceable per-row with
    * [[fixedSizeBinaryCheck]]. */
  def fixedSizeBinaryField(name: String, byteWidth: Int,
                           nullable: Boolean = true): StructField = {
    require(byteWidth > 0, s"FixedSizeBinary width must be positive: $byteWidth")
    StructField(name, BinaryType, nullable,
      new MetadataBuilder().putLong("arrow.fixed_size_binary.byteWidth",
        byteWidth.toLong).build())
  }

  /** Declared byte width of a field created by [[fixedSizeBinaryField]],
    * if any. */
  def fixedSizeBinaryWidth(field: StructField): Option[Int] =
    if (field.metadata.contains("arrow.fixed_size_binary.byteWidth"))
      Some(field.metadata.getLong("arrow.fixed_size_binary.byteWidth").toInt)
    else None

  /** Column predicate enforcing the FixedSizeBinary length constraint
    * (true where the value is null or exactly `byteWidth` bytes) — the
    * ingest-time CHECK an Arrow system's writer would apply. */
  def fixedSizeBinaryCheck(col: org.apache.spark.sql.Column,
                           byteWidth: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{length, lit}
    col.isNull || (length(col) === lit(byteWidth))
  }
}
