package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §1 type mapping + approximate-aggregate error bounds (the checks the
  * DuckDB oracle can't express). */
class TypesApproxSpec extends SparkSpec {

  test("arrow type mapping widens unsigned and preserves the rest") {
    assert(ArrowTypes.toSpark("UINT8") == ShortType)
    assert(ArrowTypes.toSpark("UINT16") == IntegerType)
    assert(ArrowTypes.toSpark("UINT32") == LongType)
    assert(ArrowTypes.toSpark("UINT64") == DecimalType(20, 0))
    assert(ArrowTypes.toSpark("INT32") == IntegerType)
    assert(ArrowTypes.toSpark("FLOAT16") == FloatType)
    assert(ArrowTypes.toSpark("UTF8") == StringType)
    assert(ArrowTypes.toSpark("TIMESTAMP") == TimestampType)
    assert(ArrowTypes.toSpark("large_utf8") == StringType)
    intercept[IllegalArgumentException](ArrowTypes.toSpark("UNION"))
  }

  test("uint64 max round-trips through the widened decimal") {
    import spark.implicits._
    val max = BigDecimal("18446744073709551615") // 2^64 - 1
    val df = Seq(max).toDF("v").select(col("v").cast(ArrowTypes.toSpark("UINT64")).as("v"))
    assert(df.collect().head.getDecimal(0) == max.bigDecimal)
  }

  test("approx_count_distinct is within its standard error on real data") {
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02)).collect().head.getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.05, s"approx=$approx exact=$exact relErr=$relErr")
  }

  test("percentile_approx brackets the exact median") {
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.select(median(col("l_quantity"))).collect().head.getDouble(0)
    val approx = li.select(percentile_approx(col("l_quantity"), lit(0.5), lit(1000)))
      .collect().head.getDouble(0)
    // accuracy=1000 -> rank error <= n/1000; quantity domain is small, so
    // the approx median must land within a tight value band of the exact
    assert(math.abs(approx - exact) <= 2.0, s"approx=$approx exact=$exact")
  }

  test("union type lowers to a tagged struct with one field per variant") {
    import org.apache.spark.sql.types._
    val u = ArrowTypes.union("i" -> IntegerType, "s" -> StringType)
    val st = u.asInstanceOf[StructType]
    assert(st.fieldNames.toSeq == Seq("type_id", "i", "s"))
    assert(st("type_id").dataType == ByteType && !st("type_id").nullable)
    assert(st("i").nullable && st("s").nullable)
    // a tagged row is constructible and the discriminant disambiguates
    // same-typed variants
    import spark.implicits._
    val df = Seq((0.toByte, Some(7), None: Option[String]),
      (1.toByte, None: Option[Int], Some("x")))
      .toDF("type_id", "i", "s")
    assert(df.where(col("type_id") === 0).select("i").collect().head.getInt(0) == 7)
  }

  test("fixed-size binary: width in metadata, check catches violations") {
    val f = ArrowTypes.fixedSizeBinaryField("h", 16)
    assert(ArrowTypes.fixedSizeBinaryWidth(f).contains(16))
    assert(ArrowTypes.fixedSizeBinaryWidth(
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.BinaryType)).isEmpty)
    import spark.implicits._
    val df = Seq(Array.fill[Byte](16)(1), Array.fill[Byte](15)(1))
      .toDF("h")
    val ok = df.select(ArrowTypes.fixedSizeBinaryCheck(col("h"), 16).as("ok"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(ok == Seq(true, false))
  }
}
