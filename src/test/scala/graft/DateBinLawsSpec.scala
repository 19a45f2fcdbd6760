package graft

import graft.functions.DateTimeFunctions
import org.apache.spark.sql.functions._

/** Randomized law for date_bin against exact BigInt floor-division.
  *
  * The corpus is boundary-biased: timestamps exactly on, one microsecond
  * before, and one after bin boundaries, at deltas from the origin up to
  * ~280 years — the regime where the previous double-division form rounded
  * a just-below-boundary quotient up to the boundary integer and binned
  * into the wrong bucket. Also covers pre-origin timestamps (negative
  * deltas must floor DOWNWARD, not truncate toward zero) and non-epoch
  * origins.
  */
class DateBinLawsSpec extends SparkSpec {

  test("date_bin equals exact floor division at boundaries, large deltas, and pre-origin times") {
    val rng = new scala.util.Random(260815L)
    val strides = Seq(1000000L, 3600L * 1000000L, 86400L * 1000000L, 12345679L)
    val origins = Seq(0L, 1600000000L * 1000000L, -86400L * 1000000L)
    // past 2^53 µs (~285 years) the double-division form provably misbins
    // the off-by-one-microsecond cases; Spark timestamps reach year 9999
    // (~2^57.8 µs), so the corpus samples deltas across the whole range
    val maxTs = 200000000000000000L // 2e17 µs ≈ year 8305
    val cases = for {
      stride <- strides; origin <- origins
      k <- Seq.fill(8)(math.abs(rng.nextLong()) % (maxTs / stride))
      off <- Seq(-1L, 0L, 1L, stride / 2)
      sign <- Seq(1L, -1L) // pre-origin deltas too
    } yield (stride, origin, origin + sign * (k * stride + off))

    val rows = cases.zipWithIndex.map { case ((stride, origin, src), i) =>
      (i.toLong, stride, origin, src)
    }
    val df = spark.createDataFrame(rows).toDF("id", "stride", "origin", "src")
      .select(col("id"),
        unix_micros(DateTimeFunctions.dateBin(col("stride"),
          timestamp_micros(col("src")), timestamp_micros(col("origin")))).as("binned"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    rows.foreach { case (id, stride, origin, src) =>
      // origin + floorDiv(delta, stride) * stride, in exact BigInt
      // arithmetic (BigInt.mod is always non-negative, so delta − mod is
      // floorDiv·stride for negative deltas too)
      val delta = BigInt(src) - BigInt(origin)
      val expect = (BigInt(origin) + delta - delta.mod(BigInt(stride))).toLong
      assert(got(id) == expect,
        s"id=$id stride=$stride origin=$origin src=$src: got ${got(id)} want $expect")
    }
  }
}
