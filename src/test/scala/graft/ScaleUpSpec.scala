package graft

import org.apache.spark.sql.functions._

class ScaleUpSpec extends SparkSpec {

  test("scaled multiplies rows N times with disjoint, integrity-preserving keys") {
    import spark.implicits._
    val orders = Seq((0L, 10L), (1L, 10L), (2L, 11L)).toDF("o_orderkey", "o_custkey")
    val out = ScaleUp.scaled(orders, Map("o_orderkey" -> 3L, "o_custkey" -> 12L), 4)

    assert(out.count() === 12)
    assert(out.columns.toSeq === Seq("o_orderkey", "o_custkey"))
    // key ranges per copy are disjoint: copy i holds keys [i*3, i*3+2]
    val keys = out.select("o_orderkey").as[Long].collect().sorted
    assert(keys.toSeq === (0L until 12L))
    // foreign keys shift by the same copy index, so each copy joins only
    // to its own dimension rows (fan-out exactly N, never N^2)
    val pairs = out.as[(Long, Long)].collect().toSet
    for (i <- 0 until 4)
      assert(pairs.contains((i * 3L + 2L, i * 12L + 11L)))
    // non-key columns would pass through untouched (offsets map controls it)
    val noOffsets = ScaleUp.scaled(orders, Map.empty, 2)
    assert(noOffsets.select("o_custkey").as[Long].collect().sorted.toSeq
      === Seq(10L, 10L, 10L, 10L, 11L, 11L))
  }
}
