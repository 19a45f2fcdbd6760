package graft

import org.apache.spark.sql.functions._

/** GraftContext — the BallistaContext-shaped API shell. */
class ContextSpec extends SparkSpec {

  private lazy val ctx = new GraftContext(spark)

  test("read_parquet + register_table + sql round-trip") {
    ctx.registerParquet("ctx_nation", s"$sfDir/nation.parquet")
    val out = ctx.sql("SELECT COUNT(*) AS n FROM ctx_nation").collect()
    assert(out.head.getAs[Long]("n") == 25L)
  }

  test("read_csv honors header and delimiter") {
    val p = s"${sys.props("java.io.tmpdir")}/graft_ctx_csv"
    ctx.readParquet(s"$sfDir/region.parquet")
      .write.mode("overwrite").option("header", "true").option("delimiter", ";").csv(p)
    val back = ctx.readCsv(p, hasHeader = true, delimiter = ";")
    assert(back.count() == 5)
    assert(back.columns.toSet == Set("r_regionkey", "r_name"))
  }

  test("parameterized sql matches literal sql") {
    ctx.registerParquet("ctx_orders", s"$sfDir/orders.parquet")
    val a = ctx.sql("SELECT COUNT(*) AS n FROM ctx_orders WHERE o_totalprice > :p",
      Map("p" -> 200000)).collect().head.getLong(0)
    val b = ctx.sql("SELECT COUNT(*) AS n FROM ctx_orders WHERE o_totalprice > 200000")
      .collect().head.getLong(0)
    assert(a == b && a > 0)
  }

  test("config maps ballista keys onto live spark conf") {
    val cfg = ctx.config
    assert(cfg("ballista.shuffle.partitions") == spark.conf.get("spark.sql.shuffle.partitions"))
  }
}
