package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Crypto-hash surface (reference: datafusion.proto:456, 484, 489-492).
  *
  * `digest(expr, algo)` is the reference's dispatching form; Spark has the
  * per-algorithm built-ins, so dispatch happens at plan-construction time —
  * zero runtime overhead, stays codegen'd.
  */
object HashFunctions {

  def digest(c: Column, algorithm: String): Column = algorithm.toLowerCase match {
    case "md5" => md5(c.cast(BinaryType))
    case "sha224" => sha2(c.cast(BinaryType), 224)
    case "sha256" => sha2(c.cast(BinaryType), 256)
    case "sha384" => sha2(c.cast(BinaryType), 384)
    case "sha512" => sha2(c.cast(BinaryType), 512)
    case other => throw new IllegalArgumentException(s"digest: unsupported algorithm $other")
  }

  /** SQL form `graft_digest(expr, 'algo')` — the algorithm must be a string
    * literal (as in the reference, where it selects the kernel at plan
    * time; reference: datafusion.proto:456). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.plans.SqlExprs
    import org.apache.spark.sql.graft.ColumnBridge.registerExpression
    registerExpression(spark, "graft_digest", es =>
      SqlExprs.digest(es(0), SqlExprs.stringLiteral(es(1), "graft_digest algorithm")))
  }
}
