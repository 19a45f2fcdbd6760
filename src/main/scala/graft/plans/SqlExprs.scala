package graft.plans

import graft.functions.RegexFunctions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Catalyst expression trees for the SQL-registered graft functions.
  *
  * Function-registry builders must return real (codegen-capable) expression
  * trees — the Column→Expression bridge produces a lazy ColumnNodeExpression
  * wrapper that cannot be evaluated inside another plan — so the SQL forms
  * are assembled here from the same catalyst nodes the Column DSL lowers to.
  * Semantics are identical to the Column forms in graft.functions (specs
  * assert it).
  */
object SqlExprs {

  /** md5-derived portable 60-bit hash (TextFunctions.hash64). */
  def hash64(c: Expression): Expression =
    Cast(Conv(Substring(Md5(Cast(c, BinaryType)), Literal(1), Literal(15)),
      Literal(16), Literal(10)), LongType)

  def tokens(c: Expression): Expression =
    StringSplit(StringTrim(c, None), Literal("\\s+"), Literal(-1))

  def tokenCount(c: Expression): Expression = Cast(Size(tokens(c)), LongType)

  def normalize(c: Expression): Expression =
    StringTrim(RegExpReplace(
      RegExpReplace(Lower(c), Literal("[^a-z0-9 ]"), Literal("")),
      Literal("\\s+"), Literal(" ")), None)

  def similarTo(c: Expression, pattern: String): Expression =
    RLike(c, Literal(RegexFunctions.similarToRegex(pattern)))

  def digest(c: Expression, algorithm: String): Expression = algorithm.toLowerCase match {
    case "md5" => Md5(Cast(c, BinaryType))
    case "sha224" => Sha2(Cast(c, BinaryType), Literal(224))
    case "sha256" => Sha2(Cast(c, BinaryType), Literal(256))
    case "sha384" => Sha2(Cast(c, BinaryType), Literal(384))
    case "sha512" => Sha2(Cast(c, BinaryType), Literal(512))
    case other => throw new IllegalArgumentException(s"digest: unsupported algorithm $other")
  }

  def cosine(a: Expression, b: Expression): Expression =
    Divide(VecDot(a, b), Multiply(Sqrt(VecDot(a, a)), Sqrt(VecDot(b, b))))

  /** DATE_BIN(stride_us, source, origin) — DateTimeFunctions.dateBin. */
  def dateBin(stride: Expression, src: Expression, origin: Expression): Expression = {
    val srcUs = UnixMicros(Cast(src, TimestampType))
    val orgUs = UnixMicros(Cast(origin, TimestampType))
    val nBins = Cast(Floor(Divide(Cast(Subtract(srcUs, orgUs), DoubleType),
      Cast(stride, DoubleType))), LongType)
    MicrosToTimestamp(Add(orgUs, Multiply(nBins, Cast(stride, LongType))))
  }

  def toTimestampSeconds(c: Expression): Expression = SecondsToTimestamp(Cast(c, LongType))
  def toTimestampMillis(c: Expression): Expression = MillisToTimestamp(Cast(c, LongType))
  def toTimestampMicros(c: Expression): Expression = MicrosToTimestamp(Cast(c, LongType))

  /** Extract a required string-literal argument (algorithm / pattern). */
  def stringLiteral(e: Expression, what: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  /** Extract a required integer-literal argument (n-gram width, k, ...). */
  def intLiteral(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
}
