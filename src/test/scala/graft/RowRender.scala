package graft

import org.apache.spark.sql.DataFrame

/** Canonical row rendering shared by the determinism sweeps
  * (ConfigInvarianceSpec, LocalClusterSpec). Row.toString renders
  * Array[Byte] by JVM identity and map iteration order is unspecified;
  * doubles keep toString so a fold-order -0.0/0.0 flip still fails the
  * compare. */
object RowRender {

  def render(v: Any): String = v match {
    case null                          => "∅"
    case b: Array[Byte]                => b.map(x => f"$x%02x").mkString
    case a: Array[_]                   => a.map(render).mkString("[", ",", "]")
    case s: scala.collection.Seq[_]    => s.map(render).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => render(k) + "→" + render(x) }
        .sorted.mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row   => r.toSeq.map(render).mkString("(", ",", ")")
    case x                             => x.toString
  }

  /** Multiset snapshot: the driver gate sorts rows before hashing, so row
    * order is not part of any query's contract — sort here too. */
  def snapshot(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(render).sorted
}
