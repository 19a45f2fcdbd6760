package graft.operators

import graft.plans.TopKPerKey
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.graft.ColumnBridge

/** User API over the [[graft.plans.TopKPerKey]] custom operator. */
object TopK {

  /** Top `k` rows per key group, ranked by `orderBy` (name, ascending?)
    * pairs compared in sequence. Plans through [[graft.plans.GraftStrategies]]
    * (injected by `graft.GraftExtensions`) as bounded-heap partial → one
    * keyed exchange of at most keys*k rows per partition → bounded-heap
    * final. Output rows are the input rows, unordered within a group —
    * sort downstream if presentation order matters. */
  def perKey(df: DataFrame, keyCols: Seq[String],
             orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val child = df.queryExecution.analyzed
    def attr(name: String) = child.output.find(_.name.equalsIgnoreCase(name))
      .getOrElse(throw new IllegalArgumentException(
        s"topKPerKey: column $name not in ${child.output.map(_.name).mkString(", ")}"))
    val keys = keyCols.map(attr)
    val ordering = orderBy.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    ColumnBridge.ofRows(df.sparkSession, TopKPerKey(keys, ordering, k, child))
  }
}
