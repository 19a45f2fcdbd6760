package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03) —
  * the fingerprint-SELECTION algorithm behind MOSS-style near-dup and
  * plagiarism detection: hash every k-gram, slide a window of w hashes,
  * keep the minimum of each window. Guarantees any shared run of w+k-1
  * tokens yields at least one shared fingerprint, while storing ~2/(w+1)
  * of the hashes.
  *
  * Spark-first shape (no per-element interpreted lambdas in the hot path —
  * the lesson from the round-3 shingle rewrite): tokens posexplode to rows,
  * the k-gram is assembled with codegen'd `lead` window calls, md5 runs
  * once per gram row, and the window minimum is a `min` over a ROWS frame.
  * Both windows share one (doc_id, idx) sort, so the whole selection costs
  * a single keyed shuffle; the distinct that follows reuses the doc_id
  * partitioning (no second exchange).
  */
object Winnow {

  /** One row per (doc_id, fp): the winnowed fingerprint set. Documents with
    * fewer than `k` tokens produce no grams and are dropped (nothing to
    * fingerprint); documents with fewer than `w` grams produce exactly one
    * fingerprint (the minimum over all their hashes — the truncated first
    * window), matching the oracle's `greatest(1, ng-w+1)` window count. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, w: Int = 5): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("idx"))
    val gram = concat_ws(" ",
      col("tok") +: (1 until k).map(j => lead(col("tok"), j).over(byDoc)): _*)
    docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(TextFunctions.normalize(col(textCol))).as("t"))
      .filter(size(col("t")) >= k)
      .select(col("doc_id"), size(col("t")).as("n"),
        posexplode(col("t")).as(Seq("idx", "tok")))
      // assemble the k-gram from the next k-1 tokens; trailing rows whose
      // gram would be short (concat_ws skips the lead() nulls) are cut
      .withColumn("gram", gram)
      .filter(col("idx") <= col("n") - k)
      .select(col("doc_id"), col("idx"), (col("n") - (k - 1)).as("ng"),
        md5(col("gram")).as("h"))
      .withColumn("wmin", min(col("h")).over(byDoc.rowsBetween(0, w - 1)))
      .filter(col("idx") <= greatest(lit(0), col("ng") - w))
      .groupBy(col("doc_id"), col("wmin"))
      .agg(count(lit(1)).as("_cnt"))
      .select(col("doc_id"), col("wmin").as("fp"))
  }

  /** Candidate near-dup pairs: docs sharing ≥ `minShared` winnowed
    * fingerprints, via the inverted fingerprint index (keyed self-join,
    * never all-pairs). Fingerprints shared by more than `dfCap` documents
    * are dropped first — the stop-shingle pattern: a boilerplate fingerprint
    * shared corpus-wide would make its join bucket quadratic at 100 TB,
    * and it carries no discriminating signal. shuffle_hash because the
    * fingerprint keys are high-cardinality and near-uniform. */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
            k: Int = 4, w: Int = 5, dfCap: Int = 50,
            minShared: Long = 2L): DataFrame = {
    val fps = fingerprints(docs, idCol, textCol, k, w)
    val keep = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .select(col("fp"))
    val kept = fps.join(keep, Seq("fp")).hint("shuffle_hash")
    kept.select(col("fp"), col("doc_id").as("doc_a"))
      .join(kept.select(col("fp"), col("doc_id").as("doc_b")), Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
