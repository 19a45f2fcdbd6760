package graft.streaming

import graft.operators.TopK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Incremental CDC apply: maintain a latest-row-per-key state table from a
  * change stream with `foreachBatch` — the production pattern for feeding
  * a continuously-updated dimension/state table from a change feed
  * (upserts only here; model deletes as tombstone rows filtered on read).
  *
  * State lives as immutable per-batch parquet versions (`v0`, `v1`, ...)
  * under `statePath`, with a `_CURRENT` pointer file swapped atomically
  * after each successful write — the manifest-pointer scheme of a table
  * format, minus the format dependency: readers never observe a partial
  * version, and a failed batch leaves the pointer untouched so the
  * checkpoint replays it. The per-batch merge is old-state ∪ changes →
  * latest-per-key, executed by the bounded-heap [[graft.operators.TopK]]
  * operator (k = 1), so the merge shuffles at most one row per key — at
  * 100 TB the state table's key count, never the change volume, bounds
  * the work.
  */
object CdcApply {

  /** Latest row per key of `df` under `order` (name -> ascending?). */
  def latestPerKey(df: DataFrame, keys: Seq[String],
                   order: Seq[(String, Boolean)]): DataFrame =
    TopK.perKey(df, keys, order, 1)

  /** Path of the current state version, if any batch has committed. */
  def currentState(spark: SparkSession, statePath: String): Option[DataFrame] = {
    val ptr = Paths.get(statePath, "_CURRENT")
    if (Files.exists(ptr))
      Some(spark.read.parquet(
        Paths.get(statePath, new String(Files.readAllBytes(ptr),
          StandardCharsets.UTF_8).trim).toString))
    else None
  }

  /** One merge step: previous state (if any) ∪ changes → latest per key. */
  def applyBatch(state: Option[DataFrame], changes: DataFrame,
                 keys: Seq[String], order: Seq[(String, Boolean)]): DataFrame =
    latestPerKey(state.fold(changes)(_.unionByName(changes)), keys, order)

  /** Start the apply loop on a streaming DataFrame of change rows.
    * `order` must rank later changes first DESCENDING-style via
    * (seqCol -> false) so "latest" wins; add tiebreakers to make the
    * selection total. */
  def start(changes: DataFrame, statePath: String, keys: Seq[String],
            order: Seq[(String, Boolean)],
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    Files.createDirectories(Paths.get(statePath))
    changes.writeStream
      .queryName(s"cdc_apply_${Paths.get(statePath).getFileName}")
      .option("checkpointLocation", s"$statePath/_checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val merged = applyBatch(currentState(spark, statePath), batch, keys, order)
        val version = s"v$batchId"
        merged.write.mode("overwrite")
          .parquet(Paths.get(statePath, version).toString)
        // write-then-move so readers only ever see a committed pointer
        val tmp = Paths.get(statePath, s"_CURRENT.tmp$batchId")
        Files.write(tmp, version.getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, Paths.get(statePath, "_CURRENT"),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        ()
      }
      .start()
  }
}
