package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for the iterative tiers (graph fixpoints, connected
  * components, BPE training, k-core peeling). Every loop in the engine must
  * cut its lineage once per round — without it the logical plan grows
  * geometrically (each round references the previous round's DataFrame
  * several times) and re-analysis cost explodes.
  *
  * Two modes, chosen per session:
  *
  *  - DEFAULT (`spark.graft.checkpoint.reliable` unset/false):
  *    `localCheckpoint()` — blocks live in executor storage only. Fastest,
  *    and the right call on a single machine, but on a cluster a lost
  *    executor loses blocks that have no lineage left to recompute them:
  *    the job fails instead of degrading. (The reference engine has the
  *    same trade — its shuffle files die with the executor and the
  *    scheduler rolls back whole stages, scheduler `rollback_resolved_
  *    shuffles`.)
  *  - RELIABLE (`spark.graft.checkpoint.reliable=true` + a checkpoint dir
  *    via `sparkContext.setCheckpointDir`, pointed at the cluster's fault-
  *    tolerant store): `checkpoint()` — each round persists durably, so at
  *    100-TB executor churn a lost executor degrades to a re-read of the
  *    last round instead of a failed job. Opt-in because the durable write
  *    costs a full round-trip of the iteration state per round.
  */
object Lineage {
  val ReliableKey = "spark.graft.checkpoint.reliable"

  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get(ReliableKey, "false").toBoolean) {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true requires sparkContext.setCheckpointDir(<fault-tolerant path>)")
      df.checkpoint()
    } else df.localCheckpoint()
}
