package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered conversion funnels over an event log — the sequential-funnel
  * semantics product-analytics engines implement natively, parameterized
  * over any stage sequence: a user reaches stage i at the MINIMUM event
  * time of a stage-i event STRICTLY AFTER their stage i−1 time, so
  * out-of-order events never count and an event at exactly the previous
  * stage's timestamp does not advance the funnel (FunnelLawsSpec pins the
  * strictness against a sequential reference on tie-heavy logs).
  *
  * Shape at scale: one keyed aggregation per stage plus one keyed join per
  * stage transition — each stage's user set only shrinks, so the joins get
  * cheaper down the funnel; the counts are single-row aggregates. The
  * 3-stage gated query (`evt_funnel`, `graft.queries.Analytics.evtFunnel`)
  * delegates here.
  */
object Funnel {

  /** One DataFrame(user, t) per stage: users who reached it and when. */
  private def stageFrames(events: DataFrame, userCol: String, typeCol: String,
                          tsCol: String, stages: Seq[String]): Seq[DataFrame] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("user")).agg(min(col(tsCol)).as("t"))
    stages.tail.scanLeft(first) { (prev, st) =>
      events.select(col(userCol).as("user"), col(typeCol), col(tsCol))
        .join(prev.select(col("user"), col("t").as("prev_t")), Seq("user"))
        .filter(col(typeCol) === st && col(tsCol) > col("prev_t"))
        .groupBy(col("user")).agg(min(col(tsCol)).as("t"))
    }
  }

  /** Per-user stage-reach times: (user, stage_n, t) for every reached
    * stage, 1-indexed in stage order. */
  def stageTimes(events: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, stages: Seq[String]): DataFrame =
    stageFrames(events, userCol, typeCol, tsCol, stages).zipWithIndex.map {
      case (df, i) => df.select(col("user"), lit((i + 1).toLong).as("stage_n"), col("t"))
    }.reduce(_ unionByName _)

  /** Stage counts: (stage, stage_n, n_users), one row PER stage including
    * empty ones (a funnel report needs the zero rows), labels chained with
    * '>' ("view", "view>click", ...). */
  def counts(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[String]): DataFrame =
    stageFrames(events, userCol, typeCol, tsCol, stages).zipWithIndex.map {
      case (df, i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(stages.take(i + 1).mkString(">")).as("stage"),
            lit((i + 1).toLong).as("stage_n"), col("n_users"))
    }.reduce(_ unionAll _)
}
