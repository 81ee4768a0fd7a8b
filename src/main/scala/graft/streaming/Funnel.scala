package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** STREAMING conversion funnel (the CEP pattern-detection shape):
  * g29's view → click ≤ 1 h → purchase ≤ 1 h chain as keyed state in
  * `flatMapGroupsWithState` — per-user state is THREE (ts, id) slots
  * forever, advancing monotonically as stages match.
  *
  * Contract: stages only ADVANCE — an out-of-order view arriving
  * after a click was already bound does not rebind (the
  * at-most-once-advance trade every streaming CEP engine makes);
  * under event-time-ordered replay — including the harness's single
  * AvailableNow drain, where each user's batch slice is sorted before
  * the walk — the result equals the batch g29 EXACTLY, which is why
  * the two share one oracle (the v4/v8 pattern). FunnelSpec pins the
  * cross-batch arms: a purchase in a later batch binds to the click
  * held in state, and a late out-of-order view does not rebind.
  *
  * Timestamps compare in epoch MICROS (`getTime` is millis and would
  * blur the ±1 h window boundaries the oracle computes at full
  * precision).
  */
object Funnel {
  private val hourUs = 3600000000L

  val transform: DataFrame => DataFrame = { df =>
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .as[(Long, String, java.sql.Timestamp, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long, Long, Long),
        (Long, Option[Long], Option[Long], Option[Long])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user, rows, state) =>
          def us(t: java.sql.Timestamp): Long =
            t.getTime / 1000 * 1000000L + t.getNanos / 1000
          var (vTs, vId, cTs, cId, pTs, pId) = state.getOption.getOrElse(
            (0L, -1L, 0L, -1L, 0L, -1L))
          rows.toSeq.sortBy(r => (us(r._3), r._4)).foreach {
            case (_, t, ts0, id) =>
              val m = us(ts0)
              t match {
                case "view" if vId < 0 =>
                  vTs = m; vId = id
                case "click" if vId >= 0 && cId < 0 &&
                  m >= vTs && m <= vTs + hourUs =>
                  cTs = m; cId = id
                case "purchase" if cId >= 0 && pId < 0 &&
                  m >= cTs && m <= cTs + hourUs =>
                  pTs = m; pId = id
                case _ =>
              }
          }
          state.update((vTs, vId, cTs, cId, pTs, pId))
          Iterator((user,
            if (vId >= 0) Some(vId) else None,
            if (cId >= 0) Some(cId) else None,
            if (pId >= 0) Some(pId) else None))
      }
      .toDF("user_id", "view_id", "click_id", "purchase_id")
  }
}
