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
  * AvailableNow drain — the result equals the batch g29 EXACTLY,
  * which is why the two share one oracle (the v4/v8 pattern).
  * Within a batch the bind is STAGE-PRIORITY, not a single walk:
  * first the earliest unbound view by (ts, event_id), then the
  * earliest qualifying click over the WHOLE batch slice, then the
  * earliest qualifying purchase — so a click whose ts TIES the
  * view's ts binds even when its event_id sorts it before the view
  * (the batch windows are ts-inclusive; a one-pass walk would skip
  * it — advisor r11). Each stage scans the sorted slice again, but
  * the slice is one user's rows in one micro-batch — O(batch) per
  * user, not O(stream). FunnelSpec pins the cross-batch arms: a
  * purchase in a later batch binds to the click held in state, a
  * late out-of-order view does not rebind, and the tie arm above.
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
          // stage-priority bind: each stage picks the EARLIEST
          // qualifying row by (ts, event_id) from the whole sorted
          // slice, so same-timestamp click/purchase rows that sort
          // before the row they chain from still bind (the batch
          // windows are ts-inclusive)
          val sorted = rows.toSeq
            .map { case (_, t, ts0, id) => (t, us(ts0), id) }
            .sortBy(r => (r._2, r._3))
          if (vId < 0)
            sorted.find(_._1 == "view").foreach { r =>
              vTs = r._2; vId = r._3
            }
          if (vId >= 0 && cId < 0)
            sorted.find(r => r._1 == "click" &&
              r._2 >= vTs && r._2 <= vTs + hourUs).foreach { r =>
              cTs = r._2; cId = r._3
            }
          if (cId >= 0 && pId < 0)
            sorted.find(r => r._1 == "purchase" &&
              r._2 >= cTs && r._2 <= cTs + hourUs).foreach { r =>
              pTs = r._2; pId = r._3
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
