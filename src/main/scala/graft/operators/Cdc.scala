package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental MERGE/CDC split — the reference's most interesting
  * operator (New_Api_Sercom/function_app.py:209-227): probe incoming
  * rows against the target's (key, version) snapshot and split into
  * inserts (key absent) and updates (key present, newer version).
  *
  * Spark-first design: the pandas left-merge + isnull/> filters become
  * two joins Catalyst can plan independently —
  *  - inserts: LEFT ANTI join (no payload from snapshot needed at all)
  *  - updates: INNER join + theta residual on the version column
  * The snapshot side is (key, version) only — at 100 TB the snapshot
  * of a billion-row target is ~16 bytes/row, often broadcastable; when
  * not, both joins shuffle on the same key so AQE reuses the exchange.
  */
object Cdc {

  final case class MergeSplit(inserts: DataFrame, updates: DataFrame, unchanged: DataFrame)

  /** @param incoming  new extract (full payload)
    * @param snapshot  target state; only `key` and `versionCol` are used
    * @param key       equality key (reference: `id`)
    * @param versionCol monotone change marker (reference: `updated_at`)
    *
    * Invariant (property-tested in CdcSpec): for key-unique inputs,
    * inserts ∪ updates ∪ unchanged partitions `incoming` exactly.
    * Null-version semantic: a matched row whose comparison cannot
    * prove "newer" (incoming OR snapshot version null) routes to
    * `unchanged` — an unversioned row must never overwrite target
    * state. The reference silently drops such rows (SER:218-221's
    * filters are both null-false); that is a bug we do not port.
    */
  def mergeSplit(incoming: DataFrame, snapshot: DataFrame,
                 key: String, versionCol: String): MergeSplit = {
    val existing = s"${versionCol}_existing"
    val snap = snapshot.select(col(key), col(versionCol).as(existing))
    val matched = incoming.join(snap, Seq(key), "inner")
    val newer = (col(versionCol) > col(existing)) <=> lit(true)
    MergeSplit(
      inserts   = incoming.join(snap.select(key), Seq(key), "left_anti"),
      updates   = matched.filter(newer).drop(existing),
      unchanged = matched.filter(!newer).drop(existing)
    )
  }

  /** The raw CDC probe join (J2, SER:215) — left join with the
    * snapshot's version column suffixed, before any split filter.
    */
  def probe(incoming: DataFrame, snapshot: DataFrame,
            key: String, versionCol: String, suffix: String = "_existing"): DataFrame =
    incoming.join(
      snapshot.select(col(key), col(versionCol).as(s"$versionCol$suffix")),
      Seq(key), "left")
}
