package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.{Tables, TempArtifacts}
import graft.io.Warehouse

/** File-warehouse lifecycle queries over [[graft.io.Warehouse]]: the
  * 100 TB analogs of the reference's JDBC table maintenance
  * (`New_Api_Sercom/function_app.py:309-365` merge,
  * `Function_Latinad_API/function_app.py:193-196` reload). Both build
  * their table once per (sfDir, JVM) via [[TempArtifacts]] — the
  * write-once-read-many lifecycle of a real warehouse table — and
  * read the committed snapshot back, so the oracle checks the
  * composed create → mutate → commit → scan round trip, not an
  * in-memory transform.
  */
object WarehouseQueries {

  /** m1's table, built once per (sfDir, JVM): version 1 = events minus
    * the % 19 == 3 slice, version 2 = the merged end state. Shared by
    * m1 (reads the current version) and m3 (time-travels to v1).
    */
  private def m1Table(s: org.apache.spark.sql.SparkSession, d: String): String =
    TempArtifacts.getOrBuild(s"$d#m1wh", "graft_m1wh") { p =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          to_date(col("ts")).as("dt"),
          unix_micros(col("ts")).as("version"))
      Warehouse.create(s, p, ev.filter(col("event_id") % 19 =!= 3), "dt")
      val changes = ev
        .filter(col("event_id") % 19 === 3 || col("event_id") % 23 === 5)
        .withColumn("user_id", col("user_id") + 1000000L)
        .withColumn("version", col("version") + 1L)
      Warehouse.mergeInto(s, p, changes, "event_id", "version", "dt")
    }

  /** m2's table, built once per (sfDir, JVM): version 1 = full
    * events, version 2 = after the three-arm merge (deletes
    * % 31 == 7, updates % 29 == 11 with user_id shifted). Shared by
    * m2 (reads the end state) and m6 (diffs the two versions).
    */
  private def m2Table(s: org.apache.spark.sql.SparkSession, d: String): String =
    TempArtifacts.getOrBuild(s"$d#m2wh", "graft_m2wh") { p =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          to_date(col("ts")).as("dt"),
          unix_micros(col("ts")).as("version"))
      Warehouse.create(s, p, ev, "dt")
      val dels = ev.filter(col("event_id") % 31 === 7)
        .withColumn("version", col("version") + 1L)
        .withColumn("is_del", lit(true))
      val ups = ev.filter(col("event_id") % 29 === 11 &&
          col("event_id") % 31 =!= 7)
        .withColumn("user_id", col("user_id") + 2000000L)
        .withColumn("version", col("version") + 1L)
        .withColumn("is_del", lit(false))
      Warehouse.mergeInto(s, p, dels.unionByName(ups),
        "event_id", "version", "dt", deleteCol = Some("is_del"))
    }

  def qs: Seq[Q] = Seq(

    // M1 — MERGE INTO a day-partitioned parquet table, copy-on-write
    // at partition granularity. Base = events minus the
    // event_id % 19 == 3 slice; the change batch UPDATES the
    // % 23 == 5 rows (user_id shifted, version bumped) and INSERTS
    // the % 19 == 3 slice — so the merge exercises update, insert
    // and untouched-row arms in one pass. Only the partitions the
    // change batch names are read and rewritten (WarehouseSpec
    // asserts untouched partitions keep byte-identical files); the
    // commit is one atomic manifest rename. The oracle recomputes
    // the end state from the events table alone.
    Q("m1_merge_into",
      (s, d) => {
        Warehouse.read(s, m1Table(s, d))
          .select(col("event_id"), col("user_id"), col("event_type"), col("dt"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (SELECT event_id, user_id, event_type,
             |              CAST(ts AS DATE) AS dt FROM events)
             |SELECT event_id, user_id + 1000000 AS user_id, event_type, dt
             |FROM ev WHERE event_id % 19 = 3 OR event_id % 23 = 5
             |UNION ALL
             |SELECT event_id, user_id, event_type, dt
             |FROM ev WHERE event_id % 19 <> 3 AND event_id % 23 <> 5
             |ORDER BY event_id""".stripMargin)),

    // M3 — TIME TRAVEL: read m1's table AS OF version 1 — the
    // snapshot BEFORE the merge — off the same artifact m1 reads at
    // version 2. Copy-on-write + retained version manifests make
    // every pre-vacuum snapshot a first-class read (pin a training
    // run to the corpus-as-of-a-date, audit what a merge changed,
    // recover from a bad batch); the oracle recomputes the pre-merge
    // state from events alone, so this checks that the merge left
    // version 1's files genuinely untouched, not just unread.
    Q("m3_time_travel",
      (s, d) => {
        Warehouse.readVersion(s, m1Table(s, d), 1L)
          .select(col("event_id"), col("user_id"), col("event_type"), col("dt"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, event_type, CAST(ts AS DATE) AS dt
             |FROM events WHERE event_id % 19 <> 3
             |ORDER BY event_id""".stripMargin)),

    // M2 — MERGE with the DELETE arm: the change batch mixes
    // tombstones (event_id % 31 == 7, WHEN MATCHED THEN DELETE) with
    // updates (event_id % 29 == 11 and not deleted, user_id shifted)
    // in ONE batch — the full three-arm MERGE a CDC consumer needs
    // (GDPR erasure rides the same path as upserts). A tombstone wins
    // the same latest-wins race as any change row, so a stale delete
    // loses to a newer stored version; physically the key just
    // doesn't appear in the rewritten partition — nothing outside the
    // touched partitions moves.
    Q("m2_merge_delete",
      (s, d) => {
        Warehouse.read(s, m2Table(s, d))
          .select(col("event_id"), col("user_id"), col("event_type"), col("dt"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  CASE WHEN event_id % 29 = 11 THEN user_id + 2000000
             |       ELSE user_id END AS user_id,
             |  event_type, CAST(ts AS DATE) AS dt
             |FROM events WHERE event_id % 31 <> 7
             |ORDER BY event_id""".stripMargin)),

    // M4 — SCHEMA EVOLUTION through the merge: the change batch
    // carries a column the table never had (`score`) — the merged
    // schema WIDENS by name, stored rows in untouched files read the
    // new column as null (parquet footer merging), and nothing old
    // rewrites. The update slice (event_id % 37 == 2) lands scored;
    // every other row — including rows in the same partitions the
    // merge rewrote — reads score IS NULL. The standard lakehouse
    // evolution contract (Delta mergeSchema), on our own manifest.
    Q("m4_schema_evolution",
      (s, d) => {
        val path = TempArtifacts.getOrBuild(s"$d#m4wh", "graft_m4wh") { p =>
          val ev = Tables.events(s, d)
            .select(col("event_id"), col("user_id"), col("event_type"),
              to_date(col("ts")).as("dt"),
              unix_micros(col("ts")).as("version"))
          Warehouse.create(s, p, ev, "dt")
          val changes = ev.filter(col("event_id") % 37 === 2)
            .withColumn("version", col("version") + 1L)
            .withColumn("score", (col("event_id") % 100).cast("long"))
          Warehouse.mergeInto(s, p, changes, "event_id", "version", "dt")
        }
        Warehouse.read(s, path)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("dt"), col("score"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, event_type, CAST(ts AS DATE) AS dt,
             |  CASE WHEN event_id % 37 = 2 THEN event_id % 100 END AS score
             |FROM events ORDER BY event_id""".stripMargin)),

    // M5 — CHANGE DATA FEED, insert + update arms: the row-level diff
    // between m1's version 1 (pre-merge) and version 2 (post-merge),
    // straight off the manifest — only partitions whose owner batch
    // MOVED between the versions are read (the copy-on-write
    // invariant: an untouched partition is byte-identical, so it
    // cannot carry a change), then one full-outer join classifies
    // rows. Updates emit BOTH images (the Delta CDF contract);
    // rewritten-but-identical rows emit nothing. The oracle recomputes
    // the feed from the events table and m1's change recipe alone.
    Q("m5_change_feed",
      (s, d) => {
        Warehouse.changes(s, m1Table(s, d), 1L, 2L, "event_id")
          .select(col("event_id"), col("change_type"), col("user_id"),
            col("event_type"), col("dt"))
          .orderBy("event_id", "change_type")
      },
      Some("""WITH ev AS (SELECT event_id, user_id, event_type,
             |              CAST(ts AS DATE) AS dt FROM events)
             |SELECT event_id, 'insert' AS change_type,
             |       user_id + 1000000 AS user_id, event_type, dt
             |FROM ev WHERE event_id % 19 = 3
             |UNION ALL
             |SELECT event_id, 'update_preimage', user_id, event_type, dt
             |FROM ev WHERE event_id % 23 = 5 AND event_id % 19 <> 3
             |UNION ALL
             |SELECT event_id, 'update_postimage',
             |       user_id + 1000000, event_type, dt
             |FROM ev WHERE event_id % 23 = 5 AND event_id % 19 <> 3
             |ORDER BY event_id, change_type""".stripMargin)),

    // M6 — CHANGE DATA FEED, delete arm: the diff across m2's
    // three-arm merge surfaces its tombstones as 'delete' rows
    // carrying the final preimage — the GDPR-erasure audit record and
    // the signal a downstream index consumes to drop entries — plus
    // both images of its updates, through the same manifest-pruned
    // partition diff as m5.
    Q("m6_change_feed_deletes",
      (s, d) => {
        Warehouse.changes(s, m2Table(s, d), 1L, 2L, "event_id")
          .select(col("event_id"), col("change_type"), col("user_id"),
            col("event_type"), col("dt"))
          .orderBy("event_id", "change_type")
      },
      Some("""WITH ev AS (SELECT event_id, user_id, event_type,
             |              CAST(ts AS DATE) AS dt FROM events)
             |SELECT event_id, 'delete' AS change_type, user_id, event_type, dt
             |FROM ev WHERE event_id % 31 = 7
             |UNION ALL
             |SELECT event_id, 'update_preimage', user_id, event_type, dt
             |FROM ev WHERE event_id % 29 = 11 AND event_id % 31 <> 7
             |UNION ALL
             |SELECT event_id, 'update_postimage',
             |       user_id + 2000000, event_type, dt
             |FROM ev WHERE event_id % 29 = 11 AND event_id % 31 <> 7
             |ORDER BY event_id, change_type""".stripMargin)),

    // M7 — INCREMENTAL AGGREGATE MAINTENANCE off the change feed: the
    // reason a CDF exists. A downstream per-(dt, event_type) rollup
    // is maintained without re-reading the table — start from the
    // aggregate of version 1 (the state a consumer already holds) and
    // fold in the feed: insert/update_postimage rows add, delete/
    // update_preimage rows subtract (count and sum are self-inverse,
    // so the two update images cancel exactly where the group didn't
    // change). The oracle recomputes version 2's rollup from scratch;
    // equality proves the delta algebra — feed cost ∝ changes, not
    // table size, the 100 TB materialized-view maintenance contract.
    Q("m7_incremental_agg",
      (s, d) => {
        val path = m2Table(s, d)
        val base = Warehouse.readVersion(s, path, 1L)
          .groupBy("dt", "event_type")
          .agg(count(lit(1)).as("n"), sum("user_id").as("su"))
        val feed = Warehouse.changes(s, path, 1L, 2L, "event_id")
          .select(col("dt"), col("event_type"),
            when(col("change_type").isin("insert", "update_postimage"), 1L)
              .otherwise(-1L).as("sgn"),
            col("user_id"))
          .groupBy("dt", "event_type")
          .agg(sum(col("sgn")).as("dn"),
            sum(col("sgn") * col("user_id")).as("dsu"))
        base.join(feed, Seq("dt", "event_type"), "full_outer")
          .select(col("dt"), col("event_type"),
            (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
              .as("n_events"),
            (coalesce(col("su"), lit(0L)) + coalesce(col("dsu"), lit(0L)))
              .as("sum_user"))
          .filter(col("n_events") > 0)
          .orderBy("dt", "event_type")
      },
      Some("""WITH ev2 AS (
             |  SELECT CASE WHEN event_id % 29 = 11 THEN user_id + 2000000
             |              ELSE user_id END AS user_id,
             |         event_type, CAST(ts AS DATE) AS dt
             |  FROM events WHERE event_id % 31 <> 7)
             |SELECT dt, event_type, count(*) AS n_events,
             |       CAST(sum(user_id) AS BIGINT) AS sum_user
             |FROM ev2 GROUP BY dt, event_type
             |ORDER BY dt, event_type""".stripMargin)),

    // M8 — multi-commit CHANGE LOG (Delta's table_changes(from, to)):
    // one tagged diff per commit over a three-version table — merge A
    // updates the % 41 == 1 slice at version 2, merge B deletes
    // % 43 == 2 and updates % 47 == 3 at version 3 — so the log's
    // version-3 PREIMAGES must reflect what version 2 LEFT there
    // (a key in both slices shows A's shifted user_id as its delete/
    // update preimage), which is exactly what a fold-to-catch-up
    // consumer replays. The oracle rebuilds both commits' expected
    // diffs from the events table and the slice recipes alone,
    // including the overlap arithmetic.
    Q("m8_change_log",
      (s, d) => {
        val path = TempArtifacts.getOrBuild(s"$d#m8wh", "graft_m8wh") { p =>
          val ev = Tables.events(s, d)
            .select(col("event_id"), col("user_id"), col("event_type"),
              to_date(col("ts")).as("dt"),
              unix_micros(col("ts")).as("version"))
          Warehouse.create(s, p, ev, "dt")
          val a = ev.filter(col("event_id") % 41 === 1)
            .withColumn("user_id", col("user_id") + 3000000L)
            .withColumn("version", col("version") + 1L)
          Warehouse.mergeInto(s, p, a, "event_id", "version", "dt")
          val dels = ev.filter(col("event_id") % 43 === 2)
            .withColumn("version", col("version") + 2L)
            .withColumn("is_del", lit(true))
          val ups = ev.filter(col("event_id") % 47 === 3 &&
              col("event_id") % 43 =!= 2)
            .withColumn("user_id", col("user_id") + 4000000L)
            .withColumn("version", col("version") + 2L)
            .withColumn("is_del", lit(false))
          Warehouse.mergeInto(s, p, dels.unionByName(ups),
            "event_id", "version", "dt", deleteCol = Some("is_del"))
        }
        Warehouse.changeLog(s, path, "event_id")
          .select(col("commit_version"), col("event_id"), col("change_type"),
            col("user_id"), col("event_type"), col("dt"))
          .orderBy("commit_version", "event_id", "change_type")
      },
      Some("""WITH ev AS (SELECT event_id, user_id, event_type,
             |              CAST(ts AS DATE) AS dt FROM events),
             |v2 AS (
             |  SELECT CAST(2 AS BIGINT) AS commit_version, event_id,
             |         'update_preimage' AS change_type, user_id, event_type, dt
             |  FROM ev WHERE event_id % 41 = 1
             |  UNION ALL
             |  SELECT 2, event_id, 'update_postimage',
             |         user_id + 3000000, event_type, dt
             |  FROM ev WHERE event_id % 41 = 1),
             |v3 AS (
             |  SELECT CAST(3 AS BIGINT), event_id, 'delete',
             |         CASE WHEN event_id % 41 = 1 THEN user_id + 3000000
             |              ELSE user_id END, event_type, dt
             |  FROM ev WHERE event_id % 43 = 2
             |  UNION ALL
             |  SELECT 3, event_id, 'update_preimage',
             |         CASE WHEN event_id % 41 = 1 THEN user_id + 3000000
             |              ELSE user_id END, event_type, dt
             |  FROM ev WHERE event_id % 47 = 3 AND event_id % 43 <> 2
             |  UNION ALL
             |  SELECT 3, event_id, 'update_postimage',
             |         user_id + 4000000, event_type, dt
             |  FROM ev WHERE event_id % 47 = 3 AND event_id % 43 <> 2)
             |SELECT * FROM (SELECT * FROM v2 UNION ALL SELECT * FROM v3)
             |ORDER BY commit_version, event_id, change_type""".stripMargin)),

    // K9 — small-file COMPACTION (OPTIMIZE) of the K8 day-partitioned
    // layout: the first ops problem a streaming-ingest table develops.
    // The fixture table is written deliberately FRAGMENTED (a 8-way
    // shuffle before the partitioned write leaves up to 8 small files
    // per day); compact bin-packs every fragmented partition to its
    // byte target in one executor-side job — range-repartitioned on
    // (dt, event_id) so the compacted files are also SORTED (row-group
    // stats on event_id turn selective for free) — and commits the new
    // mapping atomically. Already-compact partitions keep their exact
    // files (WarehouseSpec asserts both arms plus the file-count
    // drop). The oracle is scan equality: compaction must never
    // change a visible row.
    Q("k9_compaction",
      (s, d) => {
        val path = TempArtifacts.getOrBuild(s"$d#k9wh", "graft_k9wh") { p =>
          val ev = Tables.events(s, d)
            .select(col("event_id"), col("user_id"), col("event_type"),
              to_date(col("ts")).as("dt"))
          Warehouse.create(s, p, ev.repartition(8), "dt")
          Warehouse.compact(s, p, "event_id", targetBytes = 64L << 20): Unit
        }
        Warehouse.read(s, path)
          .groupBy("dt")
          .agg(count(lit(1)).as("n_events"),
            sum("user_id").as("sum_user"),
            min("event_id").as("min_event"),
            max("event_id").as("max_event"))
          .orderBy("dt")
      },
      Some("""SELECT CAST(ts AS DATE) AS dt, count(*) AS n_events,
             |  CAST(sum(user_id) AS BIGINT) AS sum_user,
             |  min(event_id) AS min_event, max(event_id) AS max_event
             |FROM events GROUP BY 1 ORDER BY dt""".stripMargin))
  )
}
