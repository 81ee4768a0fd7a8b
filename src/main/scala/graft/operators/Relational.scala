package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Named relational operators from the reference's inventory
  * (SURVEY.md §2). Each is a lazy plan rewrite over built-in Catalyst
  * expressions — no UDFs, so every op stays inside whole-stage
  * codegen and survives predicate pushdown / column pruning.
  * Reference sites cited per method (LAT: = Function_Latinad_API/
  * function_app.py, SER: = New_Api_Sercom/function_app.py).
  */
object Relational {

  /** A1 (LAT:241) — N-ary UNION ALL aligning by column name and
    * null-filling missing columns, matching pandas `concat`'s
    * align-by-name semantics. Linear plan: fine for the reference's
    * dozens of frames; for thousands of inputs prefer reading them as
    * one multi-path scan.
    */
  def unionByName(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** A2 (LAT:78) — ordered scan + limit. Catalyst plans this as
    * TakeOrderedAndProject: per-partition top-k then a single-partition
    * merge of k-sized heaps — no full sort, no full shuffle, scales to
    * any input size for small k.
    */
  def topK(df: DataFrame, k: Int, ordering: Column*): DataFrame =
    df.orderBy(ordering: _*).limit(k)

  /** F5 (LAT:116) — string length cap with null→"" default:
    * null → "", len ≤ cap → value, else "". Pure `when` chain
    * (codegen'd), replacing the reference's Python lambda.
    */
  def lengthCap(c: Column, cap: Int): Column =
    when(c.isNull, lit("")).when(length(c) <= cap, c).otherwise(lit(""))

  /** F7 (LAT:200-201, 251) — row-wise surrogate key from concatenated
    * columns; the reference does this with `df.apply(axis=1)` (a
    * Python-interpreted row loop); here it is a codegen'd `concat`.
    */
  def surrogateKey(cols: Column*): Column =
    concat(cols.map(_.cast(StringType)): _*)

  /** F15 (LAT:170-179) — split a frame into two disjoint column sets;
    * both halves are projections over one parent plan, so the scan is
    * shared when the parent is cached (or re-read cheaply via parquet
    * column pruning when not).
    */
  def splitColumns(df: DataFrame, first: Seq[String]): (DataFrame, DataFrame) = {
    val rest = df.columns.filterNot(first.contains).toSeq
    (df.select(first.map(col): _*), df.select(rest.map(col): _*))
  }

  /** As-of join (scale extension; Spark has no native one): for each
    * left row, attach `valueCol` from the LATEST right row with
    * `right.ts <= left.ts` on the same key.
    *
    * Composed Spark-first as tag → union-by-name → one running
    * `last(_, ignoreNulls)` window: ONE shuffle on the key, no
    * per-row subquery, no range self-join — the plan shape that
    * survives a billion-row event table. Ties at equal timestamps
    * resolve right-rows-first then highest `valueCol` (pinned by the
    * window ordering, so the result is deterministic).
    *
    * Contract: both inputs contain `keys` and `tsCol`; `valueCol` is
    * a right-side column not present on the left.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, valueCol: String,
               toleranceMicros: Option[Long] = None): DataFrame = {
    val lcols = left.columns.toSeq
    val l = left
      .withColumn("_asof_side", lit(1))
      .withColumn(valueCol, lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select((keys :+ tsCol :+ valueCol).map(col): _*)
      .withColumn("_asof_side", lit(0))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("_asof_side"), col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_matched", last(col(valueCol), ignoreNulls = true).over(w))
    // TOLERANCE (pandas merge_asof): a backward match older than the
    // bound is dropped, not substituted. The matched row's OWN ts
    // rides a second last() stacked on the SAME window — conditioned
    // on valueCol NON-NULL exactly like `_matched`'s ignoreNulls, so
    // BOTH aggregates resolve to the same right row even when a
    // trailing right row carries a null value (otherwise _mts would
    // advance past the matched row and the tolerance would measure
    // the wrong gap) — still one shuffle, one sort. Requires a
    // TimestampType `tsCol` (distance is measured in microseconds).
    val bounded = toleranceMicros.fold(base) { tol =>
      require(left.schema(tsCol).dataType ==
          org.apache.spark.sql.types.TimestampType,
        s"toleranceMicros needs a TimestampType $tsCol")
      base
        .withColumn("_mts", last(when(col("_asof_side") === 0 &&
            col(valueCol).isNotNull, col(tsCol)),
          ignoreNulls = true).over(w))
        .withColumn("_matched", when(
          unix_micros(col(tsCol)) - unix_micros(col("_mts")) <= tol,
          col("_matched")))
    }
    bounded.filter(col("_asof_side") === 1)
      .select((lcols.map(col) :+ col("_matched").as(valueCol)): _*)
  }

  /** NEAREST-event join (scale extension): for each left row, the
    * right row on the same key whose `tsCol` is CLOSEST in either
    * direction — the direction-agnostic sibling of [[asofJoin]]
    * (pandas `merge_asof(direction='nearest')`).
    *
    * Composed as tag → union-by-name → TWO running window passes over
    * the SAME partitioning and sort: a backward `last(…, ignoreNulls)`
    * (latest right row at-or-before) and a forward `first(…,
    * ignoreNulls)` (earliest right row strictly after — equal-ts right
    * rows sort before the left row, so they land in the backward arm
    * with distance 0), then a row-local argmin of the two candidate
    * distances. ONE shuffle, one sort, no range self-join or per-row
    * subquery. Ties: equal distance on both sides prefers the
    * BACKWARD candidate; ties at equal ts within an arm resolve to
    * the highest `valueCol` backward / lowest forward (the window
    * orderings, pinned, so results are deterministic).
    *
    * Contract: both inputs contain `keys` and `tsCol` (TimestampType
    * — distances compare in microseconds — or any integral type);
    * `valueCol` is a non-null right-side column absent on the left.
    */
  def nearestJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                  tsCol: String, valueCol: String): DataFrame = {
    val lcols = left.columns.toSeq
    val l = left
      .withColumn("_nj_side", lit(1))
      .withColumn(valueCol, lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select((keys :+ tsCol :+ valueCol).map(col): _*)
      .withColumn("_nj_side", lit(0))
    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("_nj_side"), col(valueCol))
    val wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val cand = when(col("_nj_side") === 0,
      struct(col(tsCol).as("ts"), col(valueCol).as("v")))
    def num(c: Column): Column =
      if (left.schema(tsCol).dataType ==
        org.apache.spark.sql.types.TimestampType) unix_micros(c)
      else c.cast(org.apache.spark.sql.types.LongType)
    val chosen = when(col("_nj_b").isNull, col("_nj_f.v"))
      .when(col("_nj_f").isNull, col("_nj_b.v"))
      .when(num(col(tsCol)) - num(col("_nj_b.ts")) <=
        num(col("_nj_f.ts")) - num(col(tsCol)), col("_nj_b.v"))
      .otherwise(col("_nj_f.v"))
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_nj_b", last(cand, ignoreNulls = true).over(wb))
      .withColumn("_nj_f", first(cand, ignoreNulls = true).over(wf))
      .filter(col("_nj_side") === 1)
      .select((lcols.map(col) :+ chosen.as(valueCol)): _*)
  }

  /** Bucketized RANGE (interval) join (scale extension): match each
    * point row to every range row whose `[startCol, endCol]` interval
    * contains its `pointCol` — inclusive on both ends. Spark plans a
    * bare inequality join as BroadcastNestedLoop (quadratic work, and
    * impossible once neither side broadcasts); this is the standard
    * scale shape instead: both sides map to coarse time buckets —
    * points to ONE bucket, ranges exploded to every bucket their
    * interval covers — the join becomes a bucket EQUI-join (hash
    * shuffle, partial-aggregable, AQE-skew-handled like any other),
    * and the exact interval predicate filters residually. A (point,
    * range) pair can meet in at most one bucket (the point's), so no
    * dedup is needed. Shuffle volume = |points| + |ranges| ×
    * ⌈span/bucket⌉ — pick `bucketSeconds` near the typical interval
    * span so range fan-out stays ~2×.
    *
    * Contract: `pointCol`/`startCol`/`endCol` are timestamps (UTC
    * session), the two inputs share no column names, and every range
    * has `startCol` <= `endCol` (rows violating it simply match
    * nothing, as with the naive predicate).
    */
  def rangeJoin(points: DataFrame, pointCol: String,
                ranges: DataFrame, startCol: String, endCol: String,
                bucketSeconds: Long = 7L * 86400): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    def bucketOf(c: Column): Column =
      floor(unix_timestamp(c) / bucketSeconds).cast(LongType)
    val pb = points.withColumn("_rj_bucket", bucketOf(col(pointCol)))
    val rb = ranges.withColumn("_rj_bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    pb.join(rb, Seq("_rj_bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_rj_bucket")
  }

  /** Bucketized INTERVAL-OVERLAP join (scale extension): every pair
    * of rows whose `[lStart, lEnd]` and `[rStart, rEnd]` intervals
    * OVERLAP, endpoints inclusive (`lStart <= rEnd AND rStart <=
    * lEnd`) — the range-RANGE sibling of [[rangeJoin]]'s point-range
    * containment, and like it a BroadcastNestedLoop replacement:
    * BOTH sides explode to every bucket their interval covers, the
    * join becomes a bucket equi-join, and the exact predicate filters
    * residually. Unlike the point case a pair can meet in SEVERAL
    * shared buckets, so each pair is kept only in the FIRST bucket
    * both intervals cover — `greatest(startBucket_l, startBucket_r)`,
    * which overlapping intervals always share — making the dedup a
    * pure codegen'd filter instead of a DISTINCT shuffle over the
    * pair set. Shuffle volume = Σ ⌈span/bucket⌉ over both sides; pick
    * `bucketSeconds` near the typical interval span.
    *
    * Contract: all four columns are timestamps (UTC session), the two
    * inputs share no column names, and every interval has start <=
    * end. Rows violating start <= end behave exactly as under the
    * naive `lStart <= rEnd AND rStart <= lEnd` predicate — an
    * inverted interval can still satisfy it, and `sequence()`
    * descends when start > stop, so the bucketized join reproduces
    * those naive matches rather than dropping them.
    */
  def intervalOverlapJoin(left: DataFrame, lStart: String, lEnd: String,
                          right: DataFrame, rStart: String, rEnd: String,
                          bucketSeconds: Long = 7L * 86400): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    def bucketOf(c: Column): Column =
      floor(unix_timestamp(c) / bucketSeconds).cast(LongType)
    val lb = left.withColumn("_oj_bucket",
      explode(sequence(bucketOf(col(lStart)), bucketOf(col(lEnd)))))
    val rb = right.withColumn("_oj_bucket",
      explode(sequence(bucketOf(col(rStart)), bucketOf(col(rEnd)))))
    lb.join(rb, Seq("_oj_bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_oj_bucket") ===
        greatest(bucketOf(col(lStart)), bucketOf(col(rStart))))
      .drop("_oj_bucket")
  }

  /** Skew-salted equi-join (scale extension): the big (skewed) side
    * gets a deterministic salt derived from `saltFrom`; the small
    * side is replicated once per salt value; the join key becomes
    * (keys, salt) so one hot key spreads over `nSalts` reducers.
    * Result is EXACTLY the plain equi-join (oracle-checked) — only
    * the shuffle distribution changes.
    *
    * WHEN TO USE (measured in `AqeSkewSpec`, which drives a 50%-hot
    * key through both paths): reach for the rungs in this order.
    * (1) `broadcast(small)` — no big-side shuffle at all, so skew is
    * irrelevant; always first when the small side fits. (2) AQE's
    * skew-join (`spark.sql.adaptive.skewJoin.enabled`, on by
    * default) — at runtime it splits an oversized sort-merge
    * partition into multiple tasks and duplicates the matching other
    * side, handling single hot keys with ZERO code; it engages when
    * the partition exceeds `skewedPartitionThresholdInBytes` (256 MB
    * default) AND `skewedPartitionFactor`× the median. (3) This
    * manual salt, ONLY where AQE can't act: stateful streaming joins
    * (no adaptive re-planning of stateful shuffles), shuffled-hash
    * joins or plans whose required output partitioning forbids the
    * split, or pre-planned salting decided before any runtime stats
    * exist. The salt also changes the AGGREGATION story (a salted
    * groupBy two-phases a hot group), which AQE's join split does
    * not address.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 joinType: String, nSalts: Int, saltFrom: Column): DataFrame = {
    // null saltFrom must still land in a real bucket (salt 0) or the
    // row would match nothing and break result-equality with the
    // plain join; null JOIN KEYS never match either way, as in the
    // plain join
    val salted = big.withColumn("_salt",
      pmod(coalesce(saltFrom, lit(0)), lit(nSalts)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(lit((0 until nSalts).toArray)))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Bloom-pruned LEFT SEMI join (scale extension): the runtime-filter
    * pattern. One bounded aggregation pass over the build side makes a
    * Bloom filter of its join keys (the sketch, never the keys, comes
    * to the driver — ~1.2 MB per million keys at 1 % fpp); the sketch
    * broadcasts to every fact partition and drops non-matching rows AT
    * THE SCAN, before any exchange. The final semi join then removes
    * the Bloom's false positives, so the result is EXACTLY the plain
    * semi join (the oracle) — the sketch only changes how many fact
    * rows reach the shuffle. At 100 TB this is the difference between
    * shuffling the whole fact table and shuffling ~the matching rows;
    * it is what Spark's own InjectRuntimeFilter does for eligible
    * plans, available here as an explicit operator for shapes the
    * rule misses (pre-filtered dims, reused builds). Keys must be
    * integral (sketch hashes longs); `expectedItems`/`fpp` size the
    * sketch — an undersized filter only raises the pass-through rate,
    * never breaks correctness.
    *
    * The probe is the native `bloom_might_contain` Catalyst predicate
    * ([[graft.expressions.BloomMightContain]]), not a UDF: the
    * filtered scan stays inside whole-stage codegen, and the sketch
    * rides the plan as a binary literal deserialized once per task —
    * the same shape as Spark's internal `BloomFilterMightContain`.
    * A NULL fact key probes FALSE (a null never equi-joins), so the
    * pruned result is still exactly the plain semi join.
    */
  def bloomPrunedSemiJoin(fact: DataFrame, factKey: String,
                          dim: DataFrame, dimKey: String,
                          expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val sketch = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    sketch.writeTo(bos)
    fact.filter(call_function("bloom_might_contain",
        lit(bos.toByteArray), col(factKey).cast(LongType)))
      .join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_semi")
  }

  /** Batch sessionization (scale extension): number each row's
    * session within its `key`, where a new session starts when the
    * gap since the previous row exceeds `gapSeconds` (a gap of
    * EXACTLY `gapSeconds` stays in-session). Two stacked windows over
    * ONE partitioning — lag flags session starts, a running sum
    * numbers them — so the whole op is a single shuffle on the key,
    * and a following per-session rollup reuses that partitioning.
    * Gaps compare on floor-epoch-seconds (`unix_timestamp`), which is
    * what a SQL oracle can replay bit-identically; `tieCol` breaks
    * equal-timestamp ordering deterministically. Adds `es` (the
    * row's floor-epoch-seconds) and `sess_idx` (1-based).
    */
  def sessionize(df: DataFrame, key: String, tsCol: String, tieCol: String,
                 gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(tsCol), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("es", unix_timestamp(col(tsCol)))
      .withColumn("_new_sess",
        when(lag(col("es"), 1).over(w).isNull
          .or(col("es") - lag(col("es"), 1).over(w) > gapSeconds), 1L)
          .otherwise(0L))
      .withColumn("sess_idx", sum(col("_new_sess")).over(run))
      .drop("_new_sess")
  }

  /** SCD Type-2 dimension build: turn a change log (one row per
    * version of a key) into validity intervals — `valid_from` = the
    * change's own timestamp, `valid_to` = the NEXT change's timestamp
    * for the same key (null while current), `is_current` = no
    * successor. The warehouse-dimension shape the reference's
    * incremental merge (SER:309-365) feeds: its upsert keeps only the
    * latest row per key, SCD2 keeps the full history queryable by
    * as-of interval (pairs with [[rangeJoin]] for point-in-validity
    * lookups).
    *
    * ONE shuffle on the key; `lead` and the successor test ride the
    * same window pass. `tieCol` must make (tsCol, tieCol) a total
    * order per key — same determinism contract as [[sessionize]] and
    * `Corpus.packByBudget`. All payload columns pass through.
    */
  def scd2(changes: DataFrame, keys: Seq[String], tsCol: String,
           tieCol: String, validFrom: String = "valid_from",
           validTo: String = "valid_to",
           currentCol: String = "is_current"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn(validFrom, col(tsCol))
      .withColumn(validTo, lead(col(tsCol), 1).over(w))
      .withColumn(currentCol, col(validTo).isNull)
  }

  /** Incremental [[scd2]] maintenance: fold a DELTA of new change
    * rows into an existing SCD2 dimension without recomputing
    * history. Per-batch work scales with the delta (the d9/v13
    * incremental contract, applied to the warehouse dim): keys the
    * delta never mentions pass through UNTOUCHED — their rows are
    * never re-windowed — while touched keys' history (old versions ∪
    * delta rows) re-runs [[scd2]], which re-closes the previously
    * current version if a newer change arrived. Because scd2 is a
    * pure per-key function of that key's change set, the fold equals
    * the one-shot build over all changes — the law the spec and the
    * j15 oracle pin.
    *
    * The touched-key semi/anti joins are planned by stats: a typical
    * incremental batch touches few keys (broadcast), a backfill-sized
    * delta degrades to a hash join — both linear. `dim` must be a
    * [[scd2]] output (the interval columns are dropped before the
    * re-window); `delta` carries the change-log columns only.
    */
  def scd2Fold(dim: DataFrame, delta: DataFrame, keys: Seq[String],
               tsCol: String, tieCol: String,
               validFrom: String = "valid_from", validTo: String = "valid_to",
               currentCol: String = "is_current"): DataFrame = {
    val touched = delta.select(keys.map(col): _*).distinct()
    val untouched = dim.join(touched, keys, "left_anti")
    val reopened = dim.join(touched, keys, "left_semi")
      .drop(validFrom, validTo, currentCol)
    untouched.unionByName(
      scd2(reopened.unionByName(delta), keys, tsCol, tieCol,
        validFrom, validTo, currentCol))
  }

  /** Point-in-time (temporal) join: attach to each fact row the
    * `versionCol` of the [[scd2]] dimension version whose validity
    * interval contains the fact's `tsCol` — the lookup every
    * warehouse fact load against a versioned dimension needs, and the
    * consumer of [[scd2]]/[[scd2Fold]].
    *
    * Result is row-for-row the naive interval join (`valid_from <= ts
    * AND (valid_to IS NULL OR ts < valid_to)`, left outer) — which is
    * exactly what the j16 oracle replays — but the PLAN is
    * [[asofJoin]]'s union + one running-window pass: ONE shuffle on
    * the key, never the BroadcastNestedLoop a bare interval predicate
    * plans to. The equivalence holds because scd2 intervals are
    * contiguous per key (`valid_to` = the next `valid_from`), so
    * interval containment ≡ "the LATEST version with valid_from <=
    * ts"; facts before a key's first version get null, like the outer
    * join. Duplicate-timestamp change rows yield an empty interval
    * `[t, t)` that the naive join skips — the as-of tie rule (highest
    * `versionCol` at equal ts) picks the surviving interval, PROVIDED
    * `versionCol` is the same column the dim was built with as scd2's
    * `tieCol` (the contract).
    */
  def pitJoin(facts: DataFrame, dim: DataFrame, keys: Seq[String],
              tsCol: String, versionCol: String,
              validFrom: String = "valid_from"): DataFrame =
    asofJoin(facts,
      dim.select((keys.map(col) :+ col(validFrom).as(tsCol)
        :+ col(versionCol)): _*),
      keys, tsCol, versionCol)

  /** P9 (LAT:184) — drop rows where any of the listed key columns is
    * null (pandas `dropna(subset, how='any')`).
    */
  /** INCREMENTAL JOIN-VIEW MAINTENANCE — the join sibling of the
    * feed-driven aggregate maintenance (m7): fold two tables' change
    * feeds into a materialized equi-join WITHOUT recomputing it.
    * `vOld` is the previous materialization of `aOld ⋈ bOld` on
    * `joinKey` (A keyed by `aKey`, B keyed by `joinKey` — the
    * fact-to-dimension shape); `touchedA` / `touchedB` are the KEY
    * SETS each table's feed names (insert/update/delete alike — a
    * deleted key simply no longer exists in the new snapshot, so its
    * view rows vanish). The fold:
    *
    *  - KEEP every view row neither feed can have invalidated
    *    (aKey ∉ touchedA ∧ joinKey ∉ touchedB) — zero recompute;
    *  - RE-DERIVE the rows of touched facts against the current dim
    *    (touchedA-semi-joined A ⋈ B);
    *  - RE-DERIVE the rows of untouched facts whose DIM side moved
    *    (touchedB-semi-joined A, anti-joined against touchedA so the
    *    three arms partition the output) against the current dim.
    *
    * Per-fold work scales with the feeds' blast radius — touched
    * facts plus facts referencing touched dim keys (at warehouse
    * scale the latter scan prunes through the join-key's file
    * stats/blooms) — never with the view. The law `fold ≡ full
    * recompute` is exactly what the m19 oracle checks, and
    * RelationalSpec pins the update/delete/insert/dim-change arms.
    * Column contract: `vOld` has the same columns the plain
    * `aNew.join(bNew, joinKey)` produces (any projection applied to
    * both).
    */
  def maintainJoinView(vOld: DataFrame, aNew: DataFrame, bNew: DataFrame,
                       touchedA: DataFrame, touchedB: DataFrame,
                       aKey: String, joinKey: String): DataFrame = {
    val kept = vOld.join(touchedA, Seq(aKey), "left_anti")
      .join(touchedB, Seq(joinKey), "left_anti")
    val reA = aNew.join(touchedA, Seq(aKey), "left_semi")
      .join(bNew, Seq(joinKey))
    val reB = aNew.join(touchedA, Seq(aKey), "left_anti")
      .join(touchedB, Seq(joinKey), "left_semi")
      .join(bNew, Seq(joinKey))
    kept.unionByName(reA.select(kept.columns.map(col).toIndexedSeq: _*))
      .unionByName(reB.select(kept.columns.map(col).toIndexedSeq: _*))
  }

  def dropNullKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.na.drop("any", keys)

  /** F9 (SER:141,193-202) — parse ISO-8601 timestamps (with optional
    * zone offset) into session-zone-naive timestamps across many
    * columns in one projection. The reference does this per-cell via
    * `dateutil`; `to_timestamp` under a UTC session zone gives the
    * same tz-stripped instant, vectorized and codegen'd.
    */
  def parseTimestamps(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumns(cols.map(c => c -> to_timestamp(col(c))).toMap)

  /** F12 analog of pandas frame-wide fillna(0) (SER:63): fill numeric
    * columns with 0 and string columns with "0", per pandas' dtype
    * behavior.
    */
  def fillAll(df: DataFrame): DataFrame = {
    val numeric = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }
    val strings = df.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }
    df.na.fill(0, numeric.toSeq).na.fill("0", strings.toSeq)
  }
}
