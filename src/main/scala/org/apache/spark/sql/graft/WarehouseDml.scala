package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Cast, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.{ExpressionUtils, Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.LongType

import graft.io.Warehouse
import graft.sources.warehouse.WarehouseTable

/** The SQL DML plane for graft-warehouse tables: an analyzer
  * extension binding `UPDATE t SET … WHERE …` and `MERGE INTO t USING
  * s ON … WHEN …` statements to the verified [[Warehouse.updateWhere]]
  * / [[Warehouse.mergeStatement]] copy-on-write paths — the statement
  * form of the reference's own core upsert
  * (`New_Api_Sercom/function_app.py:309-365` lands CDC changes with
  * keyed UPDATEs; at 100 TB the same merge is one CoW pass over the
  * touched partitions).
  *
  * Spark plans these statements natively only for connectors
  * implementing `SupportsRowLevelOperations`, whose group-based plans
  * re-scan through the connector's own Batch — but this connector's
  * scan is deliberately a V1 bridge (the merge-on-read FOLD needs a
  * keyed aggregation no Batch can express, see
  * [[graft.sources.warehouse.WarehouseDataSource]]), so the honest
  * binding is one rule injected POST-HOC (after resolution, before
  * Spark's DML-rewrite batch would refuse the table): a fully-resolved
  * [[UpdateTable]]/[[MergeIntoTable]] over a current-snapshot
  * warehouse relation becomes a leaf command that executes the
  * warehouse pass — the pre-DSv2-row-level shape Delta shipped for
  * years. Everything expression-shaped is converted HERE, at analysis
  * time, into [[Column]]s (plan-opaque to Catalyst's reflection, so
  * the command survives CheckAnalysis as a clean leaf):
  *
  *  - UPDATE assignments/condition reference the TARGET row — rebound
  *    BY NAME onto the fresh snapshot frame the rewrite pass reads
  *    (attribute identity cannot survive into a different scan).
  *  - MERGE assignment VALUES reference the SOURCE side only (`WHEN
  *    MATCHED AND s.op = 'D' THEN DELETE` — the CDC shape); they keep
  *    their attribute identity because the command re-wraps the SAME
  *    analyzed source plan as its frame. Matched clause CONDITIONS
  *    may additionally compare against the stored row (`WHEN MATCHED
  *    AND s.updated_at > t.updated_at`, the reference's CDC guard) —
  *    target attributes rebind to the `_gm_t_<name>` aliases the pass
  *    attaches before the join. WHEN NOT MATCHED BY SOURCE clauses
  *    (full-table reconciliation) reference the target row only, the
  *    same way. Matched UPDATE assignment VALUES may reference the
  *    stored row too (`SET t.cnt = t.cnt + s.delta` — the
  *    incremental-aggregate upsert, Delta parity): the clause's
  *    values then evaluate over the matched pair through the same
  *    `_gm_t_<name>` rebinding. Non-key ON conjuncts (`ON t.id = s.id
  *    AND t.dt >= s.dt_floor`) become the pair-level RESIDUAL and
  *    participate in matching itself — a key-equal pair failing the
  *    residual is NOT matched. `WITH SCHEMA EVOLUTION` widens the
  *    table by the source columns a star clause carries beyond the
  *    target schema. An ON with zero key equalities is refused with
  *    a pointer to the merge API, never silently misplanned.
  *
  * This file lives under `org.apache.spark.sql` for the same reason
  * Delta's does: [[LeafRunnableCommand]] and `Dataset.ofRows` are
  * package-private extension seams.
  */
class WarehouseDmlRule(spark: SparkSession) extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  /** The predicate's pushable conjuncts as DSv1 [[Filter]]s, computed
    * at analysis time: the command hands them to the warehouse's
    * stats/bloom file skipping for the touched-partition DISCOVERY
    * scan, so `UPDATE … WHERE id = x` on a compacted table discovers
    * from ~the files that can carry the id instead of scanning the
    * table. Untranslatable conjuncts just drop from the pruning set —
    * pruning is a superset filter, the full predicate still decides
    * every row.
    */
  private def pruningFilters(condition: Option[Expression]):
      Seq[org.apache.spark.sql.sources.Filter] =
    condition.toSeq.flatMap(splitConjunctivePredicates).flatMap { e =>
      // Time-dependent expressions (current_timestamp()/now()/
      // current_date()/localtimestamp()) report foldable=true and
      // evaluate at ANY time they are asked — so folding one HERE, at
      // analysis time, would pin the pruning bound to analysis time
      // while the real predicate re-evaluates later in the discovery/
      // count/rewrite jobs. The bound would then NOT be a superset of
      // the executed predicate (files holding rows between analysis
      // and execution time get pruned and silently skipped). Drop such
      // conjuncts — and anything nondeterministic — from the pruning
      // set entirely; pruning is a superset filter, the full predicate
      // still decides every row.
      val timeDependent = e.exists {
        case _: org.apache.spark.sql.catalyst.expressions.CurrentTimestampLike => true
        case _: org.apache.spark.sql.catalyst.expressions.CurrentDate => true
        case _: org.apache.spark.sql.catalyst.expressions.LocalTimestamp => true
        case _: org.apache.spark.sql.catalyst.expressions.CurrentBatchTimestamp => true
        case x => !x.deterministic
      }
      if (timeDependent) Seq.empty
      else {
        val folded = e.transformUp {
          case x if x.foldable && !x.isInstanceOf[
              org.apache.spark.sql.catalyst.expressions.Literal] =>
            org.apache.spark.sql.catalyst.expressions.Literal
              .create(x.eval(null), x.dataType)
        }
        org.apache.spark.sql.execution.datasources.DataSourceStrategy
          .translateFilter(folded, supportNestedPredicatePushdown = false)
      }
    }

  private def warehouseOf(plan: LogicalPlan): Option[(String, DataSourceV2Relation)] = {
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, child) => unwrap(child)
      case other => other
    }
    unwrap(plan) match {
      case r: DataSourceV2Relation => r.table match {
        case t: WarehouseTable if t.isCurrentSnapshot => Some((t.tablePath, r))
        case _ => None
      }
      case _ => None
    }
  }

  /** Rebind a resolved target-side expression BY NAME so it can
    * evaluate against the fresh frame the rewrite pass reads: every
    * attribute becomes an [[UnresolvedAttribute]] carrying just its
    * name (target columns are unique by name, so this is lossless).
    */
  private def byName(e: Expression): Column =
    ExpressionUtils.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  /** A source-side expression keeps its attribute identity — the
    * command evaluates it over the SAME analyzed source plan.
    */
  private def sourceOnly(e: Expression, source: AttributeSet,
                         what: String): Column = {
    require(e.references.subsetOf(source),
      s"graft-warehouse MERGE supports $what over the SOURCE side only " +
        s"(got $e) - conditions/values over target columns need the " +
        "merge API's version algebra (Warehouse.mergeInto)")
    ExpressionUtils.column(e)
  }

  /** A PAIR-level clause condition (references both sides — `WHEN
    * MATCHED AND s.updated_at > t.updated_at`, the CDC guard): source
    * attributes keep their identity (the command re-wraps the same
    * analyzed source plan), target attributes rebind to the reserved
    * `_gm_t_<name>` aliases [[graft.io.Warehouse.mergeStatement]]
    * attaches to the base frame before the join — post-join
    * resolution is never ambiguous against same-named source columns.
    * Returns the rebound column plus the referenced target names.
    */
  private def pairCond(e: Expression, source: AttributeSet,
                       target: AttributeSet): (Column, Seq[String]) = {
    require(e.references.subsetOf(source ++ target),
      s"MERGE clause condition references columns of neither side: $e")
    val tRefs = scala.collection.mutable.ArrayBuffer.empty[String]
    val rebound = e.transform {
      case a: AttributeReference if target.contains(a) =>
        tRefs += a.name
        UnresolvedAttribute.quoted(s"_gm_t_${a.name}")
    }
    (ExpressionUtils.column(rebound), tRefs.toSeq.distinct)
  }

  /** A WHEN NOT MATCHED BY SOURCE expression references the TARGET
    * row only (there is no source row) — every attribute rebinds to
    * the `_gm_t_<name>` alias form.
    */
  private def targetOnly(e: Expression, target: AttributeSet,
                         what: String): (Column, Seq[String]) = {
    require(e.references.subsetOf(target),
      s"WHEN NOT MATCHED BY SOURCE $what references the TARGET row only " +
        s"(got $e) - there is no source row to read")
    val tRefs = e.references.map(_.name).toSeq.distinct
    val rebound = e.transform {
      case a: AttributeReference =>
        UnresolvedAttribute.quoted(s"_gm_t_${a.name}")
    }
    (ExpressionUtils.column(rebound), tRefs)
  }

  /** Aligned UPDATE assignments include identity entries (col := its
    * own attribute) for unassigned columns — skip them so the rewrite
    * only casts/overlays what the statement actually set.
    */
  private def isIdentity(key: Expression, value: Expression): Boolean =
    (key, value) match {
      case (k: AttributeReference, v: AttributeReference) => k.exprId == v.exprId
      case (k: AttributeReference, Cast(v: AttributeReference, _, _, _)) =>
        k.exprId == v.exprId
      case _ => false
    }

  private def nameOf(key: Expression): String = key match {
    case a: Attribute => a.name
    case other => throw new UnsupportedOperationException(
      s"graft-warehouse DML cannot assign to nested field $other - " +
        "only top-level columns")
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    // ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS a, b / FOR ALL
    // COLUMNS — Spark has no v2 binding for this statement (the child
    // resolves to a ResolvedTable, then CheckAnalysis refuses), so
    // route it to the warehouse's `_colstats` rollup
    // (Warehouse.analyzeColumns — the stats the pre-CBO join-reorder
    // rule consumes)
    case a: AnalyzeColumn =>
      val wt = a.child match {
        case r: org.apache.spark.sql.catalyst.analysis.ResolvedTable =>
          r.table match {
            case t: WarehouseTable if t.isCurrentSnapshot => Some(t)
            case _ => None
          }
        case _ => None
      }
      wt.fold(plan) { t =>
        val cols =
          if (a.allColumns) t.schema().fieldNames.toSeq
          else a.columnNames.getOrElse(Nil)
        AnalyzeWarehouseCommand(t.tablePath, cols)
      }

    case u @ UpdateTable(table, assignments, condition)
        if u.resolved && warehouseOf(table).isDefined =>
      val (path, _) = warehouseOf(table).get
      val assigns = assignments.collect {
        case Assignment(key, value) if !isIdentity(key, value) =>
          nameOf(key) -> byName(value)
      }
      UpdateWarehouseCommand(path, assigns, condition.map(byName),
        pruningFilters(condition))

    case m @ MergeIntoTable(target, source, cond, matchedActions,
        notMatchedActions, notMatchedBySource, withSchemaEvolution)
        if m.resolved && warehouseOf(target).isDefined =>
      val (path, relation) = warehouseOf(target).get
      val targetAttrs = AttributeSet(relation.output)
      val sourceAttrs = AttributeSet(source.output)
      val pairIdx = scala.collection.mutable.Set.empty[Int]
      val pairValueIdx = scala.collection.mutable.Set.empty[Int]
      val tCondCols = scala.collection.mutable.ArrayBuffer.empty[String]
      // the ON condition: equality conjuncts pinning one target key
      // column to one source-side expression drive the keyed merge
      // (single or COMPOSITE keys — the shape every verified warehouse
      // write path shares); any OTHER conjunct (`AND t.dt >=
      // s.dt_floor`, Delta parity) becomes the pair-level RESIDUAL,
      // part of matching itself. At least one key equality is
      // required — a key-free ON would make every merge a cross join.
      val keyPairsBuf = scala.collection.mutable.ArrayBuffer.empty[(String, Column)]
      val residualBuf = scala.collection.mutable.ArrayBuffer.empty[Expression]
      splitConjunctivePredicates(cond).foreach {
        case EqualTo(l: AttributeReference, r)
            if targetAttrs.contains(l) && r.references.subsetOf(sourceAttrs) &&
              !keyPairsBuf.exists(_._1 == l.name) =>
          keyPairsBuf += ((l.name, ExpressionUtils.column(r)))
        case EqualTo(l, r: AttributeReference)
            if targetAttrs.contains(r) && l.references.subsetOf(sourceAttrs) &&
              !keyPairsBuf.exists(_._1 == r.name) =>
          keyPairsBuf += ((r.name, ExpressionUtils.column(l)))
        case other => residualBuf += other
      }
      if (keyPairsBuf.isEmpty) throw new UnsupportedOperationException(
        s"graft-warehouse MERGE needs at least one ON <target key column> " +
          s"= <source expression> equality conjunct (got $cond) - a " +
          "key-free ON cannot drive a keyed merge")
      val keyPairs: Seq[(String, Column)] = keyPairsBuf.toSeq
      val residual: Option[Column] = residualBuf
        .reduceOption(org.apache.spark.sql.catalyst.expressions.And)
        .map { e =>
          val (column, tRefs) = pairCond(e, sourceAttrs, targetAttrs)
          tCondCols ++= tRefs
          column
        }
      def srcCond(c: Option[Expression], what: String): Option[Column] =
        c.map(sourceOnly(_, sourceAttrs, what))
      def srcAssigns(as: Seq[Assignment], what: String): Seq[(String, Column)] =
        as.map(a => nameOf(a.key) ->
          sourceOnly(a.value, sourceAttrs, what))
      // a matched clause condition may compare against the STORED row
      // (`WHEN MATCHED AND s.updated_at > t.updated_at`, the CDC
      // guard): such clauses evaluate over the matched pair — record
      // the clause index and the referenced target columns for the
      // command (values stay source-side)
      def matchedCond(c: Option[Expression], i: Int): Option[Column] =
        c.map { e =>
          if (e.references.subsetOf(sourceAttrs))
            sourceOnly(e, sourceAttrs, "WHEN MATCHED conditions")
          else {
            val (column, tRefs) = pairCond(e, sourceAttrs, targetAttrs)
            pairIdx += i
            tCondCols ++= tRefs
            column
          }
        }
      // star expansion: assign every target column from the same-named
      // source column; WITH SCHEMA EVOLUTION additionally lands source
      // columns the target lacks (the table widens by them)
      def starAssigns(star: String): Seq[(String, Column)] = {
        val known = relation.output.map { a =>
          val s = source.output.find(_.name == a.name).getOrElse(
            throw new UnsupportedOperationException(
              s"$star needs source column '${a.name}'"))
          a.name -> ExpressionUtils.column(s)
        }
        val extra =
          if (withSchemaEvolution)
            source.output.filterNot(s =>
                relation.output.exists(_.name == s.name))
              .map(s => s.name -> ExpressionUtils.column(s))
          else Nil
        known ++ extra
      }
      // matched-UPDATE assignment values may reference the STORED row
      // (`SET t.cnt = t.cnt + s.delta`, the incremental-aggregate
      // upsert): the clause's assignments then all evaluate over the
      // matched pair — the same `_gm_t_<name>` rebinding as pair-level
      // conditions, applied to the value side
      def matchedAssigns(assigns: Seq[Assignment], i: Int): Seq[(String, Column)] =
        if (assigns.forall(_.value.references.subsetOf(sourceAttrs)))
          srcAssigns(assigns, "UPDATE SET values")
        else {
          pairValueIdx += i
          assigns.map { a =>
            val (column, tRefs) = pairCond(a.value, sourceAttrs, targetAttrs)
            tCondCols ++= tRefs
            nameOf(a.key) -> column
          }
        }
      val matched = matchedActions.zipWithIndex.map {
        case (DeleteAction(c), i) =>
          (matchedCond(c, i), None)
        case (UpdateAction(c, assigns, _), i) =>
          (matchedCond(c, i), Some(matchedAssigns(assigns, i)))
        case (UpdateStarAction(c), i) =>
          (matchedCond(c, i), Some(starAssigns("UPDATE SET *")))
        case (other, _) => throw new UnsupportedOperationException(
          s"unsupported WHEN MATCHED action $other")
      }
      // WHEN NOT MATCHED BY SOURCE: full-table reconciliation —
      // delete/deactivate target rows whose key vanished from the
      // source; conditions and values reference the TARGET row only
      val bySource = notMatchedBySource.map {
        case DeleteAction(c) =>
          (c.map { e =>
            val (column, tRefs) =
              targetOnly(e, targetAttrs, "conditions")
            tCondCols ++= tRefs
            column
          }, None)
        case UpdateAction(c, assigns, _) =>
          val cond = c.map { e =>
            val (column, tRefs) =
              targetOnly(e, targetAttrs, "conditions")
            tCondCols ++= tRefs
            column
          }
          // alignment may inject identity entries (col := itself) —
          // skip them, as the UPDATE branch does
          val as = assigns.filterNot(a => isIdentity(a.key, a.value))
            .map { a =>
              val (column, tRefs) =
                targetOnly(a.value, targetAttrs, "UPDATE SET values")
              tCondCols ++= tRefs
              nameOf(a.key) -> column
            }
          (cond, Some(as))
        case other => throw new UnsupportedOperationException(
          s"unsupported WHEN NOT MATCHED BY SOURCE action $other - " +
            "DELETE and UPDATE SET <target expressions> are the " +
            "reconciliation arms")
      }
      // ordered, first-applicable — several conditional INSERT arms
      // are the Delta shape (`WHEN NOT MATCHED AND s.kind = 'a' THEN
      // INSERT … WHEN NOT MATCHED THEN INSERT …`)
      val notMatched = notMatchedActions.map {
        case InsertAction(c, assigns) =>
          (srcCond(c, "WHEN NOT MATCHED conditions"),
            srcAssigns(assigns, "INSERT values"))
        case InsertStarAction(c) =>
          (srcCond(c, "WHEN NOT MATCHED conditions"),
            starAssigns("INSERT *"))
        case other => throw new UnsupportedOperationException(
          s"unsupported WHEN NOT MATCHED action $other")
      }
      // TBLPROPERTIES('deletionVectors'='true') (or the per-read
      // option) routes MATCHED-DELETE rows of otherwise-untouched
      // partitions into O(deleted rows) sidecars - the same opt-in
      // that switches DELETE FROM to deleteWhereDv
      val dvRoute = relation.table match {
        case t: WarehouseTable => t.dvDeletes
        case _ => false
      }
      MergeWarehouseCommand(path, source, keyPairs.map(_._1),
        keyPairs.map(_._2), matched, notMatched,
        pairIdx.toSet, tCondCols.toSeq.distinct, bySource,
        withSchemaEvolution, pairValueIdx.toSet, residual, dvRoute)

    case _ => plan
  }
}

/** A [[DataSourceV2ScanRelation]] whose logical statistics come from
  * the wrapped warehouse scan's [[WarehouseV1Scan.estimateStatistics]]
  * — manifest bytes + footer row counts. Spark's
  * `DataSourceV2ScanRelation.computeStats` consults the SCAN for
  * statistics, but V1 fallback scans are wrapped in a plain
  * [[V1ScanWrapper]] that hides `SupportsReportStatistics`, so every
  * V1-bridge connector's statistics silently degrade to
  * `defaultSizeInBytes` (effectively infinite — a small warehouse
  * dimension would never auto-broadcast through the SQL plane).
  * [[WarehouseStatsRule]] re-wraps the node with this subclass late in
  * optimization, so physical planning (JoinSelection's broadcast
  * threshold, AQE's initial estimates) sees the table's REAL
  * cardinality. Subclassing keeps every existing pattern match and
  * `makeCopy` shape intact — only `computeStats` changes.
  */
class StatsReportingScanRelation(
    relation: DataSourceV2Relation,
    scan: org.apache.spark.sql.connector.read.Scan,
    output: Seq[AttributeReference],
    keyGroupedPartitioning: Option[Seq[Expression]],
    ordering: Option[Seq[org.apache.spark.sql.catalyst.expressions.SortOrder]])
    extends org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation(
      relation, scan, output, keyGroupedPartitioning, ordering) {

  /** Distinct from the base node under case-class equality IN BOTH
    * directions — without this, `transform`/`mapChildren`'s fastEquals
    * sees the rewrapped node as "unchanged" (same fields) and silently
    * keeps the original. canEqual alone fixes only one direction:
    * mapChildren compares NEW fastEquals OLD, where the inherited
    * case equals would still say true.
    */
  override def canEqual(that: Any): Boolean =
    that.isInstanceOf[StatsReportingScanRelation]

  override def equals(that: Any): Boolean = that match {
    case _: StatsReportingScanRelation => super.equals(that)
    case _ => false
  }

  override def hashCode(): Int = super.hashCode()

  override def computeStats(): org.apache.spark.sql.catalyst.plans.logical.Statistics =
    scan match {
      case w: org.apache.spark.sql.execution.datasources.v2.V1ScanWrapper =>
        w.v1Scan match {
          case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
            DataSourceV2Relation.transformV2Stats(
              s.estimateStatistics(), None, conf.defaultSizeInBytes, output)
          case _ => super.computeStats()
        }
      case _ => super.computeStats()
    }
}

/** Optimizer extension restoring statistics flow for warehouse V1
  * scans (see [[StatsReportingScanRelation]]). Registered through
  * `spark.experimental.extraOptimizations` (the "User Provided
  * Optimizers" batch — the only seam that runs AFTER the scan-pushdown
  * batch creates the relations this rewrites; physical planning reads
  * statistics later still, so JoinSelection sees the result).
  */
class WarehouseStatsRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
        if !r.isInstanceOf[StatsReportingScanRelation] && (r.scan match {
          case w: org.apache.spark.sql.execution.datasources.v2.V1ScanWrapper =>
            w.v1Scan.isInstanceOf[graft.sources.warehouse.WarehouseV1Scan]
          case _ => false
        }) =>
      new StatsReportingScanRelation(r.relation, r.scan, r.output,
        r.keyGroupedPartitioning, r.ordering)
  }
}

/** `ANALYZE TABLE graft.… COMPUTE STATISTICS FOR COLUMNS` as a leaf
  * command — one distributed aggregation into the `_colstats` sidecar
  * ([[Warehouse.analyzeColumns]]).
  */
case class AnalyzeWarehouseCommand(path: String, cols: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    Warehouse.analyzeColumns(spark, path, cols)
    Seq.empty
  }
}

/** `UPDATE graft.…` as a leaf command: all expressions arrive
  * pre-converted to name-bound [[Column]]s (see [[WarehouseDmlRule]]),
  * so Catalyst sees a clean leaf; run() executes the copy-on-write
  * pass and reports the SQL-standard affected-row count.
  */
case class UpdateWarehouseCommand(path: String,
    assignments: Seq[(String, Column)], condition: Option[Column],
    pruning: Seq[org.apache.spark.sql.sources.Filter])
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(AttributeReference("num_affected_rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val n = graft.sources.warehouse.WarehouseDataSource.updateWhereSkipping(
      spark, path, assignments,
      condition.getOrElse(org.apache.spark.sql.functions.lit(true)), pruning)
    Seq(Row(n))
  }
}

/** `MERGE INTO graft.…` as a leaf command. The analyzed source plan
  * rides along as a field (innerChildren — displayed, never planned
  * until run()), so the pre-converted source-side [[Column]]s resolve
  * against it by attribute identity.
  */
case class MergeWarehouseCommand(path: String, source: LogicalPlan,
    targetKeys: Seq[String], sourceKeys: Seq[Column],
    matched: Seq[(Option[Column], Option[Seq[(String, Column)]])],
    notMatched: Seq[(Option[Column], Seq[(String, Column)])],
    pairLevel: Set[Int] = Set.empty,
    targetCondCols: Seq[String] = Nil,
    notMatchedBySource: Seq[(Option[Column], Option[Seq[(String, Column)]])] = Nil,
    schemaEvolution: Boolean = false,
    pairValues: Set[Int] = Set.empty,
    residual: Option[Column] = None,
    dvRoute: Boolean = false)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val src = CDataset.ofRows(spark.asInstanceOf[CSparkSession], source)
    Warehouse.mergeStatement(spark, path, src, targetKeys, sourceKeys,
      matched, notMatched, maxAttempts = 5, pairLevel = pairLevel,
      targetCondCols = targetCondCols,
      notMatchedBySource = notMatchedBySource,
      schemaEvolution = schemaEvolution,
      pairValues = pairValues, residual = residual,
      dvRoute = dvRoute)
    Seq.empty
  }
}
