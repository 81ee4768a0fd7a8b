package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus-construction operators shared by the c-family queries:
  * the packing step that turns a cleaned, deduplicated document set
  * into fixed-budget training sequences.
  */
object Corpus {

  /** Token-budget sequence packing via the running-offset rule: walk
    * each stratum's documents in `orderCol` order and assign a
    * document starting at running token offset `o` to pack
    * `floor(o / budget)` — i.e. a pack boundary falls every `budget`
    * tokens of cumulative length. This is the order-deterministic,
    * SQL-expressible form of sequence packing (equivalent to a
    * sequential fold over the sorted stratum — the law pinned in
    * `CorpusProps`), chosen over bin-packing heuristics because the
    * assignment is a pure function of the row set: every engine and
    * every rerun packs identically, which is what makes a 100 TB
    * corpus build resumable and auditable.
    *
    * Plan shape: ONE shuffle on the stratum key; the cumulative sum
    * is a single running-frame window pass, and the pack id is a
    * scalar projection on top of it — no second exchange, no
    * self-join. A document longer than `budget` keeps its own start
    * offset (it overflows its pack rather than splitting), matching
    * the common pack-then-truncate training recipe.
    *
    * CONTRACT: `orderCol` must be unique within each stratum. The
    * running window (and therefore the pack id) is only deterministic
    * for a total per-stratum order — with duplicate order values the
    * cumulative sum depends on physical row order, the same defect
    * class the repo's ORDER BY totality audit closes for the oracles.
    * Every in-repo caller passes the unique `doc_id`.
    *
    * The pack id uses integral division (`div`), not double `/`, so
    * the fold law holds for ALL Long offsets — a double mantissa
    * would silently round once a stratum's cumulative offset passed
    * 2^53 tokens (real territory for a 100 TB corpus in one stratum).
    *
    * Returns the input columns plus `packCol` (LongType).
    */
  def packByBudget(df: DataFrame, stratumCol: String, orderCol: String,
      tokensCol: String, budget: Long,
      packCol: String = "pack_id"): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    val w = Window.partitionBy(stratumCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sum(col(tokensCol)).over(w)
    df.withColumn(packCol,
      call_function("div", (cum - col(tokensCol)).cast(LongType), lit(budget)))
  }

  /** [[packByBudget]] plus the in-pack START OFFSET of each document:
    * `posCol` = (cumulative offset) mod budget — where the doc's
    * first token lands inside its pack's token buffer. This is the
    * other half of what a packed-pretraining data loader consumes:
    * `pack_id` says WHICH sequence a document joins, `pack_pos` says
    * WHERE, and together they let the loader materialize the packed
    * batch (and its attention-mask segment boundaries) without
    * re-scanning neighbours. Same single window pass — the offset is
    * one more scalar projection over the identical cumulative sum, so
    * the plan (one stratum shuffle) and the determinism contract
    * (`orderCol` total per stratum) are unchanged.
    */
  def packWithOffsets(df: DataFrame, stratumCol: String, orderCol: String,
      tokensCol: String, budget: Long, packCol: String = "pack_id",
      posCol: String = "pack_pos"): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    val w = Window.partitionBy(stratumCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val off = (sum(col(tokensCol)).over(w) - col(tokensCol)).cast(LongType)
    df.withColumn(packCol, call_function("div", off, lit(budget)))
      .withColumn(posCol, pmod(off, lit(budget)).cast(LongType))
  }
}
