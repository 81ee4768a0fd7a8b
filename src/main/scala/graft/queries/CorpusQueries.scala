package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Tables
import graft.functions.TextFns
import graft.operators.{Corpus, TopK}

/** Corpus-construction operators (LLM-data-pipeline surface): the
  * sampling / mixing / packing decisions a training-data pipeline
  * makes AFTER cleaning and dedup. All deterministic — sampling keys
  * off content-independent md5 hashes, never RNG state — so every
  * rerun (and the DuckDB oracle) selects the identical rows; that
  * reproducibility is itself the production requirement (a resampled
  * corpus must be reconstructable from the recipe).
  */
object CorpusQueries {

  /** 60-bit md5-derived sampling hash of the id (hex chars 1-15 —
    * always positive in a signed long), uniform enough for quota
    * work and identical in any engine.
    */
  private def sampleHash(c: org.apache.spark.sql.Column) =
    TextFns.hash60Col(c.cast(StringType))

  private val sampleHashSql =
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"

  val qs: Seq[Q] = Seq(

    // C1 — deterministic hash sampling: keep ~10% of documents by
    // hash bucket. Reproducible across runs/engines (no RNG), cheap
    // (map-only, pipelined with the scan), and composable: the same
    // predicate re-selects the identical subset at 100 TB.
    Q("c1_hash_sample",
      (s, d) => Tables.documents(s, d)
        .withColumn("h", sampleHash(col("doc_id")))
        .filter(col("h") % 10 === 0)
        .select("doc_id", "lang")
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang FROM documents
             |WHERE $sampleHashSql % 10 = 0
             |ORDER BY doc_id""".stripMargin)),

    // C2 — stratified quota sampling: at most N documents per
    // language, chosen by hash order (not "first N seen", which would
    // bias toward storage order). Reuses the bounded TopK aggregate —
    // the same partial k-heap plan as the ANN queries, so the shuffle
    // carries ≤ strata×N rows, never the corpus.
    Q("c2_stratified_quota",
      (s, d) => {
        val scored = Tables.documents(s, d)
          .select(col("lang"), col("doc_id").as("cand_id"),
            sampleHash(col("doc_id")).cast(DoubleType).as("score"))
        TopK.perGroup(scored, "lang", "cand_id", "score", k = 50)
          .select(col("lang"), col("rn"), col("cand_id").as("doc_id"))
          .orderBy("lang", "rn")
      },
      Some(s"""SELECT lang, rn, doc_id FROM (
             |  SELECT lang, doc_id,
             |    row_number() OVER (PARTITION BY lang
             |      ORDER BY CAST($sampleHashSql AS DOUBLE) DESC, doc_id) AS rn
             |  FROM documents)
             |WHERE rn <= 50 ORDER BY lang, rn""".stripMargin)),

    // C4 — weighted mixture sampling: per-language keep RATES (the
    // corpus-mixing recipe — e.g. upsample scarce languages) applied
    // via hash thresholds, so the mixture is reproducible and the
    // filter is map-only. Unknown languages default to 10%.
    Q("c4_mixture_sample",
      (s, d) => {
        val rates: Map[String, Long] = Map( // keep-rate × 1e6
          "en" -> 250000L, "es" -> 500000L, "fr" -> 750000L, "de" -> 1000000L)
        val rate = rates.foldLeft(lit(100000L)) { case (acc, (lang, r)) =>
          when(col("lang") === lang, lit(r)).otherwise(acc)
        }
        Tables.documents(s, d)
          .withColumn("h", sampleHash(col("doc_id")) % 1000000L)
          .filter(col("h") < rate)
          .select("doc_id", "lang")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, lang FROM documents
             |WHERE $sampleHashSql % 1000000 <
             |  CASE lang WHEN 'en' THEN 250000 WHEN 'es' THEN 500000
             |            WHEN 'fr' THEN 750000 WHEN 'de' THEN 1000000
             |            ELSE 100000 END
             |ORDER BY doc_id""".stripMargin)),

    // C3 — token-budget packing: assign documents to fixed-budget
    // packs per language via a running token offset (pack boundary
    // every 2048 tokens of cumulative length in doc-id order). The
    // running-offset rule is the order-deterministic, SQL-expressible
    // form of sequence packing; one shuffle on the stratum key, the
    // cumulative sum is a single window pass.
    Q("c3_token_packing",
      (s, d) => Corpus.packByBudget(
          Tables.documents(s, d)
            .select(col("lang"), col("doc_id"),
              size(TextFns.toks(col("text"))).cast(LongType).as("n_tokens")),
          "lang", "doc_id", "n_tokens", budget = 2048L)
        .select("lang", "doc_id", "n_tokens", "pack_id")
        .orderBy("lang", "doc_id"),
      Some(raw"""SELECT lang, doc_id, n_tokens,
             |  CAST(floor((cum - n_tokens) / 2048) AS BIGINT) AS pack_id
             |FROM (SELECT lang, doc_id, n_tokens,
             |        sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             |          ROWS UNBOUNDED PRECEDING) AS cum
             |      FROM (SELECT lang, doc_id,
             |              CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens
             |            FROM documents))
             |ORDER BY lang, doc_id""".stripMargin)),

    // C13 — packing WITH in-pack offsets: pack_pos = where each doc's
    // first token lands inside its pack's buffer — what the packed-
    // pretraining loader needs to materialize the batch and its
    // attention-mask segment boundaries without re-scanning
    // neighbours. Same one-window-pass plan as c3: pack_id and
    // pack_pos are two scalar projections over ONE cumulative sum.
    Q("c13_pack_offsets",
      (s, d) => Corpus.packWithOffsets(
          Tables.documents(s, d)
            .select(col("lang"), col("doc_id"),
              size(TextFns.toks(col("text"))).cast(LongType).as("n_tokens")),
          "lang", "doc_id", "n_tokens", budget = 2048L)
        .select("lang", "doc_id", "n_tokens", "pack_id", "pack_pos")
        .orderBy("lang", "doc_id"),
      Some(raw"""SELECT lang, doc_id, n_tokens,
             |  CAST(floor((cum - n_tokens) / 2048) AS BIGINT) AS pack_id,
             |  CAST((cum - n_tokens) % 2048 AS BIGINT) AS pack_pos
             |FROM (SELECT lang, doc_id, n_tokens,
             |        sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             |          ROWS UNBOUNDED PRECEDING) AS cum
             |      FROM (SELECT lang, doc_id,
             |              CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens
             |            FROM documents))
             |ORDER BY lang, doc_id""".stripMargin)),

    // C7 — deterministic per-epoch reshuffle: every training epoch
    // orders the corpus by hash(doc_id ":" epoch) — a reproducible,
    // RNG-free permutation that changes per epoch, and any shard of
    // it is re-derivable from the recipe alone (seekable resume: a
    // restarted job recomputes order without reading a saved
    // permutation). The query surfaces the first 30 positions of two
    // epochs; the full-scale materialization is a range-partition +
    // sort on the same hash (a total order with no single-reducer
    // bottleneck), exactly like the z-order write path.
    Q("c7_epoch_shuffle",
      (s, d) => {
        val w = Window.partitionBy("epoch")
          .orderBy(col("h"), col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"),
            explode(array(lit(0), lit(1))).as("epoch"))
          .withColumn("h", sampleHash(
            concat(col("doc_id").cast(StringType), lit(":"),
              col("epoch").cast(StringType))))
          .withColumn("pos", row_number().over(w))
          .filter(col("pos") <= 30)
          .select("epoch", "pos", "doc_id")
          .orderBy("epoch", "pos")
      },
      Some("""WITH x AS (SELECT doc_id, e.epoch
             |          FROM documents CROSS JOIN (VALUES (0), (1)) AS e(epoch)),
             |h AS (SELECT doc_id, epoch,
             |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
             |          || CAST(epoch AS VARCHAR)), 1, 15)) AS BIGINT) AS h
             |      FROM x),
             |r AS (SELECT epoch, doc_id,
             |        row_number() OVER (PARTITION BY epoch
             |          ORDER BY h, doc_id) AS pos
             |      FROM h)
             |SELECT epoch, pos, doc_id FROM r WHERE pos <= 30
             |ORDER BY epoch, pos""".stripMargin)),

    // C10 — integer repeat-factor UPSAMPLING: the other half of the
    // mixture recipe. c4 thins over-represented sources by hash rate
    // (keep-rate < 1); c10 multiplies under-represented ones by an
    // integer epochs-per-language factor (rate > 1, the "epochs"
    // column of a published data-mixture table), tagging each copy
    // with its epoch index so downstream packing/shuffling (c3/c7)
    // can treat copies as distinct schedulable rows. Deterministic by
    // construction — replication is a pure function of (doc, factor),
    // no RNG — so the oracle and any rerun produce the identical
    // multiset. Plan shape at scale: map-only explode of a ≤factor-
    // element sequence literal per row — no shuffle, no join against
    // a factor table (the recipe is a CASE literal, exactly how c4
    // inlines its rates); output size is sum(factor_lang × n_lang),
    // the number a mixture designer already budgeted for.
    Q("c10_repeat_upsample",
      (s, d) => {
        val factors: Map[String, Long] = Map( // epochs per language
          "en" -> 1L, "es" -> 2L, "fr" -> 3L, "de" -> 3L)
        val factor = factors.foldLeft(lit(2L)) { case (acc, (lang, f)) =>
          when(col("lang") === lang, lit(f)).otherwise(acc)
        }
        Tables.documents(s, d)
          .withColumn("epoch", explode(sequence(lit(1L), factor)))
          .select("doc_id", "lang", "epoch")
          .orderBy("doc_id", "epoch")
      },
      Some("""SELECT doc_id, lang,
             |  unnest(generate_series(1, CASE lang
             |    WHEN 'en' THEN 1 WHEN 'es' THEN 2
             |    WHEN 'fr' THEN 3 WHEN 'de' THEN 3 ELSE 2 END)) AS epoch
             |FROM documents
             |ORDER BY doc_id, epoch""".stripMargin)),

    // C11 — sliding-window document CHUNKING: split every document
    // into fixed-token-budget training chunks with overlap (budget 64,
    // stride 48 ⇒ 16 tokens of overlap), the step that turns cleaned
    // documents into model-length sequences. Rule: chunk starts are
    // 1, 1+stride, 1+2·stride, … while start ≤ n_tokens; each chunk is
    // the next `budget` tokens from its start, so trailing chunks may
    // be short and every token is covered (the final ≤overlap-length
    // tail chunks are kept — a trainer that wants to drop them filters
    // on n_chunk_tokens, the rule stays total and engine-agnostic).
    //
    // Plan shape at scale: map-ONLY — starts are a per-row sequence,
    // chunks are array-local slices riding the explode, so nothing
    // shuffles but the deterministic output sort; output rows =
    // Σ ceil(n_i/stride), the corpus text is read once and never
    // re-joined to itself. (doc_id, chunk_id) is a total key.
    Q("c11_chunk_documents",
      (s, d) => {
        val (budget, stride) = (64, 48)
        val tk = TextFns.toks(col("text"))
        Tables.documents(s, d)
          .select(col("doc_id"), tk.as("tk"))
          .select(col("doc_id"), col("tk"),
            posexplode(sequence(lit(1), size(col("tk")), lit(stride)))
              .as(Seq("chunk_id", "start_tok")))
          .select(col("doc_id"),
            col("chunk_id").cast(LongType).as("chunk_id"),
            col("start_tok").cast(LongType).as("start_tok"),
            size(slice(col("tk"), col("start_tok"), lit(budget)))
              .cast(LongType).as("n_chunk_tokens"),
            concat_ws(" ", slice(col("tk"), col("start_tok"), lit(budget)))
              .as("chunk_text"))
          .orderBy("doc_id", "chunk_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |        regexp_split_to_array(trim(lower(text)), '\s+') AS tk
             |      FROM documents),
             |st AS (SELECT doc_id, tk,
             |        unnest(generate_series(1, len(tk), 48)) AS start_tok
             |      FROM t),
             |c AS (SELECT doc_id,
             |        (start_tok - 1) // 48 AS chunk_id, start_tok,
             |        list_slice(tk, start_tok,
             |          least(start_tok + 63, len(tk))) AS chunk
             |      FROM st)
             |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
             |  CAST(start_tok AS BIGINT) AS start_tok,
             |  CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
             |  array_to_string(chunk, ' ') AS chunk_text
             |FROM c
             |ORDER BY doc_id, chunk_id""".stripMargin)),

    // C12 — TEMPERATURE-scaled mixture sampling (τ = 0.5): keep-rate
    // per language ∝ 1/√n_lang, so expected kept counts go as √n_lang
    // — the standard temperature downweighting of over-represented
    // languages (multilingual-sampling / DoReMi family). Unlike c4,
    // whose rates are a hand-written recipe literal, c12's rates are
    // computed FROM the corpus — the canonical two-pass "global
    // statistics drive the per-row policy" shape: pass 1 is a tiny
    // per-language count (column-pruned to `lang`, partial-aggregated
    // map-side), broadcast back; pass 2 filters rows against the
    // broadcast threshold, map-only. Nothing shuffles but |langs|
    // partial counts and the output sort; the corpus never self-joins.
    //
    // Determinism across engines: thresholds stay integral —
    // floor(8e6/√n) with IEEE-correctly-rounded sqrt and division is
    // bit-identical in Spark and DuckDB, and the kept set is then a
    // pure integer hash comparison (no order-dependent float sums,
    // the repo's oracle float rule).
    Q("c12_temperature_mixture",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .groupBy("lang").agg(count(lit(1)).as("n_lang"))
          .withColumn("keep_thr",
            least(lit(1000000L),
              floor(lit(8000000.0) / sqrt(col("n_lang")))))
          .select("lang", "keep_thr")
        Tables.documents(s, d)
          .join(broadcast(counts), Seq("lang"))
          .filter(sampleHash(col("doc_id")) % 1000000L < col("keep_thr"))
          .select("doc_id", "lang", "keep_thr")
          .orderBy("doc_id")
      },
      Some(s"""WITH n AS (SELECT lang, count(*) AS n_lang
             |           FROM documents GROUP BY lang),
             |t AS (SELECT lang, least(1000000,
             |        CAST(floor(8000000 / sqrt(n_lang)) AS BIGINT))
             |          AS keep_thr
             |      FROM n)
             |SELECT d.doc_id, d.lang, t.keep_thr
             |FROM documents d JOIN t USING (lang)
             |WHERE $sampleHashSql % 1000000 < t.keep_thr
             |ORDER BY doc_id""".stripMargin)),

    // C14 — quality-WEIGHTED soft sampling: per-document keep-rate
    // rises with a quality signal instead of a hard cutoff — the
    // DCLM/FineWeb-classifier recipe (hard filters discard the
    // mid-quality mass that still teaches; soft sampling keeps it at
    // reduced rate). Deterministic per-doc coin: keep iff
    // hash(doc) mod 1000 < rate_milli where rate_milli =
    // least(900, 100 + 2000·stopword_density) — floor 10% (coverage
    // never hits zero), cap 90%, all integral `div` arithmetic so
    // Spark and the oracle agree bit-for-bit. Unlike c12's two-pass
    // corpus-statistic policy this rate is row-LOCAL: the whole
    // query is map-only (spec-pinned), the 100 TB shape of a
    // first-pass filter.
    Q("c14_quality_weighted_sample",
      (s, d) => {
        val tk = TextFns.toks(col("text"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            size(tk).cast(LongType).as("n_tokens"),
            TextFns.vocabHits(tk, graft.queries.TextQueries.stopEn).as("n_stop"))
          .withColumn("rate_milli",
            least(lit(900L), lit(100L) + call_function("div",
              col("n_stop") * 2000L, greatest(col("n_tokens"), lit(1L)))))
          .filter(sampleHash(col("doc_id")) % 1000 < col("rate_milli"))
          .select("doc_id", "lang", "rate_milli")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, lang, rate_milli FROM (
             |  SELECT doc_id, lang,
             |    least(900, 100 + (n_stop * 2000) // greatest(n_tokens, 1))
             |      AS rate_milli
             |  FROM (SELECT doc_id, lang,
             |          len(regexp_split_to_array(trim(lower(text)), '\\s+'))
             |            AS n_tokens,
             |          len(list_filter(
             |            regexp_split_to_array(trim(lower(text)), '\\s+'),
             |            t -> list_contains(['the', 'a', 'of', 'and', 'is',
             |                                'to', 'in'], t))) AS n_stop
             |        FROM documents))
             |WHERE $sampleHashSql % 1000 < rate_milli
             |ORDER BY doc_id""".stripMargin))
  )
}
