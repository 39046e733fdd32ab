package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Exprs._

/** Text-analysis operators for a large-scale training-data pipeline over the
  * `documents` table (`doc_id, text, lang, source, n_chars`): tokenization,
  * quality scoring, n-gram language ID, document fingerprinting.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (split / lambda higher-order functions / regex) — no UDFs, so the whole
  * pipeline stays inside WholeStageCodegen and scales linearly with input
  * splits: no shuffle at all until the final (tiny) aggregate.
  */
object TextOps {
  /** Whitespace tokens. One place so every operator agrees. */
  def tokens(text: Column): Column = split(text, " ")

  /** Tuning constants shared between Spark defaults and their generated
    * mirrors (the shared-constant discipline — a changed default
    * re-renders the oracle, so desync is impossible by construction). */
  val VocabMinCount = 2L
  val VocabMaxSize = 65536
  val GrowthBuckets = 100
  val CollocMinCount = 5L
  val CollocTopK = 100
  /** Winnowing (MOSS): word-k-gram shingles, window of `WinnowW` hashes. */
  val WinnowK = 3
  val WinnowW = 4
  /** Temperature-mix sampling budget (tokens allocated across languages). */
  val MixBudgetTokens = 1000000L
  /** Gopher-style character/word-shape thresholds — tuned so the synthetic
    * corpus splits non-degenerately (alpha ratios cluster 0.79–0.85, mean
    * word lengths 3.7–5.3; the r10 "tune report constants" rule). */
  val GopherMinAlpha = 0.82
  val GopherMinWordLen = 4.0
  val GopherMaxWordLen = 5.0
  /** Kneser-Ney continuation-count report size. */
  val KnTopK = 100
  /** DSIR constants: target split residue (the doc_id % 25 == 0
    * benchmark-split convention), vocabulary cap, and the micro-nat
    * quantization scale for the log importance ratios. */
  val DsirTargetMod = 25
  val DsirMaxVocab = 65536
  val DsirLogScale = 1000000L

  /** A BPE-ish subword count approximation: whitespace tokens plus
    * intra-token transitions from letter-runs to digit-runs (a cheap,
    * deterministic proxy for subword splits — real BPE needs a learned
    * vocab). */
  def approxSubwordCount(text: Column): Column =
    size(split(text, " ")) +
      size(regexp_extract_all(text, lit("[a-zA-Z]+[0-9]"), lit(0)))

  /** Per-language token statistics: doc counts, token totals, char means. */
  def tokenStats(documents: DataFrame): DataFrame =
    documents.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast(LongType)).as("total_tokens"),
        round2(sum(col("n_chars")).cast("double") / count(lit(1)))
          .as("avg_chars"))
      // NULLS LAST pinned (the countUniqueDocs rule): a null lang would
      // otherwise flip row order between engines — found by the fuzzer
      .orderBy(col("lang").asc_nulls_last)

  /** Per-document quality signals: length, token count, mean word length,
    * lexical diversity (distinct/total tokens), stopword ratio,
    * terminal-punctuation count. These are the standard cheap filters a
    * pretraining pipeline applies before dedup. */
  def qualityScores(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    documents.select(
        col("doc_id"),
        col("n_chars"),
        size(toks).cast(LongType).as("n_tokens"),
        round2((col("n_chars") - (size(toks) - lit(1))).cast("double") /
          size(toks), 2).as("avg_word_len"),
        diversityExpr(toks).as("lexical_diversity"),
        stopwordExpr(toks).as("stopword_ratio"),
        size(regexp_extract_all(col("text"), lit("[.!?]"), lit(0)))
          .cast(LongType).as("n_sentence_marks"))
      .orderBy("doc_id")
  }

  // single Spark-side definition of the two ratio scores, shared by
  // qualityScores and qualityFlags (the oracle's DocQualitySelect is the
  // DuckDB twin); 4dp rounding so threshold comparisons are
  // engine-identical
  private[ext] def diversityExpr(toks: Column): Column =
    round2(size(array_distinct(toks)).cast("double") / size(toks), 4)
  private[ext] def stopwordExpr(toks: Column): Column =
    round2(size(filter(toks, t => t.isin(StopEn: _*))).cast("double") /
      size(toks), 4)

  /** 2-D Pareto SKYLINE over (n_tokens ↑, lexical_diversity ↑) — the
    * multi-objective curation frontier: documents no other document beats
    * on both length and diversity (≥ on both, > on at least one). Equal
    * points co-survive (neither dominates).
    *
    * Shape: never the quadratic dominance self-join the semantics state.
    * Per-token-count group maxima first (a bounded frame: distinct token
    * counts ≤ the longest document, not the corpus), then one cumulative
    * max over that frame ordered by n_tokens DESC (the runningRevenue
    * bounded-window scale argument), broadcast back onto the corpus: a doc
    * survives iff it holds its group's max diversity AND strictly beats
    * the cumulative max over all LONGER docs. The mirror states the naive
    * NOT EXISTS dominance query, so the hash gate certifies the
    * decomposition ≡ naive semantics including tie handling. Diversity is
    * the 4dp-rounded shared expression ([[diversityExpr]]) — already
    * engine-identical, so the dominance comparisons mirror exactly. */
  def skylineDocs(documents: DataFrame): DataFrame = {
    // null-text docs carry NULL metrics and cannot participate in
    // dominance — dropped EXPLICITLY (the equi-join below would drop
    // them anyway; the mirror's NOT EXISTS would instead let them
    // survive as vacuous skyline members — null-text parity)
    val q = documents.filter(col("text").isNotNull)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast(LongType).as("n_tokens"),
        diversityExpr(tokens(col("text"))).as("lexical_diversity"))
    val grp = q.groupBy("n_tokens")
      .agg(max(col("lexical_diversity")).as("gmax"))
    val cum = grp.withColumn("cmax",
      max(col("gmax")).over(Window.orderBy(col("n_tokens").desc)
        .rowsBetween(Window.unboundedPreceding, -1)))
    q.join(broadcast(cum), "n_tokens")
      .filter(col("lexical_diversity") === col("gmax") &&
        (col("cmax").isNull || col("lexical_diversity") > col("cmax")))
      .select(col("doc_id"), col("n_tokens"), col("lexical_diversity"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
  }

  /** Collocation mining: the top-k adjacent-token bigrams ranked by PMI
    * lift `(c_xy/N_bi) / ((c_x/N)·(c_y/N))` — the phrase-mining pass a
    * tokenizer-vocabulary or stop-phrase pipeline runs over a corpus.
    *
    * EXACT on the hash gate despite the "statistical" score: every count
    * is a long, longs below 2^53 convert to double exactly, and IEEE
    * multiply/divide are correctly rounded — so the identical operation
    * sequence in both engines yields identical bits (the
    * q_revenue_anomalies discipline), including the ORDER BY on the
    * score. The naive long product `c_xy·N·N` would overflow int64 at
    * corpus scale, which is exactly why the arithmetic goes through
    * doubles. Minimum-count floor keeps rare-pair noise (and tiny-count
    * PMI explosions) out.
    *
    * Shape: TWO pruned scans of the text column, each tokenizing once
    * (the unigram and bigram explodes are independent subtrees — the
    * domainRebalance multi-scan trade: re-reading a one-column projection
    * beats materializing a corpus-sized token frame); counts are
    * map-side-partial hash aggregates on token keys, PINNED after
    * aggregation because each bounded frame has multiple consumers (uni
    * feeds the totals and both endpoint joins; bi feeds the totals and
    * the result); the two total frames are 1-row broadcasts; the unigram
    * join is vocabulary-sized (AQE picks broadcast at test SF). Top-k
    * compiles to TakeOrderedAndProject — never a full sort. */
  def collocations(documents: DataFrame, minCount: Long = CollocMinCount,
      topK: Int = CollocTopK): DataFrame = {
    val withToks = documents.select(tokens(col("text")).as("toks"))
    val uni = withToks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val bi = withToks
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |  i -> struct(toks[i-1] AS w1, toks[i] AS w2))"""
          .stripMargin.replace("\n", " "))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
      .localCheckpoint(true)
    val totals = uni.agg(sum(col("c")).as("n_tok"))
      .crossJoin(bi.agg(sum(col("c_xy")).as("n_bi")))
    bi
      .join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c_xy"),
        // fixed operation sequence, mirrored verbatim: all inputs exact
        (col("c_xy").cast("double") * col("n_tok").cast("double") *
          col("n_tok").cast("double") /
          (col("n_bi").cast("double") * col("c_x").cast("double") *
            col("c_y").cast("double"))).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Heaps-law vocabulary growth: how the distinct-token count grows as
    * the corpus is consumed in doc_id order — the curve a tokenizer-vocab
    * sizing or dataset-scaling study reads (vocab ∝ tokens^β). Sampled at
    * `buckets` checkpoints so the output is bounded regardless of corpus
    * size.
    *
    * Fully decomposed — no corpus-sized window anywhere: doc ranks come
    * from [[graft.ops.Ordinals.globalRowNumbers]] (range repartition +
    * bounded offset frame), each token's FIRST document is a map-side-
    * partial `min` aggregate, the token's checkpoint bucket is an
    * EQUI-join of first_doc onto the ranked doc frame (never a range
    * probe), and the cumulative vocabulary is a window over the
    * `buckets`-row frame only. */
  def vocabGrowth(documents: DataFrame, buckets: Int = GrowthBuckets): DataFrame = {
    val ranked = graft.ops.Ordinals.globalRowNumbers(
      documents.select(col("doc_id")), Seq(col("doc_id")))
    val n = ranked.agg(count(lit(1)).as("n"))
    val docBuckets = ranked.crossJoin(broadcast(n))
      .select(col("doc_id"), expr(s"((rn - 1) * $buckets) div n").as("bucket"))
    val firstDoc = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(min(col("doc_id")).as("first_doc"))
    val newPerBucket = firstDoc.join(docBuckets,
        firstDoc("first_doc") === docBuckets("doc_id"))
      .groupBy("bucket").agg(count(lit(1)).as("n_new_tokens"))
    docBuckets.groupBy("bucket")
      .agg(max(col("doc_id")).as("last_doc_id"), count(lit(1)).as("n_docs"))
      .join(newPerBucket, Seq("bucket"), "left_outer")
      .select(col("bucket"), col("last_doc_id"), col("n_docs"),
        coalesce(col("n_new_tokens"), lit(0L)).as("n_new_tokens"))
      .withColumn("cum_vocab",
        sum(col("n_new_tokens")).over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("bucket")
  }

  // per-row rule expressions (too_short, low_diversity, low_stopword),
  // shared by the report and the filter
  private def qualityFlags(minTokens: Int, minDiversity: Double,
      minStopword: Double): Seq[Column] = {
    val toks = tokens(col("text"))
    Seq(
      size(toks).cast(LongType) < minTokens,
      diversityExpr(toks) < minDiversity,
      stopwordExpr(toks) < minStopword)
  }

  /** Rule-based quality gate (the Gopher-style cheap-filter pass a
    * pretraining pipeline applies before dedup): one boolean per rule plus
    * the combined keep decision, so downstream can both filter and report
    * per-rule drop rates. Single per-row pass over the corpus; no second
    * scan per rule, no aggregation. */
  def qualityFilter(documents: DataFrame, minTokens: Int = 15,
      minDiversity: Double = 0.3, minStopword: Double = 0.02): DataFrame = {
    val Seq(short, lowDiv, lowStop) =
      qualityFlags(minTokens, minDiversity, minStopword)
    documents
      .select(col("doc_id"), short.as("too_short"),
        lowDiv.as("low_diversity"), lowStop.as("low_stopword"))
      .withColumn("kept",
        !col("too_short") && !col("low_diversity") && !col("low_stopword"))
      .orderBy("doc_id")
  }

  /** Default blocked vocabulary for [[blocklistFilter]] — stands in for the
    * C4/RefinedWeb badwords list (the real lists are thousands of terms;
    * the mechanism is identical). SORTED so the rendered oracle IN-list and
    * the Spark literal array agree positionally as well as set-wise. */
  val Blocklist: Seq[String] = Seq("dup", "error", "slow").sorted

  /** The blocked vocabulary rendered for the generated DuckDB mirror. */
  def blocklistSql: String = Blocklist.map(w => s"'$w'").mkString(", ")

  /** C4-style blocklist gate: per document, how many tokens hit the blocked
    * vocabulary, WHICH distinct terms hit (sorted, comma-joined — a string
    * so the hash gate compares a stable rendering, not array semantics),
    * and the keep decision. The standard badwords pass a pretraining
    * pipeline runs alongside the quality gate.
    *
    * One per-row pass: tokenize once into a materialized column, then the
    * occurrence count rides a `filter` HOF whose lambda touches only the
    * token variable and a literal set (the round-6 small-fan-out rule), and
    * the distinct-hit list rides codegen'd `array_intersect` + `array_sort`
    * against the same literal array. No shuffle, no join — the gate pushes
    * down with the scan; at 100 TB a real list would swap the literal
    * IN-set for an Aho-Corasick-style custom expression, same plumbing. */
  def blocklistFilter(documents: DataFrame,
      blocklist: Seq[String] = Blocklist): DataFrame = {
    val blockedArr = array(blocklist.sorted.map(lit): _*)
    documents
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        // null text blocks NOTHING (kept=true, 0 hits) — the mirror's
        // NULL-tolerant arithmetic lands there; force it Spark-side
        // (size(filter(null)) is NULL — the null-text-parity rule)
        coalesce(size(filter(col("toks"), t => t.isin(blocklist: _*)))
          .cast(LongType), lit(0L)).as("n_blocked"),
        concat_ws(",", array_sort(array_intersect(col("toks"), blockedArr)))
          .as("blocked_terms"))
      .withColumn("kept", col("n_blocked") === 0L)
      .orderBy("doc_id")
  }

  /** The surviving corpus: documents passing every [[qualityFilter]] rule.
    * The rules are per-row, so this is a pure map-side filter — no join, no
    * shuffle, pushes down with the scan like any predicate. */
  def keepClean(documents: DataFrame, minTokens: Int = 15,
      minDiversity: Double = 0.3, minStopword: Double = 0.02): DataFrame =
    documents.filter(!qualityFlags(minTokens, minDiversity, minStopword)
      .reduce(_ || _))

  /** End-to-end curation pass in ONE declarative plan — the composition a
    * pretraining pipeline actually runs, staged in the canonical order so
    * cheap filters shrink the data before expensive ones see it:
    * (1) per-row quality gate ([[qualityFilter]] rules); (2) exact dedup
    * among survivors (md5 group, min-doc_id keeper); (3) benchmark
    * decontamination among remaining survivors
    * ([[Decontaminate.contaminationReport]] ≥ `contThreshold`, bench =
    * the `doc_id % benchResidue == 0` split). Emits every corpus doc with
    * its `drop_reason` — the FIRST failing stage ('quality' | 'exact_dup'
    * | 'contaminated') or null for keepers — so drop-rate accounting per
    * stage falls out of one group-by.
    *
    * Stage order is load-bearing for the labels (a low-quality exact dup
    * reads 'quality') and for cost (the quality gate is a pushed-down
    * per-row predicate, so dedup hashes and contamination shingles are
    * computed only for survivors). Catalyst sees the whole composition as
    * one plan: the corpus scan feeds the gate once, and each stage's
    * output is the next stage's input without materialization. */
  def curationReport(documents: DataFrame, benchResidue: Int = 25,
      contThreshold: Double = 0.5): DataFrame = {
    val corpus = documents.filter(col("doc_id") % benchResidue =!= 0)
    val bench = documents.filter(col("doc_id") % benchResidue === 0)
    val qual = qualityFilter(corpus)
      .select(col("doc_id"), (!col("kept")).as("q_fail"))
    // the gate is a PER-ROW predicate: apply it directly (pushes to the
    // scan) rather than via a doc_id self-join against `qual` — `qual` is
    // only joined once at the end, where the label genuinely needs it
    val surv1 = keepClean(corpus)
    val dupIds = surv1
      .withColumn("rk", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy("doc_id")))
      .filter(col("rk") > 1)
      .select(col("doc_id"), lit(true).as("is_dup"))
    val surv2 = surv1.join(dupIds.select("doc_id"), Seq("doc_id"), "left_anti")
    val contIds = Decontaminate.contaminationReport(surv2, bench)
      .filter(col("contamination") >= contThreshold)
      .select(col("doc_id"), lit(true).as("is_cont"))
    corpus
      .select(col("doc_id"),
        size(tokens(col("text"))).cast(LongType).as("n_tokens"))
      .join(qual, Seq("doc_id"))
      .join(dupIds, Seq("doc_id"), "left")
      .join(contIds, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        when(col("q_fail"), "quality")
          .when(col("is_dup"), "exact_dup")
          .when(col("is_cont"), "contaminated").as("drop_reason"))
      .orderBy("doc_id")
  }

  // Minimal stopword marker sets per language (public common-word lists).
  val StopEn = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "you")
  val StopDe = Seq("der", "die", "das", "und", "ist", "ich", "nicht", "ein", "eine", "zu")
  val StopEs = Seq("el", "los", "que", "y", "en", "un", "una", "se", "por", "como")
  val StopFr = Seq("le", "les", "et", "est", "je", "ne", "pas", "vous", "dans", "ce")

  private def hits(toks: Column, stops: Seq[String]): Column =
    size(filter(toks, t => t.isin(stops: _*)))

  /** Deterministic n-gram/stopword language ID: CJK codepoints short-circuit
    * to `zh`; otherwise argmax of per-language stopword hit counts with a
    * fixed tie order (en > de > es > fr), `und` when nothing matches.
    * Integer scoring — no float comparisons — so the decision is identical
    * across engines and partitionings. Counting is one
    * [[TextExpressions.stopwordCounts]] pass (the per-language lambda
    * formulation pays one interpreted eval per token per language). */
  def langIdExpr(text: Column): Column =
    when(text.rlike("[一-鿿]"), "zh")
      .otherwise(TextExpressions.langGuess(text,
        Seq(StopEn, StopDe, StopEs, StopFr),
        Seq("en", "de", "es", "fr"), fallback = "und"))

  /** Confusion-matrix counts of predicted vs labeled language. Null text
    * predicts 'und' (the expression itself null-propagates; the mirror's
    * CASE falls through to ELSE 'und' — force ONE semantics Spark-side,
    * the round-6 null-text-parity rule). */
  def langIdEval(documents: DataFrame): DataFrame =
    documents
      .select(col("lang"),
        coalesce(langIdExpr(col("text")), lit("und")).as("predicted_lang"))
      .groupBy("lang", "predicted_lang")
      .agg(count(lit(1)).as("n_docs"))
      // NULLS LAST pinned: fuzzer-found engine row-order divergence
      .orderBy(col("lang").asc_nulls_last, col("predicted_lang"))

  /** Top-k terms per document by a TF-IDF-style weight,
    * `tf * (N+1)/(df+1)` — a rational idf instead of the logarithmic one so
    * the weight is exact integer arithmetic in IEEE doubles (identical in
    * any engine; `ln` implementations differ at the ulp and would make
    * rank boundaries engine-dependent). Rankings are the same as log-idf's
    * for fixed tf (both strictly decreasing in df).
    *
    * Plan: explode → two hash aggregates (term frequency, document
    * frequency) → broadcast-joined corpus size → per-doc rank window with
    * the window-group-limit pushdown. */
  def topTermsPerDoc(documents: DataFrame, k: Int = 3): DataFrame = {
    val tf = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = documents.select(count(lit(1)).as("n"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("w",
        col("tf").cast("double") * (col("n") + 1) / (col("df") + 1))
    val byDoc = Window.partitionBy("doc_id")
      .orderBy(col("w").desc, col("term"))
    scored
      .withColumn("rnk", row_number().over(byDoc).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"),
        round2(col("w"), 4).as("weight"))
      .orderBy("doc_id", "rnk")
  }

  /** Compression-ratio quality signal ([[TextExpressions.deflateRatio]]):
    * DEFLATE compressed/raw bytes per document, plus the
    * too-compressible flag (templated boilerplate / repeated spans sit
    * far below natural prose). One map-side expression pass — no
    * shuffle except the output sort; JVM-deterministic but not portable
    * SQL, so this is a rows-only surface entry with spec ground truth.
    * The flag fails CLOSED on null ratios (empty docs) per the
    * publish-gate discipline. */
  def compressionQuality(documents: DataFrame,
      minRatio: Double = 0.3): DataFrame =
    documents
      .select(col("doc_id"),
        round2(graft.ext.TextExpressions.deflateRatio(col("text")), 4)
          .as("deflate_ratio"))
      .withColumn("too_compressible",
        coalesce(col("deflate_ratio") < minRatio, lit(true)))
      .orderBy("doc_id")

  /** [[compressionDistribution]] bucket width denominator (0.05-wide
    * ratio buckets) — shared with the generated mirror. */
  val CompressionBucketWidth = 20

  /** Buckets strictly below this index flag too-compressible (bucket 6 =
    * ratio 0.30, the [[compressionQuality]] default boundary) — shared
    * with the generated mirror as an INTEGER compare, so the verdict
    * never touches a float threshold. */
  val CompressionFlagBucket = 6

  /** The CORPUS half of the compression-distribution report: DEFLATE
    * ratio per doc (one map-side expression pass), 4dp-rounded, floored
    * onto [[CompressionBucketWidth]]-denominator buckets, counted per
    * bucket. Null ratios (empty docs) drop on a stated filter. The
    * result is BOUNDED (≤ ~25 occupied buckets) — the planted artifact
    * the generated mirror replays. */
  def compressionBuckets(documents: DataFrame): DataFrame =
    documents
      .select(round2(
        graft.ext.TextExpressions.deflateRatio(col("text")), 4).as("ratio"))
      .filter(col("ratio").isNotNull)
      .select(floor(col("ratio") * CompressionBucketWidth)
        .cast(LongType).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_docs"))

  /** The DERIVED half, promoted onto the hash gate (the q_bpe_tokens
    * generated-oracle discipline): everything after the non-portable
    * ratio — cumulative docs over the bounded bucket frame, the 4dp
    * cumulative share (double division of exact longs, floor-trick
    * rounded), the bucket's lower edge as an IEEE-exact-op double, and
    * the too-compressible verdict as an integer bucket compare — runs
    * identically in both engines from the same planted (bucket, n_docs)
    * pairs. */
  def compressionDistFromCounts(spark: SparkSession,
      counts: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val wCum = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(lit(1))
    counts.toDF("bucket", "n_docs")
      .withColumn("cum_docs", sum(col("n_docs")).over(wCum))
      .withColumn("total", sum(col("n_docs")).over(wAll))
      .select(col("bucket"),
        (col("bucket").cast("double") / lit(CompressionBucketWidth.toDouble))
          .as("ratio_lo"),
        col("n_docs"), col("cum_docs"),
        round2(col("cum_docs").cast("double") / col("total").cast("double"),
          4).as("cum_share"),
        (col("bucket") < lit(CompressionFlagBucket.toLong))
          .as("too_compressible"))
      .orderBy("bucket")
  }

  /** [[phraseSearch]] probe phrase — shared with the generated mirror. */
  val PhraseTokens: Seq[String] = Seq("hash", "join")

  /** Positional inverted-index postings: one (doc_id, pos, term) row per
    * token occurrence, positions 1-BASED (the DuckDB array convention the
    * cleaned-text mirrors already pinned). This is the classic build side
    * of a distributed search index — term-keyed, explode-only (no
    * shuffle until a consumer aggregates by term). Null texts drop on
    * both engines (posexplode of a null array emits nothing). */
  def positionalPostings(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos0", "term")))
      .select(col("doc_id"), (col("pos0") + 1).cast(LongType).as("pos"),
        col("term"))

  /** Exact phrase search over [[positionalPostings]]: consecutive-position
    * adjacency joins chain one per phrase token (the standard positional-
    * index probe), then a per-doc rollup of match count and first hit.
    * Each join side filters to ONE term before joining — at index scale
    * the probe touches only the phrase terms' postings lists, never the
    * corpus. Output rides the hash gate against a generated mirror whose
    * join chain renders from the SAME phrase constant. */
  def phraseSearch(documents: DataFrame,
      phrase: Seq[String] = PhraseTokens): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val postings = positionalPostings(documents)
    val first = postings.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matches = phrase.zipWithIndex.tail.foldLeft(first) {
      case (acc, (tok, i)) =>
        acc.as("a").join(
          postings.filter(col("term") === tok)
            .select(col("doc_id").as("d"), col("pos").as("p")).as("b"),
          col("a.doc_id") === col("b.d") && col("b.p") === col("a.pos") + i)
          .select(col("a.doc_id").as("doc_id"), col("a.pos").as("pos"))
    }
    matches.groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"), min(col("pos")).as("first_pos"))
      .orderBy("doc_id")
  }

  /** Seeded deterministic corpus shuffle — the per-epoch training-order
    * reshuffle every LLM data loader needs: position = global rank of
    * `md5(seed:doc_id)` (doc_id tiebreak for a TOTAL order). A new seed
    * string yields an independent-looking permutation; the SAME seed is
    * bit-reproducible across runs, partitionings and engines (md5 of a
    * decimal string — the [[splitExpr]] discipline).
    *
    * Scale: the rank is [[graft.ops.Ordinals.globalRowNumbers]] — range
    * repartition + per-partition numbering + a bounded offset frame —
    * never the single-task sort a bare `row_number() OVER (ORDER BY …)`
    * window would force on the corpus. */
  /** Default epoch seed for [[epochShuffle]]'s query entry — shared with
    * the oracle mirror. */
  val EpochSeed = "epoch1"

  def epochShuffle(documents: DataFrame, seed: String): DataFrame =
    graft.ops.Ordinals.globalRowNumbers(
        documents.select(col("doc_id")),
        Seq(md5(concat_ws(":", lit(seed), col("doc_id").cast("string"))),
          col("doc_id")),
        idColName = "shuffle_pos")
      .select(col("doc_id"), col("shuffle_pos"))
      .orderBy("shuffle_pos")

  /** Temperature-scaled mixture allocation (α = 0.5): apportion a sampling
    * budget across sources proportionally to `n_docs^α` — the standard
    * down-weighting of dominant sources when mixing a training corpus
    * (α = 1 is proportional, α → 0 uniform). Exact Hamilton
    * largest-remainder apportionment: per-source base = ⌊budget·w/W⌋, the
    * leftover seats go to the largest fractional remainders (source-name
    * tiebreak), so quotas always sum EXACTLY to the budget — no silent
    * renormalization.
    *
    * Engine-stable by construction (the q_revenue_anomalies discipline):
    * `sqrt` is IEEE-correctly-rounded, the weight quantizes to a 9-dp
    * DECIMAL so the cross-source sum W is EXACT (order-independent —
    * never a shuffle-order-dependent double sum), and each share is ONE
    * double division of identical exact inputs → identical bits, making
    * even the remainder RANKING hash-gateable. The ranking window is over
    * the sources-sized frame (bounded, like budgetCore's boundary
    * bucket), never the corpus. */
  /** Default sampling budget for [[mixtureAllocation]] — shared with the
    * generated oracle mirror (the shared-constant discipline). */
  val MixtureBudget = 1000L

  def mixtureAllocation(documents: DataFrame,
      budget: Long = MixtureBudget): DataFrame = {
    val counts = documents.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    // pinned: tot / share / leftover / rank all branch from this
    // sources-sized frame — without pinning, the corpus scan+aggregate
    // would appear once PER BRANCH in the plan and a single pass would
    // silently depend on ReuseExchange (the Ordinals discipline)
    val w = counts.withColumn("wq",
      round2(sqrt(col("n_docs").cast("double")), 9).cast("decimal(18,9)"))
      .localCheckpoint(true)
    val tot = w.agg(sum(col("wq")).as("w_total"))
    val sh = w.crossJoin(broadcast(tot))
      .withColumn("share",
        (lit(budget) * col("wq")).cast("double") /
          col("w_total").cast("double"))
      .withColumn("base", floor(col("share")).cast("long"))
      .withColumn("rem", col("share") - floor(col("share")))
    val leftover = sh.agg((lit(budget) - sum(col("base"))).as("leftover"))
    val ranked = sh.withColumn("rk",
      row_number().over(Window.orderBy(col("rem").desc, col("source")))
        .cast(LongType))
    ranked.crossJoin(broadcast(leftover))
      .select(col("source"), col("n_docs"),
        (col("base") +
          when(col("rk") <= col("leftover"), 1L).otherwise(0L)).as("quota"))
      .orderBy("source")
  }

  /** Deterministic train/test assignment: first hex digit of md5(doc_id)
    * < 'c' → train (12/16 = 75%), else test. Hash-based splitting is the
    * only assignment that survives reprocessing at 100 TB — stable under
    * re-partitioning, re-runs, and incremental additions, unlike
    * `rand()`-based sampling (and md5-of-decimal-string is reproducible in
    * any engine, so the split itself is oracle-checkable). */
  def splitExpr(id: Column): Column =
    when(substring(md5(id.cast("string")), 1, 1) < "c", "train")
      .otherwise("test")

  /** Per-(split, lang) corpus composition after deterministic splitting. */
  def trainTestSplit(documents: DataFrame): DataFrame =
    documents
      .groupBy(splitExpr(col("doc_id")).as("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
      // NULLS LAST pinned: fuzzer-found engine row-order divergence
      .orderBy(col("split"), col("lang").asc_nulls_last)

  /** Deterministic stratified sample: the `perStratum` docs with the
    * smallest md5(doc_id) per language — hash-ordering is a uniform draw
    * without replacement that is reproducible under any partitioning and
    * engine (the rand()-free sibling of [[splitExpr]]). Plans as a window
    * group limit: each partition forwards at most `perStratum` rows per
    * stratum before the shuffle. */
  def stratifiedSample(documents: DataFrame, perStratum: Int = 5): DataFrame = {
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    documents
      .select(col("lang"), col("doc_id"),
        row_number().over(w).cast(LongType).as("rn"))
      .filter(col("rn") <= perStratum)
      // NULLS LAST pinned (the countUniqueDocs rule)
      .orderBy(col("lang").asc_nulls_last, col("rn"))
  }

  /** Token-budget curation — keep the highest-QUALITY documents until a
    * token budget is exhausted (the "best N tokens" selection every
    * fixed-compute training run starts from): docs ordered by lexical
    * diversity (4dp, the [[qualityScores]] metric) descending with doc_id
    * tiebreak, kept while the running token total stays ≤ `budget`.
    *
    * Scale: the naive form is a prefix sum over one global ORDER BY — an
    * unpartitioned window that drags the corpus into a single task. Here
    * the prefix sum DECOMPOSES over the bounded score domain: (1) per-score
    * token sums (map-side-combined hash aggregate; ≤ 10001 distinct 4dp
    * scores, so the frame is bounded like runningRevenue's per-day frame);
    * (2) a cumsum over that bounded frame decides full buckets; (3) ONLY
    * the single boundary bucket's docs need a per-doc running sum — a
    * window partitioned by one score value over one bucket's docs,
    * filtered before the window (worst case, a corpus-constant score,
    * degrades to the naive form — on real corpora the boundary bucket is
    * tiny). Output: selected docs ordered by (quality desc, doc_id). */
  def tokenBudgetSelect(documents: DataFrame,
      budget: Long = 20000L): DataFrame =
    budgetCore(documents, budget, Nil)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      .orderBy(col("quality").desc, col("doc_id"))

  /** [[tokenBudgetSelect]] with an INDEPENDENT budget per language — the
    * multilingual balancing pass (per-language token quotas are how mixed
    * corpora keep low-resource languages from being crowded out). Same
    * decomposed prefix sum, bucketed by (lang, quality); the per-lang
    * bucket frame windows partition by lang, so no global sort appears. */
  def tokenBudgetByLang(documents: DataFrame,
      budgetPerLang: Long = 5000L): DataFrame =
    budgetCore(documents, budgetPerLang, Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality"))
      // NULLS LAST pinned: DuckDB's ascending default (Spark's is FIRST)
      .orderBy(col("lang").asc_nulls_last, col("quality").desc, col("doc_id"))

  private def budgetCore(documents: DataFrame, budget: Long,
      groupCols: Seq[String]): DataFrame = {
    val toks = tokens(col("text"))
    val g = groupCols.map(col)
    val scored = documents.select(col("doc_id") +: g ++: Seq(
      size(toks).cast(LongType).as("n_tokens"),
      round2(size(array_distinct(toks)).cast("double") / size(toks), 4)
        .as("quality")): _*)
    val buckets = scored.groupBy(g :+ col("quality"): _*)
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
    val wq = Window.partitionBy(g: _*).orderBy(col("quality").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = buckets
      .withColumn("cum_incl", sum(col("bucket_tokens")).over(wq))
      .withColumn("cum_before", col("cum_incl") - col("bucket_tokens"))
      .select(g ++ Seq(col("quality"), col("cum_incl"), col("cum_before")): _*)
    // NULL-SAFE join keys: a plain equi-join DROPS null-key rows (null
    // lang, or null quality from null text) while the mirror's PARTITION
    // BY windows group them — a silent whole-stratum loss the fuzzer
    // caught. `<=>` restores the window semantics.
    val joinCols = groupCols :+ "quality"
    val cond = joinCols.map(c => scored(c) <=> cum(c)).reduce(_ && _)
    val joined = joinCols.foldLeft(scored.join(broadcast(cum), cond)) {
      (df, c) => df.drop(cum(c))
    }
    val fullKept = joined.filter(col("cum_incl") <= budget)
    val wb = Window.partitionBy(g :+ col("quality"): _*).orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryKept = joined
      .filter(col("cum_before") < budget && col("cum_incl") > budget)
      .withColumn("run", sum(col("n_tokens")).over(wb))
      .filter(col("cum_before") + col("run") <= budget)
    fullKept.unionByName(boundaryKept.drop("run"))
  }

  /** Dataset-card rollup — the per-(source, language) summary a corpus
    * release ships: document and token counts, token-weighted lexical
    * diversity (distinct tokens over total tokens — a RATIO OF INTEGER
    * SUMS with one final division, so it is engine-exact under any
    * partitioning; a mean of per-doc rounded doubles is NOT — its float
    * sum order flipped a 4dp boundary between engines at sf0.001), and
    * the exact-duplicate count (docs minus distinct text digests). One
    * pass + one hash aggregate; the distinct-digest count shuffles
    * 16-byte digests, never text. */
  def corpusCard(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    documents
      .select(col("source"), col("lang"),
        size(toks).cast(LongType).as("n_toks"),
        size(array_distinct(toks)).cast(LongType).as("n_distinct"),
        md5(col("text")).as("digest"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        round2(sum(col("n_distinct")).cast("double") / sum(col("n_toks")), 4)
          .as("diversity"),
        (count(lit(1)) - countDistinct(col("digest"))).as("n_exact_dups"))
      // NULLS LAST pinned: DuckDB's ascending default (Spark's is FIRST)
      .orderBy(col("source").asc_nulls_last, col("lang").asc_nulls_last)
  }

  /** Intra-document repetition signals (the Gopher/C4 repetition filter):
    * per doc, the fraction of word-trigram POSITIONS that are repeats of an
    * earlier trigram (`dup_ratio`) and the share of the single most
    * repeated trigram (`top_ratio`) — boilerplate and looping generations
    * score high. One [[TextExpressions.ShingleCounts]] pass per row — no
    * explode, no shuffle (the posexplode + lead-window formulation shuffles
    * the whole TOKEN stream on doc_id, corpus-sized at 100 TB; the
    * `transform(sequence(...))` lambda one is interpreted O(tokens²)).
    * Docs shorter than the trigram width drop out (null stats). */
  def repetitionScores(documents: DataFrame): DataFrame =
    // pre-filter on the cheap token count — a filter on s IS NOT NULL gets
    // pushed below the project and evaluates ShingleCounts twice per row
    documents
      .filter(size(tokens(col("text"))) >= 3)
      .select(col("doc_id"),
        TextExpressions.shingleCounts(col("text")).as("s"))
      .select(col("doc_id"), col("s.n_shingles").as("n_shingles"),
        round2(lit(1.0) -
          col("s.n_distinct").cast("double") / col("s.n_shingles"), 6)
          .as("dup_ratio"),
        round2(col("s.top_cnt").cast("double") / col("s.n_shingles"), 6)
          .as("top_ratio"))
      .orderBy("doc_id")

  /** Intra-document repeated-unit REMOVAL — the companion of
    * [[repetitionScores]]' detection: keep the FIRST occurrence of each
    * `delim`-separated unit, preserving order. `"\n"` gives C4-style
    * repeated-line removal (boilerplate nav/footer lines inside one page);
    * the documents fixture carries no newlines, so the query surface runs
    * it at the token level — same operator, smaller unit. One map-side
    * [[TextExpressions.DedupUnits]] pass per row: no shuffle, no explode,
    * trivially parallel over splits at any corpus size. */
  def dedupWithin(documents: DataFrame, delim: String = "\n"): DataFrame = {
    val pat = java.util.regex.Pattern.quote(delim)
    documents
      .select(col("doc_id"),
        size(split(col("text"), pat)).cast("long").as("n_units"),
        TextExpressions.dedupUnits(col("text"), delim).as("dedup_text"))
      .select(col("doc_id"), col("n_units"),
        size(split(col("dedup_text"), pat)).cast("long").as("n_kept"),
        col("dedup_text"))
      .orderBy("doc_id")
  }

  /** PII patterns shared by [[scrubPii]] and its DuckDB oracle (regular —
    * no backtracking-dependent constructs or lookaround — so Java regex and
    * RE2 agree). ORDER IS LOAD-BEARING: email first (its local part may
    * contain digits), then IPv4, then phone LAST — the greedy phone run
    * ("digits with space/dash separators") would otherwise absorb the
    * leading octets of an adjacent IP and leave a fragment like ".168.1.10"
    * unredacted. Phone is deliberately aggressive (a dashed date like
    * 2026-01-01 is redacted too): for compliance scrubbing, false positives
    * on digit runs beat leaked numbers. */
  /** Normalized view of the corpus: the cleaned text plus its token count
    * (what downstream dedup/budgeting would consume). */
  def normalizeDocs(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), normalizeExpr(col("text")).as("norm_text"))
      .withColumn("n_tokens_norm",
        size(tokens(col("norm_text"))).cast(LongType))
      .orderBy("doc_id")

  /** Pre-lowercase scrub SHARED with the generated oracle: non-ASCII runs
    * → space BEFORE `lower()`, because lowercasing itself is the one
    * non-ASCII-safe step — Java's full case mapping (Spark) and utf8proc's
    * simple mapping (DuckDB) disagree on characters like U+0130 'İ'
    * ('i'+U+0307 vs 'i'), which would desynchronize the downstream regex
    * chain. After this step both engines lowercase pure ASCII, where they
    * agree exactly. */
  val NormPreStep: (String, String) = "[^\\x00-\\x7f]+" -> " "

  /** Text-normalization steps — (pattern, replacement), applied in order
    * to the LOWERCASED text and trimmed after; SHARED with the generated
    * oracle SQL (the [[PiiPatterns]] discipline), so both engines run the
    * identical regex chain. ASCII-scoped on purpose: unicode case/class
    * tables differ subtly between engines, ASCII ones don't — and
    * [[NormPreStep]] guarantees the input IS ASCII by this point. */
  val NormSteps: Seq[(String, String)] = Seq(
    "[^a-z0-9 ]+" -> " ", // punctuation/symbols → space (post-lower)
    "  +" -> " ")         // collapse space runs

  /** Canonical normalized form of a text column: non-ASCII scrub →
    * lowercase → regex chain → trim. Pure per-row projection. */
  def normalizeExpr(text: Column): Column =
    trim(NormSteps.foldLeft(lower(
      regexp_replace(text, lit(NormPreStep._1), lit(NormPreStep._2)))) {
      case (c, (p, r)) => regexp_replace(c, lit(p), lit(r))
    })

  /** Exact dedup AFTER normalization — catches the case/punctuation/
    * whitespace variants plain [[Dedup.exactDedup]] misses (the usual
    * first escalation before shingle-based near-dup). Same digest-only
    * shuffle: md5 of the normalized form, never the text. */
  def normalizedDedup(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(normalizeExpr(col("text"))).as("norm_hash"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_docs"))
      .orderBy("keeper_id")

  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b",
    "phone" -> "\\+?\\d[\\d -]{6,}\\d")

  /** PII scrubbing (training-data compliance pass): replace
    * emails/phones/IPv4s with `<tag>` placeholders and count the
    * redactions (counts run per pattern against the ORIGINAL text, so
    * overlapping matches are each counted). Pure per-row projection — no
    * shuffle, trivially parallel over splits. */
  def scrubPii(documents: DataFrame): DataFrame = {
    val scrubbed = PiiPatterns.foldLeft(col("text")) {
      case (c, (tag, p)) => regexp_replace(c, lit(p), lit(s"<$tag>"))
    }
    val nPii = PiiPatterns.map { case (_, p) =>
      size(regexp_extract_all(col("text"), lit(p), lit(0)))
    }.reduce(_ + _)
    documents
      .select(col("doc_id"), scrubbed.as("clean_text"),
        nPii.cast(LongType).as("n_pii"))
      .orderBy("doc_id")
  }

  /** Deterministic domain-mixture sampling: keep each document with a
    * per-source probability by comparing an md5-derived uniform quantile of
    * its id against the source's rate quantized to 16^4 buckets — the
    * data-mixing step that turns raw corpus proportions into target
    * training proportions. Hash-based (like [[splitExpr]]): reproducible
    * under re-partitioning, incremental re-runs and engines, and a pure
    * per-row filter — no shuffle, pushes down with the scan. */
  def domainMixSample(documents: DataFrame, rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    // rate → 4-hex-digit threshold; 'g' sorts above every hex digit, so
    // rate >= 1 keeps everything
    def thr(rate: Double): String =
      if (rate >= 1.0) "g"
      else f"${math.max(0, (rate * 65536).toInt)}%04x"
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(thr(defaultRate))) {
      case (acc, (src, r)) => when(col("source") === src, lit(thr(r))).otherwise(acc)
    }
    documents
      .filter(substring(md5(col("doc_id").cast("string")), 1, 4) < threshold)
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")
  }

  /** Quality→token yield curve — the report a curation pass reads to PICK
    * its threshold: one row per (4dp) quality score, descending, with the
    * bucket's doc/token counts, the running token total, and the share of
    * the corpus kept if the threshold were set just below that score.
    *
    * Scale shape: one aggregate collapses the corpus to ≤ 10001 score
    * buckets; the cumsum window is unpartitioned but runs over THAT
    * bounded frame (the [[tokenBudgetSelect]] argument — bounded by score
    * cardinality, never the data), and the grand total joins back as one
    * broadcast row. `cum_share` is a ratio of exact integer sums with one
    * final division (the [[corpusCard]] discipline). */
  def qualityYieldCurve(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val scored = documents.select(
      size(toks).cast(LongType).as("n_tokens"),
      round2(size(array_distinct(toks)).cast("double") / size(toks), 4)
        .as("quality"))
    val buckets = scored.groupBy("quality")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bucket_tokens"))
    val wq = Window.orderBy(col("quality").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = buckets.agg(sum(col("bucket_tokens")).as("total_tokens"))
    buckets
      .withColumn("cum_tokens", sum(col("bucket_tokens")).over(wq))
      .crossJoin(broadcast(totals))
      .select(col("quality"), col("n_docs"), col("bucket_tokens"),
        col("cum_tokens"),
        round2(col("cum_tokens").cast("double") / col("total_tokens"), 4)
          .as("cum_share"))
      .orderBy(col("quality").desc)
  }

  /** Rebalance the corpus to TARGET mixture weights (the DoReMi /
    * training-mix step): given per-source weights w_i, keep the largest
    * total N such that every source can supply its share (N = min_i
    * n_i / w_i over sources present), then select exactly k_i =
    * round(w_i · N) documents per source, chosen deterministically by
    * md5(doc_id) order — reproducible across runs, partitionings and
    * engines, and stable under corpus growth (a source's selection only
    * changes where the hash frontier moves).
    *
    * Scale shape ([[tokenBudgetSelect]]'s discipline): the naive
    * formulation is `row_number() OVER (PARTITION BY source ORDER BY
    * md5)` ≤ k_i — a per-source GLOBAL sort, i.e. one task per source
    * sorting corpus/|sources| rows with no AQE skew help. Instead the
    * hash's first two hex digits give 256 ordered buckets per source:
    * per-(source, bucket) counts cumsum'd over the tiny bucket frame
    * decide all-kept / all-dropped buckets, and only the ONE boundary
    * bucket per source (≈ n_i/256 rows) pays a rank window. The oracle
    * mirror IS the naive formulation — the hash gate certifies the
    * decomposition exact ([[rebalanceSql]]).
    *
    * Weights must be > 0; sources not in `weights` are dropped; a
    * weighted source with no rows makes the mixture unachievable and the
    * result EMPTY (never silently renormalized over present sources). */
  def domainRebalance(documents: DataFrame,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and strictly positive")
    val spark = documents.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.sortBy(_._1).toDF("source", "wgt")
    val scored = documents
      .filter(col("source").isin(weights.keys.toSeq: _*))
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("h"))
    val counts = scored.groupBy("source").agg(count(lit(1)).as("n"))
    // N = min_i n_i / w_i (double; both engines divide the same bits).
    // LEFT join from the weights: a weighted source with ZERO rows means
    // the target mixture is unachievable — its n coalesces to 0, the cap
    // collapses to 0 and the output is EMPTY (loud), instead of silently
    // renormalizing over the sources that happen to be present.
    val cap = wdf.join(counts, Seq("source"), "left")
      .agg(min(coalesce(col("n"), lit(0L)) / col("wgt")).as("cap_n"))
    val ks = wdf.crossJoin(cap).select(col("source"),
      floor(col("wgt") * col("cap_n") + lit(0.5)).cast(LongType).as("k"))
    val bucketed = scored.withColumn("b", substring(col("h"), 1, 2))
    val wq = Window.partitionBy(col("source")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bucketed.groupBy("source", "b").agg(count(lit(1)).as("bn"))
      .withColumn("cum_incl", sum(col("bn")).over(wq))
      .withColumn("cum_before", col("cum_incl") - col("bn"))
      .join(ks, "source")
      .select("source", "b", "cum_incl", "cum_before", "k")
    val joined = bucketed.join(broadcast(cum), Seq("source", "b"))
    val fullKept = joined.filter(col("cum_incl") <= col("k"))
    val wb = Window.partitionBy(col("source"), col("b"))
      .orderBy(col("h"), col("doc_id"))
    val boundaryKept = joined
      .filter(col("cum_before") < col("k") && col("cum_incl") > col("k"))
      .withColumn("rk", row_number().over(wb))
      .filter(col("cum_before") + col("rk") <= col("k"))
      .drop("rk")
    fullKept.unionByName(boundaryKept)
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror for [[domainRebalance]] — deliberately the NAIVE
    * global-rank-per-source formulation, so the hash gate proves the
    * bucketed decomposition equal to it. Generated from the same weight
    * map; weights rendered via Double.toString (shortest round-trip
    * form) and CAST AS DOUBLE so both engines hold identical bits. */
  def rebalanceSql(weights: Map[String, Double]): String = {
    val w = weights.toSeq.sortBy(_._1)
    val values = w.map { case (s, r) =>
      s"('$s', CAST($r AS DOUBLE))" }.mkString(", ")
    val inList = w.map(s => s"'${s._1}'").mkString(", ")
    s"""WITH w(source, wgt) AS (VALUES $values),
       |c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
       |cap AS (SELECT min(coalesce(n, 0) / wgt) AS cap_n
       |        FROM w LEFT JOIN c USING (source)),
       |k AS (SELECT w.source, CAST(floor(wgt * cap_n + 0.5) AS BIGINT) AS k
       |      FROM w CROSS JOIN cap),
       |r AS (SELECT doc_id, source,
       |        row_number() OVER (PARTITION BY source
       |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |      FROM documents WHERE source IN ($inList))
       |SELECT doc_id, source FROM r JOIN k USING (source) WHERE rn <= k
       |ORDER BY doc_id""".stripMargin
  }

  /** GPT-style sequence packing: concatenate documents in id order and cut
    * the token stream into fixed `contextTokens` windows, reporting where
    * each document lands (start bin + offset). Packing is PER SHARD
    * (`doc_id % shards`) — each shard's prefix sum is an independent
    * window, so parallelism is `shards`-wide instead of the one-task global
    * running sum; that per-shard independence is exactly how trainer data
    * shards pack in practice. */
  def packSequences(documents: DataFrame, contextTokens: Int = 512,
      shards: Int = 32): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(col("doc_id"), pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        size(tokens(col("text"))).cast(LongType).as("n_tokens"))
      .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor(col("start_tok") / contextTokens).cast(LongType).as("start_bin"),
        pmod(col("start_tok"), lit(contextTokens.toLong)).as("start_offset"))
      .orderBy("doc_id")
  }

  /** Unit-level quality filtering (the C4-style cleanup, generalized):
    * split on a LITERAL delimiter, drop units shorter than `minChars`
    * characters (junk tokens at the word level; navigation crumbs and
    * stray fragments at `delim = "\n"` line level), re-join. Complements
    * [[dedupWithin]] (which drops repeats; this drops low-content
    * units). Pure per-row projection; the per-unit lambda captures only
    * the materialized `units` attribute. Reports n_units/n_kept so the
    * drop rate is auditable per document. */
  def filterUnits(documents: DataFrame, delim: String = " ",
      minChars: Int = 2): DataFrame = {
    val pat = java.util.regex.Pattern.quote(delim)
    val kept = filter(col("units"), u => length(u) >= minChars)
    documents
      .select(col("doc_id"), split(col("text"), pat).as("units"))
      .select(col("doc_id"),
        size(col("units")).cast(LongType).as("n_units"),
        size(kept).cast(LongType).as("n_kept"),
        // null-in → null-out: concat_ws would render a null array as ''
        // while the mirror's string_agg stays NULL (null-text parity)
        when(col("units").isNull, lit(null).cast("string"))
          .otherwise(concat_ws(delim, kept)).as("clean_text"))
      .orderBy("doc_id")
  }

  /** Fixed-token chunking with stride overlap — the step that turns
    * variable-length documents into model-context-sized windows (RAG
    * passages, pretraining examples with overlap). Chunk `c` covers
    * tokens `[c*stride, c*stride + chunkTokens)`; the last chunk starts
    * at `(n - chunkTokens + stride - 1) div stride` (integer math in BOTH
    * engines — float `ceil` would invite representation drift), so every
    * token is covered and a doc shorter than one chunk yields exactly
    * one. Map-side: tokenization happens ONCE into a materialized `toks`
    * attribute and the per-chunk lambdas capture only that attribute — a
    * direct `transform(..., slice(split(text), ...))` would re-tokenize
    * per chunk (the interpreted-HOF re-evaluation trap). The explode
    * multiplies rows ~n/stride per doc, the intended output shape. */
  def chunkDocs(documents: DataFrame, chunkTokens: Int = 64,
      stride: Int = 48): DataFrame = {
    require(stride >= 1 && chunkTokens >= stride,
      "need 1 <= stride <= chunkTokens")
    documents
      .filter(size(tokens(col("text"))) >= 1)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        greatest(lit(0),
          expr(s"(size(toks) - $chunkTokens + ${stride - 1}) div $stride"))
          .cast("int").as("last"),
        col("toks"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("last")),
          c => concat_ws(" ",
            slice(col("toks"), c * stride + 1, lit(chunkTokens))))))
      .select(col("doc_id"), col("pos").cast(LongType).as("chunk_id"),
        size(split(col("col"), " ")).cast(LongType).as("n_tokens"),
        col("col").as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Order-insensitive content fingerprint: md5 of the sorted distinct token
    * set. Groups docs that are permutations/repetitions of the same
    * vocabulary — the cheapest useful near-dup fingerprint that stays
    * exactly reproducible in any engine. Null text fingerprints NULL:
    * concat_ws treats a null ARRAY as empty, which would silently merge
    * null-text docs into the empty-text group while the mirror's
    * null-propagating md5 keeps them apart (fuzzer-found). */
  def fingerprintExpr(text: Column): Column =
    when(text.isNull, lit(null).cast("string"))
      .otherwise(md5(concat_ws(" ", array_sort(array_distinct(tokens(text))))))

  /** Fingerprint dedup summary: one row per distinct fingerprint with the
    * keeper (min doc_id) and the group size. */
  def fingerprintDedup(documents: DataFrame): DataFrame =
    documents
      .groupBy(fingerprintExpr(col("text")).as("fingerprint"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_docs"))
      .orderBy("keeper_id")

  /** TRAIN step of the unigram-familiarity quality signal: the corpus
    * token→count table, thresholded at `minCount` occurrences and capped
    * to the `maxVocab` most frequent tokens (count desc, token asc — fully
    * deterministic at the cap boundary), collected to driver arrays.
    *
    * The word count is the canonical scalable aggregate (map-side partial
    * aggregation means the shuffle carries distinct-tokens-per-partition,
    * vocabulary-sized, not corpus-sized) and the collect is AFTER the
    * limit, so the driver holds ≤ `maxVocab` rows — the same bounded
    * trained-artifact contract as [[Similarity.trainIvfCentroids]]. */
  def trainUnigramVocab(documents: DataFrame, minCount: Long = VocabMinCount,
      maxVocab: Int = VocabMaxSize): (Array[String], Array[Long]) = {
    val rows = documents
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("tok"))
      .limit(maxVocab)
      .collect()
    (rows.map(_.getString(0)), rows.map(_.getLong(1)))
  }

  /** BPE separator (U+001F): never appears in corpus text (the same
    * absent-delimiter invariant every shingle oracle relies on). */
  private val BpeSep = "\u001f"

  /** TRAIN step of the learned BPE tokenizer: classic byte-pair-encoding
    * merge learning over the capped word-frequency vocabulary
    * ([[trainUnigramVocab]] — so training cost is bounded by `maxVocab`
    * regardless of corpus size, the standard practice of training a
    * tokenizer on a frequency table, not the raw corpus). Per round:
    * count adjacent symbol pairs weighted by word frequency, merge the
    * most frequent (ties: lexicographic (a, b) ascending — fully
    * deterministic), apply left-to-right non-overlapping to every vocab
    * word, repeat. Returns merges in rank order. Stops early when no
    * pair repeats. */
  def trainBpeMerges(documents: DataFrame, numMerges: Int = 50,
      minCount: Long = 2, maxVocab: Int = 65536): Seq[(String, String)] = {
    val (words, counts) = trainUnigramVocab(documents, minCount, maxVocab)
    var syms: Array[Array[String]] = words.map(w =>
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp))))
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      var i = 0
      while (i < syms.length) {
        val w = syms(i)
        var j = 0
        while (j < w.length - 1) {
          val k = (w(j), w(j + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + counts(i))
          j += 1
        }
        i += 1
      }
      val repeated = pairCounts.filter(_._2 >= 2)
      if (repeated.isEmpty) done = true
      else {
        val best = repeated.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val (a, b) = best
        val ab = a + b
        syms = syms.map { w =>
          // left-to-right non-overlapping — the replace-chain semantics
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < w.length) {
            if (j < w.length - 1 && w(j) == a && w(j + 1) == b) {
              out += ab; j += 2
            } else { out += w(j); j += 1 }
          }
          out.toArray
        }
        round += 1
      }
    }
    merges.toList
  }

  /** The (pattern, replacement) replace chain of a merge list — shared by
    * the serving expression and the GENERATED DuckDB oracle, so both
    * engines run literally the same algorithm. */
  def bpeReplaceChain(merges: Seq[(String, String)]): (Seq[String], Seq[String]) =
    (merges.map { case (a, b) => BpeSep + a + BpeSep + BpeSep + b + BpeSep },
      merges.map { case (a, b) => BpeSep + a + b + BpeSep })

  /** SERVE step: per-document token/subword counts under the trained
    * merges — the budgeting numbers an LLM-data pipeline prices corpora
    * with. One map-side [[TextExpressions.BpeSubwordStats]] pass, merges
    * riding the task binary; no shuffle besides the output sort. */
  def bpeStats(documents: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val (pats, reps) = bpeReplaceChain(merges)
    documents
      .select(col("doc_id"),
        TextExpressions.bpeSubwordStats(col("text"), pats, reps).as("s"))
      .select(col("doc_id"), col("s.n_tokens").as("n_tokens"),
        col("s.n_subwords").as("n_subwords"))
      .withColumn("subwords_per_token",
        round2(col("n_subwords").cast("double") / col("n_tokens")))
      .orderBy("doc_id")
  }

  /** Tokenizer FERTILITY per language — the multilingual diagnostic that
    * decides whether a tokenizer is fair to a language (high fertility =
    * more subwords per word = more compute per content unit; the reason
    * multilingual vocabs get re-balanced): per-lang document/word/subword/
    * char totals under the trained merges, with subwords-per-word and
    * chars-per-subword ratios. Same one-pass serving expression as
    * [[bpeStats]], rolled up by `lang` instead of per doc — one
    * ≤|langs|-keyed shuffle over map-side partials; ratios divide exact
    * longs as doubles with shared 4dp rounding, so the report rides the
    * hash gate on the same GENERATED merge-chain oracle. */
  def bpeFertility(documents: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val (pats, reps) = bpeReplaceChain(merges)
    documents.filter(col("text").isNotNull)
      .select(col("lang"), length(col("text")).as("n_chars"),
        TextExpressions.bpeSubwordStats(col("text"), pats, reps).as("s"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("s.n_tokens")).as("n_words"),
        sum(col("s.n_subwords")).as("n_subwords"),
        sum(col("n_chars").cast("long")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_subwords"),
        col("n_chars"),
        round2(col("n_subwords").cast("double") / col("n_words"), 4)
          .as("fertility"),
        round2(col("n_chars").cast("double") / col("n_subwords"), 4)
          .as("chars_per_subword"))
      // NULLS LAST pinned (the countUniqueDocs rule)
      .orderBy(col("lang").asc_nulls_last)
  }

  /** SERVE step: per-document familiarity against a trained vocabulary —
    * CCNet's "score every document with a cheap corpus-trained LM" filter
    * (Wenzek et al. 2019, arXiv:1911.00359), with avg-corpus-frequency
    * standing in for LM log-prob so the score is exact integer arithmetic
    * until ONE final IEEE division (engine-reproducible; a per-token
    * `ln` sum is not, see [[TextExpressions.UnigramFamiliarity]]). One
    * map-side tokenize pass per doc, vocabulary riding the task binary;
    * no shuffle except the output sort. Low familiarity = rare-token soup
    * (boilerplate IDs, lists, noise); high n_oov = vocabulary mismatch. */
  def unigramFamiliarity(documents: DataFrame, vocabTokens: Array[String],
      vocabCounts: Array[Long]): DataFrame =
    documents
      // NULL text parity: the mirror's token CTE drops null-text docs
      // (unnest of NULL emits no rows), so the Spark side must too —
      // a null struct row here would hash-mismatch on a corpus regen
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        TextExpressions.unigramFamiliarity(col("text"),
          scala.collection.immutable.ArraySeq.unsafeWrapArray(vocabTokens),
          scala.collection.immutable.ArraySeq.unsafeWrapArray(vocabCounts))
          .as("uf"))
      .select(col("doc_id"), col("uf.n_tokens").as("n_tokens"),
        col("uf.n_oov").as("n_oov"), col("uf.vocab_sum").as("vocab_sum"))
      .withColumn("familiarity",
        round2(col("vocab_sum").cast("double") / col("n_tokens")))
      .orderBy("doc_id")

  /** TRAIN step of the bigram LM: adjacent-pair counts over the corpus,
    * thresholded and capped EXACTLY like [[trainUnigramVocab]] (count
    * desc, key asc, ≤ maxVocab — fully deterministic, so the oracle can
    * recompute the identical table in SQL). Keys render space-joined;
    * collect runs AFTER the limit (driver holds ≤ maxVocab rows). */
  def trainBigramVocab(documents: DataFrame, minCount: Long = VocabMinCount,
      maxVocab: Int = VocabMaxSize): (Array[String], Array[Long]) = {
    val rows = documents
      .select(tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> concat(toks[i-1], ' ', toks[i]))")).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("bg"))
      .limit(maxVocab)
      .collect()
    (rows.map(_.getString(0)), rows.map(_.getLong(1)))
  }

  /** SERVE step: per-document bigram familiarity against the trained
    * table — one map-side pass ([[graft.ext.BigramFamiliarity]], table in
    * the task binary), the sequence-level complement of the unigram
    * score (a doc of familiar words in an unfamiliar ORDER scores low
    * here). Short docs (< 2 tokens) report zero bigrams and a NULL
    * ratio, never a division by zero. */
  def bigramFamiliarity(documents: DataFrame, vocabKeys: Array[String],
      vocabCounts: Array[Long]): DataFrame =
    documents
      // NULL text must match the mirror's LEFT-JOIN zero row, not a null
      // struct: coalesce to '' (one empty token → zero bigrams)
      .select(col("doc_id"),
        TextExpressions.bigramFamiliarity(coalesce(col("text"), lit("")),
          scala.collection.immutable.ArraySeq.unsafeWrapArray(vocabKeys),
          scala.collection.immutable.ArraySeq.unsafeWrapArray(vocabCounts))
          .as("bf"))
      .select(col("doc_id"), col("bf.n_bigrams").as("n_bigrams"),
        col("bf.n_oov").as("n_oov"), col("bf.vocab_sum").as("vocab_sum"))
      .withColumn("familiarity",
        when(col("n_bigrams") > 0,
          round2(col("vocab_sum").cast("double") / col("n_bigrams"))))
      .orderBy("doc_id")

  /** [[ppsSample]] target size and the doc-id bucket width for the
    * decomposed prefix sum — shared with the mirror. */
  val PpsSampleK = 100L
  val PpsBucketWidth = 65536L

  /** Systematic probability-proportional-to-size sample — k documents
    * drawn with inclusion probability ∝ n_chars via the classic
    * systematic rule: lay all weights on a line, select every doc whose
    * cumulative interval crosses a multiple of W/k. Entirely INTEGER
    * arithmetic (doc selected iff ⌊cum_incl·k/W⌋ > ⌊cum_before·k/W⌋ —
    * non-negative, so truncating div ≡ floor ≡ `//`): deterministic,
    * reproducible under any partitioning, and exactly mirrorable — the
    * weighted sibling of [[splitExpr]], with none of pow/exp's
    * cross-engine rounding hazards.
    *
    * The corpus-ordered prefix sum uses the budgetCore decomposition
    * over doc-id buckets of [[PpsBucketWidth]]: per-bucket sums cumsum
    * on the buckets frame (N/65536 rows — bounded single-task at any
    * realistic corpus), per-doc runs window WITHIN a bucket (≤ 65536
    * rows per partition) — no global sort anywhere. */
  def ppsSample(documents: DataFrame, k: Long = PpsSampleK): DataFrame = {
    val w = documents
      .select(col("doc_id"), col("n_chars").cast(LongType).as("wt"))
      .filter(col("wt") > 0)
      .withColumn("bucket", expr(s"doc_id div $PpsBucketWidth"))
    val bsums = w.groupBy("bucket").agg(sum(col("wt")).as("b_wt"))
    val bcum = bsums.withColumn("b_before",
        coalesce(sum(col("b_wt")).over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("b_before"))
    val tot = bsums.agg(sum(col("b_wt")).as("w_total"))
    val wb = Window.partitionBy(col("bucket")).orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w.join(broadcast(bcum), Seq("bucket"))
      .withColumn("cum_incl", col("b_before") + sum(col("wt")).over(wb))
      .withColumn("cum_before", col("cum_incl") - col("wt"))
      .crossJoin(broadcast(tot))
      .filter(expr(s"(cum_incl * $k) div w_total") >
        expr(s"(cum_before * $k) div w_total"))
      .select(col("doc_id"), col("wt"), col("cum_before"), col("cum_incl"))
      .orderBy("doc_id")
  }

  /** [[exportShards]] rows-per-shard target — shared with the mirror. */
  val ExportShardSize = 100L

  /** Training-data export sharding — the deterministic shard map a
    * corpus release writes alongside its JSONL/parquet shards: documents
    * in doc-id order split into fixed-size shards (shard = ⌊ordinal /
    * [[ExportShardSize]]⌋), reported as one manifest row per shard with
    * its row count and id range. The ordinal is
    * [[graft.ops.Ordinals.globalRowNumbers]] (fifth gate certification)
    * — a deterministic map any engine reproduces, unlike
    * `maxRecordsPerFile`'s partition-dependent file splits. */
  def exportShards(documents: DataFrame,
      shardSize: Long = ExportShardSize): DataFrame =
    graft.ops.Ordinals.globalRowNumbers(
        documents.select(col("doc_id")), Seq(col("doc_id")), "rn")
      .withColumn("shard", expr(s"(rn - 1) div $shardSize"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("shard")

  /** Class-weight balance over the labeled embedding table — per label
    * the example count, share, and the inverse-frequency training weight
    * n_total / (n_labels · n) every imbalanced-classification recipe
    * uses. Counts exact; share and weight are single double divisions of
    * exact longs (identical op sequence), 4dp floor-rounded. */
  def labelBalance(embeddings: DataFrame): DataFrame = {
    val counts = embeddings.groupBy(col("label"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("n_total"),
      count(lit(1)).as("n_labels"))
    counts.crossJoin(broadcast(tot))
      .select(col("label"), col("n"),
        round2(col("n").cast("double") / col("n_total"), 4).as("share"),
        round2(col("n_total").cast("double") /
          (col("n_labels") * col("n")).cast("double"), 4).as("class_weight"))
      .orderBy("label")
  }

  /** Flesch–Kincaid grade per document: 0.39·(words/sentences) +
    * 11.8·(syllables/words) − 15.59, with syllables approximated by
    * vowel-group count (the standard regex heuristic) and a grade band
    * decided on the 4dp-ROUNDED score (quantile-parity discipline).
    *
    * All three counts are exact longs from ONE pass of string ops with
    * identical regex semantics in both engines ([aeiou]+ vowel groups,
    * [.!?]+ sentence split with blank segments dropped, space-split words
    * with empties dropped); the grade is one fixed double op sequence
    * from those exact inputs. The HOF lambdas touch only materialized
    * attributes (the round-6 small-fan-out rule); null/empty docs drop in
    * both engines (null-text parity rule — `text IS NOT NULL` and
    * `n_words > 0` are stated filters, not silent coalesces). */
  def readability(documents: DataFrame): DataFrame = {
    val base = documents.filter(col("text").isNotNull)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sents", split(col("text"), "[.!?]+"))
      .withColumn("vg",
        regexp_extract_all(lower(col("text")), lit("[aeiou]+"), lit(0)))
      .select(col("doc_id"),
        size(filter(col("toks"), t => t =!= "")).cast(LongType).as("n_words"),
        greatest(lit(1L),
          size(filter(col("sents"), s => trim(s) =!= "")).cast(LongType))
          .as("n_sentences"),
        size(col("vg")).cast(LongType).as("n_syllables"))
      .filter(col("n_words") > 0)
      .withColumn("fk_grade", round2(
        lit(0.39) * (col("n_words").cast("double") / col("n_sentences")) +
          lit(11.8) * (col("n_syllables").cast("double") / col("n_words")) -
          lit(15.59), 4))
    base.select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"), col("fk_grade"),
        when(col("fk_grade") < 8.0, "easy")
          .when(col("fk_grade") < 12.0, "medium")
          .otherwise("hard").as("band"))
      .orderBy("doc_id")
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * selection rule): hash every word-[[WinnowK]]-gram, slide a window of
    * [[WinnowW]] consecutive hashes, keep each window's minimum — the
    * guaranteed-density local-sampling scheme plagiarism/near-dup systems
    * use to fingerprint documents position-robustly. Per doc: window
    * count, DISTINCT selected fingerprints (density ≈ 2/(w+1) of the
    * hash stream), and the lexicographic minimum fingerprint.
    *
    * Engine-exact: hashes are md5 HEX STRINGS (the deterministic-
    * randomness discipline — [0-9a-f] ASCII compares identically under
    * Spark's UTF8_BINARY and DuckDB's binary collation), window min is
    * lexicographic on those strings, trailing windows truncate (both
    * engines' frame semantics / `slice` clamp at the array end).
    *
    * Shape: zero shuffle until the final per-doc projection — the hash
    * stream and its window minima are per-row HOF transforms over
    * MATERIALIZED `toks`/`hs` attributes (the round-6 small-fan-out rule;
    * each is multi-referenced so CollapseProject cannot inline the
    * expensive transform into a downstream lambda), never an explode +
    * `Window.partitionBy(doc_id)` that would shuffle the corpus-sized
    * token stream on doc_id. Null/short docs drop in both engines
    * (stated `>= k` filter ≡ the mirror's WHERE on len). */
  /** The per-doc winnowing frame (`doc_id`, `hs` k-gram hash stream,
    * `fps` per-window minima) shared by [[winnowingFingerprints]] and
    * [[winnowingPairs]]. */
  private def winnowed(documents: DataFrame): DataFrame = {
    val k = WinnowK
    val w = WinnowW
    documents.filter(col("text").isNotNull)
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= k)
      .withColumn("hs", expr(
        s"transform(sequence(1, size(toks) - ${k - 1}), " +
          s"i -> md5(concat_ws(' ', slice(toks, i, $k))))"))
      .withColumn("fps", expr(
        s"transform(sequence(1, size(hs)), i -> array_min(slice(hs, i, $w)))"))
  }

  def winnowingFingerprints(documents: DataFrame): DataFrame =
    winnowed(documents)
      .select(col("doc_id"),
        size(col("hs")).cast(LongType).as("n_windows"),
        size(array_distinct(col("fps"))).cast(LongType).as("n_fingerprints"),
        array_min(col("fps")).as("min_fp"))
      .orderBy("doc_id")

  /** [[winnowingPairs]] thresholds, shared with the mirror: minimum
    * shared fingerprints for a reported pair, and the fingerprint DF cap
    * (a boilerplate fingerprint in more docs than this carries no match
    * signal and would fan the self-join out quadratically). */
  val WinnowPairMinShared = 2L
  val WinnowPairMaxDf = 64

  /** MOSS-style match candidates from the winnowing fingerprints: pairs
    * of documents sharing ≥ [[WinnowPairMinShared]] DISTINCT selected
    * fingerprints, with shared counts — the cross-document step of the
    * Schleimer/Wilkerson/Aiken pipeline (fingerprint → invert → pair).
    * The self-join runs on the WINNOWED sample (density ≈ 2/(w+1) of
    * the k-gram stream — the scheme's whole point: pair detection at a
    * fraction of full-shingle cost) with the usual DF cap bounding the
    * per-fingerprint fan-out; counts are exact longs, so the report
    * rides the hash gate on the shared winnowing prologue. */
  def winnowingPairs(documents: DataFrame): DataFrame = {
    val fp = winnowed(documents)
      .select(col("doc_id"), explode(array_distinct(col("fps"))).as("fp"))
    val capped = fp.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= WinnowPairMaxDf)
      .select("fp")
    val kept = fp.join(capped, Seq("fp"))
    kept.select(col("doc_id").as("doc1"), col("fp"))
      .join(kept.select(col("doc_id").as("doc2"), col("fp")), "fp")
      .filter(col("doc1") < col("doc2"))
      .groupBy("doc1", "doc2")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= WinnowPairMinShared)
      .orderBy("doc1", "doc2")
  }

  /** Temperature-based multilingual sampling allocation (the α = 0.5
    * up-sampling rule of multilingual pretraining: p_l ∝ c_l^α flattens
    * the language distribution so low-resource languages are not drowned):
    * per-language token counts → sqrt weights → shares → an integer token
    * allocation under a [[MixBudgetTokens]] budget.
    *
    * Rides the hash gate because every step is engine-exact: counts are
    * longs (exact as doubles < 2^53), `sqrt` is correctly-rounded IEEE,
    * the weight is then QUANTIZED to a 6dp fixed-point long (the
    * q_mixture_allocation discipline) so the cross-language total is an
    * exact order-independent long sum, and the allocation is pure integer
    * arithmetic — Spark `div` ≡ DuckDB `//` on the non-negative numerator.
    * (w6·budget stays < 2^63 up to ~10^13 corpus tokens per language —
    * beyond that, lower the quantization scale.) Null lang is a real
    * stratum (asc_nulls_last — the countUniqueDocs rule). */
  def langTemperatureMix(documents: DataFrame): DataFrame = {
    val counts = documents.groupBy("lang")
      .agg(sum(size(tokens(col("text"))).cast(LongType)).as("n_tokens"))
    val weighted = counts.withColumn("w6",
      floor(sqrt(col("n_tokens").cast("double")) * 1e6 + 0.5).cast(LongType))
    val tot = weighted.agg(sum(col("w6")).as("tot"))
    weighted.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_tokens"),
        (col("w6").cast("double") / lit(1e6)).as("weight"),
        round2(col("w6").cast("double") / col("tot").cast("double"), 6)
          .as("share"),
        expr(s"(w6 * ${MixBudgetTokens}L) div tot").as("alloc_tokens"))
      .orderBy(col("lang").asc_nulls_last)
  }

  /** Gopher-style character/word-shape quality rules: fraction of
    * alphabetic characters and mean word length, each 4dp-rounded BEFORE
    * the threshold comparison (the round-then-compare rule), with a
    * `keep` verdict over the [[GopherMinAlpha]]/[[GopherMinWordLen]]/
    * [[GopherMaxWordLen]] band — the cheap repetition-independent filter
    * a pretraining pipeline runs before dedup (complementary to
    * [[qualityScores]]' diversity/stopword signals).
    *
    * Null text propagates NULL metrics and a NULL verdict in BOTH engines
    * (comparison/AND over NULL is NULL in each); an empty text would be a
    * 0/0 — and Spark 4 ANSI THROWS on double 0/0 (the fuzzer-found
    * zero-norm rule), so the zero denominator is nulled explicitly to
    * match DuckDB's NULL. One pruned scan, zero shuffle, pure codegen. */
  private def gopherAlphaRatio: Column = {
    val len = length(col("text"))
    // case-INSENSITIVE letter class (ADVICE r12): a lowercase-only class
    // scored every uppercase letter as non-alphabetic, so a mixed-case
    // corpus would systematically fail the Gopher keep rule (and the NB
    // classifier distilled from it would inherit the bias); mirrored
    // verbatim in GopherAlphaSql
    val nAlpha = len - length(regexp_replace(col("text"), "[a-zA-Z]", ""))
    round2(when(len === 0, lit(null))
      .otherwise(nAlpha.cast("double") / len.cast("double")), 4)
  }

  private def gopherMeanWordLen: Column = {
    val len = length(col("text"))
    val toks = tokens(col("text"))
    round2((len - (size(toks) - lit(1))).cast("double") /
      size(toks).cast("double"), 4)
  }

  /** The gopher `keep` verdict as a reusable expression over `text` —
    * shared by [[gopherRules]] and the NB classifier's training labels
    * ([[trainNbQuality]]) so the two can never drift. NULL on null text;
    * on EMPTY text the NULL alpha ratio collapses to FALSE (null AND
    * false = false — identical three-valued algebra in both engines,
    * spec-pinned: the empty doc is a reject, not an abstention). */
  private[graft] def gopherKeep: Column =
    gopherAlphaRatio >= GopherMinAlpha &&
      gopherMeanWordLen >= GopherMinWordLen &&
      gopherMeanWordLen <= GopherMaxWordLen

  /** Per-source [[gopherRules]] pass rates — the "which sources fail the
    * quality rules" curation report that decides where filtering budget
    * goes: per source, docs with text, docs passing the verdict, and the
    * 6dp pass rate (exact long counts → one exact double division; the
    * verdict is [[gopherKeep]], rendered from the SAME shared SQL
    * definition as `q_gopher_rules` and the NB distillation, so the
    * three can never drift). Null-text docs are excluded (no verdict);
    * a NULL source keeps its group (asc_nulls_last). One pruned scan,
    * a ≤|sources| aggregate. */
  def gopherBySource(documents: DataFrame): DataFrame =
    documents.filter(col("text").isNotNull)
      .select(col("source"), gopherKeep.as("kp"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kp"), 1L).otherwise(0L)).as("n_keep"))
      .select(col("source"), col("n_docs"), col("n_keep"),
        round2(col("n_keep").cast("double") / col("n_docs").cast("double"),
          6).as("keep_rate"))
      .orderBy(col("source").asc_nulls_last)

  def gopherRules(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
        gopherAlphaRatio.as("alpha_ratio"),
        gopherMeanWordLen.as("mean_word_len"),
        gopherKeep.as("keep"))
      .orderBy("doc_id")

  /** TRAIN step of DSIR (Data Selection via Importance Resampling — Xie
    * et al. 2023, arXiv:2302.03169): per-token QUANTIZED log importance
    * ratios ln(p̂_t / q̂_t) between the add-1-smoothed TARGET unigram
    * distribution (docs with `doc_id % DsirTargetMod == 0`, the
    * benchmark-split convention) and the CORPUS distribution (the rest),
    * over the capped union vocabulary (count desc, token asc — the
    * deterministic cap boundary of [[trainUnigramVocab]]).
    *
    * `ln` has NO cross-engine correctly-rounded guarantee, so it is
    * computed ONCE here on the driver and quantized to micro-nats
    * (floor-trick, [[DsirLogScale]]); serving and the generated mirror
    * then both work in exact long arithmetic from the same constants —
    * neither engine ever evaluates a logarithm at query time (the
    * q_bpe_tokens trained-artifact discipline). One vocabulary-bounded
    * aggregate + a ≤ [[DsirMaxVocab]]-row collect (the trained-artifact
    * contract). */
  def trainDsirRatios(documents: DataFrame): (Array[String], Array[Long]) = {
    val rows = documents.filter(col("text").isNotNull)
      .select(explode(tokens(col("text"))).as("tok"),
        (pmod(col("doc_id"), lit(DsirTargetMod.toLong)) === 0).as("t"))
      .groupBy("tok").agg(
        sum(when(col("t"), 1L).otherwise(0L)).as("tc"),
        sum(when(!col("t"), 1L).otherwise(0L)).as("cc"))
      .orderBy((col("tc") + col("cc")).desc, col("tok"))
      .limit(DsirMaxVocab)
      .collect()
    val toks = rows.map(_.getString(0))
    val tc = rows.map(_.getLong(1))
    val cc = rows.map(_.getLong(2))
    val v = toks.length.toLong
    val (tTot, cTot) = (tc.sum, cc.sum)
    val qlog = Array.tabulate(toks.length) { i =>
      val p = (tc(i) + 1).toDouble / (tTot + v).toDouble
      val q = (cc(i) + 1).toDouble / (cTot + v).toDouble
      math.floor(math.log(p / q) * DsirLogScale + 0.5).toLong
    }
    (toks, qlog)
  }

  /** SERVE step of DSIR: per-document log importance weight — the exact
    * long sum of the trained micro-nat ratios over the doc's tokens
    * (out-of-vocabulary tokens contribute the neutral 0 and are counted)
    * — the score importance resampling draws against when shifting a raw
    * corpus toward a target domain. One map-side pass through the SAME
    * codegen'd [[TextExpressions.unigramFamiliarity]] expression the LM
    * familiarity filter uses (its vocab_sum over per-occurrence longs IS
    * the DSIR sum); vocabulary rides the task binary, no shuffle except
    * the output sort. */
  def dsirWeights(documents: DataFrame, vocabTokens: Array[String],
      qlogRatios: Array[Long]): DataFrame =
    documents
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        TextExpressions.unigramFamiliarity(col("text"),
          scala.collection.immutable.ArraySeq.unsafeWrapArray(vocabTokens),
          scala.collection.immutable.ArraySeq.unsafeWrapArray(qlogRatios))
          .as("w"))
      .select(col("doc_id"), col("w.n_tokens").as("n_tokens"),
        col("w.n_oov").as("n_oov"), col("w.vocab_sum").as("logw_micro"))
      .orderBy("doc_id")

  /** TRAIN step of a multinomial Naive-Bayes quality classifier DISTILLED
    * from the [[gopherRules]] verdict (the CCNet/GPT-3-style "train a
    * cheap linear model to mimic an expensive/rule-based quality signal"
    * pattern): per-token QUANTIZED log-likelihood ratios
    * ln(P(w|keep) / P(w|reject)) with add-1 smoothing over the capped
    * vocabulary (count desc, token asc — the deterministic cap boundary),
    * labels from [[gopherKeep]] (docs whose verdict is NULL — null/empty
    * text — are excluded from training).
    *
    * `ln` is driver-only and quantized to micro-nats ([[DsirLogScale]]),
    * the [[trainDsirRatios]] discipline: serving and the generated mirror
    * both work in exact long arithmetic from the same constants. One
    * vocabulary-bounded aggregate + a ≤ [[DsirMaxVocab]]-row collect. */
  def trainNbQuality(documents: DataFrame): (Array[String], Array[Long]) = {
    val rows = documents
      .filter(col("text").isNotNull && gopherKeep.isNotNull)
      .select(explode(tokens(col("text"))).as("tok"), gopherKeep.as("kp"))
      .groupBy("tok").agg(
        sum(when(col("kp"), 1L).otherwise(0L)).as("kc"),
        sum(when(!col("kp"), 1L).otherwise(0L)).as("rc"))
      .orderBy((col("kc") + col("rc")).desc, col("tok"))
      .limit(DsirMaxVocab)
      .collect()
    val toks = rows.map(_.getString(0))
    val kc = rows.map(_.getLong(1))
    val rc = rows.map(_.getLong(2))
    val v = toks.length.toLong
    val (kTot, rTot) = (kc.sum, rc.sum)
    val w = Array.tabulate(toks.length) { i =>
      val pk = (kc(i) + 1).toDouble / (kTot + v).toDouble
      val pr = (rc(i) + 1).toDouble / (rTot + v).toDouble
      math.floor(math.log(pk / pr) * DsirLogScale + 0.5).toLong
    }
    (toks, w)
  }

  /** SERVE step of the NB quality classifier: the per-document margin is
    * the exact long sum of the trained micro-nat ratios over the doc's
    * tokens (uniform class prior — the margin's sign IS the verdict; OOV
    * tokens contribute the neutral 0 and are counted), plus the teacher's
    * own [[gopherKeep]] verdict and an agreement flag — the distillation
    * fidelity report. Same map-side
    * [[TextExpressions.unigramFamiliarity]] serving path as DSIR; the
    * verdict comparison is null-safe (`<=>` ↔ IS NOT DISTINCT FROM) —
    * defensive only, since [[gopherKeep]] is non-NULL for every non-null
    * text — so `agree` can never read NULL. */
  def nbQualityScores(documents: DataFrame, vocabTokens: Array[String],
      weights: Array[Long]): DataFrame = {
    import scala.collection.immutable.ArraySeq
    documents.filter(col("text").isNotNull)
      .select(col("doc_id"), gopherKeep.as("gopher_keep"),
        TextExpressions.unigramFamiliarity(col("text"),
          ArraySeq.unsafeWrapArray(vocabTokens),
          ArraySeq.unsafeWrapArray(weights)).as("s"))
      .select(col("doc_id"), col("s.n_tokens").as("n_tokens"),
        col("s.n_oov").as("n_oov"),
        col("s.vocab_sum").as("nb_margin_micro"),
        (col("s.vocab_sum") >= 0L).as("nb_keep"),
        col("gopher_keep"),
        ((col("s.vocab_sum") >= 0L) <=> col("gopher_keep")).as("agree"))
      .orderBy("doc_id")
  }

  /** [[nbCalibration]] bin width (micro-nats) and symmetric clamp,
    * shared with the generated mirror — ±20 bins of 0.1 nat bound the
    * report at 41 rows on any corpus. */
  val NbCalibrationBinMicro = 100000L
  val NbCalibrationMaxBin = 20L

  /** Calibration report for the distilled NB quality classifier — the
    * reliability curve a pipeline reads before trusting the student's
    * margin as a ranking score: per clamped margin bin, the doc count,
    * the teacher-keep count, and the 4dp teacher-agreement share. A
    * well-calibrated student agrees near-always far from 0 and worst in
    * the boundary bins. Margin bins use FLOOR division on the possibly-
    * negative margin via divisibility reduction (subtract the pmod
    * remainder first: truncate ≡ floor on the exactly-divisible
    * numerator — the CLAUDE.md negative-division rule), then clamp —
    * all exact longs, so the whole report rides the hash gate over the
    * same trained VALUES CTE as `q_nb_quality_score`. */
  def nbCalibration(documents: DataFrame, vocabTokens: Array[String],
      weights: Array[Long]): DataFrame = {
    val w = NbCalibrationBinMicro
    val binRaw = expr(
      s"(nb_margin_micro - pmod(nb_margin_micro, ${w}L)) div ${w}L")
    val bin = greatest(least(binRaw, lit(NbCalibrationMaxBin)),
      lit(-NbCalibrationMaxBin))
    nbQualityScores(documents, vocabTokens, weights)
      .groupBy(bin.as("margin_bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("gopher_keep"), 1L).otherwise(0L))
          .as("n_teacher_keep"),
        sum(when(col("agree"), 1L).otherwise(0L)).as("n_agree"))
      .select(col("margin_bin"), col("n_docs"), col("n_teacher_keep"),
        col("n_agree"),
        round2(col("n_agree").cast("double") /
          col("n_docs").cast("double"), 4).as("agree_share"))
      .orderBy("margin_bin")
  }

  /** TRAIN step of the per-source cross-entropy report: per-token
    * QUANTIZED negative log probabilities −ln p̂_w in micro-nats under
    * the add-1-smoothed CORPUS unigram LM over the capped vocabulary
    * (count desc, token asc — the deterministic cap boundary), plus the
    * single out-of-vocabulary cost −ln(1/(T+V+1)) every unseen token
    * pays (the +1 in the denominator is the OOV bucket's own pseudo
    * count, so the smoothed distribution stays proper). `ln` is
    * driver-only and quantized to [[DsirLogScale]] micro-nats (the
    * [[trainDsirRatios]] discipline): serving and the generated mirror
    * both work in exact long arithmetic from the same constants. One
    * vocabulary-bounded aggregate + a ≤ [[DsirMaxVocab]]-row collect. */
  def trainUnigramCosts(
      documents: DataFrame): (Array[String], Array[Long], Long) = {
    val rows = documents.filter(col("text").isNotNull)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok"))
      .limit(DsirMaxVocab)
      .collect()
    val toks = rows.map(_.getString(0))
    val cs = rows.map(_.getLong(1))
    val denom = (cs.sum + toks.length + 1).toDouble
    val costs = cs.map(c =>
      math.floor(-math.log((c + 1).toDouble / denom) * DsirLogScale + 0.5)
        .toLong)
    val oovCost =
      math.floor(-math.log(1.0 / denom) * DsirLogScale + 0.5).toLong
    (toks, costs, oovCost)
  }

  /** SERVE step of the per-source cross-entropy report — the "which
    * sources look least like the corpus LM expects" signal a
    * data-mixing pipeline ranks sources by (high nats/token = surprising
    * = candidate for down-weighting or a quality look): per source, doc
    * and token counts, the OOV count, the exact micro-nat total cost
    * (in-vocab costs ride [[TextExpressions.unigramFamiliarity]]'s
    * vocab_sum; each OOV token pays the constant `oovCost`), and the
    * mean nats/token. The division is long→double exact (< 2⁵³) with
    * IEEE-identical op order in the mirror; every non-null-text doc has
    * ≥1 token, so the per-source token count is never 0. One map-side
    * pass, the only shuffle is the ≤|sources| aggregate. */
  def sourceCrossEntropy(documents: DataFrame, vocabTokens: Array[String],
      costs: Array[Long], oovCost: Long): DataFrame = {
    import scala.collection.immutable.ArraySeq
    documents.filter(col("text").isNotNull)
      .select(col("source"),
        TextExpressions.unigramFamiliarity(col("text"),
          ArraySeq.unsafeWrapArray(vocabTokens),
          ArraySeq.unsafeWrapArray(costs)).as("s"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("s.n_tokens")).as("n_tokens"),
        sum(col("s.n_oov")).as("n_oov"),
        sum(col("s.vocab_sum") + col("s.n_oov") * lit(oovCost))
          .as("cost_micro"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_oov"),
        col("cost_micro"),
        round2((col("cost_micro").cast("double") /
          col("n_tokens").cast("double")) / lit(DsirLogScale.toDouble), 6)
          .as("nats_per_token"))
      .orderBy(col("source").asc_nulls_last)
  }

  /** [[lmOutlierScores]] |z| threshold, shared with the mirror. */
  val LmOutlierZ = 2.0

  /** Per-doc LM-surprise OUTLIERS under the [[trainUnigramCosts]] corpus
    * LM — the curation pass that flags docs whose token distribution the
    * corpus model finds abnormal (boilerplate dumps, wrong-language
    * fragments, encoding damage): per doc, the mean nats/token QUANTIZED
    * to a 4dp long (floor trick — kills all float-sum-order exposure
    * before any corpus aggregate), then exact moments over those longs,
    * a z-score through the identical double sequence (the dimStats
    * discipline), and the |z| > [[LmOutlierZ]] verdict compared on the
    * 4dp-ROUNDED z (round-then-compare). A zero-variance corpus nulls
    * the z (explicitly — Spark ANSI 0/0 throws) and reads non-outlier. */
  def lmOutlierScores(documents: DataFrame, vocabTokens: Array[String],
      costs: Array[Long], oovCost: Long): DataFrame = {
    import scala.collection.immutable.ArraySeq
    val perDoc = documents.filter(col("text").isNotNull)
      .select(col("doc_id"),
        TextExpressions.unigramFamiliarity(col("text"),
          ArraySeq.unsafeWrapArray(vocabTokens),
          ArraySeq.unsafeWrapArray(costs)).as("s"))
      .select(col("doc_id"), col("s.n_tokens").as("n_tokens"),
        (col("s.vocab_sum") + col("s.n_oov") * lit(oovCost)).as("cost"))
      .select(col("doc_id"), col("n_tokens"),
        floor((col("cost").cast("double") / col("n_tokens").cast("double") /
          lit(DsirLogScale.toDouble)) * 10000 + 0.5)
          .cast(LongType).as("nats4"))
    val m = perDoc.agg(count(lit(1)).as("n"), sum(col("nats4")).as("t"),
      sum(col("nats4") * col("nats4")).as("ss"))
    val mean = col("t").cast("double") / col("n").cast("double")
    val std = sqrt(greatest(
      col("ss").cast("double") / col("n").cast("double") - mean * mean,
      lit(0.0)))
    val z = when(std === 0.0, lit(null).cast("double"))
      .otherwise((col("nats4").cast("double") - mean) / std)
    perDoc.crossJoin(broadcast(m))
      .select(col("doc_id"), col("n_tokens"),
        (col("nats4").cast("double") / 10000.0).as("nats_per_token"),
        round2(z, 4).as("z"),
        coalesce(abs(round2(z, 4)) > LmOutlierZ, lit(false))
          .as("is_outlier"))
      .orderBy("doc_id")
  }

  /** [[sourceSimilarity]] vocabulary cap, shared with the mirror. */
  val SourceSimVocab = 4096

  /** Pairwise SOURCE fingerprint similarity: the cosine between the
    * unigram COUNT vectors of every source pair, restricted to the
    * top-[[SourceSimVocab]] corpus vocabulary (count desc, token asc —
    * the deterministic cap boundary) — the "which sources look alike"
    * readout that drives mixing weights and cross-source dedup budgets.
    *
    * Entirely exact until the last step: counts are longs, dot products
    * and squared norms are exact long sums over the BOUNDED vocab, sqrt
    * is correctly-rounded IEEE, and the cosine is 6dp floor-rounded in
    * the identical op order both engines. Null-source and null-text docs
    * are excluded (documented, mirrored); a pair sharing no vocab token
    * has no dot row and drops in both engines. The vocab is broadcast
    * (constant-bounded); the only data-sized shuffle is the
    * (source, token) aggregate, and the pair join runs on the
    * |sources|·|vocab|-bounded vector frame — never on the corpus. */
  def sourceSimilarity(documents: DataFrame,
      maxVocab: Int = SourceSimVocab): DataFrame = {
    val tk = documents
      .filter(col("text").isNotNull && col("source").isNotNull)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
    val vocab = tk.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(maxVocab)
      .select("tok")
    val sv = tk.join(broadcast(vocab), "tok")
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val n2 = sv.groupBy("source").agg(sum(col("c") * col("c")).as("n2"))
    val dots = sv.select(col("source").as("source_a"), col("tok"),
        col("c").as("ca"))
      .join(sv.select(col("source").as("source_b"), col("tok"),
        col("c").as("cb")), "tok")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(sum(col("ca") * col("cb")).as("dot"))
    dots
      .join(n2.select(col("source").as("source_a"), col("n2").as("n2a")),
        "source_a")
      .join(n2.select(col("source").as("source_b"), col("n2").as("n2b")),
        "source_b")
      .select(col("source_a"), col("source_b"), col("dot"),
        round2(col("dot").cast("double") /
          (sqrt(col("n2a").cast("double")) *
            sqrt(col("n2b").cast("double"))), 6).as("cosine"))
      .orderBy("source_a", "source_b")
  }

  /** [[tokenBurstiness]] report size, shared with the mirror. */
  val BurstinessTopK = 50

  /** Token burstiness — Church & Gale's observation that content words
    * CLUMP (a doc that mentions a term once tends to repeat it) while
    * function words spread evenly: for the top-[[BurstinessTopK]] corpus
    * tokens, the Fano factor (variance-to-mean ratio) of the per-doc
    * count over the docs CONTAINING the token. Fano ≈ high ⇒ bursty
    * content word; ≈ capped near the Poisson 1 ⇒ function word — the
    * topicality signal keyword extraction and stopword induction read.
    *
    * Exact-moment discipline (dimStats): per-(token, doc) counts are
    * exact longs, n/Σc/Σc² exact long aggregates, and mean/variance/Fano
    * drop to doubles through the IDENTICAL op sequence in both engines
    * (variance clamped at 0 via greatest; mean ≥ 1 > 0, so the Fano
    * division needs no zero guard), 6dp floor-rounded. Top-k orders on
    * the exact total with a token tiebreak. */
  def tokenBurstiness(documents: DataFrame,
      topK: Int = BurstinessTopK): DataFrame = {
    val mean = col("total").cast("double") / col("n_docs").cast("double")
    val variance = greatest(
      col("ss").cast("double") / col("n_docs").cast("double") -
        (col("total").cast("double") / col("n_docs").cast("double")) *
        (col("total").cast("double") / col("n_docs").cast("double")),
      lit(0.0))
    documents.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("tok", "doc_id").agg(count(lit(1)).as("c"))
      .groupBy("tok").agg(
        count(lit(1)).as("n_docs"),
        sum(col("c")).as("total"),
        sum(col("c") * col("c")).as("ss"))
      .select(col("tok"), col("n_docs"), col("total"),
        round2(mean, 6).as("mean_per_doc"),
        round2(variance / mean, 6).as("fano"))
      .orderBy(col("total").desc, col("tok"))
      .limit(topK)
  }

  /** Kneser-Ney continuation counts — the statistic KN-smoothed language
    * models are built on: for each word, the number of DISTINCT left
    * contexts it continues (N1+(•w), the KN unigram numerator) and the
    * number of distinct right continuations it licenses (N1+(w•), the
    * normalizer of its backoff weight). Top-[[KnTopK]] by left-context
    * count with a total (nl, nr, word) tiebreak.
    *
    * Shape: ONE distinct over bigram TYPES (map-side partial distinct on
    * the pair key — the only shuffle, vocabulary²-bounded output), then
    * two vocabulary-sized aggregates joined full-outer (a word can appear
    * only sentence-initially or -finally) with counts coalesced to 0.
    * Top-k compiles to TakeOrderedAndProject — never a full sort. */
  def knContinuations(documents: DataFrame): DataFrame = {
    val pairs = documents.select(tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> struct(toks[i-1] AS w1, toks[i] AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .distinct()
    val leftCtx = pairs.groupBy(col("w2").as("w"))
      .agg(count(lit(1)).as("n_left_contexts"))
    val rightCont = pairs.groupBy(col("w1").as("w"))
      .agg(count(lit(1)).as("n_right_continuations"))
    leftCtx.join(rightCont, Seq("w"), "full_outer")
      .na.fill(0L, Seq("n_left_contexts", "n_right_continuations"))
      .orderBy(col("n_left_contexts").desc,
        col("n_right_continuations").desc, col("w"))
      .limit(KnTopK)
  }
}
