package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}

import graft.Exprs._

/** `bloom.mightContainLong(h)` as a Catalyst expression over a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]]: the filter rides in the
  * plan as bytes (shipped once per executor via the task-binary broadcast)
  * and deserializes once per task (`@transient lazy val`) — a map-side
  * membership probe with NO false negatives, the sketch half of
  * [[Decontaminate.contaminationReportBloom]]. Evaluated once per row;
  * CodegenFallback costs one virtual call against a hash probe. */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Benchmark decontamination — the training-data hygiene step a pretraining
  * pipeline runs before anything ships to a trainer: flag (and drop) corpus
  * documents whose n-gram content overlaps an evaluation/benchmark set, so
  * eval answers don't leak into training data. (The reference pipeline has
  * no equivalent; this extends the engine's LLM-data surface like
  * [[Dedup]]/[[TextOps]].)
  *
  * Scale design: the benchmark side is SMALL by construction (eval suites
  * are thousands of docs, the corpus is the 100 TB side), so its distinct
  * shingle-hash set is broadcast — the corpus is probed map-side and NEVER
  * shuffles for the membership test. The only exchange is the per-doc
  * count aggregation on 24-byte (doc_id, counts) rows with map-side
  * partials. Shingles ride as [[TextExpressions.ShingleHashes]] 64-bit
  * hashes (one O(tokens) pass per doc), never as text.
  */
object Decontaminate {

  /** Default shingle width for the contamination family. 3, not the
    * Jaccard family's 5 ([[Dedup.JaccardShingleWidth]]): containment
    * probes want RECALL against short eval n-grams, and the benchmark
    * side is small by construction, so trigram df density costs nothing
    * here — there is no df² self-join in this family. Interpolated into
    * the DuckDB mirrors (the shared-constant rule). */
  val ShingleWidth = 3

  /** Per-document contamination report: `n_hits / n_shingles`, the fraction
    * of the doc's DISTINCT word-`width`-gram shingles that appear anywhere
    * in the benchmark set (set containment, not Jaccard — a short eval doc
    * fully embedded in a long corpus doc still scores 1.0 on the doc that
    * matters). Docs shorter than the shingle width drop out (no signal).
    * Exact division int/int in IEEE doubles + fixed 6dp rounding keeps the
    * report engine-exact (DuckDB-oracled). */
  def contaminationReport(corpus: DataFrame, bench: DataFrame,
      width: Int = ShingleWidth): DataFrame = {
    val sh = Dedup.hashedShingles(corpus, width)
    val benchSh = Dedup.hashedShingles(bench, width)
      .select(col("h")).distinct().withColumn("hit", lit(1L))
    sh.join(broadcast(benchSh), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hits"))
      .select(col("doc_id"), col("n_shingles"), col("n_hits"),
        round2(col("n_hits").cast("double") / col("n_shingles"), 6)
          .as("contamination"))
      .orderBy("doc_id")
  }

  /** [[contaminationReport]] with a Bloom-filter pre-probe — IDENTICAL
    * output (it shares the DuckDB oracle verbatim: bloom false positives
    * are removed by an exact confirm join, and Bloom filters have no false
    * negatives), different scale envelope. The exact variant broadcasts
    * the benchmark's full distinct shingle-hash set, which stops fitting
    * when the eval union grows to ~10⁹ shingles (8 GB+ of longs hashed);
    * here the broadcastable artifact is the SKETCH (~1.2 bytes/element at
    * 1% fpp — an order of magnitude smaller), probed map-side over the
    * corpus, and the exact set is only touched by a join whose left side
    * is the bloom HITS (true hits + fpp·|corpus shingles| false
    * positives), a sliver of the corpus stream — so neither side ever
    * broadcasts the exact set nor shuffles the full corpus. The filter is
    * built with one driver-side aggregation (`stat.bloomFilter`, the same
    * driver path Spark's runtime-filter injection uses, sized by
    * `expectedItems ≈ benchSh.count`). Per-doc totals still aggregate the
    * full shingle stream — that aggregation exists in the exact variant
    * too. */
  def contaminationReportBloom(corpus: DataFrame, bench: DataFrame,
      width: Int = ShingleWidth, fpp: Double = 0.01): DataFrame = {
    val sh = Dedup.hashedShingles(corpus, width)
    val benchSh = Dedup.hashedShingles(bench, width).select("h").distinct()
    val expected = math.max(1L, benchSh.count())
    val bloom = benchSh.stat.bloomFilter("h", expected, fpp)
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bloom.writeTo(out)
      out.toByteArray
    }
    val mightContain = ColumnBridge.column(
      BloomMightContainLong(ColumnBridge.expression(col("h")), bytes))
    // exact confirm: kills the false positives; no broadcast hint — the
    // candidate side is already sketch-thinned, AQE picks the strategy
    val hits = sh.filter(mightContain)
      .join(benchSh, Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round2(coalesce(col("n_hits"), lit(0L)).cast("double")
          / col("n_shingles"), 6).as("contamination"))
      .orderBy("doc_id")
  }

  /** The cleaned corpus: documents whose contamination is below `threshold`
    * (docs too short to shingle carry no overlap evidence and are kept).
    * Anti-join on the flagged id set — the corpus rows stream through
    * untouched except for the doc_id probe. Unlike the benchmark shingle
    * set (small by construction), the flagged set is derived from the
    * CORPUS side and is not bounded — a heavily contaminated corpus could
    * flag any fraction of it — so no broadcast hint here: AQE picks
    * broadcast when the runtime size allows and falls back to a shuffled
    * join when it doesn't. */
  def decontaminate(corpus: DataFrame, bench: DataFrame,
      threshold: Double = 0.5, width: Int = ShingleWidth): DataFrame =
    corpus.join(
      contaminationReport(corpus, bench, width)
        .filter(col("contamination") >= threshold).select("doc_id"),
      Seq("doc_id"), "left_anti")

  /** Span-level decontamination: instead of DROPPING overlapping documents
    * ([[decontaminate]]), SCRUB the overlapping `width`-gram spans out of
    * the text and keep the rest — the right call when eval n-grams are
    * quotes/boilerplate inside otherwise-clean documents (dropping would
    * cost the clean 95%). A corpus token is removed iff covered by at
    * least one window whose hash appears in the benchmark shingle set;
    * overlapping windows merge (same position-set mechanics as
    * [[Dedup.removeDupSpans]], same [[TextExpressions.RemoveTokensAt]]
    * re-assembly).
    *
    * Scale: the benchmark set broadcasts (small by construction, the
    * file-level invariant); the corpus windows are probed MAP-SIDE by the
    * broadcast semi-join — position expansion, per-doc position sets, and
    * the final left join are all bounded by contaminated content. No
    * corpus-sized shuffle at all (cheaper than [[Dedup.removeDupSpans]],
    * which must exchange once to discover cross-doc frequency — here the
    * "duplicated set" is given). */
  def scrubContaminatedSpans(corpus: DataFrame, bench: DataFrame,
      width: Int = ShingleWidth): DataFrame = {
    val benchSh = Dedup.hashedShingles(bench, width)
      .select(col("h")).distinct()
    val hits = corpus.select(col("doc_id"),
        posexplode(TextExpressions.shinglePosHashes(col("text"), width))
          .as(Seq("pos", "h")))
      .join(broadcast(benchSh), Seq("h"), "left_semi")
    val removalSets = hits
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (width - 1))).as("rpos"))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("rpos"))).as("rposs"))
    corpus.join(removalSets, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        coalesce(size(col("rposs")), lit(0)).cast("long").as("n_removed"),
        TextExpressions.removeTokensAt(col("text"),
          coalesce(col("rposs"), lit(Array.empty[Int]))).as("clean_text"))
      .orderBy("doc_id")
  }
}
