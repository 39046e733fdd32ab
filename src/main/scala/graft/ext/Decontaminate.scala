package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Exprs._

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

  /** Per-document contamination report: `n_hits / n_shingles`, the fraction
    * of the doc's DISTINCT word-`width`-gram shingles that appear anywhere
    * in the benchmark set (set containment, not Jaccard — a short eval doc
    * fully embedded in a long corpus doc still scores 1.0 on the doc that
    * matters). Docs shorter than the shingle width drop out (no signal).
    * Exact division int/int in IEEE doubles + fixed 6dp rounding keeps the
    * report engine-exact (DuckDB-oracled). */
  def contaminationReport(corpus: DataFrame, bench: DataFrame,
      width: Int = 3): DataFrame = {
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
      threshold: Double = 0.5, width: Int = 3): DataFrame =
    corpus.join(
      contaminationReport(corpus, bench, width)
        .filter(col("contamination") >= threshold).select("doc_id"),
      Seq("doc_id"), "left_anti")
}
