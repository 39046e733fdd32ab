package graft

import org.apache.spark.sql.functions._

/** Plan-shape regression pins for the bench-heavy BATCH queries: the r10
  * judge audit found every heavy plan correct (edge-keyed equi-joins,
  * bucket-decomposed interval joins, distributed ordinals), but nothing
  * stopped a refactor from silently reintroducing a quadratic
  * BroadcastNestedLoopJoin / CartesianProduct or a single-task global
  * window. This suite pins the absence of those shapes on the slowest
  * batch entries (streaming entries materialize through a stream and are
  * covered by their own batch-parity gates instead), plus a POSITIVE
  * control proving the detector actually detects: the naive overlap-join
  * formulation that ops.RangeJoin's bucket decomposition replaces DOES
  * plan as BNLJ.
  *
  * Assertions run on `queryExecution.executedPlan` of the CONSTRUCTED
  * frame (pre-collect, so AQE wrappers print the initial physical plan —
  * join strategy choices are already visible there) with expr-id-tolerant
  * string checks (the round-10 session-3 discipline).
  */
class PlanPinSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = sf("sf0.001")

  /** Bench-heavy batch entries (from bench_results.json, slowest first,
    * streaming entries excluded). Each must stay free of quadratic join
    * shapes. */
  private val pinned = Seq(
    "q_pagerank_exact", "q_dup_clusters_star",
    "q_dup_clusters", "q_cluster_keepers",
    "q_kcore", "q_bfs_hops", "q_session_concurrency", "q_jaccard_curve",
    "q_profile_events", "q_ngram_jaccard", "q_revenue_by_nation_salted",
    "q_profit_by_nation_year",
    // round-11 additions: the phrase probe's adjacency joins, the Markov
    // round joins and the survival fold must stay equi-join shapes
    // (q_revenue_acf is deliberately absent: its mean/denominator ride
    // 1-row broadcast-scalar crossJoins — the documented BNLJ class)
    "q_phrase_search", "q_markov_stationary", "q_survival_curve",
    "q_media_decode_real",
    // round-12 additions (q_lang_temperature_mix is deliberately absent:
    // its lang-total rides a 1-row broadcast-scalar crossJoin — the
    // documented BNLJ class, same as q_revenue_acf)
    "q_winnowing", "q_gopher_rules", "q_kn_continuations",
    "q_kmeans_step", "q_cluster_balanced_sample",
    // round-12 wave-2 additions (q_lm_outliers and q_hits_exact are
    // deliberately absent: the corpus moments / the L1 normalization
    // totals ride 1-row broadcast-scalar crossJoins — the documented
    // BNLJ class; q_mmr_rerank's final frame is a bounded local
    // relation, so a pin there would be vacuous)
    "q_containment_pairs", "q_tfidf_pairs", "q_jaccard_prefix",
    "q_source_similarity", "q_token_burstiness", "q_cluster_silhouette",
    "q_source_crossentropy", "q_pca_projection", "q_media_ahash")

  test("bench-heavy batch entries plan WITHOUT BroadcastNestedLoopJoin " +
      "or CartesianProduct") {
    val queries = SparkEntry.queries
    val offenders = pinned.flatMap { name =>
      val plan = queries(name)(spark, sfDir).queryExecution
        .executedPlan.toString
      val bad = Seq("BroadcastNestedLoopJoin", "CartesianProduct")
        .filter(plan.contains)
      if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"quadratic join shapes crept into pinned plans:\n" +
        offenders.mkString("\n"))
  }

  test("q_cluster_size_dist's only nested-loop is the 1-row broadcast " +
      "scalar cross join (the documented broadcast-scalar discipline)") {
    // the singleton-count subtraction crossJoins TWO 1-row aggregates —
    // O(1) by construction. Pin that any BNLJ in this plan sits directly
    // over broadcast aggregate scalars, never over a scan.
    val plan = SparkEntry.queries("q_cluster_size_dist")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val bnljIdx = plan.indexOf("BroadcastNestedLoopJoin")
    if (bnljIdx >= 0) {
      // both inputs of the scalar join are HashAggregates (count rows),
      // so the window of plan text after the BNLJ node must reach a
      // HashAggregate before it reaches any FileScan
      val after = plan.substring(bnljIdx)
      val agg = after.indexOf("HashAggregate")
      val scan = after.indexOf("FileScan")
      assert(agg >= 0 && (scan < 0 || agg < scan),
        s"BNLJ no longer sits over broadcast scalar aggregates:\n$plan")
    }
  }

  test("positive control: the NAIVE overlap predicate the RangeJoin " +
      "bucket decomposition replaces DOES plan as BNLJ (the detector " +
      "detects)") {
    val a = Seq((1L, 0L, 10L), (2L, 5L, 15L)).toDF("a_id", "a_s", "a_e")
    val b = Seq((9L, 3L, 7L)).toDF("b_id", "b_s", "b_e")
    val naive = a.join(b, col("a_s") <= col("b_e") &&
      col("b_s") <= col("a_e"))
    val plan = naive.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("CartesianProduct"),
      s"expected the naive overlap join to be quadratic:\n$plan")
    // and the real path over the same frames is NOT
    val bucketed = graft.ops.RangeJoin.overlapJoin(
      a, "a_s", "a_e", b, "b_s", "b_e", 5L)
    val goodPlan = bucketed.queryExecution.executedPlan.toString
    assert(!goodPlan.contains("BroadcastNestedLoopJoin") &&
      !goodPlan.contains("CartesianProduct"), goodPlan)
  }

  test("q_knn_all keeps its QUARANTINED tiled cartesian (the one allowed " +
      "site) — the quarantine boundary itself is pinned") {
    val plan = SparkEntry.queries("q_knn_all")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("CartesianProduct") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"q_knn_all's deliberate tiled all-pairs shape disappeared — " +
        s"if this is an intended redesign, update this pin:\n$plan")
  }

  test("global-ordinal consumers never window over corpus rows: every " +
      "windowspecdefinition runs on the bounded partition-counts frame") {
    // corpus shuffle + export shards ride ops.Ordinals: range repartition,
    // per-partition counts (≤ shuffle-partition ROWS), ONE window over
    // that bounded counts frame for the offsets, then a broadcast join
    // back. A refactor to row_number().over(Window.orderBy(corpus col))
    // would put a windowspecdefinition on a corpus column instead of the
    // internal _pid partition id — exactly what this pin rejects.
    for (name <- Seq("q_corpus_shuffle", "q_export_shards")) {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      val specs = "windowspecdefinition\\(([^)]*)\\)".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      val offCorpus = specs.filterNot(_.contains("_pid"))
      assert(offCorpus.isEmpty,
        s"$name windows over a non-_pid (corpus) spec: $offCorpus\n$plan")
    }
  }

  test("q_winnowing stays map-side: the only exchange is the final " +
      "ORDER BY range partition (HOF transforms, never an explode + " +
      "doc-keyed window shuffle)") {
    val plan = SparkEntry.queries("q_winnowing")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"q_winnowing grew a hash-partition shuffle:\n$plan")
    assert(!plan.contains("windowspecdefinition"),
      s"q_winnowing grew a window (doc-keyed shuffle shape):\n$plan")
  }

  test("q_kmeans_step serves centroids by BROADCAST (never a sort-merge " +
      "of the exploded cell stream against the K x dim frame)") {
    val plan = SparkEntry.queries("q_kmeans_step")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"centroid join is not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a sort-merge join crept into the Lloyd step:\n$plan")
  }

  test("q_cluster_balanced_sample's rank cap compiles to WindowGroupLimit " +
      "(top-k per cluster survives map-side; a hot cluster never pays a " +
      "full sort)") {
    val plan = SparkEntry.queries("q_cluster_balanced_sample")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-cap pushdown lost — full per-cluster sort:\n$plan")
  }
}
