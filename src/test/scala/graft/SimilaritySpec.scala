package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.ext.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  // deterministic corpus: vec 1 nearly equals vec 0; others pseudo-random
  private def vec(seed: Int): Array[Float] =
    Array.tabulate(dim)(i => (math.sin(seed * 31 + i * 7).toFloat))
  lazy val emb: DataFrame = {
    val rows = Seq(
      (0L, vec(1)),
      (1L, vec(1).map(x => x + 0.001f))) ++
      (2L to 30L).map(k => (k, vec(k.toInt)))
    rows.toDF("vec_id", "embedding")
  }

  private def cosScala(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    dot / (na * nb)
  }

  test("cosineTopK matches a driver-side brute force") {
    val got = Similarity.cosineTopK(emb, queryVecId = 0L, k = 5)
      .as[(Long, Double)].collect().toSeq
    val all = emb.as[(Long, Array[Float])].collect()
    val q = all.find(_._1 == 0L).get._2
    val want = all.filter(_._1 != 0L)
      .map { case (id, v) => (id, cosScala(q, v)) }
      .sortBy { case (id, s) => (-s, id) }.take(5)
    assert(got.map(_._1).toSeq == want.map(_._1).toSeq)
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 1e-4) }
    assert(got.head._1 == 1L && got.head._2 > 0.9999)
  }

  test("allNearestNeighbors matches a driver-side all-pairs brute force") {
    val got = Similarity.allNearestNeighbors(emb, k = 1)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    val all = emb.as[(Long, Array[Float])].collect()
    val want = all.map { case (id, v) =>
      id -> all.filter(_._1 != id)
        .map { case (cid, cv) => (cid, cosScala(v, cv)) }
        .minBy { case (cid, s) => (-s, cid) }
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (nn, sim)) =>
      assert(nn == want(id)._1, s"vec $id: nn $nn != ${want(id)._1}")
      assert(math.abs(sim - want(id)._2) < 1e-4)
    }
    // the planted near-identical pair must be mutual nearest neighbors
    assert(got(0L)._1 == 1L && got(1L)._1 == 0L)
  }

  test("allNearestNeighbors never broadcasts the corpus: shuffled " +
      "CartesianProduct tiles, and explicit tiling is result-identical") {
    val base = Similarity.allNearestNeighbors(emb, k = 2)
    val baseRows = base.collect().toSeq // collect FIRST: AQE final plan
    val plan = base.queryExecution.executedPlan.toString
    assert(plan.contains("CartesianProduct"),
      s"expected shuffled CartesianProduct tiles, got:\n$plan")
    assert(!plan.contains("BroadcastExchange"),
      s"corpus-side broadcast crept back in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"BNLJ means a side was broadcast:\n$plan")
    // forcing multiple corpus tiles (each task buffers corpus/t, the 100 TB
    // memory bound) must not change a single output row
    val tiled = Similarity.allNearestNeighbors(emb, k = 2, tiles = 3)
    assert(tiled.collect().toSeq == baseRows)
    val tiledPlan = tiled.queryExecution.executedPlan.toString
    assert(tiledPlan.contains("CartesianProduct") &&
      !tiledPlan.contains("BroadcastExchange"))
  }

  test("trainPqCodebooks fails loudly on a degenerate corpus (ragged " +
      "codebook would mis-index the flat ADC table at serve time)") {
    // every embedding identical → each subspace has ONE distinct
    // sub-vector → KMeans returns 1 center, not ksub
    val const = (0L to 20L).map(i => (i, Array.fill(dim)(1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.trainPqCodebooks(const, m = 2, ksub = 8)
    }
    assert(e.getMessage.contains("expected 8"),
      s"wrong failure: ${e.getMessage}")
  }

  test("batchKnn rejects a corpus-scale broadcast side at plan time") {
    val e = intercept[IllegalArgumentException] {
      Similarity.batchKnn(emb, numQueries = Similarity.MaxBroadcastQueryRows + 1)
    }
    assert(e.getMessage.contains("broadcast"))
    assert(intercept[IllegalArgumentException] {
      Similarity.batchKnn(emb, numQueries = 0)
    }.getMessage.contains("outside"))
  }

  test("lshTopK keeps high recall vs exact top-k") {
    val exact = Similarity.cosineTopK(emb, 0L, k = 5)
      .as[(Long, Double)].collect().map(_._1).toSet
    val approx = Similarity.lshTopK(emb, 0L, k = 5, dim = dim,
      bits = 12, maxHammingBits = 6)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert((exact intersect approx).size >= 3,
      s"recall too low: exact=$exact approx=$approx")
  }

  test("ivfTopK keeps high recall vs exact top-k on real embeddings") {
    val emb = graft.ingest.Sources.table(spark, sf("sf0.001"), "embeddings")
    val exact = Similarity.cosineTopK(emb, 0L, k = 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val ivf = Similarity.ivfTopK(emb, 0L, k = 10, cells = 8, nProbe = 4)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert((exact intersect ivf).size >= 6,
      s"recall too low: exact=$exact ivf=$ivf")
  }

  test("hardNegativesAnn: the IVF-shortlist route holds recall vs the " +
      "exact tiled entry and plans as an equi-join, never a cross product") {
    val emb = graft.ingest.Sources.table(spark, sf("sf0.001"), "embeddings")
    val cents = Similarity.trainIvfCentroids(emb)
    val exact = Similarity.hardNegatives(emb)
      .select("vec_id", "neg_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.hardNegativesAnn(emb, cents)
    val annRows = ann.collect() // collect FIRST: AQE final plan
    val annSet = annRows.map(r => (r.getLong(0), r.getLong(3))).toSet
    // every vector emits rows on both routes (labels are dense here)
    assert(annRows.map(_.getLong(0)).distinct.length ==
      exact.map(_._1).size)
    val recall = (exact intersect annSet).size.toDouble / exact.size
    assert(recall >= 0.5,
      s"recall $recall below the nProbe=4/16-cells floor " +
        s"(exact=${exact.size} hit=${(exact intersect annSet).size})")
    // the 100 TB property: candidate generation is an EQUI-join on the
    // cell id — no CartesianProduct, no BNLJ anywhere in the plan
    val plan = ann.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"ANN route must never be quadratic:\n$plan")
  }

  test("hardNegativesAnnPq: the ADC top-C route holds recall vs the " +
      "exact-within-shortlist ANN entry and keeps ADC out of the " +
      "exchanges (codes + memoized LUT, no cross product)") {
    val emb = graft.ingest.Sources.table(spark, sf("sf0.001"), "embeddings")
    val cents = Similarity.trainIvfCentroids(emb)
    val cbs = Similarity.trainPqCodebooks(emb)
    val exact = Similarity.hardNegativesAnn(emb, cents)
      .select("vec_id", "neg_id").as[(Long, Long)].collect().toSet
    val pqDf = Similarity.hardNegativesAnnPq(emb, cents, cbs)
    val pqRows = pqDf.collect() // collect FIRST: AQE final plan
    val pqSet = pqRows.map(r => (r.getLong(0), r.getLong(3))).toSet
    // every query emits rows on both routes, and the ADC shortlist keeps
    // most of the exact-within-shortlist top-k (C = 32 vs k = 3; PQ on
    // unstructured 64-dim embeddings is noisy — the floor is deliberate)
    assert(pqRows.map(_.getLong(0)).distinct.length ==
      exact.map(_._1).size)
    val recall = (exact intersect pqSet).size.toDouble / exact.size
    assert(recall >= 0.7,
      s"ADC top-${Similarity.HardNegPqShortlist} recall $recall below " +
        s"floor (exact=${exact.size} hit=${(exact intersect pqSet).size})")
    // the scale properties: no cross product anywhere; the shortlist
    // join's corpus side carries PQ codes, the per-pair scorer is the
    // memoized codegen expression (the LUT is NOT a shuffled column)
    val plan = pqDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"PQ route must never be quadratic:\n$plan")
    assert(plan.contains("pq_encode") && plan.contains("pq_adc_lut_dot"),
      s"expected ADC machinery in the plan:\n$plan")
  }

  test("hardNegativesAnnPq below the broadcast cap: every join " +
      "broadcasts — the r14 548 MB re-rank exchange (pair frame with " +
      "q_emb attached, re-shuffled by neg_id) is structurally absent") {
    val emb = graft.ingest.Sources.table(spark, sf("sf0.001"), "embeddings")
    val cents = Similarity.trainIvfCentroids(emb)
    val cbs = Similarity.trainPqCodebooks(emb)
    val df = Similarity.hardNegativesAnnPq(emb, cents, cbs)
    df.collect() // collect FIRST: AQE final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the size-guarded broadcast switch to engage:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      "below AdcBroadcastCapBytes no join may exchange the candidate/" +
        s"pair frames:\n$plan")
  }

  test("hardNegativesAnnPq above the broadcast cap (forced via cap 0): " +
      "the equi-join fallback is never quadratic and returns the " +
      "IDENTICAL rows — the switch is plan-only") {
    val emb = graft.ingest.Sources.table(spark, sf("sf0.001"), "embeddings")
    val cents = Similarity.trainIvfCentroids(emb)
    val cbs = Similarity.trainPqCodebooks(emb)
    val below = Similarity.hardNegativesAnnPq(emb, cents, cbs)
      .collect().toSeq
    val df = Similarity.hardNegativesAnnPq(emb, cents, cbs,
      broadcastCapBytes = 0L)
    val above = df.collect().toSeq
    assert(above == below, "the broadcast switch must not change results")
    val plan = df.queryExecution.executedPlan.toString
    // the fallback's joins are all EQUI joins — AQE may still broadcast
    // tiny sides at runtime (desired at scale too); what must never
    // appear is a quadratic shape
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"above-cap fallback must stay equi-join shaped:\n$plan")
  }

  test("hardNegativesAnnPq drops zero-norm vectors up front (equality-" +
      "preserving: the exact route nulls them out of every sim)") {
    import spark.implicits._
    val emb = graft.ingest.Sources.table(spark, sf("sf0.001"), "embeddings")
    val maxId = emb.agg(
      org.apache.spark.sql.functions.max("vec_id")).head().getLong(0)
    val withZero = emb.unionByName(
      Seq((maxId + 1, Array.fill(64)(0.0f), 999L))
        .toDF("vec_id", "embedding", "label"))
    val cents = Similarity.trainIvfCentroids(emb)
    val cbs = Similarity.trainPqCodebooks(emb)
    val pq = Similarity.hardNegativesAnnPq(withZero, cents, cbs).collect()
    assert(!pq.exists(r => r.getLong(0) == maxId + 1 ||
      r.getLong(3) == maxId + 1),
      "zero-norm vector must appear on neither side of any pair")
    assert(pq.nonEmpty)
  }

  test("matryoshkaQuality matches a driver-side replay: mean of " +
      "per-vector 4dp-quantized prefix-mass ratios") {
    // real 64-dim embeddings: every prefix length is a strict prefix
    val real = graft.ingest.Sources.table(spark, sf("sf0.001"), "embeddings")
      .select("vec_id", "embedding")
    val got = Similarity.matryoshkaQuality(real)
      .as[(Long, Long, Double)].collect().toSeq
    val all = real.as[(Long, Array[Float])].collect()
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val want = Similarity.MatryoshkaDims.map { d =>
      val qs = all.map { case (_, v) =>
        val sd = v.take(d).map(x => x.toDouble * x.toDouble).sum
        val sall = v.map(x => x.toDouble * x.toDouble).sum
        (sall, math.floor(math.sqrt(sd) / math.sqrt(sall) * 10000 + 0.5)
          .toLong)
      }.collect { case (sall, q) if sall > 0 => q }
      (d.toLong, qs.length.toLong,
        r6(qs.sum.toDouble / qs.length.toDouble / 10000.0))
    }
    assert(got == want, s"got $got want $want")
    // the full prefix is the vector itself: mean cosine exactly 1
    assert(got.last._3 == 1.0)
    // retained mass grows with the prefix
    assert(got.map(_._3) == got.map(_._3).sorted)
  }

  test("int8 quantization bounds reconstruction error by scale/2") {
    val all = emb.as[(Long, Array[Float])].collect().toMap
    val q = Similarity.quantizeInt8(emb)
      .as[(Long, Float, Seq[Byte])].collect()
    assert(q.length == all.size)
    q.foreach { case (id, scale, bytes) =>
      val orig = all(id)
      assert(bytes.length == orig.length)
      orig.zip(bytes).foreach { case (x, b) =>
        assert(math.abs(x - b * scale.toDouble) <= scale / 2.0 + 1e-6,
          s"vec $id: $x vs ${b * scale}")
      }
    }
  }

  test("int8-quantized KNN recalls the float top-k on real embeddings") {
    val emb = graft.ingest.Sources.table(spark, sf("sf0.001"), "embeddings")
    val exact = Similarity.cosineTopK(emb, 0L, k = 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val int8 = Similarity.cosineTopKInt8(emb, 0L, k = 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert((exact intersect int8).size >= 8,
      s"recall too low: exact=$exact int8=$int8")
  }

  test("semDedup: per-cell report matches a driver replay over the " +
      "actual assignment; the planted near-dup pair drops") {
    val cents = Similarity.trainIvfCentroids(emb, 4)
    val asg = Similarity.assignCells(emb, cents)
      .select(col("vec_id"), col("cell").cast("long"))
      .as[(Long, Long)].collect().toMap
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val want = asg.values.toSeq.distinct.sorted.map { c =>
      val ids = asg.filter(_._2 == c).keys.toSeq.sorted
      val prs = for {
        i <- ids; j <- ids if i < j
        s = cosScala(vecs(i), vecs(j)) if !s.isNaN
      } yield (j, r4(s))
      val nd = prs.filter(_._2 >= Similarity.SemDedupTau)
        .map(_._1).distinct.size.toLong
      (c, ids.size.toLong, prs.size.toLong, nd,
        if (prs.isEmpty) None else Some(prs.map(_._2).max))
    }
    val got = Similarity.semDedup(emb, cents)
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got == want)
    // the near-identical pair (0, 1) lands in one cell and prunes one
    assert(asg(0L) == asg(1L))
    assert(got.map(_._4).sum >= 1L)
    // conservation: every vector is assigned to exactly one cell
    assert(got.map(_._2).sum == vecs.size.toLong)
  }

  test("semDedup plan: ONE cell exchange (collect_list + cell_pair_stats " +
      "— vectors ship once, r17) — never a join-shaped pair enumeration") {
    val cents = Similarity.trainIvfCentroids(emb, 4)
    val df = Similarity.semDedup(emb, cents)
    df.collect()
    // the physical Aggregate hides its result projection behind an
    // attribute name — pin the expression on the optimized plan
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("cell_pair_stats"),
      s"pair stats must come from the cell-local expression:\n$opt")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("collect_list"), s"one-exchange aggregate:\n$plan")
    assert(!plan.contains("Join"), s"no pair join at all:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("marginPairs matches a driver-side replay (left-assoc avgK " +
      "chains, identical margin division, rank by raw margin)") {
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    val nq = Similarity.MarginQueries
    val anchors = vecs.keys.filter(id => id >= 0 && id < nq).toSeq.sorted
    val corpus = vecs.keys.filter(_ >= nq).toSeq.sorted
    val sims = (for (a <- anchors; c <- corpus)
      yield (a, c) -> cosScala(vecs(c), vecs(a))).toMap
    def avgChain(xs: Seq[Double]): Double =
      xs.reduceLeft(_ + _) / Similarity.MarginK.toDouble
    val xAvg = anchors.map { a =>
      a -> avgChain(corpus.map(c => (sims((a, c)), c))
        .sortBy { case (s, id) => (-s, id) }
        .take(Similarity.MarginK).map(_._1))
    }.toMap
    val cand = anchors.flatMap { a =>
      corpus.map(c => (sims((a, c)), c))
        .sortBy { case (s, id) => (-s, id) }
        .take(Similarity.MarginCandidateDepth)
        .map { case (s, c) => (a, c, s) }
    }
    val yAvg = cand.map(_._2).distinct.map { y =>
      y -> avgChain(anchors.map(a => (sims((a, y)), a))
        .sortBy { case (s, id) => (-s, id) }
        .take(Similarity.MarginK).map(_._1))
    }.toMap
    def r(x: Double, dp: Int) = {
      val s = math.pow(10, dp)
      math.floor(x * s + 0.5) / s
    }
    val want = cand.groupBy(_._1).toSeq.flatMap { case (a, cs) =>
      cs.map { case (_, y, s) =>
        val den = (xAvg(a) + yAvg(y)) / 2.0
        (a, y, s, s / den)
      }.sortBy { case (_, y, _, m) => (-m, y) }.zipWithIndex
        .map { case ((_, y, s, m), i) =>
          (a, i + 1L, y, r(m, 6), r(s, 4)) }
    }.sortBy(t => (t._1, t._2))
    val got = Similarity.marginPairs(emb)
      .select("query_id", "rank", "vec_id", "margin", "cosine_sim")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == want)
    // non-degenerate: all anchors present, full candidate lists, and
    // margins actually discriminate (not all equal)
    assert(got.map(_._1).distinct.size == nq)
    assert(got.groupBy(_._1).values
      .forall(_.size == Similarity.MarginCandidateDepth))
    assert(got.map(_._4).distinct.size > 1)
  }

  test("labelCentroids long format matches driver-side means; arrays reassemble") {
    val labelled = emb.withColumn("label",
      org.apache.spark.sql.functions.expr("CAST(vec_id % 3 AS STRING)"))
    val got = Similarity.labelCentroids(labelled)
      .as[(String, Long, Double)].collect()
    // long shape: one row per (label, 1-based pos), totally ordered
    assert(got.length == 3 * dim)
    assert(got.map(r => (r._1, r._2)).toSeq ==
      (for (l <- 0 to 2; p <- 1 to dim) yield (l.toString, p.toLong)))
    val all = labelled.as[(Long, Array[Float], String)].collect()
    got.foreach { case (l, pos, m) =>
      val members = all.filter(_._3 == l)
      val want = members.map(_._2(pos.toInt - 1).toDouble).sum / members.length
      assert(math.abs(m - want) < 1e-6, s"cell ($l, $pos)")
    }
    val arrays = Similarity.labelCentroidArrays(labelled)
      .as[(String, Array[Double])].collect()
    assert(arrays.length == 3 && arrays.forall(_._2.length == dim))
    arrays.foreach { case (l, arr) =>
      got.filter(_._1 == l).foreach { case (_, pos, m) =>
        assert(arr(pos.toInt - 1) == m) }
    }
  }

  test("centroidSimilarity: a single-member label's vector IS its centroid") {
    val df = Seq(
      (0L, vec(1), 7),  // label 7: two near-identical members
      (1L, vec(1).map(x => x + 0.001f), 7),
      (2L, vec(5), 9))  // label 9: singleton — centroid == the vector
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidSimilarity(df)
      .as[(Long, Int, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got(2L) == 1.0, s"singleton centroid sim: ${got(2L)}")
    assert(got(0L) > 0.999 && got(1L) > 0.999, got)
  }

  test("hardNegatives skips the same-label nearest neighbor and mines " +
      "the closest different-label vector") {
    val df = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      (1L, Seq(0.99f, 0.01f, 0f, 0f), 0), // nearest overall — same label
      (2L, Seq(0.9f, 0.3f, 0f, 0f), 1),   // the hard negative
      (3L, Seq(0f, 1f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(df)
      .as[(Long, Int, Long, Long, Int, Double)].collect()
    val v0 = got.filter(_._1 == 0L).sortBy(_._3)
    assert(v0.head._4 == 2L && v0.head._5 == 1, v0.toSeq.toString)
    // only the two label-1 vectors are candidates — never same-label 1
    assert(v0.map(_._4).toSet == Set(2L, 3L), v0.toSeq.toString)
    // ranks are dense from 1 even when fewer than k candidates exist
    assert(v0.map(_._3).toSeq == Seq(1L, 2L))
  }

  test("embeddingNearDups finds the planted near-identical pair") {
    val got = Similarity.embeddingNearDups(emb, threshold = 0.999, dim = dim)
      .as[(Long, Long, Double)].collect()
    assert(got.exists(p => p._1 == 0L && p._2 == 1L))
  }

  test("PQ codes compress to m bytes; shortlist+re-rank keeps recall") {
    val emb = graft.ingest.Sources.table(spark, sf("sf0.001"), "embeddings")
    val cb = Similarity.trainPqCodebooks(emb)
    assert(cb.length == 16 && cb.forall(_.length == 32)
      && cb.forall(_.forall(_.length == 4)))
    val codes = Similarity.pqEncode(emb, cb)
      .as[(Long, Seq[Byte])].collect()
    assert(codes.forall(_._2.length == 16))
    assert(codes.forall(_._2.forall(b => b >= 0 && b < 32)))
    val exact = Similarity.cosineTopK(emb, 0L, k = 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val pq = Similarity.pqTopK(emb, cb, queryVecId = 0L, k = 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert((exact intersect pq).size >= 8,
      s"recall too low: exact=$exact pq=$pq")
    // the ADC shortlist stage is scan→project→top-k (no join before the
    // TakeOrdered); the only join in the plan is the k·refine re-rank,
    // and it must broadcast the shortlist side
    val plan = Similarity.pqTopK(emb, cb, queryVecId = 0L, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject")
      && plan.contains("BroadcastHashJoin"),
      s"PQ serving should be ADC top-k + broadcast re-rank:\n$plan")
  }

  /** Driver-side replay of the exact fixed-point Lloyd DISTANCES:
    * quantize → truncating centroid means (Scala Long `/` truncates
    * toward zero ≡ Spark `div`) → integer squared distances, sorted
    * (d2, cid) per vector. */
  private def lloydDistances(): Seq[(Long, Long, Seq[(Long, Long)])] = {
    val all = emb.as[(Long, Array[Float])].collect().toSeq
    val k = Similarity.KmeansK
    val q = all.map { case (id, v) =>
      (id, ((id % k) + k) % k,
        v.map(x => math.floor(x.toDouble * Similarity.KmQuantScale + 0.5)
          .toLong).toSeq) }
    val centroid: Map[(Long, Int), Long] = q
      .flatMap { case (_, s, qs) =>
        qs.zipWithIndex.map { case (v, p) => ((s, p), v) } }
      .groupBy(_._1).map { case (key, vs) =>
        val xs = vs.map(_._2); key -> xs.sum / xs.length }
    q.map { case (id, s, qs) =>
      (id, s, (0L until k.toLong).map { c =>
        (qs.zipWithIndex.map { case (v, p) =>
          val diff = v - centroid((c, p)); diff * diff }.sum, c)
      }.sorted) }
  }

  /** Argmin view of [[lloydDistances]] — the Lloyd assignment with the
    * (d2, cid) tiebreak. */
  private def lloydReplay(): Seq[(Long, Long, Long, Long)] =
    lloydDistances().map { case (id, s, ds) => (id, s, ds.head._2, ds.head._1) }

  test("kmeansStep matches a driver-side replay of the exact fixed-point " +
      "Lloyd iteration (sizes, moves, inertia)") {
    val want = lloydReplay().groupBy(_._3).map { case (cid, vs) =>
      (cid, vs.size.toLong, vs.count(v => v._2 != v._3).toLong,
        vs.map(_._4).sum) }.toSeq.sortBy(_._1)
    // inertia aggregates in BIGINT (precision-38 decimals are
    // driver-hash-unsafe as output columns; the headroom bound lives in
    // kmeansStep's comment)
    val step = Similarity.kmeansStep(emb)
    assert(step.schema("inertia").dataType == org.apache.spark.sql.types.LongType)
    val got = step.as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want, s"got $got want $want")
    // non-degenerate: something must actually move off its seed cluster
    assert(got.map(_._3).sum > 0, "no vector moved — degenerate fixture")
  }

  test("dimStats matches a driver-side exact-moment replay (quantized " +
      "longs, identical double op sequence, 3-sigma round-then-compare)") {
    val all = emb.as[(Long, Array[Float])].collect().toSeq
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val sc = Similarity.DimStatsScale
    val want = all
      .flatMap { case (_, v) => v.zipWithIndex.map { case (x, p) =>
        ((p + 1).toLong, math.floor(x.toDouble * sc + 0.5).toLong) } }
      .groupBy(_._1).toSeq.map { case (pos, cs) =>
        val qs = cs.map(_._2)
        val n = qs.size.toLong
        val meanQ = qs.sum.toDouble / n.toDouble
        val stdQ = math.sqrt(math.max(
          qs.map(q => q * q).sum.toDouble / n.toDouble - meanQ * meanQ,
          0.0))
        val nOut = qs.count(q =>
          r6(math.abs(q.toDouble - meanQ)) > r6(3.0 * stdQ)).toLong
        (pos, n, r6(meanQ / sc.toDouble), r6(stdQ / sc.toDouble), nOut)
      }.sortBy(_._1)
    val got = Similarity.dimStats(emb)
      .as[(Long, Long, Double, Double, Long)].collect().toSeq
    assert(got == want, s"got $got want $want")
  }

  test("clusterBalancedSample: the perCluster nearest-to-centroid " +
      "vectors per cluster in (d2, vec_id) order") {
    val per = 2
    val want = lloydReplay().groupBy(_._3).toSeq.flatMap { case (cid, vs) =>
      vs.sortBy(v => (v._4, v._1)).take(per).zipWithIndex
        .map { case ((id, _, _, d2), i) => (cid, (i + 1).toLong, id, d2) }
    }.sortBy(r => (r._1, r._2))
    val got = Similarity.clusterBalancedSample(emb, perCluster = per)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want, s"got $got want $want")
  }

  test("clusterSilhouette matches a driver-side replay: two smallest " +
      "exact distances, IEEE sqrt, per-point 4dp quantization before " +
      "the per-cluster mean") {
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val sc = Similarity.SilhouetteScale
    val per = lloydDistances().map { case (_, _, ds) =>
      val a = math.sqrt(ds(0)._1.toDouble)
      val b = math.sqrt(ds(1)._1.toDouble)
      val s = if (math.max(a, b) == 0.0) 0.0 else (b - a) / math.max(a, b)
      (ds(0)._2, math.floor(s * sc + 0.5).toLong) }
    val want = per.groupBy(_._1).toSeq.map { case (cid, vs) =>
      (cid, vs.size.toLong,
        r6((vs.map(_._2).sum.toDouble / vs.size.toDouble) / sc.toDouble))
    }.sortBy(_._1)
    val got = Similarity.clusterSilhouette(emb)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == want, s"got $got want $want")
    // simplified silhouette is bounded [0, 1] (a <= b by construction)
    assert(got.forall(r => r._3 >= 0.0 && r._3 <= 1.0), got.toString)
  }

  test("embeddingDrift: a label whose parity halves point the same way " +
      "reads cosine 1 / no drift; an antipodal label flags") {
    def v(parts: (Int, Float)*): Seq[Float] = {
      val arr = Array.fill(64)(0.0f)
      parts.foreach { case (i, x) => arr(i) = x }
      arr.toSeq
    }
    // label 0: both halves along e0 (stable); label 1: even ids along
    // e1, odd ids along -e1 (maximal drift, cosine -1)
    val df = Seq(
      (0L, v(0 -> 1.0f), 0), (1L, v(0 -> 1.0f), 0),
      (2L, v(0 -> 1.0f), 0), (3L, v(0 -> 1.0f), 0),
      (4L, v(1 -> 1.0f), 1), (5L, v(1 -> -1.0f), 1),
      (6L, v(1 -> 1.0f), 1), (7L, v(1 -> -1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding",
        "label")
    val got = Similarity.embeddingDrift(df)
      .as[(Int, Long, Long, Option[Double], Boolean)].collect().toSeq
    assert(got == Seq(
      (0, 2L, 2L, Some(1.0), false),
      (1, 2L, 2L, Some(-1.0), true)), got.toString)
  }

  test("mmrRerank picks pure relevance first (smallest-id tiebreak), then " +
      "trades relevance for diversity — the exact duplicate of the first " +
      "pick drops behind the orthogonal candidate") {
    def v(parts: (Int, Float)*): Seq[Float] = {
      val arr = Array.fill(64)(0.0f)
      parts.foreach { case (i, x) => arr(i) = x }
      arr.toSeq
    }
    // query = e0; candidates 1 and 2 are EXACT duplicates (sim 1), 3 is
    // orthogonal to them (sim 0) with the same relevance to the query —
    // a plain kNN would rank the duplicate second, MMR must not
    val df = Seq(
      (0L, v(0 -> 1.0f), 0),
      (1L, v(0 -> 0.7f, 1 -> 0.7f), 1),
      (2L, v(0 -> 0.7f, 1 -> 0.7f), 2),
      (3L, v(0 -> 0.7f, 1 -> -0.7f), 3))
      .toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding",
        "label")
    val got = Similarity.mmrRerank(df)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 3L, 2L), got.toString)
    // rank 1: penalty 0 by definition; rank 2 (orthogonal): penalty 0;
    // rank 3 (the duplicate): penalty = sim to its twin = 1
    assert(got(0)._4 == 0.0 && math.abs(got(1)._4) < 1e-4 &&
      math.abs(got(2)._4 - 1.0) < 1e-4, got.toString)
    // score arithmetic: λ·rel − (1−λ)·penalty within quantization noise
    val lam = Similarity.MmrLambdaNum.toDouble / Similarity.MmrLambdaDen
    got.foreach { case (_, _, rel, pen, score) =>
      assert(math.abs(score - (lam * rel - (1 - lam) * pen)) < 1e-5,
        got.toString) }
    // relevance ties broke to the smaller vec_id at rank 1
    assert(math.abs(got(0)._3 - got(2)._3) < 1e-9, got.toString)
  }

  test("trainPcaDirection is bit-deterministic, unit-norm, sign-fixed, " +
      "and finds the dominant variance axis; pcaProjections replays " +
      "exactly per label") {
    // a corpus whose variance is concentrated on axis 1: dim-0 noise is
    // tiny, dim-1 spreads wide, the rest are constant
    val rows = (0L until 40L).map { i =>
      val v = Array.fill(64)(0.25f)
      v(0) = (0.01 * (i % 3)).toFloat
      v(1) = if (i % 2 == 0) 2.0f else -2.0f
      (i, v.toSeq, (i % 4).toInt)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding",
        "label")
    val w1 = Similarity.trainPcaDirection(df)
    val w2 = Similarity.trainPcaDirection(df)
    assert(w1.toSeq == w2.toSeq, "training must be deterministic")
    assert(w1.length == 64)
    val top = w1.indices.maxBy(i => (math.abs(w1(i).toDouble), -i))
    assert(top == 1 && w1(1) > 0,
      s"dominant axis should be dim 1, positive: ${w1.toSeq.take(4)}")
    val norm2 = w1.map(x => x.toDouble * x.toDouble).sum /
      (Similarity.PcaScale.toDouble * Similarity.PcaScale.toDouble)
    assert(math.abs(norm2 - 1.0) < 1e-3, s"norm^2 = $norm2")
    // serve-side replay: exact long projections, per-label aggregation
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val ds = Similarity.DimStatsScale
    val praw = rows.map { case (id, v, lab) =>
      (lab, v.zipWithIndex.map { case (x, p) =>
        math.floor(x.toDouble * ds + 0.5).toLong * w1(p) }.sum) }
    val want = praw.groupBy(_._1).toSeq.map { case (lab, vs) =>
      val ps = vs.map(_._2)
      (lab, ps.size.toLong, ps.min, ps.max,
        r6((ps.sum.toDouble / ps.size.toDouble) /
          (ds.toDouble * Similarity.PcaScale.toDouble)))
    }.sortBy(_._1)
    val got = Similarity.pcaProjections(df, w1)
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    assert(got == want, s"got $got want $want")
    // the wide axis separates the even/odd construction: labels 0/2
    // (even ids) project opposite to labels 1/3 (odd ids)
    val m = got.map(r => r._1 -> r._5).toMap
    assert(m(0) * m(1) < 0, m.toString)
  }
}
