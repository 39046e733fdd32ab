package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.ops.{EventQueries, WindowedQueries}

// top-level: nested case classes break encoder codegen
case class PropEvent(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** ScalaCheck invariants (SURVEY §5.3) over generated event frames. */
object GraftProperties extends Properties("graft") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // each case runs several Spark jobs; 20 cases keeps the suite fast
  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(20)

  private val baseMs = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private val genEvent: Gen[(Long, Long, String, Double)] = for {
    offMin <- Gen.choose(0L, 25L * 24 * 60) // 25 days of minutes
    user <- Gen.choose(1L, 8L)
    tpe <- Gen.oneOf("view", "click", "purchase", "signup", "error")
    cents <- Gen.choose(0L, 100000L)
  } yield (offMin, user, tpe, cents / 100.0)

  private val genEvents: Gen[List[(Long, Long, String, Double)]] =
    Gen.nonEmptyListOf(genEvent)

  private def toDf(rows: List[(Long, Long, String, Double)]) =
    rows.zipWithIndex.map { case ((off, user, tpe, v), i) =>
      PropEvent(i.toLong, new Timestamp(baseMs + off * 60000L), user, tpe, v, "{}")
    }.toDF()

  property("funnel counts sum to the funnel-filtered row count") =
    forAll(genEvents) { rows =>
      val df = toDf(rows)
      import org.apache.spark.sql.functions.{coalesce, lit, sum}
      val funnelTotal = EventQueries.conversionFunnel(df)
        .agg(coalesce(sum("event_count"), lit(0L)))
        .as[Long].head()
      val expected = rows.count(r =>
        Set("view", "click", "purchase").contains(r._3)).toLong
      funnelTotal == expected
    }

  property("abandoned users never purchased on that day") =
    forAll(genEvents) { rows =>
      val df = toDf(rows)
      val abandoned = EventQueries.abandonedCartUsers(df)
        .select("event_date", "user_id")
        .as[(java.sql.Date, Long)].collect().toSet
      val purchasers = rows.filter(_._3 == "purchase").map { r =>
        (new java.sql.Date((baseMs + r._1 * 60000L) / 86400000L * 86400000L),
          r._2)
      }.toSet
      abandoned.intersect(purchasers).isEmpty
    }

  property("dailyTopN keeps at most N rows per day, ranks contiguous") =
    forAll(genEvents, Gen.choose(1, 5)) { (rows, n) =>
      val out = EventQueries.dailyTopN(toDf(rows), n)
        .as[(java.sql.Date, Long, Long)].collect()
      val perDay = out.groupBy(_._1)
      perDay.values.forall { g =>
        g.length <= n && g.map(_._3).sorted.toSeq == (1L to g.length).toSeq
      }
    }

  property("daily revenue totals reconcile with raw purchase sum") =
    forAll(genEvents) { rows =>
      val perDay = EventQueries.dailyRevenue(toDf(rows))
        .as[(java.sql.Date, Double)].collect()
      val expected = rows.filter(_._3 == "purchase").map(_._4).sum
      // per-day 2dp rounding drifts < 0.005 per day from the exact total
      math.abs(perDay.map(_._2).sum - expected) <= 0.005 * (perDay.length + 1)
    }

  property("sessions partition the event stream") =
    forAll(genEvents) { rows =>
      val df = toDf(rows)
      val sessions = WindowedQueries.sessionize(df)
      val total = sessions.agg(org.apache.spark.sql.functions.sum("n_events"))
        .as[Long].head()
      val durationsOk = sessions.select("duration_us").as[Long]
        .collect().forall(_ >= 0L)
      total == rows.length.toLong && durationsOk
    }

  property("validateCount matches the frame size") =
    forAll(genEvents) { rows =>
      EventQueries.validateCount(toDf(rows)).as[Long].head() == rows.length
    }

  property("quantiles are ordered and bracketed by the group extremes") =
    forAll(genEvents) { rows =>
      EventQueries.priceQuantiles(toDf(rows)).collect().forall { r =>
        val (p50, p90, p99) = (r.getAs[Double]("p50"),
          r.getAs[Double]("p90"), r.getAs[Double]("p99"))
        val vals = rows.filter(_._3 == r.getAs[String]("event_type")).map(_._4)
        p50 <= p90 && p90 <= p99 &&
          p50 >= vals.min - 0.01 && p99 <= vals.max + 0.01
      }
    }

  property("gapfill spans min..max day contiguously and preserves totals") =
    forAll(genEvents) { rows =>
      val out = WindowedQueries.revenueGapfill(toDf(rows))
        .as[(java.sql.Date, Double)].collect()
      val days = out.map(_._1.toString)
      val contiguous = days.sorted.toSeq == days.toSeq &&
        days.length == (java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(days.head),
          java.time.LocalDate.parse(days.last)) + 1)
      val total = rows.filter(_._3 == "purchase").map(_._4).sum
      contiguous && math.abs(out.map(_._2).sum - total) <=
        0.005 * (out.length + 1)
    }

  property("shingleCounts matches naive trigram multiset counts") = {
    val genWords = Gen.choose(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab", "ba", "xy")))
    forAll(genWords) { words =>
      val text = words.mkString(" ")
      val got = Seq(Tuple1(text)).toDF("text")
        .select(graft.ext.TextExpressions.shingleCounts(
          org.apache.spark.sql.functions.col("text")).as("s"))
        .selectExpr("s.n_shingles", "s.n_distinct", "s.top_cnt")
        .as[(Long, Long, Long)].head()
      val tris = words.sliding(3).map(_.mkString(" ")).toSeq
      val counts = tris.groupBy(identity).map(_._2.size)
      got == ((tris.size.toLong, counts.size.toLong, counts.max.toLong))
    }
  }

  property("connected components agree with union-find ground truth") = {
    val genEdges = Gen.listOfN(12,
      Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))
      .map(_.filter(e => e._1 != e._2))
    forAll(genEdges) { edges =>
      edges.isEmpty || {
        val got = graft.ext.Dedup.connectedComponents(
            edges.toDF("u", "v"))
          .as[(Long, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        // union-find reference
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(ra) = rb
        }
        val members = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .groupBy(find)
        val expected = members.values.flatMap { vs =>
          vs.map(v => v -> ((vs.min, vs.size.toLong)))
        }.toMap
        got == expected
      }
    }
  }

  property("star connected components agree with union-find ground truth") = {
    val genEdges = Gen.listOfN(12,
      Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))
      .map(_.filter(e => e._1 != e._2))
    forAll(genEdges) { edges =>
      edges.isEmpty || {
        val got = graft.ext.Dedup.connectedComponentsStar(
            edges.toDF("u", "v"))
          .as[(Long, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(ra) = rb
        }
        val members = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .groupBy(find)
        val expected = members.values.flatMap { vs =>
          vs.map(v => v -> ((vs.min, vs.size.toLong)))
        }.toMap
        got == expected
      }
    }
  }

  property("dedupUnits keeps exactly the first occurrence of each unit") = {
    val genWords = Gen.listOf(Gen.oneOf("a", "b", "cc", "d", "ee", "f"))
    forAll(genWords) { words =>
      val text = words.mkString(" ")
      val got = Seq(Tuple1(text)).toDF("text")
        .select(graft.ext.TextExpressions.dedupUnits(
          org.apache.spark.sql.functions.col("text"), " "))
        .as[String].head()
      // Scala's distinct is keep-first — the semantics under test
      got == words.distinct.mkString(" ") ||
        // empty input: split yields [""], which dedups back to ""
        (words.isEmpty && got == "")
    }
  }

  property("int8 quantization error is bounded by scale/2 on random vectors") = {
    val genVec = Gen.nonEmptyListOf(Gen.chooseNum(-1000f, 1000f))
    forAll(genVec) { xs =>
      val df = Seq((0L, xs.toArray)).toDF("vec_id", "embedding")
      val (scale, q) = graft.ext.Similarity.quantizeInt8(df)
        .select("scale", "qemb").as[(Float, Seq[Byte])].head()
      xs.zip(q).forall { case (x, b) =>
        math.abs(x - b * scale.toDouble) <= scale / 2.0 + 1e-6 } &&
        q.length == xs.length
    }
  }

  property("chunkDocs reassembles the document at stride == chunk size") = {
    val genWords = Gen.nonEmptyListOf(Gen.oneOf("aa", "bb", "cc", "dd"))
    forAll(genWords) { words =>
      // stride == chunkTokens → disjoint windows; concatenating the
      // ordered chunks must reproduce the token stream exactly
      val df = Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
      val chunks = graft.ext.TextOps.chunkDocs(df, chunkTokens = 3, stride = 3)
        .orderBy("chunk_id").select("chunk_text").as[String].collect()
      chunks.flatMap(_.split(" ")).toSeq == words
    }
  }

  property("retention cohorts are disjoint and cover first-half users") =
    forAll(genEvents) { rows =>
      val out = EventQueries.userRetention(toDf(rows))
        .as[(String, Long)].collect()
      val retained = out.filter(_._1 == "retained").map(_._2).toSet
      val churned = out.filter(_._1 == "churned").map(_._2).toSet
      val firstHalf = rows.filter(_._1 < 14L * 24 * 60).map(_._2).toSet
      retained.intersect(churned).isEmpty &&
        (retained union churned) == firstHalf
    }

  property("replace-chain BPE equals independent array-BPE") = {
    // random small-alphabet tokens + random merge lists: the expression's
    // double-separator replace chain must equal a from-scratch array-BPE
    // encoder (merge applied left-to-right non-overlapping, in rank order)
    val genTok = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val genText = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, genTok).map(_.mkString(" ")))
    val genMergeList = Gen.choose(0, 4).flatMap { n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c", "ab", "bc", "aa"),
        Gen.oneOf("a", "b", "c", "ab", "bc", "aa")))
    }
    def arrayBpe(tok: String, merges: List[(String, String)]): Int = {
      var syms = tok.map(_.toString).toVector
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
      syms.length
    }
    forAll(genText, genMergeList) { (text, merges) =>
      val want = text.split(" ", -1).map(t => arrayBpe(t, merges)).sum.toLong
      val got = graft.ext.TextOps.bpeStats(
          Seq((0L, text)).toDF("doc_id", "text"), merges)
        .as[(Long, Long, Long, Double)].head()._3
      got == want
    }
  }

  property("globalRowNumbers equals sorted zipWithIndex on random frames") = {
    val genRows = Gen.nonEmptyListOf(for {
      k <- Gen.choose(0L, 20L) // few keys → many ties straddle boundaries
      v <- Gen.choose(0L, 1000000L)
    } yield (k, v))
    forAll(genRows) { rows =>
      import org.apache.spark.sql.functions.col
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("k", "v", "uid")
      val got = graft.ops.Ordinals
        .globalRowNumbers(df, Seq(col("k"), col("uid")))
        .select("uid", "rn").as[(Long, Long)].collect().toMap
      val want = rows.zipWithIndex
        .map { case ((k, _), i) => (k, i.toLong) }
        .sortBy { case (k, uid) => (k, uid) }
        .zipWithIndex.map { case ((_, uid), rn) => uid -> (rn + 1L) }.toMap
      got == want
    }
  }

  property("tokenBudgetSelect equals the naive prefix filter on random docs") = {
    val genDocs = Gen.nonEmptyListOf(Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))))
    forAll(genDocs, Gen.choose(0L, 40L)) { (texts, budget) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.ext.TextOps.tokenBudgetSelect(df, budget)
        .select("doc_id").as[Long].collect().toSet
      // naive: round4 diversity desc, doc_id asc, cumulative ≤ budget
      def q(t: String) = {
        val toks = t.split(" ", -1)
        math.floor(toks.distinct.length.toDouble / toks.length * 10000 + 0.5) / 10000
      }
      val ordered = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t.split(" ", -1).length.toLong, q(t)) }
        .sortBy { case (id, _, quality) => (-quality, id) }
      val want = ordered
        .scanLeft((-1L, 0L)) { case ((_, cum), (id, n, _)) => (id, cum + n) }
        .drop(1).takeWhile(_._2 <= budget).map(_._1).toSet
      got == want
    }
  }

  property("domainRebalance quotas are feasible, mixture-faithful and stable") = {
    val genDocs = for {
      n <- Gen.choose(20, 120)
      srcs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield srcs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val genW = for {
      wa <- Gen.choose(1, 8); wb <- Gen.choose(1, 8); wc <- Gen.choose(1, 8)
    } yield Map("a" -> wa / 10.0, "b" -> wb / 10.0, "c" -> wc / 10.0)
    forAll(genDocs, genW, Gen.choose(1, 7)) { (rows, w, parts) =>
      import org.scalacheck.Prop.propBoolean
      val present = rows.map(_._2).toSet
      (present == Set("a", "b", "c")) ==> {
        val df = rows.toDF("doc_id", "source").repartition(parts)
        val got = graft.ext.TextOps.domainRebalance(df, w)
          .as[(Long, String)].collect().toSeq
        val kept = got.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val capN = w.map { case (s, wi) => counts(s) / wi }.min
        val quotas = w.map { case (s, wi) =>
          s -> math.floor(wi * capN + 0.5).toLong }
        // exact quotas, never exceeding supply, independent of partitioning
        quotas.forall { case (s, k) => kept.getOrElse(s, 0L) == k &&
          k <= counts(s) } &&
          got == graft.ext.TextOps.domainRebalance(df.repartition(1), w)
            .as[(Long, String)].collect().toSeq
      }
    }
  }

  property("shinglePosHashes positions mirror the sliding-window stream") = {
    val genWords = Gen.choose(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab")))
    forAll(genWords) { words =>
      val text = words.mkString(" ")
      val arr = Seq(Tuple1(text)).toDF("text")
        .select(graft.ext.TextExpressions.shinglePosHashes(
          org.apache.spark.sql.functions.col("text"), 3).as("a"))
        .as[Array[Long]].head()
      // length = max(0, n-2); equal windows <=> equal hashes (w=3 windows
      // compared as strings; 64-bit collisions out of generator range)
      val wins = words.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      arr.length == math.max(0, words.length - 2) &&
        (arr.length < 2 || wins.indices.forall(i => wins.indices.forall(j =>
          (wins(i) == wins(j)) == (arr(i) == arr(j)))))
    }
  }

  property("mixtureAllocation quotas always sum exactly to the budget") = {
    // arbitrary source skews (1..6 sources, wildly different sizes) and
    // budgets — the Hamilton apportionment invariant must never drift
    val genSources = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 400)))
    forAll(genSources, Gen.choose(1L, 500L)) { (sizes, budget) =>
      val rows = sizes.zipWithIndex.flatMap { case (sz, s) =>
        (1 to sz).map(i => (s.toLong * 100000 + i, s"src$s"))
      }
      val got = graft.ext.TextOps
        .mixtureAllocation(rows.toDF("doc_id", "source"), budget)
        .as[(String, Long, Long)].collect()
      got.map(_._3).sum == budget && got.forall(_._3 >= 0) &&
        got.length == sizes.length
    }
  }

  property("epochShuffle is a permutation for any doc-id set and seed") = {
    val genIds = Gen.choose(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1L, 1000000L))).map(_.distinct)
    // listOfN(n >= 1) + distinct keeps at least one id — never empty
    forAll(genIds, Gen.oneOf("e1", "e2", "zz")) { (ids, seed) =>
      val out = graft.ext.TextOps
        .epochShuffle(ids.map(i => (i, "t")).toDF("doc_id", "text"), seed)
        .as[(Long, Long)].collect()
      out.map(_._1).sorted.toSeq == ids.sorted &&
        out.map(_._2).sorted.toSeq == (1L to ids.length).toSeq
    }
  }

  property("zorder blocks partition events; envelopes bracket the data") = {
    forAll(genEvents) { rows =>
      val layout = EventQueries.zorderLayout(toDf(rows))
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      layout.map(_._2).sum == rows.length &&
        layout.forall { case (b, _, xMin, xMax, yMin, yMax) =>
          b >= 0 && b < 64 && xMin <= xMax && yMin <= yMax
        }
    }
  }

  property("compactionPlan: only oversized singleton bins exceed the cap") = {
    forAll(genEvents, Gen.choose(200L, 5000L)) { (rows, cap) =>
      val plan = EventQueries.compactionPlan(toDf(rows), cap)
        .as[(java.sql.Date, Long, Long)].collect().toSeq
      val byBin = plan.groupBy(_._3).values.toSeq
      // bins are contiguous 1..k and either fit the cap or hold one
      // oversized day
      plan.map(_._3).distinct.sorted == (1L to byBin.size.toLong) &&
        byBin.forall(b => b.map(_._2).sum <= cap ||
          (b.size == 1 && b.head._2 > cap))
    }
  }

  property("ppsSample: k crossings when no weight exceeds a stride") = {
    val genDocs = Gen.choose(5, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1L, 50L)))
    forAll(genDocs, Gen.choose(1L, 5L)) { (weights, k) =>
      val docs = weights.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "n_chars")
      val sel = graft.ext.TextOps.ppsSample(docs, k)
        .as[(Long, Long, Long, Long)].collect().toSeq
      val total = weights.sum
      // each selected doc's interval crosses ≥1 multiple of W/k; with
      // every weight < W/k strides can't skip a doc entirely, so the
      // count is exactly k (general bound: ≤ k + docs ≥ stride)
      if (weights.forall(_ * k < total)) sel.size == k.toInt
      else sel.size <= k.toInt + weights.count(_ * k >= total)
    }
  }
}
