package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.ext.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  // real multilingual snippets (the synthetic corpus shares one vocabulary,
  // so discriminative behavior is only testable on real text)
  lazy val multilingual: DataFrame = Seq(
    (0L, "the cat sat on the mat and it is a good day", "en"),
    (1L, "der hund ist nicht in der stadt und ich bin zu hause", "de"),
    (2L, "el perro corre por el parque y se esconde como un gato", "es"),
    (3L, "le chien est dans le jardin et je ne vois pas les fleurs", "fr"),
    (4L, "今天天气很好我们去公园散步", "zh"),
    (5L, "xyzzy plugh quux", "und"))
    .toDF("doc_id", "text", "lang")

  test("langId classifies real multilingual text correctly") {
    val got = multilingual
      .select($"lang", TextOps.langIdExpr(col("text")).as("pred"))
      .as[(String, String)].collect()
    got.foreach { case (want, pred) => assert(pred == want,
      s"expected $want got $pred") }
  }

  test("phraseSearch: adjacency counts, first position (1-based), and a " +
      "3-token phrase; overlapping and absent cases") {
    val docs = Seq(
      (0L, "hash join beats sort merge hash join sometimes"),
      (1L, "join hash is not the phrase"),
      (2L, "a hash join b"),
      (3L, "no match here"),
      (4L, ""),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextOps.phraseSearch(docs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 1L), (2L, 1L, 2L)), got.toString)
    val tri = TextOps.phraseSearch(docs, Seq("sort", "merge", "hash"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(tri == Seq((0L, 1L, 4L)), tri.toString)
  }

  test("fingerprint is invariant to word order and repetition") {
    val df = Seq(
      (0L, "alpha beta gamma"),
      (1L, "gamma alpha beta alpha"),
      (2L, "alpha beta delta")).toDF("doc_id", "text")
    val fps = df.select($"doc_id", TextOps.fingerprintExpr(col("text")))
      .as[(Long, String)].collect().toMap
    assert(fps(0L) == fps(1L))
    assert(fps(0L) != fps(2L))
  }

  test("fingerprintDedup groups permuted docs under min doc_id") {
    val df = Seq(
      (0L, "alpha beta gamma"),
      (1L, "gamma alpha beta alpha"),
      (2L, "alpha beta delta")).toDF("doc_id", "text")
    val got = TextOps.fingerprintDedup(df)
      .select("keeper_id", "n_docs").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 2L -> 1L))
  }

  test("qualityScores computes token counts and ratios") {
    val df = Seq((0L, "the the cat. sat!", 17L))
      .toDF("doc_id", "text", "n_chars")
    val r = TextOps.qualityScores(df).collect().head
    assert(r.getAs[Long]("n_tokens") == 4L)
    assert(r.getAs[Double]("lexical_diversity") == 0.75)
    assert(r.getAs[Double]("stopword_ratio") == 0.5)
    assert(r.getAs[Long]("n_sentence_marks") == 2L)
  }

  test("qualityFilter flags rules independently; keepClean keeps the survivors") {
    val long = (1 to 30).map(i => s"the w$i").mkString(" ") // diverse + stopwords
    val df = Seq(
      (0L, long),                                   // passes all rules
      (1L, "tiny doc"),                             // too_short
      (2L, (1 to 30).map(_ => "the").mkString(" ")), // low_diversity
      (3L, (1 to 30).map(i => s"w$i").mkString(" "))) // low_stopword
      .toDF("doc_id", "text")
    val flags = TextOps.qualityFilter(df)
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(flags(0L) == ((false, false, false, true)))
    assert(flags(1L)._1 && !flags(1L)._4)  // too_short, dropped
    assert(flags(2L)._2 && !flags(2L)._4)  // low_diversity, dropped
    assert(flags(3L)._3 && !flags(3L)._4)  // low_stopword, dropped
    val kept = TextOps.keepClean(df).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L))
    // keepClean is a pure filter: no join/exchange anywhere in the plan
    val plan = TextOps.keepClean(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"keepClean should be a map-side filter:\n$plan")
  }

  test("blocklistFilter counts occurrences, lists distinct hits, keeps clean docs") {
    val df = Seq(
      (0L, "clean text with no bad words"),
      (1L, "slow query slow scan"),            // one term, twice
      (2L, "dup rows and error and slow io"),  // all three, once each
      (3L, "slowly duplicated")                // substrings must NOT match
    ).toDF("doc_id", "text")
    val got = TextOps.blocklistFilter(df)
      .as[(Long, Long, String, Boolean)].collect()
    assert(got.toSeq == Seq(
      (0L, 0L, "", true),
      (1L, 2L, "slow", false),
      (2L, 3L, "dup,error,slow", false),
      (3L, 0L, "", true)))
  }

  test("repetitionScores flags looping text, zero for all-distinct trigrams") {
    val df = Seq(
      (0L, "a b a b a b a b"),          // 6 trigrams, 2 distinct, top 3
      (1L, "one two three four five"),  // all distinct
      (2L, "x y"))                      // too short
      .toDF("doc_id", "text")
    val got = TextOps.repetitionScores(df)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(0L) == ((6L, 0.666667, 0.5)))
    assert(got(1L) == ((3L, 0.0, round2Val(1.0 / 3))))
    assert(!got.contains(2L))
    // map-side one-pass: no explode, no window, no pre-sort shuffle
    val plan = TextOps.repetitionScores(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Generate"),
      s"repetitionScores should be a per-row pass:\n$plan")
  }

  private def round2Val(x: Double): Double =
    math.floor(x * 1000000 + 0.5) / 1000000

  test("scrubPii redacts planted emails, phones and IPs with counts") {
    val df = Seq(
      (0L, "contact bob.smith+x@example.co.uk or call +1 555 123 4567 now"),
      (1L, "server at 192.168.1.10 responded"),
      (2L, "nothing sensitive here"),
      // ipv4 must scrub BEFORE phone: a phone-first pass would absorb
      // "5551234567 192" and leak the ".168.1.10" fragment
      (3L, "call 5551234567 192.168.1.10"))
      .toDF("doc_id", "text")
    val got = TextOps.scrubPii(df).as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(0L)._1 == "contact <email> or call <phone> now")
    assert(got(0L)._2 == 2L)
    assert(got(1L)._1 == "server at <ipv4> responded")
    assert(got(1L)._2 == 1L)
    assert(got(2L) == (("nothing sensitive here", 0L)))
    assert(got(3L)._1 == "call <phone> <ipv4>", got(3L)._1)
    assert(got(3L)._2 == 2L)
  }

  test("domainMixSample keeps per-source fractions near the target rates") {
    val docs = graft.ingest.Sources.table(spark, sf("sf0.01"), "documents")
    val kept = TextOps.domainMixSample(docs,
      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0), defaultRate = 0.25)
      .groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(kept("src0") == 25L)          // rate 1.0 keeps everything
    assert(!kept.contains("src2"))       // rate 0.0 keeps nothing
    assert(kept("src1") > 5 && kept("src1") < 20) // ~12.5 of 25 at 0.5
    // deterministic: identical on re-run
    val again = TextOps.domainMixSample(docs,
      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0), defaultRate = 0.25)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(again == kept)
  }

  test("qualityYieldCurve: monotone cumsum ending at share 1.0") {
    val docs = graft.ingest.Sources.table(spark, sf("sf0.001"), "documents")
    val rows = TextOps.qualityYieldCurve(docs)
      .as[(Double, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    // descending quality, strictly increasing cum, last share = 1.0
    assert(rows.map(_._1).toSeq == rows.map(_._1).sortBy(-_).toSeq)
    assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.toSeq)
    assert(rows.last._4 == rows.map(_._3).sum, "cum must end at the total")
    assert(rows.last._5 == 1.0)
    assert(rows.map(_._2).sum == docs.count())
  }

  test("domainRebalance hits exact per-source quotas at the target mixture") {
    val docs = graft.ingest.Sources.table(spark, sf("sf0.01"), "documents")
    val w = Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1)
    val kept = TextOps.domainRebalance(docs, w)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    // 25 docs/source → N = min(25/0.4) = 62.5 → quotas round(w_i · 62.5)
    assert(kept == Map("src0" -> 25L, "src1" -> 19L, "src2" -> 13L,
      "src3" -> 6L), kept.toString)
    // bucketed decomposition ≡ the naive per-source global hash rank
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{md5, row_number, when}
    val naive = docs
      .filter(col("source").isin(w.keys.toSeq: _*))
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("rn", row_number().over(Window.partitionBy("source")
        .orderBy(col("h"), col("doc_id"))))
      .filter(
        when(col("source") === "src0", col("rn") <= 25)
          .when(col("source") === "src1", col("rn") <= 19)
          .when(col("source") === "src2", col("rn") <= 13)
          .otherwise(col("rn") <= 6))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val got = TextOps.domainRebalance(docs, w)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == naive, "decomposed selection diverged from global rank")
    // a weighted source with zero rows → mixture unachievable → EMPTY
    // (never silently renormalized over the sources that are present)
    val missing = TextOps.domainRebalance(docs,
      Map("src0" -> 0.5, "no_such_source" -> 0.5))
    assert(missing.count() == 0L)
    // scale shape: the corpus side joins the tiny cum/quota frame via
    // BROADCAST, and every rank window partitions by (source, BUCKET) —
    // a Window partitioned by source alone would be the naive global
    // per-source sort the decomposition exists to avoid
    val plan = TextOps.domainRebalance(docs, w)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), "selection join must broadcast")
    val windowSpecs = "Window \\[[^\\]]*windowspecdefinition\\(([^)]*)\\)"
      .r.findAllMatchIn(plan).map(_.group(1)).toList
    assert(windowSpecs.nonEmpty)
    windowSpecs.foreach { spec =>
      assert(!(spec.contains("source") && !spec.contains("b#")),
        s"per-source window without bucket: $spec")
    }
  }

  test("packSequences tiles each shard's token stream without gaps") {
    val docs = graft.ingest.Sources.table(spark, sf("sf0.001"), "documents")
    val rows = TextOps.packSequences(docs, contextTokens = 100, shards = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.length == docs.count())
    rows.groupBy(_._2).foreach { case (_, shardRows) =>
      // within a shard, each doc starts exactly where the previous ended
      var expected = 0L
      shardRows.sortBy(_._1).foreach { case (id, _, n, bin, off) =>
        assert(bin * 100 + off == expected, s"doc $id starts at gap")
        expected += n
      }
    }
  }

  test("approxSubwordCount adds letter-digit transitions") {
    val df = Seq((0L, "abc1 def plain")).toDF("doc_id", "text")
    val n = df.select(TextOps.approxSubwordCount(col("text")))
      .as[Int].head()
    assert(n == 4) // 3 tokens + 1 transition in "abc1"
  }

  test("dedupWithin removes repeated lines, keeping first occurrences") {
    val page = Seq("Home | About | Contact", "Real content line one.",
      "Home | About | Contact", "Another real line.",
      "Real content line one.", "Footer © 2026").mkString("\n")
    val clean = Seq("no repeats", "here at all").mkString("\n")
    val df = Seq((0L, page), (1L, clean)).toDF("doc_id", "text")
    val byId = TextOps.dedupWithin(df, "\n")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(byId(0L) == ((0L, 6L, 4L, Seq("Home | About | Contact",
      "Real content line one.", "Another real line.", "Footer © 2026")
      .mkString("\n"))))
    assert(byId(1L) == ((1L, 2L, 2L, clean)))
    // the plan stays a per-row projection (plus the output sort): no
    // Generate/exchange from any explode-based formulation
    val plan = TextOps.dedupWithin(df, "\n")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"dedupWithin must not explode:\n$plan")
  }

  test("filterUnits drops short units and reports the drop rate") {
    val df = Seq((1L, "a bb ccc d ee"), (2L, "xx yy")).toDF("doc_id", "text")
    val got = TextOps.filterUnits(df)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 5L, 3L, "bb ccc ee"), (2L, 2L, 2L, "xx yy")))
    // line-level variant: the C4 shape
    val lines = Seq((1L, "Home\nReal content here\nOk")).toDF("doc_id", "text")
    val lf = TextOps.filterUnits(lines, "\n", minChars = 5)
      .as[(Long, Long, Long, String)].collect().head
    assert(lf == ((1L, 3L, 1L, "Real content here")))
  }

  test("chunkDocs covers every token in stride windows") {
    val toks = (1 to 150).map(i => s"t$i")
    val df = Seq((1L, toks.mkString(" ")), (2L, "short doc"),
      (3L, (1 to 64).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextOps.chunkDocs(df, chunkTokens = 64, stride = 48)
      .as[(Long, Long, Long, String)].collect()
    val byDoc = got.groupBy(_._1)
    // 150 tokens → starts 0, 48, 96; the tail chunk truncates to 54
    assert(byDoc(1L).sortBy(_._2).map(_._3).toSeq == Seq(64L, 64L, 54L))
    byDoc(1L).foreach { case (_, c, _, text) =>
      assert(text == toks.slice(c.toInt * 48,
        math.min(c.toInt * 48 + 64, 150)).mkString(" "))
    }
    // shorter than one chunk → exactly one chunk; exactly one chunk long
    // → exactly one (the last-start formula lands on 0 both times)
    assert(byDoc(2L).map(r => (r._2, r._3)).toSeq == Seq((0L, 2L)))
    assert(byDoc(3L).map(r => (r._2, r._3)).toSeq == Seq((0L, 64L)))
  }

  test("dedupWithin treats regex-metachar delimiters literally") {
    // '.' is the scaladoc-suggested sentence delimiter; a regex-based split
    // would split on EVERY character and disagree with the literal re-join
    // and the Pattern.quote unit counting
    val df = Seq((1L, "a.b.a.c"), (2L, "x.x.x"), (3L, "no-dups"))
      .toDF("doc_id", "text")
    val got = TextOps.dedupWithin(df, ".")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 4L, 3L, "a.b.c"), (2L, 3L, 1L, "x"),
      (3L, 1L, 1L, "no-dups")))
  }

  test("curationReport labels the FIRST failing stage per doc") {
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "you")
    // stopword-interleaved diverse texts: every trigram contains a
    // prefix-unique word, so texts with different prefixes share ZERO
    // trigrams while all passing the quality gate
    def mk(p: String) = (stops.zipWithIndex.map { case (s, i) => s"$s $p$i" } ++
      stops.zipWithIndex.map { case (s, i) => s"$s $p${i + 10}" }).mkString(" ")
    // residue-25 split: doc 0 is the bench doc; the rest are corpus
    val d = Seq(
      (0L, mk("b")),  // bench side (excluded from output)
      (1L, mk("b")),  // corpus copy of the bench text → contaminated
      (2L, "tiny"),   // quality: too short
      (3L, mk("v")),  // keeper (first copy wins the dedup)
      (4L, mk("v")),  // exact dup of 3
      (26L, mk("u"))) // clean unique doc → keeper
      .toDF("doc_id", "text")
    val out = TextOps.curationReport(d)
      .as[(Long, Long, Option[String])].collect().map(r => r._1 -> r._3).toMap
    assert(!out.contains(0L))                      // bench doc not reported
    assert(out(1L) == Some("contaminated"))
    assert(out(2L) == Some("quality"))
    assert(out(3L).isEmpty)                        // keeper
    assert(out(4L) == Some("exact_dup"))
    assert(out(26L).isEmpty)
  }

  test("optimizer rewrites size(split(text, ' ')) to token_count plan-wide") {
    import org.apache.spark.sql.functions.{size, split}
    // parquet-backed (a LocalRelation would be constant-folded whole)
    val d = graft.ingest.Sources.table(spark, sf("sf0.001"), "documents")
    val q = d.select(size(split(col("text"), " ")).as("n"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("token_count") && !opt.contains("split("),
      s"rewrite did not fire:\n$opt")
    // exact split semantics preserved, vs a driver-side reference split
    val got = d.select(col("text"),
        size(split(col("text"), " ")).as("n"))
      .as[(String, Int)].collect()
    assert(got.nonEmpty && got.forall { case (t, n) =>
      n == t.split(" ", -1).length })
    // empty-token edges (spaces kept): "a  b c " → 5, "" → 1
    val local = Seq((0L, "a  b c "), (1L, "")).toDF("doc_id", "text")
      .select(graft.ext.TokenCount.tokenCount(col("text")).as("n"))
      .as[Int].collect().sorted.toSeq
    assert(local == Seq(1, 5))
    // guard: a non-space separator must NOT be rewritten
    val other = d.select(size(split(col("text"), ",")).as("n"))
      .queryExecution.optimizedPlan.toString
    assert(!other.contains("token_count"), other)
  }

  test("tokenBudgetSelect keeps best-quality docs to the budget, boundary exact") {
    // qualities: doc 0/1 → 1.0 (all-distinct), docs 2,3,4 → 0.5, doc 5 low;
    // budget 10: bucket 1.0 fully fits (4+4=8); boundary bucket 0.5 admits
    // only doc 2 (8+2=10 ≤ 10, then 10+2 > 10) — the mid-bucket cut
    val d = Seq(
      (0L, "a b c d"),          // 4 tokens, q=1.0
      (1L, "e f g h"),          // 4 tokens, q=1.0
      (2L, "x x"),              // 2 tokens, q=0.5
      (3L, "y y"),              // 2 tokens, q=0.5
      (4L, "z z"),              // 2 tokens, q=0.5
      (5L, "w w w w"))          // 4 tokens, q=0.25
      .toDF("doc_id", "text")
    val got = TextOps.tokenBudgetSelect(d, budget = 10L)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 4L, 1.0), (1L, 4L, 1.0), (2L, 2L, 0.5)),
      s"got $got")
    // exact-fit edge: budget 8 keeps exactly the full top bucket
    val fit = TextOps.tokenBudgetSelect(d, budget = 8L)
      .as[(Long, Long, Double)].collect().map(_._1).toSeq
    assert(fit == Seq(0L, 1L))
    // a budget below the first doc keeps nothing
    assert(TextOps.tokenBudgetSelect(d, budget = 3L).count() == 0)
  }

  test("tokenBudgetByLang restarts the running total per language") {
    val d = Seq(
      (0L, "en", "a b c d"),   // q=1.0, 4 toks
      (1L, "en", "x x x x"),   // q=0.25, 4 toks
      (2L, "de", "p q r"),     // q=1.0, 3 toks
      (3L, "de", "m m m m m")) // q=0.2, 5 toks
      .toDF("doc_id", "lang", "text")
    // budget 6 per lang: en keeps only doc 0 (4; +4 > 6); de keeps only
    // doc 2 (3; +5 > 6) — each language spends its OWN budget
    val got = TextOps.tokenBudgetByLang(d, budgetPerLang = 6L)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got == Seq((2L, "de", 3L, 1.0), (0L, "en", 4L, 1.0)), s"got $got")
  }

  test("normalization scrubs non-ASCII BEFORE lowercasing (engine parity)") {
    // U+0130 'İ' is the canonical engine-splitter: Java's full case mapping
    // lowers it to 'i' + U+0307 while utf8proc's simple mapping gives 'i' —
    // NormPreStep must remove it (and all non-ASCII) before lower() ever
    // sees it, so both engines only lowercase ASCII
    val d = Seq((0L, "İstanbul Şehir"), (1L, "café BAR"))
      .toDF("doc_id", "text")
    val norm = TextOps.normalizeDocs(d)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(norm(0L) == "stanbul ehir", norm)
    assert(norm(1L) == "caf bar", norm)
  }

  test("normalizedDedup groups case/punctuation variants under one keeper") {
    val d = Seq(
      (0L, "Hello, World!"),
      (1L, "hello   world"),
      (2L, "HELLO-WORLD"),
      (3L, "different text"),
      (4L, "!!!"))                       // all punctuation → empty form
      .toDF("doc_id", "text")
    val norm = TextOps.normalizeDocs(d)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(norm(0L) == (("hello world", 2L)))
    assert(norm(1L) == (("hello world", 2L)))
    assert(norm(2L) == (("hello world", 2L)))
    assert(norm(4L) == (("", 1L)))       // split("") = [""] — 1, both engines
    val groups = TextOps.normalizedDedup(d)
      .select("keeper_id", "n_docs").as[(Long, Long)].collect().toMap
    assert(groups(0L) == 3L && groups(3L) == 1L && groups(4L) == 1L)
  }

  test("trainBpeMerges learns classic merges; ties break lexicographically") {
    val d = Seq((0L, "aa ab aa ab")).toDF("doc_id", "text")
    // word freqs aa:2 ab:2 → pair counts (a,a):2 (a,b):2 → tie breaks to
    // (a,a); after applying it only (a,b):2 repeats → second merge
    val merges = TextOps.trainBpeMerges(d, numMerges = 10, minCount = 1)
    assert(merges == Seq(("a", "a"), ("a", "b")))
  }

  test("bpeStats counts array-BPE subwords, including adjacent repeats") {
    val d = Seq((0L, "aa ab aaa b"), (1L, "abab")).toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("a", "b"))
    val out = TextOps.bpeStats(d, merges)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // aa→[aa]; ab→[ab]; aaa→[aa,a] (left-to-right); b→[b] ⇒ 5 subwords
    assert(out(0L) == ((0L, 4L, 5L, 1.25)))
    // the adjacent-repeat case the double-separator encoding exists for:
    // abab → [ab, ab], not [ab, a, b]
    assert(out(1L) == ((1L, 1L, 2L, 2.0)))
    // zero merges degenerate to codepoint counting
    val none = TextOps.bpeStats(d, Seq.empty)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(none(0L) == 8L && none(1L) == 4L)
    // empty tokens (consecutive spaces) count ONE subword, like token_count
    val gaps = TextOps.bpeStats(
        Seq((0L, "a  b")).toDF("doc_id", "text"), Seq.empty)
      .as[(Long, Long, Long, Double)].head()
    assert(gaps == ((0L, 3L, 3L, 1.0)))
  }

  test("bpeFertility rolls per-doc subword stats up by language") {
    val d = Seq((0L, "aa ab aaa b", "en"), (1L, "abab", "de"),
      (2L, "aa", "en")).toDF("doc_id", "text", "lang")
    val merges = Seq(("a", "a"), ("a", "b"))
    val got = TextOps.bpeFertility(d, merges)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect().toSeq
    // en: words 4+1=5, subwords 5+1=6, chars 11+2=13 → fertility 1.2,
    //     chars/subword 13/6 → 2.1667; de: abab → [ab,ab]: 1/2/4 → 2.0/2.0
    assert(got == Seq(("de", 1L, 1L, 2L, 4L, 2.0, 2.0),
      ("en", 2L, 5L, 6L, 13L, 1.2, 2.1667)), got.toString)
  }

  test("trainUnigramVocab thresholds, and caps by count desc / token asc") {
    val d = Seq((0L, "b b a a c c c"), (1L, "once")).toDF("doc_id", "text")
    val (vt, vc) = TextOps.trainUnigramVocab(d, minCount = 2, maxVocab = 2)
    // counts: c=3, a=2, b=2, once=1 → threshold kills 'once', cap keeps
    // (c,3) then the a/b count tie breaks by token asc → (a,2)
    assert(vt.toSeq == Seq("c", "a") && vc.toSeq == Seq(3L, 2L))
  }

  test("unigramFamiliarity: exact OOV counts and vocab-frequency sums") {
    val d = Seq((0L, "the cat sat"), (1L, "the the dog"),
      (2L, "rare tokens only")).toDF("doc_id", "text")
    // corpus counts: the=3 is the only token above minCount=2
    val (vt, vc) = TextOps.trainUnigramVocab(d, minCount = 2, maxVocab = 10)
    assert(vt.toSeq == Seq("the") && vc.toSeq == Seq(3L))
    val out = TextOps.unigramFamiliarity(d, vt, vc)
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, 3L, 2L, 3L, 1.0)))   // one 'the' → sum 3, 2 oov
    assert(out(1L) == ((1L, 3L, 1L, 6L, 2.0)))   // two 'the' → sum 6
    assert(out(2L) == ((2L, 3L, 3L, 0L, 0.0)))   // all oov
    // serving is one map-side pass: no shuffle except the output sort
    val plan = TextOps.unigramFamiliarity(d, vt, vc)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      s"unigramFamiliarity must not explode tokens:\n$plan")
  }

  test("mixtureAllocation: quotas sum exactly to the budget and sqrt " +
    "temperature down-weights the dominant source") {
    // 900/90/10 docs: proportional would give 900; sqrt-weights compress
    val rows = (1 to 900).map(i => (i.toLong, "big")) ++
      (1001 to 1090).map(i => (i.toLong, "mid")) ++
      (2001 to 2010).map(i => (i.toLong, "small"))
    val d = rows.toDF("doc_id", "source")
    val got = TextOps.mixtureAllocation(d, budget = 100L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got.values.sum == 100L, s"quotas must sum to budget: $got")
    // sqrt(900):sqrt(90):sqrt(10) = 30:9.487:3.162 → ~70/22/8
    assert(got("big") < 90, s"dominant source must be down-weighted: $got")
    assert(got("small") > 2, s"small source must be lifted: $got")
    // deterministic under repartitioning (the 100 TB reproducibility bar)
    val reparted = TextOps.mixtureAllocation(d.repartition(7), budget = 100L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(reparted == got)
  }

  test("epochShuffle: same seed is a stable permutation across " +
    "partitionings; a new seed reorders") {
    val d = (1L to 200L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    def order(df: DataFrame, seed: String): Seq[Long] =
      TextOps.epochShuffle(df, seed).as[(Long, Long)].collect()
        .sortBy(_._2).map(_._1).toSeq
    val e1 = order(d, "epoch1")
    assert(e1.sorted == (1L to 200L), "a permutation covers every doc once")
    assert(e1 != (1L to 200L), "seeded order must not be insertion order")
    assert(order(d.repartition(13), "epoch1") == e1,
      "same seed must be partitioning-invariant")
    val e2 = order(d, "epoch2")
    assert(e2 != e1, "a new seed must produce a different permutation")
    assert(e2.sorted == (1L to 200L))
  }

  test("compressionQuality: repetition compresses far below prose, empty " +
    "fails closed, and the ratio is run-deterministic") {
    val spammy = ("buy now " * 400).trim
    val prose = (1 to 400).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    val d = Seq((1L, spammy), (2L, prose), (3L, ""))
      .toDF("doc_id", "text")
    val got = TextOps.compressionQuality(d)
      .as[(Long, Option[Double], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val (spamRatio, spamFlag) = got(1L)
    val (proseRatio, proseFlag) = got(2L)
    assert(spamRatio.get < 0.05 && spamFlag,
      s"templated text must compress hard: $spamRatio")
    assert(proseRatio.get > 0.3 && !proseFlag,
      s"varied text must not flag: $proseRatio")
    // empty doc: null ratio, flag fails CLOSED
    assert(got(3L) == ((None, true)))
    // same JVM, same zlib, same input → identical ratio bits
    val again = TextOps.compressionQuality(d)
      .as[(Long, Option[Double], Boolean)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(again(1L) == spamRatio && again(2L) == proseRatio)
  }

  test("mixtureAllocation hands leftover seats to largest remainders") {
    // 2+2+3 sources with equal counts and budget 10: shares 10/3 each →
    // bases 3,3,3; one leftover seat goes to the first source by name
    // (remainders tie at 1/3)
    val d = (1 to 30).map(i => (i.toLong, s"s${i % 3}")).toDF("doc_id", "source")
    val got = TextOps.mixtureAllocation(d, budget = 10L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got.values.sum == 10L)
    assert(got == Map("s0" -> 4L, "s1" -> 3L, "s2" -> 3L), got.toString)
  }

  test("collocations: PMI lift matches a reference computation and ranks " +
    "the planted phrase first") {
    // "deep learning" co-occurs always; its parts never pair otherwise
    val docs = ((0 until 6).map(i =>
      (i.toLong, s"deep learning rocks t$i")) ++
      (6 until 12).map(i => (i.toLong, s"filler t${i % 3} words here")))
      .toDF("doc_id", "text")
    val got = TextOps.collocations(docs, minCount = 2L, topK = 20)
      .as[(String, String, Long, Double)].collect().toSeq
    // reference with the identical operation sequence
    val texts = ((0 until 6).map(i => s"deep learning rocks t$i") ++
      (6 until 12).map(i => s"filler t${i % 3} words here"))
      .map(_.split(" ", -1).toSeq)
    val uni = texts.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val bis = texts.flatMap(t => t.zip(t.tail))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2L)
    val nTok = uni.values.sum.toDouble
    val nBi = bis.values.sum.toDouble
    val want = bis.map { case ((a, b), cxy) =>
      (a, b, cxy,
        cxy.toDouble * nTok * nTok / (nBi * uni(a).toDouble * uni(b).toDouble))
    }.toSeq.sortBy { case (a, b, _, l) => (-l, a, b) }.take(20)
    assert(got == want, s"got $got want $want")
    assert(got.head._1 == "deep" && got.head._2 == "learning")
  }

  test("vocabGrowth: checkpoint curve matches a sequential reference") {
    val docs = (0L until 17L).map { i =>
      val words = (0 to (i % 5).toInt).map(j => s"w${(i + j) % 9}")
      (i, words.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = TextOps.vocabGrowth(df, buckets = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // sequential reference: consume docs in id order, count first-seen
    val n = docs.size
    val buckets = docs.zipWithIndex.map { case ((id, text), idx) =>
      (id, text, (idx.toLong * 4) / n) }
    val seen = collection.mutable.Set[String]()
    val want = buckets.groupBy(_._3).toSeq.sortBy(_._1).map {
      case (b, ds) =>
        val fresh = ds.flatMap(_._2.split(" ", -1))
          .filter(w => seen.add(w)).size.toLong
        (b, ds.map(_._1).max, ds.size.toLong, fresh)
    }
    val cums = want.scanLeft(0L)(_ + _._4).tail
    assert(got == want.zip(cums).map { case ((b, last, nd, f), c) =>
      (b, last, nd, f, c) }, s"got $got")
    assert(got.last._5 == docs.flatMap(_._2.split(" ", -1)).distinct.size)
  }

  test("collocations and skyline plan shapes: top-k heap, no quadratic join") {
    val docs = (0L until 30L).map(i => (i, s"a b c d${i % 3} e"))
      .toDF("doc_id", "text")
    val cPlan = TextOps.collocations(docs, minCount = 2L)
      .queryExecution.executedPlan.toString
    assert(cPlan.contains("TakeOrderedAndProject"),
      s"collocations top-k is not a bounded heap:\n$cPlan")
    val sPlan = TextOps.skylineDocs(docs)
      .queryExecution.executedPlan.toString
    assert(!sPlan.contains("CartesianProduct") &&
      !sPlan.contains("BroadcastNestedLoopJoin"),
      s"skyline degenerated to the quadratic dominance join:\n$sPlan")
    assert(sPlan.contains("BroadcastExchange"),
      s"skyline cum frame should broadcast:\n$sPlan")
  }

  test("bigramFamiliarity: exact pair counts, OOV, and short-doc NULL ratio") {
    val docs = Seq(
      (0L, "the cat sat"), (1L, "the cat ran"), (2L, "the cat sat here"),
      (3L, "solo"), (4L, "zz qq"))
      .toDF("doc_id", "text")
    // minCount=2 vocab: "the cat" ×3 and "cat sat" ×2 repeat
    val (vk, vc) = TextOps.trainBigramVocab(docs)
    assert(vk.toSeq == Seq("the cat", "cat sat") && vc.toSeq == Seq(3L, 2L))
    val got = TextOps.bigramFamiliarity(docs, vk, vc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toSeq
    assert(got == Seq(
      (0L, 2L, 0L, 5L, Some(2.5)),   // "the cat"(3) + "cat sat"(2)
      (1L, 2L, 1L, 3L, Some(1.5)),   // "cat ran" OOV
      (2L, 3L, 1L, 5L, Some(1.67)),  // "sat here" OOV
      (3L, 0L, 0L, 0L, None),        // single token: no bigrams, NULL ratio
      (4L, 1L, 1L, 0L, Some(0.0))), got.toString)
  }

  test("skylineDocs equals the brute-force dominance filter, ties included") {
    // hand-shaped: doc 0 dominates 1 (longer, same diversity); 2 and 3 are
    // an equal point (co-survive); 4 is the diversity extreme; 5 dominated
    // on both axes
    val rnd = new scala.util.Random(5)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = (0L until 40L).map { i =>
      val n = 3 + rnd.nextInt(12)
      val text = (1 to n).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
      (i, text)
    } ++ Seq((100L, "a b c d e"), (101L, "a b c d e"))
    val df = docs.toDF("doc_id", "text")
    val got = TextOps.skylineDocs(df)
      .as[(Long, Long, Double)].collect().toSeq
    // brute force with the SAME 4dp-rounded diversity
    val pts = docs.map { case (id, text) =>
      val toks = text.split(" ", -1).toSeq
      val div = math.floor(
        toks.distinct.size.toDouble / toks.size * 10000 + 0.5) / 10000
      (id, toks.size.toLong, div)
    }
    val want = pts.filter { case (_, n, d) =>
      !pts.exists { case (_, n2, d2) =>
        n2 >= n && d2 >= d && (n2 > n || d2 > d)
      }
    }.sortBy { case (id, n, _) => (-n, id) }
    assert(got == want, s"got $got want $want")
    // the two identical points either co-survive or co-die
    assert(got.count(r => r._1 == 100L || r._1 == 101L) % 2 == 0)
  }

  test("exportShards: contiguous fixed-size shards in doc-id order") {
    val docs = (1L to 25L).map(i => (i * 10, "t")).toDF("doc_id", "text")
    val got = TextOps.exportShards(docs, shardSize = 10L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 10L, 10L, 100L),
      (1L, 10L, 110L, 200L),
      (2L, 5L, 210L, 250L)), got.toString)
  }

  test("labelBalance: inverse-frequency class weights") {
    val emb = (Seq.fill(6)(0) ++ Seq.fill(2)(1) ++ Seq.fill(2)(2))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("vec_id", "label")
    val got = TextOps.labelBalance(emb)
      .as[(Int, Long, Double, Double)].collect().toSeq
    // 10 rows, 3 labels: weight(l) = 10/(3·n)
    assert(got == Seq(
      (0, 6L, 0.6, 0.5556),
      (1, 2L, 0.2, 1.6667),
      (2, 2L, 0.2, 1.6667)), got.toString)
  }

  test("ppsSample: systematic crossings select proportionally to weight") {
    val docs = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L))
      .toDF("doc_id", "n_chars")
    val got = TextOps.ppsSample(docs, k = 2).as[(Long, Long, Long, Long)]
      .collect().toSeq.map(_._1)
    // W=40, k=2: cum/20 crosses at docs 2 and 4
    assert(got == Seq(2L, 4L), got.toString)
    // a dominant weight captures a selection slot
    val skewed = Seq((1L, 30L), (2L, 5L), (3L, 5L))
      .toDF("doc_id", "n_chars")
    val got2 = TextOps.ppsSample(skewed, k = 2).as[(Long, Long, Long, Long)]
      .collect().toSeq.map(_._1)
    assert(got2 == Seq(1L, 3L), got2.toString)
  }

  test("readability: FK grade from exact word/sentence/vowel-group counts") {
    val docs = Seq(
      (1L, "the cat sat. a dog ran!"),
      (2L, ""),              // no words → dropped
      (3L, "zzz zzz"))       // no vowels → syllables 0
      .toDF("doc_id", "text")
    val got = TextOps.readability(docs)
      .as[(Long, Long, Long, Long, Double, String)].collect().toSeq
    // doc 1: words 6 (incl 'sat.'/'ran!'), sentences 2, vowel groups 6 →
    // 0.39·3 + 11.8·1 − 15.59 = −2.62
    assert(got.map(_._1) == Seq(1L, 3L))
    assert(got.head == (1L, 6L, 2L, 6L, -2.62, "easy"), got.head.toString)
    val d3 = got(1)
    assert(d3 == (3L, 2L, 1L, 0L,
      math.floor((0.39 * 2.0 + 0.0 - 15.59) * 10000 + 0.5) / 10000, "easy"),
      d3.toString)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("winnowingFingerprints: window minima match an independent " +
      "replay of the MOSS selection; short and null docs drop") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x y"),                      // < k tokens → dropped
      (3L, null.asInstanceOf[String]))  // null text → dropped
      .toDF("doc_id", "text")
    val got = TextOps.winnowingFingerprints(docs)
      .as[(Long, Long, Long, String)].collect().toSeq
    // independent replay of the selection rule on doc 1
    val toks = "a b c d e f".split(" ")
    val hs = toks.sliding(TextOps.WinnowK).map(_.mkString(" "))
      .map(md5hex).toVector
    val fps = hs.indices.map(i =>
      hs.slice(i, math.min(i + TextOps.WinnowW, hs.size)).min)
    assert(got == Seq((1L, hs.size.toLong, fps.distinct.size.toLong,
      fps.min)), got.toString)
  }

  test("winnowingPairs: planted near-dups share fingerprints above the " +
      "threshold, disjoint docs never pair, boilerplate above the DF " +
      "cap drops") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, base), (1L, base),                                 // exact dup
      (2L, (100 to 130).map(i => s"y$i").mkString(" ")),      // disjoint
      (3L, (200 to 230).map(i => s"z$i").mkString(" ")))      // disjoint
      .toDF("doc_id", "text")
    val got = TextOps.winnowingPairs(docs)
      .as[(Long, Long, Long)].collect().toSeq
    // exactly the dup pair, sharing every distinct fingerprint
    assert(got.map(p => (p._1, p._2)) == Seq((0L, 1L)), got.toString)
    val nFp = TextOps.winnowingFingerprints(docs)
      .as[(Long, Long, Long, String)].collect()
      .find(_._1 == 0L).get._3
    assert(got.head._3 == nFp, s"shared ${got.head._3} of $nFp")
    assert(got.head._3 >= TextOps.WinnowPairMinShared)
    // a fingerprint present in MORE docs than the cap pairs nobody: a
    // boilerplate phrase replicated across cap+2 docs
    val boiler = (1 to TextOps.WinnowK).map(i => s"b$i").mkString(" ")
    val many = (0 until TextOps.WinnowPairMaxDf + 2).map(i =>
      (100L + i, boiler)).toDF("doc_id", "text")
    assert(TextOps.winnowingPairs(many).count() == 0L)
  }

  test("langTemperatureMix: sqrt weights, 6dp fixed-point shares, and " +
      "integer allocations; null lang is a real stratum ordered last") {
    val docs = Seq(
      (1L, "a b c d", "en"), (2L, "e f", "en"),
      (3L, "x y z", "de"), (4L, "zz ww", null))
      .toDF("doc_id", "text", "lang")
    val got = TextOps.langTemperatureMix(docs)
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    def w6(n: Long): Long = math.floor(math.sqrt(n.toDouble) * 1e6 + 0.5).toLong
    val (wDe, wEn, wNull) = (w6(3), w6(6), w6(2))
    val tot = wDe + wEn + wNull
    def share(w: Long): Double =
      math.floor(w.toDouble / tot.toDouble * 1e6 + 0.5) / 1e6
    assert(got.map(_._1) == Seq("de", "en", null), got.toString)
    assert(got == Seq(
      ("de", 3L, wDe / 1e6, share(wDe), wDe * 1000000L / tot),
      ("en", 6L, wEn / 1e6, share(wEn), wEn * 1000000L / tot),
      (null, 2L, wNull / 1e6, share(wNull), wNull * 1000000L / tot)),
      got.toString)
  }

  test("gopherRules: 4dp round-then-compare thresholds; empty text gets " +
      "a NULL ratio but a definite false verdict; null text all-NULL") {
    val docs = Seq(
      (1L, "abcd abcd abcd"), // alpha 12/14=0.8571, mwl (14-2)/3=4.0 → keep
      (2L, "ab cd"),          // alpha 4/5=0.8 < 0.82 → drop
      (3L, ""),               // 0/0 → NULL ratio; mwl 0 → false (NULL AND false)
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextOps.gopherRules(docs)
      .as[(Long, Option[Double], Option[Double], Option[Boolean])]
      .collect().toSeq
    assert(got == Seq(
      (1L, Some(0.8571), Some(4.0), Some(true)),
      (2L, Some(0.8), Some(2.0), Some(false)),
      (3L, None, Some(0.0), Some(false)),
      (4L, None, None, None)), got.toString)
  }

  test("DSIR: quantized log ratios from the target/corpus split; per-doc " +
      "weight is the exact micro-nat sum (OOV neutral, null text dropped)") {
    val docs = Seq(
      (0L, "ml ml data"),             // target (doc_id % 25 == 0)
      (25L, "ml train"),              // target
      (1L, "data data web junk"),     // corpus
      (2L, "web web ml"),             // corpus
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val (toks, qw) = TextOps.trainDsirRatios(docs)
    val m = toks.zip(qw).toMap
    // replay: tc = {ml 3, data 1, train 1}, cc = {data 2, web 3, junk 1,
    // ml 1}; union vocab 5; totals t 5 / c 7; add-1 smoothing
    val v = 5
    def r(tc: Int, cc: Int): Long = math.floor(math.log(
      ((tc + 1).toDouble / (5 + v)) / ((cc + 1).toDouble / (7 + v)))
      * TextOps.DsirLogScale + 0.5).toLong
    assert(m == Map("ml" -> r(3, 1), "data" -> r(1, 2), "web" -> r(0, 3),
      "train" -> r(1, 0), "junk" -> r(0, 1)), m.toString)
    val got = TextOps.dsirWeights(docs, toks, qw)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 3L, 0L, 2 * m("ml") + m("data")),
      (1L, 4L, 0L, 2 * m("data") + m("web") + m("junk")),
      (2L, 3L, 0L, 2 * m("web") + m("ml")),
      (25L, 2L, 0L, m("ml") + m("train"))), got.toString)
    // OOV tokens score the neutral 0 and are counted
    val oov = TextOps.dsirWeights(
      Seq((7L, "ml unseen")).toDF("doc_id", "text"), toks, qw)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(oov == Seq((7L, 2L, 1L, m("ml"))), oov.toString)
  }

  test("nbCalibration: bins partition the scored docs, counts are " +
      "consistent, margins clamp to the bounded bin range") {
    val keep = "alpha betas gamma delta"
    val rej = "x1 y2 z3 w4"
    val docs = Seq((0L, keep), (1L, keep), (2L, rej), (3L, rej),
      (4L, ""), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val (toks, w) = TextOps.trainNbQuality(docs)
    val scores = TextOps.nbQualityScores(docs, toks, w).collect()
    val got = TextOps.nbCalibration(docs, toks, w)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // every scored doc lands in exactly one bin
    assert(got.map(_._2).sum == scores.length, got.toString)
    // bins stay inside the clamp and counts are internally consistent
    got.foreach { case (bin, n, tk, ag, share) =>
      assert(math.abs(bin) <= TextOps.NbCalibrationMaxBin)
      assert(tk <= n && ag <= n)
      assert(share == math.floor(ag.toDouble / n * 10000 + 0.5) / 10000)
    }
    // a separable corpus agrees everywhere → every bin's share is 1
    assert(got.forall(_._5 == 1.0), got.toString)
    // margins of both signs → bins on both sides of zero
    assert(got.exists(_._1 < 0) && got.exists(_._1 >= 0), got.toString)
  }

  test("nbQualityScores: the distilled classifier separates the teacher's " +
      "classes on a separable corpus; empty text reads agree=false") {
    // keep class: alpha-heavy 4-5-letter words (inside the gopher band);
    // reject class: short digit-bearing tokens (outside) — disjoint vocab
    val keep = "alpha betas gamma delta"
    val rej = "x1 y2 z3 w4"
    val docs = Seq((0L, keep), (1L, keep), (2L, rej), (3L, rej),
      (4L, ""), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val (toks, w) = TextOps.trainNbQuality(docs)
    val wm = toks.zip(w).toMap
    // keep-class tokens carry positive log ratios, reject-class negative
    assert(keep.split(" ").forall(t => wm(t) > 0), wm.toString)
    assert(rej.split(" ").forall(t => wm(t) < 0), wm.toString)
    val got = TextOps.nbQualityScores(docs, toks, w)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getBoolean(4), Option(r.get(5)), r.getBoolean(6)))
      .toMap
    // null text is excluded entirely; the four trained docs agree
    assert(!got.contains(5L) && got.size == 5, got.toString)
    Seq(0L, 1L).foreach { id =>
      val (m, nk, gk, ag) = got(id)
      assert(m > 0 && nk && gk.contains(true) && ag, got(id).toString) }
    Seq(2L, 3L).foreach { id =>
      val (m, nk, gk, ag) = got(id)
      assert(m < 0 && !nk && gk.contains(false) && ag, got(id).toString) }
    // empty text: the NULL alpha ratio collapses to a FALSE verdict (null
    // AND false = false — identical three-valued algebra in DuckDB), its
    // one '' token trains into the reject class, and the student agrees
    val (m4, nk4, gk4, ag4) = got(4L)
    assert(m4 < 0L && !nk4 && gk4.contains(false) && ag4, got(4L).toString)
  }

  test("gopherBySource aggregates the shared verdict per source: exact " +
      "counts, nulls-last source order, null text excluded") {
    val docs = Seq(
      (0L, "alpha betas gamma delta", "s1"), // passes the gopher band
      (1L, "x1 y2", "s1"),                   // fails (digits, short words)
      (2L, "alpha betas gamma delta", null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String], "s2")) // no verdict: excluded
      .toDF("doc_id", "text", "source")
    val got = TextOps.gopherBySource(docs)
      .as[(Option[String], Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (Some("s1"), 2L, 1L, 0.5),
      (None, 1L, 1L, 1.0)), got.toString)
  }

  test("lmOutlierScores: the gibberish doc flags as the outlier under " +
      "the corpus LM; exact quantize-then-moments replay") {
    // many unremarkable docs + one OOV-heavy doc trained as rare
    val texts = (0 until 8).map(i => (i.toLong, "the cat sat on the mat")) :+
      (8L -> "zqx wvu jkl pqr mno bcd")
    val docs = (texts :+ (9L -> null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val (toks, costs, oov) = TextOps.trainUnigramCosts(docs)
    val cm = toks.zip(costs).toMap
    val got = TextOps.lmOutlierScores(docs, toks, costs, oov)
      .as[(Long, Long, Double, Option[Double], Boolean)].collect().toSeq
    // replay: per-doc 4dp-quantized mean nats, then exact moments
    val nats4 = texts.map { case (_, t) =>
      val ts = t.split(" ")
      val cost = ts.map(w => cm.getOrElse(w, oov)).sum
      math.floor((cost.toDouble / ts.length.toDouble /
        TextOps.DsirLogScale.toDouble) * 10000 + 0.5).toLong
    }
    val n = nats4.size.toLong
    val mean = nats4.sum.toDouble / n.toDouble
    val std = math.sqrt(math.max(
      nats4.map(v => v * v).sum.toDouble / n.toDouble - mean * mean, 0.0))
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val want = texts.zip(nats4).map { case ((id, t), q) =>
      val z = r4((q.toDouble - mean) / std)
      (id, t.split(" ").length.toLong, q.toDouble / 10000.0, Some(z),
        math.abs(z) > TextOps.LmOutlierZ)
    }
    assert(got == want, s"got $got want $want")
    // the gibberish doc is the single flagged outlier; null text absent
    assert(got.count(_._5) == 1 && got.find(_._5).get._1 == 8L,
      got.toString)
    assert(!got.exists(_._1 == 9L), got.toString)
  }

  test("sourceSimilarity: same-content sources read cosine 1.0; " +
      "disjoint-vocabulary pairs share no row; null source/text excluded") {
    val docs = Seq(
      (0L, "a a b", "s1"),
      (1L, "a a b", "s2"),
      (2L, "x y z", "s3"),
      (3L, null.asInstanceOf[String], "s1"),
      (4L, "a b", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "source")
    val got = TextOps.sourceSimilarity(docs)
      .as[(String, String, Long, Double)].collect().toSeq
    // s1/s2 vectors are both {a:2, b:1}: dot 5, norms sqrt(5) → cosine 1;
    // s3 shares no token with either — no pair row at all
    assert(got == Seq(("s1", "s2", 5L, 1.0)), got.toString)
  }

  test("tokenBurstiness: a clumping token scores a higher Fano factor " +
      "than an evenly spread one; exact-moment replay") {
    val docs = Seq(
      (0L, "a a a a b b"), (1L, "a b b"), (2L, "b b"))
      .toDF("doc_id", "text")
    val got = TextOps.tokenBurstiness(docs)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def stats(cs: Seq[Long]) = {
      val n = cs.size.toLong
      val mean = cs.sum.toDouble / n.toDouble
      val variance = math.max(
        cs.map(c => c * c).sum.toDouble / n.toDouble - mean * mean, 0.0)
      (n, cs.sum, r6(mean), r6(variance / mean))
    }
    // b: counts [2,2,2] — perfectly even, Fano 0; a: [4,1] — bursty
    val (bn, bt, bm, bf) = stats(Seq(2L, 2L, 2L))
    val (an, at, am, af) = stats(Seq(4L, 1L))
    assert(got == Seq(("b", bn, bt, bm, bf), ("a", an, at, am, af)),
      got.toString)
    assert(af > bf && bf == 0.0, got.toString)
  }

  test("trainUnigramCosts replays add-1-smoothed negative log probs with " +
      "the proper OOV bucket; sourceCrossEntropy aggregates exact " +
      "micro-nat costs per source") {
    val docs = Seq(
      (0L, "a a b", "news"),
      (1L, "a c", "news"),
      (2L, "b b", "web"),
      (3L, null.asInstanceOf[String], "web"),
      (4L, "a", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "source")
    val (toks, costs, oov) = TextOps.trainUnigramCosts(docs)
    // counts: a 4, b 3, c 1; T = 8, V = 3, denominator T + V + 1 = 12
    val m = toks.zip(costs).toMap
    def c(n: Int): Long = math.floor(
      -math.log((n + 1).toDouble / 12.0) * TextOps.DsirLogScale + 0.5).toLong
    assert(m == Map("a" -> c(4), "b" -> c(3), "c" -> c(1)), m.toString)
    assert(oov == c(0), s"oov $oov want ${c(0)}")
    // costs are ordered by rarity: rarer tokens cost more nats
    assert(m("a") < m("b") && m("b") < m("c") && m("c") < oov, m.toString)
    val got = TextOps.sourceCrossEntropy(docs, toks, costs, oov)
      .as[(Option[String], Long, Long, Long, Long, Double)].collect().toSeq
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def mean(cost: Long, n: Long) = r6(
      (cost.toDouble / n.toDouble) / TextOps.DsirLogScale.toDouble)
    val want = Seq(
      (Some("news"), 2L, 5L, 0L, 3 * m("a") + m("b") + m("c"),
        mean(3 * m("a") + m("b") + m("c"), 5)),
      (Some("web"), 1L, 2L, 0L, 2 * m("b"), mean(2 * m("b"), 2)),
      (None, 1L, 1L, 0L, m("a"), mean(m("a"), 1)))
    assert(got == want, s"got $got want $want")
    // OOV tokens pay the trained constant and are counted
    val oovGot = TextOps.sourceCrossEntropy(
      Seq((9L, "a zz qq", "s")).toDF("doc_id", "text", "source"),
      toks, costs, oov)
      .as[(Option[String], Long, Long, Long, Long, Double)].collect().toSeq
    assert(oovGot == Seq((Some("s"), 1L, 3L, 2L, m("a") + 2 * oov,
      mean(m("a") + 2 * oov, 3))), oovGot.toString)
  }

  test("knContinuations: distinct-bigram-type continuation counts with " +
      "0 back-fill for one-sided words") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "c b"), (4L, "b a"))
      .toDF("doc_id", "text")
    val got = TextOps.knContinuations(docs)
      .as[(String, Long, Long)].collect().toSeq
    // bigram types: (a,b) (c,b) (b,a); b is continued by {a,c}, a by {b};
    // c never continues anything but licenses {b}
    assert(got == Seq(("b", 2L, 1L), ("a", 1L, 1L), ("c", 0L, 1L)),
      got.toString)
  }
}
