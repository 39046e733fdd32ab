package graft.ext

import java.util.{HashSet => JHashSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass shingle hashing: the distinct set of xxhash64-combined hashes of
  * each run of `width` consecutive whitespace tokens, as `array<long>`.
  *
  * Why a custom expression: the built-in formulation
  * (`transform(sequence(...), i -> hash(slice(split(text), i, w)))`)
  * re-evaluates the captured `split(text)` on every lambda invocation —
  * O(tokens²) per document — because higher-order-function lambdas don't
  * share subexpressions. This evaluates once per row: tokenize O(n), hash
  * each token once, rolling-combine, dedup. Token joins are injective
  * (tokens carry no separator), so the hash set is equivalent to the
  * distinct string-shingle set absent 64-bit collisions.
  *
  * Evaluated once per row (not per element), so CodegenFallback costs one
  * virtual call per document — negligible against the per-token work.
  */
case class ShingleHashes(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {

  require(width >= 1, s"shingle width must be >= 1, got $width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  private val Seed = 42L
  private val Space = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val tokens = v.asInstanceOf[UTF8String].split(Space, -1)
    val n = tokens.length
    if (n < width) return new GenericArrayData(Array.emptyLongArray)
    val tokenHash = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = tokens(i)
      tokenHash(i) =
        XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, Seed)
      i += 1
    }
    val seen = new JHashSet[java.lang.Long](n * 2)
    val out = new Array[Long](n - width + 1)
    var m = 0
    i = 0
    while (i <= n - width) {
      var h = Seed
      var j = 0
      while (j < width) { h = XXH64.hashLong(tokenHash(i + j), h); j += 1 }
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(if (m == out.length) out else out.take(m))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass POSITIONAL shingle hashing: the hash of every `width`-token
  * window in document order (array index = window start position), NOT
  * deduplicated — the input of span-level duplicate detection, where
  * [[ShingleHashes]]' distinct set would lose the positions the span
  * arithmetic needs. Same tokenize-once + rolling-combine evaluation and
  * the same hash function as [[ShingleHashes]], so the two expressions'
  * hash universes are interchangeable. Empty array below `width` tokens. */
case class ShinglePosHashes(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {

  require(width >= 1, s"shingle width must be >= 1, got $width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_pos_hashes"

  private val Seed = 42L
  private val Space = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val tokens = v.asInstanceOf[UTF8String].split(Space, -1)
    val n = tokens.length
    if (n < width) return new GenericArrayData(Array.emptyLongArray)
    val tokenHash = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = tokens(i)
      tokenHash(i) =
        XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, Seed)
      i += 1
    }
    val out = new Array[Long](n - width + 1)
    i = 0
    while (i <= n - width) {
      var h = Seed
      var j = 0
      while (j < width) { h = XXH64.hashLong(tokenHash(i + j), h); j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass shingle multiplicity stats: over the NON-distinct stream of
  * `width`-token shingle hashes, returns
  * `struct(n_shingles, n_distinct, top_cnt)` — total positions, distinct
  * shingles, and the count of the most frequent one (the inputs of the
  * repetition-filter ratios). Null for docs shorter than `width` (no
  * signal). One tokenize pass + an open-addressed count map per row; the
  * alternative (posexplode + lead windows + two aggregates) shuffles the
  * whole TOKEN stream on doc_id — corpus-sized at 100 TB — where this
  * evaluates map-side and shuffles nothing. */
case class ShingleCounts(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {

  require(width >= 1, s"shingle width must be >= 1, got $width")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_shingles", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_distinct", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top_cnt", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_counts"

  private val Seed = 42L
  private val Space = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val tokens = v.asInstanceOf[UTF8String].split(Space, -1)
    val n = tokens.length
    if (n < width) return null
    val tokenHash = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = tokens(i)
      tokenHash(i) =
        XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, Seed)
      i += 1
    }
    val counts = new java.util.HashMap[java.lang.Long, Array[Int]](n * 2)
    var distinct = 0L
    var top = 0
    i = 0
    while (i <= n - width) {
      var h = Seed
      var j = 0
      while (j < width) { h = XXH64.hashLong(tokenHash(i + j), h); j += 1 }
      var c = counts.get(h)
      if (c == null) { c = new Array[Int](1); counts.put(h, c); distinct += 1L }
      c(0) += 1
      if (c(0) > top) top = c(0)
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      (n - width + 1).toLong, distinct, top.toLong)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass MinHash: `numHashes` independent minima over the document's
  * shingle-hash stream, computed per row — tokenize once, rolling-combine
  * each `width`-token shingle, update the minima
  * (`XXH64.hashLong(shingle, seed)`, the same family as
  * [[MinHashSignature]], so the two paths are interchangeable and
  * spec-pinned equal). Minima are multiset-insensitive, so no dedup set is
  * needed. Null for docs shorter than `width` (the aggregate path drops
  * them at the explode — same corpus). The aggregate stays the right shape
  * when shingles arrive pre-exploded or streamed; for whole documents this
  * avoids shuffling the (doc_id, shingle-hash) stream entirely. */
case class MinHashSig(child: Expression, width: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  require(width >= 1 && numHashes >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  private val Seed = 42L
  private val Space = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val tokens = v.asInstanceOf[UTF8String].split(Space, -1)
    val n = tokens.length
    if (n < width) return null
    val tokenHash = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = tokens(i)
      tokenHash(i) =
        XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, Seed)
      i += 1
    }
    val sig = Array.fill(numHashes)(Long.MaxValue)
    i = 0
    while (i <= n - width) {
      var h = Seed
      var j = 0
      while (j < width) { h = XXH64.hashLong(tokenHash(i + j), h); j += 1 }
      var s = 0
      while (s < numHashes) {
        val m = XXH64.hashLong(h, s)
        if (m < sig(s)) sig(s) = m
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass SimHash: 64 ±1 votes from each token's xxhash64 bits
  * (seed 42 — bit-identical to the built-in `xxhash64`), sign vector
  * packed into one long. The explode + 64-conditional-sum aggregate
  * formulation shuffles the whole token stream on doc_id (corpus-sized);
  * this evaluates map-side, one tokenize pass per row. Votes are
  * commutative sums, so the signature is identical under any evaluation
  * order — the agg-form ≡ expr-form spec pins the equivalence. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  private val Seed = 42L
  private val Space = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val tokens = v.asInstanceOf[UTF8String].split(Space, -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
        t.numBytes, Seed)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) { if (votes(k) > 0) sig |= (1L << k); k += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DEFLATE compression ratio of a text's UTF-8 bytes (compressed/raw, in
  * (0, ~1.03]): the Gopher/C4-family quality signal — templated
  * boilerplate and repeated spans compress far below natural prose, and
  * machine-generated spam sits at the extremes on BOTH sides. Complements
  * the token-level repetition metrics ([[ShingleCounts]]): DEFLATE's
  * LZ77 window catches long-range and sub-token repetition that
  * fixed-width shingles cannot.
  *
  * One pass per row; the Deflater is THREAD-LOCAL and `reset()` per call
  * (instantiating per row would dominate the cost — native zlib handle
  * allocation). Level 6 (zlib default) is pinned for determinism across
  * runs of the same JVM/zlib; the ratio is JVM-deterministic but NOT
  * portable SQL, so queries over it are rows-only entries with
  * spec-pinned ground truth, never DuckDB mirrors. Empty text → null
  * (no meaningful ratio). */
case class DeflateRatio(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) null
    else {
      val d = DeflateRatio.LocalDeflater.get()
      d.reset()
      d.setInput(bytes)
      d.finish()
      var compressed = 0L
      val buf = DeflateRatio.LocalBuf.get()
      while (!d.finished()) compressed += d.deflate(buf)
      compressed.toDouble / bytes.length
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateRatio {
  private val LocalDeflater =
    ThreadLocal.withInitial[java.util.zip.Deflater](() =>
      new java.util.zip.Deflater(6))
  private val LocalBuf =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](8192))
}

/** Order-preserving intra-document unit dedup: split on `delim`, keep the
  * FIRST occurrence of each distinct unit, re-join with `delim`. With
  * `"\n"` this is classic repeated-line removal (the C4/MassiveText
  * cleanup for boilerplate navigation/footer lines that repeat inside one
  * page); any other delimiter generalizes it (sentences, tokens). One
  * O(units) pass per row against the relational formulation
  * (posexplode + min(pos) + re-collect_list), which shuffles the
  * corpus-sized unit stream on doc_id twice. Returns the input value
  * untouched when nothing repeats — the common case pays hashing only,
  * no string rebuild.
  *
  * The delimiter is LITERAL throughout (`splitSQL`, not the regex-based
  * `split`): split, re-join, and [[TextOps.dedupWithin]]'s
  * `Pattern.quote` unit counting all agree for delimiters containing
  * regex metacharacters — the scaladoc-suggested sentence delimiter `"."`
  * would otherwise split on every character. */
case class DedupUnits(child: Expression, delim: String)
    extends UnaryExpression with CodegenFallback {

  require(delim.nonEmpty, "delimiter must be non-empty")

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "dedup_units"

  @transient private lazy val delimiter = UTF8String.fromString(delim)

  override def nullSafeEval(v: Any): Any = {
    val units = v.asInstanceOf[UTF8String].splitSQL(delimiter, -1)
    val seen = new JHashSet[UTF8String](units.length * 2)
    val kept = new java.util.ArrayList[UTF8String](units.length)
    var i = 0
    while (i < units.length) {
      if (seen.add(units(i))) kept.add(units(i))
      i += 1
    }
    if (kept.size == units.length) v
    else UTF8String.concatWs(delimiter,
      kept.toArray(new Array[UTF8String](kept.size)): _*)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass stopword-argmax language guess: counts per-list stopword
  * occurrences in a single tokenize pass and returns the label of the
  * highest-scoring list (ties favor earlier lists), or `fallback` when no
  * list scores. The per-language lambda formulation pays one interpreted
  * eval per token PER LANGUAGE and would be re-evaluated per reference;
  * returning the final label keeps the expression referenced exactly once.
  * Decision logic matches the oracle's CASE over per-list occurrence
  * counts. */
case class LangGuess(child: Expression, lists: Seq[Seq[String]],
    labels: Seq[String], fallback: String)
    extends UnaryExpression with CodegenFallback {

  require(lists.length == labels.length)

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "lang_guess"

  private val Space = UTF8String.fromString(" ")
  @transient private lazy val labelStrings =
    labels.map(UTF8String.fromString).toArray
  @transient private lazy val fallbackString = UTF8String.fromString(fallback)
  // word -> indices of the lists containing it (a word may be in several)
  @transient private lazy val wordLists: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    lists.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  override def nullSafeEval(v: Any): Any = {
    val tokens = v.asInstanceOf[UTF8String].split(Space, -1)
    val counts = new Array[Int](lists.length)
    var i = 0
    while (i < tokens.length) {
      val hit = wordLists.get(tokens(i))
      if (hit != null) { var j = 0; while (j < hit.length) { counts(hit(j)) += 1; j += 1 } }
      i += 1
    }
    var best = -1
    var bestCount = 0
    i = 0
    while (i < counts.length) {
      if (counts(i) > bestCount) { best = i; bestCount = counts(i) }
      i += 1
    }
    if (best < 0) fallbackString else labelStrings(best)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass positional token removal: re-joins the whitespace tokens of
  * `text` whose 0-based index is NOT in `positions` (an `array<int>`; order
  * and duplicates don't matter, out-of-range entries are ignored). The
  * re-assembly step of span-level dedup — tokenize once, flag, skip,
  * `concatWs` — where a lambda formulation (`filter` over a zipped
  * index/token array) would pay an interpreted O(positions) membership
  * scan per token. Returns the empty string when every token is removed. */
case class RemoveTokensAt(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "remove_tokens_at"

  private val Space = UTF8String.fromString(" ")

  override def nullSafeEval(t: Any, p: Any): Any = {
    val tokens = t.asInstanceOf[UTF8String].split(Space, -1)
    val positions =
      p.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
    if (positions.isEmpty) return t
    val drop = new Array[Boolean](tokens.length)
    var i = 0
    while (i < positions.length) {
      val idx = positions(i)
      if (idx >= 0 && idx < tokens.length) drop(idx) = true
      i += 1
    }
    val kept = new java.util.ArrayList[UTF8String](tokens.length)
    i = 0
    while (i < tokens.length) {
      if (!drop(i)) kept.add(tokens(i))
      i += 1
    }
    UTF8String.concatWs(Space,
      kept.toArray(new Array[UTF8String](kept.size)): _*)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Replace-chain BPE subword counting against a TRAINED merge list:
  * `struct(n_tokens, n_subwords)` — whitespace tokens, and total subword
  * symbols after applying every merge in rank order to every token.
  *
  * Tokens are encoded in the DOUBLE-SEPARATOR representation
  * `^ s1 ^^ s2 ^^ … sn ^` (writing `^` for U+001F), and each merge
  * (a,b) is ONE literal left-to-right non-overlapping string replace of
  * `^a^^b^` with `^ab^`. The doubled
  * inner separators make this EXACTLY array-BPE: each match consumes one
  * of the two separators flanking the pair, so an adjacent repeat
  * (a,b,a,b) still matches again immediately (single separators would be
  * swallowed by the previous match), and the outer anchors make a symbol
  * BOUNDARY part of the pattern, so (a,b) can never match inside
  * ["ca","b"] or ["a","bc"]. Identical replace semantics exist in DuckDB
  * (`replace()` — verified: continues scanning after each replacement),
  * which is what lets a LEARNED tokenizer ride the hash gate: the oracle
  * SQL is generated from the same merge list as one replace() chain.
  *
  * Cost: O(merges × token length) per token — the engine-exactness form;
  * a production encoder keeps a rank heap instead. Counting, not the
  * subwords themselves, is returned (the budgeting use case). */
case class BpeSubwordStats(child: Expression, patterns: Seq[String],
    replacements: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(patterns.length == replacements.length)

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_subwords", LongType, nullable = false)))
  override def prettyName: String = "bpe_subword_stats"

  private val Sep = '\u001f'
  private val SepSep = "\u001f\u001f"
  @transient private lazy val pats = patterns.toArray
  @transient private lazy val reps = replacements.toArray

  private def repr(tok: String): String = {
    val sb = new java.lang.StringBuilder(tok.length * 3 + 2)
    sb.append(Sep)
    var i = 0
    var first = true
    while (i < tok.length) {
      val cp = tok.codePointAt(i)
      if (!first) sb.append(SepSep)
      sb.appendCodePoint(cp)
      first = false
      i += Character.charCount(cp)
    }
    sb.append(Sep)
    sb.toString
  }

  /** Non-overlapping occurrences of the double separator + 1 = symbols. */
  private def countSymbols(s: String): Long = {
    var n = 1L
    var i = s.indexOf(SepSep)
    while (i >= 0) { n += 1L; i = s.indexOf(SepSep, i + 2) }
    n
  }

  override def nullSafeEval(v: Any): Any = {
    val tokens = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    var nsub = 0L
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      // an empty token (consecutive/trailing spaces) is ONE subword —
      // matching token_count's accounting; its bare "^^" repr would
      // otherwise read as a spurious two
      if (tok.isEmpty) nsub += 1L
      else {
        var s = repr(tok)
        var m = 0
        while (m < pats.length) { s = s.replace(pats(m), reps(m)); m += 1 }
        nsub += countSymbols(s)
      }
      t += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(tokens.length.toLong, nsub)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass scoring of a document against a TRAINED unigram vocabulary
  * (token → corpus count): returns `struct(n_tokens, n_oov, vocab_sum)` —
  * total whitespace tokens, tokens absent from the vocabulary, and the sum
  * of the corpus counts of the in-vocabulary tokens. The CCNet-style
  * "train a cheap LM on the corpus, score every document against it"
  * quality signal, with the train/serve split of the IVF quantizer: the
  * vocabulary is a bounded trained artifact baked into the expression
  * (≤ maxVocab entries — broadcastable by construction via the task
  * binary), and serving is a single map-side tokenize pass, exact integer
  * arithmetic throughout (the familiarity ratio divides ONCE at the end,
  * in IEEE doubles — engine-exact, unlike a per-token log-prob sum whose
  * `ln` ulp differences could flip a rounding boundary across engines). */
case class UnigramFamiliarity(child: Expression, vocabTokens: Seq[String],
    vocabCounts: Seq[Long])
    extends UnaryExpression with CodegenFallback {

  require(vocabTokens.length == vocabCounts.length,
    s"vocab arrays disagree: ${vocabTokens.length} tokens vs " +
      s"${vocabCounts.length} counts")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_oov", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("vocab_sum", LongType, nullable = false)))
  override def prettyName: String = "unigram_familiarity"

  private val Space = UTF8String.fromString(" ")
  @transient private lazy val vocab: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](
      vocabTokens.length * 2)
    var i = 0
    while (i < vocabTokens.length) {
      m.put(UTF8String.fromString(vocabTokens(i)), vocabCounts(i))
      i += 1
    }
    m
  }

  override def nullSafeEval(v: Any): Any = {
    val tokens = v.asInstanceOf[UTF8String].split(Space, -1)
    var oov = 0L
    var sum = 0L
    var i = 0
    while (i < tokens.length) {
      val c = vocab.get(tokens(i))
      if (c == null) oov += 1L else sum += c.longValue()
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(tokens.length.toLong, oov, sum)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[UnigramFamiliarity]] lifted to ADJACENT-PAIR (bigram) statistics: one
  * tokenize pass sliding a 2-token window against a trained bigram table
  * (keys are the space-joined pair — unambiguous because tokens are
  * space-split). struct(n_bigrams, n_oov, vocab_sum); docs under two
  * tokens report (0, 0, 0) and the caller null-guards the ratio. Same
  * scale stance as the unigram form: the vocabulary rides the task binary
  * (map-side serving, zero shuffle) — never an exploded corpus-token join. */
case class BigramFamiliarity(child: Expression, vocabKeys: Seq[String],
    vocabCounts: Seq[Long])
    extends UnaryExpression with CodegenFallback {

  require(vocabKeys.length == vocabCounts.length,
    s"vocab arrays disagree: ${vocabKeys.length} keys vs " +
      s"${vocabCounts.length} counts")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_bigrams", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_oov", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("vocab_sum", LongType, nullable = false)))
  override def prettyName: String = "bigram_familiarity"

  private val Space = UTF8String.fromString(" ")
  @transient private lazy val vocab: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](
      vocabKeys.length * 2)
    var i = 0
    while (i < vocabKeys.length) {
      m.put(UTF8String.fromString(vocabKeys(i)), vocabCounts(i))
      i += 1
    }
    m
  }

  override def nullSafeEval(v: Any): Any = {
    val tokens = v.asInstanceOf[UTF8String].split(Space, -1)
    val n = math.max(tokens.length - 1, 0)
    var oov = 0L
    var sum = 0L
    var i = 0
    while (i < n) {
      val c = vocab.get(UTF8String.concat(tokens(i), Space, tokens(i + 1)))
      if (c == null) oov += 1L else sum += c.longValue()
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(n.toLong, oov, sum)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Distinct hashed `width`-token shingles of a text column. */
  def shingleHashes(text: Column, width: Int = 3): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), width))

  /** Positional (non-distinct) hashed `width`-token windows. */
  def shinglePosHashes(text: Column, width: Int = 3): Column =
    ColumnBridge.column(ShinglePosHashes(ColumnBridge.expression(text), width))

  /** Tokens of `text` minus the 0-based indices in `positions`, re-joined. */
  def removeTokensAt(text: Column, positions: Column): Column =
    ColumnBridge.column(RemoveTokensAt(ColumnBridge.expression(text),
      ColumnBridge.expression(positions)))

  /** struct(n_tokens, n_oov, vocab_sum) against a trained unigram vocab. */
  def unigramFamiliarity(text: Column, vocabTokens: Seq[String],
      vocabCounts: Seq[Long]): Column =
    ColumnBridge.column(UnigramFamiliarity(ColumnBridge.expression(text),
      vocabTokens, vocabCounts))

  /** struct(n_bigrams, n_oov, vocab_sum) against a trained bigram table
    * (keys are space-joined adjacent pairs). */
  def bigramFamiliarity(text: Column, vocabKeys: Seq[String],
      vocabCounts: Seq[Long]): Column =
    ColumnBridge.column(BigramFamiliarity(ColumnBridge.expression(text),
      vocabKeys, vocabCounts))

  /** struct(n_tokens, n_subwords) under a trained BPE replace chain. */
  def bpeSubwordStats(text: Column, patterns: Seq[String],
      replacements: Seq[String]): Column =
    ColumnBridge.column(BpeSubwordStats(ColumnBridge.expression(text),
      patterns, replacements))

  /** struct(n_shingles, n_distinct, top_cnt) over the non-distinct shingle
    * stream; null for docs shorter than `width`. */
  def shingleCounts(text: Column, width: Int = 3): Column =
    ColumnBridge.column(ShingleCounts(ColumnBridge.expression(text), width))

  /** One-pass 64-bit SimHash signature of a text column. */
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))

  /** DEFLATE compressed/raw byte ratio; null for empty text. */
  def deflateRatio(text: Column): Column =
    ColumnBridge.column(DeflateRatio(ColumnBridge.expression(text)))

  /** One-pass MinHash signature (array<long>[numHashes]); null below
    * `width` tokens. */
  def minhashSig(text: Column, width: Int = 3, numHashes: Int = 32): Column =
    ColumnBridge.column(
      MinHashSig(ColumnBridge.expression(text), width, numHashes))

  /** First-occurrence unit dedup of a text column (units = `delim` splits). */
  def dedupUnits(text: Column, delim: String): Column =
    ColumnBridge.column(DedupUnits(ColumnBridge.expression(text), delim))

  /** Stopword-argmax language label for a text column. */
  def langGuess(text: Column, lists: Seq[Seq[String]], labels: Seq[String],
      fallback: String): Column =
    ColumnBridge.column(LangGuess(ColumnBridge.expression(text), lists,
      labels, fallback))
}
