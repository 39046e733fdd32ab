package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Exprs._

/** Deduplication operators for a training-data pipeline over `documents`:
  * exact (hash group-by), n-gram Jaccard (exact set similarity), MinHash+LSH
  * (banded approximate Jaccard) and SimHash (hamming-distance near-dup).
  *
  * Scale design: every variant is shuffle-bounded by design —
  *  - exact dedup: one hash aggregate on a 128-bit digest (no text shuffle);
  *  - n-gram Jaccard: candidate generation self-joins on the *shingle*, so
  *    only (doc_id, shingle-hash) pairs shuffle, never document text, and
  *    the quadratic blow-up is bounded per shingle bucket;
  *  - MinHash/LSH: fixed-width signatures (S longs/doc) replace the shingle
  *    set before any join — the join key is a band hash, which is the
  *    standard way to keep near-dup detection linear-ish at 100 TB;
  *  - SimHash: one 64-bit signature/doc, candidates via 16-bit band
  *    blocking.
  * All hashing is `xxhash64` (Spark-native, codegen'd, deterministic across
  * partitionings and engines).
  */
object Dedup {
  /** Exact-duplicate groups keyed by md5(text): keeper (min doc_id) and
    * multiplicity per distinct text. */
  def exactDedup(documents: DataFrame): DataFrame =
    documents.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .orderBy("keeper_id")

  /** Distinct word-trigram shingles per document (docs shorter than the
    * shingle width drop out). */
  def shingles(documents: DataFrame, width: Int = 3): DataFrame = {
    val toks = split(col("text"), " ")
    documents
      .filter(size(toks) >= width)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(toks) - width),
          i => concat_ws(" ", slice(toks, i + 1, lit(width)))))).as("shingle"))
  }

  /** Exact n-gram Jaccard: top-k most-similar document pairs. Intersections
    * come from a shingle-keyed self-join (group sizes bounded by shingle
    * frequency); the division is int/int in IEEE doubles, so ordering is
    * engine-exact. */
  def ngramJaccardTopPairs(documents: DataFrame, k: Int = 20): DataFrame = {
    val sh = shingles(documents).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .agg(count(lit(1)).as("common"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc1")
        .withColumnRenamed("sz", "sz1"), "doc1")
      .join(sizes.withColumnRenamed("doc_id", "doc2")
        .withColumnRenamed("sz", "sz2"), "doc2")
      .select(col("doc1"), col("doc2"),
        round2(col("common").cast("double") /
          (col("sz1") + col("sz2") - col("common")), 6).as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc1"), col("doc2"))
      .limit(k)
  }

  /** MinHash signature column: `numHashes` independent min-hashes of the
    * document's shingle set, built per-row from the shingle array (seeded
    * xxhash64 per hash function — no learned model, no shuffle). */
  private def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleArr, s => xxhash64(i, s))))

  /** MinHash + LSH banding near-dup candidates, verified with exact Jaccard.
    *
    * numHashes=32 split into 8 bands × 4 rows: docs agreeing on any full
    * band become candidates (prob ≈ 1-(1-j^4)^8, steep around j≈0.5). Only
    * candidates pay the exact verification join. Returns pairs with exact
    * jaccard ≥ `threshold`. */
  def minhashNearDups(documents: DataFrame, numHashes: Int = 32,
      bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val toks = split(col("text"), " ")
    val withSig = documents
      .filter(size(toks) >= 3)
      .select(col("doc_id"), array_distinct(
        transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", slice(toks, i + 1, lit(3))))).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    // band hash per (doc, band); bucket join on (band, hash)
    val banded = withSig.select(col("doc_id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
        col("a.sh").as("sh1"), col("b.sh").as("sh2"))
      .dropDuplicates("doc1", "doc2")
    cand.select(col("doc1"), col("doc2"),
        round2(size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc1"), col("doc2"))
  }

  /** 64-bit SimHash of the token multiset: per bit, majority vote of the
    * tokens' xxhash64 bits; sign vector packed into one long. SQL-expressed
    * (the Scala shift builtins only take Int shift amounts) — still a single
    * codegen'd expression, one pass over the tokens, and the vote array is
    * referenced exactly once so it is not recomputed per bit. Bitwise
    * OR-fold packing avoids integer-sum overflow (ANSI mode). */
  def simhashExpr(textCol: String): Column = expr(
    s"""aggregate(
       |  zip_with(
       |    aggregate(split($textCol, ' '), array_repeat(0, 64),
       |      (acc, t) -> zip_with(acc,
       |        transform(sequence(0, 63),
       |          k -> if((shiftright(xxhash64(t), k) & 1L) = 1L, 1, -1)),
       |        (a, b) -> a + b)),
       |    sequence(0, 63),
       |    (v, k) -> if(v > 0, shiftleft(1L, k), 0L)),
       |  0L, (acc, x) -> acc | x)""".stripMargin)

  /** SimHash near-dup pairs: candidates block on any equal 16-bit quarter of
    * the signature (a hamming-distance ≤ 3 pair must agree on ≥1 of 4
    * bands), verified with `bit_count(xor) <= maxHamming`. */
  def simhashNearDups(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = documents.select(col("doc_id"),
        simhashExpr("text").as("sig"))
    val banded = sigs.select(col("doc_id"), col("sig"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("sig"), b * 16).bitwiseAND(0xFFFF)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .dropDuplicates("doc1", "doc2")
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc1"), col("doc2"))
  }
}
