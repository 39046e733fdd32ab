package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Exprs._

/** Approximate-nearest-neighbor / similarity search over an embedding column
  * (`embeddings: vec_id, embedding array<float>, label`).
  *
  * Two paths, per the standard scale playbook:
  *  - [[cosineTopK]]: exact brute force — fine when the *query* side is
  *    small (broadcast) even if the corpus is 100 TB: one pruned scan, a
  *    broadcast nested loop against k query rows, and a TakeOrderedAndProject
  *    top-k; no corpus shuffle at all.
  *  - [[lshTopK]]: random-hyperplane (sign) LSH — buckets the corpus by a
  *    b-bit signature so each query only scans candidate buckets. The
  *    hyperplanes are derived deterministically from a seed, so signatures
  *    are reproducible across runs/engines.
  *
  * All arithmetic is double-precision and built from codegen'd higher-order
  * functions (`zip_with` + `aggregate`) — no UDF, stays in WholeStageCodegen.
  */
object Similarity {
  /** Dot product of two float-array columns in double, accumulated in index
    * order — a native codegen'd Catalyst expression ([[VecDotProduct]]);
    * bit-identical to the interpreted `aggregate(zip_with(...))`
    * formulation it replaces, at a fraction of the cost. */
  def dot(a: Column, b: Column): Column = VecExpressions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors of `queryVecId` (excluded from results).
    * The single query row is broadcast; the corpus is scanned once. */
  def cosineTopK(embeddings: DataFrame, queryVecId: Long = 0L,
      k: Int = 10): DataFrame = {
    val q = broadcast(
      embeddings.filter(col("vec_id") === queryVecId)
        .select(col("embedding").as("q_emb")))
    val sim = cosine(col("embedding"), col("q_emb"))
    embeddings.filter(col("vec_id") =!= queryVecId)
      .crossJoin(q)
      .select(col("vec_id"), sim.as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round2(col("sim"), 4).as("cosine_sim"))
  }

  /** Batched exact KNN: top-k corpus neighbors for each of a (small) set of
    * query vectors in one pass — queries broadcast against a single corpus
    * scan, per-query top-k via the bounded-heap [[TopK]] aggregator (k rows
    * per (query, partition) shuffle, no per-query sort). */
  def batchKnn(embeddings: DataFrame, numQueries: Int = 5, k: Int = 3): DataFrame = {
    val q = broadcast(embeddings.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val scored = embeddings.filter(col("vec_id") >= numQueries)
      .crossJoin(q)
      .select(col("query_id"), col("vec_id"),
        cosine(col("embedding"), col("q_emb")).as("sim"))
    TopK.topKPerGroup(scored, "query_id", "sim", "vec_id", k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round2(col("sim"), 4).as("cosine_sim"))
      .orderBy("query_id", "rank")
  }

  /** Deterministic pseudo-random unit-ish hyperplanes: `bits` planes of
    * dimension `dim`, components from a splitmix-style integer mix of
    * (seed, plane, component) mapped to [-1, 1). Reproducible everywhere,
    * no RNG state. */
  private def hyperplanes(dim: Int, bits: Int, seed: Long): Array[Array[Float]] =
    Array.tabulate(bits) { p =>
      Array.tabulate(dim) { i =>
        var z = seed + 0x9E3779B97F4A7C15L * (p.toLong * 131071L + i + 1L)
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^= z >>> 31
        // top 53 bits → [0,1) → [-1,1); float plane components so the
        // codegen'd float-vector dot product applies
        ((z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
      }
    }

  /** Sign-LSH signature: bit p = sign(embedding · plane_p), packed into a
    * long (bits ≤ 63). Planes enter the plan as array literals. */
  def signSignature(emb: Column, dim: Int, bits: Int, seed: Long): Column = {
    val planes = hyperplanes(dim, bits, seed)
    val bitCols = planes.zipWithIndex.map { case (plane, p) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(emb, planeCol) >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k via sign-LSH: candidates are corpus vectors whose
    * signature is within `maxHammingBits` of the query's (checked with
    * bit_count(xor)); exact cosine then ranks candidates. With bits=16 and
    * maxHamming=6 recall is high for top-10 on 64-d data while scanning a
    * small corpus fraction at scale. */
  def lshTopK(embeddings: DataFrame, queryVecId: Long = 0L, k: Int = 10,
      dim: Int = 64, bits: Int = 16, maxHammingBits: Int = 6,
      seed: Long = 42L): DataFrame = {
    val signed = embeddings.withColumn("sig",
      signSignature(col("embedding"), dim, bits, seed))
    val q = broadcast(signed.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"), col("sig").as("q_sig")))
    signed.filter(col("vec_id") =!= queryVecId)
      .crossJoin(q)
      .filter(bit_count(col("sig").bitwiseXOR(col("q_sig"))) <= maxHammingBits)
      .select(col("vec_id"), cosine(col("embedding"), col("q_emb")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round2(col("sim"), 4).as("cosine_sim"))
  }

  /** All-pairs embedding near-dups above a cosine threshold, LSH-bucketed:
    * exact cosine only within same-signature buckets (the scale path for
    * embedding-based corpus dedup; raise `bits` to shrink buckets). */
  def embeddingNearDups(embeddings: DataFrame, threshold: Double = 0.9,
      dim: Int = 64, bits: Int = 8, seed: Long = 42L): DataFrame = {
    val signed = embeddings.select(col("vec_id"), col("embedding"),
      signSignature(col("embedding"), dim, bits, seed).as("sig"))
    signed.as("a").join(signed.as("b"),
        col("a.sig") === col("b.sig") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec1"), col("b.vec_id").as("vec2"),
        cosine(col("a.embedding"), col("b.embedding")).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("vec1"), col("vec2"), round2(col("sim"), 4).as("cosine_sim"))
      .orderBy("vec1", "vec2")
  }
}
