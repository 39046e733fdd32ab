package graft.sink

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Durable store for TRAINED ARTIFACTS (IVF centroids, PQ codebooks,
  * unigram vocabularies, BPE merge lists): small, bounded, deterministic
  * outputs of an expensive corpus pass, persisted as parquet under a
  * dataset-keyed path so a FRESH session serves them with zero training
  * jobs — the [[Sinks.writeDailySketches]] discipline applied to model
  * artifacts. In-memory TrieMap caches (SparkEntry) die with the JVM; this
  * is the layer below them: L1 = process cache, L2 = this store, train only
  * on a cold miss of both.
  *
  * Every artifact is keyed by `(datasetDir, name)` where `name` should
  * encode the training hyperparameters (e.g. `ivf-c16-s42`), so a
  * parameter change is a new artifact rather than a silent stale read.
  * Writes go to a temp dir and move into place atomically; if a concurrent
  * trainer won the race, its (deterministic, seed-fixed — identical)
  * artifact is kept and ours discarded.
  *
  * At 100 TB these artifacts stay kilobytes-to-megabytes (vocab-capped,
  * cell/codebook-bounded) — the whole point is that serving a corpus-sized
  * query never re-runs the driver-coordinated iterative fit.
  */
object ArtifactStore {
  /** Artifact root: override with -Dgraft.artifacts.dir=… or
    * GRAFT_ARTIFACTS_DIR; defaults under the build dir. */
  def root: String = sys.props.get("graft.artifacts.dir")
    .orElse(sys.env.get("GRAFT_ARTIFACTS_DIR"))
    .getOrElse("target/graft-artifacts")

  /** One directory per (dataset path, dataset inventory, artifact): a
    * readable slug, an md5 of the path, and a fingerprint of the dataset
    * directory's file INVENTORY (names, sizes, millisecond mtimes).
    * Regenerating the data at the same path changes the key, so the next
    * load MISSES and retrains instead of silently serving artifacts
    * trained on the old data (spec-pinned). The fingerprint is a
    * heuristic, not a content hash (hashing the dataset would cost a full
    * corpus read): a regeneration that pins mtimes AND byte sizes (e.g.
    * tar --preserve, reproducible-build outputs) is invisible to it —
    * encode a data version in `name` when that matters. */
  private def dirFor(datasetDir: String, name: String): String =
    s"${datasetScope(datasetDir)}/$name-${contentFingerprint(datasetDir)}"

  /** Per-dataset parent dir (fingerprint-independent). */
  private def datasetScope(datasetDir: String): String = {
    val slug = datasetDir.replaceAll("[^A-Za-z0-9.]+", "_")
      .replaceAll("^_+", "").takeRight(40)
    s"$root/$slug-${graft.Fs.md5Hex8(datasetDir)}"
  }

  /** Fingerprint of the dataset dir's top-level file inventory. */
  private def contentFingerprint(datasetDir: String): String = {
    val dir = Paths.get(datasetDir)
    if (!Files.isDirectory(dir)) return "nodata"
    import scala.jdk.CollectionConverters._
    val ls = Files.list(dir)
    val inventory =
      try ls.iterator().asScala.toList
        .map(p => (p.getFileName.toString, p))
        .sortBy(_._1)
        .map { case (n, p) =>
          s"$n:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}" }
      finally ls.close()
    graft.Fs.md5Hex8(inventory.mkString("|"))
  }

  /** Superseded-fingerprint GC: before a fresh `name-<fp>` goes live, drop
    * sibling `name-<otherFp>` dirs — artifacts for dataset states that no
    * longer exist would otherwise accumulate across regenerations. */
  private def pruneSuperseded(path: String): Unit = {
    val target = Paths.get(path)
    val name = target.getFileName.toString
    val prefix = name.substring(0, name.lastIndexOf('-') + 1)
    val parent = target.getParent
    if (Files.isDirectory(parent)) {
      import scala.jdk.CollectionConverters._
      val ls = Files.list(parent)
      val stale =
        try ls.iterator().asScala.toList.filter { p =>
          val n = p.getFileName.toString
          // only a sibling whose suffix IS a fingerprint: an artifact
          // named "<name>-v2" must not match "<name>"'s prefix
          n.startsWith(prefix) && n != name && {
            val rest = n.substring(prefix.length)
            rest == "nodata" || rest.matches("[0-9a-f]{8}")
          }
        } finally ls.close()
      stale.foreach(graft.Fs.deleteQuietly)
    }
  }

  private def exists(path: String): Boolean =
    Files.exists(Paths.get(path))

  /** Write `rows` as a single-file parquet artifact, atomically: tmp dir →
    * ATOMIC_MOVE into place; a racing winner is left untouched. */
  private def writeAtomic(spark: SparkSession, path: String,
      schema: StructType, rows: Seq[Row]): Unit = {
    val target = Paths.get(path)
    Files.createDirectories(target.getParent)
    val tmp = Paths.get(path + ".tmp-" + java.util.UUID.randomUUID())
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    try {
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      pruneSuperseded(path)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: java.nio.file.DirectoryNotEmptyException =>
        // a concurrent (deterministic) trainer won; keep theirs
        graft.Fs.deleteRecursively(tmp)
    }
  }

  // ---- IVF centroids: rows (i, vec array<float>) ----

  private val CentroidSchema = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("vec", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** Load the centroids for `(datasetDir, name)`, or run `train` (by-name:
    * NOT evaluated on a store hit — the spec's zero-training proof) and
    * persist its result. */
  def ivfCentroids(spark: SparkSession, datasetDir: String, name: String)(
      train: => Array[Array[Float]]): Array[Array[Float]] = {
    val path = dirFor(datasetDir, name)
    if (exists(path)) {
      spark.read.parquet(path).orderBy("i").collect()
        .map(_.getSeq[Float](1).toArray)
    } else {
      val cs = train
      writeAtomic(spark, path, CentroidSchema,
        cs.zipWithIndex.map { case (v, i) => Row(i, v.toIndexedSeq) }.toSeq)
      cs
    }
  }

  // ---- PQ codebooks: rows (j, c, vec array<float>) ----

  private val CodebookSchema = StructType(Seq(
    StructField("j", IntegerType, nullable = false),
    StructField("c", IntegerType, nullable = false),
    StructField("vec", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  def pqCodebooks(spark: SparkSession, datasetDir: String, name: String)(
      train: => Array[Array[Array[Float]]]): Array[Array[Array[Float]]] = {
    val path = dirFor(datasetDir, name)
    if (exists(path)) {
      spark.read.parquet(path).orderBy("j", "c").collect()
        .map(r => (r.getInt(0), r.getSeq[Float](2).toArray))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map(_._2.map(_._2)).toArray
    } else {
      val cb = train
      writeAtomic(spark, path, CodebookSchema, (for {
        j <- cb.indices; c <- cb(j).indices
      } yield Row(j, c, cb(j)(c).toIndexedSeq)).toSeq)
      cb
    }
  }

  // ---- unigram vocab: rows (rank, tok, cnt) — rank preserves the
  //      count-desc/token-asc training order the scorer assumes ----

  private val VocabSchema = StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("tok", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  def unigramVocab(spark: SparkSession, datasetDir: String, name: String)(
      train: => (Array[String], Array[Long])): (Array[String], Array[Long]) = {
    val path = dirFor(datasetDir, name)
    if (exists(path)) {
      val rows = spark.read.parquet(path).orderBy("rank").collect()
      (rows.map(_.getString(1)), rows.map(_.getLong(2)))
    } else {
      val (toks, cnts) = train
      writeAtomic(spark, path, VocabSchema,
        toks.indices.map(i => Row(i, toks(i), cnts(i))).toSeq)
      (toks, cnts)
    }
  }

  // ---- BPE merges: rows (i, a, b) — order is the merge priority ----

  private val MergeSchema = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("a", StringType, nullable = false),
    StructField("b", StringType, nullable = false)))

  def bpeMerges(spark: SparkSession, datasetDir: String, name: String)(
      train: => Seq[(String, String)]): Seq[(String, String)] = {
    val path = dirFor(datasetDir, name)
    if (exists(path)) {
      spark.read.parquet(path).orderBy("i").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
    } else {
      val ms = train
      writeAtomic(spark, path, MergeSchema,
        ms.zipWithIndex.map { case ((a, b), i) => Row(i, a, b) })
      ms
    }
  }
}
