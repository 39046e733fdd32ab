package graft

import graft.sink.ArtifactStore

/** Cross-sfDir behavior of the [[SparkEntry]] surface itself — the pieces
  * the per-query specs can't see because they pin one dataset at a time. */
class SparkEntrySpec extends SparkSpec {

  test("q_bpe_tokens generated oracle re-keys to the sfDir most recently " +
      "verified, across several sfDirs in one JVM") {
    val dirA = sf("sf0.001")
    val dirB = sf("sf0.01")
    def mirror(): String = SparkEntry.oracleSql("q_bpe_tokens")

    SparkEntry.queries("q_bpe_tokens")(spark, dirA).collect()
    val sqlA = mirror()
    SparkEntry.queries("q_bpe_tokens")(spark, dirB).collect()
    val sqlB = mirror()
    // back to dirA: the mirror must re-key, not stick to the latest TrieMap
    // entry (Verify dumps oracle_sql.json AFTER the last query evaluation,
    // so whichever dir it verified last is the one the mirror must embed)
    SparkEntry.queries("q_bpe_tokens")(spark, dirA).collect()
    assert(mirror() == sqlA, "mirror did not re-key back to the first dir")

    // dirB's mirror embeds dirB's OWN trained merges: rebuild the first
    // replace() literal independently from the persisted artifact (by-name
    // thunk throws — training already happened above, loads must be free)
    def merges(dir: String): Seq[(String, String)] =
      ArtifactStore.bpeMerges(spark, dir, "bpe-n50-m2-v65536")(
        fail(s"merges for $dir must already be persisted"): Nothing)
    val (mA, mB) = (merges(dirA), merges(dirB))
    val S = "\u001f"
    def firstPattern(ms: Seq[(String, String)]): String = {
      val (a, b) = ms.head
      ("'" + (S + a + S + S + b + S).replace("'", "''") + "'")
    }
    assert(sqlB.contains(firstPattern(mB)),
      "dirB mirror is missing dirB's first merge pattern")
    assert(sqlA.contains(firstPattern(mA)),
      "dirA mirror is missing dirA's first merge pattern")
    if (mA != mB) assert(sqlA != sqlB,
      "different merge lists must render different mirrors")
  }
}
