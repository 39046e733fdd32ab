ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "streamingecomanalyticsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked app's stdout straight through (no `[info] ` prefix)
// and drop sbt's trailing `[success] Total time …` line, so the LAST
// stdout line of `sbt -batch "runMain graft.Bench"` is the bare headline
// JSON — the driver's tail-capture parser needs the literal final line.
outputStrategy := Some(OutputStrategy.StdoutOutput)
showSuccess := false
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 8g default is a MEASURED choice, not a guess (r14, both directions
  // tested): at sf0.1 bench scale a 32g heap's bigger young gen taxes
  // every query ~uniformly (+20 s on the 259-entry suite total), while
  // at graft.Scaling's 30×/90× cells an 8g heap AGES under G1 pressure
  // across ~40+ heavy queries until CPU-bound aggregates turn GC-bound
  // (21 s vs 4 s fresh). So: bench/verify default to 8g; graft.Scaling
  // REQUIRES SPARK_DRIVER_MEM=32g and guards at startup.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ---------------------------------------------------------------------
// PARALLEL FORKED TEST GROUPS (r18; the r17 verdict's #1 "make the suite
// fit the driver's test budget" ask). The ~430-test suite ran ~36 min in
// ONE forked JVM — dominated by a handful of multi-minute fuzz suites —
// and exceeded the driver's test window (VERIFY_r17 tests_ok:false with
// zero failing assertions). Suites are bin-packed by MEASURED wall
// weight (r18 timing run, seconds) into N groups, each its own forked
// JVM with its own Spark session (local[4], so N×4 executor threads) and
// its OWN artifact-store root (-Dgraft.artifacts.dir per group — the
// only cross-JVM shared mutable path; everything else is
// createTempDirectory-unique or read-only testdata). Suites inside a
// group still run sequentially; nothing about any test changes.
// N defaults to min(8, cores/4) so the driver box (32 cores) runs 8
// groups ≈ 32 busy executor threads (measured: the suite is latency-
// not CPU-bound — 6 groups read load ~15 of 32); override with
// GRAFT_TEST_GROUPS=1 to get the old single-JVM behavior.
val testSuiteWeightsSec: Map[String, Int] = Map(
  // measured r18 (full -oD run, calm host); default 15 for new suites
  "graft.DifferentialFuzzEventsSpec" -> 165,
  "graft.DifferentialFuzzDocsSpec" -> 210,
  "graft.DifferentialFuzzPairBoundarySpec" -> 175,
  "graft.DifferentialFuzzRelationalSpec" -> 160,
  "graft.DifferentialFuzzEmbeddingSpec" -> 255,
  "graft.EdgeFrameSweepSpec" -> 190,
  "graft.StreamingTtlTransitionsFuzzSpec" -> 95,
  "graft.StreamingTtlVelocityFuzzSpec" -> 100,
  "graft.StreamingTtlDedupFuzzSpec" -> 160,
  "graft.GraftProperties" -> 200,
  "graft.SimilaritySpec" -> 92,
  "graft.GraphSpec" -> 83,
  "graft.WarehouseSpec" -> 46,
  "graft.DedupSpec" -> 45,
  "graft.StreamingSpec" -> 32,
  "graft.EventQueriesSpec" -> 31,
  "graft.RangeJoinSpec" -> 27,
  "graft.PlanPinSpec" -> 21,
  "graft.TextOpsSpec" -> 21,
  "graft.RetrievalSpec" -> 21,
  "graft.RelationalAndSinksSpec" -> 15,
  "graft.ArtifactStoreSpec" -> 14,
  "graft.StreamingPlanPinSpec" -> 11,
  "graft.TimestampContractSpec" -> 10,
)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val groupCount = sys.env.get("GRAFT_TEST_GROUPS").map(_.toInt).getOrElse {
    math.max(1, math.min(8, java.lang.Runtime.getRuntime
      .availableProcessors / 4))
  }
  // deterministic greedy bin-packing: heaviest first into the lightest bin
  val weighted = tests.map(t =>
    t -> testSuiteWeightsSec.getOrElse(t.name, 15))
    .sortBy { case (t, w) => (-w, t.name) }
  val bins = Array.fill(groupCount)(
    (collection.mutable.ArrayBuffer[sbt.TestDefinition](), Array(0L)))
  weighted.foreach { case (t, w) =>
    val (buf, tot) = bins.minBy(_._2(0))
    buf += t; tot(0) += w
  }
  bins.toSeq.zipWithIndex.filter(_._1._1.nonEmpty).map { case ((buf, _), i) =>
    Tests.Group(
      name = s"g$i",
      tests = buf.toSeq,
      runPolicy = Tests.SubProcess(ForkOptions().withRunJVMOptions(
        opts :+ s"-Dgraft.artifacts.dir=target/graft-artifacts-g$i")))
  }
}
Global / concurrentRestrictions := {
  val cores = java.lang.Runtime.getRuntime.availableProcessors
  Seq(Tags.limitAll(math.max(4, cores)),
    Tags.limit(Tags.ForkedTestGroup,
      sys.env.get("GRAFT_TEST_GROUPS").map(_.toInt).getOrElse(
        math.max(1, math.min(8, cores / 4)))))
}
