package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run and return rows at sf0.001, and every
  * oracle key must have a matching query (driver contract). */
class QueriesSmokeSpec extends AnyFunSuite with SparkTestBase {

  test("oracleSql keys are a subset of queries keys") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle without query: $dangling")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // A duplicate key WITHIN one pack's Map literal silently shadows the
  // earlier query AND its oracle — invisible at runtime (the literal
  // dedupes before SparkEntry's cross-pack guard sees it). Catch it at
  // the source level: a query name may appear at most twice per file
  // (once in `queries`, once in `oracleSql`).
  test("no duplicate query keys within any QueryPack source") {
    val packDir = new java.io.File("src/main/scala/graft/queries")
    val key = """"([a-z0-9_]+)"\s*->""".r
    for (f <- packDir.listFiles().toSeq if f.getName.endsWith(".scala")) {
      // decode via String ctor (lenient): sources contain a few non-ASCII
      // scaladoc glyphs that trip Source.fromFile under the JVM default cs
      val src = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      val counts = key.findAllMatchIn(src).map(_.group(1)).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      val dups = counts.filter(_._2 > 2)
      assert(dups.isEmpty, s"${f.getName}: keys registered twice: ${dups.keys.toSeq.sorted}")
    }
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001 with rows > 0, no CartesianProduct") {
      val df = fn(spark, sf0_001)
      // scale guard: a non-broadcast cross join (CartesianProduct) in any
      // registered plan is an unbounded pairwise blowup waiting for real
      // data — the 1-row-dim cross joins used throughout plan as
      // BroadcastNestedLoopJoin and are fine. (The fenced _bruteforce
      // baseline is broadcast too at this scale; its guard is the fence.)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      assert(df.count() > 0)
    }
  }
}
