package graft.api

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def messages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))

  private val facts = Seq((1L, 5.0), (2L, 12.0), (3L, 999.0)).toDF("fid", "v")

  test("lookup matches values to covering intervals") {
    val iv = Seq(("a", 0.0, 10.0), ("b", 10.0, 20.0)).toDF("tag", "lo", "hi")
    val got = IntervalJoin.lookup(facts, "v", iv, bucketWidth = 10.0)
      .select($"fid", $"tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b")))
  }

  test("corrupt interval lo > hi fails with a named error, not a silent drop") {
    val iv = Seq(("bad", 10.0, 0.0)).toDF("tag", "lo", "hi")
    val e = intercept[Exception] {
      IntervalJoin.lookup(facts, "v", iv, bucketWidth = 10.0).collect()
    }
    assert(messages(e).exists(m => m != null && m.contains("lo > hi")),
      s"expected named lo>hi error, got: $e")
  }

  test("mega-span interval fails fast before exploding the broadcast") {
    val iv = Seq(("huge", 0.0, 1e12)).toDF("tag", "lo", "hi")
    val e = intercept[Exception] {
      IntervalJoin.lookup(facts, "v", iv, bucketWidth = 1.0,
        maxBucketsPerInterval = 1000L).collect()
    }
    assert(messages(e).exists(m => m != null && m.contains("spans more than")),
      s"expected span-guard error, got: $e")
  }

  test("lookup == brute-force nested loop across seeds and bucket widths") {
    // collision-rich randomized differential: negative values, touching
    // bounds (hi of one == lo of next, half-open semantics), overlapping
    // intervals, values exactly on bucket and interval boundaries
    for (seed <- Seq(11, 22, 33); width <- Seq(0.7, 10.0, 1000.0)) {
      val rnd = new scala.util.Random(seed)
      val facts = (0 until 200).map(i =>
        (i.toLong, (rnd.nextInt(400) - 200) / 2.0)) // halves hit boundaries
      val ivs = (0 until 40).map { i =>
        val lo = (rnd.nextInt(380) - 190) / 2.0
        (i.toLong, lo, lo + rnd.nextInt(40) / 2.0)
      }
      val want = (for {
        (fid, v) <- facts
        (tid, lo, hi) <- ivs
        if v >= lo && v < hi
      } yield (fid, tid)).toSet
      val got = IntervalJoin.lookup(
          facts.toDF("fid", "v"), "v", ivs.toDF("tid", "lo", "hi"),
          bucketWidth = width)
        .select($"fid", $"tid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want,
        s"seed=$seed width=$width missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("broadcastIntervals=false produces identical rows (shuffle escape hatch)") {
    val iv = Seq(("a", 0.0, 10.0), ("b", 10.0, 20.0), ("wide", 5.0, 15.0))
      .toDF("tag", "lo", "hi")
    def rows(bcast: Boolean) =
      IntervalJoin.lookup(facts, "v", iv, bucketWidth = 10.0,
        broadcastIntervals = bcast)
        .select($"fid", $"tag").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows(bcast = true) == rows(bcast = false))
    assert(rows(bcast = true) == Set((1L, "a"), (1L, "wide"), (2L, "b"), (2L, "wide")))
  }
}
