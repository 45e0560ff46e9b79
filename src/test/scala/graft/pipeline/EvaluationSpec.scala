package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Reciprocal-rank fusion: hand-computed formula replay and the
  * union/absence semantics. */
class EvaluationSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("rrfFuse == hand formula over two lists with partial overlap") {
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("doc_id", "rank")
    val b = Seq((12L, 1L), (10L, 2L), (13L, 3L)).toDF("doc_id", "rank")
    val got = Evaluation.rrfFuse(Seq(a, b))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def f(r: Long) = 1000000L / (60 + r)
    assert(got == Map(
      10L -> (2L, f(1) + f(2)),
      11L -> (1L, f(2)),
      12L -> (2L, f(3) + f(1)),
      13L -> (1L, f(3))))
  }

  test("rrfFuse single list is a pure rank transform; kConst shifts") {
    val a = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "rank")
    val got = Evaluation.rrfFuse(Seq(a), kConst = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 1000000L, 2L -> 500000L))
    intercept[IllegalArgumentException](Evaluation.rrfFuse(Seq.empty))
    intercept[IllegalArgumentException](Evaluation.rrfFuse(Seq(a), kConst = -1))
  }

  test("rrfFuse order: consensus docs outrank single-list toppers at depth") {
    // doc 5 is rank 3 in BOTH lists; doc 9 is rank 1 in one list only —
    // with k=60, 2/(60+3) > 1/(60+1): agreement wins, the RRF property
    val a = Seq((9L, 1L), (7L, 2L), (5L, 3L)).toDF("doc_id", "rank")
    val b = Seq((8L, 1L), (6L, 2L), (5L, 3L)).toDF("doc_id", "rank")
    val scores = Evaluation.rrfFuse(Seq(a, b))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(5L) > scores(9L))
  }
}
