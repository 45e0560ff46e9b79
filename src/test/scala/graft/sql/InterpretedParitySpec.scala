package graft.sql

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/**
 * Codegen/interpreted parity: every custom expression has two execution
 * paths — doGenCode (what whole-stage codegen runs, and what every DuckDB
 * oracle therefore validates) and eval (what runs under codegen fallback
 * or NO_CODEGEN). A divergence is silent wrongness on whichever path the
 * gates don't exercise, so run expression-heavy gate queries in both
 * modes and require identical row sets.
 */
class InterpretedParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val sf = "/root/testdata/sf0.001"
  // scan-shaped gate queries that together cover the geohash, spatial,
  // minhash/simhash, lang-id, BPE, classifier, and vector expressions
  private val queryNames = Seq("q_geohash_keys", "q_within_collection",
    "q_lang_id", "q_text_tokens_bpe", "q_quality_classifier",
    "q_embed_topk", "q_dedup_minhash", "q_dedup_simhash",
    "q_embed_topk_sq8", "q_embed_pq_topk", "q_chunk", "q_boilerplate",
    "q_dedup_spans", "q_text_tokens")

  private def rows(name: String): Set[String] =
    graft.SparkEntry.queries(name)(spark, sf)
      .collect().map(_.mkString("")).toSet

  test("gate queries agree between codegen and interpreted expression modes") {
    val names = queryNames.filter(graft.SparkEntry.queries.contains)
    assert(names.size >= 5, s"too few parity queries resolve: $names")
    val codegen = names.map(n => n -> rows(n)).toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      names.foreach { n =>
        val interpreted = rows(n)
        assert(interpreted == codegen(n),
          s"$n diverges between interpreted and codegen: " +
            s"only-interpreted=${(interpreted -- codegen(n)).take(3)} " +
            s"only-codegen=${(codegen(n) -- interpreted).take(3)}")
      }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
