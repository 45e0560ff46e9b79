package graft.tools

/**
 * Cross-engine BPE contract harness (Scala side): reads a case file and
 * prints each text's token sequence so `tools/check_bpe_contract.py` can
 * diff it against the DuckDB recursive-CTE replay of the same merges
 * table — the property-level version of the q_text_tokens_bpe gate.
 *
 * Input format (no JSON dependency): line 1 = M (merge count); M lines of
 * "left<TAB>right"; remaining lines are texts (newline/tab-free by
 * construction on the generator side). Output: one line per text, tokens
 * joined by U+001E.
 */
object DumpBpe {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: DumpBpe <caseFile>")
    val lines = scala.io.Source.fromFile(args(0), "UTF-8").getLines().toVector
    val m = lines.head.trim.toInt
    val merges = lines.slice(1, 1 + m).map { l =>
      val t = l.split("\t", -1); require(t.length == 2, s"bad merge line '$l'")
      (t(0), t(1))
    }
    val ranks = graft.text.BpeCore.buildRanks(merges)
    val cache = new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    val out = new java.io.PrintStream(System.out, true, "UTF-8")
    lines.drop(1 + m).foreach { text =>
      out.println(graft.text.BpeCore.tokenizeText(text, ranks, cache).mkString("\u001E"))
    }
  }
}
