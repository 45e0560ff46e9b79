package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE tokenizer core: hand-derived goldens on the fixture table, a
  * differential oracle against an independent naive implementation on
  * random merges/words, concatenation/caching invariants, and the
  * DataFrame surface (expressions + pluggable packBudgeted denominator). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ranks = BpeCore.buildRanks(BpeFixture.merges)
  private def cache = new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  test("fixture goldens: multi-level chains, space merges, unmergeable word") {
    val cases = Seq(
      "the" -> Seq("the"), " the" -> Seq(" the"),
      "join" -> Seq("join"), "scan" -> Seq("scan"), "hash" -> Seq("hash"),
      "batch" -> Seq("batch"), "column" -> Seq("column"), "merge" -> Seq("merge"),
      "order" -> Seq("order"), "small" -> Seq("small"), "slow" -> Seq("slow"),
      "data" -> Seq("data"), "query" -> Seq("query"), "stream" -> Seq("stream"),
      "filter" -> Seq("filter"), "big" -> Seq("big"), "key" -> Seq("key"),
      "agg" -> Seq("agg"), "value" -> Seq("value"), "part" -> Seq("part"),
      "spark" -> Seq("spark"), "group" -> Seq("group"), "fast" -> Seq("fast"),
      "sort" -> Seq("sort"), "window" -> Seq("window"),
      "customer" -> Seq("customer"), "vector" -> Seq("vector"), "line" -> Seq("line"),
      " hash" -> Seq(" hash"), " data" -> Seq(" data"),
      "dup" -> Seq("d", "u", "p"), // intentionally absent from the table
      // partial merges: " that" stalls after (t,h); " tthe" leaves a lone t
      " that" -> Seq(" ", "th", "a", "t"),
      " tthe" -> Seq(" ", "t", "the"),
      " small" -> Seq(" ", "small"), // no (" ","small") merge in the table
      "theory" -> Seq("the", "or", "y")) // (o,r) fires inside the tail
    for ((w, want) <- cases)
      assert(BpeCore.tokenizeWord(w, ranks).toSeq == want, s"word '$w'")
  }

  test("min-rank-present beats left-to-right: rank order decides") {
    // "order": (e,r) rank 24 fires before (o,r) rank 28 even though (o,r)
    // is leftmost — the contract picks the best RANK, then its leftmost
    // occurrence. Verify intermediate behavior via a truncated table.
    val partial = BpeCore.buildRanks(BpeFixture.merges.take(29)) // through ("o","r")
    assert(BpeCore.tokenizeWord("order", partial).toSeq == Seq("or", "d", "er"))
    // leftmost occurrence of the best pair: "tth" has (t,h) once, at idx 1
    assert(BpeCore.tokenizeWord("tth", ranks).toSeq == Seq("t", "th"))
    // repeated pair merges leftmost-first, then re-evaluates
    val aa = BpeCore.buildRanks(Seq(("a", "a")))
    assert(BpeCore.tokenizeWord("aaa", aa).toSeq == Seq("aa", "a"))
    val aa2 = BpeCore.buildRanks(Seq(("a", "a"), ("aa", "a")))
    assert(BpeCore.tokenizeWord("aaa", aa2).toSeq == Seq("aaa"))
  }

  test("differential: random merges/words vs an independent naive replay") {
    // naive reference: purely functional — rebuild the pair list each step,
    // pick min rank via sorted scan of the TABLE (not the word), splice
    // with patch; shares no code with BpeCore
    def naive(word: String, merges: Seq[(String, String)]): Seq[String] = {
      var syms = word.codePoints().toArray
        .map(cp => new String(Character.toChars(cp))).toVector
      var changed = true
      while (changed && syms.length > 1) {
        changed = false
        val hit = merges.zipWithIndex
          .filter { case ((l, r), _) => syms.indices.dropRight(1)
            .exists(i => syms(i) == l && syms(i + 1) == r) }
          .sortBy(_._2).headOption
        hit.foreach { case ((l, r), _) =>
          val i = syms.indices.dropRight(1)
            .find(i => syms(i) == l && syms(i + 1) == r).get
          syms = syms.patch(i, Seq(l + r), 2)
          changed = true
        }
      }
      syms
    }
    val rnd = new scala.util.Random(11)
    // unicode-hard alphabet: ASCII, space-class neighbor, accented (é),
    // combining acute (U+0301), and a non-BMP emoji — the naive reference
    // below iterates codepoints, so agreement pins codepoint symbolization
    val alpha = "abcd" + "é́😀"
    for (trial <- 1 to 200) {
      // random merges over short symbol strings (dedup pairs, keep order)
      val pool = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
      for (_ <- 0 until 1 + rnd.nextInt(12)) {
        def sym() = (0 to rnd.nextInt(2)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        pool += ((sym(), sym()))
      }
      val merges = pool.toSeq
      val rk = BpeCore.buildRanks(merges)
      for (_ <- 1 to 5) {
        val w = (0 until rnd.nextInt(12))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        if (w.nonEmpty)
          assert(BpeCore.tokenizeWord(w, rk).toSeq == naive(w, merges),
            s"trial $trial word '$w' merges $merges")
      }
    }
  }

  test("text-level: pre-token concatenation, count == tokens.length, cache-invariant") {
    val texts = Seq("the small data dup row", " join,scan 42 batches!",
      "  doubled  spaces ", "", "x")
    val rk = ranks
    val c1 = cache
    for (t <- texts) {
      val toks = BpeCore.tokenizeText(t, rk, c1)
      assert(BpeCore.countText(t, rk, c1) == toks.length, s"'$t'")
      assert(toks.mkString == t, s"tokens must concatenate back to the text: '$t'")
      // fresh cache gives identical output (memoization is invisible)
      assert(BpeCore.tokenizeText(t, rk, cache).toSeq == toks.toSeq)
    }
  }

  test("codepoint symbols: non-BMP chars are ONE symbol (SQL-engine parity)") {
    // "a😀b": 4 UTF-16 units but 3 codepoints — a UTF-16 split would give
    // the surrogates as separate symbols and diverge from any SQL engine
    val none = BpeCore.buildRanks(Seq(("x", "y")))
    assert(BpeCore.tokenizeWord("a😀b", none).toSeq ==
      Seq("a", "😀", "b"))
    val withEmoji = BpeCore.buildRanks(Seq(("a", "😀")))
    assert(BpeCore.tokenizeWord("a😀b", withEmoji).toSeq ==
      Seq("a😀", "b"))
  }

  test("byte level: UTF-8 byte symbols, byte merges, emoji partial merge") {
    val branks = BpeCore.buildRanks(BpeFixture.byteTable)
    // 2-byte accent merges to one token whose string is its chr(byte) pair
    assert(BpeCore.tokenizeWordBytes("\u00e9", branks).toSeq == Seq("\u00c3\u00a9"))
    assert(BpeCore.tokenizeWordBytes("\u00e0", branks).toSeq == Seq("\u00c3\u00a0"))
    // 3-byte ellipsis chains both byte merges
    assert(BpeCore.tokenizeWordBytes("\u2026", branks).toSeq ==
      Seq("\u00e2\u0080\u00a6"))
    // 4-byte emoji stops one byte short by fixture design
    assert(BpeCore.tokenizeWordBytes("\uD83D\uDE00", branks).toSeq ==
      Seq("\u00f0\u009f\u0098", "\u0080"))
    // ASCII pre-tokens: byte symbols == codepoint symbols, so byte-level
    // tokenization with the same table is IDENTICAL on pure-ASCII text
    val cache1 = cache; val cache2 = cache
    for (t <- Seq("the quick batch scan", " customer window group",
        "dup dup dup", "a1 b2 #!?", ""))
      assert(BpeCore.tokenizeText(t, branks, cache1, byteLevel = true).toSeq ==
        BpeCore.tokenizeText(t, branks, cache2, byteLevel = false).toSeq, s"'$t'")
    // mixed text: counts add up pre-token-wise (concatenation contract)
    val mixed = " caf\u00e9 d\u00e9j\u00e0 vu\u2026 \uD83D\uDE00ok"
    val toks = BpeCore.tokenizeText(mixed, branks, cache, byteLevel = true)
    assert(toks.length ==
      BpeCore.countText(mixed, branks, cache, byteLevel = true))
    // " caf" -> 4 byte tokens; e-acute 1; " d" -> 2; e-acute/j/a-grave -> 3;
    // " vu" -> 3; ellipsis 1; " (emoji)" -> 3 (partial merge); "ok" -> 2
    assert(toks.length == 4 + 1 + 2 + 1 + 1 + 1 + 3 + 1 + 3 + 2, toks.toSeq)
  }

  test("token ids: codepoint / formed-rank scheme, duplicate-string first-rank") {
    // table where two merges form the same string "abc": first rank wins
    val merges = Seq(("a", "b"), ("ab", "c"), ("b", "c"), ("a", "bc"))
    val ranks = BpeCore.buildRanks(merges)
    val formed = BpeCore.buildFormedIds(merges)
    assert(BpeCore.idOf("a", formed) == 'a'.toLong)
    assert(BpeCore.idOf("😀", formed) == 0x1F600L, "emoji id = codepoint")
    assert(BpeCore.idOf("ab", formed) == 0x110000L + 0)
    assert(BpeCore.idOf("abc", formed) == 0x110000L + 1, "first forming rank wins")
    assert(BpeCore.idOf("bc", formed) == 0x110000L + 2)
    intercept[IllegalArgumentException](BpeCore.idOf("zz", formed))
    // idsText == tokenizeText mapped through idOf, same cache
    val ch = cache
    val txt = "abc ab zq"
    assert(BpeCore.idsText(txt, ranks, formed, ch).toSeq ==
      BpeCore.tokenizeText(txt, ranks, ch).map(BpeCore.idOf(_, formed)).toSeq)
  }

  test("trainer: classic Sennrich example learns es, est, lo, low") {
    val hist = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = BpeTrainer.trainFromHistogram(hist, 4)
    // (e,s)=9 ties (s,t)=9 → lexicographic; then (es,t)=9; then (l,o)=7
    // ties (o,w)=7 → lexicographic; then (lo,w)=7
    assert(merges == Vector(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    // stop-early: no pair reaches minPairCount → table ends
    val tiny = BpeTrainer.trainFromHistogram(Seq(("ab", 1L)), 10)
    assert(tiny.isEmpty, "count-1 pairs are below the default minPairCount")
  }

  test("trainer: over-cap vocabulary truncates to top-maxVocab by count, never throws") {
    import spark.implicits._
    // 30 distinct pre-tokens; cap at 10 → training must proceed on the 10
    // most frequent (count DESC, token ASC), byte-identical to training on
    // that histogram directly — the documented truncation contract
    val docs = (0 until 30).flatMap { i =>
      val tok = f"w${('a' + i % 26).toChar}$i%02d"
      Seq.fill(100 - 3 * i)(tok)
    }.grouped(8).map(_.mkString(" ")).toSeq.toDF("text")
    val capped = graft.pipeline.TextAnalysis.trainBpe(docs, numMerges = 20, maxVocab = 10)
    val full = graft.pipeline.TextAnalysis
      .bpeWordHistogram(docs).collect().map(r => (r.getString(0), r.getLong(1)))
    val top10 = full.sortBy { case (t, n) => (-n, t) }.take(10)
    val expect = BpeTrainer.trainFromHistogram(
      top10.sortBy(_._1).toSeq, 20)
    assert(capped == expect,
      "over-cap train must equal training on the top-maxVocab histogram")
    // at-cap (vocab == maxVocab) is NOT truncation: identical to unbounded
    val atCap = graft.pipeline.TextAnalysis.trainBpe(docs, numMerges = 20, maxVocab = 30)
    val unbounded = graft.pipeline.TextAnalysis.trainBpe(docs, numMerges = 20)
    assert(atCap == unbounded)
  }

  test("trainer: well-formed output, deterministic, consistent with tokenizer") {
    val docs01 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m1 = graft.pipeline.TextAnalysis.trainBpe(docs01, numMerges = 80)
    val m2 = graft.pipeline.TextAnalysis.trainBpe(docs01, numMerges = 80)
    assert(m1 == m2, "training must be a pure function of the corpus")
    // partitioning must not leak into the learned table (histogram counts
    // are exact; tie-breaks are lexicographic, never arrival-order)
    val m3 = graft.pipeline.TextAnalysis.trainBpe(docs01.repartition(7), numMerges = 80)
    assert(m3 == m1, "training must be partition-invariant")
    assert(m1.length == 80, "corpus has plenty of frequent pairs")
    // well-formedness: each side is a single char or an earlier output —
    // the condition under which tokenize == classic merge-all BPE
    val produced = scala.collection.mutable.Set.empty[String]
    m1.foreach { case (l, r) =>
      assert(l.length == 1 || produced.contains(l), s"ill-formed left '$l'")
      assert(r.length == 1 || produced.contains(r), s"ill-formed right '$r'")
      produced += (l + r)
    }
    // the learned table actually compresses the corpus it was trained on
    val st = graft.pipeline.TextAnalysis.bpeState(spark, m1)
    val counts = docs01.select(
        graft.pipeline.TextAnalysis.tokenCountBpe($"text", st).as("bpe"),
        graft.pipeline.TextAnalysis.tokenCountWs($"text").as("ws"),
        length($"text").as("chars"))
      .agg(sum($"bpe"), sum($"ws"), sum($"chars")).head
    val (bpe, ws, chars) = (counts.getLong(0), counts.getLong(1), counts.getLong(2))
    assert(bpe < chars, "BPE must compress below character count")
    assert(bpe <= ws * 3, s"80 merges on a 31-word vocab should near word-level: bpe=$bpe ws=$ws")
  }

  test("expressions: count/tokens columns, null/empty totality, packBudgeted plug") {
    val st = graft.pipeline.TextAnalysis.bpeState(spark, BpeFixture.merges)
    val df = Seq[(java.lang.Long, String)](
      (1L, null), (2L, ""), (3L, "the small data"), (4L, "dup dup"))
      .toDF("doc_id", "text")
    val got = df.select($"doc_id",
        graft.pipeline.TextAnalysis.tokenCountBpe($"text", st).as("n"),
        graft.pipeline.TextAnalysis.tokenizeBpe($"text", st).as("toks"))
      .collect().map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) -1 else r.getInt(1),
        if (r.isNullAt(2)) null else r.getSeq[String](2)))).toMap
    assert(got(1L) == ((-1, null)), "NULL in, NULL out")
    assert(got(2L) == ((0, Seq())))
    assert(got(3L) == ((4, Seq("the", " ", "small", " data"))))
    assert(got(4L) == ((7, Seq("d", "u", "p", " ", "d", "u", "p"))),
      "no merge in the table touches 'dup'")
    // packBudgeted with the BPE denominator: n_tokens column is the BPE
    // count and the pack assignment follows the exclusive cumulative sum
    val docs = Seq((1L, "s", "the small data"), (2L, "s", "dup dup"),
      (3L, "s", "the the the"), (4L, "s", "value")).toDF("doc_id", "source", "text")
    val packed = graft.pipeline.TextAnalysis.packBudgeted(docs,
        budgetTokens = 4L,
        tokenCount = t => graft.pipeline.TextAnalysis.tokenCountBpe(t, st))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    // counts: 4, 7, 3, 1 → exclusive cums 0, 4, 11, 14 → packs 0, 1, 2, 3
    assert(packed.toSeq == Seq((1L, 4L, 0L), (2L, 7L, 1L), (3L, 3L, 2L), (4L, 1L, 3L)))
  }

  test("chunkText: conveyor cut goldens, lossless concat, recount invariant") {
    val ranksM = ranks
    def chunksOf(t: String, max: Long) = BpeCore.chunkText(t, ranksM, cache, max)
    // "the small data" pre-tokens: the(1 tok) / " small"(2: " ","small") /
    // " data"(1: space merge) — exclusive cums 0,1,3 → max=2 chunk ids
    // 0,0,1: cut before " data"
    assert(chunksOf("the small data", 2).toSeq == Seq("the small", " data"))
    // max=1: every pre-token chunks alone (" small" overruns its budget)
    assert(chunksOf("the small data", 1).toSeq == Seq("the", " small", " data"))
    // oversized pre-token: "dup" is 3 tokens (d,u,p) — alone it overruns
    // max=2 in its own chunk; following pre-tokens land in later chunks
    assert(chunksOf("dup the", 2).toSeq == Seq("dup", " the"))
    // whole doc under budget → one chunk
    assert(chunksOf("the small data", 100).toSeq == Seq("the small data"))
    assert(chunksOf("", 4).isEmpty)
    // lossless concat + recount invariant on hard inputs: every chunk
    // re-tokenizes to the original token subsequence, so counts sum
    for (t <- Seq("the small data stream filter join", "dup dup dup dup",
      "a😀b 😀😀 café …", "  leading  spaces", "tabs\tand\nnewlines\n",
      "digits 123 mix3d !?# the query")) {
      for (max <- Seq(1L, 2L, 3L, 7L)) {
        val cs = chunksOf(t, max)
        assert(cs.mkString == t, s"concat '$t' max=$max")
        val whole = BpeCore.countText(t, ranksM, cache)
        val parts = cs.map(c => BpeCore.countText(c, ranksM, cache)).sum
        assert(parts == whole, s"recount '$t' max=$max: $parts != $whole")
        // token sequences concatenate too (stronger than counts)
        val seqWhole = BpeCore.tokenizeText(t, ranksM, cache).toSeq
        val seqParts = cs.flatMap(c => BpeCore.tokenizeText(c, ranksM, cache)).toSeq
        assert(seqParts == seqWhole, s"token seq '$t' max=$max")
      }
    }
    // DataFrame surface: positional idx, per-chunk counts, totality
    val st = graft.pipeline.TextAnalysis.bpeState(spark, BpeFixture.merges)
    val df = Seq[(java.lang.Long, String)](
      (1L, "the small data"), (2L, ""), (3L, null)).toDF("doc_id", "text")
    val got = graft.pipeline.TextAnalysis.chunkByTokens(df, st, 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 0L, "the small", 3L), (1L, 1L, " data", 1L)),
      "empty and NULL docs produce no chunk rows")
  }

  test("buildExamples: independent order+cut replica, invariance, totality") {
    val st = graft.pipeline.TextAnalysis.bpeState(spark, BpeFixture.merges)
    val docsF = Seq[(java.lang.Long, String)](
      (1L, "the small data"), (2L, ""), (3L, null), (4L, "dup dup"),
      (5L, "value table part the the"), (6L, "a b c d e f g h"),
      (7L, "the query stream")).toDF("doc_id", "text")
    val seqLen = 5; val eos = 999999L
    val got = graft.pipeline.TextAnalysis.buildExamples(docsF, st, seqLen, eos)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // replica: per-doc ids from the (separately golden-pinned) id encoder;
    // the ORDER and the CUT are recomputed from first principles
    val perDoc: Map[Long, Seq[Long]] = docsF.select($"doc_id",
        graft.pipeline.TextAnalysis.tokenIdsBpe($"text", st)).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) Seq.empty[Long] else r.getSeq[Long](1).toSeq)).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ordered = perDoc.keys.toSeq.sortBy(id => (md5hex(id.toString), id))
    val stream = ordered.flatMap(id => perDoc(id) :+ eos)
    val want = stream.grouped(seqLen).zipWithIndex
      .filter(_._1.length == seqLen)
      .map { case (ids, i) => i.toLong -> md5hex(ids.mkString(",")) }.toMap
    assert(got == want, s"got $got want $want")
    // exactly total div seqLen full examples; empty/null docs contribute
    // their EOS token only
    assert(got.size == stream.length / seqLen)
    // partition-invariant (the order is a pure function of row identity)
    val again = graft.pipeline.TextAnalysis.buildExamples(
        docsF.repartition(7), st, seqLen, eos)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == got)
  }

  test("detokenize: golden id decode, lossless round trip, foreign-id failure") {
    // golden: codepoint ids decode to their chars, formed ids to lhs++rhs
    val m = BpeFixture.merges
    assert(BpeCore.tokenOfId('x'.toLong, m) == "x")
    assert(BpeCore.tokenOfId(0x110000L + 1, m) == "the") // rank 1 = (th,e)
    assert(BpeCore.tokenOfId(0x1F600L, m) == "😀") // non-BMP codepoint
    assert(BpeCore.decodeIds(Array(0x110000L + 2, ' '.toLong, 'x'.toLong), m) == " the x") // rank 2 = (" ",the)
    // round trip on hard inputs: unicode, emoji (surrogate pairs), mixed
    val ranksM = ranks
    val formed = BpeCore.buildFormedIds(m)
    for (t <- Seq("", "the small data", "dup dup dup", "café … ok",
      "a😀b 😀😀", "  leading  spaces",
      "tabs\tand\nnewlines\n", "digits 123 mix3d !?#")) {
      val ids = BpeCore.idsText(t, ranksM, formed, cache)
      assert(BpeCore.decodeIds(ids, m) == t, s"round trip '$t'")
    }
    // byte-level round trip: bytes accumulate, UTF-8 decodes once at the end
    val bt = BpeFixture.byteTable
    val branks = BpeCore.buildRanks(bt)
    val bformed = BpeCore.buildFormedIds(bt)
    for (t <- Seq("café déjà vu…", "😀ok", "plain ascii")) {
      val ids = BpeCore.idsText(t, branks, bformed, cache, byteLevel = true)
      assert(BpeCore.decodeIds(ids, bt, byteLevel = true) == t, s"byte round trip '$t'")
    }
    // foreign id (beyond codepoints and this table's ranks) fails loudly
    intercept[IllegalArgumentException] {
      BpeCore.tokenOfId(0x110000L + m.length, m)
    }
    // DataFrame surface: expression round trip + NULL totality
    val st = graft.pipeline.TextAnalysis.bpeState(spark, m)
    val df = Seq[(java.lang.Long, String)](
      (1L, null), (2L, ""), (3L, "the small data"), (4L, "café 😀"))
      .toDF("doc_id", "text")
    val got = df.select($"doc_id", graft.pipeline.TextAnalysis.detokenizeBpe(
        graft.pipeline.TextAnalysis.tokenIdsBpe($"text", st), st).as("back"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) == null, "NULL in, NULL out")
    assert(got(2L) == "")
    assert(got(3L) == "the small data")
    assert(got(4L) == "café 😀")
  }
}
