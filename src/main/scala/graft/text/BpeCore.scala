package graft.text

/**
 * Byte-pair-encoding tokenizer core — REAL merges-table token counting for
 * training-data budgets (packing, chunk sizing, mixture token shares),
 * replacing regex estimates with the tokenizer arithmetic production
 * pipelines budget in. Public algorithm: Sennrich et al., "Neural Machine
 * Translation of Rare Words with Subword Units" (ACL 2016) and the openly
 * published GPT-2 encoder (char-level variant here).
 *
 * DETERMINISTIC CROSS-ENGINE CONTRACT (what the DuckDB oracle replays):
 *
 *  1. Pre-tokenize with [[pretokenRegex]]. The alternation's branches are
 *     first-meaningful-char disjoint (letters / digits / other-non-space,
 *     each with one optional leading space, then lone whitespace), so
 *     leftmost-first (Java) and leftmost-longest (POSIX RE2) semantics
 *     agree — the same engine-agnosticism discipline as [[graft.pipeline.Pii]].
 *     No lookaround (RE2 has none), unlike GPT-2's original pattern.
 *  2. Per pre-token, start from single characters and repeat: among
 *     adjacent symbol pairs present in the merges table, take the one with
 *     the MINIMUM rank and merge its LEFTMOST occurrence; stop when no
 *     adjacent pair is in the table.
 *
 * Step 2 merges ONE occurrence per iteration — replayable as a recursive
 * CTE in any SQL engine (one recursion row per merge; the driver's oracle
 * does exactly that with unit-separator-delimited symbol strings). For
 * well-formed merges tables — each merge's constituents are single chars
 * or outputs of EARLIER ranks, which is how BPE training emits them — a
 * later merge can never resurrect an earlier-rank pair, so this coincides
 * with the classic merge-all-occurrences loop.
 *
 * Token count = number of surviving symbols; counting needs no vocab-id
 * mapping, so none is required (symbols not in any vocab count as
 * themselves, byte-fallback style).
 */
object BpeCore {
  /** See contract point 1. Kept Java/RE2-identical: no lookaround, no
    * escape classes that differ (`\s` here is the literal ASCII class via
    * the regex's own semantics on both engines for the chars this corpus
    * can contain). */
  val pretokenRegex: String = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s"

  private val pretokenPattern = java.util.regex.Pattern.compile(pretokenRegex)

  private final val Sep = '\u0000' // rank-map key separator; banned in merges

  /** Rank lookup keyed `lhs NUL rhs`. Merge symbols must be non-empty and
    * NUL-free (so keys are unambiguous); ranks are the sequence order. */
  def buildRanks(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      require(l.nonEmpty && r.nonEmpty && l.indexOf(Sep) < 0 && r.indexOf(Sep) < 0,
        s"merge symbols must be non-empty and NUL-free: rank $i")
      val prev = m.put(l + Sep + r, Integer.valueOf(i))
      require(prev == null, s"duplicate merge pair ('$l', '$r')")
    }
    m
  }

  /** The contract-point-2 loop over an initial symbol sequence: repeat
    * {min-rank adjacent pair present → merge its leftmost occurrence}. */
  private def mergeLoop(syms: scala.collection.mutable.ArrayBuffer[String],
                        ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + Sep + syms(i + 1))
        // strict < keeps the FIRST index at the minimum rank = leftmost
        // occurrence of the best pair (ranks are distinct per pair)
        if (r != null && r.intValue < bestRank) { bestRank = r.intValue; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        syms(bestIdx) = syms(bestIdx) + syms(bestIdx + 1)
        syms.remove(bestIdx + 1)
      }
    }
    syms.toArray
  }

  /** Apply the merge loop (contract point 2) to one pre-token. Initial
    * symbols are CODEPOINTS, not UTF-16 units — SQL engines split strings
    * by codepoint, so surrogate-pair characters (emoji) must start as one
    * symbol here too or the cross-engine contract silently diverges. */
  def tokenizeWord(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    if (word.length <= 1) return Array(word)
    val cps = word.codePoints().toArray
    if (cps.length == 1) return Array(word)
    mergeLoop(scala.collection.mutable.ArrayBuffer.tabulate(cps.length)(i =>
      new String(Character.toChars(cps(i)))), ranks)
  }

  /**
   * BYTE-LEVEL initial symbols (the GPT-2 byte-level variant): one
   * single-char string per UTF-8 byte of the pre-token, char = the byte
   * value itself (U+0000..U+00FF) — the rendering a SQL oracle reproduces
   * with `chr(byte)` arithmetic on codepoints, no blob machinery needed.
   * ASCII pre-tokens decompose identically to their codepoint symbols, so
   * with the same merges table byte-level and char-level tokenization
   * coincide on pure-ASCII text (pinned by test).
   */
  def byteSymbols(word: String): Array[String] = {
    val bs = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Array.tabulate(bs.length)(i => String.valueOf((bs(i) & 0xff).toChar))
  }

  /** Byte-level [[tokenizeWord]]: same merge loop over [[byteSymbols]]. */
  def tokenizeWordBytes(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    val syms = byteSymbols(word)
    if (syms.length <= 1) syms
    else mergeLoop(scala.collection.mutable.ArrayBuffer.from(syms), ranks)
  }

  // Word→tokens caches grow to the pre-token vocabulary, which natural
  // text keeps small; the cap bounds adversarial corpora (cache cleared,
  // correctness unaffected — only the memoization resets).
  private final val CacheCap = 1 << 16

  private def cachedWord(w: String, ranks: java.util.HashMap[String, Integer],
                         cache: java.util.concurrent.ConcurrentHashMap[String, Array[String]],
                         byteLevel: Boolean = false): Array[String] = {
    var toks = cache.get(w)
    if (toks == null) {
      toks = if (byteLevel) tokenizeWordBytes(w, ranks) else tokenizeWord(w, ranks)
      if (cache.size >= CacheCap) cache.clear()
      cache.put(w, toks)
    }
    toks
  }

  /** All tokens of `text` in order (pre-tokens concatenated). */
  def tokenizeText(text: String, ranks: java.util.HashMap[String, Integer],
                   cache: java.util.concurrent.ConcurrentHashMap[String, Array[String]],
                   byteLevel: Boolean = false): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = pretokenPattern.matcher(text)
    while (m.find()) out ++= cachedWord(m.group(), ranks, cache, byteLevel)
    out.toArray
  }

  /** Token count of `text` — same loop, no output materialization. */
  def countText(text: String, ranks: java.util.HashMap[String, Integer],
                cache: java.util.concurrent.ConcurrentHashMap[String, Array[String]],
                byteLevel: Boolean = false): Int = {
    var n = 0
    val m = pretokenPattern.matcher(text)
    while (m.find()) n += cachedWord(m.group(), ranks, cache, byteLevel).length
    n
  }

  /**
   * Vocab-id map for merge OUTPUTS — the id space trainers consume:
   * single-codepoint tokens use the codepoint itself (0..0x10FFFF);
   * merge-formed tokens get 0x110000 + the FIRST rank whose lhs ++ rhs
   * equals the token (several merges can form the same string; first-rank
   * is the deterministic choice, `min(rank)` on the SQL side). The two
   * ranges never collide, so ids are unique per distinct token string.
   */
  def buildFormedIds(merges: Seq[(String, String)]): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.putIfAbsent(l + r, java.lang.Long.valueOf(0x110000L + i))
    }
    m
  }

  /** Id of one token under [[buildFormedIds]]' scheme. Multi-codepoint
    * tokens are always merge outputs (only merges concatenate symbols),
    * so a miss means the token came from a foreign tokenizer — fail. */
  def idOf(token: String, formed: java.util.HashMap[String, java.lang.Long]): Long =
    if (token.codePointCount(0, token.length) == 1) token.codePointAt(0).toLong
    else {
      val v = formed.get(token)
      require(v != null, s"token '$token' was not formed by any merge in this table")
      v.longValue
    }

  /** Token ids of `text` in order — [[tokenizeText]] mapped through
    * [[idOf]], sharing the same word cache. */
  def idsText(text: String, ranks: java.util.HashMap[String, Integer],
              formed: java.util.HashMap[String, java.lang.Long],
              cache: java.util.concurrent.ConcurrentHashMap[String, Array[String]],
              byteLevel: Boolean = false): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val m = pretokenPattern.matcher(text)
    while (m.find()) {
      val toks = cachedWord(m.group(), ranks, cache, byteLevel)
      var i = 0
      while (i < toks.length) { out += idOf(toks(i), formed); i += 1 }
    }
    out.toArray
  }

  /**
   * Chunk `text` into consecutive pieces of ~`maxTokens` BPE tokens,
   * cutting ONLY at pre-token boundaries — the training-window slicer
   * denominated in real tokenizer tokens. The cut rule is the conveyor
   * contract shared with the packing/budget operators: a pre-token with
   * exclusive running token sum c belongs to chunk c div maxTokens, so the
   * assignment is a pure function of (pre-token order, counts) and replays
   * as one window cumsum in any SQL engine. A chunk can overrun by at most
   * one pre-token's tail (pre-tokens are atomic — a pathological
   * million-char word lands alone in its own oversized chunk rather than
   * splitting mid-merge). Chunks concatenate back to exactly `text`, and
   * because every chunk starts at an original pre-token boundary, its
   * re-tokenization equals the original token subsequence (pinned by
   * test) — chunk token counts sum to the document's count.
   */
  def chunkText(text: String, ranks: java.util.HashMap[String, Integer],
                cache: java.util.concurrent.ConcurrentHashMap[String, Array[String]],
                maxTokens: Long, byteLevel: Boolean = false): Array[String] = {
    require(maxTokens > 0, "maxTokens must be positive")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var cum = 0L
    var curId = 0L
    val m = pretokenPattern.matcher(text)
    while (m.find()) {
      val w = m.group()
      val id = cum / maxTokens
      if (id != curId && sb.length > 0) {
        out += sb.toString; sb.setLength(0); curId = id
      }
      sb.append(w)
      cum += cachedWord(w, ranks, cache, byteLevel).length
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  /** The token STRING an id denotes under [[buildFormedIds]]' scheme —
    * the exact inverse of [[idOf]]: ids below 0x110000 are codepoints,
    * 0x110000 + rank is the string `merges(rank)` forms. Fails on ids
    * outside both ranges (a foreign tokenizer's id space). */
  def tokenOfId(id: Long, merges: IndexedSeq[(String, String)]): String =
    if (id >= 0 && id < 0x110000L) new String(Character.toChars(id.toInt))
    else {
      val rank = id - 0x110000L
      require(rank >= 0 && rank < merges.length,
        s"id $id is outside this table's id space (merges: ${merges.length})")
      val (l, r) = merges(rank.toInt)
      l + r
    }

  /**
   * Decode an id sequence back to text — the inverse of [[idsText]].
   * Because the pre-token regex partitions every input (each char falls in
   * exactly one alternation branch) and tokens concatenate to their
   * pre-token, decode(encode(text)) == text for ANY text: the lossless
   * round trip trainers rely on when they detokenize model samples.
   * Char-level ids append their token strings directly; BYTE-level ids
   * (tokens whose chars are UTF-8 byte renderings, see [[byteSymbols]])
   * accumulate bytes and decode UTF-8 once at the end.
   */
  def decodeIds(ids: Array[Long], merges: IndexedSeq[(String, String)],
                byteLevel: Boolean = false): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < ids.length) { sb.append(tokenOfId(ids(i), merges)); i += 1 }
    if (!byteLevel) sb.toString
    else {
      val s = sb.toString
      val bytes = new Array[Byte](s.length)
      var j = 0
      while (j < s.length) {
        val c = s.charAt(j)
        require(c < 256, s"byte-level token char U+${c.toInt.toHexString} is not a byte")
        bytes(j) = c.toByte
        j += 1
      }
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    }
  }
}

/**
 * Deterministic fixture merges table for the engine's gate query
 * (`q_text_tokens_bpe`): multi-level merge chains over the synthetic
 * corpus vocabulary, including space-prefixed merges and words left
 * intentionally unmergeable ("dup" → d,u,p). Rank = position. The driver's
 * DuckDB oracle re-derives tokenization from [[sqlValues]] — the SAME
 * table — so the gate checks the merge loop, not an echoed constant.
 */
object BpeFixture {
  val merges: Vector[(String, String)] = Vector(
    ("t", "h"), ("th", "e"), (" ", "the"),                            // the
    ("i", "n"), ("j", "o"), ("jo", "in"), (" ", "join"),              // join
    ("a", "n"), ("s", "c"), ("sc", "an"),                             // scan
    ("a", "s"), ("as", "h"), ("h", "ash"),                            // hash
    ("r", "o"), ("ro", "w"),                                          // row
    ("b", "a"), ("ba", "t"), ("bat", "c"), ("batc", "h"),             // batch
    ("o", "l"), ("c", "ol"), ("col", "u"), ("colu", "m"), ("colum", "n"), // column
    ("e", "r"), ("m", "er"), ("mer", "g"), ("merg", "e"),             // merge
    ("o", "r"), ("or", "d"), ("ord", "er"),                           // order
    ("s", "m"), ("sm", "a"), ("sma", "l"), ("smal", "l"),             // small
    ("l", "o"), ("s", "lo"), ("slo", "w"),                            // slow
    ("d", "a"), ("da", "t"), ("dat", "a"),                            // data
    (" ", "a"),                                                        // " a"
    ("q", "u"), ("qu", "er"), ("quer", "y"),                          // query
    ("r", "e"), ("s", "t"), ("st", "re"), ("stre", "a"), ("strea", "m"), // stream
    ("i", "l"), ("f", "il"), ("fil", "t"), ("filt", "er"),            // filter
    ("i", "g"), ("b", "ig"),                                          // big
    ("k", "e"), ("ke", "y"),                                          // key
    ("g", "g"), ("a", "gg"),                                          // agg
    ("a", "l"), ("v", "al"), ("val", "u"), ("valu", "e"),             // value
    ("a", "r"), ("p", "ar"), ("par", "t"),                            // part
    ("s", "par"), ("spar", "k"),                                      // spark
    ("g", "ro"), ("gro", "u"), ("grou", "p"),                         // group (via "ro" from row)
    ("f", "as"), ("fas", "t"),                                        // fast
    ("s", "or"), ("sor", "t"),                                        // sort
    ("w", "in"), ("win", "d"), ("o", "w"), ("wind", "ow"),            // window
    ("c", "u"), ("cu", "st"), ("cust", "o"), ("custo", "mer"),        // customer (via "mer")
    ("v", "e"), ("ve", "c"), ("vec", "t"), ("vect", "or"),            // vector
    ("l", "in"), ("lin", "e"),                                        // line
    (" ", "hash"), (" ", "row"), (" ", "data"), (" ", "key"))         // 2-level space merges

  /** `(lhs, rhs, rank)` rows as a SQL VALUES body for the oracle. */
  def sqlValues: String = merges.zipWithIndex.map { case ((l, r), i) =>
    s"('${l.replace("'", "''")}','${r.replace("'", "''")}',$i)"
  }.mkString(", ")

  /**
   * Byte-level fixture extension: merges over UTF-8 BYTE symbols (each a
   * chr(byte) char, see [[BpeCore.byteSymbols]]) for the multi-byte chars
   * the byte-level gate fixture plants. The ASCII [[merges]] apply
   * unchanged at byte level (ASCII bytes ARE their codepoint symbols);
   * these continue the rank sequence. The emoji chain stops one byte
   * short on purpose — partial merges must surface as two tokens.
   */
  val byteMerges: Vector[(String, String)] = Vector(
    ("\u00c3", "\u00a9"),             // e-acute = C3 A9 -> one token
    ("\u00c3", "\u00a0"),             // a-grave = C3 A0 -> one token
    ("\u00e2", "\u0080"),             // ellipsis = E2 80 A6: first pair
    ("\u00e2\u0080", "\u00a6"),       //   then + A6 -> one token
    ("\u00f0", "\u009f"),             // emoji = F0 9F 98 80: F0 9F
    ("\u00f0\u009f", "\u0098"))       //   + 98; byte 80 stays separate

  /** The byte-level table: ASCII merges + byte merges, ranks continuous. */
  def byteTable: Vector[(String, String)] = merges ++ byteMerges

  /** One symbol as a SQL string expression — plain literal for printable
    * ASCII, chr() concatenation otherwise (never raw control/high bytes
    * in generated SQL). */
  private def sqlStr(s: String): String =
    if (s.forall(c => c >= ' ' && c < 127 && c != '\'')) s"'$s'"
    else s.map(c => s"chr(${c.toInt})").mkString("(", " || ", ")")

  /** `(lhs, rhs, rank)` VALUES body for the BYTE-level oracle. */
  def sqlValuesBytes: String = byteTable.zipWithIndex.map { case ((l, r), i) =>
    s"(${sqlStr(l)},${sqlStr(r)},$i)"
  }.mkString(", ")
}

/**
 * BPE TRAINING — learn the merges table itself from a corpus, closing the
 * tokenizer loop (train → broadcast → count/tokenize → pack) inside the
 * engine. Classic algorithm (Sennrich et al., ACL 2016): repeatedly merge
 * the highest-frequency adjacent symbol pair over the WORD-FREQUENCY
 * histogram.
 *
 * Scale shape: the histogram — (pre-token, count) — is vocabulary-bounded,
 * not corpus-bounded: a 100 TB natural-language corpus has millions of
 * distinct pre-tokens against billions of documents, and the aggregate is
 * one map-side-combined shuffle. The merge-learning loop is then pure
 * driver arithmetic with INCREMENTAL pair-count updates (only words
 * containing the merged pair are re-segmented per iteration — the
 * subword-nmt approach); the alternative, one distributed pair-count job
 * per merge, costs a scheduling round per vocab entry. Driver memory is
 * O(histogram), the same bound as the collect.
 *
 * Determinism: ties on pair count break lexicographically on (left,
 * right), so the learned table is a pure function of the histogram.
 * Tables produced here are well-formed by construction (every merge's
 * sides are single characters or earlier merge outputs), which is exactly
 * the condition under which [[BpeCore]]'s single-occurrence tokenization
 * contract coincides with classic merge-all BPE.
 */
object BpeTrainer {

  /** Learn up to `numMerges` merges from (word, count) rows. Stops early
    * when no pair reaches `minPairCount` (rare-pair merges only overfit). */
  def trainFromHistogram(hist: Seq[(String, Long)], numMerges: Int,
                         minPairCount: Long = 2L): Vector[(String, String)] = {
    require(numMerges >= 0, "numMerges must be non-negative")
    // codepoint symbols, matching [[BpeCore.tokenizeWord]]
    val words = hist.collect { case (w, c) if w.length > 1 && c > 0 =>
      val cps = w.codePoints().toArray
      (scala.collection.mutable.ArrayBuffer.tabulate(cps.length)(i =>
        new String(Character.toChars(cps(i)))), c)
    }.toArray
    val pairCount = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val pairWords = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.Set[Int]]

    def addPairs(wi: Int, sign: Long): Unit = {
      val (syms, c) = words(wi)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val nv = pairCount.getOrElse(p, 0L) + sign * c
        if (nv == 0L) pairCount.remove(p) else pairCount(p) = nv
        if (sign > 0) pairWords.getOrElseUpdate(p,
          scala.collection.mutable.Set.empty[Int]) += wi
        i += 1
      }
    }
    words.indices.foreach(addPairs(_, 1L))

    val out = Vector.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      // max count, lexicographic (l, r) tie-break — deterministic
      var best: (String, String) = null
      var bestC = minPairCount - 1
      pairCount.foreach { case (p, c) =>
        if (c > bestC || (c == bestC && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestC = c
        }
      }
      if (best == null) exhausted = true
      else {
        out += best
        val (l, r) = best
        val merged = l + r
        // re-segment only the words that (may) contain the pair; stale
        // indices (pair already merged away) are skipped by the scan
        pairWords.remove(best).foreach(_.foreach { wi =>
          val (syms, _) = words(wi)
          var has = false
          var i = 0
          while (!has && i < syms.length - 1) {
            has = syms(i) == l && syms(i + 1) == r; i += 1
          }
          if (has) {
            addPairs(wi, -1L)
            // left-to-right non-overlapping merge-all (training-side
            // segmentation, the classic loop)
            var j = 0
            while (j < syms.length - 1) {
              if (syms(j) == l && syms(j + 1) == r) {
                syms(j) = merged; syms.remove(j + 1)
              }
              j += 1
            }
            addPairs(wi, 1L)
          }
        })
        k += 1
      }
    }
    out.result()
  }
}
