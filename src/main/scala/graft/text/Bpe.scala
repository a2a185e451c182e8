package graft.text

/** Byte-pair-encoding tokenizer with an EMBEDDED merge table — the honest
  * token-count face beside the regex approximation (`n_bpeish` in
  * [[TextAnalysis.withTokenCounts]]): a pipeline budgeting context windows
  * (text_pack, chunking) needs counts from the tokenizer family it will
  * train with, and a regex over-counts words any trained vocabulary has
  * fused into single tokens.
  *
  * The merge table is a 64-merge BPE vocabulary LEARNED (offline,
  * count-greedy with deterministic (count desc, pair asc) tie-break and a
  * min-count floor) from the words of the synthetic public documents
  * corpus this library tests against — small enough to embed as a
  * constant, deliberately TRUNCATED below full fusion so roughly a third of the
  * corpus vocabulary stays multi-token (the counts carry real subword
  * structure, and the BPE face visibly diverges from the regex face on
  * the corpus itself). It is a demonstration
  * vocabulary: swap `merges` for a production merge list (e.g. a public
  * GPT-2-style merges.txt prefix) without touching any other code.
  *
  * Encoding semantics — standard BPE: repeatedly merge the LOWEST-RANK
  * adjacent token pair, left-to-right non-overlapping within a pass,
  * until no listed pair remains. Because the table is well-formed (every
  * merge's operands are single characters or products of EARLIER merges,
  * and no two merges produce the same token), this is exactly equivalent
  * to applying the merges once each in rank order — which is how the
  * DuckDB oracle reproduces it as a chain of string `replace` calls over
  * a '|'-delimited token string (see OracleSql "text_tokens_bpe":
  * generated from THIS table, so engine and oracle cannot drift).
  *
  * Pre-tokenization (mirrored in the oracle SQL): runs of [a-z] are
  * words and BPE-encode; spaces delimit and are free; every other
  * character is one token (the byte-fallback convention). The corpus is
  * lowercase ASCII; non-BMP input would count surrogate pairs as two.
  */
object Bpe {

  /** (left, right) merge pairs in rank order. */
  val merges: Seq[(String, String)] = Seq(
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("j", "o"),
    ("jo", "in"),
    ("a", "s"),
    ("as", "h"),
    ("h", "ash"),
    ("r", "ow"),
    ("at", "c"),
    ("atc", "h"),
    ("b", "atch"),
    ("a", "n"),
    ("c", "an"),
    ("s", "can"),
    ("c", "o"),
    ("c", "u"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n"),
    ("cu", "st"),
    ("cust", "o"),
    ("custo", "mer"),
    ("f", "i"),
    ("fi", "l"),
    ("fil", "t"),
    ("filt", "er"),
    ("a", "l"),
    ("al", "l"),
    ("m", "all"),
    ("s", "mall"),
    ("g", "e"),
    ("l", "ow"),
    ("mer", "ge"),
    ("s", "low"),
    ("c", "t"),
    ("ct", "or"),
    ("d", "er"),
    ("e", "ctor"),
    ("or", "der"),
    ("v", "ector"),
    ("in", "e"),
    ("l", "ine"),
    ("a", "b"),
    ("ab", "l"),
    ("abl", "e"),
    ("at", "a"),
    ("d", "ata"),
    ("t", "able"),
    ("u", "p"),
    ("a", "g"),
    ("ag", "g"),
    ("a", "lu"),
    ("alu", "e"),
    ("v", "alue"),
    ("e", "y"),
    ("k", "ey"))

  private val rank: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    merges.zipWithIndex.foreach { case ((l, r), i) => m.put(l + "\u0000" + r, i) }
    m
  }

  /** BPE token count of one [a-z]+ word. Priority-loop form (equivalent to
    * rank-ordered sequential application for this well-formed table). */
  def countWord(w: CharSequence): Int = {
    val n = w.length
    if (n <= 1) return n
    var toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = String.valueOf(w.charAt(i)); i += 1 }
    var len = n
    while (true) {
      // find the lowest-rank adjacent pair (getOrDefault: no null unboxing)
      var best = Int.MaxValue
      i = 0
      while (i < len - 1) {
        val r = rank.getOrDefault(toks(i) + "\u0000" + toks(i + 1), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) return len
      val l = merges(best)._1; val r = merges(best)._2; val fused = l + r
      // merge all occurrences left-to-right, in place
      var w2 = 0; i = 0
      while (i < len) {
        if (i < len - 1 && toks(i) == l && toks(i + 1) == r) { toks(w2) = fused; i += 2 }
        else { toks(w2) = toks(i); i += 1 }
        w2 += 1
      }
      len = w2
    }
    len // unreachable
  }

  /** BPE token count of a whole text: Σ countWord over [a-z] runs, +1 per
    * non-space non-alpha character. One scan, no allocation beyond the
    * current word. */
  def countText(s: String): Int = {
    var total = 0
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val n = s.length
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else ' '
      if (c >= 'a' && c <= 'z') sb.append(c)
      else {
        if (sb.length > 0) { total += countWord(sb); sb.setLength(0) }
        if (i < n && c != ' ') total += 1
      }
      i += 1
    }
    total
  }
}
