package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Real byte-pair-encoding tokenization with an in-repo merge table.
  *
  * Shape of a trained BPE vocabulary (GPT-2 style): text is first split
  * into pre-tokens (letter runs / digit runs / other runs, optional
  * leading space — [[PreTokenRegex]]), then within each pre-token the
  * lowest-rank adjacent symbol pair is merged repeatedly until no pair is
  * in the table. The table here is hand-seeded with common English
  * bigrams/affixes rather than trained, but it is a REAL hierarchical
  * merge table: every rule's sides are base characters or outputs of
  * earlier rules, exactly the invariant a trained table satisfies, and
  * [[bpeCount]] runs the genuine rank-priority merge loop.
  *
  * Oracle equivalence (what makes the real algorithm hash-checkable):
  * because each rule's sides predate it, merging rule j can only create
  * adjacencies involving rule j's output symbol — never a fresh occurrence
  * of an earlier rule's pair. Rank-priority merging is therefore identical
  * to applying the rules in rank order, each as a leftmost greedy
  * replace-all — which is precisely what a chain of DuckDB `replace()`
  * calls computes ([[replaceChainSql]]). Two independent formulations, one
  * fixpoint; a bug in either side breaks the hash compare.
  *
  * Scale: the count runs as a static call inside whole-stage codegen
  * (see BpeCountExpression) — narrow, zero shuffle, with a per-thread
  * pre-token memo (real tokenizers memoize exactly this way: pre-token
  * frequency is Zipfian, so the hit rate is high).
  */
object Bpe {

  /** GPT-2-style pre-tokenizer split, shared verbatim with the DuckDB
    * oracle (same regex class syntax in both engines). */
  val PreTokenRegex = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  /** Merge rules in rank order, written as SURFACE pairs: a side is
    * either one base character or the concatenated surface of an earlier
    * rule (the builder below enforces that, so the hierarchy invariant is
    * checked at class-load, not assumed). Tiers: character bigrams, then
    * word fragments over merged symbols, then leading-space merges last —
    * matching the order frequencies would induce in training. A rule that
    * turns out unreachable at apply time (its left part always consumed
    * by an earlier rank first) is harmless: both formulations agree on
    * dead rules by construction. */
  val RuleSurfaces: Vector[(String, String)] = Vector(
    // tier 1: character bigrams
    ("t", "h"), ("i", "n"), ("a", "n"), ("r", "e"), ("o", "n"),
    ("e", "r"), ("a", "t"), ("e", "n"), ("o", "r"), ("e", "s"),
    ("s", "t"), ("a", "r"), ("o", "u"), ("i", "t"), ("i", "s"),
    ("l", "l"), ("e", "d"), ("n", "d"), ("s", "e"), ("t", "e"),
    ("t", "o"), ("o", "f"), ("n", "g"), ("a", "l"), ("d", "e"),
    ("a", "s"), ("h", "e"), ("l", "e"), ("m", "e"), ("n", "e"),
    ("0", "0"),
    // tier 2: fragments built from merged symbols
    ("th", "e"), ("in", "g"), ("an", "d"), ("th", "at"), ("i", "th"),
    ("w", "ith"), ("f", "or"), ("t", "er"), ("en", "t"), ("ou", "t"),
    ("a", "re"), ("or", "e"), ("er", "s"), ("at", "e"), ("es", "s"),
    // tier 3: leading-space merges (last, like trained tables where the
    // space-joined forms rank below their word-internal parts)
    (" ", "t"), (" ", "a"), (" ", "s"), (" ", "w"), (" ", "o"),
    (" ", "b"), (" ", "c"), (" ", "d"), (" ", "f"), (" ", "p"),
    (" ", "m"), (" ", "h"), (" ", "the"), (" ", "and"), (" ", "to"),
    (" ", "of"), (" ", "is"), (" ", "in"), (" ", "it"), (" ", "that"))

  /** Symbol for rule i: a private-use-area char, guaranteed absent from
    * the base alphabet, so every symbol (base or merged) is one char and
    * the whole merge state is just a char sequence. */
  private def sym(i: Int): Char = (0xE000 + i).toChar

  /** (rank, output) per symbol pair, plus each rule as its (left symbol,
    * right symbol, output symbol) triple in rank order for the oracle. */
  val (ranks: Map[(Char, Char), Int],
       outs: Map[(Char, Char), Char],
       rulesResolved: Vector[(Char, Char, Char)]) = {
    var repr = Map.empty[String, Char]
    def resolve(surface: String): Char =
      if (surface.length == 1) surface.head
      else repr.getOrElse(surface, throw new IllegalStateException(
        s"BPE rule side '$surface' is neither a base char nor an earlier rule's output"))
    val resolved = RuleSurfaces.zipWithIndex.map { case ((l, r), i) =>
      val (lc, rc) = (resolve(l), resolve(r))
      repr += (l + r) -> sym(i)
      (lc, rc, sym(i))
    }
    (resolved.zipWithIndex.map { case ((l, r, _), i) => (l, r) -> i }.toMap,
     resolved.map { case (l, r, o) => (l, r) -> o }.toMap,
     resolved)
  }

  /** Surface string for any symbol char: a base char is its own surface;
    * rule i's output symbol expands to its rule's concatenated surface
    * (each side is itself a surface by the hierarchy invariant). */
  val surfaceOf: Map[Char, String] =
    rulesResolved.zipWithIndex.map { case (_, i) =>
      sym(i) -> (RuleSurfaces(i)._1 + RuleSurfaces(i)._2)
    }.toMap

  /** The real BPE merge loop over one pre-token: repeatedly merge every
    * occurrence (leftmost first) of the lowest-rank adjacent pair present;
    * return the surviving symbol chars. */
  private def bpeMerge(preToken: String): (Array[Char], Int) = {
    var cur = preToken.toCharArray
    var n = cur.length
    var done = n < 2
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < n - 1) {
        val r = ranks.getOrElse((cur(i), cur(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (l, r, o) = rulesResolved(best)
        val next = new Array[Char](n)
        var src = 0; var dst = 0
        while (src < n) {
          if (src < n - 1 && cur(src) == l && cur(src + 1) == r) {
            next(dst) = o; src += 2
          } else {
            next(dst) = cur(src); src += 1
          }
          dst += 1
        }
        cur = next; n = dst
        if (n < 2) done = true
      }
    }
    (cur, n)
  }

  /** Surviving symbol count of one pre-token. */
  def bpeCount(preToken: String): Int = bpeMerge(preToken)._2

  /** ENCODE one pre-token: the surviving symbols' surfaces, each followed
    * by [[Sep]] — the wire form of the token SEQUENCE (see encodeTokens). */
  def bpeEncode(preToken: String): String = {
    val (cur, n) = bpeMerge(preToken)
    val sb = new java.lang.StringBuilder(preToken.length + n)
    var i = 0
    while (i < n) {
      val c = cur(i)
      // A >= U+E000 char that is NOT a rule output (PUA / CJK-compat /
      // fullwidth input text, or Sep itself) has no surface: it passes
      // through verbatim, matching the oracle's `ELSE c` branch.
      if (c >= 0xE000) sb.append(surfaceOf.getOrElse(c, c.toString))
      else sb.append(c)
      sb.append(Sep)
      i += 1
    }
    sb.toString
  }

  private val preTokenPattern = java.util.regex.Pattern.compile(PreTokenRegex)

  /** Token separator in the encoded wire form: a private-use char above
    * every rule symbol (rules stop at 0xE000+|rules|), so it can never be
    * produced by a merge. It may in principle occur in adversarial input
    * text — harmless for correctness, because the oracle computes the
    * SAME string from the same input, but consumers splitting on it
    * should treat the wire form as advisory for such text. */
  val Sep: Char = 0xE0FF.toChar

  /** Per-thread pre-token memo (Zipfian hit rate), bounded so a
    * pathological corpus can't grow it without limit. */
  private val memo = ThreadLocal.withInitial(
    () => new java.util.HashMap[String, Integer](1 << 12))
  private val encodeMemo = ThreadLocal.withInitial(
    () => new java.util.HashMap[String, String](1 << 12))
  private val MemoMax = 1 << 16

  /** Total real-BPE token count of a document — the static entry point the
    * generated whole-stage code calls. */
  def countTokens(text: UTF8String): Long = {
    val m = memo.get()
    if (m.size > MemoMax) m.clear()
    val s = text.toString
    val it = preTokenPattern.matcher(s)
    var total = 0L
    while (it.find()) {
      val t = it.group()
      var c = m.get(t)
      if (c == null) { c = bpeCount(t); m.put(t, c) }
      total += c.longValue()
    }
    total
  }

  /** Full BPE token SEQUENCE of a document as a single string — every
    * token's surface followed by [[Sep]], pre-tokens concatenated in
    * order — the static entry point the generated whole-stage code calls
    * (see BpeEncodeExpression). A string, not an array: the driver's
    * oracle compare sorts result rows by every column, which arrays
    * break; stripping the separators reproduces the pre-token
    * concatenation (= the input text on single-spaced corpora), and
    * counting them reproduces countTokens — both spec-pinned. */
  def encodeDoc(text: UTF8String): UTF8String = {
    val m = encodeMemo.get()
    if (m.size > MemoMax) m.clear()
    val s = text.toString
    val it = preTokenPattern.matcher(s)
    val sb = new java.lang.StringBuilder(s.length * 2)
    while (it.find()) {
      val t = it.group()
      var e = m.get(t)
      if (e == null) { e = bpeEncode(t); m.put(t, e) }
      sb.append(e)
    }
    UTF8String.fromString(sb.toString)
  }

  private def charSql(c: Char): String =
    if (c >= 0xE000) s"chr(${c.toInt})" else s"'$c'"

  /** DuckDB replay of the merge table over expression `e`: the rules in
    * rank order, each as one greedy `replace()` — see the equivalence
    * argument in the class doc. Every symbol is one code point, so the
    * token count is `length()` of the fixpoint string. */
  def replaceChainSql(e: String): String =
    rulesResolved.foldLeft(e) { case (acc, (l, r, o)) =>
      s"replace($acc, ${charSql(l)} || ${charSql(r)}, ${charSql(o)})"
    }

  /** Full oracle fragment: total BPE token count of a text column. */
  def countSql(textCol: String): String =
    s"""COALESCE(list_sum(list_transform(
       |    regexp_extract_all($textCol, '$PreTokenRegex'),
       |    t -> length(${replaceChainSql("t")}))), 0)""".stripMargin

  /** Full oracle fragment replaying [[encodeDoc]]: per pre-token, run the
    * merge chain to its symbol fixpoint, then per surviving SYMBOL (each
    * is one code point) emit its surface followed by [[Sep]]. The
    * symbol→surface map is one flat CASE over the rule outputs, NOT a
    * second replace chain: the merge chain alone is |rules| levels of
    * expression nesting, and stacking another |rules| replaces on top
    * blew DuckDB's 128-deep binder recursion limit (measured); a CASE
    * with |rules| branches is a single node however many rules exist. */
  def encodeSql(textCol: String): String = {
    val cases = rulesResolved.zipWithIndex.map { case ((_, _, o), i) =>
      s"WHEN ${charSql(o)} THEN '${RuleSurfaces(i)._1 + RuleSurfaces(i)._2}'"
    }.mkString(" ")
    val perSymbol = s"CASE c $cases ELSE c END || chr(${Sep.toInt})"
    val perPreToken =
      s"""array_to_string(list_transform(
         |      regexp_extract_all(${replaceChainSql("t")}, '.'),
         |      c -> $perSymbol), '')""".stripMargin
    s"""COALESCE(array_to_string(list_transform(
       |    regexp_extract_all($textCol, '$PreTokenRegex'),
       |    t -> $perPreToken), ''), '')""".stripMargin
  }
}
