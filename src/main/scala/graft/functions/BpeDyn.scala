package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Table-driven BPE application for a TRAINED merge table — the applier
  * half of the end-to-end tokenizer artifact chain (train → persist →
  * encode/pack), where [[Bpe]] applies the static hand-seeded table
  * compiled into the class.
  *
  * SEMANTICS — the trainer's, exactly: a pre-token's symbol sequence
  * starts as its code points, and each rule (rank order) is applied as
  * ONE leftmost-non-overlapping merge pass — the symbol-array form of
  * the wrapped-state `replace(st, '|l||r|', '|lr|')` the trainer
  * ([[graft.operators.BpeTrain]]) and its DuckDB replay both execute.
  * For a hierarchical table this equals rank-priority BPE (the [[Bpe]]
  * equivalence argument); where they could in principle diverge (two
  * trained rules producing the same surface — the trainer's
  * surface-keyed state conflates them), the applier must follow the
  * TRAINER, because the vocabulary artifact it serves is defined by the
  * trainer's own fixpoint. Pre-tokens containing the separator '|' are
  * excluded from training on both engines, so the applier leaves them
  * as base code points — the same miss path the oracle's dictionary
  * left-join takes.
  *
  * Scale: instances are immutable and serializable (the rule table is
  * vocabulary-sized model state, the centroid/codebook rule); the
  * per-thread pre-token memo gives the same Zipfian hit rate as the
  * static applier, and the expressions wrapping this
  * ([[graft.functions.expressions.BpeDynExpressions]]) stay inside
  * whole-stage codegen via `ctx.addReferenceObj` — one virtual call per
  * document at the scan, zero shuffle.
  */
final class BpeDyn(val rules: IndexedSeq[(String, String)]) extends Serializable {

  /** Tokenize one pre-token: surviving symbol SURFACES after replaying
    * every rule in rank order (leftmost non-overlapping per pass). */
  def tokenize(preToken: String): Array[String] = {
    // code-point split — the trainer's split(pt, "") semantics (an emoji
    // is ONE symbol; see BpeTrain.trainOnDict's non-BMP note)
    var syms = {
      val out = Array.newBuilder[String]
      var i = 0
      while (i < preToken.length) {
        val cp = preToken.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.result()
    }
    if (preToken.indexOf('|') >= 0) return syms // excluded from training
    var r = 0
    while (r < rules.length) {
      val (l, rr) = rules(r)
      // one leftmost-non-overlapping merge pass (== one engine replace)
      var j = 0
      var changed = false
      val b = Array.newBuilder[String]
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == rr) {
          b += (l + rr); j += 2; changed = true
        } else { b += syms(j); j += 1 }
      }
      if (changed) syms = b.result()
      r += 1
    }
    syms
  }

  private val preTokenPattern = java.util.regex.Pattern.compile(Bpe.PreTokenRegex)

  // per-thread pre-token memos, bounded like Bpe's (Zipfian hit rate)
  @transient private lazy val countMemo = ThreadLocal.withInitial(
    () => new java.util.HashMap[String, Integer](1 << 12))
  @transient private lazy val encodeMemo = ThreadLocal.withInitial(
    () => new java.util.HashMap[String, String](1 << 12))
  private val MemoMax = 1 << 16

  /** Total trained-table token count of a document — the entry point the
    * generated whole-stage code calls. */
  def countTokens(text: UTF8String): Long = {
    val m = countMemo.get()
    if (m.size > MemoMax) m.clear()
    val it = preTokenPattern.matcher(text.toString)
    var total = 0L
    while (it.find()) {
      val t = it.group()
      var c = m.get(t)
      if (c == null) { c = tokenize(t).length; m.put(t, c) }
      total += c.longValue()
    }
    total
  }

  /** Full trained-table token SEQUENCE of a document as one string —
    * every token's surface followed by [[Bpe.Sep]], pre-tokens in order
    * (the q_bpe_encode wire form). */
  def encodeDoc(text: UTF8String): UTF8String = {
    val m = encodeMemo.get()
    if (m.size > MemoMax) m.clear()
    val s = text.toString
    val it = preTokenPattern.matcher(s)
    val sb = new java.lang.StringBuilder(s.length * 2)
    while (it.find()) {
      val t = it.group()
      var e = m.get(t)
      if (e == null) {
        val b = new java.lang.StringBuilder(t.length * 2)
        tokenize(t).foreach { surf => b.append(surf).append(Bpe.Sep) }
        e = b.toString
        m.put(t, e)
      }
      sb.append(e)
    }
    UTF8String.fromString(sb.toString)
  }

  override def equals(o: Any): Boolean = o match {
    case d: BpeDyn => d.rules == rules
    case _ => false
  }
  override def hashCode(): Int = rules.hashCode()
}
