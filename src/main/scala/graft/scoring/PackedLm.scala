package graft.scoring

import java.util.{Arrays => JArrays, HashMap => JHashMap}

/** Common query surface of the two ARPA-backed LM representations —
  * [[ArpaModel]] (string-keyed hash maps, built straight from text) and
  * [[PackedLm]] (id-chained sorted arrays compiled to/from the binary
  * `.glm` format). Both run the identical KenLM-style backoff chain and
  * are proven BIT-equal on every query (PackedLmSpec fuzz + the
  * `f2_external_lm_bin` oracle).
  */
trait LmModel extends Serializable {
  def vocabSize: Int
  def bigramCount: Int
  def trigramCount: Int
  def quadgramCount: Int

  /** KenLM `model.score(line)`: total log10 probability of the
    * whitespace-tokenized line, `<s>` context, `</s>` included.
    */
  def score(line: String): Double

  /** [[score]] over an explicit token sequence — the seam the
    * external-LM path uses to feed SentencePiece-segmented pieces
    * through the backoff chain.
    */
  def scoreTokens(tokens: Iterator[String]): Double

  /** Table dumps (gram → prob, gram → optional backoff) for exporting
    * the model AS DATA — the correctness oracles materialize these to
    * parquet and replay the backoff arithmetic in SQL.
    */
  private[graft] def uniRows: Seq[(String, Double, Option[Double])]
  private[graft] def biRows: Seq[(String, Double, Option[Double])]
  private[graft] def triRows: Seq[(String, Double, Option[Double])]
  private[graft] def quadRows: Seq[(String, Double)]
}

/** Compiled n-gram LM: the graft-native analogue of KenLM's
  * `build_binary` step (the reference runs its models as compiled
  * binaries, chat_data_pipeline/kenlm_model.py:186-194 — because
  * re-parsing a multi-GB text ARPA on EVERY executor JVM is the real
  * cost at cluster scale). This is graft's OWN format (`.glm`), not a
  * KenLM-binary reader: the KenLM mmap layout has no ground-truth
  * artifact in this sandbox to verify bit-level fidelity against, so
  * per the oracle-or-retract discipline `lm_path` keeps requiring the
  * text ARPA as the interchange form — but a user compiles it ONCE with
  * [[CompileLm]] and every executor afterwards loads the `.glm` in
  * milliseconds instead of parsing text for seconds (numbers in
  * PERF.md).
  *
  * Layout (all heap arrays, loaded with three bulk ByteBuffer reads per
  * order):
  *   - `words(id)` — real unigrams first (sorted), then "structural"
  *     words that appear only inside higher-order grams (prob = NaN
  *     sentinel = not a vocab word; OOV-maps to `<unk>` exactly like
  *     [[ArpaModel]]'s containsKey test).
  *   - order k entries keyed by `prefixEntryIdx << 32 | wordId`, sorted,
  *     binary-searched — the classic trie chaining, so a 4-gram lookup
  *     is ≤3 binary searches and ZERO allocation (the hash-map model
  *     allocates a concatenated string key per probe). Structural
  *     prefix entries (NaN prob, 0.0 backoff) are inserted where a
  *     pruned ARPA lists an n-gram without its (n−1)-gram prefix; the
  *     NaN prob makes them invisible to probability lookups while still
  *     chaining, which is exactly the text model's semantics (missing
  *     map key → back off with weight 0).
  *
  * Memory: 8 B key + 8 B prob (+8 B backoff) per gram vs ≳100 B per
  * JHashMap entry with a materialized string key — ~5× smaller resident
  * model per executor. Probs/backoffs stay Double (not Float) so every
  * query is bit-identical to the text path and the 1-dp document
  * perplexity can never round differently.
  */
final class PackedLm private[scoring] (
    private[scoring] val words: Array[String],
    private[scoring] val uniProb: Array[Double],
    private[scoring] val uniBo: Array[Double],
    private[scoring] val biKey: Array[Long],
    private[scoring] val biProb: Array[Double],
    private[scoring] val biBo: Array[Double],
    private[scoring] val triKey: Array[Long],
    private[scoring] val triProb: Array[Double],
    private[scoring] val triBo: Array[Double],
    private[scoring] val quadKey: Array[Long],
    private[scoring] val quadProb: Array[Double]) extends LmModel {
  import PackedLm.{NoCtx, key}

  val Unk = "<unk>"
  val Bos = "<s>"
  val Eos = "</s>"

  @transient private lazy val vocabIdx: JHashMap[String, Integer] = {
    val m = new JHashMap[String, Integer](words.length * 2)
    var i = 0
    while (i < words.length) { m.put(words(i), i); i += 1 }
    m
  }
  @transient private lazy val unkId: Int = {
    val i = idOf(Unk)
    if (i >= 0 && !java.lang.Double.isNaN(uniProb(i))) i else -1
  }

  private def countReal(p: Array[Double]): Int = {
    var n = 0; var i = 0
    while (i < p.length) { if (!java.lang.Double.isNaN(p(i))) n += 1; i += 1 }
    n
  }
  def vocabSize: Int = countReal(uniProb)
  def bigramCount: Int = countReal(biProb)
  def trigramCount: Int = countReal(triProb)
  def quadgramCount: Int = quadProb.length
  /** Physical entry counts including structural chain-only fillers. */
  private[graft] def packedCounts: (Int, Int, Int, Int) =
    (words.length, biKey.length, triKey.length, quadKey.length)

  private def idOf(w: String): Int = {
    val v = vocabIdx.get(w)
    if (v == null) -1 else v.intValue
  }

  /** Vocab-map a token: real unigram keeps its id, anything else (absent
    * OR structural) becomes `<unk>` — [[ArpaModel]]'s `containsKey`
    * check exactly.
    */
  private def mapped(w: String): Int = {
    val i = idOf(w)
    if (i >= 0 && !java.lang.Double.isNaN(uniProb(i))) i
    else if (unkId >= 0) unkId
    else throw new IllegalStateException(
      s"OOV token '$w' but the model has no <unk> unigram")
  }

  // Context ids: >= 0 real entry; -1 "word string not in the model" (all
  // lookups miss, like a text-path string that hits no map key); NoCtx
  // (-2) "history shorter than this order" (dispatch to the lower order,
  // = ArpaModel's null history argument).

  private def lp1(h1: Int, w: Int): Double = {
    var p = Double.NaN
    if (h1 >= 0) {
      val i = JArrays.binarySearch(biKey, key(h1, w))
      if (i >= 0) p = biProb(i)
    }
    if (!java.lang.Double.isNaN(p)) p
    else (if (h1 >= 0) uniBo(h1) else 0.0) + uniProb(w)
  }

  private def lp2(h2: Int, h1: Int, w: Int): Double = {
    if (h2 == NoCtx) return lp1(h1, w)
    val ctx =
      if (h2 >= 0 && h1 >= 0) JArrays.binarySearch(biKey, key(h2, h1))
      else -1
    var p = Double.NaN
    if (ctx >= 0) {
      val i = JArrays.binarySearch(triKey, key(ctx, w))
      if (i >= 0) p = triProb(i)
    }
    if (!java.lang.Double.isNaN(p)) p
    else (if (ctx >= 0) biBo(ctx) else 0.0) + lp1(h1, w)
  }

  private def lp3(h3: Int, h2: Int, h1: Int, w: Int): Double = {
    if (h3 == NoCtx) return lp2(h2, h1, w)
    val ctxBi =
      if (h3 >= 0 && h2 >= 0) JArrays.binarySearch(biKey, key(h3, h2))
      else -1
    val ctxTri =
      if (ctxBi >= 0 && h1 >= 0) JArrays.binarySearch(triKey, key(ctxBi, h1))
      else -1
    var p = Double.NaN
    if (ctxTri >= 0) {
      val i = JArrays.binarySearch(quadKey, key(ctxTri, w))
      if (i >= 0) p = quadProb(i)
    }
    if (!java.lang.Double.isNaN(p)) p
    else (if (ctxTri >= 0) triBo(ctxTri) else 0.0) + lp2(h2, h1, w)
  }

  def score(line: String): Double =
    scoreTokens(line.split("\\s+").iterator.filter(_.nonEmpty))

  def scoreTokens(tokens: Iterator[String]): Double = {
    var h3 = NoCtx
    var h2 = NoCtx
    var h1 = idOf(Bos) // raw <s>: present-but-structural still chains,
                       // exactly like the text path's raw string key
    var sum = 0.0
    while (tokens.hasNext) {
      val w = mapped(tokens.next())
      sum += lp3(h3, h2, h1, w)
      h3 = h2
      h2 = h1
      h1 = w
    }
    sum + lp3(h3, h2, h1, mapped(Eos))
  }

  // --- AS-DATA exports (oracle parity with ArpaModel's row dumps) ---
  // Backoff is reported only when it is a REAL listed weight; structural
  // 0.0 fillers are indistinguishable from listed 0.0 in arithmetic but
  // the exports only ever come from models that round-trip a text ARPA,
  // where listed-0.0 and missing both replay as coalesce(bo, 0).

  private[graft] def uniRows: Seq[(String, Double, Option[Double])] =
    words.indices.collect {
      case i if !java.lang.Double.isNaN(uniProb(i)) =>
        (words(i), uniProb(i),
          if (uniBo(i) == 0.0) None else Some(uniBo(i)))
    }
  private def gramOf(k: Long, prefix: Int => String): String =
    prefix((k >>> 32).toInt) + " " + words((k & 0xffffffffL).toInt)
  private def biGram(i: Int): String =
    gramOf(biKey(i), j => words(j))
  private def triGram(i: Int): String =
    gramOf(triKey(i), biGram)
  private[graft] def biRows: Seq[(String, Double, Option[Double])] =
    biKey.indices.collect {
      case i if !java.lang.Double.isNaN(biProb(i)) =>
        (biGram(i), biProb(i), if (biBo(i) == 0.0) None else Some(biBo(i)))
    }
  private[graft] def triRows: Seq[(String, Double, Option[Double])] =
    triKey.indices.collect {
      case i if !java.lang.Double.isNaN(triProb(i)) =>
        (triGram(i), triProb(i),
          if (triBo(i) == 0.0) None else Some(triBo(i)))
    }
  private[graft] def quadRows: Seq[(String, Double)] =
    quadKey.indices.map { i =>
      (gramOf(quadKey(i), triGram), quadProb(i))
    }
}

object PackedLm {
  /** File magic; also the sniff key [[ExternalLm.loadModel]] dispatches
    * on, so `lm_path: model.glm` in a YAML config Just Works.
    */
  val Magic = "GRAFTLM1"
  private[scoring] val NoCtx = -2

  private[scoring] def key(prefix: Int, w: Int): Long =
    (prefix.toLong << 32) | (w.toLong & 0xffffffffL)

  /** Compile a parsed text model into the packed representation.
    * Deterministic: the same ARPA always produces byte-identical output
    * (real vocab sorted, gram rows processed in sorted order), so a
    * compiled `.glm` can be content-addressed in a model cache.
    */
  def fromArpa(m: ArpaModel): PackedLm = {
    import scala.collection.mutable
    val idx = new JHashMap[String, Integer]()
    val wordsBuf = mutable.ArrayBuffer[String]()
    val upBuf = mutable.ArrayBuffer[Double]()
    val uboBuf = mutable.ArrayBuffer[Double]()
    // uniRows dumps a map, so words are already unique (duplicate ARPA
    // rows were resolved by ArpaModel.parse / compileLines upstream)
    m.uniRows.sortBy(_._1).foreach { case (w, p, bo) =>
      idx.put(w, wordsBuf.length)
      wordsBuf += w; upBuf += p; uboBuf += bo.getOrElse(0.0)
    }
    def ensureWord(w: String): Int = {
      val got = idx.get(w)
      if (got != null) got.intValue
      else {
        val i = wordsBuf.length
        idx.put(w, i)
        wordsBuf += w; upBuf += Double.NaN; uboBuf += 0.0
        i
      }
    }

    // Pass 1 over the higher orders: finalize the word set and the
    // bigram ENTRY set (real + structural prefixes) before any chained
    // key can be computed.
    val biEntries = new JHashMap[Long, Integer]() // packed(w1,w2) -> buf idx
    val biKw = mutable.ArrayBuffer[Long]()
    val biPb = mutable.ArrayBuffer[Double]()
    val biBb = mutable.ArrayBuffer[Double]()
    def ensureBi(a: Int, b: Int): Int = {
      val k = key(a, b)
      val got = biEntries.get(k)
      if (got != null) got.intValue
      else {
        val i = biKw.length
        biEntries.put(k, i)
        biKw += k; biPb += Double.NaN; biBb += 0.0
        i
      }
    }
    val biSorted = m.biRows.sortBy(_._1)
    val triSorted = m.triRows.sortBy(_._1)
    val quadSorted = m.quadRows.sortBy(_._1)
    biSorted.foreach { case (g, p, bo) =>
      val sp = g.indexOf(' ')
      val i = ensureBi(ensureWord(g.substring(0, sp)),
        ensureWord(g.substring(sp + 1)))
      biPb(i) = p
      biBb(i) = bo.getOrElse(0.0)
    }
    triSorted.foreach { case (g, _, _) =>
      val ws = g.split(' ')
      ensureBi(ensureWord(ws(0)), ensureWord(ws(1)))
      ensureWord(ws(2))
      ()
    }
    quadSorted.foreach { case (g, _) =>
      val ws = g.split(' ')
      ensureBi(ensureWord(ws(0)), ensureWord(ws(1)))
      ensureWord(ws(2)); ensureWord(ws(3))
      ()
    }

    // Sort bigram entries by key; remember each key's FINAL index — that
    // index is the trigram keys' prefix component.
    val biOrder = biKw.indices.sortBy(biKw)
    val biKeyArr = biOrder.map(biKw).toArray
    val biProbArr = biOrder.map(biPb).toArray
    val biBoArr = biOrder.map(biBb).toArray
    val biFinal = new JHashMap[Long, Integer]()
    biKeyArr.indices.foreach(i => biFinal.put(biKeyArr(i), i))
    def biIdx(a: Int, b: Int): Int = biFinal.get(key(a, b)).intValue

    // Trigrams: real rows + structural prefixes for the quadgrams.
    val triEntries = new JHashMap[Long, Integer]()
    val triKw = mutable.ArrayBuffer[Long]()
    val triPb = mutable.ArrayBuffer[Double]()
    val triBb = mutable.ArrayBuffer[Double]()
    def ensureTri(k: Long): Int = {
      val got = triEntries.get(k)
      if (got != null) got.intValue
      else {
        val i = triKw.length
        triEntries.put(k, i)
        triKw += k; triPb += Double.NaN; triBb += 0.0
        i
      }
    }
    triSorted.foreach { case (g, p, bo) =>
      val ws = g.split(' ')
      val i = ensureTri(key(biIdx(idx.get(ws(0)), idx.get(ws(1))),
        idx.get(ws(2))))
      triPb(i) = p
      triBb(i) = bo.getOrElse(0.0)
    }
    quadSorted.foreach { case (g, _) =>
      val ws = g.split(' ')
      ensureTri(key(biIdx(idx.get(ws(0)), idx.get(ws(1))), idx.get(ws(2))))
      ()
    }
    val triOrder = triKw.indices.sortBy(triKw)
    val triKeyArr = triOrder.map(triKw).toArray
    val triProbArr = triOrder.map(triPb).toArray
    val triBoArr = triOrder.map(triBb).toArray
    val triFinal = new JHashMap[Long, Integer]()
    triKeyArr.indices.foreach(i => triFinal.put(triKeyArr(i), i))

    val quadPairs = quadSorted.map { case (g, p) =>
      val ws = g.split(' ')
      val tk = key(biIdx(idx.get(ws(0)), idx.get(ws(1))), idx.get(ws(2)))
      (key(triFinal.get(tk).intValue, idx.get(ws(3))), p)
    }.sortBy(_._1)
    // duplicate quad listings: last wins (text map semantics)
    val quadDedup = mutable.LinkedHashMap[Long, Double]()
    quadPairs.foreach { case (k, p) => quadDedup(k) = p }

    new PackedLm(wordsBuf.toArray, upBuf.toArray, uboBuf.toArray,
      biKeyArr, biProbArr, biBoArr, triKeyArr, triProbArr, triBoArr,
      quadDedup.keysIterator.toArray, quadDedup.valuesIterator.toArray)
  }

  // --- streaming compiler -------------------------------------------
  // fromArpa is fully general but pays for the intermediate string-keyed
  // ArpaModel plus gram-string sorts — measured 544 s / ~6 GB transient
  // at 34M grams (PERF.md), which extrapolates to "impossible" for a
  // full cc_net en.arpa (~30 GB text, ~300M grams). compileLines parses
  // the ARPA text STRAIGHT into id-space primitive buffers: no gram
  // strings retained, long-key sorts instead of string sorts, memory ~
  // the packed model itself (plus one transient boxed index array per
  // order). Requires the \1-grams section before the higher orders (all
  // real ARPA files; fromArpa remains the any-order fallback).

  private final class GrowL {
    var a = new Array[Long](1024); var n = 0
    def +=(v: Long): Unit = {
      if (n == a.length) a = JArrays.copyOf(a, n * 2)
      a(n) = v; n += 1
    }
    def trim: Array[Long] = JArrays.copyOf(a, n)
  }
  private final class GrowD {
    var a = new Array[Double](1024); var n = 0
    def +=(v: Double): Unit = {
      if (n == a.length) a = JArrays.copyOf(a, n * 2)
      a(n) = v; n += 1
    }
  }
  private final class GrowI {
    var a = new Array[Int](1024); var n = 0
    def +=(v: Int): Unit = {
      if (n == a.length) a = JArrays.copyOf(a, n * 2)
      a(n) = v; n += 1
    }
  }

  /** Sort + collapse one order's entries with [[ArpaModel.parse]]'s
    * PER-FIELD duplicate-row semantics: for each distinct key, prob =
    * the last row's prob, backoff = the last row that LISTED a backoff
    * column (a later backoff-less duplicate overwrites the prob map but
    * leaves the earlier backoff in the backoff map). Rows past `nReal`
    * are structural chain-only fillers (NaN prob, 0.0 backoff); their
    * keys never collide with real keys (membership-tested before
    * appending), so their runs are singletons.
    */
  private def collapseOrder(keys: Array[Long], nReal: Int,
      probs: GrowD, bos: GrowD, boListed: GrowI)
      : (Array[Long], Array[Double], Array[Double]) = {
    val idx = new Array[Integer](keys.length)
    var i = 0
    while (i < keys.length) { idx(i) = i; i += 1 }
    JArrays.sort(idx, (x: Integer, y: Integer) =>
      java.lang.Long.compare(keys(x.intValue), keys(y.intValue)))
    val kOut = new GrowL
    val pOut = new GrowD
    val bOut = new GrowD
    i = 0
    while (i < idx.length) {
      var j = i
      while (j + 1 < idx.length &&
        keys(idx(j + 1).intValue) == keys(idx(i).intValue)) j += 1
      val last = idx(j).intValue // stable sort → last in run = last in file
      kOut += keys(last)
      pOut += (if (last < nReal) probs.a(last) else Double.NaN)
      var bo = 0.0
      var b = j
      var found = false
      while (b >= i && !found) {
        val src = idx(b).intValue
        if (src < nReal && boListed.a(src) == 1) {
          bo = bos.a(src)
          found = true
        }
        b -= 1
      }
      bOut += bo
      i = j + 1
    }
    (kOut.trim, JArrays.copyOf(pOut.a, pOut.n),
      JArrays.copyOf(bOut.a, bOut.n))
  }

  /** Sort entry indices stably by key and collapse duplicate keys
    * keeping the LAST occurrence (text-map put semantics; backoff-less
    * orders — quadgrams — where prob-last-wins is the whole story).
    * Returns the surviving original indices in final key order.
    */
  private def sortLastWins(keys: Array[Long]): Array[Int] = {
    val idx = new Array[Integer](keys.length)
    var i = 0
    while (i < keys.length) { idx(i) = i; i += 1 }
    JArrays.sort(idx, (x: Integer, y: Integer) =>
      java.lang.Long.compare(keys(x.intValue), keys(y.intValue)))
    val out = new GrowI
    i = 0
    while (i < idx.length) {
      var j = i
      while (j + 1 < idx.length &&
        keys(idx(j + 1).intValue) == keys(idx(i).intValue)) j += 1
      out += idx(j).intValue // stable sort → last in run = last in file
      i = j + 1
    }
    JArrays.copyOf(out.a, out.n)
  }

  /** Compile ARPA text lines straight to a packed model (see the
    * design note above). Semantics match [[fromArpa]]∘[[ArpaModel.parse]]
    * bit-for-bit on every query (PackedLmSpec fuzz parity); word ids of
    * structural-only words may differ, so `.glm` bytes are deterministic
    * per compiler, not across the two compilers.
    */
  def compileLines(lines: Iterator[String]): PackedLm = {
    import scala.collection.mutable
    val idx = new JHashMap[String, Integer]()
    val wordsBuf = mutable.ArrayBuffer[String]()
    val upBuf = new GrowD
    val uboBuf = new GrowD
    // raw \1-grams rows, sorted + id-assigned at section close;
    // duplicate grams follow ArpaModel.parse's PER-FIELD map semantics:
    // prob = last row's, backoff = last row that LISTED one (a later
    // backoff-less duplicate overwrites the prob but leaves the earlier
    // backoff in backoffLog)
    var uniRaw = mutable.ArrayBuffer[(String, Double, Double, Boolean)]()
    var uniDone = false
    def closeUni(): Unit = if (!uniDone) {
      uniDone = true
      val sorted = uniRaw.zipWithIndex
        .sortBy { case ((w, _, _, _), i) => (w, i) } // stable per word
      var k = 0
      while (k < sorted.length) {
        var j = k
        while (j + 1 < sorted.length &&
          sorted(j + 1)._1._1 == sorted(k)._1._1) j += 1
        val w = sorted(j)._1._1
        var bo = 0.0
        var b = j
        while (b >= k && !sorted(b)._1._4) b -= 1
        if (b >= k) bo = sorted(b)._1._3
        idx.put(w, wordsBuf.length)
        wordsBuf += w; upBuf += sorted(j)._1._2; uboBuf += bo
        k = j + 1
      }
      uniRaw = null
    }
    def ensureWord(w: String): Int = {
      val got = idx.get(w)
      if (got != null) got.intValue
      else {
        val i = wordsBuf.length
        idx.put(w, i)
        wordsBuf += w; upBuf += Double.NaN; uboBuf += 0.0
        i
      }
    }
    val biKeyRaw = new GrowL; val biP = new GrowD; val biBo = new GrowD
    val biBoL = new GrowI // 1 = backoff column present on this row
    val triPre = new GrowL; val triW = new GrowI
    val triP = new GrowD; val triBo = new GrowD
    val triBoL = new GrowI
    val quadPre = new GrowL; val quadW3 = new GrowI
    val quadW4 = new GrowI; val quadP = new GrowD
    var section = 0
    lines.foreach { raw =>
      val line = raw.trim
      if (line == "\\1-grams:") {
        require(!uniDone, "compileLines needs \\1-grams before higher " +
          "orders and only once — use ArpaModel.fromFile + fromArpa " +
          "for exotic section orders")
        section = 1
      }
      else if (line == "\\2-grams:") { closeUni(); section = 2 }
      else if (line == "\\3-grams:") { closeUni(); section = 3 }
      else if (line == "\\4-grams:") { closeUni(); section = 4 }
      else if (line == "\\end\\") { closeUni(); section = 0 }
      else if (line.nonEmpty && section > 0) {
        val t1 = line.indexOf('\t')
        if (t1 >= 0) {
          val t2 = line.indexOf('\t', t1 + 1)
          val p = line.substring(0, t1).toDouble
          val g = if (t2 >= 0) line.substring(t1 + 1, t2)
                  else line.substring(t1 + 1)
          val bo = if (t2 >= 0) line.substring(t2 + 1).toDouble else 0.0
          section match {
            case 1 => uniRaw += ((g, p, bo, t2 >= 0))
            case 2 =>
              val s1 = g.indexOf(' ')
              biKeyRaw += key(ensureWord(g.substring(0, s1)),
                ensureWord(g.substring(s1 + 1)))
              biP += p; biBo += bo; biBoL += (if (t2 >= 0) 1 else 0)
            case 3 =>
              val s1 = g.indexOf(' ')
              val s2 = g.indexOf(' ', s1 + 1)
              triPre += key(ensureWord(g.substring(0, s1)),
                ensureWord(g.substring(s1 + 1, s2)))
              triW += ensureWord(g.substring(s2 + 1))
              triP += p; triBo += bo; triBoL += (if (t2 >= 0) 1 else 0)
            case 4 =>
              val s1 = g.indexOf(' ')
              val s2 = g.indexOf(' ', s1 + 1)
              val s3 = g.indexOf(' ', s2 + 1)
              quadPre += key(ensureWord(g.substring(0, s1)),
                ensureWord(g.substring(s1 + 1, s2)))
              quadW3 += ensureWord(g.substring(s2 + 1, s3))
              quadW4 += ensureWord(g.substring(s3 + 1))
              quadP += p
            case _ =>
          }
        }
      }
    }
    closeUni()

    // ---- finalize bigrams: reals + structural prefixes of tri/quad
    def structuralMisses(realSorted: Array[Long],
        candidates: Iterator[Long]): Array[Long] = {
      val seen = new java.util.HashSet[java.lang.Long]()
      val out = new GrowL
      candidates.foreach { k =>
        if (JArrays.binarySearch(realSorted, k) < 0 &&
          seen.add(java.lang.Long.valueOf(k))) out += k
      }
      out.trim
    }
    val biRealKeys = biKeyRaw.trim
    val biRealSorted = biRealKeys.clone(); JArrays.sort(biRealSorted)
    val biStruct = structuralMisses(biRealSorted,
      (0 until triPre.n).iterator.map(triPre.a) ++
        (0 until quadPre.n).iterator.map(quadPre.a))
    val biAllKeys = new Array[Long](biRealKeys.length + biStruct.length)
    System.arraycopy(biRealKeys, 0, biAllKeys, 0, biRealKeys.length)
    System.arraycopy(biStruct, 0, biAllKeys, biRealKeys.length,
      biStruct.length)
    val (biKeyArr, biProbArr, biBoArr) =
      collapseOrder(biAllKeys, biRealKeys.length, biP, biBo, biBoL)
    var i = 0
    def biIdxOf(prefix: Long): Int = JArrays.binarySearch(biKeyArr, prefix)

    // ---- trigrams: rekey prefixes to final bigram indices
    val triRealKeys = new Array[Long](triPre.n)
    i = 0
    while (i < triPre.n) {
      triRealKeys(i) = key(biIdxOf(triPre.a(i)), triW.a(i))
      i += 1
    }
    val triRealSorted = triRealKeys.clone(); JArrays.sort(triRealSorted)
    val triStruct = structuralMisses(triRealSorted,
      (0 until quadPre.n).iterator.map(j =>
        key(biIdxOf(quadPre.a(j)), quadW3.a(j))))
    val triAllKeys = new Array[Long](triRealKeys.length + triStruct.length)
    System.arraycopy(triRealKeys, 0, triAllKeys, 0, triRealKeys.length)
    System.arraycopy(triStruct, 0, triAllKeys, triRealKeys.length,
      triStruct.length)
    val (triKeyArr, triProbArr, triBoArr) =
      collapseOrder(triAllKeys, triRealKeys.length, triP, triBo, triBoL)
    def triIdxOf(k: Long): Int = JArrays.binarySearch(triKeyArr, k)

    // ---- quadgrams
    val quadKeys = new Array[Long](quadPre.n)
    i = 0
    while (i < quadPre.n) {
      quadKeys(i) =
        key(triIdxOf(key(biIdxOf(quadPre.a(i)), quadW3.a(i))),
          quadW4.a(i))
      i += 1
    }
    val quadSurvive = sortLastWins(quadKeys)
    val quadKeyArr = new Array[Long](quadSurvive.length)
    val quadProbArr = new Array[Double](quadSurvive.length)
    i = 0
    while (i < quadSurvive.length) {
      quadKeyArr(i) = quadKeys(quadSurvive(i))
      quadProbArr(i) = quadP.a(quadSurvive(i))
      i += 1
    }

    new PackedLm(wordsBuf.toArray,
      JArrays.copyOf(upBuf.a, upBuf.n), JArrays.copyOf(uboBuf.a, uboBuf.n),
      biKeyArr, biProbArr, biBoArr, triKeyArr, triProbArr, triBoArr,
      quadKeyArr, quadProbArr)
  }

  /** Serialize to the `.glm` binary layout: magic + version + counts +
    * vocab strings + per-order bulk arrays, big-endian.
    */
  def write(m: PackedLm, path: String): Unit = {
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path), 1 << 20))
    try {
      out.writeBytes(Magic)
      out.writeInt(1)
      out.writeInt(m.words.length)
      out.writeInt(m.biKey.length)
      out.writeInt(m.triKey.length)
      out.writeInt(m.quadKey.length)
      m.words.foreach { w =>
        val b = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(b.length)
        out.write(b)
      }
      m.uniProb.foreach(out.writeDouble)
      m.uniBo.foreach(out.writeDouble)
      m.biKey.foreach(out.writeLong)
      m.biProb.foreach(out.writeDouble)
      m.biBo.foreach(out.writeDouble)
      m.triKey.foreach(out.writeLong)
      m.triProb.foreach(out.writeDouble)
      m.triBo.foreach(out.writeDouble)
      m.quadKey.foreach(out.writeLong)
      m.quadProb.foreach(out.writeDouble)
    } finally out.close()
  }

  /** Load a `.glm`: region-mapped channel reads + bulk ByteBuffer array
    * copies — no per-line parsing, no number formatting, no whole-file
    * heap copy, and no 2 GB file cap (each ARRAY region maps
    * independently; a single order maxes out at Int.MaxValue entries =
    * 16 GB of keys, far past any published LM). The mapped regions are
    * released with the channel; the returned model owns plain heap
    * arrays, so tasks never touch the file again.
    */
  def read(path: String): PackedLm = {
    val p = java.nio.file.Paths.get(path)
    // header + variable-length vocab: one buffered sequential pass,
    // counting bytes so the fixed arrays can be region-mapped after it
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      java.nio.file.Files.newInputStream(p), 1 << 20))
    var n1 = 0; var n2 = 0; var n3 = 0; var n4 = 0
    var words: Array[String] = null
    var pos = 0L
    try {
      val magic = new Array[Byte](8)
      in.readFully(magic)
      require(new String(magic, java.nio.charset.StandardCharsets.US_ASCII)
        == Magic, s"$path is not a $Magic file")
      val ver = in.readInt()
      require(ver == 1, s"unsupported $Magic version $ver")
      n1 = in.readInt(); n2 = in.readInt(); n3 = in.readInt()
      n4 = in.readInt()
      pos = 8L + 4 * 5
      words = new Array[String](n1)
      var i = 0
      while (i < n1) {
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        words(i) = new String(b, java.nio.charset.StandardCharsets.UTF_8)
        pos += 4L + len
        i += 1
      }
    } finally in.close()
    val ch = java.nio.channels.FileChannel.open(p,
      java.nio.file.StandardOpenOption.READ)
    try {
      def map(len: Long): java.nio.MappedByteBuffer = {
        val b = ch.map(java.nio.channels.FileChannel.MapMode.READ_ONLY,
          pos, len)
        pos += len
        b
      }
      def doubles(n: Int): Array[Double] = {
        val a = new Array[Double](n)
        map(n.toLong * 8).asDoubleBuffer().get(a)
        a
      }
      def longs(n: Int): Array[Long] = {
        val a = new Array[Long](n)
        map(n.toLong * 8).asLongBuffer().get(a)
        a
      }
      new PackedLm(words, doubles(n1), doubles(n1),
        longs(n2), doubles(n2), doubles(n2),
        longs(n3), doubles(n3), doubles(n3),
        longs(n4), doubles(n4))
    } finally ch.close()
  }

  /** Sniff the first 8 bytes for the `.glm` magic. */
  def isPacked(path: String): Boolean = {
    val in = new java.io.DataInputStream(new java.io.FileInputStream(path))
    try {
      val head = new Array[Byte](8)
      in.readFully(head) // a bare read may legally return < 8 bytes
      new String(head, java.nio.charset.StandardCharsets.US_ASCII) == Magic
    } catch {
      case _: java.io.EOFException => false // shorter than the magic
    } finally in.close()
  }

  /** Compile a text ARPA file straight to a `.glm` — streaming: the
    * text is never materialized as a string-keyed model, so memory
    * scales with the PACKED output (plus one transient boxed index
    * array per order), not with gram-string churn.
    */
  def compileFile(arpaPath: String, outPath: String): PackedLm = {
    val src = scala.io.Source.fromFile(arpaPath, "UTF-8")
    val packed = try compileLines(src.getLines()) finally src.close()
    write(packed, outPath)
    packed
  }
}

/** `build_binary`-style CLI: compile a text ARPA once, load it
  * everywhere fast. Prints one JSON line with the parse/compile/load
  * timings so the speedup is a measured artifact, not a claim.
  *
  * Usage: `runMain graft.scoring.CompileLm in.arpa out.glm`
  */
object CompileLm {
  private def settledHeap(): Long = {
    val rt = Runtime.getRuntime
    var prev = Long.MaxValue
    var cur = rt.totalMemory - rt.freeMemory
    var i = 0
    while (cur < prev && i < 8) { // GC until the reading stops shrinking
      prev = cur
      System.gc()
      Thread.sleep(50)
      cur = rt.totalMemory - rt.freeMemory
      i += 1
    }
    cur
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CompileLm <in.arpa> <out.glm> [--reuse|--stream-only]")
    // --reuse: skip the compile step when out.glm already exists (re-
    //   measure loads without re-paying a multi-minute big-model compile)
    // --stream-only: never build the text-map model — for ARPAs too big
    //   to hold as string-keyed hash maps (the streaming compiler's
    //   whole point); skips the parse-time and heap comparisons
    val flag = if (args.length > 2) args(2) else ""
    val reuse = flag == "--reuse" && new java.io.File(args(1)).exists()
    val streamOnly = flag == "--stream-only"
    val t0 = System.nanoTime
    val textParseS =
      if (streamOnly) -1.0
      else {
        ArpaModel.fromFile(args(0))
        (System.nanoTime - t0) / 1e9
      }
    val t1 = System.nanoTime
    if (!reuse) PackedLm.compileFile(args(0), args(1)) // streaming path
    val t2 = System.nanoTime
    val loaded = PackedLm.read(args(1))
    val t3 = System.nanoTime
    val n = loaded.packedCounts
    // rough retained-heap comparison (GC-settled deltas): what one
    // executor JVM pays to keep each representation resident
    var textMb = -1.0
    var packedMb = -1.0
    if (!streamOnly) {
      val base = settledHeap()
      var keepText: ArpaModel = ArpaModel.fromFile(args(0))
      val withText = settledHeap()
      // read the ref AFTER the sample so the JIT can't collect the model
      // during settledHeap's GCs (JLS 12.6.1 reachability narrowing)
      require(keepText.vocabSize >= 0)
      keepText = null
      var keepPacked: PackedLm = PackedLm.read(args(1))
      keepPacked.score("warm the lazy vocab index")
      val afterSwap = settledHeap()
      textMb = (withText - base) / 1e6
      packedMb = (afterSwap - base) / 1e6
      require(keepPacked != null) // keep the ref live through the read
    }
    println(s"""{"arpa_parse_s":$textParseS,""" +
      s""""compile_stream_s":${(t2 - t1) / 1e9},""" +
      s""""glm_load_s":${(t3 - t2) / 1e9},""" +
      s""""text_heap_mb_approx":$textMb,""" +
      s""""packed_heap_mb_approx":$packedMb,""" +
      s""""vocab":${loaded.vocabSize},"entries":[${n._1},${n._2},""" +
      s"""${n._3},${n._4}],"out":"${args(1)}"}""")
  }
}
