package graft.scoring

import java.util.{HashMap => JHashMap}

/** SentencePiece piece-table tokenizer (VERDICT r15 #1): the reference's
  * perplexity path tokenizes with a downloaded SentencePiece model
  * before KenLM scoring (chat_data_pipeline/kenlm_model.py:122-142);
  * this is the ingestible stand-in built on the PUBLIC vocab format —
  * `spm_export_vocab`'s `piece\tscore` lines with the U+2581 `▁`
  * word-boundary convention — so a user can point the engine at their
  * own exported piece table and score documents over the same token
  * stream their KenLM model was trained on.
  *
  * Segmentation is GREEDY LONGEST-MATCH over the `▁`-marked line
  * (`▁` + line with spaces replaced by `▁`): at each position take the
  * longest piece in the table; an unmatched character is emitted as a
  * single-codepoint token (the LM's `<unk>` mapping absorbs it — the
  * same place SentencePiece's own unk piece lands). Greedy maximal
  * munch rather than unigram Viterbi: deterministic, scan-order, and
  * exactly replayable in the correctness oracle's SQL; the scores in
  * the table are carried for format fidelity (and a future Viterbi
  * mode), not consulted by the matcher.
  *
  * Codepoint-exact: the matcher indexes CODE POINTS, not UTF-16 chars,
  * so astral-plane input segments identically to engines (like the
  * DuckDB oracle) whose string positions are codepoint-based.
  */
final class SentencePieceTable(
    pieces: JHashMap[String, java.lang.Double],
    val maxPieceLen: Int) extends Serializable {

  def size: Int = pieces.size

  def contains(piece: String): Boolean = pieces.containsKey(piece)

  def score(piece: String): Option[Double] =
    Option(pieces.get(piece)).map(_.doubleValue())

  /** Table dump (piece, codepoint length, score) for exporting the
    * tokenizer AS DATA — the correctness oracle materializes it to
    * parquet and replays greedy longest-match in SQL.
    */
  private[graft] def rows: Seq[(String, Int, Double)] = {
    import scala.jdk.CollectionConverters._
    pieces.asScala.toSeq.map { case (p, s) =>
      (p, p.codePointCount(0, p.length), s.doubleValue())
    }
  }

  /** Unigram-Viterbi segmentation — the mode real SentencePiece unigram
    * models decode with: maximize the SUM OF PIECE SCORES over all
    * segmentations (DP over codepoint positions; an unmatched codepoint
    * costs [[SentencePieceTable.UnkScore]], far below any trained piece,
    * so known pieces always win where one exists). Ties break toward
    * the longer final piece, so unambiguous tables segment identically
    * to [[segmentLine]]. The correctness ORACLE pins the greedy mode
    * (f2_external_lm); Viterbi is the fidelity mode for users whose
    * KenLM model was trained over true unigram-SP pieces — pick it with
    * `lm_segment: viterbi` in the check_perplexity config.
    */
  def segmentViterbi(line: String): Seq[String] = {
    if (line == null || line.isEmpty) return Seq.empty
    val marked = SentencePieceTable.Boundary +
      line.replace(' ', SentencePieceTable.Boundary)
    val cps = marked.codePoints().toArray
    val n = cps.length
    val best = new Array[Double](n + 1)
    val bLen = new Array[Int](n + 1)
    var pos = 1
    while (pos <= n) {
      // single-codepoint fallback always available (a table-listed char
      // contributes its real score; an unknown one the unk penalty)
      val single = new String(cps, pos - 1, 1)
      best(pos) = best(pos - 1) +
        score(single).getOrElse(SentencePieceTable.UnkScore)
      bLen(pos) = 1
      var len = 2
      val maxL = math.min(maxPieceLen, pos)
      while (len <= maxL) {
        val cand = new String(cps, pos - len, len)
        score(cand) match {
          case Some(sc) =>
            val v = best(pos - len) + sc
            if (v > best(pos) || (v == best(pos) && len > bLen(pos))) {
              best(pos) = v
              bLen(pos) = len
            }
          case None =>
        }
        len += 1
      }
      pos += 1
    }
    var p = n
    var acc = List.empty[String]
    while (p > 0) {
      val l = bLen(p)
      acc = new String(cps, p - l, l) :: acc
      p -= l
    }
    acc
  }

  /** Total segmentation score under this table's unigram model (the
    * quantity [[segmentViterbi]] maximizes) — exposed for the
    * optimality property spec.
    */
  private[graft] def segScore(pieces: Seq[String]): Double =
    pieces.iterator
      .map(p => score(p).getOrElse(SentencePieceTable.UnkScore)).sum

  /** Greedy longest-match segmentation of one (already-normalized)
    * line. Empty line → no pieces, mirroring
    * `sp.encode_as_pieces("") == []`.
    */
  def segmentLine(line: String): Seq[String] = {
    if (line == null || line.isEmpty) return Seq.empty
    val marked = SentencePieceTable.Boundary +
      line.replace(' ', SentencePieceTable.Boundary)
    // codepoint array: substring positions must agree with
    // codepoint-indexed replay engines (see class doc)
    val cps = marked.codePoints().toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < cps.length) {
      var len = math.min(maxPieceLen, cps.length - pos)
      var matched: String = null
      while (matched == null && len >= 1) {
        val cand = new String(cps, pos, len)
        if (len == 1 || pieces.containsKey(cand)) matched = cand
        else len -= 1
      }
      out += matched
      pos += len
    }
    out.toSeq
  }
}

object SentencePieceTable {
  /** U+2581 LOWER ONE EIGHTH BLOCK — SentencePiece's word-boundary
    * marker.
    */
  val Boundary = '▁'

  /** Viterbi score of a codepoint no piece covers — far below any
    * trained piece score (spm vocab scores are log-probs, rarely under
    * −20), mirroring SentencePiece's unk-piece floor.
    */
  val UnkScore = -100.0

  /** Parse `piece\tscore` lines (the `spm_export_vocab` text format).
    * Blank lines skipped; a missing score column loads as 0.0 (some
    * exports list control pieces scoreless).
    */
  def parse(lines: Iterator[String]): SentencePieceTable = {
    val m = new JHashMap[String, java.lang.Double]()
    var maxLen = 1
    lines.foreach { raw =>
      if (raw.nonEmpty) {
        val tab = raw.indexOf('\t')
        val (piece, score) =
          if (tab < 0) (raw, 0.0)
          else (raw.substring(0, tab),
            try raw.substring(tab + 1).trim.toDouble
            catch { case _: NumberFormatException => 0.0 })
        if (piece.nonEmpty) {
          m.put(piece, score)
          maxLen = math.max(maxLen, piece.codePointCount(0, piece.length))
        }
      }
    }
    new SentencePieceTable(m, maxLen)
  }

  def fromFile(path: String): SentencePieceTable = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  def fromResource(path: String): Option[SentencePieceTable] = {
    val in = getClass.getClassLoader.getResourceAsStream(path)
    if (in == null) None
    else {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try Some(parse(src.getLines())) finally src.close()
    }
  }
}
