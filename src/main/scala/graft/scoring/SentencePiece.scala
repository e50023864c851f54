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
