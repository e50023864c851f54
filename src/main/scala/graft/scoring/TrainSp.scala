package graft.scoring

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable

/** Offline generator for the shipped SentencePiece-style piece table AND
  * the piece-level ARPA LM trained over its segmentation — the pair that
  * exercises the external-LM ingestion path end-to-end
  * (`src/main/resources/graft/graft-en.pieces` + `graft-en-sp.arpa`).
  * Run once, commit the outputs:
  *
  *   sbt "runMain graft.scoring.TrainSp"
  *
  * Mirrors the reference's model pairing: its KenLM model is trained
  * over SentencePiece PIECES, so tokenizer and LM ship together and the
  * LM's vocabulary is piece strings (kenlm_model.py:18-29,122-142).
  * Corpus and normalization are [[TrainArpa]]'s exactly; the piece
  * inventory is frequency-selected from `▁`-marked word substrings
  * (every piece is a prefix-or-infix of some corpus word with at most a
  * leading `▁`, so greedy matches can never span word boundaries), and
  * the LM estimation is [[TrainArpa.run]] verbatim with the tokenizer
  * swapped for [[SentencePieceTable.segmentLine]].
  */
object TrainSp {

  val MaxPieceLen = 8
  /** Multi-codepoint piece budget (single codepoints ride along free —
    * the greedy matcher falls back to them anyway; they are listed for
    * vocab-format fidelity).
    */
  val MaxPieces = 6000
  val MinPieceCount = 50L

  def main(args: Array[String]): Unit = {
    val piecesOut = Paths.get(args.headOption
      .getOrElse("src/main/resources/graft/graft-en.pieces"))
    val arpaOut = Paths.get(args.drop(1).headOption
      .getOrElse("src/main/resources/graft/graft-en-sp.arpa"))
    val files = TrainArpa.corpusFiles()

    // pass 1: word frequencies (the piece candidates' weight source)
    val wordCount = mutable.HashMap.empty[String, Long]
    files.foreach { p =>
      val text = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      text.split('\n').foreach { rawLine =>
        TrainArpa.wordTokens(CcNetNormalizer.normalize(rawLine))
          .foreach(w => wordCount(w) = wordCount.getOrElse(w, 0L) + 1)
      }
    }

    // candidate pieces: all codepoint substrings of ▁word, weighted by
    // word frequency; lengths 1..MaxPieceLen
    val candCount = mutable.HashMap.empty[String, Long]
    wordCount.foreach { case (w, c) =>
      val cps = (SentencePieceTable.Boundary + w).codePoints().toArray
      var start = 0
      while (start < cps.length) {
        var len = 1
        val maxLen = math.min(MaxPieceLen, cps.length - start)
        while (len <= maxLen) {
          val cand = new String(cps, start, len)
          candCount(cand) = candCount.getOrElse(cand, 0L) + c
          len += 1
        }
        start += 1
      }
    }

    // deterministic selection: singles (all frequent codepoints) +
    // top-MaxPieces multis by (count desc, piece asc)
    val singles = candCount.iterator
      .filter { case (p, c) =>
        p.codePointCount(0, p.length) == 1 && c >= MinPieceCount
      }.toSeq.sortBy { case (p, c) => (-c, p) }
    val multis = candCount.iterator
      .filter { case (p, c) =>
        p.codePointCount(0, p.length) >= 2 && c >= MinPieceCount
      }.toSeq.sortBy { case (p, c) => (-c, p) }.take(MaxPieces)

    // ---- EM calibration (r18, VERDICT r17 ask #3) -------------------
    // The raw substring counts above OVERLAP (every occurrence of
    // "▁the" also counts "▁th", "th", "he", ...), so log10(count/total)
    // is a log-frequency, not a unigram log-prob — viterbi mode ran on
    // miscalibrated scores (COVERAGE.md caveat). Hard-EM fixes that
    // with the spm-shaped loop, fixed inventory: E-step = Viterbi
    // segmentation of every word TYPE under current scores (weighted by
    // word frequency — exactly the corpus token stream, since pieces
    // never span words); M-step = piece prob ∝ usage count (+0.5
    // pseudo-count so unused pieces keep a finite floor instead of
    // dropping, which would change the piece SET and thus the greedy
    // segmentation the f2_external_lm oracle pins — greedy consults
    // only the set, so calibration is oracle-invariant by construction).
    val order = (singles ++ multis).map(_._1)
    val initTotal = (singles ++ multis).iterator.map(_._2).sum.toDouble
    var scores: Map[String, Double] = (singles ++ multis).map { case (p, c)
      => p -> math.log10(c / initTotal) }.toMap
    val EmRounds = 3
    for (round <- 1 to EmRounds) {
      // table built IN MEMORY, full precision — a %.6f string round-trip
      // here would truncate and, worse, be locale-sensitive (a
      // comma-decimal default locale would parse every score as 0.0 and
      // silently degenerate the calibration)
      val jm = new java.util.HashMap[String, java.lang.Double]()
      var maxLen = 1
      order.foreach { p =>
        jm.put(p, scores(p))
        maxLen = math.max(maxLen, p.codePointCount(0, p.length))
      }
      val tbl = new SentencePieceTable(jm, maxLen)
      val use = mutable.HashMap.empty[String, Long]
      var unkCps = 0L
      wordCount.foreach { case (w, c) =>
        tbl.segmentViterbi(w).foreach { p =>
          if (scores.contains(p)) use(p) = use.getOrElse(p, 0L) + c
          else unkCps += c // codepoint outside the inventory → unk floor
        }
      }
      val zero = order.count(p => !use.contains(p))
      val tot = use.valuesIterator.sum.toDouble + 0.5 * zero
      val next = order.map { p =>
        p -> math.log10(math.max(use.getOrElse(p, 0L).toDouble, 0.5) / tot)
      }.toMap
      val meanDelta = order.iterator
        .map(p => math.abs(next(p) - scores(p))).sum / order.size
      println(f"[trainsp] EM round $round: ${use.size} pieces used, " +
        f"$zero floor-smoothed, unk cps $unkCps, mean |Δlog10| $meanDelta%.4f")
      scores = next
    }

    val sb = new StringBuilder(1 << 20)
    // Locale.ROOT: the f-interpolator formats with the default locale,
    // and a comma decimal separator would ship a file every parser
    // (ours included) reads as all-zero scores
    order.foreach { p =>
      sb ++= p; sb += '\t'
      sb ++= String.format(java.util.Locale.ROOT, "%.6f",
        Double.box(scores(p)))
      sb += '\n'
    }
    Files.createDirectories(piecesOut.getParent)
    Files.write(piecesOut, sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[trainsp] wrote $piecesOut: ${singles.size} single + " +
      s"${multis.size} multi pieces (EM-calibrated, $EmRounds rounds), " +
      s"${Files.size(piecesOut) / 1024} KiB")

    // the piece-level LM: TrainArpa's estimation over the segmentation's
    // token stream. Piece tokens are denser than words (smaller vocab,
    // higher per-type counts), so the higher-order prune thresholds rise
    // to keep the shipped resource a few MB.
    val table = SentencePieceTable.parse(
      scala.io.Source.fromString(sb.toString).getLines())
    TrainArpa.run(arpaOut,
      tokenize = line => table.segmentLine(line).toArray,
      minBigram = 5, minTrigram = 8, minQuad = 10)
  }
}
