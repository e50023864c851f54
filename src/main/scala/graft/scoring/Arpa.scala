package graft.scoring

import java.util.{HashMap => JHashMap}

/** ARPA-format word n-gram language model (order 4) with KenLM-style
  * backoff queries — the self-contained stand-in for the reference's
  * native KenLM 5-gram (chat_data_pipeline/kenlm_model.py:122-142; the
  * reference downloads `*.arpa.bin` models at runtime, which a zero-egress
  * build cannot). The shipped resource `graft/graft-en.arpa` is trained by
  * [[TrainArpa]] on public license/README/manual English text present in
  * the build image, normalized with the SAME [[CcNetNormalizer]] used at
  * scoring time.
  *
  * Query semantics (standard ARPA backoff, = kenlm), log10 space:
  *   p(w|h₃h₂h₁) = p4(h₃ h₂ h₁ w)                 if the 4-gram is listed
  *               = backoff₃(h₃ h₂ h₁) + p(w|h₂h₁) otherwise
  *   p(w|h₂h₁)   = p3(h₂ h₁ w)                    if the trigram is listed
  *               = backoff₂(h₂ h₁) + p(w|h₁)      otherwise
  *   p(w|h)      = p2(h w)                        if the bigram is listed
  *               = backoff₁(h) + p1(w)            otherwise
  * A missing backoff weight is 0 (log10 1). OOV words hit the `<unk>`
  * unigram; sentence score is log10 P(w1|<s>) + log10 P(w2|<s> w1) + … +
  * log10 P(</s>|h₃ h₂ h₁). Order-2/3 files load fine — the higher-order
  * tables are empty and every query backs off through them at weight 0.
  */
final class ArpaModel(
    uniLog: JHashMap[String, java.lang.Double],
    backoffLog: JHashMap[String, java.lang.Double],
    biLog: JHashMap[String, java.lang.Double],
    biBackoffLog: JHashMap[String, java.lang.Double],
    triLog: JHashMap[String, java.lang.Double],
    triBackoffLog: JHashMap[String, java.lang.Double],
    quadLog: JHashMap[String, java.lang.Double]) extends LmModel {

  val Unk = "<unk>"
  val Bos = "<s>"
  val Eos = "</s>"

  def vocabSize: Int = uniLog.size
  def bigramCount: Int = biLog.size
  def trigramCount: Int = triLog.size
  def quadgramCount: Int = quadLog.size

  /** Table dumps (gram → prob, gram → optional backoff) for exporting the
    * model AS DATA — the correctness oracle materializes these to parquet
    * and replays the backoff arithmetic in SQL.
    */
  private[graft] def uniRows: Seq[(String, Double, Option[Double])] = {
    import scala.jdk.CollectionConverters._
    uniLog.asScala.toSeq.map { case (w, p) =>
      (w, p.doubleValue(), Option(backoffLog.get(w)).map(_.doubleValue()))
    }
  }
  private[graft] def biRows: Seq[(String, Double, Option[Double])] = {
    import scala.jdk.CollectionConverters._
    biLog.asScala.toSeq.map { case (g, p) =>
      (g, p.doubleValue(), Option(biBackoffLog.get(g)).map(_.doubleValue()))
    }
  }
  private[graft] def triRows: Seq[(String, Double, Option[Double])] = {
    import scala.jdk.CollectionConverters._
    triLog.asScala.toSeq.map { case (g, p) =>
      (g, p.doubleValue(), Option(triBackoffLog.get(g)).map(_.doubleValue()))
    }
  }
  private[graft] def quadRows: Seq[(String, Double)] = {
    import scala.jdk.CollectionConverters._
    quadLog.asScala.toSeq.map { case (g, p) => (g, p.doubleValue()) }
  }

  private def inVocab(w: String): String =
    if (uniLog.containsKey(w)) w else Unk

  /** log10 P(w | h) at the bigram level; h must already be vocab-mapped. */
  def logProb(h: String, w0: String): Double = {
    val w = inVocab(w0)
    val bi = biLog.get(h + " " + w)
    if (bi != null) bi.doubleValue()
    else {
      val bo = backoffLog.get(h)
      (if (bo == null) 0.0 else bo.doubleValue()) +
        uniLog.get(w).doubleValue()
    }
  }

  /** log10 P(w | h2 h1); pass `h2 = null` for the first event after
    * `<s>` (bigram context only). h2/h1 must already be vocab-mapped.
    */
  def logProb(h2: String, h1: String, w0: String): Double = {
    if (h2 == null) return logProb(h1, w0)
    val w = inVocab(w0)
    val tri = triLog.get(h2 + " " + h1 + " " + w)
    if (tri != null) tri.doubleValue()
    else {
      val bo = biBackoffLog.get(h2 + " " + h1)
      (if (bo == null) 0.0 else bo.doubleValue()) + logProb(h1, w)
    }
  }

  /** log10 P(w | h3 h2 h1); pass `h3 = null` while the history is shorter
    * than three events. h3/h2/h1 must already be vocab-mapped.
    */
  def logProb(h3: String, h2: String, h1: String, w0: String): Double = {
    if (h3 == null) return logProb(h2, h1, w0)
    val w = inVocab(w0)
    val q = quadLog.get(h3 + " " + h2 + " " + h1 + " " + w)
    if (q != null) q.doubleValue()
    else {
      val bo = triBackoffLog.get(h3 + " " + h2 + " " + h1)
      (if (bo == null) 0.0 else bo.doubleValue()) + logProb(h2, h1, w)
    }
  }

  /** KenLM `model.score(line)`: total log10 probability of the
    * whitespace-tokenized line, `<s>` context, `</s>` included.
    */
  def score(line: String): Double =
    scoreTokens(line.split("\\s+").iterator.filter(_.nonEmpty))

  /** [[score]] over an explicit token sequence — the seam the
    * external-LM path uses to feed SentencePiece-segmented pieces
    * through the identical backoff chain (VERDICT r15 #1).
    */
  def scoreTokens(tokens: Iterator[String]): Double = {
    var h3: String = null
    var h2: String = null
    var h1 = Bos
    var sum = 0.0
    while (tokens.hasNext) {
      val w = tokens.next()
      sum += logProb(h3, h2, h1, w)
      h3 = h2
      h2 = h1
      h1 = inVocab(w)
    }
    sum + logProb(h3, h2, h1, Eos)
  }
}

object ArpaModel {

  /** Parse an ARPA file (`\1-grams:` prob\tword[\tbackoff],
    * `\2-grams:` prob\t"w1 w2"[\tbackoff], `\3-grams:`
    * prob\t"w1 w2 w3"[\tbackoff], `\4-grams:` prob\t"w1 w2 w3 w4"),
    * all values log10. Lower-order files (no `\3-grams:`/`\4-grams:`
    * section) load fine — queries back off through the missing tables.
    */
  def parse(lines: Iterator[String]): ArpaModel = {
    val uni = new JHashMap[String, java.lang.Double]()
    val bo = new JHashMap[String, java.lang.Double]()
    val bi = new JHashMap[String, java.lang.Double]()
    val bo2 = new JHashMap[String, java.lang.Double]()
    val tri = new JHashMap[String, java.lang.Double]()
    val bo3 = new JHashMap[String, java.lang.Double]()
    val quad = new JHashMap[String, java.lang.Double]()
    var section = 0
    lines.foreach { raw =>
      val line = raw.trim
      if (line == "\\1-grams:") section = 1
      else if (line == "\\2-grams:") section = 2
      else if (line == "\\3-grams:") section = 3
      else if (line == "\\4-grams:") section = 4
      else if (line == "\\end\\") section = 0
      else if (line.nonEmpty && section > 0) {
        val parts = line.split("\t")
        if (section == 1 && parts.length >= 2) {
          uni.put(parts(1), parts(0).toDouble)
          if (parts.length >= 3) bo.put(parts(1), parts(2).toDouble)
        } else if (section == 2 && parts.length >= 2) {
          bi.put(parts(1), parts(0).toDouble)
          if (parts.length >= 3) bo2.put(parts(1), parts(2).toDouble)
        } else if (section == 3 && parts.length >= 2) {
          tri.put(parts(1), parts(0).toDouble)
          if (parts.length >= 3) bo3.put(parts(1), parts(2).toDouble)
        } else if (section == 4 && parts.length >= 2) {
          quad.put(parts(1), parts(0).toDouble)
        }
      }
    }
    new ArpaModel(uni, bo, bi, bo2, tri, bo3, quad)
  }

  def fromResource(path: String): Option[ArpaModel] = {
    val in = getClass.getClassLoader.getResourceAsStream(path)
    if (in == null) None
    else {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try Some(parse(src.getLines())) finally src.close()
    }
  }

  /** Ingest an EXTERNAL ARPA file at runtime (VERDICT r15 #1: the
    * reference scores with a downloaded KenLM model,
    * kenlm_model.py:18-29 — until r16 nothing could load a model that
    * wasn't compiled into the jar). Standard text ARPA only; a
    * kenlm-binary `.arpa.bin` must be dumped back to text first. For
    * fast repeated loads compile the text once to graft's own `.glm`
    * ([[CompileLm]]) and point `lm_path` at that instead —
    * [[ExternalLm.loadModel]] sniffs the format.
    */
  def fromFile(path: String): ArpaModel = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }
}
