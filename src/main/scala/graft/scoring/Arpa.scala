package graft.scoring

import java.util.{HashMap => JHashMap}

/** ARPA-format word n-gram language model (order 2) with KenLM-style
  * backoff queries — the self-contained stand-in for the reference's
  * native KenLM 5-gram (chat_data_pipeline/kenlm_model.py:122-142; the
  * reference downloads `*.arpa.bin` models at runtime, which a zero-egress
  * build cannot). The shipped resource `graft/graft-en.arpa` is trained by
  * [[TrainArpa]] on public license/README English text present in the
  * build image, normalized with the SAME [[CcNetNormalizer]] used at
  * scoring time.
  *
  * Query semantics (standard ARPA backoff, = kenlm):
  *   p(w|h) = p2(h, w)                 if the bigram is listed
  *          = backoff(h) + p1(w)       otherwise (log10 space)
  * OOV words hit the `<unk>` unigram; sentence score is
  * log10 P(w1|<s>) + … + log10 P(</s>|w_n).
  */
final class ArpaModel(
    uniLog: JHashMap[String, java.lang.Double],
    backoffLog: JHashMap[String, java.lang.Double],
    biLog: JHashMap[String, java.lang.Double]) extends Serializable {

  val Unk = "<unk>"
  val Bos = "<s>"
  val Eos = "</s>"

  def vocabSize: Int = uniLog.size
  def bigramCount: Int = biLog.size

  private def inVocab(w: String): String =
    if (uniLog.containsKey(w)) w else Unk

  /** log10 P(w | h); h must already be vocab-mapped. */
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

  /** KenLM `model.score(line)`: total log10 probability of the
    * whitespace-tokenized line, `<s>` context, `</s>` included.
    */
  def score(line: String): Double = {
    var h = Bos
    var sum = 0.0
    val it = line.split("\\s+").iterator.filter(_.nonEmpty)
    while (it.hasNext) {
      val w = it.next()
      sum += logProb(h, w)
      h = inVocab(w)
    }
    sum + logProb(h, Eos)
  }
}

object ArpaModel {

  /** Parse an ARPA file (`\1-grams:` prob\tword[\tbackoff],
    * `\2-grams:` prob\tw1 w2), all values log10.
    */
  def parse(lines: Iterator[String]): ArpaModel = {
    val uni = new JHashMap[String, java.lang.Double]()
    val bo = new JHashMap[String, java.lang.Double]()
    val bi = new JHashMap[String, java.lang.Double]()
    var section = 0
    lines.foreach { raw =>
      val line = raw.trim
      if (line == "\\1-grams:") section = 1
      else if (line == "\\2-grams:") section = 2
      else if (line == "\\end\\") section = 0
      else if (line.nonEmpty && section > 0) {
        val parts = line.split("\t")
        if (section == 1 && parts.length >= 2) {
          uni.put(parts(1), parts(0).toDouble)
          if (parts.length >= 3) bo.put(parts(1), parts(2).toDouble)
        } else if (section == 2 && parts.length >= 2) {
          bi.put(parts(1), parts(0).toDouble)
        }
      }
    }
    new ArpaModel(uni, bo, bi)
  }

  def fromResource(path: String): Option[ArpaModel] = {
    val in = getClass.getClassLoader.getResourceAsStream(path)
    if (in == null) None
    else {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try Some(parse(src.getLines())) finally src.close()
    }
  }
}
