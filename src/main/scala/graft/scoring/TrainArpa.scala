package graft.scoring

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Offline generator for the shipped bigram ARPA model
  * (`src/main/resources/graft/graft-en.arpa`). Run once, commit the output:
  *
  *   sbt "runMain graft.scoring.TrainArpa"
  *
  * Corpus: English prose already present in the build image — Debian
  * package copyright files and common licenses plus the Spark
  * README/LICENSE/NOTICE (all public, redistributable text). Every line is
  * normalized with the SAME [[CcNetNormalizer]] the scorer applies, so
  * training and scoring tokenizations cannot diverge.
  *
  * Estimation: interpolated absolute discounting (D = 0.75),
  *   p(w|h) = max(c(hw)−D, 0)/c(h) + λ(h)·p₁(w),  λ(h) = D·K(h)/c(h)
  * with K(h) = distinct continuations of h; ARPA backoff(h) = log10 λ(h).
  * Words below `MinCount` fold into `<unk>` BEFORE bigram counting;
  * bigrams below `MinBigram` are pruned from the table (their mass rides
  * the backoff — approximately normalized, which is fine for threshold
  * filtering; this is not a decoder).
  */
object TrainArpa {

  val MinCount = 5
  val MinBigram = 3
  val D = 0.75

  def corpusFiles(): Seq[Path] = {
    def ls(dir: String, name: String => Boolean): Seq[Path] = {
      val d = Paths.get(dir)
      if (!Files.isDirectory(d)) return Seq.empty
      Files.list(d).iterator().asScala.toSeq.sortBy(_.toString)
        .flatMap { p =>
          if (Files.isDirectory(p)) {
            val c = p.resolve("copyright")
            if (name("copyright") && Files.isRegularFile(c)) Some(c) else None
          } else if (Files.isRegularFile(p) && name(p.getFileName.toString))
            Some(p)
          else None
        }
    }
    ls("/usr/share/doc", _ == "copyright") ++
      ls("/usr/share/common-licenses", _ => true) ++
      Seq("/opt/spark/README.md", "/opt/spark/LICENSE", "/opt/spark/NOTICE")
        .map(Paths.get(_)).filter(Files.isRegularFile(_))
  }

  def main(args: Array[String]): Unit = {
    val out = Paths.get(args.headOption
      .getOrElse("src/main/resources/graft/graft-en.arpa"))

    val rawCount = mutable.HashMap.empty[String, Long]
    val sentences = mutable.ArrayBuffer.empty[Array[String]]
    corpusFiles().foreach { p =>
      val text = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      text.split('\n').foreach { rawLine =>
        val norm = CcNetNormalizer.normalize(rawLine)
        val words = norm.split("\\s+").filter(_.nonEmpty)
        if (words.length >= 2) {
          sentences += words
          words.foreach(w => rawCount(w) = rawCount.getOrElse(w, 0L) + 1)
        }
      }
    }
    println(s"[train] ${sentences.length} lines, " +
      s"${rawCount.size} raw word types, ${rawCount.valuesIterator.sum} tokens")

    // vocab: frequent tokens, minus addresses/URL-ish strings (emails and
    // long paths are frequent in copyright files but are noise as language
    // model events — they fold into <unk> like any rare token)
    val vocab = rawCount.iterator
      .filter { case (w, c) =>
        c >= MinCount && w.length <= 30 &&
          !w.contains('@') && !w.contains('/')
      }
      .map(_._1).toSet
    def map(w: String): String = if (vocab(w)) w else "<unk>"

    // final-vocab unigram + bigram counts (<s> only as context; </s> as event)
    val uni = mutable.HashMap.empty[String, Long]
    val bi = mutable.HashMap.empty[(String, String), Long]
    val ctxTotal = mutable.HashMap.empty[String, Long]
    sentences.foreach { words =>
      var h = "<s>"
      (words.iterator.map(map) ++ Iterator.single("</s>")).foreach { w =>
        uni(w) = uni.getOrElse(w, 0L) + 1
        bi((h, w)) = bi.getOrElse((h, w), 0L) + 1
        ctxTotal(h) = ctxTotal.getOrElse(h, 0L) + 1
        h = w
      }
    }
    val total = uni.valuesIterator.sum.toDouble
    // Type-averaged <unk>: the folded mass belongs to ~|folded types|
    // distinct unseen words — charging it as ONE type's probability would
    // make OOV soup look more fluent than real prose (measured: all-OOV
    // gibberish at ppl≈4 vs 25 for natural text). Divide the <unk> event
    // probability by the folded type count wherever <unk> is the event.
    val foldedTypes =
      math.max(rawCount.valuesIterator.count(_ < MinCount), 1).toDouble
    val p1 = uni.view.map { case (w, c) =>
      w -> (if (w == "<unk>") c / total / foldedTypes else c / total)
    }.toMap

    val kept = bi.iterator.filter(_._2 >= MinBigram).toSeq
    val contBy = kept.groupBy(_._1._1).map { case (h, g) => h -> g.size }
    def lambda(h: String): Double =
      ctxTotal.get(h) match {
        case Some(c) if c > 0 =>
          math.max(D * contBy.getOrElse(h, 0) / c.toDouble, 1e-10)
        case _ => 1.0
      }

    val sb = new StringBuilder
    def log10(x: Double): String = f"${math.log10(x)}%.6f"
    val uniWords = (uni.keySet ++ Set("<s>")).toSeq.sorted
    sb ++= "\\data\\\n"
    sb ++= s"ngram 1=${uniWords.size}\n"
    sb ++= s"ngram 2=${kept.size}\n\n"
    sb ++= "\\1-grams:\n"
    uniWords.foreach { w =>
      val p = if (w == "<s>") "-99.000000" else log10(p1(w))
      sb ++= s"$p\t$w\t${log10(lambda(w))}\n"
    }
    sb ++= "\n\\2-grams:\n"
    kept.sortBy(_._1).foreach { case ((h, w), c) =>
      val raw = math.max(c - D, 0.0) / ctxTotal(h) + lambda(h) * p1(w)
      val p = if (w == "<unk>") raw / foldedTypes else raw
      sb ++= s"${log10(p)}\t$h $w\n"
    }
    sb ++= "\n\\end\\\n"

    Files.createDirectories(out.getParent)
    Files.write(out, sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[train] wrote $out: ${uniWords.size} unigrams, " +
      s"${kept.size} bigrams, ${Files.size(out) / 1024} KiB")
  }
}
