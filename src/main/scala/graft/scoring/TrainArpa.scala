package graft.scoring

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Offline generator for the shipped 4-GRAM ARPA model
  * (`src/main/resources/graft/graft-en.arpa`). Run once, commit the output:
  *
  *   sbt "runMain graft.scoring.TrainArpa"
  *
  * Corpus: English prose already present in the build image — Debian
  * package copyright files, common licenses, the Spark
  * README/LICENSE/NOTICE, plus (since r4, to feed the higher orders)
  * package READMEs, .txt and .md docs under /usr/share/doc and the vim
  * user-manual pages (public, redistributable text; per-file and total caps
  * keep one giant file from dominating). Every line is normalized with the
  * SAME [[CcNetNormalizer]] the scorer applies, so training and scoring
  * tokenizations cannot diverge.
  *
  * Estimation: interpolated absolute discounting (D = 0.75), recursive
  * over orders (Chen & Goodman 1998's formulation):
  *   p₂(w|h)  = max(c(hw)−D, 0)/c(h·) + λ₁(h)·p₁(w)
  *   p₃(w|h₂h₁) = max(c(h₂h₁w)−D, 0)/c(h₂h₁·) + λ₂(h₂h₁)·p₂(w|h₁)
  *   p₄(w|h₃h₂h₁) = max(c(h₃h₂h₁w)−D, 0)/c(h₃h₂h₁·) + λ₃(h₃h₂h₁)·p₃(w|h₂h₁)
  * with λ(h) = D·|{w: kept hw}|/c(h·); ARPA backoff(h) = log10 λ(h).
  * Words below `MinCount` fold into `<unk>` BEFORE n-gram counting;
  * n-grams below their order's min count (or whose context n−1-gram was
  * pruned) are dropped from the table — their mass rides the backoff
  * (approximately normalized, which is fine for threshold filtering; this
  * is not a decoder). The `<unk>` event probability is type-averaged at
  * every order (see below). The 4-gram order narrows the gap to the
  * reference's 5-gram KenLM model class (kenlm_model.py:18-29).
  */
object TrainArpa {

  val MinCount = 5
  val MinBigram = 3
  val MinTrigram = 4
  val MinQuad = 4
  val D = 0.75
  /** Per-file / total caps on the EXTRA prose (the copyright + license
    * core is always read in full).
    */
  val MaxFileBytes = 1500000L
  val MaxExtraBytes = 14L * 1024 * 1024

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
    val core = ls("/usr/share/doc", _ == "copyright") ++
      ls("/usr/share/common-licenses", _ => true) ++
      Seq("/opt/spark/README.md", "/opt/spark/LICENSE", "/opt/spark/NOTICE")
        .map(Paths.get(_)).filter(Files.isRegularFile(_))

    // extra prose, deterministic order, capped
    def walk(dir: String, keep: String => Boolean, depth: Int): Seq[Path] = {
      val d = Paths.get(dir)
      if (!Files.isDirectory(d)) return Seq.empty
      Files.walk(d, depth).iterator().asScala
        .filter(p => Files.isRegularFile(p) && keep(p.getFileName.toString))
        .toSeq.sortBy(_.toString)
    }
    val prose =
      walk("/usr/share/vim", n => n.endsWith(".txt"), 3) ++
        walk("/usr/share/doc", n =>
          (n.startsWith("README") && !n.endsWith(".gz")) ||
            n.endsWith(".txt") || n.endsWith(".md"), 3)
    val extra = mutable.ArrayBuffer.empty[Path]
    var budget = MaxExtraBytes
    prose.foreach { p =>
      val sz = Files.size(p)
      if (sz <= MaxFileBytes && sz <= budget) { extra += p; budget -= sz }
    }
    core ++ extra
  }

  /** Whitespace tokens of a cc_net-normalized line — the word-LM
    * tokenization (and the default for [[run]]).
    */
  def wordTokens(normLine: String): Array[String] =
    normLine.split("\\s+").filter(_.nonEmpty)

  private def eachLine(files: Seq[Path],
      tokenize: String => Array[String])(f: Array[String] => Unit): Unit =
    files.foreach { p =>
      val text = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      text.split('\n').foreach { rawLine =>
        val words = tokenize(CcNetNormalizer.normalize(rawLine))
        if (words.length >= 2) f(words)
      }
    }

  def main(args: Array[String]): Unit = {
    val out = Paths.get(args.headOption
      .getOrElse("src/main/resources/graft/graft-en.arpa"))
    run(out, wordTokens,
      // frequent tokens minus addresses/URL-ish strings (emails and long
      // paths are frequent in doc files but are noise as LM events)
      vocabKeep = w => w.length <= 30 && !w.contains('@') && !w.contains('/'))
  }

  /** The full estimation pipeline, parameterized on the tokenizer so
    * the SentencePiece piece-level LM ([[TrainSp]]) reuses it verbatim:
    * identical discounting, pruning, `<unk>` type-averaging, and ARPA
    * emission — only the token stream differs.
    */
  def run(out: Path, tokenize: String => Array[String],
      vocabKeep: String => Boolean = _ => true,
      minCount: Int = MinCount, minBigram: Int = MinBigram,
      minTrigram: Int = MinTrigram, minQuad: Int = MinQuad): Unit = {
    val files = corpusFiles()

    // pass 1: raw token counts (vocab selection)
    val rawCount = mutable.HashMap.empty[String, Long]
    var lines = 0L
    eachLine(files, tokenize) { words =>
      lines += 1
      words.foreach(w => rawCount(w) = rawCount.getOrElse(w, 0L) + 1)
    }
    println(s"[train] ${files.size} files, $lines lines, " +
      s"${rawCount.size} raw word types, ${rawCount.valuesIterator.sum} tokens")

    // vocab: frequent tokens passing the caller's keep predicate; rare
    // or rejected tokens fold into <unk>. Ids are assigned in sorted
    // order → packed-key order is lexicographic and the emitted ARPA is
    // deterministic.
    val vocabWords = rawCount.iterator
      .filter { case (w, c) => c >= minCount && vocabKeep(w) }
      .map(_._1).toSeq.sorted
    val Bos = 0; val Eos = 1; val Unk = 2
    val word = Array("<s>", "</s>", "<unk>") ++ vocabWords
    // 16-bit ids let a 4-gram pack into one Long (4 × 16 = 64 bits)
    require(word.length < (1 << 16), "vocab exceeds 16-bit id packing")
    val id = word.iterator.zipWithIndex.toMap
    def mapId(w: String): Int = id.getOrElse(w, Unk)
    @inline def pack2(a: Int, b: Int): Long = (a.toLong << 16) | b
    @inline def pack3(a: Int, b: Int, c: Int): Long =
      (a.toLong << 32) | (b.toLong << 16) | c
    @inline def pack4(a: Int, b: Int, c: Int, d: Int): Long =
      (a.toLong << 48) | (b.toLong << 32) | (c.toLong << 16) | d

    // pass 2: n-gram counts over id sequences <s> w… </s>
    val uni = new Array[Long](word.length) // events only (<s> never counts)
    val ctx1 = new Array[Long](word.length)
    val bi = mutable.LongMap.empty[Long]
    val ctx2 = mutable.LongMap.empty[Long]
    val tri = mutable.LongMap.empty[Long]
    val ctx3 = mutable.LongMap.empty[Long]
    val quad = mutable.LongMap.empty[Long]
    eachLine(files, tokenize) { words =>
      val seq = new Array[Int](words.length + 2)
      seq(0) = Bos
      var i = 0
      while (i < words.length) { seq(i + 1) = mapId(words(i)); i += 1 }
      seq(words.length + 1) = Eos
      i = 1
      while (i < seq.length) {
        uni(seq(i)) += 1
        val k2 = pack2(seq(i - 1), seq(i))
        bi(k2) = bi.getOrElse(k2, 0L) + 1
        ctx1(seq(i - 1)) += 1
        if (i >= 2) {
          val k3 = pack3(seq(i - 2), seq(i - 1), seq(i))
          tri(k3) = tri.getOrElse(k3, 0L) + 1
          val kc = pack2(seq(i - 2), seq(i - 1))
          ctx2(kc) = ctx2.getOrElse(kc, 0L) + 1
        }
        if (i >= 3) {
          val k4 = pack4(seq(i - 3), seq(i - 2), seq(i - 1), seq(i))
          quad(k4) = quad.getOrElse(k4, 0L) + 1
          val kc3 = pack3(seq(i - 3), seq(i - 2), seq(i - 1))
          ctx3(kc3) = ctx3.getOrElse(kc3, 0L) + 1
        }
        i += 1
      }
    }

    val total = uni.sum.toDouble
    // Type-averaged <unk>: the folded mass belongs to ~|folded types|
    // distinct unseen words — charging it as ONE type's probability would
    // make OOV soup look more fluent than real prose (measured: all-OOV
    // gibberish at ppl≈4 vs 25 for natural text). Divide the <unk> event
    // probability by the folded type count wherever <unk> is the event.
    val foldedTypes =
      math.max(rawCount.valuesIterator.count(_ < minCount), 1).toDouble
    def p1(w: Int): Double =
      (uni(w) / total) / (if (w == Unk) foldedTypes else 1.0)

    // kept bigrams + order-1 backoff weights
    val kept2 = bi.iterator.filter(_._2 >= minBigram).toArray.sortBy(_._1)
    val kept2Keys = kept2.map(_._1)
    val cont1 = new Array[Int](word.length)
    kept2.foreach { case (k, _) => cont1((k >>> 16).toInt) += 1 }
    def lambda1(h: Int): Double =
      if (ctx1(h) > 0) math.max(D * cont1(h) / ctx1(h).toDouble, 1e-10)
      else 1.0
    // FULL (unpruned) interpolated bigram probability — used both for
    // emitted entries and as the lower-order term inside p3
    def p2(h: Int, w: Int): Double = {
      val c = bi.getOrElse(pack2(h, w), 0L)
      val disc = if (ctx1(h) > 0) math.max(c - D, 0.0) / ctx1(h) else 0.0
      val raw = disc + lambda1(h) * (uni(w) / total)
      raw / (if (w == Unk) foldedTypes else 1.0)
    }

    // kept trigrams (context bigram must be kept: its ARPA entry carries
    // the order-2 backoff weight) + order-2 backoff weights
    val kept3 = tri.iterator.filter { case (k, c) =>
      c >= minTrigram &&
        java.util.Arrays.binarySearch(kept2Keys, k >>> 16) >= 0
    }.toArray.sortBy(_._1)
    val kept3Keys = kept3.map(_._1)
    val cont2 = mutable.LongMap.empty[Int]
    kept3.foreach { case (k, _) =>
      val kc = k >>> 16
      cont2(kc) = cont2.getOrElse(kc, 0) + 1
    }
    def lambda2(kc: Long): Double =
      ctx2.get(kc) match {
        case Some(c) if c > 0 =>
          math.max(D * cont2.getOrElse(kc, 0) / c.toDouble, 1e-10)
        case _ => 1.0
      }
    // FULL interpolated trigram probability — emitted entries and the
    // lower-order term inside p4
    def p3(h2: Int, h1: Int, w: Int): Double = {
      val kc = pack2(h2, h1)
      val c = tri.getOrElse(pack3(h2, h1, w), 0L)
      val cc = ctx2.getOrElse(kc, 0L)
      val disc = if (cc > 0) math.max(c - D, 0.0) / cc else 0.0
      // unk events are type-averaged at every order; p2 already divides
      disc / (if (w == Unk) foldedTypes else 1.0) + lambda2(kc) * p2(h1, w)
    }

    // kept 4-grams (context trigram must be kept: its ARPA entry carries
    // the order-3 backoff weight) + order-3 backoff weights
    val kept4 = quad.iterator.filter { case (k, c) =>
      c >= minQuad &&
        java.util.Arrays.binarySearch(kept3Keys, k >>> 16) >= 0
    }.toArray.sortBy(_._1)
    val cont3 = mutable.LongMap.empty[Int]
    kept4.foreach { case (k, _) =>
      val kc = k >>> 16
      cont3(kc) = cont3.getOrElse(kc, 0) + 1
    }
    def lambda3(kc3: Long): Double =
      ctx3.get(kc3) match {
        case Some(c) if c > 0 =>
          math.max(D * cont3.getOrElse(kc3, 0) / c.toDouble, 1e-10)
        case _ => 1.0
      }
    def p4(k4: Long, c: Long): Double = {
      val kc3 = k4 >>> 16
      val h2 = ((k4 >>> 32) & 0xFFFF).toInt
      val h1 = ((k4 >>> 16) & 0xFFFF).toInt
      val w = (k4 & 0xFFFF).toInt
      val cc = ctx3.getOrElse(kc3, 0L)
      val disc = if (cc > 0) math.max(c - D, 0.0) / cc else 0.0
      disc / (if (w == Unk) foldedTypes else 1.0) + lambda3(kc3) * p3(h2, h1, w)
    }

    val sb = new StringBuilder(64 << 20)
    def log10(x: Double): String = f"${math.log10(x)}%.6f"
    sb ++= "\\data\\\n"
    sb ++= s"ngram 1=${word.length}\n"
    sb ++= s"ngram 2=${kept2.length}\n"
    sb ++= s"ngram 3=${kept3.length}\n"
    sb ++= s"ngram 4=${kept4.length}\n\n"
    sb ++= "\\1-grams:\n"
    word.indices.foreach { w =>
      val p = if (w == Bos) "-99.000000" else log10(p1(w))
      sb ++= s"$p\t${word(w)}\t${log10(lambda1(w))}\n"
    }
    sb ++= "\n\\2-grams:\n"
    kept2.foreach { case (k, _) =>
      val h = (k >>> 16).toInt
      val w = (k & 0xFFFF).toInt
      val bo = // order-2 backoff only where a kept trigram context exists
        if (cont2.contains(k)) s"\t${log10(lambda2(k))}" else ""
      sb ++= s"${log10(p2(h, w))}\t${word(h)} ${word(w)}$bo\n"
    }
    sb ++= "\n\\3-grams:\n"
    kept3.foreach { case (k, _) =>
      val h2 = (k >>> 32).toInt
      val h1 = ((k >>> 16) & 0xFFFF).toInt
      val w = (k & 0xFFFF).toInt
      val bo = // order-3 backoff only where a kept 4-gram context exists
        if (cont3.contains(k)) s"\t${log10(lambda3(k))}" else ""
      sb ++= s"${log10(p3(h2, h1, w))}\t${word(h2)} ${word(h1)} ${word(w)}$bo\n"
    }
    sb ++= "\n\\4-grams:\n"
    kept4.foreach { case (k, c) =>
      val h3 = (k >>> 48).toInt
      val h2 = ((k >>> 32) & 0xFFFF).toInt
      val h1 = ((k >>> 16) & 0xFFFF).toInt
      val w = (k & 0xFFFF).toInt
      sb ++= s"${log10(p4(k, c))}\t${word(h3)} ${word(h2)} ${word(h1)} " +
        s"${word(w)}\n"
    }
    sb ++= "\n\\end\\\n"

    Files.createDirectories(out.getParent)
    Files.write(out, sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[train] wrote $out: ${word.length} unigrams, " +
      s"${kept2.length} bigrams, ${kept3.length} trigrams, " +
      s"${kept4.length} quadgrams, ${Files.size(out) / 1024} KiB")
  }
}
