package graft.scoring

/** Deterministic synthetic ARPA generator — sized-up stand-in for a
  * cc_net-scale KenLM download, so [[CompileLm]]'s text-parse vs
  * `.glm`-load gap can be MEASURED a decade (and two) above the shipped
  * 347k-gram model instead of extrapolated (PERF.md "compiled `.glm`
  * LM"). Grams are unique by base-V digit construction and
  * prefix-complete when n4 ≤ n3 ≤ n2 (gram i's prefix is gram i of the
  * order below), so the compile step pays zero structural fillers —
  * the same shape lmplz emits.
  *
  * Usage: `runMain graft.scoring.SynthArpa out.arpa V n2 n3 n4`
  */
object SynthArpa {
  def main(args: Array[String]): Unit = {
    require(args.length == 5, "usage: SynthArpa <out.arpa> <V> <n2> <n3> <n4>")
    val out = args(0)
    val v = args(1).toInt
    val n2 = args(2).toLong
    val n3 = args(3).toLong
    val n4 = args(4).toLong
    require(n3 <= n2 && n4 <= n3,
      "need n4 <= n3 <= n2 for prefix-complete construction")
    require(n2 <= v.toLong * v, "n2 must fit in V^2 unique pairs")
    val t0 = System.nanoTime
    val w = new java.io.PrintWriter(new java.io.BufferedWriter(
      new java.io.FileWriter(out), 1 << 20))
    try {
      def word(i: Long): String = s"w$i"
      def p(i: Long): String = s"-${1 + (i % 997) / 100.0}"
      w.println("\\data\\")
      w.println(s"ngram 1=${v + 3}")
      w.println(s"ngram 2=$n2")
      w.println(s"ngram 3=$n3")
      w.println(s"ngram 4=$n4")
      w.println()
      w.println("\\1-grams:")
      w.println("-9.9\t<unk>")
      w.println("-99.0\t<s>\t-0.5")
      w.println("-2.5\t</s>")
      var i = 0L
      while (i < v) {
        w.println(s"${p(i)}\t${word(i)}\t-0.${i % 9 + 1}")
        i += 1
      }
      w.println()
      w.println("\\2-grams:")
      i = 0L
      while (i < n2) {
        val g = s"${word(i % v)} ${word((i / v) % v)}"
        if (i % 2 == 0) w.println(s"${p(i)}\t$g\t-0.${i % 7 + 1}")
        else w.println(s"${p(i)}\t$g")
        i += 1
      }
      w.println()
      w.println("\\3-grams:")
      i = 0L
      while (i < n3) {
        val g =
          s"${word(i % v)} ${word((i / v) % v)} ${word((i / v / v) % v)}"
        if (i % 2 == 0) w.println(s"${p(i)}\t$g\t-0.${i % 5 + 1}")
        else w.println(s"${p(i)}\t$g")
        i += 1
      }
      w.println()
      w.println("\\4-grams:")
      i = 0L
      while (i < n4) {
        val g = s"${word(i % v)} ${word((i / v) % v)} " +
          s"${word((i / v / v) % v)} ${word((i / v / v / v) % v)}"
        w.println(s"${p(i)}\t$g")
        i += 1
      }
      w.println()
      w.println("\\end\\")
    } finally w.close()
    val mb = new java.io.File(out).length / 1e6
    println(s"""{"out":"$out","grams":${v + 3 + n2 + n3 + n4},""" +
      s""""mb":$mb,"gen_s":${(System.nanoTime - t0) / 1e9}}""")
  }
}
