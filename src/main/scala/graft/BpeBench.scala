package graft

/** Driver-side microbench for the incremental BPE merge loop (VERDICT r8
  * #4 acceptance: ≥32k merges over a ≥100k-word dictionary in seconds,
  * not minutes). Pure JVM — the merge loop runs on the driver over the
  * bounded dictionary by design; the distributed side (the ONE word-count
  * shuffle) is unchanged and measured by `bpe_encode_tokens` in Bench.
  *
  * Also cross-checks the incremental loop against the full-rescan
  * reference on a 3k-word prefix (the rescan at 100k×32k would take
  * hours — exactly the gap this bench demonstrates).
  *
  * Usage: runMain graft.BpeBench [numWords] [numMerges]
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val numWords = if (args.length > 0) args(0).toInt else 100_000
    val numMerges = if (args.length > 1) args(1).toInt else 32_000
    // seeded synthetic dictionary: Zipf counts, morpheme-ish words built
    // from a small alphabet so pair mass is deep enough for 32k merges
    val rnd = new scala.util.Random(7)
    val syllables = Vector("ing", "tion", "er", "est", "pre", "un", "re",
      "al", "ment", "ness", "ist", "ity", "ous", "ive", "en", "ed", "ly")
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    while (seen.size < numWords) {
      val stem = (1 to rnd.nextInt(3) + 1).map { _ =>
        ('a' + rnd.nextInt(26)).toChar.toString +
          ('a' + rnd.nextInt(26)).toChar.toString +
          (if (rnd.nextInt(3) == 0) ('a' + rnd.nextInt(26)).toChar.toString
           else "")
      }.mkString
      seen += (stem + syllables(rnd.nextInt(syllables.size)) +
        (if (rnd.nextInt(5) == 0) syllables(rnd.nextInt(syllables.size))
         else ""))
    }
    val wc = seen.toSeq.zipWithIndex.map { case (w, i) =>
      w -> math.max(1L, 2_000_000L / (i + 1) + (i % 7))
    }

    // correctness cross-check at a tractable size
    val probe = wc.take(3000)
    val fast0 = graft.text.Bpe.trainFromCounts(probe, 800)
    val slow0 = graft.text.Bpe.trainFromCountsRescan(probe, 800)
    require(fast0.merges == slow0.merges,
      "incremental and rescan loops diverged on the probe dictionary")
    println(s"[bpebench] equivalence probe: 3000 words / 800 merges OK " +
      s"(${fast0.merges.size} merges learned)")

    val t0 = System.nanoTime()
    val m = graft.text.Bpe.trainFromCounts(wc, numMerges)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[bpebench] incremental: $numWords%d words, " +
      f"${m.merges.size}%d/$numMerges%d merges in $sec%.2f s")

    // the r8 loop at the same size, time-boxed via a small extrapolation
    // base (full run would take far too long to be a useful bench)
    val t1 = System.nanoTime()
    graft.text.Bpe.trainFromCountsRescan(wc, 100)
    val rescan100 = (System.nanoTime() - t1) / 1e9
    println(f"[bpebench] rescan reference: first 100 merges in " +
      f"$rescan100%.2f s → ~${rescan100 / 100 * numMerges / 60}%.1f min " +
      f"extrapolated for $numMerges%d")
  }
}
