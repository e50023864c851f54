package graft.text

import scala.collection.mutable

/** Aho–Corasick automaton for the reference's multi-substring filters:
  * `check_nsfw_words` (filters.py:83-99, ~400 needles, count mode) and
  * `check_ethics`/`check_ethics_harsh` (filters.py:270-289, match-any mode).
  *
  * One pass over the text instead of O(needles) `str.count` scans. Count
  * mode reproduces Python `str.count` exactly: per-needle NON-overlapping
  * greedy left-to-right occurrence counting (matters for self-overlapping
  * needles like "xx").
  *
  * Build once per JVM (object-held), never serialized with the task closure.
  *
  * Since r18 the production hot path is the byte-level [[ByteDfa]] (flat
  * goto table, no String round-trip); this char-level automaton remains as
  * the independent reference implementation that `ByteDfaSpec`
  * differentials against.
  */
final class AhoCorasick(needles: Array[String]) extends Serializable {

  // Trie over chars; nodes grow in an array-of-maps (text is unicode).
  private val children = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
  private val fail = mutable.ArrayBuffer(0)
  // needle indices terminating at this node (own + via fail chain, precomputed)
  private val out = mutable.ArrayBuffer[List[Int]](Nil)
  val needleLengths: Array[Int] = needles.map(_.length)

  locally {
    // 1. trie
    needles.zipWithIndex.foreach { case (n, ni) =>
      var cur = 0
      n.foreach { ch =>
        cur = children(cur).getOrElseUpdate(ch, {
          children += mutable.Map.empty[Char, Int]
          fail += 0
          out += Nil
          children.size - 1
        })
      }
      out(cur) = ni :: out(cur)
    }
    // 2. BFS fail links + output merging
    val queue = mutable.Queue.empty[Int]
    children(0).values.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        fail(v) = if (children(f).contains(ch) && children(f)(ch) != v)
          children(f)(ch) else 0
        out(v) = out(v) ::: out(fail(v))
        queue += v
      }
    }
  }

  // Frozen arrays for the hot path.
  private val childArr: Array[Map[Char, Int]] = children.map(_.toMap).toArray
  private val failArr: Array[Int] = fail.toArray
  private val outArr: Array[Array[Int]] = out.map(_.toArray).toArray

  @inline private def step(state: Int, ch: Char): Int = {
    var s = state
    while (s != 0 && !childArr(s).contains(ch)) s = failArr(s)
    childArr(s).getOrElse(ch, 0)
  }

  /** Σ over needles of Python-`str.count`-style non-overlapping occurrence
    * counts (filters.py:92-94).
    */
  def countAll(text: String): Long = {
    if (text == null || text.isEmpty) return 0L
    val lastEnd = Array.fill(needleLengths.length)(-1)
    var total = 0L
    var state = 0
    var i = 0
    while (i < text.length) {
      state = step(state, text.charAt(i))
      val os = outArr(state)
      var j = 0
      while (j < os.length) {
        val ni = os(j)
        val start = i - needleLengths(ni) + 1
        if (start > lastEnd(ni)) { total += 1; lastEnd(ni) = i }
        j += 1
      }
      i += 1
    }
    total
  }

  /** True iff any needle occurs (check_ethics loop, filters.py:275-278). */
  def containsAny(text: String): Boolean = {
    if (text == null || text.isEmpty) return false
    var state = 0
    var i = 0
    while (i < text.length) {
      state = step(state, text.charAt(i))
      if (outArr(state).nonEmpty) return true
      i += 1
    }
    false
  }
}
