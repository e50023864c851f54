package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{AhoCorasick, AhoHolder, ByteDfa, WordLists}

/** The byte-level DFA ([[ByteDfa]]) must agree with the char-level
  * [[AhoCorasick]] it replaced in [[AhoHolder]]'s hot path, and both must
  * agree with a brute-force Python-`str.count` reimplementation — over
  * overlap-heavy needle sets, unicode needles, and haystacks that exercise
  * the ASCII fast path, the unicode lowering path, and the KELVIN-sign
  * case-mapping trap.
  */
class ByteDfaSpec extends AnyFunSuite {

  /** Python str.count: non-overlapping, greedy left-to-right. */
  private def pyCount(t: String, needle: String): Long = {
    var i = 0
    var c = 0L
    var k = t.indexOf(needle, i)
    while (k >= 0) {
      c += 1
      i = k + needle.length
      k = t.indexOf(needle, i)
    }
    c
  }

  private def lowered(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)

  private val overlapNeedles =
    Array("a", "aa", "aaa", "ab", "bab", "xx", "xxx", "abcab", "cabc")
  private val unicodeNeedles = Array("é", "…", "naïve", "ßs", "k")
  private val haystacks = Seq(
    "", "a", "aa", "aaa", "aaaa", "aaaaaaa", "ababab", "babab",
    "xxxxxx", "xxxxx", "abcabcab", "cabcabc", "AAbbAA", "ABAB",
    "the quick brown fox", "ALL CAPS TEXT", "MiXeD cAsE aAa",
    "naïve NAÏVE naïve", "é…é…", "ß ẞ", "K KELVIN K", "😀aaa😀",
    "padding aaa padding xx xx padding", "…………", "ﬀ ligature")

  test("countBytes ≡ char-level AC ≡ brute force, overlap needles") {
    val dfaH = new AhoHolder(overlapNeedles)
    val ac = new AhoCorasick(overlapNeedles)
    haystacks.foreach { h =>
      val expect = overlapNeedles.map(n => pyCount(lowered(h), n)).sum
      assert(ac.countAll(lowered(h)) === expect, s"char AC for <$h>")
      assert(dfaH.countAllLower(UTF8String.fromString(h)) === expect,
        s"byte DFA for <$h>")
    }
  }

  test("countBytes ≡ char-level AC ≡ brute force, unicode needles") {
    val dfaH = new AhoHolder(unicodeNeedles)
    val ac = new AhoCorasick(unicodeNeedles)
    haystacks.foreach { h =>
      val expect = unicodeNeedles.map(n => pyCount(lowered(h), n)).sum
      assert(ac.countAll(lowered(h)) === expect, s"char AC for <$h>")
      assert(dfaH.countAllLower(UTF8String.fromString(h)) === expect,
        s"byte DFA for <$h>")
    }
  }

  test("KELVIN SIGN lowers to ascii k and must match needle k") {
    val h = new AhoHolder(Array("k"))
    assert(h.countAllLower(UTF8String.fromString("K")) === 1L)
    assert(h.containsAnyLower(UTF8String.fromString("xKx")))
  }

  test("containsAny agrees across implementations") {
    val needles = overlapNeedles ++ unicodeNeedles
    val dfaH = new AhoHolder(needles)
    val ac = new AhoCorasick(needles)
    haystacks.foreach { h =>
      assert(dfaH.containsAnyLower(UTF8String.fromString(h))
        === ac.containsAny(lowered(h)), s"for <$h>")
    }
  }

  test("seeded fuzz: byte DFA ≡ brute force on the real NSFW list") {
    val needles = WordLists.NsfwWords
    val dfaH = new AhoHolder(needles)
    val rnd = new scala.util.Random(7)
    // salt fragments with real needles so matches actually occur
    val frags = Seq("hello ", needles(0), " world ", needles(11),
      needles(200), "A", "É", "…", needles(399).toUpperCase, "\n", "x")
    (1 to 300).foreach { _ =>
      val sb = new StringBuilder
      (0 until rnd.nextInt(12)).foreach(_ =>
        sb.append(frags(rnd.nextInt(frags.length))))
      val h = sb.toString()
      val expect = needles.map(n => pyCount(lowered(h), n)).sum
      assert(dfaH.countAllLower(UTF8String.fromString(h)) === expect,
        s"for <${h.take(60)}>")
    }
  }

  test("fail-chain outputs: nested needle ends inside a longer match") {
    // the classic AC case: "she" ends at the same position as its suffix
    // "he" — both must count; "his"/"hers" exercise fail transitions out
    // of a partial match
    val needles = Array("he", "she", "his", "hers")
    val h = new AhoHolder(needles)
    val cases = Seq("she", "ushers", "shehis", "hishers", "h", "hhehe",
      "shshshe", "hehehe", "hershey she his")
    cases.foreach { s =>
      val expect = needles.map(n => pyCount(lowered(s), n)).sum
      assert(h.countAllLower(UTF8String.fromString(s)) === expect,
        s"for <$s>")
    }
    // multi-byte needle whose suffix is another needle: "ché" ends "hé"
    val uni = new AhoHolder(Array("hé", "ché"))
    assert(uni.countAllLower(UTF8String.fromString("aché")) === 2L)
  }

  test("cache key: needles containing NUL cannot collide with split lists") {
    // r18's key joined needles with NUL, so ["a<NUL>b"] and ["a","b"]
    // shared one cache entry — whichever built first answered for both.
    // The length-prefixed key keeps them distinct.
    val joined = ByteDfa.forNeedles(Array("a" + 0.toChar + "b"))
    val split = ByteDfa.forNeedles(Array("a", "b"))
    val h = UTF8String.fromString("a b")  // space, not NUL
    assert(joined.countBytes(h) === 0L) // no literal a<NUL>b present
    assert(split.countBytes(h) === 2L)
    assert(ByteDfa.forNeedles(Array("a" + 0.toChar + "b")).countBytes(
      UTF8String.fromString("xa" + 0.toChar + "b!")) === 1L)
  }

  test("cache is LRU-bounded; eviction rebuilds on demand, same results") {
    ByteDfa.clearCache()
    val first = Array("zq-evict-0")
    val before = ByteDfa.forNeedles(first)
      .countBytes(UTF8String.fromString("xx zq-evict-0 yy"))
    // flood with CacheCap distinct lists → `first` is the eldest, evicted
    (1 to text.ByteDfa.CacheCap).foreach { i =>
      ByteDfa.forNeedles(Array(s"zq-evict-$i"))
    }
    assert(ByteDfa.cacheSize <= text.ByteDfa.CacheCap)
    // re-request: rebuilds (new instance is fine) and answers identically
    val after = ByteDfa.forNeedles(first)
      .countBytes(UTF8String.fromString("xx zq-evict-0 yy"))
    assert(after === before && after === 1L)
    assert(ByteDfa.cacheSize <= text.ByteDfa.CacheCap)
    ByteDfa.clearCache() // leave the shipped-lexicon JVM state clean
  }

  test("fused ascii-lower transition: uppercase needle bytes unreachable") {
    // an uppercase needle can never match a lowered haystack — both
    // implementations must agree on that non-match
    val h = new AhoHolder(Array("FOO"))
    assert(h.countAllLower(UTF8String.fromString("FOO foo")) === 0L)
    assert(!h.containsAnyLower(UTF8String.fromString("FOO")))
  }
}
