package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Html

class HtmlSpec extends AnyFunSuite {

  private def x(s: String) = Html.extractText(s)

  test("inline tags join words, block tags split lines") {
    assert(x("<p>one <b>bold</b> word</p><div>two</div>") ==
      "one bold word\ntwo")
    assert(x("a<br>b<h2>c</h2>") == "a\nb\nc")
    assert(x("<span>no</span><em>break</em>") == "nobreak")
  }

  test("script and style drop whole, case- and attribute-insensitive") {
    assert(x("a<script>var x = 1 < 2;</script>b") == "ab")
    assert(x("a<SCRIPT type='x'>ignored</ScRiPt>b") == "ab")
    assert(x("a<style media=\"all\">p { c: 1 }</style>b") == "ab")
    // unclosed: rest of document is code, not prose
    assert(x("a<script>var x;") == "a")
  }

  test("comments drop whole, unclosed comment eats the rest") {
    assert(x("a<!-- hidden <p>not a tag</p> -->b") == "ab")
    assert(x("a<!-- open forever") == "a")
  }

  test("entities: known decode, nbsp is space, unknown verbatim") {
    assert(x("1 &lt; 2 &amp;&amp; 3 &gt; 2") == "1 < 2 && 3 > 2")
    assert(x("say &quot;hi&quot; &#39;there&#39;") == "say \"hi\" 'there'")
    assert(x("a&nbsp;&nbsp;b") == "a b")
    assert(x("keep &unknown; and & alone") == "keep &unknown; and & alone")
  }

  test("whitespace: runs collapse, lines trim, empties drop") {
    assert(x("<p>  spaced\t\tout  </p>\n\n<p> x </p>") == "spaced out\nx")
    assert(x("   \t  ") == "")
    assert(x(null) == "")
  }

  test("hostile tags: unclosed at EOF, bare angle, digits in names") {
    assert(x("text <b") == "text")
    assert(x("5 < 6 stays") == "5")
    // documented limitation: a tag ends at the FIRST '>', so a '>'
    // inside a quoted attribute leaks the remainder as text
    assert(x("<a href=\"x>y\">t</a>") == "y\">t")
    assert(x("<h3 class='big'>ok</h3>") == "ok")
  }
}
