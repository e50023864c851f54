package graft

/** Shared spec fixtures: the exact-hash 9×8 PGM builder used by every
  * perceptual-dedup spec (one copy — the bit-stepping construction must
  * not drift between suites). Each row starts at 128 + `offset` and
  * steps −1 for a set bit of `hash` (left > right) / +1 for a clear
  * bit; a 9×8 raster makes every dHash box one pixel, so the image's
  * dHash is exactly `hash`, and `offset` shifts brightness without
  * changing any comparison.
  */
object TestFixtures {
  def pgmOf(hash: Long, offset: Int): Array[Byte] = {
    val px = new Array[Byte](72)
    var bit = 63
    var y = 0
    while (y < 8) {
      var v = 128 + offset
      px(y * 9) = v.toByte
      var x = 0
      while (x < 8) {
        v = if (((hash >>> bit) & 1L) == 1L) v - 1 else v + 1
        px(y * 9 + x + 1) = v.toByte
        bit -= 1
        x += 1
      }
      y += 1
    }
    "P5\n9 8\n255\n".getBytes("US-ASCII") ++ px
  }
}
