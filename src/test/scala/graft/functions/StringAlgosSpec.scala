package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The suffix-automaton LCS must agree with the quadratic reference DP
  * on every input — randomized cross-check plus edge cases. */
class StringAlgosSpec extends AnyFunSuite {

  /** O(n·m) reference dynamic program. */
  private def lcsDp(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    var best = 0
    for (i <- 1 to a.length) {
      for (j <- 1 to b.length) {
        cur(j) = if (a(i - 1) == b(j - 1)) prev(j - 1) + 1 else 0
        if (cur(j) > best) best = cur(j)
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
    }
    best
  }

  test("edge cases") {
    assert(StringAlgos.lcsLen("", "") == 0)
    assert(StringAlgos.lcsLen("abc", "") == 0)
    assert(StringAlgos.lcsLen("", "abc") == 0)
    assert(StringAlgos.lcsLen("abc", "abc") == 3)
    assert(StringAlgos.lcsLen("abcdef", "zzcdezz") == 3) // "cde"
    assert(StringAlgos.lcsLen("aaaa", "aa") == 2)
    assert(StringAlgos.lcsLen("ababab", "bababa") == 5)
    assert(StringAlgos.lcsLen("xyz", "abc") == 0)
  }

  test("matches the quadratic DP on 500 random pairs (small alphabet forces overlaps)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 500) {
      val alpha = 2 + rnd.nextInt(4)
      def mk(n: Int) =
        Array.fill(n)(('a' + rnd.nextInt(alpha)).toChar).mkString
      val a = mk(rnd.nextInt(60))
      val b = mk(rnd.nextInt(60))
      assert(StringAlgos.lcsLen(a, b) == lcsDp(a, b).toLong,
        s"trial $trial: a=$a b=$b")
    }
  }

  /** Per-CODEPOINT reference DP (what the DuckDB oracle computes). */
  private def lcsDpCp(a: String, b: String): Int = {
    val as = a.codePoints().toArray
    val bs = b.codePoints().toArray
    if (as.isEmpty || bs.isEmpty) return 0
    val prev = new Array[Int](bs.length + 1)
    val cur = new Array[Int](bs.length + 1)
    var best = 0
    for (i <- 1 to as.length) {
      for (j <- 1 to bs.length) {
        cur(j) = if (as(i - 1) == bs(j - 1)) prev(j - 1) + 1 else 0
        if (cur(j) > best) best = cur(j)
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
    }
    best
  }

  test("counts code points, not UTF-16 units (supplementary plane)") {
    // 😀 = U+1F600 (2 chars as a surrogate pair, 1 code point)
    assert(StringAlgos.lcsLen("😀", "😀") == 1)
    assert(StringAlgos.lcsLen("a😀b", "x😀y") == 1)
    assert(StringAlgos.lcsLen("a😀b", "a😀b") == 3)
    // different astral chars sharing a HIGH surrogate must NOT match:
    // U+1F600 😀 and U+1F601 😁 share the high surrogate 0xD83D — a
    // UTF-16-unit automaton reports a length-1 half-surrogate match.
    assert(StringAlgos.lcsLen("😀", "😁") == 0)
    // CJK-ext B: U+20000, also a surrogate pair
    assert(StringAlgos.lcsLen("x𠀀y", "z𠀀w") == 1)
  }

  test("matches the per-codepoint DP on random astral-mixed strings") {
    val rnd = new scala.util.Random(99)
    val cps = Array(0x61, 0x62, 0x1F600, 0x1F601, 0x20000, 0x20001)
    def mk(n: Int) = {
      val sb = new java.lang.StringBuilder
      (1 to n).foreach(_ => sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
      sb.toString
    }
    for (trial <- 1 to 200) {
      val a = mk(rnd.nextInt(40))
      val b = mk(rnd.nextInt(40))
      assert(StringAlgos.lcsLen(a, b) == lcsDpCp(a, b).toLong,
        s"trial $trial")
    }
  }

  test("matches the DP on realistic token text with planted duplicate spans") {
    val rnd = new scala.util.Random(7)
    val words = Seq("the", "cache", "block", "reads", "data", "spark", "node")
    def sentence(n: Int) =
      Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
    for (_ <- 1 to 50) {
      val shared = sentence(8)
      val a = sentence(10) + " " + shared + " " + sentence(5)
      val b = sentence(3) + " " + shared + " " + sentence(12)
      assert(StringAlgos.lcsLen(a, b) == lcsDp(a, b).toLong)
      assert(StringAlgos.lcsLen(a, b) >= shared.length)
    }
  }
}
