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
