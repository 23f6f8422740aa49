package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** m09's perceptual hash: the dHash kernel's defining properties on
  * synthetic images (the oracle covers exact values over the framed
  * corpus; this pins the SEMANTICS that make it a near-dup key), plus
  * the gate query's dup-count arithmetic at sf0.001. */
class ImageDhashSpec extends AnyFunSuite with BeforeAndAfterAll {
  import MultimodalQueries.{PpmImage, dhash}

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def img(w: Int, h: Int)(f: (Int, Int) => Int): PpmImage = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      px((y * w + x) * 3 + c) = f(x, y).toByte
    PpmImage(w, h, 255, px)
  }

  test("uniform image hashes to 0 (no gradient, no bits)") {
    assert(dhash(img(8, 8)((_, _) => 128)) === 0L)
    assert(dhash(img(4, 11)((_, _) => 7)) === 0L)
  }

  test("monotone horizontal gradients saturate the bit field") {
    // strictly decreasing left->right: every adjacent cell pair has
    // cell(c) > cell(c+1) -> all 16 bits set
    val dec = dhash(img(10, 8)((x, _) => 200 - x * 15))
    assert(dec === 0xffffL, f"decreasing gradient hash $dec%x")
    // strictly increasing: no pair satisfies >, hash 0
    assert(dhash(img(10, 8)((x, _) => x * 15)) === 0L)
  }

  test("hash is invariant under uniform intensity scaling (near-dup, not checksum)") {
    val a = img(9, 7)((x, y) => 20 + ((x * 31 + y * 17) % 50))
    val b = img(9, 7)((x, y) => 2 * (20 + ((x * 31 + y * 17) % 50)))
    assert(dhash(a) === dhash(b))
  }

  test("hash is sensitive to content (distinct patterns rarely collide)") {
    val hashes = (0 until 32).map { s =>
      dhash(img(8, 8)((x, y) => ((x * (s + 3) + y * (s * 7 + 1) + s * s) % 251)))
    }
    assert(hashes.distinct.size >= 16,
      s"only ${hashes.distinct.size} distinct hashes over 32 patterns")
  }

  test("m09 dup_cnt is the size of each dhash equivalence class") {
    val rows = graft.SparkEntry.queries("m09_image_dhash")(spark, dir).collect()
    assert(rows.length === 500)
    val byHash = rows.groupBy(_.getAs[Long]("dhash"))
    rows.foreach { r =>
      assert(r.getAs[Long]("dup_cnt") ===
        byHash(r.getAs[Long]("dhash")).length.toLong)
    }
    // the verdict is non-trivial both ways at this corpus size
    assert(byHash.size > 1 && byHash.exists(_._2.length > 1))
  }

  test("d32 temperature weights: largest slice is 1.0, flatter at lower alpha") {
    val rows = graft.SparkEntry.queries("d32_temperature_mix")(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Double]("w_half")).max === 1.0)
    rows.foreach { r =>
      val (wh, wq) = (r.getAs[Double]("w_half"), r.getAs[Double]("w_quarter"))
      assert(wh > 0.0 && wh <= 1.0)
      // alpha 1/4 upweights small slices relative to alpha 1/2
      assert(wq >= wh, s"lang ${r.getAs[String]("lang")}: w_quarter $wq < w_half $wh")
      assert(r.getAs[Long]("per_mille_half") === math.floor(wh * 1000).toLong)
    }
  }
}
