package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Algebraic contract of the count-min sketch, checked generatively:
  * reduce/merge order must not matter (that is what makes map-side
  * partials legal), the grid must equal the direct per-item formulation,
  * and point estimates must bound true counts from above. */
class CmsSketchSpec extends AnyFunSuite {

  private val depth = 4
  private val width = 32
  private val P = MinHashSig.P

  private def cell(i: Int, h: Long): Int =
    (((h * MinHashSig.A(i) + MinHashSig.B(i)) % P) % width).toInt

  private def estimate(grid: Array[Long], h: Long): Long =
    (0 until depth).map(i => grid(i * width + cell(i, h))).min

  private def gridOf(sk: CmsSketch, items: Seq[Long]): Array[Long] =
    sk.finish(items.foldLeft(sk.zero)(sk.reduce))

  test("grid equals the direct formulation; estimates dominate true counts") {
    val rnd = new Random(11)
    for (trial <- 1 to 5) {
      val sk = new CmsSketch(depth, width)
      val universe = Vector.fill(12)(rnd.nextLong().abs % P)
      val items = Vector.fill(500)(universe(rnd.nextInt(universe.size)))
      val grid = gridOf(sk, items)
      // direct formulation: each cell = number of items hashing there
      val direct = new Array[Long](depth * width)
      items.foreach(h => (0 until depth).foreach(i => direct(i * width + cell(i, h)) += 1))
      assert(grid.toSeq == direct.toSeq, s"trial $trial grid")
      // CMS never underestimates; total mass per row = item count
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong)
      exact.foreach { case (h, n) =>
        assert(estimate(grid, h) >= n, s"trial $trial item $h")
      }
      (0 until depth).foreach { i =>
        assert(grid.slice(i * width, (i + 1) * width).sum == items.size.toLong)
      }
    }
  }

  test("merge is associative, commutative, and equals one-pass reduce") {
    val rnd = new Random(23)
    val sk = new CmsSketch(depth, width)
    val a = Vector.fill(100)(rnd.nextLong().abs % P)
    val b = Vector.fill(150)(rnd.nextLong().abs % P)
    val c = Vector.fill(50)(rnd.nextLong().abs % P)
    def g(items: Seq[Long]) = items.foldLeft(sk.zero)(sk.reduce)
    val merged1 = sk.finish(sk.merge(sk.merge(g(a), g(b)), g(c)))
    val merged2 = sk.finish(sk.merge(g(c.reverse), sk.merge(g(b.reverse), g(a.reverse))))
    val onePass = sk.finish(g(a ++ b ++ c))
    assert(merged1.toSeq == onePass.toSeq)
    assert(merged2.toSeq == onePass.toSeq)
    // empty partials are identities on both sides
    assert(sk.finish(sk.merge(sk.zero, g(a))).toSeq == sk.finish(g(a)).toSeq)
    assert(sk.finish(sk.merge(g(a), sk.zero)).toSeq == sk.finish(g(a)).toSeq)
    // a zero-row group still finishes to a full (all-zero) grid
    assert(sk.finish(sk.zero).toSeq == Seq.fill(depth * width)(0L))
  }
}
