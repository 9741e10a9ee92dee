package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Algebraic contract of the Bloom filter, checked generatively: the
  * bitset must equal the direct per-item formulation under any
  * reduce/merge split (map-side OR partials legal), membership must have
  * zero false negatives, and the false-positive rate must sit near its
  * analytic expectation. */
class BloomSketchSpec extends AnyFunSuite {

  private val m = 1024
  private val k = 3
  private val P = MinHashSig.P

  private def bitsOf(sk: BloomSketch, items: Seq[Long]): Array[Long] =
    sk.finish(items.foldLeft(sk.zero)(sk.reduce))

  test("bitset equals the direct formulation; merge order is irrelevant") {
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      val sk = new BloomSketch(m, k)
      val items = Vector.fill(100)(rnd.nextLong().abs % P)
      val whole = bitsOf(sk, items)
      // direct formulation
      val direct = new Array[Long](m / 64)
      items.foreach { h =>
        (0 until k).foreach { i =>
          val pos = (((h * MinHashSig.A(i) + MinHashSig.B(i)) % P) % m).toInt
          direct(pos >>> 6) |= 1L << (pos & 63)
        }
      }
      assert(whole.toSeq == direct.toSeq, s"trial $trial bits")
      // arbitrary split + merge, both orders
      val cut = rnd.nextInt(items.size)
      val (l, r) = items.splitAt(cut)
      val a = bitsOf(new BloomSketch(m, k), l)
      val b = bitsOf(new BloomSketch(m, k), r)
      assert(sk.merge(a.clone(), b.clone()).toSeq == whole.toSeq)
      assert(sk.merge(b.clone(), a.clone()).toSeq == whole.toSeq)
    }
  }

  test("no false negatives; false-positive rate near (1-e^(-kn/m))^k") {
    val rnd = new Random(13)
    val sk = new BloomSketch(m, k)
    val members = Vector.fill(120)(rnd.nextLong().abs % P).distinct
    val bits = bitsOf(sk, members)
    members.foreach(h => assert(sk.mightContain(bits, h), s"false negative on $h"))
    val absent = Vector.fill(5000)(rnd.nextLong().abs % P)
      .filterNot(members.toSet)
    val fp = absent.count(sk.mightContain(bits, _)).toDouble / absent.size
    val expect = math.pow(1 - math.exp(-k.toDouble * members.size / m), k)
    assert(fp <= expect * 3 + 0.01, s"fp=$fp expected≈$expect")
  }

  test("empty filter rejects everything; zero partial is an identity") {
    val sk = new BloomSketch(m, k)
    val empty = sk.finish(sk.zero)
    assert(empty.length == m / 64 && empty.forall(_ == 0L))
    assert(!sk.mightContain(empty, 42L))
    val one = bitsOf(sk, Seq(42L))
    assert(sk.merge(sk.zero, one.clone()).toSeq == one.toSeq)
    assert(sk.merge(one.clone(), sk.zero).toSeq == one.toSeq)
  }
}
