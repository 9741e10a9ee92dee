package graft.sources

import graft.sources.cdc.{DomainVectorOffset, Gtid}
import org.scalacheck.{Gen, Prop, Properties}

/** Generative laws of the per-domain watermark vector offset — the
  * novel piece of `domainMode=vector` the checkpoint depends on.
  *
  * The serialization is LOAD-BEARING beyond round-tripping: entry order
  * carries observed log-arrival order (the head is the loss-free replay
  * request point), so `fromJson ∘ json` must be the identity INCLUDING
  * order, and `covers` must be a partial order compatible with
  * per-domain advancement (the commit monotonicity contract).
  */
object DomainVectorPropSpec extends Properties("DomainVectorOffset") {

  private val genGtid: Gen[Gtid] = for {
    d <- Gen.chooseNum(0L, 1L << 20)
    sv <- Gen.chooseNum(0L, 1L << 20)
    sq <- Gen.chooseNum(1L, Long.MaxValue / 2)
  } yield Gtid(d, sv, sq)

  /** Unique-domain vectors in arbitrary (= arrival) order. */
  private val genVector: Gen[DomainVectorOffset] = for {
    n <- Gen.chooseNum(0, 8)
    gs <- Gen.listOfN(n, genGtid)
  } yield DomainVectorOffset(
    gs.groupBy(_.domain).map(_._2.head).toSeq)

  property("json round-trip is the identity, order included") =
    Prop.forAll(genVector) { v =>
      DomainVectorOffset.fromJson(v.json()) == v
    }

  property("covers is reflexive") =
    Prop.forAll(genVector) { v => v.covers(v) }

  property("covers is antisymmetric up to per-domain positions") =
    Prop.forAll(genVector, genVector) { (a, b) =>
      !(a.covers(b) && b.covers(a)) ||
        a.entries.map(g => g.domain -> g).toMap ==
          b.entries.map(g => g.domain -> g).toMap
    }

  property("advancing any domain preserves coverage of the original") =
    Prop.forAll(genVector, genGtid) { (v, g) =>
      v.entries.isEmpty || {
        val d = v.entries.head.domain
        val adv = Gtid(d, g.serverId,
          math.min(Long.MaxValue - 1, v.of(d).get.sequence) + 1)
        // the advanced vector (entry moved to the back, like the tailer)
        val next = DomainVectorOffset(
          v.entries.filterNot(_.domain == d) :+ adv)
        next.covers(v) && !v.covers(next)
      }
    }

  property("covers is transitive") =
    Prop.forAll(genVector, genVector, genVector) { (a, b, c) =>
      !(a.covers(b) && b.covers(c)) || a.covers(c)
    }

  property("the request point is the head entry") =
    Prop.forAll(genVector) { v =>
      v.requestPoint == v.entries.headOption
    }
}
