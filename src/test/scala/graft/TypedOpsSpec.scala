package graft

import graft.operators.TypedOps
import graft.operators.TypedOps.FlagStats

/** Typed-API agreement: Dataset lambdas and the Column formulation must
  * produce the same aggregates (sum order differs, so compare with a
  * tolerance on the float sum and exactly elsewhere). */
class TypedOpsSpec extends SparkSpec {

  test("typed mapGroups aggregate equals the Column-API aggregate") {
    val li = TypedOps.lineitems(spark, sf)
    def keyed(rows: Array[FlagStats]) = rows.map(r => r.l_returnflag -> r).toMap
    val typed = keyed(TypedOps.statsByFlag(li).collect())
    val cols = keyed(TypedOps.statsByFlagColumns(li).collect())
    assert(typed.keySet == cols.keySet)
    typed.keySet.foreach { k =>
      assert(typed(k).n == cols(k).n, s"$k count")
      assert(typed(k).max_price == cols(k).max_price, s"$k max")
      assert(math.abs(typed(k).sum_qty - cols(k).sum_qty) < 1e-6 *
        math.max(1.0, cols(k).sum_qty), s"$k sum")
    }
  }

  test("typed filters compose with encoders round-tripping all fields") {
    val li = TypedOps.lineitems(spark, sf)
    val one = li.filter((l: TypedOps.Lineitem) => l.l_linenumber == 1)
    assert(one.count() > 0)
    val head = one.head()
    assert(head.l_linenumber == 1 && head.l_orderkey > 0 && head.l_shipdate != null)
  }
}
