package graft.sources

import graft.sources.cdc.{CdcWireFilters, WirePred}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Units for the pushed-filter → wire-row predicate compiler. The
  * invariant under test everywhere: eval may KEEP a row SQL rejects
  * (filters stay residual; Spark re-drops), but must never DROP a row
  * SQL accepts. */
class CdcFiltersSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("seq", IntegerType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def pred(f: Filter, typed: Boolean = true): WirePred =
    CdcWireFilters.compile(f, schema, typed).getOrElse(
      fail(s"expected $f to compile"))

  // wire row helpers: (seq, name, score) as raw strings + null mask
  private def row(seq: String, name: String, score: String): Array[String] =
    Array(seq, name, score)
  private val noNulls = Array(false, false, false)

  test("string equality: matches value, null row is false in typed mode") {
    val p = pred(EqualTo("name", "alice"))
    assert(p.eval(row("1", "alice", "0"), noNulls))
    assert(!p.eval(row("1", "bob", "0"), noNulls))
    assert(!p.eval(row("1", "", "0"), Array(false, true, false)))
  }

  test("raw mode: wire null decodes to '', so EqualTo(c, '') matches it") {
    val p = pred(EqualTo("name", ""), typed = false)
    assert(p.eval(row("1", "", "0"), Array(false, true, false)))
    assert(!p.eval(row("1", "x", "0"), noNulls))
  }

  test("integer comparisons parse the wire string; unparseable keeps the row") {
    val p = pred(GreaterThan("seq", 5))
    assert(p.eval(row("6", "x", "0"), noNulls))
    assert(!p.eval(row("5", "x", "0"), noNulls))
    assert(!p.eval(row("4", "x", "0"), noNulls))
    // a wire value the long parser rejects must be KEPT (under-filtering
    // only): the typed cast downstream owns the real semantics
    assert(p.eval(row("not-a-number", "x", "0"), noNulls))
    // null never satisfies a comparison
    assert(!p.eval(row("9", "x", "0"), Array(true, false, false)))
  }

  test("double comparison on a double column") {
    val p = pred(LessThanOrEqual("score", 1.5))
    assert(p.eval(row("1", "x", "1.5"), noNulls))
    assert(!p.eval(row("1", "x", "1.6"), noNulls))
  }

  test("string ORDER comparisons are not compiled (UTF8String vs Java order)") {
    assert(CdcWireFilters.compile(GreaterThan("name", "m"), schema, true).isEmpty)
    assert(CdcWireFilters.compile(LessThan("name", "m"), schema, true).isEmpty)
  }

  test("In on strings and integers; null row matches neither") {
    val ps = pred(In("name", Array("a", "b")))
    assert(ps.eval(row("1", "a", "0"), noNulls))
    assert(!ps.eval(row("1", "c", "0"), noNulls))
    assert(!ps.eval(row("1", "a", "0"), Array(false, true, false)))
    val pi = pred(In("seq", Array(1, 3)))
    assert(pi.eval(row("3", "x", "0"), noNulls))
    assert(!pi.eval(row("2", "x", "0"), noNulls))
  }

  test("Not collapses three-valued logic safely: null row is KEPT") {
    val p = pred(Not(EqualTo("name", "alice")))
    assert(!p.eval(row("1", "alice", "0"), noNulls))
    assert(p.eval(row("1", "bob", "0"), noNulls))
    // SQL says NOT(null = 'alice') is null → row filtered; we keep it and
    // rely on the residual — the safe direction
    assert(p.eval(row("1", "", "0"), Array(false, true, false)))
  }

  test("IsNull / IsNotNull honor the mode's null convention") {
    assert(pred(IsNull("name")).eval(row("1", "", "0"), Array(false, true, false)))
    assert(!pred(IsNull("name")).eval(row("1", "x", "0"), noNulls))
    assert(pred(IsNotNull("name")).eval(row("1", "x", "0"), noNulls))
    // raw mode: decode is null→"", a raw column is never SQL-null
    assert(!pred(IsNull("name"), typed = false)
      .eval(row("1", "", "0"), Array(false, true, false)))
    assert(pred(IsNotNull("name"), typed = false)
      .eval(row("1", "", "0"), Array(false, true, false)))
  }

  test("startsWith/endsWith/contains compile; And/Or compose") {
    val p = pred(And(StringStartsWith("name", "al"), GreaterThan("seq", 0)))
    assert(p.eval(row("1", "alice", "0"), noNulls))
    assert(!p.eval(row("1", "bob", "0"), noNulls))
    assert(!p.eval(row("0", "alice", "0"), noNulls))
    val q = pred(Or(EqualTo("name", "x"), EqualTo("name", "y")))
    assert(q.eval(row("1", "y", "0"), noNulls))
    assert(!q.eval(row("1", "z", "0"), noNulls))
  }

  test("unknown column or unsupported shape does not compile; compileAll " +
      "drops them and AND-combines the rest") {
    assert(CdcWireFilters.compile(EqualTo("nope", "v"), schema, true).isEmpty)
    // a conjunct with one uncompilable side is dropped whole (And must
    // not degrade to the compilable half at the top level — that would
    // be fine semantically, but compile is all-or-nothing per filter)
    assert(CdcWireFilters.compile(
      And(EqualTo("name", "a"), EqualTo("nope", "b")), schema, true).isEmpty)
    val all = CdcWireFilters.compileAll(
      Seq(EqualTo("name", "a"), EqualTo("nope", "b"), GreaterThan("seq", 1)),
      schema, true)
    assert(all != null)
    assert(all.eval(row("2", "a", "0"), noNulls))
    assert(!all.eval(row("1", "a", "0"), noNulls))
    assert(CdcWireFilters.compileAll(Seq(EqualTo("nope", "b")), schema, true) == null)
  }

  test("EqualNullSafe: non-null literal behaves like EqualTo; null literal " +
      "is the IsNull test") {
    val p = pred(EqualNullSafe("name", "alice"))
    assert(p.eval(row("1", "alice", "0"), noNulls))
    assert(!p.eval(row("1", "", "0"), Array(false, true, false)))
    val pn = pred(EqualNullSafe("name", null))
    assert(pn.eval(row("1", "", "0"), Array(false, true, false)))
    assert(!pn.eval(row("1", "x", "0"), noNulls))
  }
}
