package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-lexicon membership counts over a token array in ONE codegen'd
  * pass: element i of the result is how many tokens are members of
  * `lexicons(i)` — exactly `size(filter(toks, t -> t IN (lexicon_i)))`
  * for every lexicon at once.
  *
  * Replaces K separate `filter` higher-order functions: `ArrayFilter`
  * is a CodegenFallback in Spark 4, so each lexicon score was an
  * INTERPRETED lambda walk over every token of every document — the
  * language-ID family paid 5 such walks per row and its sf10 wall
  * doubled-without-a-plan-change flag traced to exactly this
  * interpreted hot loop (VERDICT r17 #2; the [[SketchHamming]] /
  * [[DotProduct]] lesson applied to token membership). Here each token
  * is ONE hash probe of a per-JVM word table, inside whole-stage
  * codegen.
  *
  * Null semantics, pinned to the HOF formulation it replaces: null
  * token array → null result (standard unary null propagation); a null
  * ELEMENT makes the `IN` predicate null, which `filter` drops — so
  * null tokens count for no lexicon here too. Duplicate tokens count
  * once per occurrence, exactly like `filter`. */
case class LexiconCounts(child: Expression, lexicons: Seq[Seq[String]])
    extends UnaryExpression {

  require(lexicons.nonEmpty && lexicons.forall(_.nonEmpty),
    "need at least one non-empty lexicon")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_lexicon_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  @transient private lazy val table = LexiconCounts.table(lexicons)

  override protected def nullSafeEval(a: Any): Any =
    LexiconCounts.compute(a.asInstanceOf[ArrayData], table, lexicons.length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("lexTable", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.LexiconCounts.compute(" +
        s"$a, $tbl, ${lexicons.length});")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LexiconCounts {

  /** word → indices of the lexicons containing it (a word may appear in
    * several). Built once per expression instance per JVM. */
  private[functions] def table(lexicons: Seq[Seq[String]])
      : java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    lexicons.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  /** Shared by interpreted eval and codegen (single static call → stays
    * inside whole-stage codegen). */
  def compute(a: ArrayData, table: java.util.HashMap[UTF8String, Array[Int]],
      k: Int): ArrayData = {
    val counts = new Array[Int](k)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val hit = table.get(a.getUTF8String(i))
        if (hit != null) {
          var j = 0
          while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Column-level lexicon counts backed by [[LexiconCounts]]. */
  def lexCounts(toks: Column, lexicons: Seq[Seq[String]]): Column =
    ColumnShim.column(LexiconCounts(ColumnShim.expression(toks), lexicons))
}
