package graft.sources

import graft.sources.cdc.{CdcField, SqlTypes}
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the SQL-type grammar (SURVEY.md §5 item 3):
  * the mapping must be total over MariaDB's type-string shapes, ignore
  * display widths, be case-insensitive, and round-trip through the
  * metadata the typed schema carries. */
class SqlTypesPropSpec extends AnyFunSuite {

  private val baseTypes = Gen.oneOf(
    "tinyint", "smallint", "mediumint", "int", "integer", "bigint",
    "float", "double", "real", "decimal", "numeric", "date", "datetime",
    "timestamp", "time", "year", "char", "varchar", "text", "tinytext",
    "mediumtext", "longtext", "blob", "binary", "varbinary", "enum",
    "set", "json", "undefined", "string", "boolean", "bool")

  private val typeStrings: Gen[String] = for {
    base <- baseTypes
    prec <- Gen.option(Gen.choose(1, 65))
    scale <- Gen.option(Gen.choose(0, 30))
    args = prec.map(p => scale.filter(_ => base == "decimal" || base == "numeric")
      .map(s2 => s"($p,${math.min(s2, p)})").getOrElse(s"($p)")).getOrElse("")
    upper <- Gen.oneOf(true, false)
  } yield if (upper) s"$base$args".toUpperCase else s"$base$args"

  private def holds(p: Prop): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(500), p)
    assert(r.passed, r.status.toString)
  }

  test("mapping is total: every generated type string maps to some DataType") {
    holds(forAll(typeStrings) { t => SqlTypes.toSpark(t) != null })
  }

  test("display width never changes the mapped type (except decimal precision)") {
    holds(forAll(baseTypes.filterNot(b => b == "decimal" || b == "numeric"),
      Gen.choose(1, 64)) { (b, w) =>
      SqlTypes.toSpark(s"$b($w)") == SqlTypes.toSpark(b)
    })
  }

  test("case-insensitive") {
    holds(forAll(typeStrings) { t =>
      SqlTypes.toSpark(t) == SqlTypes.toSpark(t.toLowerCase)
    })
  }

  test("decimal precision/scale are honored and bounded") {
    holds(forAll(Gen.choose(1, 38), Gen.choose(0, 30)) { (p, s0) =>
      val s2 = math.min(s0, p)
      SqlTypes.toSpark(s"decimal($p,$s2)") == DecimalType(p, s2)
    })
  }

  test("typed struct round-trips the original SQL type string in metadata") {
    holds(forAll(Gen.listOfN(5, typeStrings)) { ts =>
      val fields = ts.zipWithIndex.map { case (t, i) => CdcField(s"c$i", t) }
      val st = SqlTypes.toStructType(fields, typed = true)
      st.fields.toSeq.zip(fields).forall { case (sf, cf) =>
        sf.metadata.getString("cdc.sqlType") == cf.sqlType &&
          sf.dataType == SqlTypes.toSpark(cf.sqlType)
      }
    })
  }
}
