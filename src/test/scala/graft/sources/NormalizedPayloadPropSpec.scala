package graft.sources

import com.fasterxml.jackson.databind.json.JsonMapper
import graft.sources.cdc.{CdcField, WireNormalizer}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the normalized-changelog payload encoder:
  * whatever scalar text the wire delivered — control characters,
  * quotes, backslashes, unicode, numeric look-alikes, nulls — the
  * `payload` column must be ONE well-formed JSON object from which every
  * table-specific column extracts byte-exactly. A malformed payload
  * poisons every downstream `get_json_object`/`from_json` consumer, so
  * this is the row-level contract the whole normalized mode rests on. */
class NormalizedPayloadPropSpec extends AnyFunSuite {

  private val mapper = JsonMapper.builder().build()

  private val wire = Seq(
    CdcField("domain", "int"), CdcField("server_id", "int"),
    CdcField("sequence", "int"), CdcField("event_number", "int"),
    CdcField("timestamp", "int"), CdcField("event_type", "varchar(32)"),
    CdcField("txt", "varchar(255)"), CdcField("num", "bigint"),
    CdcField("flag", "bool"))

  private val required = StructType(Seq(
    StructField("sequence", LongType), StructField("payload", StringType),
    StructField("_table", StringType)))

  private val norm = WireNormalizer("db.t", wire, typed = true, required)

  // wire text: any printable/control/unicode mix, plus shapes that LOOK
  // like JSON literals and must still round-trip as the declared type
  private val wireText: Gen[String] = Gen.oneOf(
    Gen.asciiStr,
    Gen.listOf(Gen.oneOf(Gen.asciiPrintableChar,
      Gen.oneOf('"', '\\', '\n', '\r', '\t', '\b', '\f', ' ',
        '\u001b', '\u00e9', '\u5b57'))).map(_.mkString),
    // astral (surrogate-pair) char appended as a string
    Gen.asciiStr.map(_ + new String(Character.toChars(0x1D4B3))),
    Gen.oneOf("null", "true", "false", "123", "-0.5", "1e9", "NaN",
      "{\"k\":1}", "[1,2]", "", " "))

  private val numText: Gen[String] = Gen.oneOf(
    Gen.choose(Long.MinValue, Long.MaxValue).map(_.toString),
    Gen.oneOf("0", "-1", "not-a-number", "1.5", "", "9" * 30))

  private def holds(p: Prop): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(500), p)
    assert(r.passed, r.status.toString)
  }

  private def rowFor(txt: String, num: String, flag: String,
      nullTxt: Boolean): (Array[String], Array[Boolean]) = {
    val values = Array("0", "1", "7", "1", "1700000000", "insert",
      if (nullTxt) "" else txt, num, flag)
    val nulls = Array(false, false, false, false, false, false,
      nullTxt, false, false)
    (values, nulls)
  }

  test("payload is well-formed JSON and every column extracts byte-exactly") {
    holds(forAll(wireText, numText, Gen.oneOf("1", "0", "true", "false",
      "maybe"), Gen.oneOf(true, false)) { (txt, num, flag, nullTxt) =>
      val (values, nulls) = rowFor(txt, num, flag, nullTxt)
      val row = norm.toRow(values, nulls)
      val payload = row.getUTF8String(1).toString
      val node = mapper.readTree(payload) // throws on malformed JSON
      val keys = {
        val it = node.fieldNames(); val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next(); b.result()
      }
      // exactly the table-specific columns, in wire order
      keys == Seq("txt", "num", "flag") && {
        val txtOk =
          if (nullTxt) node.get("txt").isNull
          else node.get("txt").isTextual && node.get("txt").asText == txt
        // declared-numeric column: wire text that parses as a JSON number
        // stays a number (byte-exact), anything else degrades to a quoted
        // string rather than breaking the object
        val numOk =
          if (node.get("num").isNumber) node.get("num").asText == num
          else node.get("num").isTextual && node.get("num").asText == num
        val flagOk = node.get("flag").isBoolean ||
          (node.get("flag").isTextual && node.get("flag").asText == flag)
        txtOk && numOk && flagOk
      }
    })
  }

  test("metadata columns project typed from the wire row; _table is the tag") {
    val (values, nulls) = rowFor("x", "1", "1", nullTxt = false)
    val row = norm.toRow(values, nulls)
    assert(row.getLong(0) == 7L)
    assert(row.getUTF8String(2).toString == "db.t")
  }
}
