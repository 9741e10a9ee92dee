package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import graft.sources.cdc._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pure protocol-layer units: auth string format (A2), schema parsing (A9),
  * value stringification (§1.2), SQL-type mapping (§1.3), GTID (§1.4). */
class CdcProtocolSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  test("auth message is hex(user:) + hex(sha1(password)), lowercase") {
    // golden: hex("" + ":") = "3a"; sha1("") = da39a3ee... (public constant)
    assert(CdcClient.authMessage("", "") ==
      "3a" + "da39a3ee5e6b4b0d3255bfef95601890afd80709")
    val m = CdcClient.authMessage("cdcuser", "cdcpass")
    assert(m.startsWith("636463757365723a")) // hex("cdcuser:")
    assert(m.length == "cdcuser:".length * 2 + 40)
    assert(m == m.toLowerCase)
  }

  test("schema detection requires non-empty fields with a name") {
    assert(CdcClient.isSchema(mapper.readTree("""{"fields":[{"name":"a"}]}""")))
    assert(!CdcClient.isSchema(mapper.readTree("""{"fields":[]}""")))
    assert(!CdcClient.isSchema(mapper.readTree("""{"fields":[{"type":"int"}]}""")))
    assert(!CdcClient.isSchema(mapper.readTree("""{"id":1,"name":"x"}""")))
  }

  test("schema fields prefer real_type, degrade non-string types, append length") {
    val fields = CdcClient.parseSchemaFields(mapper.readTree(
      """{"fields":[
        {"name":"a","type":"string","real_type":"varchar","length":255},
        {"name":"b","type":"int"},
        {"name":"c","type":["null","string"]},
        {"name":"d"},
        {"name":"e","type":"string","real_type":"decimal","length":10}
      ]}"""))
    assert(fields == Seq(
      CdcField("a", "varchar(255)"),
      CdcField("b", "int"),
      CdcField("c", "varchar(50)"), // non-textual type degrades (cpp:270)
      CdcField("d", "undefined"),
      CdcField("e", "decimal(10)")))
  }

  test("scalar stringification: null distinct, bools lowered, containers empty") {
    def s(j: String) = CdcClient.scalarToString(mapper.readTree(j))
    assert(s(""""x"""") == "x")
    assert(s("42") == "42")
    assert(s("true") == "true" && s("false") == "false")
    assert(s("null") == null)
    assert(s("""[1,2]""") == "")
    assert(s("""{"k":1}""") == "")
    assert(s("1.5") == "1.5")
  }

  test("SQL type mapping handles MariaDB-isms") {
    assert(SqlTypes.toSpark("int(11)") == IntegerType)
    assert(SqlTypes.toSpark("bigint(20)") == LongType)
    assert(SqlTypes.toSpark("bigint unsigned") == DecimalType(20, 0))
    assert(SqlTypes.toSpark("varchar(255)") == StringType)
    assert(SqlTypes.toSpark("decimal(10,2)") == DecimalType(10, 2))
    assert(SqlTypes.toSpark("datetime") == TimestampType)
    assert(SqlTypes.toSpark("date") == DateType)
    assert(SqlTypes.toSpark("tinyint(1)") == ByteType)
    assert(SqlTypes.toSpark("double") == DoubleType)
    assert(SqlTypes.toSpark("longblob") == BinaryType)
    assert(SqlTypes.toSpark("undefined") == StringType)
    assert(SqlTypes.toSpark("enum('a','b')") == StringType)
  }

  test("typed cast: numerics, timestamps, null, garbage → null") {
    assert(SqlTypes.cast("7", isNull = false, IntegerType) == 7)
    assert(SqlTypes.cast("", isNull = true, IntegerType) == null)
    assert(SqlTypes.cast("zzz", isNull = false, IntegerType) == null)
    val micros = SqlTypes.cast("2024-01-02 03:04:05", isNull = false, TimestampType)
    assert(micros == 1704164645000000L)
    assert(SqlTypes.cast("2024-01-02", isNull = false, DateType) == 19724)
  }

  test("typed cast: timestamps accept 0-6 fractional digits (datetime(1..6))") {
    val base = 1704164645000000L
    // timestamp(3)-style value — a fixed .SSSSSS pattern would null this
    assert(SqlTypes.cast("2024-01-02 03:04:05.123", isNull = false, TimestampType)
      == base + 123000L)
    assert(SqlTypes.cast("2024-01-02 03:04:05.1", isNull = false, TimestampType)
      == base + 100000L)
    assert(SqlTypes.cast("2024-01-02 03:04:05.123456", isNull = false, TimestampType)
      == base + 123456L)
    // date-only datetime text parses to midnight, not null
    assert(SqlTypes.cast("2024-01-02", isNull = false, TimestampType)
      == 1704153600000000L)
    assert(SqlTypes.cast("2024-01-02 03:04:05.1234567", isNull = false, TimestampType)
      == null) // 7 digits exceeds MariaDB's max precision → unparseable
  }

  test("GTID parse, order, offset json round-trip") {
    val g = Gtid.parse("0-1-42")
    assert(g == Gtid(0, 1, 42))
    assert(Gtid.parse("0-1-42") < Gtid.parse("0-1-43"))
    assert(GtidOffset(Some(g)).json() == "0-1-42")
    assert(GtidOffset.fromJson("0-1-42").gtid.contains(g))
    assert(GtidOffset.fromJson("").gtid.isEmpty)
    intercept[IllegalArgumentException](Gtid.parse("bogus"))
  }

  test("GTID order is (domain, sequence, serverId) — Ordered consistent with equals") {
    // failover: new primary (server_id 2) continues the domain's sequence —
    // temporal order follows sequence, not server_id
    assert(Gtid(0, 1, 100) < Gtid(0, 2, 101))
    assert(Gtid(0, 2, 100) < Gtid(0, 1, 101))
    // compare == 0 only when all three fields match (Ordered contract)
    assert(Gtid(0, 1, 100).compare(Gtid(0, 2, 100)) != 0)
    assert(Gtid(0, 1, 100).compare(Gtid(0, 1, 100)) == 0)
    // domains are parallel streams; ordering across them is lexicographic
    assert(Gtid(1, 1, 1) > Gtid(0, 9, 999))
  }

  test("GtidRangeCuts: disjoint, covering, degenerate-safe") {
    import graft.sources.cdc.GtidRangeCuts.sequenceCuts
    def covers(rs: Seq[(Option[Gtid], Gtid)], start: Option[Gtid], end: Gtid): Unit = {
      assert(rs.head._1 == start)
      assert(rs.last._2 == end)
      rs.sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) => assert(lo2.contains(hi))
        case _ => ()
      }
      rs.foreach { case (lo, hi) => assert(lo.forall(_ < hi)) }
    }
    // even split from stream start
    val a = sequenceCuts(None, Gtid(0, 1, 100), 4)
    assert(a.length == 4)
    covers(a, None, Gtid(0, 1, 100))
    assert(a.map(_._2.sequence) == Seq(25L, 50L, 75L, 100L))
    // explicit start: cuts measure the (start, end] span, not [0, end]
    val b = sequenceCuts(Some(Gtid(0, 1, 60)), Gtid(0, 1, 100), 4)
    covers(b, Some(Gtid(0, 1, 60)), Gtid(0, 1, 100))
    assert(b.map(_._2.sequence) == Seq(70L, 80L, 90L, 100L))
    // span narrower than n collapses to one chunk (step == 0)
    assert(sequenceCuts(Some(Gtid(0, 1, 98)), Gtid(0, 1, 100), 4)
      == Seq((Some(Gtid(0, 1, 98)), Gtid(0, 1, 100))))
    // n <= 1 is the identity
    assert(sequenceCuts(None, Gtid(0, 1, 100), 1)
      == Seq((None, Gtid(0, 1, 100))))
    // huge sequences: the cut arithmetic must not overflow
    val big = sequenceCuts(Some(Gtid(0, 1, Long.MaxValue - 100)),
      Gtid(0, 1, Long.MaxValue), 4)
    covers(big, Some(Gtid(0, 1, Long.MaxValue - 100)), Gtid(0, 1, Long.MaxValue))
    assert(big.length == 4)
  }

  test("WireNormalizer payload: typed quoting, null, escaping, corrupt " +
      "numerics degrade to strings") {
    import graft.sources.cdc.{NormalizedCdc, WireNormalizer, MultiCdc}
    import org.apache.spark.sql.types.{StringType, StructType, StructField}
    val meta = Seq(
      CdcField("domain", "int"), CdcField("server_id", "int"),
      CdcField("sequence", "int"), CdcField("event_number", "int"),
      CdcField("timestamp", "int"), CdcField("event_type", "varchar(32)"))
    val wire = meta ++ Seq(
      CdcField("id", "int"), CdcField("price", "decimal(10,2)"),
      CdcField("ok", "bool"), CdcField("note", "text"))
    val required = StructType(Seq(
      StructField("sequence", org.apache.spark.sql.types.IntegerType),
      StructField(NormalizedCdc.PayloadColumn, StringType),
      StructField(MultiCdc.TableColumn, StringType)))
    val nz = WireNormalizer("db.x", wire, typed = true, required)
    def row(id: String, price: String, ok: String, note: String,
        nulls: Array[Boolean]) = {
      val values = Array("0", "1", "7", "1", "1700", "insert",
        id, price, ok, note)
      nz.toRow(values, Array.fill(6)(false) ++ nulls)
    }
    // declared-numeric stays a JSON number; bool lowers; strings quote
    val r1 = row("42", "19.99", "1", "plain", Array(false, false, false, false))
    assert(r1.getInt(0) == 7)
    assert(r1.getUTF8String(1).toString ==
      """{"id":42,"price":19.99,"ok":true,"note":"plain"}""")
    assert(r1.getUTF8String(2).toString == "db.x")
    // JSON null survives; escaping covers quote/backslash/control
    val r2 = row("42", "19.99", "0", "a\"b\\c\nd" + 1.toChar,
      Array(false, false, false, false))
    assert(r2.getUTF8String(1).toString ==
      """{"id":42,"price":19.99,"ok":false,"note":"a\"b\\c\nd@CTRL"}"""
        .replace("@CTRL", "\\u0001"))
    val r3 = row(null, "19.99", "1", "x", Array(true, false, false, false))
    assert(r3.getUTF8String(1).toString ==
      """{"id":null,"price":19.99,"ok":true,"note":"x"}""")
    // a corrupt numeric wire value must not break the payload's JSON
    val r4 = row("12abc", "-1.5e3", "maybe", "x", Array(false, false, false, false))
    assert(r4.getUTF8String(1).toString ==
      """{"id":"12abc","price":-1.5e3,"ok":"maybe","note":"x"}""")
  }

  test("NormalizedCdc.validate: missing metadata and mismatched meta types " +
      "fail at plan time") {
    import graft.sources.cdc.NormalizedCdc
    val ok = Seq(
      CdcField("domain", "int"), CdcField("server_id", "int"),
      CdcField("sequence", "int"), CdcField("event_number", "int"),
      CdcField("timestamp", "int"), CdcField("event_type", "varchar(32)"),
      CdcField("id", "int"))
    NormalizedCdc.validate(Seq("db.a" -> ok, "db.b" -> (ok :+ CdcField("x", "text"))))
    val noGtid = ok.filterNot(_.name == "sequence")
    val e1 = intercept[CdcProtocolException](
      NormalizedCdc.validate(Seq("db.a" -> ok, "db.b" -> noGtid)))
    assert(e1.getMessage.contains("missing [sequence]"))
    val drifted = ok.map(f =>
      if (f.name == "timestamp") CdcField("timestamp", "bigint") else f)
    val e2 = intercept[CdcProtocolException](
      NormalizedCdc.validate(Seq("db.a" -> ok, "db.b" -> drifted)))
    assert(e2.getMessage.contains("share one declared type"))
  }

  test("credentials never appear in rendered options or task descriptors") {
    val secret = "s3cr3t-hunter2"
    val opts = CdcOptions("h", 4001, "u", secret, "db.t", None, 10,
      typed = true, maxEventsPerBatch = 1000, replayPartitions = 1)
    assert(!opts.toString.contains(secret))
    assert(opts.toString.contains("u")) // user stays visible for debugging
    // replay partitions are serialized into task descriptors and rendered
    // by Spark's UI/logs — the password must be masked there too
    val part = CdcReplayPartition("h", 4001, "u", secret, "db.t",
      Seq(CdcField("id", "int")), Some("0-1-1"), "0-1-9", 10000)
    assert(!part.toString.contains(secret))
    assert(part.toString.contains("0-1-9"))
    // equality/copy semantics of the case classes are unaffected
    assert(part.copy().password == secret)
  }
}
