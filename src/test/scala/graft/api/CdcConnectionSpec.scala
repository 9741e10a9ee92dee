package graft.api

import graft.sources.MockMaxScaleServer
import graft.sources.MockMaxScaleServer.{Schema, event}
import org.scalatest.funsuite.AnyFunSuite

/** The reference consumer loop (examples/main.cpp:22-48) run verbatim
  * against the facade: construct → connect → read loop → error → close. */
class CdcConnectionSpec extends AnyFunSuite {

  test("reference consumer loop: connect, read N rows, timeout ends loop") {
    val srv = new MockMaxScaleServer(Schema, Seq(
      event(1, "insert", 10, "alice"),
      event(2, "insert", 11, "bob"),
      event(3, "update_after", 10, "alice2")))
    try {
      val c = new CdcConnection("127.0.0.1", srv.port, "u", "p", timeoutSeconds = 1)
      assert(c.connect("db.t"))
      assert(c.schema.contains("\"fields\""))
      assert(c.fields("name") == "varchar(64)")
      assert(c.fields("sequence") == "int")

      var rows = List.empty[CdcRow]
      var r = c.read()
      while (r.isDefined) { rows ::= r.get; r = c.read() }
      assert(c.error == CDC.Timeout) // loop ended by timeout, like the reference
      assert(rows.length == 3)
      val inOrder = rows.reverse
      assert(inOrder.map(_.value("id")) == List("10", "11", "10"))
      assert(inOrder.head.gtid == "0-1-1")
      assert(inOrder.last.gtid == "0-1-3")
      assert(inOrder.head.length == 8)
      assert(inOrder.head.key(7) == "name")
      assert(inOrder.head.sqlType(7) == "varchar(64)")
      intercept[NoSuchElementException](inOrder.head.value("nope"))
      c.close()
      c.close() // idempotent
    } finally srv.close()
  }

  test("gtid resume skips nothing (server replays inclusively; facade is faithful)") {
    val srv = new MockMaxScaleServer(Schema,
      (1L to 5L).map(i => event(i, "insert", i.toInt, s"n$i")))
    try {
      val c = new CdcConnection("127.0.0.1", srv.port, "u", "p", 1)
      assert(c.connect("db.t", gtid = "0-1-3"))
      var seqs = List.empty[String]
      var r = c.read()
      while (r.isDefined) { seqs ::= r.get.value("sequence"); r = c.read() }
      // the reference passes the GTID through and delivers what the server
      // replays — inclusive from 3 (dedup is the Spark source's job)
      assert(seqs.reverse == List("3", "4", "5"))
      c.close()
    } finally srv.close()
  }

  test("auth failure: connect returns false with the error set, no throw") {
    val srv = new MockMaxScaleServer(Schema, Nil, rejectAuth = true)
    try {
      val c = new CdcConnection("127.0.0.1", srv.port, "u", "bad", 1)
      assert(!c.connect("db.t"))
      assert(c.error.nonEmpty)
    } finally srv.close()
  }

  test("quiet stream: connect fails with Timeout, like the reference pre-read") {
    // reference connect() succeeds only if read() yields a row
    // (cdc_connector.cpp:214-218); a stream with no events must fail
    val srv = new MockMaxScaleServer(Schema, Nil)
    try {
      val c = new CdcConnection("127.0.0.1", srv.port, "u", "p", 1)
      assert(!c.connect("db.t"))
      assert(c.error == CDC.Timeout)
      assert(c.read().isEmpty) // not connected
    } finally srv.close()
  }

  test("null column arrives as empty string (reference raw semantics)") {
    val srv = new MockMaxScaleServer(Schema, Seq(event(1, "insert", 7, null)))
    try {
      val c = new CdcConnection("127.0.0.1", srv.port, "u", "p", 1)
      assert(c.connect("db.t"))
      val r = c.read().get
      assert(r.value("name") == "")
      c.close()
    } finally srv.close()
  }
}
