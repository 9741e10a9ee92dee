"""Tests for the pure-Python MaxScale CDC client (cdc_connector.py).

Runs against an in-process loopback mock of the MaxScale CDC endpoint —
the Python twin of the Scala suite's MockMaxScaleServer
(src/test/scala/graft/sources/MockMaxScaleServer.scala) — covering the
same failure-mode catalog: auth rejection, ERR-without-newline, quiet
streams, mid-stream re-schema, null conflation, GTID replay.

Run with:  python3 -m unittest discover -s python -v
(stdlib only — no pytest, no pyspark needed)
"""

import hashlib
import json
import socket
import threading
import time
import unittest

import cdc_connector as cdc

SCHEMA = json.dumps({
    "namespace": "MaxScaleChangeDataSchema.avro",
    "type": "record",
    "name": "ChangeRecord",
    "fields": [
        {"name": "domain", "type": "int", "real_type": "int", "length": -1},
        {"name": "server_id", "type": "int", "real_type": "int", "length": -1},
        {"name": "sequence", "type": "int", "real_type": "int", "length": -1},
        {"name": "event_number", "type": "int", "real_type": "int", "length": -1},
        {"name": "timestamp", "type": "int", "real_type": "int", "length": -1},
        {"name": "event_type", "type": "string", "real_type": "varchar", "length": 32},
        {"name": "id", "type": "int", "real_type": "int", "length": -1},
        {"name": "name", "type": "string", "real_type": "varchar", "length": 64},
    ],
})

SCHEMA_V2 = json.dumps(json.loads(SCHEMA)["fields"] and {
    **json.loads(SCHEMA),
    "fields": json.loads(SCHEMA)["fields"] + [
        {"name": "extra", "type": "string", "real_type": "varchar", "length": 16},
    ],
})


def event(seq, event_type="insert", id_=1, name="alice", extra=None):
    ev = {
        "domain": 0, "server_id": 1, "sequence": seq, "event_number": 1,
        "timestamp": 1700000000 + seq, "event_type": event_type,
        "id": id_, "name": name,
    }
    if extra is not None:
        ev["extra"] = extra
    return json.dumps(ev)


class MockServer:
    """Loopback mock of MaxScale's CDC endpoint: auth -> OK, REGISTER ->
    OK, REQUEST-DATA -> schema + newline-JSON events (GTID-inclusive
    replay), with knobs for every failure mode the client handles."""

    def __init__(self, schema=SCHEMA, events=(), reject_auth=False,
                 expected_auth=None, err_on_request=None,
                 mid_stream_schema_after=None, drop_key_at=None):
        self.schema = schema
        self.events = list(events)
        self.reject_auth = reject_auth
        self.expected_auth = expected_auth
        self.err_on_request = err_on_request
        self.mid_stream_schema_after = mid_stream_schema_after
        self.drop_key_at = drop_key_at
        self.last_auth = None
        self.last_request = None
        self.saw_close = threading.Event()
        self._lock = threading.Lock()
        self._running = True
        self._srv = socket.create_server(("127.0.0.1", 0))
        self._srv.settimeout(0.2)
        self.port = self._srv.getsockname()[1]
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    def push(self, ev):
        with self._lock:
            self.events.append(ev)

    def _accept_loop(self):
        while self._running:
            try:
                s, _ = self._srv.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            threading.Thread(target=self._handle, args=(s,), daemon=True).start()

    def _handle(self, s):
        try:
            s.settimeout(0.2)
            self.last_auth = self._read_chunk(s)
            if self.reject_auth or (
                self.expected_auth is not None
                and self.last_auth != self.expected_auth
            ):
                s.sendall(b"ERR: authentication failed\n")
                return
            s.sendall(b"OK\n")
            reg = self._read_chunk(s)
            if not reg.startswith("REGISTER UUID=") or "TYPE=JSON" not in reg:
                s.sendall(b"ERR: bad registration\n")
                return
            s.sendall(b"OK\n")
            req = self._read_chunk(s)
            if req.startswith("CLOSE"):
                self.saw_close.set()
                return
            self.last_request = req
            if self.err_on_request is not None:
                # note: deliberately NO trailing newline (MaxScale quirk)
                s.sendall(self.err_on_request.encode())
                return
            parts = req.split()
            assert parts[0] == "REQUEST-DATA", req
            # GTID replay is INCLUSIVE of the requested position
            from_seq = int(parts[2].split("-")[2]) if len(parts) >= 3 else None
            s.sendall(self.schema.encode() + b"\n")
            sent = 0
            idx = 0
            swapped = False
            while self._running:
                with self._lock:
                    snapshot = list(self.events)
                while idx < len(snapshot):
                    ev = snapshot[idx]
                    idx += 1
                    seq = json.loads(ev).get("sequence")
                    if from_seq is not None and seq is not None and seq < from_seq:
                        continue
                    if (self.mid_stream_schema_after is not None
                            and sent == self.mid_stream_schema_after[0]
                            and not swapped):
                        s.sendall(self.mid_stream_schema_after[1].encode() + b"\n")
                        swapped = True
                    if self.drop_key_at is not None and sent == self.drop_key_at:
                        obj = json.loads(ev)
                        del obj["name"]
                        ev = json.dumps(obj)
                    s.sendall(ev.encode() + b"\n")
                    sent += 1
                try:
                    cmd = self._read_chunk(s)
                    if cmd.startswith("CLOSE"):
                        self.saw_close.set()
                        return
                except socket.timeout:
                    pass
        except OSError:
            pass
        finally:
            try:
                s.close()
            except OSError:
                pass

    @staticmethod
    def _read_chunk(s):
        data = s.recv(4096)
        if not data:
            raise socket.timeout("closed")
        return data.decode()

    def close(self):
        self._running = False
        try:
            self._srv.close()
        except OSError:
            pass


class CdcConnectorTest(unittest.TestCase):

    def _connect(self, srv, timeout=2, user="u", password="p",
                 table="db.t", gtid=""):
        conn = cdc.Connection("127.0.0.1", srv.port, user, password,
                              timeout=timeout)
        self.addCleanup(conn.close)
        self.addCleanup(srv.close)
        return conn, conn.connect(table, gtid)

    def test_happy_path_read_loop(self):
        srv = MockServer(events=[event(i, id_=i) for i in range(1, 4)])
        conn, ok = self._connect(srv)
        self.assertTrue(ok, conn.error())
        rows = []
        row = conn.read()
        while row:
            rows.append(row)
            row = conn.read()
        self.assertEqual(conn.error(), cdc.TIMEOUT)  # drained, not dead
        self.assertEqual([r.value("id") for r in rows], ["1", "2", "3"])
        self.assertEqual(rows[0].gtid(), "0-1-1")
        self.assertEqual(rows[0].value(6), "1")          # by index
        self.assertEqual(rows[0].key(6), "id")
        self.assertEqual(rows[0].type(5), "varchar(32)")  # length applied
        self.assertEqual(rows[0].length(), 8)
        self.assertEqual(len(rows[0]), 8)                 # __len__
        self.assertEqual(rows[0]["name"], "alice")        # __getitem__
        self.assertEqual(conn.fields()["sequence"], "int")
        self.assertIn('"fields"', conn.schema())

    def test_auth_message_format(self):
        srv = MockServer(
            events=[event(1)],
            expected_auth="u:".encode().hex()
            + hashlib.sha1(b"p").hexdigest(),
        )
        conn, ok = self._connect(srv)
        self.assertTrue(ok, conn.error())  # server verified the hex format

    def test_auth_rejection(self):
        srv = MockServer(reject_auth=True)
        conn, ok = self._connect(srv)
        self.assertFalse(ok)
        self.assertIn("authentication failed", conn.error())

    def test_err_without_newline_on_request(self):
        srv = MockServer(err_on_request="ERR: table not found")
        conn, ok = self._connect(srv)
        self.assertFalse(ok)
        self.assertEqual(conn.error(), "ERR: table not found")

    def test_quiet_stream_fails_connect_with_timeout(self):
        srv = MockServer(events=[])  # schema arrives, no rows ever
        conn, ok = self._connect(srv, timeout=1)
        self.assertFalse(ok)
        self.assertEqual(conn.error(), cdc.TIMEOUT)

    def test_timeout_then_resume_on_push(self):
        srv = MockServer(events=[event(1)])
        conn, ok = self._connect(srv, timeout=1)
        self.assertTrue(ok, conn.error())
        self.assertEqual(conn.read().value("sequence"), "1")
        self.assertIsNone(conn.read())          # drained
        self.assertEqual(conn.error(), cdc.TIMEOUT)
        srv.push(event(2))                       # stream comes alive again
        row = None
        deadline = time.monotonic() + 5
        while row is None and time.monotonic() < deadline:
            row = conn.read()
        self.assertIsNotNone(row)
        self.assertEqual(row.value("sequence"), "2")
        self.assertEqual(conn.error(), "")

    def test_gtid_resume_is_inclusive(self):
        srv = MockServer(events=[event(i) for i in range(1, 6)])
        conn, ok = self._connect(srv, gtid="0-1-3")
        self.assertTrue(ok, conn.error())
        seqs = []
        row = conn.read()
        while row:
            seqs.append(row.value("sequence"))
            row = conn.read()
        self.assertEqual(seqs, ["3", "4", "5"])
        self.assertIn("0-1-3", srv.last_request)

    def test_mid_stream_reschema_adopted(self):
        srv = MockServer(
            events=[event(1), event(2, extra="x")],
            mid_stream_schema_after=(1, SCHEMA_V2),
        )
        conn, ok = self._connect(srv)
        self.assertTrue(ok, conn.error())
        r1 = conn.read()
        self.assertEqual(r1.length(), 8)
        r2 = conn.read()
        self.assertEqual(r2.length(), 9)          # new column visible
        self.assertEqual(r2.value("extra"), "x")
        self.assertEqual(conn.fields()["extra"], "varchar(16)")
        self.assertIn("extra", conn.schema())      # raw schema swapped

    def test_null_becomes_empty_string(self):
        srv = MockServer(events=[event(1, name=None)])
        conn, ok = self._connect(srv)
        self.assertTrue(ok, conn.error())
        self.assertEqual(conn.read().value("name"), "")

    def test_missing_key_is_an_error(self):
        srv = MockServer(events=[event(1), event(2)], drop_key_at=1)
        conn, ok = self._connect(srv)
        self.assertTrue(ok, conn.error())
        self.assertIsNotNone(conn.read())
        self.assertIsNone(conn.read())
        self.assertEqual(conn.error(), "No value for key found: name")

    def test_close_sends_close_and_is_idempotent(self):
        srv = MockServer(events=[event(1)])
        conn, ok = self._connect(srv)
        self.assertTrue(ok, conn.error())
        conn.close()
        conn.close()  # idempotent
        self.assertTrue(srv.saw_close.wait(2))
        self.assertIsNone(conn.read())
        self.assertEqual(conn.error(), "not connected")

    def test_repr_never_leaks_password(self):
        conn = cdc.Connection("h", 1, "u", "s3cr3t-hunter2")
        self.assertNotIn("s3cr3t-hunter2", repr(conn))

    def test_context_manager(self):
        srv = MockServer(events=[event(1)])
        with cdc.Connection("127.0.0.1", srv.port, "u", "p", timeout=2) as conn:
            self.assertTrue(conn.connect("db.t"), conn.error())
            self.assertEqual(conn.read().value("id"), "1")
        self.assertTrue(srv.saw_close.wait(2))
        srv.close()

    def test_schema_type_degradation(self):
        # non-string type -> varchar(50); missing type -> undefined
        weird = json.dumps({"fields": [
            {"name": "domain", "type": "int", "real_type": "int"},
            {"name": "server_id", "type": "int", "real_type": "int"},
            {"name": "sequence", "type": "int", "real_type": "int"},
            {"name": "a", "type": ["null", "string"]},
            {"name": "b"},
        ]})
        ev = json.dumps({"domain": 0, "server_id": 1, "sequence": 1,
                         "a": "x", "b": 2})
        srv = MockServer(schema=weird, events=[ev])
        conn, ok = self._connect(srv)
        self.assertTrue(ok, conn.error())
        self.assertEqual(conn.fields()["a"], "varchar(50)")
        self.assertEqual(conn.fields()["b"], "undefined")


class SparkOptionsTest(unittest.TestCase):
    """Pins the facade's Spark-source passthroughs to the exact option
    keys/values the Scala parser (graft CdcOptions) accepts — the
    r7/r8 source surface: multi-table subscriptions, normalized schema
    mode, bounded batch pulls, per-table composite starts."""

    def test_minimal_single_table(self):
        o = cdc.spark_options("h", "u", "pw", table="db.t")
        self.assertEqual(o, {
            "host": "h", "port": "4001", "user": "u", "password": "pw",
            "mode": "typed", "timeoutSeconds": "10", "table": "db.t"})

    def test_full_surface_keys_match_scala(self):
        o = cdc.spark_options(
            "h", "u", "pw", port=4009, tables=["db.a", "db.b"],
            schema_mode="normalized", mode="raw", timeout=3,
            starting_gtid={"db.a": "0-1-5", "db.b": None},
            max_events_per_batch=5000, replay_partitions=8)
        self.assertEqual(o["tables"], "db.a,db.b")
        self.assertEqual(o["schemaMode"], "normalized")
        self.assertEqual(o["mode"], "raw")
        self.assertEqual(o["startingGtid"], "db.a=0-1-5,db.b=-")
        self.assertEqual(o["maxEventsPerBatch"], "5000")
        self.assertEqual(o["replayPartitions"], "8")
        self.assertEqual(o["port"], "4009")

    def test_bounded_batch_pull(self):
        o = cdc.spark_options("h", "u", "pw", table="db.t",
                              starting_gtid="0-1-42", end_gtid="0-1-9000",
                              end_gtid_observed=True)
        self.assertEqual(o["startingGtid"], "0-1-42")
        self.assertEqual(o["endGtid"], "0-1-9000")
        self.assertEqual(o["endGtidObserved"], "true")

    def test_multi_table_end_gtid_must_be_composite(self):
        with self.assertRaises(ValueError):
            cdc.spark_options("h", "u", "pw", tables=["db.a", "db.b"],
                              end_gtid="0-1-9")
        o = cdc.spark_options("h", "u", "pw", tables=["db.a", "db.b"],
                              end_gtid={"db.a": "0-1-9", "db.b": None})
        self.assertEqual(o["endGtid"], "db.a=0-1-9,db.b=-")

    def test_validation_mirrors_scala_parser(self):
        # exactly one of table/tables
        with self.assertRaises(ValueError):
            cdc.spark_options("h", "u", "pw")
        with self.assertRaises(ValueError):
            cdc.spark_options("h", "u", "pw", table="db.t", tables=["db.a"])
        # enum values
        with self.assertRaises(ValueError):
            cdc.spark_options("h", "u", "pw", table="db.t",
                              schema_mode="wide")
        with self.assertRaises(ValueError):
            cdc.spark_options("h", "u", "pw", table="db.t", mode="json")
        # duplicate subscriptions
        with self.assertRaises(ValueError):
            cdc.spark_options("h", "u", "pw", tables=["db.a", "db.a"])
        # composite start needs multi-table mode
        with self.assertRaises(ValueError):
            cdc.spark_options("h", "u", "pw", table="db.t",
                              starting_gtid={"db.t": "0-1-5"})
        # composite entries must name subscribed tables
        with self.assertRaises(ValueError):
            cdc.spark_options("h", "u", "pw", tables=["db.a", "db.b"],
                              starting_gtid={"db.zzz": "0-1-5"})
        # malformed GTIDs fail client-side
        with self.assertRaises(ValueError):
            cdc.spark_options("h", "u", "pw", table="db.t",
                              starting_gtid="0-1")
        # the "-" placeholder and the empty string are composite-only
        # sentinels: a plain single-table start must be a real GTID
        # (Gtid.parse("-") would otherwise throw at plan time, and ""
        # would be silently dropped by the Scala option filter)
        with self.assertRaises(ValueError):
            cdc.spark_options("h", "u", "pw", table="db.t",
                              starting_gtid="-")
        with self.assertRaises(ValueError):
            cdc.spark_options("h", "u", "pw", table="db.t",
                              starting_gtid="")
        # observed flag without a bound is meaningless
        with self.assertRaises(ValueError):
            cdc.spark_options("h", "u", "pw", table="db.t",
                              end_gtid_observed=True)

    def test_domain_vector_mode(self):
        # r10: per-domain watermark vectors for interleaved multi-domain
        # changelogs — single-table, uniform-schema, vector bounds
        o = cdc.spark_options("h", "u", "pw", table="db.t",
                              domain_mode="vector",
                              starting_gtid=["1-2-50", "0-1-100"],
                              catchup_span_per_connection=65536)
        self.assertEqual(o["domainMode"], "vector")
        # ORDER PRESERVED: entry order carries log-arrival order
        self.assertEqual(o["startingGtid"], "v:1-2-50,0-1-100")
        self.assertEqual(o["catchupSpanPerConnection"], "65536")
        # pre-rendered form passes through
        o2 = cdc.spark_options("h", "u", "pw", table="db.t",
                               domain_mode="vector",
                               end_gtid="v:0-1-9", end_gtid_observed=True)
        self.assertEqual(o2["endGtid"], "v:0-1-9")
        # r11: vector COMPOSES with tables= and with schema_mode=
        # normalized (MultiVector / normalized-with-vector-delegates)
        o3 = cdc.spark_options("h", "u", "pw", tables=["db.a", "db.b"],
                               domain_mode="vector")
        self.assertEqual(o3["domainMode"], "vector")
        self.assertEqual(o3["tables"], "db.a,db.b")
        o4 = cdc.spark_options("h", "u", "pw", table="db.t",
                               domain_mode="vector",
                               schema_mode="normalized")
        self.assertEqual(o4["domainMode"], "vector")
        self.assertEqual(o4["schemaMode"], "normalized")
        with self.assertRaises(ValueError):  # bare GTID is ambiguous
            cdc.spark_options("h", "u", "pw", table="db.t",
                              domain_mode="vector", starting_gtid="0-1-5")
        with self.assertRaises(ValueError):  # vector needs vector mode
            cdc.spark_options("h", "u", "pw", table="db.t",
                              starting_gtid=["0-1-5"])
        with self.assertRaises(ValueError):
            cdc.vector_gtid(["0-1-5", "0-2-9"])  # duplicate domain
        with self.assertRaises(ValueError):
            cdc.vector_gtid([])
        with self.assertRaises(ValueError):
            cdc.vector_gtid(["0-1"])

    def test_composite_gtid_helper(self):
        self.assertEqual(
            cdc.composite_gtid({"db.a": "0-1-5", "db.b": None}),
            "db.a=0-1-5,db.b=-")
        self.assertEqual(cdc.composite_gtid({"db.a": ""}), "db.a=-")
        with self.assertRaises(ValueError):
            cdc.composite_gtid({})
        with self.assertRaises(ValueError):
            cdc.composite_gtid({"db.a": "1-2"})
        with self.assertRaises(ValueError):
            cdc.composite_gtid({"db=a": "0-1-5"})


if __name__ == "__main__":
    unittest.main()
