"""Socket-source streaming END-TO-END (SURVEY.md §2.9 CREATE STREAM
... socket): a real in-process TCP server feeds newline CSV records
to Spark's socket source; the stream parses the payload through the
same parse_payload path the Kafka source uses and commits streaming
segments into a managed table. This upgrades the socket path from
plumbing-only to e2e-verified — and exercises the shared
record-format parsing the (broker-less) Kafka contract tests can
only cover statically. Reference analogue:
CarbonCreateStreamCommand's socket source
(integration/spark/.../stream/ suites)."""

from __future__ import annotations

import socket
import socketserver
import threading
import time

import pytest

from cdh_integrate_carbondata2_3_spark.catalog import Table
from cdh_integrate_carbondata2_3_spark.streaming import StreamManager


class _LineServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


def _start_server(lines):
    """TCP server that writes `lines` to every client then holds the
    connection open (Spark's socket source reconnects on close)."""
    done = threading.Event()

    class H(socketserver.BaseRequestHandler):
        def handle(self):
            payload = ("\n".join(lines) + "\n").encode()
            self.request.sendall(payload)
            done.set()
            # keep the connection open so the source doesn't restart
            while not self.server._shutdown_requested:  # type: ignore
                time.sleep(0.1)

    srv = _LineServer(("127.0.0.1", 0), H)
    srv._shutdown_requested = False
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1], done


def test_socket_stream_end_to_end(spark, tmp_path):
    rows = [f"{i},{i * 0.5}" for i in range(40)]
    srv, port, sent = _start_server(rows)
    sink = Table.create(spark, str(tmp_path / "socksink"),
                        "id bigint, v double", {"streaming": True})
    mgr = StreamManager(spark)
    info = mgr.create_stream(
        "socks", sink, source_kind="socket",
        source_options={"host": "127.0.0.1", "port": str(port)},
        record_format="csv", source_schema="id bigint, v double",
        trigger_interval="1 seconds")
    try:
        assert sent.wait(30), "server never got a connection"
        deadline = time.time() + 60
        while time.time() < deadline:
            if not info.query.isActive:
                raise AssertionError(info.query.exception())
            if sink.read().count() == 40:
                break
            time.sleep(0.5)
        got = sink.read().orderBy("id").collect()
        assert len(got) == 40, f"only {len(got)} rows landed"
        assert [r["id"] for r in got] == list(range(40))
        assert got[7]["v"] == pytest.approx(3.5)
        # rows landed as STREAMING segments through the same commit
        # path the file source uses
        from cdh_integrate_carbondata2_3_spark.catalog.manifest import (
            SegmentStatus)
        assert any(s.status == SegmentStatus.STREAMING
                   for s in sink.manifest.segments())
    finally:
        srv._shutdown_requested = True
        mgr.stop_all()
        srv.shutdown()
