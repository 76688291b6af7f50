"""Sink network adapters: per-partition transports for statsd datagrams and
Elasticsearch bulk bodies.

The reference's outputs actually SHIP bytes — statsd over UDP
(logshipper/outputs.py::prepare_statsd [approx]) and Elasticsearch over
bulk HTTP POST (``prepare_elasticsearch`` [approx]).  The columnar engine
renders byte-exact payloads in operators/sinkfmt.py (oracle-checked); this
module is the send seam: ``foreachPartition`` drains each partition through
a transport.

Transports are INJECTED as picklable factories (mirroring
``multimodal.set_decoder``'s seam pattern, but closure-carried rather than
module-global: a module global set on the driver never reaches a real
cluster's executors).  A factory is called once per partition on the
executor and returns ``send(payload: bytes)``; an optional ``send.close``
is invoked when the partition drains.  Defaults speak real protocols —
``udp_transport`` (datagrams) and ``http_transport`` (POST) — and the tests
round-trip both through a local UDP socket / HTTP server, asserting byte
equality with the oracle-checked payload columns.

Scale shape: one socket/connection per partition (not per row), payloads
batched to the statsd MTU / a bulk-docs cap, zero driver involvement —
the send runs where the data is.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

# a transport factory: called per partition ON THE EXECUTOR, returns send()
TransportFactory = Callable[[], Callable[[bytes], None]]


def udp_transport(host: str, port: int) -> TransportFactory:
    """Datagram transport — the statsd wire (one socket per partition)."""

    def make() -> Callable[[bytes], None]:
        import socket

        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

        def send(payload: bytes) -> None:
            sock.sendto(payload, (host, port))

        send.close = sock.close
        return send

    return make


def http_transport(url: str, content_type: str = "application/x-ndjson") -> TransportFactory:
    """HTTP POST transport — the Elasticsearch ``_bulk`` endpoint (one
    opener per partition; urllib keeps this dependency-free)."""

    def make() -> Callable[[bytes], None]:
        from urllib.request import Request, urlopen

        def send(payload: bytes) -> None:
            req = Request(url, data=payload, headers={"Content-Type": content_type})
            with urlopen(req) as resp:  # noqa: S310 — sink URL comes from config
                resp.read()

        return send

    return make


def send_statsd(
    df: DataFrame,
    line_col: str = "line",
    transport: TransportFactory | None = None,
    host: str = "127.0.0.1",
    port: int = 8125,
    mtu: int = 1400,
) -> None:
    """Ship rendered statsd lines (see sinkfmt.statsd_*_line) as datagrams.

    Lines are packed newline-joined up to ``mtu`` bytes per datagram — the
    multi-metric packet format every statsd server accepts — so a
    10^9-metric partition sends ~10^6 datagrams, not 10^9.  One socket per
    partition; the driver never sees a row."""
    make = transport or udp_transport(host, port)

    def run(rows) -> None:
        send = make()
        buf: list[bytes] = []
        size = 0
        try:
            for r in rows:
                b = r[line_col].encode("utf-8")
                if buf and size + 1 + len(b) > mtu:
                    send(b"\n".join(buf))
                    buf, size = [], 0
                buf.append(b)
                size += len(b) + (1 if size else 0)
            if buf:
                send(b"\n".join(buf))
        finally:
            close = getattr(send, "close", None)
            if close is not None:
                close()

    df.foreachPartition(run)


def send_es_bulk(
    df: DataFrame,
    bulk_col: str = "bulk",
    transport: TransportFactory | None = None,
    url: str = "http://127.0.0.1:9200/_bulk",
    batch_docs: int = 500,
) -> None:
    """Ship rendered bulk bodies (see sinkfmt.es_bulk_lines) as ``_bulk``
    POSTs: ``batch_docs`` action+doc pairs per request, newline-joined with
    the trailing newline the bulk API requires.  One connection per
    partition."""
    make = transport or http_transport(url)

    def run(rows) -> None:
        send = make()
        buf: list[bytes] = []
        try:
            for r in rows:
                buf.append(r[bulk_col].encode("utf-8"))
                if len(buf) >= batch_docs:
                    send(b"\n".join(buf) + b"\n")
                    buf = []
            if buf:
                send(b"\n".join(buf) + b"\n")
        finally:
            close = getattr(send, "close", None)
            if close is not None:
                close()

    df.foreachPartition(run)
