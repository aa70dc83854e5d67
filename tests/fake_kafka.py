"""In-process fake Kafka broker for exercising the native wire client.

Speaks the same public protocol subset the client does (Metadata v1,
ListOffsets v1, Fetch v4, Produce v3) over a real TCP socket, backed by
an in-memory log.  Request PARSING here is written against the spec
independently of the client's request ENCODERS (and vice versa for
responses), so the pair exercises both directions of the format; the
byte-level golden tests in test_kafka_native.py pin the RecordBatch
layout against hand-built spec bytes.
"""

from __future__ import annotations

import socket
import struct
import threading

from pipeline_spark.functions.kafkawire import (
    Reader,
    decode_record_batches,
    encode_record_batch,
)


def _i8(v):
    return struct.pack(">b", v)


def _i16(v):
    return struct.pack(">h", v)


def _i32(v):
    return struct.pack(">i", v)


def _i64(v):
    return struct.pack(">q", v)


def _str(s):
    b = s.encode()
    return _i16(len(b)) + b


def _arr(items):
    return _i32(len(items)) + b"".join(items)


class FakeBroker:
    def __init__(self, split_batches: bool = False, codec: int = 0):
        self.log: dict[tuple[str, int], list[dict]] = {}
        self.split_batches = split_batches  # return 2 concatenated batches
        self.codec = codec
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(8)
        self.port = self.sock.getsockname()[1]
        self._stop = False
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    # -- test helpers ------------------------------------------------------
    def seed(self, topic: str, partition: int, records: list[dict]) -> None:
        log = self.log.setdefault((topic, partition), [])
        base = len(log)
        for i, r in enumerate(records):
            log.append({**r, "offset": base + i})

    def close(self) -> None:
        self._stop = True
        try:
            # unblock accept()
            socket.create_connection(("127.0.0.1", self.port), timeout=1).close()
        except OSError:
            pass
        self.sock.close()

    # -- server loop -------------------------------------------------------
    def _serve(self) -> None:
        while not self._stop:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(target=self._handle, args=(conn,), daemon=True).start()

    def _handle(self, conn: socket.socket) -> None:
        try:
            while True:
                head = b""
                while len(head) < 4:
                    chunk = conn.recv(4 - len(head))
                    if not chunk:
                        return
                    head += chunk
                (n,) = struct.unpack(">i", head)
                body = b""
                while len(body) < n:
                    chunk = conn.recv(n - len(body))
                    if not chunk:
                        return
                    body += chunk
                r = Reader(body)
                api_key, api_version, corr = r.i16(), r.i16(), r.i32()
                r.string()  # client id
                handler = {0: self._produce, 1: self._fetch, 2: self._offsets, 3: self._metadata}[api_key]
                resp = _i32(corr) + handler(r, api_version)
                conn.sendall(_i32(len(resp)) + resp)
        except OSError:
            pass
        finally:
            conn.close()

    def _metadata(self, r: Reader, v: int) -> bytes:
        n = r.i32()
        requested = [r.string() for _ in range(n)] if n >= 0 else None
        topics = sorted(
            {t for t, _ in self.log} if requested is None else set(requested)
        )
        broker = _i32(0) + _str("127.0.0.1") + _i32(self.port) + _i16(-1)
        tblocks = []
        for t in topics:
            parts = sorted(p for tt, p in self.log if tt == t) or [0]
            pblocks = [
                _i16(0) + _i32(p) + _i32(0) + _i32(1) + _i32(0) + _i32(1) + _i32(0)
                for p in parts
            ]
            tblocks.append(_i16(0) + _str(t) + _i8(0) + _arr(pblocks))
        return _arr([broker]) + _i32(0) + _arr(tblocks)

    def _offsets(self, r: Reader, v: int) -> bytes:
        r.i32()  # replica id
        out_topics = []
        for _ in range(r.i32()):
            topic = r.string()
            pblocks = []
            for _p in range(r.i32()):
                part, ts = r.i32(), r.i64()
                log = self.log.get((topic, part), [])
                off = 0 if ts == -2 else len(log)
                pblocks.append(_i32(part) + _i16(0) + _i64(-1) + _i64(off))
            out_topics.append(_str(topic) + _arr(pblocks))
        return _arr(out_topics)

    def _fetch(self, r: Reader, v: int) -> bytes:
        r.i32(), r.i32(), r.i32(), r.i32(), r.i8()
        out_topics = []
        for _ in range(r.i32()):
            topic = r.string()
            pblocks = []
            for _p in range(r.i32()):
                part, offset = r.i32(), r.i64()
                r.i32()  # partition max bytes
                log = self.log.get((topic, part), [])
                avail = [rec for rec in log if rec["offset"] >= offset][:100]
                blob = b""
                if avail:
                    halves = (
                        [avail[: len(avail) // 2 or 1], avail[len(avail) // 2 or 1 :]]
                        if self.split_batches
                        else [avail]
                    )
                    for chunk in halves:
                        if not chunk:
                            continue
                        blob += encode_record_batch(
                            chunk,
                            base_offset=chunk[0]["offset"],
                            base_timestamp=int(chunk[0].get("timestamp", 0)),
                            codec=self.codec,
                        )
                pblocks.append(
                    _i32(part) + _i16(0) + _i64(len(log)) + _i64(len(log))
                    + _i32(-1)  # no aborted txns
                    + _i32(len(blob)) + blob
                )
            out_topics.append(_str(topic) + _arr(pblocks))
        return _i32(0) + _arr(out_topics)

    def _produce(self, r: Reader, v: int) -> bytes:
        r.string()  # transactional id
        r.i16(), r.i32()  # acks, timeout
        out_topics = []
        for _ in range(r.i32()):
            topic = r.string()
            pblocks = []
            for _p in range(r.i32()):
                part = r.i32()
                blob = r.bytes_() or b""
                records = list(decode_record_batches(blob))
                log = self.log.setdefault((topic, part), [])
                base = len(log)
                for i, rec in enumerate(records):
                    log.append({**rec, "offset": base + i})
                pblocks.append(_i32(part) + _i16(0) + _i64(base) + _i64(-1))
            out_topics.append(_str(topic) + _arr(pblocks))
        return _arr(out_topics) + _i32(0)
