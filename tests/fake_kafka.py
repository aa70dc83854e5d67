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


def _s_(s):
    """Nullable string (i16 -1 = null)."""
    if s is None:
        return _i16(-1)
    b = s.encode()
    return _i16(len(b)) + b


class FakeBroker:
    def __init__(self, split_batches: bool = False, codec: int = 0,
                 sasl: tuple | None = None, tls: tuple | None = None):
        self.log: dict[tuple[str, int], list[dict]] = {}
        self.split_batches = split_batches  # return 2 concatenated batches
        self.codec = codec
        self.sasl = sasl  # ("plain"|"scram-sha-256", user, password)
        self.tls = tls    # (certfile, keyfile) -> TLS-terminating listener
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
        state: dict = {"authed": False, "mech": None, "scram": None}
        if self.tls:
            import ssl as _ssl

            ctx = _ssl.SSLContext(_ssl.PROTOCOL_TLS_SERVER)
            ctx.load_cert_chain(*self.tls)
            try:
                conn = ctx.wrap_socket(conn, server_side=True)
            except (OSError, _ssl.SSLError):
                conn.close()
                return
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
                if api_key == 17:
                    resp = _i32(corr) + self._sasl_handshake(r, state)
                elif api_key == 36:
                    resp = _i32(corr) + self._sasl_authenticate(r, state)
                elif self.sasl and not state["authed"]:
                    # secured listener: reject pre-auth API calls
                    resp = _i32(corr) + _i16(34)  # SASL_AUTHENTICATION_FAILED
                else:
                    handler = {0: self._produce, 1: self._fetch, 2: self._offsets, 3: self._metadata}[api_key]
                    resp = _i32(corr) + handler(r, api_version)
                conn.sendall(_i32(len(resp)) + resp)
        except OSError:
            pass
        finally:
            conn.close()

    # -- SASL (server side, for client auth tests) -------------------------

    def _sasl_handshake(self, r: Reader, state) -> bytes:
        mech = r.string()
        offered = ["PLAIN", "SCRAM-SHA-256", "SCRAM-SHA-512"]
        supported = self.sasl is not None and mech.lower() == self.sasl[0]
        err = 0 if supported else 33  # UNSUPPORTED_SASL_MECHANISM
        state["mech"] = mech.lower() if supported else None
        return _i16(err) + _i32(len(offered)) + b"".join(_s_(m) for m in offered)

    def _sasl_authenticate(self, r: Reader, state) -> bytes:
        import base64
        import hashlib
        import hmac
        import os as _os

        n = r.i32()
        payload = r.read(n)
        _mech, user, pwd = self.sasl
        ok = False
        out = b""
        if state["mech"] == "plain":
            parts = payload.split(b"\x00")
            ok = len(parts) == 3 and parts[1].decode() == user and parts[2].decode() == pwd
        elif state["mech"] and state["mech"].startswith("scram-"):
            algo = hashlib.sha256 if state["mech"].endswith("256") else hashlib.sha512
            sc = state["scram"]
            if sc is None:
                # client-first: gs2 'n,,' + n=user,r=cnonce
                msg = payload.decode()
                bare = msg[3:]
                attrs = dict(kv.split("=", 1) for kv in bare.split(","))
                snonce = base64.b64encode(_os.urandom(12)).decode()
                salt = b"fake-salt-0123"
                combined = attrs["r"] + snonce
                server_first = (
                    f"r={combined},s={base64.b64encode(salt).decode()},i=4096"
                )
                state["scram"] = {
                    "bare": bare, "first": server_first, "combined": combined,
                    "salt": salt, "algo": algo,
                    "user_ok": attrs.get("n") == user,
                }
                return _i16(0) + _s_(None) + _i32(len(server_first)) + server_first.encode()
            # client-final: c=...,r=...,p=proof
            msg = payload.decode()
            cfwp, _, proof_part = msg.rpartition(",p=")
            proof = base64.b64decode(proof_part)
            salted = hashlib.pbkdf2_hmac(
                sc["algo"]().name, pwd.encode(), sc["salt"], 4096
            )
            client_key = hmac.new(salted, b"Client Key", sc["algo"]).digest()
            stored = sc["algo"](client_key).digest()
            auth_msg = f"{sc['bare']},{sc['first']},{cfwp}".encode()
            sig = hmac.new(stored, auth_msg, sc["algo"]).digest()
            expect_key = bytes(a ^ b for a, b in zip(sig, client_key))
            ok = sc["user_ok"] and hmac.compare_digest(proof, expect_key)
            state["scram"] = None
            if ok:
                server_key = hmac.new(salted, b"Server Key", sc["algo"]).digest()
                v = base64.b64encode(
                    hmac.new(server_key, auth_msg, sc["algo"]).digest()
                ).decode()
                out = f"v={v}".encode()
        state["authed"] = ok
        if not ok:
            return _i16(58) + _s_("authentication failed") + _i32(0)
        return _i16(0) + _s_(None) + _i32(len(out)) + out

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
