"""Delta Lake deletion vectors: native descriptor + bitmap codec.

Public spec: Delta PROTOCOL.md "Deletion Vectors" + "Deletion Vector
Format".  A deletion vector (DV) marks rows of one data file as deleted
without rewriting the file (merge-on-read).  The ``add.deletionVector``
descriptor is::

    {"storageType": "u"|"i"|"p", "pathOrInlineDv": str,
     "offset": int?, "sizeInBytes": int, "cardinality": int}

* ``u``: relative file — ``pathOrInlineDv`` = ``<randomPrefix><z85 uuid>``
  (the last 20 chars decode to the 16-byte UUID); the bitmap lives at
  ``<table>/<randomPrefix>/deletion_vector_<uuid>.bin`` at ``offset``.
* ``p``: absolute path to the ``.bin`` file.
* ``i``: the bitmap is inline, z85-encoded in ``pathOrInlineDv``.

File layout: 1-byte format version (1), then per stored DV at its
``offset``: ``<dataSize: 4-byte big-endian><bitmapData>`` followed by a
4-byte big-endian CRC-32 of bitmapData.

``bitmapData`` is a "portable" RoaringBitmapArray: 4-byte LE magic
``1681511377``, 8-byte LE bitmap count, then per 32-bit bitmap a 4-byte
LE key (the row-index high word) + a standard-portable-format
RoaringBitmap (CRoaring spec: cookie 12346/12347, array / bitset / run
containers).

Everything here is stdlib + numpy; the serializer exists so tests can
construct spec-shaped fixtures and property-check the round trip.
"""

from __future__ import annotations

import struct
import uuid as uuid_mod
import zlib

import numpy as np

MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ".-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DEC = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError(f"z85: length {len(s)} is not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for ch in s[i:i + 5]:
            try:
                v = v * 85 + _Z85_DEC[ch]
            except KeyError:
                raise ValueError(f"z85: invalid character {ch!r}") from None
        out += v.to_bytes(4, "big")
    return bytes(out)


def z85_encode(b: bytes, pad: bool = False) -> str:
    if len(b) % 4:
        if not pad:
            raise ValueError(f"z85: length {len(b)} is not a multiple of 4")
        # delta's Base85Codec zero-pads arbitrary payloads (inline DVs);
        # the descriptor's sizeInBytes recovers the true length on decode
        b = b + b"\x00" * (4 - len(b) % 4)
    out = []
    for i in range(0, len(b), 4):
        v = int.from_bytes(b[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_CHARS[r])
        out += reversed(chunk)
    return "".join(out)


def _read_bitmap32(buf: bytes, pos: int) -> tuple[np.ndarray, int]:
    """One standard-portable-format 32-bit RoaringBitmap at ``pos`` →
    (sorted uint32 values, next offset)."""
    (cookie16,) = struct.unpack_from("<H", buf, pos)
    has_runs = cookie16 == _SERIAL_COOKIE
    if has_runs:
        (n_minus1,) = struct.unpack_from("<H", buf, pos + 2)
        n = n_minus1 + 1
        pos += 4
        run_flags = buf[pos:pos + (n + 7) // 8]
        pos += (n + 7) // 8
    else:
        (cookie,) = struct.unpack_from("<I", buf, pos)
        if cookie != _SERIAL_COOKIE_NO_RUN:
            raise ValueError(f"roaring: bad cookie {cookie}")
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        run_flags = b""
    keys = np.empty(n, dtype="uint32")
    cards = np.empty(n, dtype="int64")
    for i in range(n):
        k, c1 = struct.unpack_from("<HH", buf, pos + 4 * i)
        keys[i] = k
        cards[i] = c1 + 1
    pos += 4 * n
    if (not has_runs) or n >= _NO_OFFSET_THRESHOLD:
        pos += 4 * n  # offset header — containers follow in order anyway
    values: list[np.ndarray] = []
    for i in range(n):
        is_run = bool(run_flags and (run_flags[i // 8] >> (i % 8)) & 1)
        base = np.uint32(keys[i]) << np.uint32(16)
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(buf, dtype="<u2", count=2 * n_runs, offset=pos)
            pos += 4 * n_runs
            # python-int arithmetic: under numpy>=2 (NEP 50) uint16 sums
            # wrap, so a run ending at 65535 would decode to an EMPTY
            # range — silently un-deleting those rows
            parts = [
                np.arange(
                    int(runs[2 * j]),
                    int(runs[2 * j]) + int(runs[2 * j + 1]) + 1,
                    dtype="uint32",
                )
                for j in range(n_runs)
            ]
            lows = np.concatenate(parts) if parts else np.empty(0, "uint32")
        elif cards[i] <= 4096:
            lows = np.frombuffer(
                buf, dtype="<u2", count=int(cards[i]), offset=pos
            ).astype("uint32")
            pos += 2 * int(cards[i])
        else:
            words = np.frombuffer(buf, dtype="<u8", count=1024, offset=pos)
            pos += 8192
            bits = np.unpackbits(
                words.view("uint8"), bitorder="little"
            )
            lows = np.nonzero(bits)[0].astype("uint32")
        values.append(base | lows)
    return (
        np.concatenate(values) if values else np.empty(0, "uint32")
    ), pos


def roaring_array_deserialize(data: bytes) -> np.ndarray:
    """Portable RoaringBitmapArray → sorted uint64 row indexes."""
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != MAGIC:
        raise ValueError(f"deletion vector: bad magic {magic} (want {MAGIC})")
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[np.ndarray] = []
    for _ in range(n_bitmaps):
        (key,) = struct.unpack_from("<I", data, pos)
        pos += 4
        vals, pos = _read_bitmap32(data, pos)
        out.append((np.uint64(key) << np.uint64(32)) | vals.astype("uint64"))
    return np.concatenate(out) if out else np.empty(0, "uint64")


def roaring_array_serialize(positions) -> bytes:
    """Sorted row indexes → portable RoaringBitmapArray (array containers
    only — the simplest legal encoding; the reader accepts all three)."""
    pos_arr = np.asarray(sorted(int(p) for p in positions), dtype="uint64")
    high32 = (pos_arr >> np.uint64(32)).astype("uint32")
    out = struct.pack("<I", MAGIC)
    keys32 = np.unique(high32)
    out += struct.pack("<q", len(keys32))
    for key in keys32:
        vals32 = pos_arr[high32 == key].astype("uint32") & np.uint32(0xFFFFFFFF)
        lows16 = (vals32 >> np.uint32(16)).astype("uint16")
        out += struct.pack("<I", int(key))
        ckeys = np.unique(lows16)
        body = struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(ckeys))
        conts = []
        for ck in ckeys:
            vv = (vals32[lows16 == ck] & np.uint32(0xFFFF)).astype("<u2")
            if len(vv) > 4096:
                words = np.zeros(1024, dtype="<u8")
                idx = vv.astype("int64")
                np.bitwise_or.at(
                    words, idx >> 6, np.uint64(1) << (idx & 63).astype("uint64")
                )
                conts.append(words.tobytes())
            else:
                conts.append(vv.tobytes())
            body += struct.pack("<HH", int(ck), len(vv) - 1)
        # offset header (mandatory for the no-run cookie): byte offsets
        # from the start of this bitmap (cookie) to each container
        running = 8 + 4 * len(ckeys) + 4 * len(ckeys)
        for c in conts:
            body_off = running
            body += struct.pack("<I", body_off)
            running += len(c)
        body += b"".join(conts)
        out += body
    return out


def encode_dv_file(bitmap_data: bytes) -> tuple[bytes, int]:
    """(file bytes, offset of this DV) — version byte + framed bitmap."""
    payload = struct.pack(">i", len(bitmap_data)) + bitmap_data
    crc = struct.pack(">I", zlib.crc32(bitmap_data) & 0xFFFFFFFF)
    return b"\x01" + payload + crc, 1


def make_dv_descriptor_relative(
    table_path: str, positions, prefix: str = ""
) -> tuple[dict, str, bytes]:
    """Build a spec-shaped 'u' descriptor + target path + file bytes for
    test fixtures."""
    import os

    positions = list(positions)  # a generator must not be consumed twice
    u = uuid_mod.uuid4()
    bitmap = roaring_array_serialize(positions)
    file_bytes, offset = encode_dv_file(bitmap)
    name = f"deletion_vector_{u}.bin"
    target = os.path.join(table_path, prefix, name) if prefix else os.path.join(
        table_path, name
    )
    desc = {
        "storageType": "u",
        "pathOrInlineDv": prefix + z85_encode(u.bytes),
        "offset": offset,
        "sizeInBytes": len(bitmap),
        "cardinality": len(set(int(x) for x in positions)),
    }
    return desc, target, file_bytes


def dv_absolute_path(table_path: str, desc: dict) -> str | None:
    """Resolve a descriptor to its .bin path (None for inline)."""
    import os

    st = desc.get("storageType")
    if st == "i":
        return None
    if st == "p":
        p = desc["pathOrInlineDv"]
        return p[len("file:"):] if p.startswith("file:") else p
    if st == "u":
        enc = desc["pathOrInlineDv"]
        prefix, uuid_part = enc[:-20], enc[-20:]
        u = uuid_mod.UUID(bytes=z85_decode(uuid_part))
        name = f"deletion_vector_{u}.bin"
        return (
            os.path.join(table_path, prefix, name)
            if prefix
            else os.path.join(table_path, name)
        )
    raise ValueError(f"deletion vector: unknown storageType {st!r}")


def load_dv_positions(table_path: str, desc: dict) -> np.ndarray:
    """Descriptor → sorted uint64 deleted row indexes (verifies the
    size/CRC framing for on-disk DVs)."""
    if desc.get("storageType") == "i":
        raw = z85_decode(desc["pathOrInlineDv"])
        size = desc.get("sizeInBytes")
        if size is not None:
            raw = raw[: int(size)]  # strip the z85 zero padding
        return roaring_array_deserialize(raw)
    path = dv_absolute_path(table_path, desc)
    with open(path, "rb") as fh:
        blob = fh.read()
    off = int(desc.get("offset", 1) or 1)
    (size,) = struct.unpack_from(">i", blob, off)
    data = blob[off + 4:off + 4 + size]
    declared = desc.get("sizeInBytes")
    if declared is not None and int(declared) != size:
        raise ValueError(
            f"deletion vector: framed size {size} != descriptor "
            f"sizeInBytes {declared}"
        )
    (crc,) = struct.unpack_from(">I", blob, off + 4 + size)
    if crc != (zlib.crc32(data) & 0xFFFFFFFF):
        raise ValueError("deletion vector: CRC-32 mismatch — corrupt DV file")
    return roaring_array_deserialize(data)
