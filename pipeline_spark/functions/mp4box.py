"""ISO-BMFF (MP4/MOV) container parser — stdlib only, written against
the PUBLIC ISO/IEC 14496-12 box structure.

Parses the box tree (32- and 64-bit sizes), movie/track/media headers
(mvhd/tkhd/mdhd v0+v1), handler types, sample descriptions, and the full
sample table (stsz/stz2 sizes, stsc chunk runs, stco/co64 offsets, stts
time deltas, stss sync samples, ctts offsets ignored), enough to:

  * report real container metadata (duration, dimensions, codec fourcc,
    sample counts, fps) for video columns — `video_meta` multimodal op;
  * resolve each sample's (offset, size, timestamp, is_sync) so keyframe
    ACCESS UNITS can be extracted as raw payloads (`frame_sample` with
    ``emit: raw``) — the shard-videos-for-GPU-decode pattern.  Decoding
    those H.264/H.265 access units to pixels still needs ffmpeg/pyav and
    stays gated.

Fragmented MP4 (moof) reports the container as fragmented and gates the
sample table with an actionable error.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator


class Mp4Error(ValueError):
    pass


_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"mvex",
    b"moof", b"traf", b"udta",
}


def _boxes(data: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4Error("mp4: truncated largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise Mp4Error(f"mp4: bad box size {size} for {btype!r}")
        yield btype, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, *path: bytes):
    """First box matching the nested path; returns (body_start, body_end)
    or None."""
    if not path:
        return start, end
    for btype, b, e in _boxes(data, start, end):
        if btype == path[0]:
            return _find(data, b, e, *path[1:])
    return None


def _fullbox(data: bytes, pos: int) -> tuple[int, int]:
    version = data[pos]
    return version, pos + 4


def _read_table(data: bytes, pos: int, count: int, fmt: str) -> list:
    size = struct.calcsize(fmt)
    return [
        struct.unpack(fmt, data[pos + i * size : pos + (i + 1) * size])[0]
        for i in range(count)
    ]


def parse_mp4(data: bytes) -> dict[str, Any]:
    """MP4 bytes → {brand, duration_s, timescale, fragmented, tracks:
    [{type, codec, width, height, duration_s, timescale, n_samples,
    n_keyframes, fps, _stbl span…}]}."""
    if len(data) < 12:
        raise Mp4Error("mp4: too short")
    top = list(_boxes(data, 0, len(data)))
    types = [t for t, _, _ in top]
    if b"ftyp" not in types and b"moov" not in types:
        raise Mp4Error("mp4: no ftyp/moov box")
    out: dict[str, Any] = {
        "brand": None, "duration_s": None, "timescale": None,
        "fragmented": b"moof" in types, "tracks": [],
    }
    for btype, b, e in top:
        if btype == b"ftyp":
            out["brand"] = data[b : b + 4].decode("latin1")
        elif btype == b"moov":
            _parse_moov(data, b, e, out)
    if out["duration_s"] is None:
        raise Mp4Error("mp4: no moov/mvhd found")
    return out


def _parse_moov(data: bytes, start: int, end: int, out: dict) -> None:
    for btype, b, e in _boxes(data, start, end):
        if btype == b"mvhd":
            v, p = _fullbox(data, b)
            if v == 1:
                ts, dur = struct.unpack(">IQ", data[p + 16 : p + 28])
            else:
                ts, dur = struct.unpack(">II", data[p + 8 : p + 16])
            out["timescale"] = ts
            out["duration_s"] = dur / ts if ts else 0.0
        elif btype == b"trak":
            out["tracks"].append(_parse_trak(data, b, e))


def _parse_trak(data: bytes, start: int, end: int) -> dict[str, Any]:
    tr: dict[str, Any] = {
        "type": None, "codec": None, "width": None, "height": None,
        "timescale": None, "duration_s": None, "n_samples": 0,
        "n_keyframes": None, "fps": None, "_stbl": None,
    }
    for btype, b, e in _boxes(data, start, end):
        if btype == b"tkhd":
            v, p = _fullbox(data, b)
            # widths/heights are 16.16 fixed at the end of the box
            tr["width"] = struct.unpack(">I", data[e - 8 : e - 4])[0] / 65536.0
            tr["height"] = struct.unpack(">I", data[e - 4 : e])[0] / 65536.0
        elif btype == b"mdia":
            _parse_mdia(data, b, e, tr)
    return tr


def _parse_mdia(data: bytes, start: int, end: int, tr: dict) -> None:
    for btype, b, e in _boxes(data, start, end):
        if btype == b"mdhd":
            v, p = _fullbox(data, b)
            if v == 1:
                ts, dur = struct.unpack(">IQ", data[p + 16 : p + 28])
            else:
                ts, dur = struct.unpack(">II", data[p + 8 : p + 16])
            tr["timescale"] = ts
            tr["duration_s"] = dur / ts if ts else 0.0
        elif btype == b"hdlr":
            tr["type"] = data[b + 8 : b + 12].decode("latin1")
        elif btype == b"minf":
            stbl = _find(data, b, e, b"stbl")
            if stbl:
                tr["_stbl"] = stbl
                _parse_stbl(data, *stbl, tr)


def _parse_stbl(data: bytes, start: int, end: int, tr: dict) -> None:
    for btype, b, e in _boxes(data, start, end):
        if btype == b"stsd":
            n = struct.unpack(">I", data[b + 4 : b + 8])[0]
            if n >= 1:
                tr["codec"] = data[b + 12 : b + 16].decode("latin1")
        elif btype == b"stsz":
            tr["n_samples"] = struct.unpack(">I", data[b + 8 : b + 12])[0]
        elif btype == b"stss":
            tr["n_keyframes"] = struct.unpack(">I", data[b + 4 : b + 8])[0]
    if tr["n_samples"] and tr["duration_s"]:
        tr["fps"] = tr["n_samples"] / tr["duration_s"]
    if tr["n_keyframes"] is None and tr["n_samples"]:
        # no stss box → every sample is a sync sample (spec default)
        tr["n_keyframes"] = tr["n_samples"]


def resolve_samples(data: bytes, track: dict[str, Any]) -> list[dict[str, Any]]:
    """Resolve a track's sample table into [{offset, size, ts_s, sync}]
    — the addressing needed to slice raw access units out of mdat."""
    if track.get("_stbl") is None:
        raise Mp4Error("mp4: track has no sample table")
    start, end = track["_stbl"]
    stsz = stsc = stco = stts = stss = None
    co64 = False
    for btype, b, e in _boxes(data, start, end):
        if btype == b"stsz":
            sample_size, count = struct.unpack(">II", data[b + 4 : b + 12])
            if sample_size:
                sizes = [sample_size] * count
            else:
                sizes = _read_table(data, b + 12, count, ">I")
            stsz = sizes
        elif btype == b"stsc":
            n = struct.unpack(">I", data[b + 4 : b + 8])[0]
            stsc = [
                struct.unpack(">III", data[b + 8 + i * 12 : b + 20 + i * 12])
                for i in range(n)
            ]  # (first_chunk, samples_per_chunk, desc_index)
        elif btype in (b"stco", b"co64"):
            n = struct.unpack(">I", data[b + 4 : b + 8])[0]
            co64 = btype == b"co64"
            stco = _read_table(data, b + 8, n, ">Q" if co64 else ">I")
        elif btype == b"stts":
            n = struct.unpack(">I", data[b + 4 : b + 8])[0]
            stts = [
                struct.unpack(">II", data[b + 8 + i * 8 : b + 16 + i * 8])
                for i in range(n)
            ]  # (sample_count, sample_delta)
        elif btype == b"stss":
            n = struct.unpack(">I", data[b + 4 : b + 8])[0]
            stss = set(_read_table(data, b + 8, n, ">I"))
    if stsz is None or stsc is None or stco is None:
        raise Mp4Error(
            "mp4: incomplete sample table (fragmented file?) — stsz/stsc/"
            "stco required"
        )
    ts = track.get("timescale") or 1
    # decode timestamps from stts runs
    deltas: list[int] = []
    for count, delta in stts or []:
        deltas.extend([delta] * count)
    samples = []
    t_acc = 0
    # walk chunks: stsc runs give samples-per-chunk until the next run
    sample_idx = 0
    n_chunks = len(stco)
    for ci in range(n_chunks):
        spc = 0
        for first, per, _ in stsc:
            if ci + 1 >= first:
                spc = per
            else:
                break
        offset = stco[ci]
        for _ in range(spc):
            if sample_idx >= len(stsz):
                break
            size = stsz[sample_idx]
            delta = deltas[sample_idx] if sample_idx < len(deltas) else 0
            samples.append({
                "offset": offset,
                "size": size,
                "ts_s": t_acc / ts,
                "sync": (stss is None) or (sample_idx + 1 in stss),
            })
            offset += size
            t_acc += delta
            sample_idx += 1
    return samples


# ------------------------------------------------------------- builder


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def build_mp4(
    samples: list[bytes],
    width: int = 64,
    height: int = 48,
    timescale: int = 1000,
    sample_delta: int = 40,
    codec: bytes = b"avc1",
    sync_samples: list[int] | None = None,
) -> bytes:
    """Assemble a minimal valid MP4 (one video track, one chunk) around
    raw sample payloads — the test/fixture builder for the parser."""
    duration = sample_delta * len(samples)
    mvhd = _box(b"mvhd", b"\x00" + b"\x00" * 3 + struct.pack(
        ">IIII", 0, 0, timescale, duration) + b"\x00" * 80)
    tkhd = _box(b"tkhd", b"\x00\x00\x00\x07" + struct.pack(
        ">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 52
        + struct.pack(">II", width << 16, height << 16))
    mdhd = _box(b"mdhd", b"\x00" + b"\x00" * 3 + struct.pack(
        ">IIII", 0, 0, timescale, duration) + b"\x00\x00\x00\x00")
    hdlr = _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12 + b"v\x00")
    stsd = _box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1)
                + _box(codec, b"\x00" * 78))
    stts = _box(b"stts", b"\x00" * 4 + struct.pack(
        ">III", 1, len(samples), sample_delta))
    stsz = _box(b"stsz", b"\x00" * 4 + struct.pack(
        ">II", 0, len(samples))
        + b"".join(struct.pack(">I", len(s)) for s in samples))
    stsc = _box(b"stsc", b"\x00" * 4 + struct.pack(
        ">IIII", 1, 1, len(samples), 1))
    stss_box = b""
    if sync_samples is not None:
        stss_box = _box(b"stss", b"\x00" * 4
                        + struct.pack(">I", len(sync_samples))
                        + b"".join(struct.pack(">I", s) for s in sync_samples))
    mdat_payload = b"".join(samples)
    # stco offset = where mdat's payload will land; compute with a
    # placeholder then patch
    def assemble(mdat_offset: int) -> bytes:
        stco = _box(b"stco", b"\x00" * 4 + struct.pack(
            ">II", 1, mdat_offset))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss_box)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        moov = _box(b"moov", mvhd + trak)
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
        return ftyp + moov + _box(b"mdat", mdat_payload)

    probe = assemble(0)
    mdat_offset = len(probe) - len(mdat_payload)
    return assemble(mdat_offset)
