"""Native container-metadata parsers: Matroska/WebM (EBML), Ogg, MP3.

Complements ``functions/mp4box.py`` (ISO-BMFF): together they give the
multimodal ``video_meta`` / ``audio_meta`` ops real container-level
metadata — duration, dimensions, codec, stream counts — for the four
containers that dominate web-crawled media, with zero native deps.
Payload *pixel/PCM* decode of the compressed codecs inside (H.264, VP9,
Vorbis…) stays ffmpeg-gated; metadata never needs it.

All formats are parsed from their public specifications: Matroska/EBML
(RFC 8794 + the Matroska element registry), Ogg (RFC 3533) with Vorbis I
/ OpusHead identification headers (RFC 7845), and the MPEG-1/2 audio
frame-header layout (ISO 11172-3 §2.4.1) with Xing/VBRI VBR headers.
Each parser ships a spec-shaped builder so tests construct fixtures
byte-by-byte.  Reference analogue: mercari/pipeline has no native
container parsing (it shells to SDKs); this follows SURVEY §2.9's
multimodal north star.
"""

from __future__ import annotations

import struct
from typing import Any


class MediaError(ValueError):
    pass


# ===========================================================================
# Matroska / WebM — EBML (RFC 8794)
# ===========================================================================

_EBML_HEADER = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_AUDIO = 0xE1
_SAMPLING_FREQ = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_REFERENCE_BLOCK = 0xFB


def _read_vint(
    data: bytes, i: int, keep_marker: bool
) -> tuple[int, int, int]:
    """EBML variable-size integer at data[i] → (value, next_i, enc_len).

    ``enc_len`` (the encoded byte length) is needed by the caller to tell
    a real value from the reserved all-ones "unknown size" pattern — the
    same numeric value is legal at a longer encoding (e.g. size 127 is
    0x40 0x7F; 1-byte 0xFF is reserved)."""
    if i >= len(data):
        raise MediaError("EBML truncated at vint")
    first = data[i]
    if first == 0:
        raise MediaError("invalid EBML vint (>8 bytes)")
    length = 1
    mask = 0x80
    while not first & mask:
        length += 1
        mask >>= 1
    if i + length > len(data):
        raise MediaError("EBML truncated inside vint")
    val = first if keep_marker else first & (mask - 1)
    for b in data[i + 1 : i + length]:
        val = (val << 8) | b
    return val, i + length, length


def _ebml_elements(data: bytes, i: int, end: int):
    """Yield (element_id, body_start, body_end) within [i, end)."""
    while i < end:
        eid, i, _ = _read_vint(data, i, keep_marker=True)
        size, i, enc_len = _read_vint(data, i, keep_marker=False)
        # "unknown size" = all value bits set AT THE ENCODED LENGTH;
        # per RFC 8794 it extends to the parent's end
        unknown = size == (1 << (7 * enc_len)) - 1
        body_end = end if unknown else min(i + size, end)
        yield eid, i, body_end
        i = body_end


def _uint(data: bytes, a: int, b: int) -> int:
    return int.from_bytes(data[a:b], "big")


def _float(data: bytes, a: int, b: int) -> float:
    n = b - a
    if n == 4:
        return struct.unpack(">f", data[a:b])[0]
    if n == 8:
        return struct.unpack(">d", data[a:b])[0]
    raise MediaError(f"bad EBML float size {n}")


def parse_matroska(data: bytes) -> dict[str, Any]:
    """Container metadata for a Matroska/WebM file.

    Returns {doctype, duration_s, tracks: [{type, codec, width, height,
    sample_rate, channels, n_blocks, n_keyframes}], n_clusters}.
    """
    if data[:4] != b"\x1a\x45\xdf\xa3":
        raise MediaError("not an EBML/Matroska file")
    doctype = "matroska"
    out: dict[str, Any] = {"doctype": doctype, "duration_s": None, "tracks": []}
    ts_scale = 1_000_000  # ns per tick, Matroska default
    duration_ticks: float | None = None
    n_clusters = 0
    last_cluster_ts = 0
    blocks: dict[int, int] = {}
    keyframes: dict[int, int] = {}

    for eid, a, b in _ebml_elements(data, 0, len(data)):
        if eid == _EBML_HEADER:
            for eid2, a2, b2 in _ebml_elements(data, a, b):
                if eid2 == _DOCTYPE:
                    out["doctype"] = data[a2:b2].rstrip(b"\x00").decode(
                        "ascii", "replace"
                    )
        elif eid == _SEGMENT:
            for eid2, a2, b2 in _ebml_elements(data, a, b):
                if eid2 == _INFO:
                    for eid3, a3, b3 in _ebml_elements(data, a2, b2):
                        if eid3 == _TIMESTAMP_SCALE:
                            ts_scale = _uint(data, a3, b3)
                        elif eid3 == _DURATION:
                            duration_ticks = _float(data, a3, b3)
                elif eid2 == _TRACKS:
                    for eid3, a3, b3 in _ebml_elements(data, a2, b2):
                        if eid3 == _TRACK_ENTRY:
                            out["tracks"].append(
                                _parse_track_entry(data, a3, b3)
                            )
                elif eid2 == _CLUSTER:
                    n_clusters += 1
                    for eid3, a3, b3 in _ebml_elements(data, a2, b2):
                        if eid3 == _CLUSTER_TS:
                            last_cluster_ts = _uint(data, a3, b3)
                        elif eid3 == _SIMPLE_BLOCK:
                            tn, j, _ = _read_vint(data, a3, keep_marker=False)
                            blocks[tn] = blocks.get(tn, 0) + 1
                            if b3 > j + 2 and data[j + 2] & 0x80:
                                keyframes[tn] = keyframes.get(tn, 0) + 1
                        elif eid3 == _BLOCK_GROUP:
                            # BlockGroup keyframe-ness = absence of a
                            # ReferenceBlock element (Matroska registry)
                            group_tn = None
                            referenced = False
                            for eid4, a4, _b4 in _ebml_elements(data, a3, b3):
                                if eid4 == _BLOCK:
                                    group_tn, _, _ = _read_vint(
                                        data, a4, keep_marker=False
                                    )
                                    blocks[group_tn] = blocks.get(group_tn, 0) + 1
                                elif eid4 == _REFERENCE_BLOCK:
                                    referenced = True
                            if group_tn is not None and not referenced:
                                keyframes[group_tn] = (
                                    keyframes.get(group_tn, 0) + 1
                                )

    if duration_ticks is not None:
        out["duration_s"] = duration_ticks * ts_scale / 1e9
    elif n_clusters:
        out["duration_s"] = last_cluster_ts * ts_scale / 1e9
    out["n_clusters"] = n_clusters
    for tr in out["tracks"]:
        tn = tr.pop("number", None)
        tr["n_blocks"] = blocks.get(tn, 0)
        tr["n_keyframes"] = keyframes.get(tn, 0)
        if (
            tr["type"] == "video"
            and tr["n_blocks"]
            and out["duration_s"]
        ):
            tr["fps"] = round(tr["n_blocks"] / out["duration_s"], 3)
        else:
            tr["fps"] = None
    return out


_TRACK_TYPES = {1: "video", 2: "audio", 17: "subtitle"}


def _parse_track_entry(data: bytes, a: int, b: int) -> dict[str, Any]:
    tr: dict[str, Any] = {
        "number": None, "type": None, "codec": None, "width": None,
        "height": None, "sample_rate": None, "channels": None,
    }
    for eid, a2, b2 in _ebml_elements(data, a, b):
        if eid == _TRACK_NUMBER:
            tr["number"] = _uint(data, a2, b2)
        elif eid == _TRACK_TYPE:
            t = _uint(data, a2, b2)
            tr["type"] = _TRACK_TYPES.get(t, str(t))
        elif eid == _CODEC_ID:
            tr["codec"] = data[a2:b2].rstrip(b"\x00").decode("ascii", "replace")
        elif eid == _VIDEO:
            for eid3, a3, b3 in _ebml_elements(data, a2, b2):
                if eid3 == _PIXEL_WIDTH:
                    tr["width"] = _uint(data, a3, b3)
                elif eid3 == _PIXEL_HEIGHT:
                    tr["height"] = _uint(data, a3, b3)
        elif eid == _AUDIO:
            for eid3, a3, b3 in _ebml_elements(data, a2, b2):
                if eid3 == _SAMPLING_FREQ:
                    tr["sample_rate"] = int(_float(data, a3, b3))
                elif eid3 == _CHANNELS:
                    tr["channels"] = _uint(data, a3, b3)
    return tr


# --------------------------------------------------------------- builder


def ebml_elem(eid: int, body: bytes) -> bytes:
    """Encode one EBML element with an explicit size (fixture builder)."""
    idlen = max(1, (eid.bit_length() + 7) // 8)
    ebml_id = eid.to_bytes(idlen, "big")
    n = len(body)
    # choose the shortest size encoding that is NOT the all-ones reserved
    # "unknown" pattern
    for slen in range(1, 9):
        if n < (1 << (7 * slen)) - 1:
            size = (n | (1 << (7 * slen))).to_bytes(slen, "big")
            return ebml_id + size + body
    raise MediaError("element too large")


def ebml_uint(eid: int, v: int) -> bytes:
    return ebml_elem(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def ebml_float(eid: int, v: float) -> bytes:
    return ebml_elem(eid, struct.pack(">d", v))


def build_matroska(
    doctype: str = "webm",
    duration_s: float = 2.0,
    video: dict | None = None,
    audio: dict | None = None,
    cluster_blocks: list[tuple[int, bool]] | None = None,
) -> bytes:
    """Minimal spec-shaped Matroska file: header + info + tracks + one
    cluster whose SimpleBlocks carry (track_number, keyframe) flags."""
    header = ebml_elem(
        _EBML_HEADER,
        ebml_elem(_DOCTYPE, doctype.encode()),
    )
    info = ebml_elem(
        _INFO,
        ebml_uint(_TIMESTAMP_SCALE, 1_000_000)
        + ebml_float(_DURATION, duration_s * 1000.0),
    )
    entries = b""
    if video:
        entries += ebml_elem(
            _TRACK_ENTRY,
            ebml_uint(_TRACK_NUMBER, 1)
            + ebml_uint(_TRACK_TYPE, 1)
            + ebml_elem(_CODEC_ID, video.get("codec", "V_VP9").encode())
            + ebml_elem(
                _VIDEO,
                ebml_uint(_PIXEL_WIDTH, video.get("width", 640))
                + ebml_uint(_PIXEL_HEIGHT, video.get("height", 360)),
            ),
        )
    if audio:
        entries += ebml_elem(
            _TRACK_ENTRY,
            ebml_uint(_TRACK_NUMBER, 2)
            + ebml_uint(_TRACK_TYPE, 2)
            + ebml_elem(_CODEC_ID, audio.get("codec", "A_OPUS").encode())
            + ebml_elem(
                _AUDIO,
                ebml_float(_SAMPLING_FREQ, float(audio.get("sample_rate", 48000)))
                + ebml_uint(_CHANNELS, audio.get("channels", 2)),
            ),
        )
    tracks = ebml_elem(_TRACKS, entries)
    blocks = b""
    for tn, key in cluster_blocks or []:
        payload = (0x80 | tn).to_bytes(1, "big") + b"\x00\x00" + (
            b"\x80" if key else b"\x00"
        ) + b"\xde\xad"
        blocks += ebml_elem(_SIMPLE_BLOCK, payload)
    cluster = ebml_elem(_CLUSTER, ebml_uint(_CLUSTER_TS, 0) + blocks)
    segment = ebml_elem(_SEGMENT, info + tracks + cluster)
    return header + segment


# ===========================================================================
# Ogg (RFC 3533) + Vorbis/Opus identification headers
# ===========================================================================

_OGG_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 else (_r << 1)
    _OGG_CRC_TABLE.append(_r & 0xFFFFFFFF)


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[((crc >> 24) ^ b) & 0xFF]
    return crc


def parse_ogg(data: bytes) -> dict[str, Any]:
    """Container metadata for an Ogg file.

    Returns {streams: [{codec, sample_rate, channels, duration_s}],
    n_pages}.  Duration: Vorbis granule = PCM samples at the stream rate;
    Opus granule runs at 48 kHz minus pre-skip (RFC 7845 §4).
    """
    if data[:4] != b"OggS":
        raise MediaError("not an Ogg file (missing OggS capture)")
    streams: dict[int, dict[str, Any]] = {}
    n_pages = 0
    i = 0
    n = len(data)
    while i + 27 <= n:
        if data[i : i + 4] != b"OggS":
            j = data.find(b"OggS", i)
            if j < 0:
                break
            i = j
            continue
        version, htype = data[i + 4], data[i + 5]
        if version != 0:
            raise MediaError(f"unsupported Ogg version {version}")
        granule = struct.unpack_from("<q", data, i + 6)[0]
        serial = struct.unpack_from("<I", data, i + 14)[0]
        crc = struct.unpack_from("<I", data, i + 22)[0]
        nsegs = data[i + 26]
        seg_table = data[i + 27 : i + 27 + nsegs]
        body_start = i + 27 + nsegs
        body_len = sum(seg_table)
        page_end = body_start + body_len
        if page_end > n:
            break
        page = bytearray(data[i:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise MediaError("Ogg page CRC mismatch")
        n_pages += 1
        body = data[body_start:page_end]
        st = streams.setdefault(
            serial,
            {"codec": None, "sample_rate": None, "channels": None,
             "pre_skip": 0, "last_granule": 0},
        )
        if htype & 0x02:  # BOS: identification header
            if body.startswith(b"\x01vorbis"):
                st["codec"] = "vorbis"
                st["channels"] = body[11]
                st["sample_rate"] = struct.unpack_from("<I", body, 12)[0]
            elif body.startswith(b"OpusHead"):
                st["codec"] = "opus"
                st["channels"] = body[9]
                st["pre_skip"] = struct.unpack_from("<H", body, 10)[0]
                st["sample_rate"] = 48000  # Opus always decodes at 48 kHz
            elif body.startswith(b"\x80theora"):
                st["codec"] = "theora"
            elif body.startswith(b"\x7fFLAC"):
                st["codec"] = "flac"
        if granule >= 0:
            st["last_granule"] = max(st["last_granule"], granule)
        i = page_end

    out_streams = []
    for st in streams.values():
        dur = None
        if st["codec"] == "vorbis" and st["sample_rate"]:
            dur = st["last_granule"] / st["sample_rate"]
        elif st["codec"] == "opus":
            dur = max(0, st["last_granule"] - st["pre_skip"]) / 48000.0
        out_streams.append(
            {"codec": st["codec"], "sample_rate": st["sample_rate"],
             "channels": st["channels"],
             "duration_s": round(dur, 6) if dur is not None else None}
        )
    return {"streams": out_streams, "n_pages": n_pages}


def build_ogg_page(
    serial: int, seq: int, granule: int, body: bytes, htype: int = 0
) -> bytes:
    segs = []
    rest = len(body)
    while rest >= 255:
        segs.append(255)
        rest -= 255
    segs.append(rest)
    page = bytearray(
        b"OggS\x00"
        + bytes([htype])
        + struct.pack("<q", granule)
        + struct.pack("<I", serial)
        + struct.pack("<I", seq)
        + b"\x00\x00\x00\x00"
        + bytes([len(segs)])
        + bytes(segs)
        + body
    )
    page[22:26] = struct.pack("<I", _ogg_crc(bytes(page)))
    return bytes(page)


def build_ogg_opus(duration_s: float = 1.5, channels: int = 2,
                   pre_skip: int = 312, serial: int = 7) -> bytes:
    head = (
        b"OpusHead\x01" + bytes([channels]) + struct.pack("<H", pre_skip)
        + struct.pack("<I", 48000) + b"\x00\x00\x00"
    )
    tags = b"OpusTags" + struct.pack("<I", 4) + b"test" + struct.pack("<I", 0)
    final_granule = int(duration_s * 48000) + pre_skip
    return (
        build_ogg_page(serial, 0, 0, head, htype=0x02)
        + build_ogg_page(serial, 1, 0, tags)
        + build_ogg_page(serial, 2, final_granule, b"\xfc\xff\xfe", htype=0x04)
    )


def build_ogg_vorbis(duration_s: float = 2.0, channels: int = 2,
                     sample_rate: int = 44100, serial: int = 9) -> bytes:
    ident = (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
        + struct.pack("<I", sample_rate) + b"\x00" * 12 + b"\xb8\x01"
    )
    final_granule = int(duration_s * sample_rate)
    return (
        build_ogg_page(serial, 0, 0, ident, htype=0x02)
        + build_ogg_page(serial, 1, final_granule, b"\x00\x01\x02", htype=0x04)
    )


# ===========================================================================
# MP3 — MPEG-1/2/2.5 audio frame headers (ISO 11172-3 §2.4.1)
# ===========================================================================

_MP3_BITRATES = {
    # (version_group, layer): kbps by index 1..14 (0=free, 15=bad)
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
              0: [11025, 12000, 8000]}


def _mp3_frame(data: bytes, i: int):
    """Parse a frame header at data[i]; returns (frame_len, samples, rate,
    kbps, channels) or None if data[i] is not a valid sync."""
    if i + 4 > len(data):
        return None
    h = struct.unpack_from(">I", data, i)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver_bits = (h >> 19) & 3        # 0=2.5, 2=MPEG2, 3=MPEG1
    layer_bits = (h >> 17) & 3      # 1=III, 2=II, 3=I
    if ver_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits
    vgroup = 1 if ver_bits == 3 else 2
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    kbps = _MP3_BITRATES[(vgroup, layer)][br_idx]
    rate = _MP3_RATES[ver_bits][sr_idx]
    padding = (h >> 9) & 1
    mono = ((h >> 6) & 3) == 3
    if layer == 1:
        samples = 384
        frame_len = (12000 * kbps // rate + padding) * 4
    else:
        samples = 1152 if (layer == 2 or vgroup == 1) else 576
        frame_len = samples // 8 * 1000 * kbps // rate + padding
    return frame_len, samples, rate, kbps, (1 if mono else 2)


def parse_mp3(data: bytes) -> dict[str, Any]:
    """Frame-walk metadata for an MP3 stream: {duration_s, sample_rate,
    channels, bitrate_kbps, n_frames, vbr}.  Honors a leading ID3v2 tag
    and a Xing/Info/VBRI frame count when present."""
    i = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = 0
        for b in data[6:10]:
            size = (size << 7) | (b & 0x7F)
        i = 10 + size
    # resync: scan forward for the first valid frame header
    first = None
    while i <= len(data) - 4:
        first = _mp3_frame(data, i)
        if first:
            break
        i += 1
    if not first:
        raise MediaError("no MPEG audio frame found")
    frame_len, samples, rate, kbps, channels = first
    # VBR header inside the first frame?
    head = data[i : i + frame_len]
    vbr_frames = None
    for tag in (b"Xing", b"Info"):
        j = head.find(tag)
        if j >= 0 and len(head) >= j + 12:
            flags = struct.unpack_from(">I", head, j + 4)[0]
            if flags & 1:
                vbr_frames = struct.unpack_from(">I", head, j + 8)[0]
            break
    j = head.find(b"VBRI")
    if vbr_frames is None and j >= 0 and len(head) >= j + 18:
        vbr_frames = struct.unpack_from(">I", head, j + 14)[0]

    n_frames = 0
    kbps_sum = 0
    while i <= len(data) - 4:
        fr = _mp3_frame(data, i)
        if not fr:
            i += 1
            continue
        n_frames += 1
        kbps_sum += fr[3]
        i += max(fr[0], 4)
    frames = vbr_frames if vbr_frames is not None else n_frames
    return {
        "duration_s": round(frames * samples / rate, 6) if rate else None,
        "sample_rate": rate,
        "channels": channels,
        "bitrate_kbps": round(kbps_sum / n_frames) if n_frames else kbps,
        "n_frames": frames,
        "vbr": vbr_frames is not None,
    }


def build_mp3(n_frames: int = 10, kbps: int = 128, rate: int = 44100,
              id3: bytes | None = None) -> bytes:
    """Valid CBR MPEG-1 Layer III frames with silent (zero) payloads."""
    br_idx = _MP3_BITRATES[(1, 3)].index(kbps)
    sr_idx = _MP3_RATES[3].index(rate)
    h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (br_idx << 12) | (sr_idx << 10)
    header = struct.pack(">I", h)
    frame_len = 144_000 * kbps // rate
    frame = header + bytes(frame_len - 4)
    out = b""
    if id3 is not None:
        size = len(id3)
        ss = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F,
             size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + ss + id3
    return out + frame * n_frames


# ===========================================================================
# uniform audio-metadata dispatch (header-only; no PCM decode)
# ===========================================================================


def _wav_meta(data: bytes) -> dict[str, Any]:
    if data[8:12] != b"WAVE":
        raise MediaError("RIFF but not WAVE")
    i = 12
    rate = channels = bits = None
    fmt_code = None
    data_bytes = 0
    byte_rate = None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        size = struct.unpack_from("<I", data, i + 4)[0]
        if cid == b"fmt ":
            fmt_code = struct.unpack_from("<H", data, i + 8)[0]
            channels = struct.unpack_from("<H", data, i + 10)[0]
            rate = struct.unpack_from("<I", data, i + 12)[0]
            byte_rate = struct.unpack_from("<I", data, i + 16)[0]
            bits = struct.unpack_from("<H", data, i + 22)[0]
        elif cid == b"data":
            data_bytes = size
        i += 8 + size + (size & 1)
    dur = data_bytes / byte_rate if byte_rate else None
    codec = {
        2: "adpcm_ms", 3: f"float{bits}", 6: "pcm_alaw", 7: "pcm_mulaw",
        0x11: "adpcm_ima",
    }.get(fmt_code, f"pcm_{bits}" if bits else "pcm")
    return {
        "container": "wav", "codec": codec,
        "duration_s": round(dur, 6) if dur is not None else None,
        "sample_rate": rate, "channels": channels, "n_frames": None,
    }


def _flac_meta(data: bytes) -> dict[str, Any]:
    # STREAMINFO is the mandatory first metadata block (RFC 9639 §8.2)
    if len(data) < 42 or (data[4] & 0x7F) != 0:
        raise MediaError("flac: STREAMINFO not first")
    si = data[8:42]
    word = int.from_bytes(si[10:18], "big")
    rate = (word >> 44) & 0xFFFFF
    channels = ((word >> 41) & 0x7) + 1
    total = word & ((1 << 36) - 1)
    dur = total / rate if rate and total else None
    return {
        "container": "flac", "codec": "flac",
        "duration_s": round(dur, 6) if dur is not None else None,
        "sample_rate": rate, "channels": channels, "n_frames": None,
    }


def parse_audio_meta(data: bytes) -> dict[str, Any]:
    """Sniff the container and return uniform audio metadata:
    {container, codec, duration_s, sample_rate, channels, n_frames}."""
    if data[:4] == b"RIFF":
        return _wav_meta(data)
    if data[:4] == b"fLaC":
        return _flac_meta(data)
    if data[:4] == b"OggS":
        meta = parse_ogg(data)
        audio = next(
            (s for s in meta["streams"] if s["codec"] in ("vorbis", "opus", "flac")),
            None,
        )
        if audio is None:
            raise MediaError("Ogg file has no recognized audio stream")
        return {"container": "ogg", "codec": audio["codec"],
                "duration_s": audio["duration_s"],
                "sample_rate": audio["sample_rate"],
                "channels": audio["channels"], "n_frames": None}
    if data[:4] == b"\x1a\x45\xdf\xa3":
        meta = parse_matroska(data)
        audio = next((t for t in meta["tracks"] if t["type"] == "audio"), None)
        if audio is None:
            raise MediaError("Matroska file has no audio track")
        return {"container": meta["doctype"], "codec": audio["codec"],
                "duration_s": meta["duration_s"],
                "sample_rate": audio["sample_rate"],
                "channels": audio["channels"],
                "n_frames": audio["n_blocks"] or None}
    if data[:3] == b"ID3" or (
        len(data) > 4 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
    ):
        meta = parse_mp3(data)
        return {"container": "mp3", "codec": "mp3",
                "duration_s": meta["duration_s"],
                "sample_rate": meta["sample_rate"],
                "channels": meta["channels"], "n_frames": meta["n_frames"]}
    if len(data) > 12 and data[4:8] == b"ftyp":
        from pipeline_spark.functions.mp4box import parse_mp4

        meta = parse_mp4(data)
        audio = next((t for t in meta["tracks"] if t["type"] == "soun"), None)
        if audio is None:
            raise MediaError("MP4 file has no audio track")
        return {"container": "mp4", "codec": audio["codec"],
                "duration_s": audio["duration_s"] or meta["duration_s"],
                "sample_rate": audio["timescale"],  # audio mdhd ts == rate
                "channels": None, "n_frames": audio["n_samples"] or None}
    raise MediaError("unrecognized audio container")
