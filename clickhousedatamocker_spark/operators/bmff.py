"""Minimal ISO-BMFF (MP4) box codec — vendored, pure stdlib.

The real ISO/IEC 14496-12 container layer: an encoder that writes a
structurally valid ftyp/moov(mvhd, trak(tkhd, mdia(mdhd, hdlr,
minf(vmhd|smhd, dinf/dref, stbl(stsd, stts, stsc, stsz, stco)))))) tree —
optionally carrying REAL video samples in mdat with genuine sample tables
— and a parser that walks the box hierarchy and extracts the metadata a
100 TB media-ingest pipeline needs before any codec runs: brand, movie
timescale/duration, per-track handler, codec fourcc, visual dimensions.
``decode_frames`` additionally demuxes and decodes frames for the
UNCOMPRESSED sample formats ('raw ' RGB24, I420) via the real
stsc/stsz/stco walk; compressed bitstreams (avc1/hev1/...) stay behind a
NotImplementedError gate — that decode genuinely needs ffmpeg, absent in
this environment. Parsing handles 32-bit and 64-bit (largesize) boxes and
version-0/1 full boxes, and raises ValueError on truncated or non-BMFF
input (consistent corrupt-input contract with operators/png.py).

Reference parity note: the reference repo has no media handling at all
(its `metadata` column is a literal '{}' — scripts/generate_data.py:31);
this module is north-star Tier-B surface (SURVEY §2.4 multimodal columns).
"""

from __future__ import annotations

import struct

# Containers whose payload is a sequence of child boxes.
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts", b"mvex", b"udta"}

_HANDLER_NAMES = {b"vide": b"VideoHandler\x00", b"soun": b"SoundHandler\x00"}


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


_UNITY_MATRIX = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)


def _mvhd(timescale: int, duration: int, next_track_id: int) -> bytes:
    payload = (
        struct.pack(">IIII", 0, 0, timescale, duration)  # creation, modification, ts, dur
        + struct.pack(">iH", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + b"\x00" * 10  # reserved
        + _UNITY_MATRIX
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", next_track_id)
    )
    return _full(b"mvhd", 0, 0, payload)


def _tkhd(track_id: int, duration: int, width: int, height: int, is_video: bool) -> bytes:
    payload = (
        struct.pack(">IIII", 0, 0, track_id, 0)
        + struct.pack(">I", duration)
        + b"\x00" * 8  # reserved
        + struct.pack(">hhhh", 0, 0, 0 if is_video else 0x0100, 0)  # layer, group, volume
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16)  # 16.16 fixed point
    )
    return _full(b"tkhd", 0, 0x000007, payload)  # enabled | in_movie | in_preview


def _mdhd(timescale: int, duration: int) -> bytes:
    # language 'und' packed as 3x5-bit (0x55C4)
    payload = struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0)
    return _full(b"mdhd", 0, 0, payload)


def _hdlr(handler: bytes) -> bytes:
    payload = struct.pack(">I4s", 0, handler) + b"\x00" * 12 + _HANDLER_NAMES.get(handler, b"\x00")
    return _full(b"hdlr", 0, 0, payload)


def _visual_sample_entry(fourcc: bytes, width: int, height: int) -> bytes:
    payload = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)  # 72 dpi, reserved, frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    return _box(fourcc, payload)


def _audio_sample_entry(fourcc: bytes, sample_rate: int) -> bytes:
    if not 0 < sample_rate <= 0xFFFF:
        # the AudioSampleEntry samplerate field is 16.16 fixed point — the
        # integer part is 16 bits, so >=65536 Hz cannot be represented here
        # (real muxers carry high rates in an esds/srat box, out of scope)
        raise ValueError(f"sample_rate {sample_rate} does not fit 16.16 fixed point")
    payload = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 8  # reserved
        + struct.pack(">HHI", 2, 16, 0)  # channelcount, samplesize, pre_defined/reserved
        + struct.pack(">I", sample_rate << 16)  # 16.16 fixed point
    )
    return _box(fourcc, payload)


def _empty_stbl(sample_entry: bytes) -> bytes:
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">I", 0))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", 0))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
    stco = _full(b"stco", 0, 0, struct.pack(">I", 0))
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def _sample_stbl(sample_entry: bytes, sizes: list[int], chunk_offset: int, delta: int) -> bytes:
    """Real sample tables: all samples in ONE chunk at ``chunk_offset``
    (absolute file offset), uniform time delta."""
    n = len(sizes)
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n) + b"".join(struct.pack(">I", s) for s in sizes))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def _dinf() -> bytes:
    url = _full(b"url ", 0, 0x000001, b"")  # self-contained
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    return _box(b"dinf", dref)


# Uncompressed video sample formats this codec can actually decode without
# ffmpeg: fourcc -> bytes-per-frame given (w, h). Everything else (avc1,
# hev1, mp4v, av01, ...) is a compressed bitstream — container metadata
# parses fine, frame decode raises NotImplementedError (the fourcc gate).
RAW_VIDEO_FRAME_BYTES = {
    "raw ": lambda w, h: w * h * 3,       # packed RGB24
    "I420": lambda w, h: (w * h * 3) // 2,  # planar YUV 4:2:0
}


def encode_mp4(
    timescale: int,
    duration: int,
    tracks: list[dict],
    frames: list[bytes] | None = None,
) -> bytes:
    """Build a minimal valid MP4. ``tracks`` entries:
    ``{"handler": "vide"|"soun", "fourcc": str, "width": int, "height": int,
    "sample_rate": int}`` (width/height for video, sample_rate for audio).

    ``frames``: raw sample payloads for the FIRST video track (uncompressed
    fourccs — see RAW_VIDEO_FRAME_BYTES; each frame must be exactly the
    fourcc's frame size for the track dims). With frames the layout is
    ftyp/mdat/moov (the chunk offset is then independent of moov's size, so
    stco needs no patch pass); without, the legacy ftyp/moov/mdat layout and
    empty sample tables are byte-identical to before.
    """
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat_payload = b"".join(frames) if frames else b""
    frames_left = list(frames) if frames else None
    traks = b""
    for i, tr in enumerate(tracks, start=1):
        handler = tr["handler"].encode()
        fourcc = tr["fourcc"].encode()
        if handler == b"vide":
            w, h = tr["width"], tr["height"]
            entry = _visual_sample_entry(fourcc, w, h)
            mhd = _full(b"vmhd", 0, 0x000001, struct.pack(">HHHH", 0, 0, 0, 0))
        else:
            w = h = 0
            entry = _audio_sample_entry(fourcc, tr.get("sample_rate", 48000))
            mhd = _full(b"smhd", 0, 0, struct.pack(">hH", 0, 0))
        if handler == b"vide" and frames_left is not None:
            sizer = RAW_VIDEO_FRAME_BYTES.get(tr["fourcc"])
            if sizer is None:
                raise ValueError(
                    f"frames require an uncompressed fourcc, got {tr['fourcc']!r}"
                )
            want = sizer(w, h)
            for f in frames_left:
                if len(f) != want:
                    raise ValueError(f"frame size {len(f)} != {want} for {w}x{h} {tr['fourcc']!r}")
            stbl = _sample_stbl(
                entry,
                [len(f) for f in frames_left],
                len(ftyp) + 8,  # mdat follows ftyp; +8 skips the mdat header
                max(1, duration // max(1, len(frames_left))),
            )
            frames_left = None
        else:
            stbl = _empty_stbl(entry)
        minf = _box(b"minf", mhd + _dinf() + stbl)
        mdia = _box(b"mdia", _mdhd(timescale, duration) + _hdlr(handler) + minf)
        traks += _box(b"trak", _tkhd(i, duration, w, h, handler == b"vide") + mdia)
    if frames and frames_left is not None:
        raise ValueError("frames given but no video track to attach them to")
    moov = _box(b"moov", _mvhd(timescale, duration, len(tracks) + 1) + traks)
    mdat = _box(b"mdat", mdat_payload)
    if frames:
        return ftyp + mdat + moov
    return ftyp + moov + mdat


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end); ValueError on truncation."""
    off = start
    while off < end:
        if off + 8 > end:
            raise ValueError("truncated ISO-BMFF box header")
        size, btype = struct.unpack_from(">I4s", data, off)
        header = 8
        if size == 1:  # 64-bit largesize
            if off + 16 > end:
                raise ValueError("truncated ISO-BMFF largesize header")
            size = struct.unpack_from(">Q", data, off + 8)[0]
            header = 16
        elif size == 0:  # box extends to end of enclosing container
            size = end - off
        if size < header or off + size > end:
            raise ValueError(f"truncated ISO-BMFF box {btype!r}")
        yield btype, off + header, off + size
        off += size


def _parse_fullbox(data: bytes, start: int, end: int) -> tuple[int, int]:
    if start + 4 > end:
        raise ValueError("truncated ISO-BMFF full box")
    return data[start], start + 4


def parse_mp4(data: bytes) -> dict:
    """Walk the box tree and return container metadata:

    ``{"major_brand": str, "timescale": int, "duration": int,
    "duration_ms": int, "n_tracks": int, "tracks": [{"handler": str,
    "fourcc": str, "width": int, "height": int}]}``

    Raises ValueError on truncated or non-BMFF input.
    """
    if len(data) < 8:
        raise ValueError("not ISO-BMFF (too short)")
    boxes = list(_iter_boxes(data, 0, len(data)))
    if not boxes or boxes[0][0] != b"ftyp":
        raise ValueError("not ISO-BMFF (missing ftyp)")
    ft_start = boxes[0][1]
    out: dict = {
        "major_brand": data[ft_start : ft_start + 4].decode("latin1"),
        "timescale": None,
        "duration": None,
        "n_tracks": 0,
        "tracks": [],
    }

    def walk(start: int, end: int, track: dict | None) -> None:
        for btype, ps, pe in _iter_boxes(data, start, end):
            if btype == b"mvhd":
                version, p = _parse_fullbox(data, ps, pe)
                p += 16 if version == 1 else 8  # creation + modification times
                need = 12 if version == 1 else 8  # timescale + duration
                if p + need > pe:
                    raise ValueError("truncated mvhd payload")
                if version == 1:
                    out["timescale"] = struct.unpack_from(">I", data, p)[0]
                    out["duration"] = struct.unpack_from(">Q", data, p + 4)[0]
                else:
                    out["timescale"], out["duration"] = struct.unpack_from(">II", data, p)
            elif btype == b"trak":
                tr = {"handler": None, "fourcc": None, "width": 0, "height": 0}
                out["tracks"].append(tr)
                walk(ps, pe, tr)
            elif btype == b"tkhd" and track is not None:
                version, p = _parse_fullbox(data, ps, pe)
                # the trailing width/height are the last 8 payload bytes —
                # a well-sized box with a short payload must not read the
                # PREVIOUS box's bytes
                if pe - 8 < p:
                    raise ValueError("truncated tkhd payload")
                w16, h16 = struct.unpack_from(">II", data, pe - 8)
                track["width"], track["height"] = w16 >> 16, h16 >> 16
            elif btype == b"hdlr" and track is not None:
                _, p = _parse_fullbox(data, ps, pe)
                if p + 8 > pe:
                    raise ValueError("truncated hdlr payload")
                track["handler"] = data[p + 4 : p + 8].decode("latin1")
            elif btype == b"stsd" and track is not None:
                _, p = _parse_fullbox(data, ps, pe)
                if p + 4 > pe:
                    raise ValueError("truncated stsd payload")
                n_entries = struct.unpack_from(">I", data, p)[0]
                if n_entries:
                    for etype, _, _ in _iter_boxes(data, p + 4, pe):
                        track["fourcc"] = etype.decode("latin1")
                        break
            elif btype in _CONTAINERS:
                walk(ps, pe, track)

    for btype, ps, pe in boxes:
        if btype == b"moov":
            walk(ps, pe, None)
    if out["timescale"] is None:
        raise ValueError("not a movie file (missing moov/mvhd)")
    out["n_tracks"] = len(out["tracks"])
    out["duration_ms"] = out["duration"] * 1000 // out["timescale"] if out["timescale"] else 0
    return out


def decode_frames(data: bytes) -> dict:
    """Decode the first video track's frames — WITHOUT ffmpeg, for the
    uncompressed sample formats in RAW_VIDEO_FRAME_BYTES ('raw ' RGB24,
    'I420' planar YUV420). Walks the real sample tables (stsc chunk runs ->
    stco chunk offsets -> cumulative stsz sizes) to slice each sample out
    of mdat, exactly what a demuxer does.

    Returns ``{"fourcc": str, "width": int, "height": int,
    "frames": [bytes, ...]}``.

    Raises NotImplementedError for compressed fourccs (the gate: a correct
    container parse cannot conjure a bitstream decoder) and ValueError for
    truncated tables / out-of-file sample extents / frame-size mismatches.
    """
    if len(data) < 8:
        raise ValueError("not ISO-BMFF (too short)")
    boxes = list(_iter_boxes(data, 0, len(data)))
    if not boxes or boxes[0][0] != b"ftyp":
        raise ValueError("not ISO-BMFF (missing ftyp)")

    track: dict | None = None

    def walk_trak(start: int, end: int, tr: dict) -> None:
        for btype, ps, pe in _iter_boxes(data, start, end):
            if btype == b"hdlr":
                _, p = _parse_fullbox(data, ps, pe)
                if p + 8 > pe:
                    raise ValueError("truncated hdlr payload")
                tr["handler"] = data[p + 4 : p + 8].decode("latin1")
            elif btype == b"stsd":
                _, p = _parse_fullbox(data, ps, pe)
                if p + 4 > pe:
                    raise ValueError("truncated stsd payload")
                if struct.unpack_from(">I", data, p)[0]:
                    for etype, eps, epe in _iter_boxes(data, p + 4, pe):
                        tr["fourcc"] = etype.decode("latin1")
                        # VisualSampleEntry width/height at offset 24/26
                        # past the 8-byte entry base (6 reserved + 2 dref
                        # index + 16 pre_defined)
                        if eps + 28 <= epe:
                            tr["width"], tr["height"] = struct.unpack_from(">HH", data, eps + 24)
                        break
            elif btype == b"stsz":
                _, p = _parse_fullbox(data, ps, pe)
                if p + 8 > pe:
                    raise ValueError("truncated stsz payload")
                fixed, n = struct.unpack_from(">II", data, p)
                if fixed:
                    tr["sizes"] = [fixed] * n
                else:
                    if p + 8 + 4 * n > pe:
                        raise ValueError("truncated stsz size table")
                    tr["sizes"] = list(struct.unpack_from(f">{n}I", data, p + 8)) if n else []
            elif btype == b"stco":
                _, p = _parse_fullbox(data, ps, pe)
                if p + 4 > pe:
                    raise ValueError("truncated stco payload")
                n = struct.unpack_from(">I", data, p)[0]
                if p + 4 + 4 * n > pe:
                    raise ValueError("truncated stco offset table")
                tr["chunk_offsets"] = list(struct.unpack_from(f">{n}I", data, p + 4)) if n else []
            elif btype == b"stsc":
                _, p = _parse_fullbox(data, ps, pe)
                if p + 4 > pe:
                    raise ValueError("truncated stsc payload")
                n = struct.unpack_from(">I", data, p)[0]
                if p + 4 + 12 * n > pe:
                    raise ValueError("truncated stsc entry table")
                tr["stsc"] = [
                    struct.unpack_from(">III", data, p + 4 + 12 * i) for i in range(n)
                ]
            elif btype in _CONTAINERS:
                walk_trak(ps, pe, tr)

    for btype, ps, pe in boxes:
        if btype != b"moov":
            continue
        for ctype, cps, cpe in _iter_boxes(data, ps, pe):
            if ctype == b"trak" and track is None:
                tr: dict = {"handler": None}
                walk_trak(cps, cpe, tr)
                if tr.get("handler") == "vide":
                    track = tr
    if track is None:
        raise ValueError("no video track")
    fourcc = track.get("fourcc") or ""
    sizer = RAW_VIDEO_FRAME_BYTES.get(fourcc)
    if sizer is None:
        raise NotImplementedError(
            f"frame decode for compressed codec {fourcc!r} needs ffmpeg, "
            "absent in this environment (container metadata still parses)"
        )
    w, h = track.get("width", 0), track.get("height", 0)
    want = sizer(w, h)
    sizes = track.get("sizes") or []
    chunk_offsets = track.get("chunk_offsets") or []
    stsc = track.get("stsc") or []
    frames: list[bytes] = []
    if sizes:
        if not chunk_offsets or not stsc:
            raise ValueError("sample sizes without chunk tables")
        # expand stsc runs into per-chunk sample counts
        per_chunk: list[int] = []
        for i, (first, spc, _sdi) in enumerate(stsc):
            last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(chunk_offsets)
            per_chunk.extend([spc] * (last - first + 1))
        si = 0
        for ci, coff in enumerate(chunk_offsets):
            off = coff
            for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
                if si >= len(sizes):
                    break
                sz = sizes[si]
                if off + sz > len(data):
                    raise ValueError("sample extends past end of file")
                frames.append(data[off : off + sz])
                off += sz
                si += 1
        if si != len(sizes):
            raise ValueError("chunk tables cover fewer samples than stsz declares")
    for f in frames:
        if len(f) != want:
            raise ValueError(f"frame size {len(f)} != {want} for {w}x{h} {fourcc!r}")
    return {"fourcc": fourcc, "width": w, "height": h, "frames": frames}
