"""Property-based tests (hypothesis) for the vendored codecs — round-trip
laws over the whole parameter space, not just the synth pipeline's points.
No Spark session needed: these are pure-Python codec laws, so the file
runs in milliseconds per example."""

from hypothesis import given, settings
from hypothesis import strategies as st

from clickhousedatamocker_spark.operators.bmff import encode_mp4, parse_mp4
from clickhousedatamocker_spark.operators.png import decode_png, encode_png

_FOURCC = st.sampled_from(["avc1", "hev1", "mp4v", "av01", "vp09"])


@settings(max_examples=60, deadline=None)
@given(
    timescale=st.integers(1, 1_000_000),
    duration=st.integers(0, 2**32 - 1),
    width=st.integers(1, 8192),
    height=st.integers(1, 8192),
    fourcc=_FOURCC,
    audio=st.booleans(),
    sample_rate=st.integers(8000, 65535),
)
def test_mp4_roundtrip_law(timescale, duration, width, height, fourcc, audio, sample_rate):
    tracks = [{"handler": "vide", "fourcc": fourcc, "width": width, "height": height}]
    if audio:
        tracks.append({"handler": "soun", "fourcc": "mp4a", "sample_rate": sample_rate})
    meta = parse_mp4(encode_mp4(timescale, duration, tracks))
    assert (meta["timescale"], meta["duration"]) == (timescale, duration)
    assert meta["n_tracks"] == len(tracks)
    assert meta["tracks"][0] == {
        "handler": "vide",
        "fourcc": fourcc,
        "width": width,
        "height": height,
    }
    if audio:
        assert meta["tracks"][1]["handler"] == "soun"
        assert meta["tracks"][1]["fourcc"] == "mp4a"


def test_mp4_high_sample_rates_are_gated():
    """The AudioSampleEntry samplerate field is 16.16 fixed point: >=65536
    Hz cannot be represented and must raise, not silently overflow (found
    by the round-trip fuzz at 96 kHz)."""
    import pytest

    with pytest.raises(ValueError, match="16.16"):
        encode_mp4(600, 100, [{"handler": "soun", "fourcc": "mp4a", "sample_rate": 96000}])


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=4096))
def test_mp4_parser_total_on_garbage(data):
    """parse_mp4 is TOTAL over arbitrary bytes: it either returns a dict or
    raises ValueError — never IndexError/struct.error/KeyError."""
    try:
        meta = parse_mp4(data)
        assert isinstance(meta, dict)
    except ValueError:
        pass


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    color_type=st.sampled_from([0, 2, 4, 6]),
    filter_type=st.integers(0, 4),
    seed=st.integers(0, 2**32 - 1),
)
def test_png_roundtrip_law(w, h, color_type, filter_type, seed):
    import hashlib

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    n = w * h * ch
    px = bytearray()
    i = 0
    while len(px) < n:
        px.extend(hashlib.sha256(f"{seed}:{i}".encode()).digest())
        i += 1
    pixels = bytes(px[:n])
    gw, gh, gch, gpx = decode_png(encode_png(w, h, pixels, color_type, filter_type))
    assert (gw, gh, gch, gpx) == (w, h, ch, pixels)


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=2048))
def test_jpeg_decoder_total_on_garbage(data):
    """decode_jpeg over arbitrary bytes raises only ValueError or
    NotImplementedError (unsupported-variant gates) — the corrupt-input
    contract, fuzzed."""
    from clickhousedatamocker_spark.operators.jpeg import decode_jpeg

    try:
        decode_jpeg(b"\xff\xd8" + data)  # SOI + garbage
    except (ValueError, NotImplementedError):
        pass


# -- mp4 frame decode (uncompressed sample formats, real demux walk) --------

_RAW_FOURCC = st.sampled_from(["raw ", "I420"])


@given(
    w=st.integers(2, 24).map(lambda x: 2 * x),
    h=st.integers(2, 16).map(lambda x: 2 * x),
    fourcc=_RAW_FOURCC,
    n_frames=st.integers(1, 4),
    audio=st.booleans(),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_mp4_frame_roundtrip_law(w, h, fourcc, n_frames, audio, seed):
    """encode(frames) -> decode_frames recovers every frame byte-exactly,
    through the real stsc/stsz/stco walk, and parse_mp4 still reads the
    container metadata of the mdat-first layout."""
    import hashlib

    from clickhousedatamocker_spark.operators.bmff import (
        RAW_VIDEO_FRAME_BYTES,
        decode_frames,
    )

    fsz = RAW_VIDEO_FRAME_BYTES[fourcc](w, h)
    frames = []
    for i in range(n_frames):
        buf = bytearray()
        c = 0
        while len(buf) < fsz:
            buf.extend(hashlib.sha256(f"{seed}:{i}:{c}".encode()).digest())
            c += 1
        frames.append(bytes(buf[:fsz]))
    tracks = [{"handler": "vide", "fourcc": fourcc, "width": w, "height": h}]
    if audio:
        tracks.append({"handler": "soun", "fourcc": "mp4a", "sample_rate": 48000})
    blob = encode_mp4(600, 1200, tracks, frames=frames)
    meta = parse_mp4(blob)
    assert meta["n_tracks"] == len(tracks)
    assert meta["tracks"][0]["fourcc"] == fourcc
    dec = decode_frames(blob)
    assert (dec["width"], dec["height"], dec["fourcc"]) == (w, h, fourcc)
    assert dec["frames"] == frames


def test_mp4_frame_decode_compressed_is_gated():
    """Compressed fourccs parse as metadata but frame decode raises the
    clearly-marked NotImplementedError (no ffmpeg in this environment)."""
    import pytest

    from clickhousedatamocker_spark.operators.bmff import decode_frames

    blob = encode_mp4(600, 900, [{"handler": "vide", "fourcc": "avc1", "width": 64, "height": 48}])
    assert parse_mp4(blob)["tracks"][0]["fourcc"] == "avc1"
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_frames(blob)


def test_mp4_frame_decode_corrupt_tables_raise():
    """Sample extents pointing past EOF and frame-size mismatches raise
    ValueError (the corrupt-input contract), never a silent wrong decode."""
    import pytest

    from clickhousedatamocker_spark.operators.bmff import decode_frames

    frames = [bytes(range(48)) * (8 * 8 * 3 // 48)]
    blob = encode_mp4(600, 600, [{"handler": "vide", "fourcc": "raw ", "width": 8, "height": 8}], frames=frames)
    truncated = blob[: len(blob) - 300]  # cut into moov, boxes now short
    with pytest.raises(ValueError):
        decode_frames(truncated)
    # frame size disagreeing with the sample-entry dims is a hard error
    with pytest.raises(ValueError, match="frame size"):
        encode_mp4(600, 600, [{"handler": "vide", "fourcc": "raw ", "width": 8, "height": 8}], frames=[b"\x00" * 10])
