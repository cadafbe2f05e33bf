"""Multimodal column support (SURVEY §2.4 Tier B).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; per-item compute (decode, feature extraction, resize,
frame sampling) runs as Arrow-batched ``mapInPandas``. All four supported
mimes decode for REAL with vendored pure-Python codecs — PNG
(operators/png.py), baseline JPEG (operators/jpeg.py), WAV (stdlib
``wave``), and ISO-BMFF for MP4 (operators/bmff.py — box walk for
duration/tracks/fourcc/dimensions, plus FRAME decode for uncompressed
sample formats 'raw '/I420 via the real stsc/stsz/stco demux walk;
compressed bitstreams like avc1 still need ffmpeg, absent here, and stay
behind the fourcc gate). Unknown mimes raise a clearly-marked "no codec"
NotImplementedError.

Scale: media rows are large — the operators preserve the incoming
partitioning (mapInPandas is a narrow transformation) and never collect
binary data to the driver.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Spark Python workers inherit neither the driver's sys.path edits nor its
# cwd, so a session started outside the repo (an external driver's) spawns
# workers that cannot import this package. The repo root is captured here on
# the DRIVER at import time and each worker closure carries it as a plain
# string local, prepending it to sys.path before any package-internal
# import — the closure must reference NO module globals, or cloudpickle
# serializes them by reference and the worker fails at unpickle time, before
# any bootstrap can run. (Local mode and any cluster with a shared
# filesystem; otherwise ship the package via --py-files as usual.)
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("data", T.BinaryType(), False),
    ]
)

_MIMES = ["image/png", "image/jpeg", "audio/wav", "video/mp4"]

FEATURE_DIM = 16


# ---------------------------------------------------------------------------
# Deterministic per-mime payload builders. Every builder derives its content
# from sha256 of the row key, so an independent engine (the DuckDB oracle)
# can re-derive the decoded checksums without running our codecs. These run
# on EXECUTORS — callers import them inside the mapInPandas closure after the
# sys.path bootstrap (see the _REPO_ROOT comment above).
# ---------------------------------------------------------------------------


def _sha_stream(key: str, n_bytes: int, salt: str = "") -> bytes:
    import hashlib

    out = bytearray()
    i = 0
    while len(out) < n_bytes:
        out.extend(hashlib.sha256(f"{key}{salt}:{i}".encode()).digest())
        i += 1
    return bytes(out[:n_bytes])


def _png_payload(key: str, size: int = 8) -> bytes:
    from clickhousedatamocker_spark.operators.png import encode_png

    return encode_png(size, size, _sha_stream(key, size * size * 3), color_type=2)


def _jpeg_payload(key: str, size: int = 16) -> bytes:
    """size x size grayscale of constant 8x8 blocks (DC-only → the lossy
    format round-trips EXACTLY; see attach_synth_jpeg docstring)."""
    import hashlib

    import numpy as np

    from clickhousedatamocker_spark.operators.jpeg import encode_jpeg

    nb = size // 8
    vals = hashlib.sha256(f"{key}:jpg".encode()).digest()[: nb * nb]
    px = np.zeros((size, size), dtype=np.uint8)
    for k in range(nb * nb):
        by, bx = divmod(k, nb)
        px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = vals[k]
    return encode_jpeg(size, size, px.tobytes(), 1)


def _wav_payload(key: str, n_samples: int = 96, sample_rate: int = 8000) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(_sha_stream(key, n_samples * 2))
    return buf.getvalue()


# Synthetic mp4s carry REAL uncompressed frames ('raw ' RGB24 / 'I420'
# planar YUV) so the decode path exercises actual sample-table demux +
# frame-pixel truth; the compressed-codec gate (avc1/hev1/...) stays
# pytest-covered via handcrafted containers (frame decode for those needs
# ffmpeg, absent here).
_MP4_FOURCCS = ["raw ", "I420"]


def _mp4_params(key: str) -> dict:
    """Container parameters derived from sha256(key || ':mp4') — each field
    reads one digest byte, so the DuckDB oracle re-derives them from the
    hex digest alone (see queries/llm.py multimodal oracle). Dims are kept
    small (8..32 x 8..24): frames are uncompressed, and the oracle re-sums
    every frame byte with sha256-hex arithmetic."""
    import hashlib

    d = hashlib.sha256(f"{key}:mp4".encode()).digest()
    return {
        "duration": 1000 + ((d[0] << 8 | d[1]) % 50000),  # in 600-unit timescale
        "width": 8 * (1 + d[2] % 4),
        "height": 8 * (1 + d[3] % 3),
        "has_audio": d[4] % 2 == 1,
        "fourcc": _MP4_FOURCCS[d[5] % 2],
        "n_frames": 1 + d[6] % 3,
    }


def _mp4_payload(key: str) -> bytes:
    from clickhousedatamocker_spark.operators.bmff import RAW_VIDEO_FRAME_BYTES, encode_mp4

    p = _mp4_params(key)
    frame_bytes = RAW_VIDEO_FRAME_BYTES[p["fourcc"]](p["width"], p["height"])
    frames = [
        _sha_stream(key, frame_bytes, salt=f":mp4f{i}") for i in range(p["n_frames"])
    ]
    tracks = [
        {"handler": "vide", "fourcc": p["fourcc"], "width": p["width"], "height": p["height"]}
    ]
    if p["has_audio"]:
        tracks.append({"handler": "soun", "fourcc": "mp4a", "sample_rate": 48000})
    return encode_mp4(600, p["duration"], tracks, frames=frames)


def attach_fake_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic synthetic media column keyed on ``id_col``: the mime is
    hash-assigned (xxhash64 of the key, JVM-side), and the payload is a
    VALID instance of that mime built by the matching per-mime encoder —
    every row survives a real ``decode_media``. Arrow-batched mapInPandas,
    narrow, no driver materialization of binary."""
    key = F.col(id_col).cast("string")
    mime = F.element_at(
        F.array(*[F.lit(m) for m in _MIMES]), (F.pmod(F.xxhash64(key), F.lit(4)) + 1).cast("int")
    )
    keyed = df.withColumn("__media_key", key).withColumn("__media_mime", mime)
    out_schema = T.StructType(df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, False)])

    repo_root = _REPO_ROOT  # captured by value — see module comment

    def synth(batches: Iterator) -> Iterator:
        import sys

        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        from clickhousedatamocker_spark.operators.multimodal import (
            _jpeg_payload,
            _mp4_payload,
            _png_payload,
            _wav_payload,
        )

        builders = {
            "image/png": _png_payload,
            "image/jpeg": _jpeg_payload,
            "audio/wav": _wav_payload,
            "video/mp4": _mp4_payload,
        }
        for pdf in batches:
            media = []
            for key, mime in zip(pdf["__media_key"], pdf["__media_mime"]):
                data = builders[mime](key)
                media.append(
                    {
                        "uri": f"synth://media/{key}",
                        "mime": mime,
                        "n_bytes": len(data),
                        "data": data,
                    }
                )
            pdf = pdf.drop(columns=["__media_key", "__media_mime"]).copy()
            pdf["media"] = media
            yield pdf

    return keyed.mapInPandas(synth, out_schema)


def attach_synth_png(df: DataFrame, id_col: str, size: int = 8) -> DataFrame:
    """Deterministic REAL PNG payloads keyed on ``id_col``: a size x size
    RGB image whose pixels derive from sha256 of the id, encoded with the
    vendored spec-conformant codec (operators/png.py). Arrow-batched
    mapInPandas — narrow, no driver materialization of binary."""
    return _attach_synth(df, id_col, "image/png", "png", "_png_payload", {"size": size})


def _attach_synth(
    df: DataFrame, id_col: str, mime: str, tag: str, builder_name: str, kwargs: dict
) -> DataFrame:
    """Shared mapInPandas harness for the per-mime synth encoders: attach a
    valid ``mime`` payload built by the named module-level builder."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, False)])
    repo_root = _REPO_ROOT  # captured by value — see module comment

    def synth(batches: Iterator) -> Iterator:
        import sys

        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        from clickhousedatamocker_spark.operators import multimodal as mm

        builder = getattr(mm, builder_name)
        for pdf in batches:
            media = []
            for key in pdf[id_col].astype(str):
                data = builder(key, **kwargs)
                media.append(
                    {
                        "uri": f"synth://{tag}/{key}",
                        "mime": mime,
                        "n_bytes": len(data),
                        "data": data,
                    }
                )
            pdf = pdf.copy()
            pdf["media"] = media
            yield pdf

    return df.mapInPandas(synth, out_schema)


def attach_synth_jpeg(df: DataFrame, id_col: str, size: int = 16) -> DataFrame:
    """Deterministic REAL JPEG payloads keyed on ``id_col``: a size x size
    grayscale image of constant 8x8 blocks whose values derive from sha256
    of the id, encoded with the vendored baseline codec (operators/jpeg.py,
    all-ones quant tables). Constant blocks are DC-only, so the lossy format
    round-trips these payloads EXACTLY — pixel_sum is predictable by an
    independent engine from the sha256 source alone. Arrow-batched
    mapInPandas — narrow, no driver materialization of binary."""
    if size % 8:
        raise ValueError("size must be a multiple of 8")
    return _attach_synth(df, id_col, "image/jpeg", "jpg", "_jpeg_payload", {"size": size})


def attach_synth_mp4(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL MP4 containers keyed on ``id_col``: duration,
    dimensions, codec fourcc, and audio-track presence each read one byte of
    sha256(key || ':mp4') (see ``_mp4_params``), encoded as a structurally
    valid ISO-BMFF box tree by the vendored codec (operators/bmff.py). An
    independent engine re-derives the parsed metadata from the digest alone.
    Arrow-batched mapInPandas, narrow."""
    return _attach_synth(df, id_col, "video/mp4", "mp4", "_mp4_payload", {})


def decode_media(df: DataFrame) -> DataFrame:
    """Decode payloads to (width, height, n_channels, pixel_sum).

    ``image/png`` payloads are REALLY decoded — vendored pure-stdlib codec
    (operators/png.py): signature + per-chunk CRC validation, zlib
    inflate, scanline unfiltering. ``image/jpeg`` payloads too — vendored
    baseline-DCT codec (operators/jpeg.py: marker parse, canonical Huffman,
    dequant, IDCT). ``pixel_sum`` is the sum of decoded pixel bytes (a
    value only a correct decode can produce). ``video/mp4`` payloads go
    through the vendored ISO-BMFF parser (operators/bmff.py): width/height
    come from the video track, ``n_channels`` carries the track count, and
    ``pixel_sum`` is the SUM OF DECODED FRAME BYTES for uncompressed
    sample formats ('raw ' RGB24 / I420 — the real stsc/stsz/stco demux
    walk, bmff.decode_frames), falling back to the movie duration in
    timescale units for compressed bitstreams (avc1/...: frame decode
    needs ffmpeg, absent here) and audio-only containers. ``audio/wav``
    routes through the stdlib
    ``wave`` parser (width = n_samples, height = sample_rate, pixel_sum =
    unsigned byte sum of the PCM payload; ``decode_audio`` gives the typed
    audio view). Unknown mimes raise a clearly-marked NotImplementedError.
    """
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("n_channels", T.IntegerType(), True),
            T.StructField("pixel_sum", T.LongType(), True),
        ]
    )

    repo_root = _REPO_ROOT  # captured by value — see module comment

    def decode(batches: Iterator) -> Iterator:
        import io
        import sys
        import wave

        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        from clickhousedatamocker_spark.operators.bmff import decode_frames, parse_mp4
        from clickhousedatamocker_spark.operators.jpeg import decode_jpeg
        from clickhousedatamocker_spark.operators.png import decode_png

        for pdf in batches:
            ws, hs, cs, sums = [], [], [], []
            for m in pdf["media"]:
                mime, data = m["mime"], m["data"]
                if mime == "image/png":
                    w, h, c, px = decode_png(bytes(data))
                    ws.append(w), hs.append(h), cs.append(c), sums.append(sum(px))
                elif mime == "image/jpeg":
                    w, h, c, px = decode_jpeg(bytes(data))
                    ws.append(w), hs.append(h), cs.append(c), sums.append(sum(px))
                elif mime == "video/mp4":
                    meta = parse_mp4(bytes(data))
                    vid = next(
                        (tr for tr in meta["tracks"] if tr["handler"] == "vide"),
                        {"width": 0, "height": 0},
                    )
                    ws.append(vid["width"]), hs.append(vid["height"])
                    cs.append(meta["n_tracks"])
                    # pixel truth where the samples are decodable: sum of
                    # decoded frame bytes, like the image paths. Compressed
                    # bitstreams (avc1/...) fall back to the container
                    # duration — the pre-frame-decode behavior, documented.
                    # (Audio-only containers have no frames to decode;
                    # corrupt sample tables still raise ValueError.)
                    if any(tr["handler"] == "vide" for tr in meta["tracks"]):
                        try:
                            fr = decode_frames(bytes(data))
                            sums.append(sum(sum(f) for f in fr["frames"]))
                        except NotImplementedError:
                            sums.append(meta["duration"])
                    else:
                        sums.append(meta["duration"])
                elif mime == "audio/wav":
                    with wave.open(io.BytesIO(bytes(data))) as w:
                        frames = w.readframes(w.getnframes())
                        ws.append(w.getnframes()), hs.append(w.getframerate())
                        cs.append(w.getnchannels()), sums.append(sum(frames))
                else:
                    raise NotImplementedError(
                        f"no codec for {mime!r} in this environment (PIL/ffmpeg "
                        "not installed)"
                    )
            pdf = pdf.copy()
            pdf["width"] = ws
            pdf["height"] = hs
            pdf["n_channels"] = cs
            pdf["pixel_sum"] = sums
            yield pdf

    return df.mapInPandas(decode, out_schema)


def attach_synth_wav(
    df: DataFrame, id_col: str, n_samples: int = 96, sample_rate: int = 8000
) -> DataFrame:
    """Deterministic REAL WAV payloads keyed on ``id_col``: mono 16-bit PCM
    whose samples derive from sha256 of the id, framed by the stdlib
    ``wave`` module (RIFF/WAVE is a public format; the module is pure
    stdlib — no PIL/ffmpeg needed). Arrow-batched mapInPandas, narrow."""
    return _attach_synth(
        df,
        id_col,
        "audio/wav",
        "wav",
        "_wav_payload",
        {"n_samples": n_samples, "sample_rate": sample_rate},
    )


def decode_audio(df: DataFrame) -> DataFrame:
    """Decode ``audio/wav`` payloads to (sample_rate, n_audio_samples,
    n_audio_channels, sample_sum) with the stdlib ``wave`` reader —
    ``sample_sum`` is the sum of signed 16-bit samples, a value only a
    correct RIFF parse + PCM interpretation produces. Non-WAV mimes raise
    the same clearly-marked NotImplementedError as decode_media."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_audio_samples", T.IntegerType(), True),
            T.StructField("n_audio_channels", T.IntegerType(), True),
            T.StructField("sample_sum", T.LongType(), True),
        ]
    )

    def decode(batches: Iterator) -> Iterator:
        import io
        import struct
        import wave

        for pdf in batches:
            rates, ns, cs, sums = [], [], [], []
            for m in pdf["media"]:
                mime, data = m["mime"], m["data"]
                if mime != "audio/wav":
                    raise NotImplementedError(
                        f"no codec for {mime!r} in this environment (ffmpeg "
                        "not installed)"
                    )
                with wave.open(io.BytesIO(bytes(data))) as w:
                    if w.getsampwidth() != 2:
                        raise ValueError("only 16-bit PCM supported")
                    frames = w.readframes(w.getnframes())
                    n = w.getnframes() * w.getnchannels()
                    samples = struct.unpack(f"<{n}h", frames)
                    rates.append(w.getframerate())
                    ns.append(w.getnframes())
                    cs.append(w.getnchannels())
                    sums.append(sum(samples))
            pdf = pdf.copy()
            pdf["sample_rate"] = rates
            pdf["n_audio_samples"] = ns
            pdf["n_audio_channels"] = cs
            pdf["sample_sum"] = sums
            yield pdf

    return df.mapInPandas(decode, out_schema)


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Fixed-dim float feature vector per media payload via Arrow-batched
    mapInPandas (numpy over the raw bytes — the real plumbing a learned
    encoder would use; the 'model' is a byte-histogram projection)."""
    import numpy as np  # noqa: F401 (imported on executors)

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()), True)]
    )

    def featurize(batches: Iterator) -> Iterator:
        import numpy as np

        for pdf in batches:
            feats = []
            for m in pdf["media"]:
                arr = np.frombuffer(m["data"], dtype=np.uint8).astype(np.float32)
                # deterministic projection: strided byte means, L2-normalized
                chunks = np.array_split(arr, dim)
                v = np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32)
                norm = float(np.linalg.norm(v)) or 1.0
                feats.append((v / norm).tolist())
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(featurize, out_schema)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """REALLY resize image payloads to (width, height) with nearest-neighbor
    resampling through the vendored codecs: PNG decodes (CRC-checked),
    resamples, and re-encodes losslessly; grayscale baseline JPEG decodes,
    resamples, and re-encodes through the same quant tables. Non-image
    mimes raise NotImplementedError (resampling audio/video needs DSP/
    ffmpeg, absent here). Arrow-batched mapInPandas, narrow.
    """
    repo_root = _REPO_ROOT  # captured by value — see module comment

    def do_resize(batches: Iterator) -> Iterator:
        import sys

        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        import numpy as np

        from clickhousedatamocker_spark.operators.jpeg import decode_jpeg, encode_jpeg
        from clickhousedatamocker_spark.operators.png import decode_png, encode_png

        # nearest-neighbor index maps are shared across rows of equal dims
        def nn(px: bytes, w0: int, h0: int, c: int) -> bytes:
            arr = np.frombuffer(px, dtype=np.uint8).reshape(h0, w0, c)
            ys = (np.arange(height) * h0) // height
            xs = (np.arange(width) * w0) // width
            return arr[ys][:, xs].tobytes()

        png_color_type = {1: 0, 2: 4, 3: 2, 4: 6}
        for pdf in batches:
            pdf = pdf.copy()
            out = []
            for m in pdf["media"]:
                data = bytes(m["data"])
                if m["mime"] == "image/png":
                    w0, h0, c, px = decode_png(data)
                    resized = encode_png(width, height, nn(px, w0, h0, c), png_color_type[c])
                elif m["mime"] == "image/jpeg":
                    w0, h0, c, px = decode_jpeg(data)
                    if c != 1:
                        raise NotImplementedError("jpeg resize supports grayscale only")
                    resized = encode_jpeg(width, height, nn(px, w0, h0, 1), 1)
                else:
                    raise NotImplementedError(
                        f"resize supports image payloads only, got {m['mime']!r}"
                    )
                out.append(
                    {
                        "uri": m["uri"],
                        "mime": m["mime"],
                        "n_bytes": len(resized),
                        "data": resized,
                    }
                )
            pdf["media"] = out
            yield pdf

    return df.mapInPandas(do_resize, df.schema)


def sample_frames(df: DataFrame, every_n_bytes: int = 32) -> DataFrame:
    """'Frame sampling' over video payloads: one row per sampled offset —
    the explode-shaped UDTF a real video pipeline needs (ffmpeg STUBBED;
    offsets/byte windows are real)."""
    out_schema = T.StructType(
        [
            df.schema["media"],
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame_offset", T.LongType(), False),
            T.StructField("frame_bytes", T.BinaryType(), False),
        ]
    )

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for m in pdf["media"]:
                if not m["mime"].startswith("video/"):
                    continue
                data = m["data"]
                for i, off in enumerate(range(0, len(data), every_n_bytes)):
                    rows.append(
                        {
                            "media": m,
                            "frame_no": i,
                            "frame_offset": off,
                            "frame_bytes": data[off : off + every_n_bytes],
                        }
                    )
            yield pd.DataFrame(rows, columns=["media", "frame_no", "frame_offset", "frame_bytes"])

    return df.select("media").mapInPandas(sample, out_schema)
