"""Multimodal column support (SURVEY §2.4 Tier B).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; per-item compute (decode, feature extraction, resize,
frame sampling) runs as Arrow-batched ``mapInPandas`` — the Spark-side
plumbing (schema, partitioning, UDF signatures, batch shapes) is real and
tested, while the codec step itself is STUBBED: the image/audio libraries
are not in this container, so ``decode=...`` either raises a clearly-marked
NotImplementedError or substitutes a deterministic fake payload.

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


def attach_fake_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic synthetic media column keyed on ``id_col`` — payload
    bytes derive from sha2 of the id (pure column exprs, no Python)."""
    key = F.col(id_col).cast("string")
    payload = F.to_binary(
        F.concat(*[F.sha2(F.concat(key, F.lit(f":{i}")), 256) for i in range(4)]), F.lit("hex")
    )
    mime = F.element_at(
        F.array(*[F.lit(m) for m in _MIMES]), (F.pmod(F.xxhash64(key), F.lit(4)) + 1).cast("int")
    )
    return df.withColumn(
        "media",
        F.struct(
            F.concat(F.lit("synth://media/"), key).alias("uri"),
            mime.alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            payload.alias("data"),
        ),
    )


def attach_synth_png(df: DataFrame, id_col: str, size: int = 8) -> DataFrame:
    """Deterministic REAL PNG payloads keyed on ``id_col``: a size x size
    RGB image whose pixels derive from sha256 of the id, encoded with the
    vendored spec-conformant codec (operators/png.py). Arrow-batched
    mapInPandas — narrow, no driver materialization of binary."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, False)])

    repo_root = _REPO_ROOT  # captured by value — see module comment

    def synth(batches: Iterator) -> Iterator:
        import hashlib
        import sys

        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        from clickhousedatamocker_spark.operators.png import encode_png

        n_px = size * size * 3
        for pdf in batches:
            media = []
            for key in pdf[id_col].astype(str):
                px = bytearray()
                i = 0
                while len(px) < n_px:
                    px.extend(hashlib.sha256(f"{key}:{i}".encode()).digest())
                    i += 1
                data = encode_png(size, size, bytes(px[:n_px]), color_type=2)
                media.append(
                    {
                        "uri": f"synth://png/{key}",
                        "mime": "image/png",
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
    out_schema = T.StructType(df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, False)])
    repo_root = _REPO_ROOT  # captured by value — see module comment

    def synth(batches: Iterator) -> Iterator:
        import hashlib
        import sys

        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        import numpy as np

        from clickhousedatamocker_spark.operators.jpeg import encode_jpeg

        nb = size // 8
        for pdf in batches:
            media = []
            for key in pdf[id_col].astype(str):
                vals = hashlib.sha256(f"{key}:jpg".encode()).digest()[: nb * nb]
                px = np.zeros((size, size), dtype=np.uint8)
                for k in range(nb * nb):
                    by, bx = divmod(k, nb)
                    px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = vals[k]
                data = encode_jpeg(size, size, px.tobytes(), 1)
                media.append(
                    {
                        "uri": f"synth://jpg/{key}",
                        "mime": "image/jpeg",
                        "n_bytes": len(data),
                        "data": data,
                    }
                )
            pdf = pdf.copy()
            pdf["media"] = media
            yield pdf

    return df.mapInPandas(synth, out_schema)


def decode_media(df: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """Decode payloads to (width, height, n_channels, pixel_sum).

    ``image/png`` payloads are REALLY decoded — vendored pure-stdlib codec
    (operators/png.py): signature + per-chunk CRC validation, zlib
    inflate, scanline unfiltering. ``image/jpeg`` payloads are REALLY
    decoded too — vendored baseline-DCT codec (operators/jpeg.py: marker
    parse, canonical Huffman, dequant, IDCT). ``pixel_sum`` is the sum of
    decoded pixel bytes (a value only a correct decode can produce).
    Remaining formats (video) need ffmpeg, which is NOT in this container:
    they raise a clearly-marked NotImplementedError unless
    ``deterministic_fake=True`` substitutes header-derived dimensions
    (pixel_sum NULL).
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
        import sys

        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        from clickhousedatamocker_spark.operators.jpeg import decode_jpeg
        from clickhousedatamocker_spark.operators.png import decode_png

        for pdf in batches:
            ws, hs, cs, sums = [], [], [], []
            for m in pdf["media"]:
                mime, data = m["mime"], m["data"]
                if mime == "image/png" and not deterministic_fake:
                    w, h, c, px = decode_png(bytes(data))
                    ws.append(w), hs.append(h), cs.append(c), sums.append(sum(px))
                elif mime == "image/jpeg" and not deterministic_fake:
                    w, h, c, px = decode_jpeg(bytes(data))
                    ws.append(w), hs.append(h), cs.append(c), sums.append(sum(px))
                elif deterministic_fake:
                    ws.append(64 + data[0] % 192)
                    hs.append(64 + data[1] % 192)
                    cs.append(1 + data[2] % 4)
                    sums.append(None)
                else:
                    raise NotImplementedError(
                        f"no codec for {mime!r} in this environment (PIL/ffmpeg "
                        "not installed); pass deterministic_fake=True to "
                        "exercise the pipeline with header-derived dimensions"
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
    out_schema = T.StructType(df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, False)])

    def synth(batches: Iterator) -> Iterator:
        import hashlib
        import io
        import wave

        n_bytes = n_samples * 2  # 16-bit mono
        for pdf in batches:
            media = []
            for key in pdf[id_col].astype(str):
                raw = bytearray()
                i = 0
                while len(raw) < n_bytes:
                    raw.extend(hashlib.sha256(f"{key}:{i}".encode()).digest())
                    i += 1
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sample_rate)
                    w.writeframes(bytes(raw[:n_bytes]))
                data = buf.getvalue()
                media.append(
                    {
                        "uri": f"synth://wav/{key}",
                        "mime": "audio/wav",
                        "n_bytes": len(data),
                        "data": data,
                    }
                )
            pdf = pdf.copy()
            pdf["media"] = media
            yield pdf

    return df.mapInPandas(synth, out_schema)


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


def resize_media(
    df: DataFrame, width: int, height: int, deterministic_fake: bool = False
) -> DataFrame:
    """Resize image payloads to (width, height).

    Real resizing needs PIL — NOT in this container, so the default path
    raises NotImplementedError. ``deterministic_fake=True`` replaces the
    payload with a size-proportional deterministic slice (|bytes| scaled by
    the pixel ratio vs the fake-decoded dims), keeping schema/batch plumbing
    — including the media struct rewrite — exercised end-to-end.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "image codecs (PIL) are not installed in this environment; pass "
            "deterministic_fake=True to exercise the pipeline"
        )

    def do_resize(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            out = []
            for m in pdf["media"]:
                data = m["data"]
                w0, h0 = 64 + data[0] % 192, 64 + data[1] % 192  # fake-decode dims
                ratio = (width * height) / float(w0 * h0)
                n = max(1, min(len(data), int(len(data) * ratio)))
                resized = (data * (n // len(data) + 1))[:n]
                out.append(
                    {
                        "uri": m["uri"],
                        "mime": m["mime"],
                        "n_bytes": n,
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
