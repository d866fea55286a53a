"""Multimodal (image/audio/video) column operators.

Media is carried as opaque ``binary`` columns with typed metadata
(the ``pages`` table's input_hint shape: bytes/w/h/fmt). All operators
are Arrow-batched ``mapInPandas`` — the schema, partitioning, UDF
signature and batch shape are real and tested; only *external* codec
support is stubbed (this container ships no PIL/ffmpeg — SURVEY §7.0):
the engine's own formats (raw/png/qjpg, codecs.py) decode for real,
anything else raises a clearly-marked NotImplementedError.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from dnscrawler_spark import codecs

EXTERNAL_FMTS = {"jpeg", "jpg", "webp", "gif", "mp4", "wav"}

META_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("dec_w", T.IntegerType(), True),
        T.StructField("dec_h", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def _decode(blob: bytes, fmt: str) -> np.ndarray:
    if fmt in EXTERNAL_FMTS:
        # STUB: external codecs are not available in this container.
        raise NotImplementedError(f"external codec {fmt!r} not available offline")
    arr, _ = codecs.decode(blob)
    return arr


def decode_features(pages: DataFrame) -> DataFrame:
    """Decode + feature-extract: dimensions, channels, mean luma.
    One Arrow batch in, one out; rows with undecodable formats survive
    with decode_ok=false (never a task failure)."""

    def run(batches):
        for pdf in batches:
            out = {k: [] for k in ("image_id", "fmt", "dec_w", "dec_h", "channels", "mean_luma", "decode_ok")}
            for blob, fmt, iid in zip(pdf["bytes"], pdf["fmt"], pdf["image_id"]):
                out["image_id"].append(iid)
                out["fmt"].append(fmt)
                try:
                    arr = _decode(bytes(blob), fmt)
                    h, w, c = arr.shape
                    out["dec_w"].append(w)
                    out["dec_h"].append(h)
                    out["channels"].append(c)
                    out["mean_luma"].append(float(arr.mean()))
                    out["decode_ok"].append(True)
                except NotImplementedError:
                    out["dec_w"].append(None)
                    out["dec_h"].append(None)
                    out["channels"].append(None)
                    out["mean_luma"].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return pages.select("image_id", "bytes", "fmt").mapInPandas(run, META_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), False),
    ]
)


def resize(pages: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbor resize re-encoded in the source format.
    Vectorized numpy index math per image; undecodable fmt → null."""

    def run(batches):
        for pdf in batches:
            rows = []
            for blob, fmt, iid in zip(pdf["bytes"], pdf["fmt"], pdf["image_id"]):
                try:
                    arr = _decode(bytes(blob), fmt)
                except NotImplementedError:
                    rows.append((iid, None, None, None, fmt))
                    continue
                h, w, _ = arr.shape
                yi = (np.arange(target_h) * h // target_h).clip(0, h - 1)
                xi = (np.arange(target_w) * w // target_w).clip(0, w - 1)
                small = arr[yi][:, xi]
                rows.append((iid, codecs.encode(small, fmt), target_w, target_h, fmt))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])

    return pages.select("image_id", "bytes", "fmt").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("row_luma", T.DoubleType(), False),
    ]
)


def frame_sample(pages: DataFrame, every: int = 4) -> DataFrame:
    """Frame-sampling plumbing demo: treat each image row-block as a
    'frame' and emit every Nth — the exact batch-explode shape a video
    frame sampler needs (one input row → many output rows), with the
    decode swap-in point marked."""

    def run(batches):
        for pdf in batches:
            ids, idxs, lumas = [], [], []
            for blob, fmt, iid in zip(pdf["bytes"], pdf["fmt"], pdf["image_id"]):
                try:
                    arr = _decode(bytes(blob), fmt)
                except NotImplementedError:
                    continue
                for fi in range(0, arr.shape[0], every):
                    ids.append(iid)
                    idxs.append(fi)
                    lumas.append(float(arr[fi].mean()))
            yield pd.DataFrame({"image_id": ids, "frame_idx": idxs, "row_luma": lumas})

    return pages.select("image_id", "bytes", "fmt").mapInPandas(run, FRAME_SCHEMA)
