"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas stages.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``decode_image``) — but everything Spark-side is
real and tested: the binary column contract, metadata extraction
(JVM expressions), deterministic byte-level feature extraction and
frame sampling via ``mapInPandas`` (Arrow batches, vectorized numpy —
the exact shape a real decoder plugs into).

Scale notes: mapInPandas streams Arrow record batches — constant
memory per partition, no row-at-a-time pickling; binary payloads stay
in Arrow buffers end to end. Partition sizing (bytes per input split)
is the knob that matters at 100 TB, not row count.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

#: deterministic fake modality per doc (no real media in the testdata)
MODALITIES = ["image/png", "audio/wav", "video/mp4"]


def to_blob_table(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Build the canonical multimodal table shape from any source:
    (id, payload binary, typed metadata struct). Payload here is the
    utf-8 bytes of the text (a deterministic stand-in for real media)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("byte_length"),
            F.md5(F.col(text_col)).alias("checksum"),
            # pmod, not %: Spark's % keeps the dividend's sign, so a
            # negative id would index element_at at 0/-1 — an ANSI
            # error for 0 and the wrong element for -1
            F.element_at(
                F.array(*[F.lit(m) for m in MODALITIES]),
                (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
            ).alias("mime"),
        ).alias("meta"),
    )


def decode_image(payload_col: Column) -> Column:
    """STUB — image decoding needs a codec library not present in this
    environment. The contract: binary -> struct(width, height, channels,
    pixels array<tinyint>). Wire a Pillow/libvips pandas UDF here on a
    real cluster."""
    raise NotImplementedError(
        "image decode requires a codec library (Pillow/libvips); "
        "not available in this environment — byte-level features below "
        "exercise the same plumbing"
    )


def byte_histogram_features(df: DataFrame, payload_col: str = "payload",
                            id_col: str = "doc_id",
                            bins: int = 16) -> DataFrame:
    """Deterministic per-blob feature extraction: normalized
    ``bins``-bucket histogram over byte values — a real vectorized
    computation standing in for embed/feature-extract, via
    Arrow-batched mapInPandas.

    Output is the exploded long format ``(id, bin, value)`` rather than
    an array column: join-friendly, and array-typed outputs don't
    survive engine-portable row comparison. The whole Arrow batch is
    histogrammed with ONE bincount over a concatenated buffer (segment
    ids spread each blob's bytes into its own bins x doc slot) — no
    per-blob Python loop. ``value`` is an exact IEEE division of two
    ints, so any engine recomputing it matches bit-for-bit."""
    import numpy as np
    import pandas as pd  # noqa: F811

    width = 256 // bins

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            if ids.size == 0:
                yield pd.DataFrame(
                    {id_col: ids, "bin": ids.astype("int32"), "value": ids.astype("float64")}
                )
                continue
            blobs = [bytes(b) for b in pdf[payload_col]]
            lens = np.fromiter((len(b) for b in blobs), dtype=np.int64,
                               count=len(blobs))
            buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            seg = np.repeat(np.arange(len(blobs)), lens)
            flat = np.bincount(
                seg * bins + (buf // width), minlength=len(blobs) * bins
            ) if buf.size else np.zeros(len(blobs) * bins, dtype=np.int64)
            vals = flat.reshape(len(blobs), bins) / np.maximum(lens, 1)[:, None]
            yield pd.DataFrame({
                id_col: np.repeat(ids, bins),
                "bin": np.tile(np.arange(bins, dtype=np.int32), len(ids)),
                "value": vals.ravel(),
            })

    return df.select(id_col, payload_col).mapInPandas(
        extract, schema=f"{id_col} long, bin int, value double"
    )


def fake_decode_resize(df: DataFrame, payload_col: str = "payload",
                       id_col: str = "doc_id", src_h: int = 16,
                       out_h: int = 8, out_w: int = 8) -> DataFrame:
    """DETERMINISTIC-FAKE decode + REAL resize: the decode step (no
    codec libs in this environment) interprets the blob as a
    ``src_h`` × ``max(1, len//src_h)`` uint8 image (zero-padded when
    short); the resize is a genuine vectorized nearest-neighbor
    downsample to (out_h, out_w) — the exact mapInPandas plumbing a
    Pillow/libvips decode drops into, with the same output contract
    ``(id, y, x, pixel)``.

    Whole Arrow batch vectorized: one fancy-indexed gather over the
    concatenated byte buffer (per-blob widths broadcast into the index
    matrix) — no per-blob Python loop."""
    import numpy as np
    import pandas as pd  # noqa: F811

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            n = len(ids)
            if n == 0:
                empty = np.array([], dtype="int64")
                yield pd.DataFrame({id_col: empty, "y": empty.astype("int32"),
                                    "x": empty.astype("int32"),
                                    "pixel": empty.astype("int32")})
                continue
            blobs = [bytes(b) for b in pdf[payload_col]]
            lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=n)
            offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
            buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            w = np.maximum(lens // src_h, 1)                      # (n,)
            y_src = (np.arange(out_h) * src_h) // out_h           # (out_h,)
            x_src = (np.arange(out_w)[None, :] * w[:, None]) // out_w  # (n, out_w)
            idx = (
                offs[:, None, None]
                + y_src[None, :, None] * w[:, None, None]
                + x_src[:, None, :]
            )                                                     # (n, out_h, out_w)
            rel = idx - offs[:, None, None]
            valid = rel < lens[:, None, None]
            if buf.size:
                px = np.where(valid, buf[np.minimum(idx, buf.size - 1)], 0)
            else:  # batch of empty blobs only
                px = np.zeros_like(idx)
            yield pd.DataFrame({
                id_col: np.repeat(ids, out_h * out_w),
                "y": np.tile(np.repeat(np.arange(out_h, dtype=np.int32), out_w), n),
                "x": np.tile(np.arange(out_w, dtype=np.int32), n * out_h),
                "pixel": px.reshape(-1).astype(np.int32),
            })

    return df.select(id_col, payload_col).mapInPandas(
        resize, schema=f"{id_col} long, y int, x int, pixel int"
    )


def frame_sample(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id", n_frames: int = 4) -> DataFrame:
    """Sample ``n_frames`` evenly spaced fixed-width chunks from each
    blob (the video-frame-sampling shape: binary -> array of binary
    frames + frame index), via mapInPandas."""
    import pandas as pd  # noqa: F811

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out_id, out_idx, out_frame = [], [], []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(blob)
                if not raw:
                    continue
                stride = max(len(raw) // n_frames, 1)
                for j in range(min(n_frames, len(raw))):
                    out_id.append(i)
                    out_idx.append(j)
                    out_frame.append(raw[j * stride: j * stride + stride])
            yield pd.DataFrame(
                {id_col: out_id, "frame_idx": out_idx, "frame": out_frame}
            )

    return df.select(id_col, payload_col).mapInPandas(
        sample, schema=f"{id_col} long, frame_idx int, frame binary"
    )
