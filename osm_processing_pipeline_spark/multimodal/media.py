"""Multimodal columns: opaque binary media with typed metadata.

Image/audio/video payloads are ``binary`` columns + a typed metadata struct;
decode / feature-extract / resize run as Arrow-batched kernels over
``mapInPandas``.  The actual codec libraries (PIL/ffmpeg/librosa) are NOT in
this container, so the codec step is STUBBED: ``_decode_real`` raises
NotImplementedError unless the library import succeeds, and tests exercise
the deterministic fake-codec path.  The Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested.

Fake image format (deterministic): 8-byte header = width:int32 LE,
height:int32 LE, followed by width*height uint8 pixels generated from the
media_ref hash.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - PIL is absent in this container by design
    from PIL import Image  # type: ignore
    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _ref_seed(ref: str) -> int:
    return int.from_bytes(hashlib.md5(ref.encode()).digest()[:4], "little")


def synthesize_payload(ref: str) -> bytes:
    """Deterministic fake image for a media_ref: 8-byte header + pixels."""
    seed = _ref_seed(ref)
    w = 8 + seed % 9          # 8..16
    h = 8 + (seed // 16) % 9
    idx = np.arange(w * h, dtype=np.uint32)
    px = ((idx * 2654435761 + seed) >> 8).astype(np.uint8)
    return (np.int32(w).tobytes() + np.int32(h).tobytes() + px.tobytes())


def media_table(docs_with_media: DataFrame) -> DataFrame:
    """documents -> media rows (doc_id, media_ref, payload, meta struct).
    Payload synthesis is Arrow-batched (stands in for an object-store fetch)."""
    refs = docs_with_media.select(
        "doc_id", F.explode("media_refs").alias("media_ref"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = [synthesize_payload(r) for r in pdf["media_ref"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "payload": payloads,
                "format": ["fake-img"] * len(pdf),
            })

    return refs.mapInPandas(
        gen, schema="doc_id string, media_ref string, payload binary, format string")


def _decode_real(payload: bytes):  # pragma: no cover
    """Real codec path — requires PIL, absent here by design."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "use the fake-img path (format='fake-img')")
    return Image.open(payload)


def decode_fake(payload: bytes) -> tuple[int, int, np.ndarray]:
    w = int(np.frombuffer(payload[:4], "<i4")[0])
    h = int(np.frombuffer(payload[4:8], "<i4")[0])
    px = np.frombuffer(payload[8:8 + w * h], np.uint8).reshape(h, w)
    return w, h, px


def image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract: (doc_id, media_ref, width, height,
    mean_px_milli, px_checksum) — vectorized over Arrow batches."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, ref, payload, fmt in zip(
                    pdf["doc_id"], pdf["media_ref"], pdf["payload"], pdf["format"]):
                if fmt != "fake-img":
                    _decode_real(payload)  # raises NotImplementedError
                w, h, px = decode_fake(payload)
                rows.append((doc_id, ref, w, h,
                             int(px.astype(np.int64).sum() * 1000) // (w * h),
                             int(px.astype(np.int64).sum())))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "media_ref", "width", "height",
                "mean_px_milli", "px_checksum"])

    return media.mapInPandas(
        kernel, schema=("doc_id string, media_ref string, width int, "
                        "height int, mean_px_milli long, px_checksum long"))


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize plumbing (nearest-neighbor on the fake codec; real codecs would
    slot into the same kernel).  Output schema mirrors the input media table."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for doc_id, ref, payload in zip(
                    pdf["doc_id"], pdf["media_ref"], pdf["payload"]):
                w, h, px = decode_fake(payload)
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                rp = px[yi][:, xi]
                blob = (np.int32(out_w).tobytes() + np.int32(out_h).tobytes()
                        + rp.tobytes())
                out.append((doc_id, ref, blob, "fake-img"))
            yield pd.DataFrame(out, columns=["doc_id", "media_ref",
                                             "payload", "format"])

    return media.mapInPandas(
        kernel, schema="doc_id string, media_ref string, payload binary, format string")
