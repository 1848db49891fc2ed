"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with
a ``media_type`` tag. The Spark-side plumbing — schema, Arrow batch
shape, partition-preserving mapInPandas, deterministic outputs — is
real and tested; the actual codec step is STUBBED because the image /
audio libraries are not in this container:

- if PIL / soundfile were importable, ``_decode_real`` would run;
- otherwise each payload gets deterministic fake features derived from
  its bytes (never random), and ``decode_status`` says 'stubbed'.

This keeps the operator contract stable: swapping the stub for a real
codec changes only the inside of the batch function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURE_SCHEMA = (
    "doc_id string, media_type string, n_bytes long, content_md5 string, "
    "width int, height int, n_frames int, decode_status string"
)

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _decode_real(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """Real codec probe (only reachable when PIL imports)."""
    if _HAVE_PIL and media_type == "image":
        import io

        with Image.open(io.BytesIO(payload)) as im:
            n_frames = getattr(im, "n_frames", 1)
            return im.width, im.height, int(n_frames)
    raise NotImplementedError(
        "real codecs unavailable in this environment; stubbed features used"
    )


def _resize_real(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Real resize (only reachable when PIL imports): decode, resize,
    re-encode PNG. The stub swap is exactly this one function body."""
    if _HAVE_PIL:
        import io

        with Image.open(io.BytesIO(payload)) as im:
            buf = io.BytesIO()
            im.resize((out_w, out_h)).save(buf, format="PNG")
            return buf.getvalue()
    raise NotImplementedError(
        "real codecs unavailable in this environment; stubbed payload used"
    )


def _fake_features(digest: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in features derived from the payload's md5
    DIGEST (computed once by the caller, which also reports it as
    content_md5 — large payloads must not be hashed twice per row).

    md5-derived (not sha1) so the DuckDB contract oracle can reproduce
    them: width/height/frames come from the first hex chars of the
    digest, i.e. substr(md5(payload), ...) in any engine with md5.
    """
    width = 16 + (int.from_bytes(digest[0:2], "big") % 2544)
    height = 16 + (int.from_bytes(digest[2:4], "big") % 1424)
    frames = 1 + digest[4] % 120
    return width, height, frames


def extract_media_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    media_type_col: str = "media_type",
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Input partitioning is preserved (narrow transformation); each Arrow
    batch is processed vectorized-per-batch with one Python hop.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload, mtype in zip(
                pdf[id_col], pdf[payload_col], pdf[media_type_col]
            ):
                data = bytes(payload) if payload is not None else b""
                md5 = hashlib.md5(data)
                if _HAVE_PIL and mtype == "image":
                    try:
                        w, h, fr = _decode_real(data, mtype)
                        status = "decoded"
                    except Exception:  # undecodable payload -> stub features
                        w, h, fr = _fake_features(md5.digest())
                        status = "stubbed"
                else:
                    w, h, fr = _fake_features(md5.digest())
                    status = "stubbed"
                rows.append(
                    {
                        "doc_id": str(rid),
                        "media_type": mtype,
                        "n_bytes": len(data),
                        "content_md5": md5.hexdigest(),
                        "width": w,
                        "height": h,
                        "n_frames": fr,
                        "decode_status": status,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "n_bytes", "content_md5",
                    "width", "height", "n_frames", "decode_status",
                ],
            )

    return df.mapInPandas(batches, MEDIA_FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id string, media_type string, out_w int, out_h int, "
    "payload binary, decode_status string"
)

FRAME_SCHEMA = (
    "doc_id string, frame_idx int, frame_ts_ms long, frame binary, "
    "decode_status string"
)


def resize_media(
    df: DataFrame,
    out_w: int = 224,
    out_h: int = 224,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    media_type_col: str = "media_type",
) -> DataFrame:
    """mapInPandas resize to (out_w, out_h) — the preprocessing step of
    an image training pipeline. Narrow (partition-preserving), one
    Python hop per Arrow batch. The codec is STUBBED (no PIL in this
    container): the 'resized payload' is a deterministic digest-seeded
    byte string of the correct nominal size class, and decode_status
    records it — swapping in a real `Image.resize` changes only the
    inside of the batch function, not the plumbing, schema, or plan.
    """
    if out_w < 1 or out_h < 1:
        # fail at the driver with a named error: in the worker a zero
        # dimension silently truncated the stub payload to b'' (and a
        # real Image.resize error would vanish into the except path)
        raise ValueError(
            f"out_w/out_h must be >= 1, got ({out_w}, {out_h})"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload, mtype in zip(
                pdf[id_col], pdf[payload_col], pdf[media_type_col]
            ):
                data = bytes(payload) if payload is not None else b""
                out_payload, status = None, "stubbed"
                if _HAVE_PIL and mtype == "image":
                    try:
                        out_payload = _resize_real(data, out_w, out_h)
                        status = "decoded"
                    except Exception:  # bad payload / unsupported codec
                        out_payload, status = None, "stubbed"
                if out_payload is None:
                    # deterministic stub: digest-expanded bytes, sized to
                    # a small constant block per output pixel row
                    digest = hashlib.sha1(data + b"|resize").digest()
                    out_payload = (digest * ((out_h // len(digest)) + 1))[:out_h]
                rows.append(
                    {
                        "doc_id": str(rid),
                        "media_type": mtype,
                        "out_w": out_w,
                        "out_h": out_h,
                        "payload": out_payload,
                        "decode_status": status,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "out_w", "out_h",
                    "payload", "decode_status",
                ],
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    media_type_col: str | None = None,
    video_type: str = "video",
) -> DataFrame:
    """mapInPandas frame sampling for video payloads: one output row per
    sampled frame (doc_id, frame_idx, frame_ts_ms, frame). A row-
    multiplying map — the Arrow batch out is larger than in, which
    mapInPandas supports natively (unlike a scalar pandas UDF).

    STUBBED decode: frame count derives deterministically from the
    payload digest (as if probing container metadata) and each 'frame'
    is a digest-seeded byte string; a real implementation would call
    the video codec with the same signature. The count digest is
    sha256 so the driver's DuckDB oracle can reproduce the row set
    (DuckDB has sha256 but not sha1).
    """

    if max_frames < 1:
        # fail at the driver with a named error: inside the worker this
        # was an opaque ZeroDivisionError from '% max_frames' at action
        # time
        raise ValueError(f"max_frames must be >= 1, got {max_frames}")
    if media_type_col is not None:
        # mixed-media frames: only video rows have frames to sample —
        # without the filter every image/audio row grew 1-8 phantom
        # 'frames' (the sibling operators branch on media_type; this
        # one samples everything it is given, so scope its input)
        df = df.filter(F.col(media_type_col) == video_type)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(data + b"|frames").digest()
                # 1 + x % max_frames is already <= max_frames
                n = 1 + digest[0] % max_frames
                for i in range(n):
                    fd = hashlib.sha1(data + i.to_bytes(4, "big")).digest()
                    rows.append(
                        {
                            "doc_id": str(rid),
                            "frame_idx": i,
                            "frame_ts_ms": i * every_ms,
                            "frame": fd,
                            "decode_status": "stubbed",
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "frame_ts_ms", "frame", "decode_status",
                ],
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)
