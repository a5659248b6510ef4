"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct. Decode / feature-extract run as Arrow-batched
``mapInPandas`` stages — the Spark-side plumbing (schema, batch shape,
partition sizing) is real and tested; the *codec* itself is stubbed because
the sandbox has no image/audio libraries (clearly marked below).

Scale notes: binary payloads dominate row size, so the decode stage
repartitions by size budget (``target_batch_bytes``) rather than row count,
keeping Arrow batches bounded; metadata-only queries never touch the binary
column thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, "
    "meta struct<mime:string, n_bytes:bigint, source:string>"
)

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "feat_checksum bigint, feature array<float>"
)


def attach_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text column as an opaque binary payload + typed metadata.

    Stand-in for real image/audio bytes: downstream plumbing is identical
    (binary column, metadata struct), only the codec differs.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        "doc_id",
        F.lit("text").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def estimate_media_bytes(media: DataFrame) -> int:
    """Total payload bytes from the metadata struct — ONE column-pruned
    aggregate (never touches the binary column). Compute it once per
    composed pipeline (attach → resize → extract → frames) and thread the
    result through each stage's ``n_bytes_hint`` so chained stages don't
    each pay a sizing action."""
    return media.agg(F.sum("meta.n_bytes")).first()[0] or 0


def _n_parts(
    media: DataFrame, target_batch_bytes: int, n_bytes_hint: int | None
) -> int:
    """Size-budgeted partition count; a provided hint skips the metadata
    scan entirely (zero jobs at plan-construction time)."""
    total = estimate_media_bytes(media) if n_bytes_hint is None else n_bytes_hint
    return max(1, int(total // target_batch_bytes) + 1)


def decode_media(payload: bytes, media_type: str) -> bytes:
    """STUB — real codecs (PIL/librosa/ffmpeg) are not in this container.

    The deterministic fake returns the payload unchanged for 'text' and
    raises for codecs we cannot host, keeping the failure explicit instead
    of silently wrong.
    """
    if media_type == "text":
        return payload
    raise NotImplementedError(
        f"decode for media_type={media_type!r} requires an external codec "
        "library (PIL/librosa/ffmpeg); plug in via extract_features(decode_fn=...)"
    )


def extract_features(
    media: DataFrame,
    *,
    feat_dim: int = 8,
    target_batch_bytes: int = 64 << 20,
    n_bytes_hint: int | None = None,
    decode_fn=decode_media,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    The deterministic fake feature is a per-chunk byte-sum histogram — enough
    to test batch shape, schema, and determinism. ``feat_checksum`` lets
    golden tests assert byte-exact decode without storing vectors.
    """
    n_parts = _n_parts(media, target_batch_bytes, n_bytes_hint)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len),
            }
            feats, sums = [], []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                raw = decode_fn(bytes(payload), mt)
                # deterministic fake embedding: byte-sum per equal chunk
                n = max(len(raw) // feat_dim, 1)
                vec = [
                    float(sum(raw[i * n : (i + 1) * n]) % 997) for i in range(feat_dim)
                ]
                feats.append(vec)
                sums.append(sum(raw))
            out["feat_checksum"] = pd.Series(sums, index=pdf.index, dtype="int64")
            out["feature"] = pd.Series(feats, index=pdf.index)
            yield pd.DataFrame(out)

    return media.repartition(n_parts).mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_media(
    media: DataFrame,
    *,
    target_bytes: int = 256,
    target_batch_bytes: int = 64 << 20,
    n_bytes_hint: int | None = None,
    decode_fn=decode_media,
) -> DataFrame:
    """Arrow-batched resize: decode → downsample → re-encode, same schema out.

    The Spark plumbing is the real thing (size-budgeted mapInPandas, binary
    in/binary out so stages compose: attach → resize → extract). The
    deterministic fake 'resize' stride-samples the payload down to
    ``target_bytes`` (an image resample would slot into the same loop via
    ``decode_fn``/PIL); metadata is rewritten to the post-resize size.
    """
    n_parts = _n_parts(media, target_batch_bytes, n_bytes_hint)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads, metas = [], []
            for payload, mt, meta in zip(
                pdf["payload"], pdf["media_type"], pdf["meta"]
            ):
                raw = decode_fn(bytes(payload), mt)
                if len(raw) > target_bytes:
                    stride = max(len(raw) // target_bytes, 1)
                    raw = raw[::stride][:target_bytes]
                payloads.append(raw)
                metas.append(
                    {"mime": meta["mime"], "n_bytes": len(raw), "source": meta["source"]}
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.repartition(n_parts).mapInPandas(run, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = (
    "doc_id bigint, frame_index int, n_frames int, frame binary, frame_checksum bigint"
)


def frame_sample(
    media: DataFrame,
    *,
    frame_bytes: int = 64,
    every_k: int = 4,
    target_batch_bytes: int = 64 << 20,
    n_bytes_hint: int | None = None,
    decode_fn=decode_media,
) -> DataFrame:
    """Arrow-batched frame sampling: one input payload → one ROW PER SAMPLED
    FRAME (the row fan-out shape a video pipeline needs; mapInPandas may emit
    more rows than it receives, unlike a pandas_udf).

    The deterministic fake treats the payload as consecutive
    ``frame_bytes``-sized records and keeps every ``every_k``-th — a real
    container demuxer slots into ``decode_fn``. frame_checksum supports
    golden byte-exactness tests without storing frames.
    """
    n_parts = _n_parts(media, target_batch_bytes, n_bytes_hint)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = {k: [] for k in
                    ("doc_id", "frame_index", "n_frames", "frame", "frame_checksum")}
            for doc_id, payload, mt in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                raw = decode_fn(bytes(payload), mt)
                n_frames = max((len(raw) + frame_bytes - 1) // frame_bytes, 1)
                for idx in range(0, n_frames, every_k):
                    frame = raw[idx * frame_bytes : (idx + 1) * frame_bytes]
                    rows["doc_id"].append(doc_id)
                    rows["frame_index"].append(idx)
                    rows["n_frames"].append(n_frames)
                    rows["frame"].append(frame)
                    rows["frame_checksum"].append(sum(frame))
            yield pd.DataFrame(rows)

    return media.repartition(n_parts).mapInPandas(run, schema=FRAME_SCHEMA)
