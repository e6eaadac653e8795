"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed by Arrow-batched ``mapInPandas``.

The pattern for image/audio/video at 100 TB: the payload is a
``binary`` column (or an object-store URI), metadata is typed columns
(modality, width/height/duration, codec), and every transform is a
``mapInPandas`` stage so payload bytes stream through Arrow batches
without ever materializing per-row Python objects.

Decoders are OPTIONAL dependencies, imported lazily per executor:
``decode_stub=False`` uses PIL for images when ``PIL.Image`` is
importable (soundfile/av would slot in the same way for audio/video)
and raises ``NotImplementedError`` for payloads whose decoder is
absent — so the operator is real wherever the libs exist and an
honest stub elsewhere.  ``decode_stub=True`` (default) derives
deterministic pseudo-features from sha256(payload) for tests and
benches.  Everything around the decode call — schema, Arrow batch
iteration, partition sizing, feature assembly — is identical
production plumbing on both paths.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, payload binary, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 8


def attach_fake_payloads(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Test/bench helper: turn a text table into a media table whose
    payload bytes are the utf-8 text (deterministic stand-in for real
    image bytes)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        (F.pmod(F.col(id_col), 1920) + 1).cast("int").alias("width"),
        (F.pmod(F.col(id_col), 1080) + 1).cast("int").alias("height"),
        (F.pmod(F.col(id_col), 60000)).cast("int").alias("duration_ms"),
    )


def _image_decoder():
    """Lazy optional import: returns a payload→features callable when
    PIL is available, else None.  Imported inside the executor task
    (never at module import) so a PIL-less driver/cluster still loads
    this module."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return None

    def decode(payload: bytes) -> list[float]:
        with Image.open(io.BytesIO(payload)) as im:
            im = im.convert("L").resize((2, 2))
            w, h = im.size
            px = list(im.getdata())
        vals = [float(v) / 255.0 for v in px[:4]]
        vals += [0.0] * (4 - len(vals))
        return [float(w), float(h), float(len(px)),
                sum(vals) / 4.0] + vals

    return decode


def _stub_features(payload: bytes) -> list[float]:
    """Deterministic fake feature vector: FEATURE_DIM floats from
    sha256 bytes, each in [0, 1)."""
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
        for i in range(FEATURE_DIM)
    ]


def extract_features(
    media: DataFrame, decode_stub: bool = True, batch_hint: int | None = None
) -> DataFrame:
    """``(media_id, modality, feature array<double>, payload_sha256)``
    via ``mapInPandas`` — one Arrow batch per yield, vectorized
    hashing, no per-row Spark calls.

    With ``decode_stub=False`` image payloads are decoded with PIL
    when it is importable on the executor (lazy per-task import);
    modalities without an available decoder raise
    ``NotImplementedError`` — real where possible, honest stub
    elsewhere.
    """
    import pandas as pd

    def run(batches):
        img_decode = None if decode_stub else _image_decoder()
        for pdf in batches:
            payloads = pdf["payload"]
            if decode_stub:
                feats = [_stub_features(bytes(p)) for p in payloads]
            else:
                feats = []
                for modality, p in zip(pdf["modality"], payloads):
                    if modality == "image" and img_decode is not None:
                        feats.append(img_decode(bytes(p)))
                    else:
                        raise NotImplementedError(
                            f"no decoder available for modality "
                            f"{modality!r} (image needs PIL; audio/"
                            f"video need soundfile/av) — plug one in"
                            f" here"
                        )
            shas = [
                hashlib.sha256(bytes(p)).hexdigest() for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                    "payload_sha256": shas,
                }
            )

    out_schema = (
        "media_id long, modality string, feature array<double>, "
        "payload_sha256 string"
    )
    return media.mapInPandas(run, out_schema)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to
    extract ``(media_id, frame_idx, ts_ms)`` — the explode that turns
    a video row into frame work-items, sized before any decoding so
    the shuffle can distribute frames, not videos (the skew unit at
    scale is the long video)."""
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    return (
        media.where(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("ts_ms", F.col("frame_idx") * every_ms)
    )
