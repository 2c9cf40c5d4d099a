"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched mapInPandas.

Real decode kernels are absent in this container (no codec libs):
features fall back to a deterministic fake (seeded from the payload
digest, ``decoded=False``), while byte-level metadata is always real.
The Spark-side plumbing (schema, partition sizing, UDF signature,
batch shape) is real and tested. On a cluster with codecs installed,
register per-kind decoders in ``_REAL_DECODERS`` — nothing else changes.

Scale posture: binary payloads never pass through Python row-at-a-time;
mapInPandas streams Arrow batches, and ``maxRecordsPerBatch`` bounds
batch memory. Feature extraction emits small fixed-width rows so the
downstream shuffle moves features, not media bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, digest string, "
    "feat array<float>, decoded boolean"
)


def synth_media(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Deterministic fake media table from a text table: payload =
    utf-8 bytes (opaque binary stand-in), metadata derived from length.
    Lets the full pipeline run end-to-end without codecs."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(t, "utf-8").alias("payload"),
        (F.length(t) % 640 + 32).cast("int").alias("width"),
        (F.length(t) % 480 + 32).cast("int").alias("height"),
        (F.length(t) * 10).cast("int").alias("duration_ms"),
    )


def _fake_feature(payload: bytes, n: int = 8) -> np.ndarray:
    """Deterministic stand-in for a decoded-media feature vector: seeded
    from the payload digest. Replace with a real embedding on a cluster
    with codecs."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32)


# Real per-kind decoders: empty until implemented on a codec-equipped
# cluster (signature: bytes -> np.ndarray feature vector). Deliberately
# NOT keyed on whether PIL/librosa import — merely having a codec lib
# installed must never change behavior; only kinds with an actual
# registered implementation route through a real decoder.
#
# NB: this module-global is DRIVER-side. On a real cluster, executors
# re-import the module and would see an empty dict — pass decoders to
# extract_features(decoders=...) instead; the dict is closure-captured
# and shipped to executors via cloudpickle with the UDF. The global
# remains as a convenience for registration at module import time
# (e.g. a sitecustomize/zip-shipped __init__ that runs on executors).
_REAL_DECODERS: dict[str, object] = {}


def extract_features(
    media: DataFrame, feat_dim: int = 8, decoders: dict[str, object] | None = None
) -> DataFrame:
    """Decode + featurize media via mapInPandas (Arrow batches).

    Byte-level metadata (n_bytes, digest) is computed unconditionally —
    it needs no codecs. Features route through a real per-kind decoder
    (``decoded=True``); otherwise the deterministic ``_fake_feature``
    stand-in (``decoded=False``). No path raises in the batch loop.

    ``decoders`` — per-kind decode callables (bytes → feature vector),
    closure-captured and serialized WITH the UDF, so they reach
    executors regardless of import order (the reliable cluster path).
    Falls back to the module-global ``_REAL_DECODERS`` registry, which
    only works where registration also ran on the executor side."""
    active = dict(_REAL_DECODERS) if decoders is None else dict(decoders)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats, decoded = [], []
            for kind, p in zip(pdf["kind"], payloads):
                real = active.get(kind)
                if real is not None:
                    feats.append(np.asarray(real(p), dtype=np.float32).tolist())
                    decoded.append(True)
                else:
                    feats.append(_fake_feature(p, feat_dim).tolist())
                    decoded.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": payloads.map(lambda p: hashlib.md5(p).hexdigest()),
                    "feat": feats,
                    "decoded": decoded,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (explode of a sequence — no Python). The actual frame
    decode would plug into extract_features per frame."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )
