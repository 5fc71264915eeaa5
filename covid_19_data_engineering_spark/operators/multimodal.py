"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The decode kernels SELF-UPGRADE: when PIL is importable on the workers,
payloads are first tried as real images (decode / resample / stat); rows
that don't decode fall back to deterministic fake features derived from the
bytes. This container ships no codecs and the synthetic corpus is text
bytes, so the fallback path is what runs — and everything AROUND the kernel
— binary column materialization, metadata struct schema, Arrow-batched
``mapInPandas`` signature, partition-preserving batch shape — is the real
100 TB design either way:

- payloads stay opaque bytes end-to-end (no driver round trip, no base64
  inflation);
- feature extraction is ``mapInPandas`` so each Arrow batch crosses the
  Python boundary once; at scale batch size is bounded by
  spark.sql.execution.arrow.maxRecordsPerBatch, independent of file count;
- the output schema is declared up front so the optimizer can prune/push
  around the UDF stage.

Installing PIL upgrades image decode/resize in place with no code change;
audio (librosa/soundfile) and video (pyav) kernels would slot into the same
try-decode-else-fake pattern.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, payload_bytes int, "
    "width int, height int, channel_mean double"
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Materialize an opaque binary column + typed metadata struct. Here the
    payload is the utf-8 text bytes standing in for image bytes; in a real
    feed this is ``spark.read.format('binaryFile')`` or a bytes column from
    upstream parquet."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.octet_length(F.col("text")).alias("content_length"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


def _pil_available() -> bool:
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def _extract_features_batch(batches):
    """Feature decoder with a self-upgrading kernel.

    When PIL is installed, each payload is first tried as a real image
    (PIL.Image.open on the bytes); rows that decode get true dimensions and
    channel mean. Rows that don't decode — all of the synthetic corpus,
    whose payloads are utf-8 text bytes — fall back to the deterministic
    fake features, so registered oracle queries stay hash-stable whether or
    not codecs are present. The Arrow batch shape, output schema, and
    partition behavior are identical on both paths.
    """
    import pandas as pd

    use_pil = _pil_available()

    def features_one(b):
        if use_pil:
            try:
                import io

                from PIL import Image, ImageStat

                img = Image.open(io.BytesIO(bytes(b)))
                img.load()
                w, h = img.size
                mean = round(
                    sum(ImageStat.Stat(img.convert("L")).mean) , 4
                )
                return w, h, mean
            except Exception:
                pass  # not a decodable image -> deterministic fake below
        n = len(b)
        return (
            n % 640 + 1,
            n % 480 + 1,
            round(sum(b[:64]) / max(min(n, 64), 1), 4),
        )

    for pdf in batches:
        feats = pdf["payload"].map(features_one)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "payload_bytes": pdf["payload"].map(len).astype("int32"),
                "width": feats.map(lambda t: t[0]).astype("int32"),
                "height": feats.map(lambda t: t[1]).astype("int32"),
                "channel_mean": feats.map(lambda t: t[2]),
            }
        )


def extract_media_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""
    flat = with_payload.select(
        "doc_id", "payload", F.col("media_meta.media_type").alias("media_type")
    )
    return flat.mapInPandas(_extract_features_batch, FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, width int, height int, resized binary"
FRAME_SCHEMA = "doc_id bigint, frame_no int, frame_offset int, frame binary"


def _resize_batch(target_w: int, target_h: int):
    """Resize kernel with the same self-upgrade: payloads that decode under
    PIL are truly resampled (Image.resize) and re-encoded PNG; anything that
    doesn't decode — the whole synthetic corpus — deterministically
    truncates/pads to target_w*target_h bytes so output sizes stay
    schema-checkable without codecs."""

    def fn(batches):
        import pandas as pd

        use_pil = _pil_available()
        n = target_w * target_h

        def resize_one(b):
            if use_pil:
                try:
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(bytes(b)))
                    img.load()
                    out = io.BytesIO()
                    img.resize((target_w, target_h)).save(out, format="PNG")
                    return out.getvalue()
                except Exception:
                    pass
            return bytes(b[:n]).ljust(n, b"\0")

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "resized": pdf["payload"].map(resize_one),
                }
            )

    return fn


def resize_media(with_payload: DataFrame, width: int = 64, height: int = 48) -> DataFrame:
    """Arrow-batched resize over binary payloads (decode kernel stubbed)."""
    flat = with_payload.select("doc_id", "payload")
    return flat.mapInPandas(_resize_batch(width, height), RESIZE_SCHEMA)


def _frame_sample_batch(every_n_bytes: int, max_frames: int):
    """STUB FRAME SAMPLER — a real kernel seeks keyframes (pyav). The fake
    slices the payload at fixed strides; one input row fans out to
    <=max_frames output rows, the exact batch shape a video sampler has."""

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "frame_offset": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(min(max_frames, max(len(payload) // every_n_bytes, 1))):
                    off = i * every_n_bytes
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["frame_offset"].append(off)
                    out["frame"].append(bytes(payload[off:off + every_n_bytes]))
            yield pd.DataFrame(out)

    return fn


def sample_frames(with_payload: DataFrame, every_n_bytes: int = 32,
                  max_frames: int = 4) -> DataFrame:
    """Arrow-batched frame sampling: 1 row -> up to max_frames rows."""
    flat = with_payload.select("doc_id", "payload")
    return flat.mapInPandas(_frame_sample_batch(every_n_bytes, max_frames), FRAME_SCHEMA)


@register(
    "multimodal_frame_sample",
    # the stub sampler slices payload bytes at fixed strides, which SQL can
    # reproduce exactly: BLOB substring at i*32 for i < least(4, n//32 or 1)
    oracle="""
    WITH docs_b AS (
      SELECT doc_id, text AS txt,
             octet_length(CAST(text AS BLOB)) AS n
      FROM documents
    ),
    expanded AS (
      -- list-returning range + unnest (the table-function form can't take
      -- lateral column args in DuckDB)
      SELECT doc_id, txt,
             unnest(range(0, CAST(least(4, greatest(n // 32, 1)) AS BIGINT))) AS i
      FROM docs_b
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_no,
           CAST(i * 32 AS INTEGER) AS frame_offset,
           -- DuckDB has no BLOB substring; char slicing == byte slicing here
           -- because the documents corpus is pure ASCII (octet_length ==
           -- length for every row, asserted before adopting this oracle)
           hex(substring(txt, CAST(i * 32 + 1 AS INTEGER), 32)) AS frame_hex
    FROM expanded
    ORDER BY doc_id, frame_no
    """,
    doc="Frame sampling over binary payloads: mapInPandas fan-out (1 row -> "
    "N frames), sampler kernel stubbed, batch plumbing real. The registered "
    "projection hex-encodes the frame bytes: raw binary crosses engines as "
    "bytes-vs-bytearray, which pandas canonicalizers cannot hash; the "
    "library function sample_frames keeps the real binary column.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    frames = sample_frames(attach_binary_payload(docs))
    return frames.select(
        "doc_id", "frame_no", "frame_offset", F.hex("frame").alias("frame_hex")
    ).orderBy("doc_id", "frame_no")


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           'image/fake' AS media_type,
           CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS payload_bytes,
           CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS INTEGER) AS width,
           CAST(octet_length(CAST(text AS BLOB)) % 480 + 1 AS INTEGER) AS height
    FROM documents
    ORDER BY doc_id
    """,
    doc="Binary-payload feature extraction via Arrow-batched mapInPandas "
    "(decode kernel stubbed; plumbing real).",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    feats = extract_media_features(attach_binary_payload(docs))
    # channel_mean is the stub's Python-float reduction — exclude it from the
    # oracle-compared projection (its fake math is pinned by unit tests)
    return feats.select("doc_id", "media_type", "payload_bytes", "width", "height").orderBy("doc_id")
