"""Multimodal-column operators — SURVEY.md §2 C48 + binary plumbing.

The engine's multimodal story (BASELINE.json north star): media travel
as opaque ``binary`` columns with typed metadata beside them; decode /
feature-extract runs as Arrow-batched ``mapInPandas`` so bytes never
round-trip row-at-a-time. The image/audio codec libraries are not in
this container, so the decode step is a clearly-marked deterministic
STUB — the Spark-side plumbing (schema, batching, partitioning, UDF
signatures) is real and exercised.

``multimodal_embedding_stats`` treats the embedding column as the typed
feature side of a multimodal record (per-label centroid geometry).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..helpers import r4
from ..registry import query
from ..tables import table


@query(
    "multimodal_embedding_stats",
    oracle="""
WITH v AS (
  SELECT label, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), centroid AS (
  SELECT label, i, avg(x) AS m FROM v GROUP BY label, i
), norms AS (
  SELECT vec_id, label,
         sqrt(list_aggregate(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
  FROM embeddings
)
SELECT c.label,
       round(sqrt(sum(c.m * c.m)), 4) AS centroid_norm,
       n.n_vectors,
       round(n.avg_norm, 4) AS avg_norm
FROM centroid c
JOIN (SELECT label, count(*) AS n_vectors, avg(nrm) AS avg_norm
      FROM norms GROUP BY label) n ON n.label = c.label
GROUP BY c.label, n.n_vectors, n.avg_norm
""",
)
def multimodal_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C48: per-label embedding geometry — centroid norm (posexplode ->
    per-dimension mean -> L2) and mean vector norm. The explode shape
    shuffles (label, dim) partial sums, not vectors: scale-safe."""
    e = table(spark, sf_dir, "embeddings")
    v = e.select(
        "label", F.posexplode("embedding").alias("i", "xf")
    ).withColumn("x", F.col("xf").cast("double"))
    centroid = v.groupBy("label", "i").agg(F.avg("x").alias("m"))
    cnorm = centroid.groupBy("label").agg(
        F.sqrt(F.sum(F.col("m") * F.col("m"))).alias("centroid_norm_raw")
    )
    norms = e.select(
        "label",
        F.expr(
            "sqrt(aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)), "
            "0D, (acc, v) -> acc + v))"
        ).alias("nrm"),
    )
    per_label = norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"), F.avg("nrm").alias("avg_norm_raw")
    )
    return cnorm.join(per_label, "label").select(
        "label",
        r4(F.col("centroid_norm_raw")).alias("centroid_norm"),
        "n_vectors",
        r4(F.col("avg_norm_raw")).alias("avg_norm"),
    )


@query(
    "multimodal_binary_meta",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS checksum,
       CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
       CAST(octet_length(encode(text)) % 480 AS BIGINT) AS fake_height
FROM documents
""",
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing, relational half: payload as ``binary``
    (utf-8 encode of text stands in for image bytes), with typed
    metadata derived engine-side — byte length, checksum, and a
    deterministic fake of decoded dimensions. At 100 TB binary columns
    ride parquet byte arrays; metadata extraction like this never
    leaves the JVM."""
    docs = table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    nbytes = F.octet_length(payload).cast("bigint")
    return docs.select(
        "doc_id",
        nbytes.alias("n_bytes"),
        F.md5("text").alias("checksum"),
        (nbytes % 640).alias("fake_width"),
        (nbytes % 480).alias("fake_height"),
    )


_DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, mean_px double"
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, float]:
    """STUB decode — deterministic fake of an image codec.

    Real implementation would be e.g. PIL.Image.open(BytesIO(payload));
    the codec libs are not in this container, so dimensions and mean
    pixel derive deterministically from the bytes. Plumbing (bytes in,
    typed features out, Arrow-batched) is the real contract.
    """
    n = len(payload)
    width = n % 640 + 1
    height = n % 480 + 1
    mean_px = (sum(payload[:64]) % 256) / 255.0 if n else 0.0
    return width, height, mean_px


@query("multimodal_decode_stub")  # weak: exercises mapInPandas plumbing
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing, Python half: Arrow-batched ``mapInPandas``
    decode -> feature-extract. Each batch arrives as a pandas DataFrame
    of byte payloads; the stub codec emits typed features. This is the
    pattern for real image/audio decode at scale (one Python worker per
    core, Arrow transfer, no per-row pickling)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_decode_image_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "width": feats.map(lambda t: t[0]),
                    "height": feats.map(lambda t: t[1]),
                    "mean_px": feats.map(lambda t: t[2]),
                }
            )

    return docs.mapInPandas(decode_batches, schema=_DECODE_SCHEMA)


_FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_ms bigint, frame_checksum string"
_FRAME_BYTES = 64  # stub "frame" stride
_SAMPLE_EVERY = 4  # keep every 4th frame


@query("multimodal_frame_sample")  # weak: exercises frame-sampling plumbing
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-shaped plumbing: STUB frame extraction + temporal sampling.

    Real implementation decodes container/codec (pyav/ffmpeg) and emits
    every k-th frame; the stub treats the payload as fixed-stride raw
    frames. The Spark-side contract is the real part: one binary row in,
    N sampled frame rows out (a generator inside mapInPandas — row
    explosion without shuffle), frame timestamps derived from index,
    checksums instead of pixel buffers downstream.
    """
    import hashlib

    import pandas as pd

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(1, len(payload) // _FRAME_BYTES)
                for idx in range(0, n_frames, _SAMPLE_EVERY):
                    frame = bytes(payload[idx * _FRAME_BYTES : (idx + 1) * _FRAME_BYTES])
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "frame_ms": idx * 40,  # 25 fps stub timeline
                            "frame_checksum": hashlib.md5(frame).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_ms", "frame_checksum"])

    return docs.mapInPandas(sample, schema=_FRAME_SCHEMA)


_RESIZE_SCHEMA = (
    "doc_id bigint, src_w bigint, src_h bigint, dst_w bigint, dst_h bigint, scale double"
)


@query("multimodal_resize_stub")  # weak: exercises resize plumbing
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing: STUB of decode -> fit-within(256x256) ->
    re-encode. The aspect-preserving scale math is real; the pixel work
    is faked from byte lengths (no codec libs in this container). Arrow
    batches in/out; at scale this is the standard image-normalization
    pass before feature extraction."""
    import pandas as pd

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = 256.0
        for pdf in batches:
            n = pdf["payload"].map(len)
            src_w = (n % 640 + 1).astype("int64")
            src_h = (n % 480 + 1).astype("int64")
            scale = (target / src_w.where(src_w > src_h, src_h)).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_w": src_w,
                    "src_h": src_h,
                    "dst_w": (src_w * scale).astype("int64"),
                    "dst_h": (src_h * scale).astype("int64"),
                    "scale": scale.round(4),
                }
            )

    return docs.mapInPandas(resize, schema=_RESIZE_SCHEMA)


_AUDIO_SCHEMA = (
    "doc_id bigint, chunk_idx bigint, start_ms bigint, end_ms bigint, "
    "energy double, is_speech boolean"
)
_SAMPLE_RATE = 16_000     # stub PCM: 16 kHz mono s16le
_CHUNK_SAMPLES = 2_048    # ~128 ms windows
_HOP_SAMPLES = 1_536      # 25% overlap between consecutive chunks


@query("multimodal_audio_chunk")  # weak: exercises audio-chunking plumbing
def multimodal_audio_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shaped plumbing: STUB of decode -> overlapped fixed-length
    chunking -> per-chunk energy -> voice-activity gate, the standard
    ASR/embedding preprocessing pass (e.g. 30 s windows with overlap,
    scaled down to the fixture payloads). A real build swaps the codec
    in (soundfile/ffmpeg — not in this container) and keeps everything
    else: the payload is treated as 16 kHz mono s16le PCM, chunk
    boundaries are sample-accurate with hop < window (overlap), energy
    is the mean |sample| of the chunk, and the gate drops silence-like
    chunks BEFORE any expensive downstream featurization.

    Spark contract (the real part): one binary row in, N overlapping
    chunk rows out via a generator inside Arrow-batched mapInPandas —
    row explosion with no shuffle and no Python-row round-trips; chunk
    timestamps are derived, not stored. At 100 TB the gate's
    selectivity is the win: silence (often most of raw audio) never
    leaves the scan stage."""
    import numpy as np
    import pandas as pd

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                pcm = np.frombuffer(
                    bytes(payload[: (len(payload) // 2) * 2]), dtype="<i2"
                ).astype(np.float64)
                if pcm.size == 0:
                    continue
                idx = 0
                start = 0
                while start < pcm.size:
                    seg = pcm[start : start + _CHUNK_SAMPLES]
                    energy = float(np.abs(seg).mean()) / 32768.0
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "chunk_idx": idx,
                            "start_ms": start * 1000 // _SAMPLE_RATE,
                            "end_ms": (start + seg.size) * 1000 // _SAMPLE_RATE,
                            "energy": round(energy, 4),
                            "is_speech": energy > 0.05,
                        }
                    )
                    idx += 1
                    start += _HOP_SAMPLES
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "chunk_idx", "start_ms", "end_ms", "energy", "is_speech",
                ],
            )

    return docs.mapInPandas(chunk, schema=_AUDIO_SCHEMA)


@query(
    "multimodal_embedding_quantize",
    oracle="""
WITH q AS (
  SELECT vec_id, label,
         len(embedding) AS n_dims,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
           AS amax
  FROM embeddings
), s AS (
  SELECT vec_id, label, n_dims, amax,
         CASE WHEN amax > 0 THEN 127.0 / amax ELSE 1.0 END AS scale
  FROM q
), z AS (
  SELECT s.vec_id, s.label, s.n_dims, s.scale,
         list_transform(e.embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * s.scale + 0.5) AS BIGINT)) AS qv
  FROM s JOIN embeddings e ON e.vec_id = s.vec_id
)
SELECT vec_id, label, CAST(n_dims AS BIGINT) AS n_dims,
       round(scale, 4) AS scale,
       list_min(qv) AS q_min,
       list_max(qv) AS q_max,
       CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum
FROM z
""",
)
def multimodal_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the 4x
    storage/bandwidth compression every vector store applies before
    ANN serving. Per vector: scale = 127/max|x|, q_i = floor(x*scale
    + 0.5) (explicit floor(+0.5): round-half-up is engine-identical,
    while native round() ties-to-even is not guaranteed across
    engines). Emitted as per-vector summaries (dims, scale, min/max/
    sum of the int8 codes) — the validation columns a quantization job
    logs; q_max <= 127 and q_min >= -127 by construction.

    Scale: pure per-row array HOFs — no shuffle, no Python, codegen'd;
    the quantized payload would be written as array<tinyint> next to
    the fp32 original (or replacing it, once recall is validated)."""
    e = table(spark, sf_dir, "embeddings")
    amax = F.expr(
        "aggregate(transform(embedding, x -> abs(cast(x as double))), "
        "cast(0 as double), (a, v) -> greatest(a, v))"
    )
    s = e.select(
        "vec_id", "label",
        F.size("embedding").cast("bigint").alias("n_dims"),
        amax.alias("amax"),
        "embedding",
    ).withColumn(
        "scale",
        F.when(F.col("amax") > 0, F.lit(127.0) / F.col("amax")).otherwise(F.lit(1.0)),
    )
    qv = F.expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * scale + 0.5) as bigint))"
    )
    z = s.withColumn("qv", qv)
    return z.select(
        "vec_id", "label", "n_dims",
        r4(F.col("scale")).alias("scale"),
        F.array_min("qv").alias("q_min"),
        F.array_max("qv").alias("q_max"),
        F.expr("aggregate(qv, cast(0 as bigint), (a, v) -> a + v)").alias("q_sum"),
    )
