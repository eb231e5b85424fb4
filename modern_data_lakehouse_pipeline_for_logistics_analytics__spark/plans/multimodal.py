"""Multimodal plan: binary-column decode plumbing (rows-only check --
the payload pipeline is not SQL-expressible in DuckDB)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import attach_binary_payload, decode_media
from .registry import register, table_path


@register("multimodal_decode_stub")
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payloads through the Arrow-batched decode stage: typed
    metadata out, deterministic stub decoder in place of PIL.
    tests/test_northstar.py pins the schema and the failure-status
    contract."""
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    media = attach_binary_payload(docs, "doc_id", "text")
    return decode_media(media)


# The deterministic stub-decode arithmetic, replayed in SQL: payload =
# utf8(text), so DuckDB's sha256(text) (VARCHAR -> hex) equals Python's
# hashlib.sha256(payload).hexdigest() byte-for-byte, and every metadata
# field is integer arithmetic over digest bytes.  The decode/sampling
# PLUMBING stays Arrow-batched Python (the real path); the oracle proves
# the whole composition end-to-end -- the multimodal family's first
# hash-verified queries (previously rows-only).  The stub constants are
# IMPORTED from the operator module (single source; a stub tune cannot
# silently desync the oracle).
from ..operators.multimodal import (  # noqa: E402
    IMG_DIM_BASE,
    IMG_DIM_MOD,
    VID_DUR_BASE,
)

_D0 = "CAST(('0x' || substr(sha256(text), 1, 2)) AS BIGINT)"
_D1 = "CAST(('0x' || substr(sha256(text), 3, 2)) AS BIGINT)"
_D23 = "CAST(('0x' || substr(sha256(text), 5, 4)) AS BIGINT)"

_FRAME_MS = 500


@register(
    "multimodal_video_frame_index",
    oracle=f"""
    WITH meta AS (
      SELECT doc_id,
             substr(sha256(text), 1, 8) AS sha8,
             {VID_DUR_BASE} + {_D23} AS duration_ms
      FROM documents),
    frames AS (
      SELECT doc_id, sha8, duration_ms,
             unnest(generate_series(0, duration_ms // {_FRAME_MS})) AS frame_idx
      FROM meta)
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(frame_idx * {_FRAME_MS} AS BIGINT) AS ts_ms,
           substr(sha256(sha8 || ':' || CAST(frame_idx AS VARCHAR)), 1, 8) AS frame_sha8
    FROM frames
    """,
)
def q_video_frame_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling end-to-end: binary payloads -> Arrow-batched
    stub decode (duration from the digest) -> variable-fanout frame
    sampler (one row per 500ms tick, stub frame digests).  The fanout,
    timestamps and frame ids are deterministic arithmetic, so DuckDB
    replays the ENTIRE two-stage Python pipeline and the driver
    hash-verifies the multimodal plumbing -- schema, batching, fanout --
    not just row counts (`operators/multimodal.py::sample_video_frames`)."""
    from ..operators.multimodal import sample_video_frames

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    media = attach_binary_payload(docs, "doc_id", "text", mime="video/fake")
    return sample_video_frames(decode_media(media), every_ms=_FRAME_MS)


_RESIZE_MAX = 96


@register(
    "multimodal_resize_plan",
    oracle=f"""
    WITH meta AS (
      SELECT doc_id,
             {IMG_DIM_BASE} + ({_D0}) % {IMG_DIM_MOD} AS width,
             {IMG_DIM_BASE} + ({_D1}) % {IMG_DIM_MOD} AS height
      FROM documents),
    sized AS (
      SELECT doc_id, width, height, GREATEST(width, height) AS long_side
      FROM meta)
    SELECT doc_id, CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
           CAST(CASE WHEN long_side <= {_RESIZE_MAX} THEN width
                ELSE GREATEST(1, (width * {_RESIZE_MAX}) // long_side) END AS BIGINT)
             AS out_width,
           CAST(CASE WHEN long_side <= {_RESIZE_MAX} THEN height
                ELSE GREATEST(1, (height * {_RESIZE_MAX}) // long_side) END AS BIGINT)
             AS out_height,
           CASE WHEN long_side <= {_RESIZE_MAX} THEN 'keep' ELSE 'resize' END AS status
    FROM sized
    """,
)
def q_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving image resize planning over the decoded stub
    dims: integer target-dimension math + pass-through policy, computed
    in the Arrow-batched planner (where PIL's resample drops in on a
    real cluster) and replayed exactly in SQL
    (`operators/multimodal.py::plan_image_resize`)."""
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    media = attach_binary_payload(docs, "doc_id", "text")
    from ..operators.multimodal import plan_image_resize

    return plan_image_resize(decode_media(media), max_side=_RESIZE_MAX)


from ..operators.multimodal import (  # noqa: E402
    AUD_DUR_BASE,
    AUD_RATE_BASE,
    AUD_RATE_MOD,
    AUD_RATE_STEP,
)

_D4 = "CAST(('0x' || substr(sha256(text), 9, 2)) AS BIGINT)"
_D56 = "CAST(('0x' || substr(sha256(text), 11, 4)) AS BIGINT)"

_WIN_MS = 2000
_HOP_MS = 1000


@register(
    "multimodal_audio_chunk_plan",
    oracle=f"""
    WITH meta AS (
      SELECT doc_id,
             substr(sha256(text), 1, 8) AS sha8,
             {AUD_RATE_BASE} + {AUD_RATE_STEP} * (({_D4}) % {AUD_RATE_MOD}) AS rate,
             {AUD_DUR_BASE} + {_D56} AS duration_ms
      FROM documents),
    chunks AS (
      SELECT doc_id, sha8, rate,
             unnest(generate_series(0,
               (duration_ms - {_WIN_MS}) // {_HOP_MS})) AS chunk_idx
      FROM meta
      WHERE duration_ms >= {_WIN_MS})
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(chunk_idx * {_HOP_MS} AS BIGINT) AS start_ms,
           CAST((chunk_idx * {_HOP_MS} * rate) // 1000 AS BIGINT) AS start_sample,
           CAST(({_WIN_MS} * rate) // 1000 AS BIGINT) AS n_samples,
           substr(sha256(sha8 || ':a' || CAST(chunk_idx AS VARCHAR)), 1, 8)
             AS chunk_sha8
    FROM chunks
    """,
)
def q_audio_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio training-window planning end-to-end: binary payloads ->
    Arrow-batched stub decode (rate/duration from the digest) ->
    variable-fanout window chunker (full 2s windows at 1s hop, exact
    sample offsets, stub chunk digests) -- the third modality of the
    decode family, hash-verified like the video frame index
    (`operators/multimodal.py::chunk_audio_windows`)."""
    from ..operators.multimodal import chunk_audio_windows

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    media = attach_binary_payload(docs, "doc_id", "text", mime="audio/fake")
    return chunk_audio_windows(
        decode_media(media), win_ms=_WIN_MS, hop_ms=_HOP_MS
    )
