"""multimodal section of the declared query registry -- bodies verbatim
from the monolithic plans/registry.py (round-8 maintainability split;
identical registry() output, zero plan changes)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ...operators import (  # noqa: F401
    analytics,
    dedup,
    ml,
    multimodal,
    relational,
    similarity,
    temporal,
    text,
)
from ...sources.tables import load_table  # noqa: F401
from .core import (  # noqa: F401
    _QUALITY_EXPR,
    _QUALITY_MEASURES_CTE,
    _register,
    _t,
)


# ---------------------------------------------------- multimodal (M5)

#: Byte-level view of the multimodal payload (UTF-8 bytes of text) on
#: the DuckDB side: hex-decode each byte so oracles verify payload
#: CONTENT, not just length. Shared by the multimodal oracle family.
_PAYLOAD_CTE = """
    pay AS (SELECT doc_id, hex(encode(text)) AS h,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n
            FROM documents),
    pbytes AS (SELECT doc_id, n,
                      list_transform(range(0, n), i ->
                          (strpos('0123456789ABCDEF',
                                  substr(h, CAST(2*i+1 AS INT), 1)) - 1) * 16
                        + (strpos('0123456789ABCDEF',
                                  substr(h, CAST(2*i+2 AS INT), 1)) - 1)) AS bytes
               FROM pay)
"""


@_register(
    "multimodal_decode",
    f"""
    WITH {_PAYLOAD_CTE}
    SELECT doc_id, 'image/fake' AS content_type, n AS n_bytes,
           n % 640 AS fake_width, (n * 7) % 480 AS fake_height,
           CAST(coalesce(list_sum(bytes), 0) AS BIGINT) AS byte_sum,
           CAST(coalesce(list_min(bytes), 0) AS INT) AS byte_min,
           CAST(coalesce(list_max(bytes), 0) AS INT) AS byte_max,
           CAST(coalesce(len(list_distinct(bytes)), 0) AS INT) AS n_distinct_bytes
    FROM pbytes
    """,
    note="decode kernel stubbed (no imaging libs); Arrow plumbing real; "
    "oracle verifies payload content via byte sum/min/max/distinct",
)
def _multimodal_decode(spark, sf):
    return multimodal.decode_metadata(multimodal.attach_payload(_t(spark, sf, "documents")))


@_register(
    "multimodal_frame_sample",
    """
    WITH pay AS (SELECT doc_id, hex(encode(text)) AS h,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n
                 FROM documents),
    geo AS (SELECT doc_id, h, n, least(4, greatest(1, n // 32)) AS n_frames FROM pay),
    geo2 AS (SELECT doc_id, h, greatest(1, n // n_frames) AS stride, n_frames FROM geo),
    fr AS (SELECT doc_id, CAST(unnest(range(0, n_frames)) AS INT) AS frame_idx,
                  h, stride
           FROM geo2)
    SELECT doc_id, frame_idx,
           CAST(length(substr(h, CAST(2 * frame_idx * stride + 1 AS INT), 64)) // 2
                AS INT) AS frame_len,
           substr(h, CAST(2 * frame_idx * stride + 1 AS INT), 64) AS frame_hex
    FROM fr
    """,
    note="frame slices hex-projected so the oracle hashes frame content",
)
def _multimodal_frame_sample(spark, sf):
    from pyspark.sql import functions as F

    frames = multimodal.frame_sample(multimodal.attach_payload(_t(spark, sf, "documents")))
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame_bytes").cast("int").alias("frame_len"),
        F.hex("frame_bytes").alias("frame_hex"),
    )


@_register(
    "multimodal_resize",
    """
    WITH pay AS (SELECT doc_id, hex(encode(text)) AS h,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n
                 FROM documents),
    g AS (SELECT doc_id, h, n, n % 640 AS w, (n * 7) % 480 AS hh FROM pay),
    g2 AS (SELECT doc_id, h, n, w, hh, greatest(1, w // 64) AS scale FROM g)
    SELECT doc_id,
           greatest(1, w // scale) AS out_width,
           greatest(1, hh // scale) AS out_height,
           array_to_string(
               list_transform(range(0, (n + scale - 1) // scale),
                              i -> substr(h, CAST(2 * i * scale + 1 AS INT), 2)),
               '') AS resized_hex
    FROM g2
    """,
    note="byte-stride fake resample; resized payload hex-projected for a content oracle",
)
def _multimodal_resize(spark, sf):
    from pyspark.sql import functions as F

    resized = multimodal.resize(multimodal.attach_payload(_t(spark, sf, "documents")))
    return resized.select(
        "doc_id", "out_width", "out_height", F.hex("resized").alias("resized_hex")
    )


@_register(
    "multimodal_audio_features",
    f"""
    WITH {_PAYLOAD_CTE}
    SELECT doc_id, n AS n_samples,
           n / 16.0 AS duration_fake_ms,
           CASE WHEN n = 0 THEN 0.0
                ELSE round(sqrt(list_sum(list_transform(bytes,
                                x -> (x - 128.0) * (x - 128.0))) / n), 4)
           END AS rms_fake,
           CASE WHEN n = 0 THEN 0.0
                ELSE round(list_max(list_transform(bytes, x -> abs(x - 128.0))), 4)
           END AS peak_fake
    FROM pbytes
    """,
    note="fake-PCM per-clip stats; RMS/peak are content-derived, oracle-verified",
)
def _multimodal_audio_features(spark, sf):
    return multimodal.audio_features(multimodal.attach_payload(_t(spark, sf, "documents")))


@_register(
    "multimodal_decode_bmp",
    f"""
    WITH {_PAYLOAD_CTE},
    geo AS (SELECT doc_id, n, bytes,
                   8 + (n % 9) AS w, 8 + ((n * 3) % 9) AS h
            FROM pbytes WHERE n > 0),
    px AS (SELECT doc_id, n, w, h,
                  list_transform(range(0, w * h * 3),
                                 k -> bytes[CAST(k % n AS INT) + 1]) AS flat
           FROM geo)
    SELECT doc_id,
           CAST(54 + ((3 * w + 3) // 4) * 4 * h AS BIGINT) AS n_bytes,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(list_sum(list_transform(list_filter(range(0, w * h * 3),
                k -> k % 3 = 0), k -> flat[CAST(k AS INT) + 1])) AS BIGINT) AS sum_r,
           CAST(list_sum(list_transform(list_filter(range(0, w * h * 3),
                k -> k % 3 = 1), k -> flat[CAST(k AS INT) + 1])) AS BIGINT) AS sum_g,
           CAST(list_sum(list_transform(list_filter(range(0, w * h * 3),
                k -> k % 3 = 2), k -> flat[CAST(k AS INT) + 1])) AS BIGINT) AS sum_b,
           CAST(list_min(flat) AS INT) AS px_min,
           CAST(list_max(flat) AS INT) AS px_max
    FROM px
    """,
    note="REAL library-free image path: spec-compliant 24-bit BMP encoded per "
    "doc (pixels tiled from text bytes), parsed back by the pure-numpy BMP "
    "decoder; oracle reconstructs every pixel from the text column, so the "
    "file size, geometry, per-channel sums and min/max all prove a real "
    "header+scanline decode (BGR/bottom-up/row-padding handled)",
)
def _multimodal_decode_bmp(spark, sf):
    return multimodal.decode_image_meta(
        multimodal.attach_image_payload(_t(spark, sf, "documents"))
    )


@_register(
    "multimodal_image_patches",
    f"""
    WITH {_PAYLOAD_CTE},
    geo AS (SELECT doc_id, n, bytes,
                   8 + (n % 9) AS w, 8 + ((n * 3) % 9) AS h
            FROM pbytes WHERE n > 0),
    grid AS (SELECT doc_id, n, bytes, w,
                    unnest(range(0, (h // 4) * (w // 4))) AS g
             FROM geo),
    p AS (SELECT doc_id, n, bytes, w,
                 CAST(g // (w // 4) AS INT) AS patch_row,
                 CAST(g % (w // 4) AS INT) AS patch_col
          FROM grid)
    SELECT doc_id, patch_row, patch_col,
           CAST(list_sum(list_transform(range(0, 16), t ->
             bytes[CAST((((patch_row * 4 + t // 4) * w
                          + patch_col * 4 + t % 4) * 3 + 0) % n AS INT) + 1]))
             AS BIGINT) AS sum_r,
           CAST(list_sum(list_transform(range(0, 16), t ->
             bytes[CAST((((patch_row * 4 + t // 4) * w
                          + patch_col * 4 + t % 4) * 3 + 1) % n AS INT) + 1]))
             AS BIGINT) AS sum_g,
           CAST(list_sum(list_transform(range(0, 16), t ->
             bytes[CAST((((patch_row * 4 + t // 4) * w
                          + patch_col * 4 + t % 4) * 3 + 2) % n AS INT) + 1]))
             AS BIGINT) AS sum_b
    FROM p
    """,
    note="ViT-style 4x4 patch extraction over the REAL BMP decode "
    "path: per-tile exact integer channel sums (the patch-embedding "
    "precursor); oracle reconstructs every patch pixel from the text "
    "bytes, so grid geometry, crop semantics and the vectorized "
    "reshape-sum are all pixel-proven",
)
def _multimodal_image_patches(spark, sf):
    return multimodal.image_patches(
        multimodal.attach_image_payload(_t(spark, sf, "documents"))
    )


@_register(
    "multimodal_image_histogram",
    f"""
    WITH {_PAYLOAD_CTE},
    geo AS (SELECT doc_id, n, bytes,
                   8 + (n % 9) AS w, 8 + ((n * 3) % 9) AS h
            FROM pbytes WHERE n > 0),
    px AS (SELECT doc_id, n, bytes, unnest(range(0, w * h)) AS k
           FROM geo),
    g AS (SELECT doc_id,
                 CAST((bytes[CAST((k * 3 + 0) % n AS INT) + 1]
                     + bytes[CAST((k * 3 + 1) % n AS INT) + 1]
                     + bytes[CAST((k * 3 + 2) % n AS INT) + 1]) // 48
                      AS INT) AS bin
          FROM px)
    SELECT doc_id, bin, CAST(count(*) AS BIGINT) AS n_px
    FROM g GROUP BY doc_id, bin
    """,
    note="per-image 16-bin luminance histogram over REAL decoded BMP "
    "pixels (exposure/contrast curation profile): integer r+g+b "
    "floor-binned, one vectorized bincount per image, sparse "
    "(doc_id, bin, count) rows shuffle -- never pixels; oracle "
    "replays every pixel from the text bytes",
)
def _multimodal_image_histogram(spark, sf):
    return multimodal.image_histogram(
        multimodal.attach_image_payload(_t(spark, sf, "documents"))
    )


@_register(
    "multimodal_text_align",
    f"""
    WITH {_PAYLOAD_CTE},
    geo AS (SELECT doc_id, n, bytes,
                   8 + (n % 9) AS w, 8 + ((n * 3) % 9) AS h
            FROM pbytes WHERE n > 0),
    px AS (SELECT doc_id, n, bytes, unnest(range(0, w * h)) AS k
           FROM geo),
    gi AS (SELECT doc_id,
                  CAST((bytes[CAST((k * 3 + 0) % n AS INT) + 1]
                      + bytes[CAST((k * 3 + 1) % n AS INT) + 1]
                      + bytes[CAST((k * 3 + 2) % n AS INT) + 1]) // 48
                       AS INT) AS bin
           FROM px),
    img AS (SELECT doc_id, bin, count(*) AS n_px FROM gi GROUP BY 1, 2),
    tx AS (SELECT doc_id, n, bytes, unnest(range(0, n // 3)) AS k
           FROM pbytes WHERE n >= 3),
    gt AS (SELECT doc_id,
                  CAST((bytes[CAST(k * 3 AS INT) + 1]
                      + bytes[CAST(k * 3 + 1 AS INT) + 1]
                      + bytes[CAST(k * 3 + 2 AS INT) + 1]) // 48
                       AS INT) AS bin
           FROM tx),
    txt AS (SELECT doc_id, bin, count(*) AS n_tri FROM gt GROUP BY 1, 2),
    dit AS (SELECT i.doc_id, sum(i.n_px * t.n_tri) AS dot_it
            FROM img i JOIN txt t USING (doc_id, bin) GROUP BY 1),
    dii AS (SELECT doc_id, sum(n_px * n_px) AS dot_ii FROM img GROUP BY 1),
    dtt AS (SELECT doc_id, sum(n_tri * n_tri) AS dot_tt FROM txt GROUP BY 1),
    align AS (SELECT doc_id,
                     round(dot_it / sqrt(CAST(dot_ii * dot_tt AS DOUBLE)), 4)
                       AS align_cos
              FROM dit JOIN dii USING (doc_id) JOIN dtt USING (doc_id)),
    {_QUALITY_MEASURES_CTE.strip().rstrip()},
    q AS (SELECT doc_id, {_QUALITY_EXPR} AS quality FROM m),
    centl AS (
      SELECT label, CAST(u.i AS INT) AS pos, round(avg(u.v), 4) + 0.0 AS cval
      FROM (SELECT label,
                   unnest(list_transform(CAST(embedding AS DOUBLE[]),
                          (x, i) -> struct_pack(v := x, i := i))) AS u
            FROM embeddings)
      GROUP BY label, u.i),
    cent AS (SELECT label, list(cval ORDER BY pos) AS c
             FROM centl GROUP BY label),
    embx AS (
      SELECT e.vec_id AS doc_id,
             round(
               list_reduce(list_transform(
                   list_zip(CAST(e.embedding AS DOUBLE[]), c.c),
                   z -> z[1] * z[2]), (a, b) -> a + b)
               / (sqrt(list_reduce(list_transform(
                       CAST(e.embedding AS DOUBLE[]), x -> x * x),
                       (a, b) -> a + b))
                * sqrt(list_reduce(list_transform(c.c, x -> x * x),
                       (a, b) -> a + b))), 4) AS emb_cos
      FROM embeddings e JOIN cent c USING (label))
    SELECT g.doc_id, CAST(g.w AS INT) AS width, CAST(g.h AS INT) AS height,
           q.quality, a.align_cos, x.emb_cos,
           (q.quality >= 0.25 AND a.align_cos >= 0.999
            AND x.emb_cos >= 0.0) AS keep
    FROM geo g
    JOIN align a USING (doc_id)
    JOIN q USING (doc_id)
    JOIN embx x USING (doc_id)
    """,
    note="CLIP-filter curation gate: REAL-decode luminance histogram "
    "vs text byte-triple histogram cosine (exact integer dot/norms, "
    "one double op), shared quality formula, embedding-vs-label-"
    "centroid cosine (4-decimal pinned centroids, 0.0-seeded ordered "
    "folds == DuckDB seedless list_reduce); one verdict row per doc, "
    "payloads never leave the Arrow kernels",
)
def _multimodal_text_align(spark, sf):
    return multimodal.multimodal_text_align(
        _t(spark, sf, "documents"), _t(spark, sf, "embeddings")
    )


@_register(
    "multimodal_image_entropy",
    f"""
    WITH {_PAYLOAD_CTE},
    geo AS (SELECT doc_id, n, bytes,
                   8 + (n % 9) AS w, 8 + ((n * 3) % 9) AS h
            FROM pbytes WHERE n > 0),
    px AS (SELECT doc_id, n, bytes, unnest(range(0, w * h)) AS k
           FROM geo),
    g AS (SELECT doc_id,
                 CAST((bytes[CAST((k * 3 + 0) % n AS INT) + 1]
                     + bytes[CAST((k * 3 + 1) % n AS INT) + 1]
                     + bytes[CAST((k * 3 + 2) % n AS INT) + 1]) // 48
                      AS INT) AS bin
          FROM px),
    hist AS (SELECT doc_id, bin, count(*) AS c FROM g GROUP BY doc_id, bin),
    per AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_px,
             CAST(count(*) AS BIGINT) AS n_bins,
             list(c ORDER BY bin) AS cells
      FROM hist GROUP BY doc_id)
    SELECT doc_id, n_px, n_bins,
           round(log2(n_px)
                 - list_reduce(list_transform(cells, c -> c * log2(c)),
                               (a, b) -> a + b) / n_px, 4) AS entropy
    FROM per
    """,
    note="per-image luminance entropy over the histogram kernel "
    "(contrast/information curation score: blanks and letterboxes "
    "score ~0): exact integer bins, entropy folded in BIN order "
    "(user_behavior_entropy determinism discipline)",
)
def _multimodal_image_entropy(spark, sf):
    return multimodal.image_entropy(
        multimodal.attach_image_payload(_t(spark, sf, "documents"))
    )


@_register(
    "multimodal_audio_wav",
    f"""
    WITH {_PAYLOAD_CTE},
    pcm AS (SELECT doc_id, n,
                   list_transform(bytes, x -> (x - 128) * 256) AS s
            FROM pbytes WHERE n > 0)
    SELECT doc_id,
           CAST(44 + 2 * n AS BIGINT) AS n_bytes,
           CAST(16000 AS INT) AS sample_rate,
           n AS n_samples,
           n / 16.0 AS duration_ms,
           round(sqrt(list_sum(list_transform(s, x -> CAST(x AS DOUBLE) * x)) / n),
                 4) AS rms,
           CAST(list_max(list_transform(s, x -> abs(x))) AS DOUBLE) AS peak
    FROM pcm
    """,
    note="REAL library-free audio path: spec-compliant RIFF/WAVE 16-bit PCM "
    "encoded per doc (sample k = (byte_k - 128) * 256), chunk-walked and "
    "parsed back by the pure-numpy WAV decoder; container size, fmt-chunk "
    "rate and decoded-sample RMS/peak are oracle-reconstructed exactly "
    "(integer-valued float64 sums, so no rounding divergence)",
)
def _multimodal_audio_wav(spark, sf):
    return multimodal.audio_features_wav(
        multimodal.attach_audio_payload(_t(spark, sf, "documents"))
    )


