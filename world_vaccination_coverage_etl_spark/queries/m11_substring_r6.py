"""Round-6 additions: exact duplicated-substring spans.

Registered in a module imported LAST so the new entry sits behind the
r5 never-certified backlog in definition order (the certification
rotation's age proxy — see tools/rotation_audit.py).
"""

from ._core import *  # noqa: F401,F403


@register(
    "substring_dup_spans",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)),
                 '[^a-zA-Z0-9]+'), x -> x <> '') AS toks
      FROM documents),
    wins AS (
      SELECT doc_id, r.i AS pos,
             array_to_string(toks[r.i+1:r.i+10], ' ') AS w
      FROM toks, UNNEST(range(0, len(toks) - 10 + 1)) AS r(i)
      WHERE len(toks) >= 10),
    dup AS (SELECT w FROM wins GROUP BY w HAVING count(*) >= 2),
    flag AS (SELECT doc_id, pos FROM wins WHERE w IN (SELECT w FROM dup)),
    lagged AS (
      SELECT doc_id, pos,
             lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM flag),
    isl AS (
      SELECT doc_id, pos,
             sum(CASE WHEN prev IS NULL OR pos - prev > 10
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM lagged)
    SELECT doc_id, span_start, span_end, n_dup_windows FROM (
      SELECT doc_id, min(pos) AS span_start, max(pos) + 9 AS span_end,
             count(*) AS n_dup_windows
      FROM isl GROUP BY doc_id, island)
    ORDER BY doc_id, span_start
    """,
    note="exact duplicated-substring spans at 10-token-window granularity "
    "(operators/dedup.py substring_dup_spans) — the suffix-array corpus dedup "
    "criterion of Lee et al. 2022 in k-window form: duplicated k-windows are "
    "flagged corpus-wide and merged per doc into maximal spans; oracle "
    "re-derives the spans over window STRINGS where the operator groups on "
    "xxhash64, so the hash-for-string substitution is certified too",
)
def q_substring_dup_spans(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return substring_dup_spans(d, k=10)
