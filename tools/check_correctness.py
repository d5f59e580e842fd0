"""Local stand-in for the driver's correctness gate.

Runs every ``REGISTRY`` query through Spark and, where an oracle exists,
the same query through DuckDB over the same parquet tables; compares
row count, column names, and order-insensitive values (exact and
allclose).  Usage::

    python tools/check_correctness.py [--perturb] [sf_dir] [query ...]

Defaults to /root/testdata/sf0.01 and all queries.

``--perturb`` (r7 verdict item 2 — flaky-certification sweep): instead
of comparing against DuckDB, run each query TWICE — once under the
normal session and once under a perturbed physical layout (different
shuffle-partition count, tiny Arrow batches so mapInPandas kernels see
different batch boundaries, small scan splits so inputs split
differently) — and require the two results to be EXACTLY equal
(order-insensitive, bit-level on floats).  Any query whose output moves
under perturbation has an order-dependent certification (the
embedding_covariance r7 flake) and must be re-contracted to
order-independent math.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

from world_vaccination_coverage_etl_spark.queries import REGISTRY  # noqa: E402
from world_vaccination_coverage_etl_spark.queries._core import (  # noqa: E402
    clear_pools,
    resolve_oracle,
)
from world_vaccination_coverage_etl_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):  # Spark-written directory table
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by all values — order-insensitive."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> tuple[bool, str]:
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return False, f"schema {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    if len(spark_pdf) != len(duck_pdf):
        return False, f"rows {len(spark_pdf)} vs {len(duck_pdf)}"
    a, b = canon(spark_pdf), canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(np.asarray(av).dtype, np.floating) or np.issubdtype(
            np.asarray(bv).dtype, np.floating
        ):
            av = np.asarray(av, dtype="float64")
            bv = np.asarray(bv, dtype="float64")
            nan_match = np.isnan(av) == np.isnan(bv)
            both = ~np.isnan(av) & ~np.isnan(bv)
            if not nan_match.all() or not np.array_equal(av[both], bv[both]):
                close = nan_match.all() and np.allclose(av[both], bv[both], rtol=1e-9, atol=1e-9)
                worst = (
                    float(np.max(np.abs(av[both] - bv[both]))) if both.any() else 0.0
                )
                return False, f"col {c} differs (allclose={close}, worst={worst:.3e})"
        else:
            if not a[c].astype(str).equals(b[c].astype(str)):
                i = (a[c].astype(str) != b[c].astype(str)).idxmax()
                return False, f"col {c} differs at row {i}: {a[c][i]!r} vs {b[c][i]!r}"
    return True, "ok"


# Perturbed physical layout: odd shuffle-partition count, tiny Arrow
# batches (mapInPandas kernels see different batch boundaries), small
# scan splits (different input partitioning).  All runtime-settable.
_PERTURB_CONFS = {
    "spark.sql.shuffle.partitions": "5",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "97",
    "spark.sql.files.maxPartitionBytes": "262144",
}


def run_perturb_sweep(spark, sf_dir: str, only: set[str] | None) -> int:
    """Spark-vs-Spark: every query must be layout-invariant (exact)."""
    n_pass = n_fail = 0
    results: dict[str, dict] = {}
    for name, qd in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            # pooled queries must recompute under BOTH layouts — a
            # pool hit would replay run 1's parquet and prove nothing
            clear_pools()
            base_pdf = qd.fn(spark, sf_dir).toPandas()
            saved = {k: spark.conf.get(k, None) for k in _PERTURB_CONFS}
            try:
                for k, v in _PERTURB_CONFS.items():
                    spark.conf.set(k, v)
                clear_pools()
                pert_pdf = qd.fn(spark, sf_dir).toPandas()
            finally:
                for k, v in saved.items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)
        except Exception as exc:  # noqa: BLE001
            traceback.print_exc(limit=3)
            print(f"FAIL  {name:28s} error: {type(exc).__name__}: {str(exc)[:200]}")
            n_fail += 1
            results[name] = {"ok": False, "why": f"error: {exc}"[:300]}
            continue
        dt = time.time() - t0
        ok, why = compare(base_pdf, pert_pdf)
        status = "PASS" if ok else "FAIL"
        n_pass += ok
        n_fail += not ok
        results[name] = {"ok": bool(ok), "why": None if ok else why}
        print(f"{status}  {name:28s} rows={len(base_pdf)} ({dt:.1f}s) {'' if ok else why}")
    out = os.path.join(REPO_DIR, ".scale", "perturb_sweep.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    # merge with prior runs so a targeted re-check of new queries never
    # clobbers the full-registry record
    if os.path.exists(out):
        try:
            prior = json.load(open(out)).get("results", {})
        except Exception:  # noqa: BLE001
            prior = {}
        results = {**prior, **results}
    with open(out, "w") as fh:
        json.dump({"confs": _PERTURB_CONFS, "results": results}, fh, indent=1)
    print(f"\nperturb sweep: {n_pass} invariant, {n_fail} moved -> {out}")
    return 1 if n_fail else 0


def main() -> int:
    args = sys.argv[1:]
    perturb = "--perturb" in args
    args = [a for a in args if a != "--perturb"]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.01", args
    only = set(names) or None
    spark = get_spark("correctness-check")
    if perturb:
        return run_perturb_sweep(spark, sf_dir, only)
    con = duck_connect(sf_dir)
    n_pass = n_fail = n_rows_only = 0
    for name, qd in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = qd.fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            traceback.print_exc(limit=3)
            print(f"FAIL  {name:28s} spark-error: {type(exc).__name__}: {str(exc)[:200]}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if qd.oracle is None:
            print(f"ROWS  {name:28s} rows={len(spark_pdf)} ({dt:.1f}s) [rows-only]")
            n_rows_only += 1
            continue
        try:
            duck_pdf = con.execute(resolve_oracle(qd, sf_dir)).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name:28s} duckdb-error: {str(exc)[:200]}")
            n_fail += 1
            continue
        ok, why = compare(spark_pdf, duck_pdf)
        status = "PASS" if ok else "FAIL"
        if ok:
            n_pass += 1
        else:
            n_fail += 1
        print(f"{status}  {name:28s} rows={len(spark_pdf)} ({dt:.1f}s) {why if not ok else ''}")
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
