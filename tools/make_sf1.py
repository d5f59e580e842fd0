"""Materialize an sf1 warehouse: deterministic 10x amplification of sf0.1.

The driver ships sf0.001/0.01/0.1 only; the 100 TB posture needs at
least one whole-registry run an order of magnitude past the bench SF
to certify cost-curve SHAPE (r5 verdict item 1).  This writes a
parquet warehouse with the same schemas to ``.scale/sf1`` (gitignored;
/root/testdata is read-only) so every registry query and bench.py can
run against it unmodified via ``SPARK_GRAFT_SF_DIR``.

Amplification (seeded by the copy index c in 0..9, same scheme as
tools/scale_probe.py):

- facts get 10 copies with ids shifted into disjoint ranges
  (``+ c * 10_000_000``): orders.o_orderkey and lineitem.l_orderkey
  shift TOGETHER so order-lineitem join fan-out is preserved;
  events.event_id, documents.doc_id, embeddings.vec_id likewise.
- dimension tables (region nation customer supplier part) stay 1x —
  the scaled-fact-vs-fixed-dim shape every broadcast-join plan in the
  repo is designed for (and dim FKs in the copies remain valid).
- documents: copy 0 keeps original text (true duplicate groups
  survive); copies 1..9 append a copy marker (near-dup variants) and
  recompute n_chars, so content-hash dedup sees realistic group
  structure rather than 10 exact clones per doc.
- embeddings: copy 0 exact; copies 1..9 perturb each component by a
  small copy-dependent affine nudge, so LSH/ANN see 10x distinct
  vectors (10 exact clones per vector would inflate bucket occupancy
  quadratically in a way real 10x data does not).

Doc-id safety: registry self-union fixtures shift by DOC_SHIFT=1e6;
original ids are far below 1e6, so c*1e7 amplification ranges and the
+1e6 union shift can never collide.

Usage: python tools/make_sf1.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from world_vaccination_coverage_etl_spark.session import get_spark  # noqa: E402

SHIFT = 10_000_000
COPIES = 10
DIMS = ["region", "nation", "customer", "supplier", "part"]


def _copies(df):
    return df.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))).alias("__c"),
    )


def _shift(out, *cols):
    for c in cols:
        out = out.withColumn(c, F.col(c) + F.col("__c") * F.lit(SHIFT))
    return out


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = (
        sys.argv[2] if len(sys.argv) > 2 else os.path.join(root, ".scale", "sf1")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("make_sf1")

    def rd(t):
        return spark.read.parquet(os.path.join(src, f"{t}.parquet"))

    def wr(df, t):
        # one flat parquet FILE per table, like the driver's layout,
        # so load_table's footer probe and globbing behave identically
        tmp = os.path.join(out_dir, f"_{t}_tmp")
        df.coalesce(4).write.mode("overwrite").parquet(tmp)
        import glob
        import shutil

        parts = sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))
        dest = os.path.join(out_dir, f"{t}.parquet")
        if len(parts) == 1:
            shutil.move(parts[0], dest)
            shutil.rmtree(tmp)
        else:
            # multi-file: keep as directory named <t>.parquet
            if os.path.isdir(dest) or os.path.isfile(dest):
                shutil.rmtree(dest, ignore_errors=True) if os.path.isdir(
                    dest
                ) else os.remove(dest)
            shutil.move(tmp, dest)
        n = spark.read.parquet(dest).count()
        print(f"[make_sf1] {t}: {n} rows", file=sys.stderr)

    for t in DIMS:
        wr(rd(t), t)

    wr(_shift(_copies(rd("orders")), "o_orderkey").drop("__c"), "orders")
    wr(_shift(_copies(rd("lineitem")), "l_orderkey").drop("__c"), "lineitem")
    wr(_shift(_copies(rd("events")), "event_id").drop("__c"), "events")

    docs = _shift(_copies(rd("documents")), "doc_id")
    docs = docs.withColumn(
        "text",
        F.when(F.col("__c") == 0, F.col("text")).otherwise(
            F.concat(F.col("text"), F.lit(" c"), F.col("__c"))
        ),
    ).withColumn("n_chars", F.length("text").cast("int"))
    wr(docs.drop("__c"), "documents")

    emb = _shift(_copies(rd("embeddings")), "vec_id")
    emb = emb.withColumn(
        "embedding",
        F.when(F.col("__c") == 0, F.col("embedding")).otherwise(
            F.transform(
                "embedding",
                lambda x, i: (
                    x * (F.lit(1.0) + F.col("__c") * F.lit(0.003))
                    + F.col("__c") * F.lit(0.011)
                    + i * F.lit(0.0)
                ).cast("float"),
            )
        ),
    )
    wr(emb.drop("__c"), "embeddings")
    print(f"[make_sf1] wrote {out_dir}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
