"""Runnable demo: the http_csv DataSource, batch + streaming.

    python examples/ingest_http_csv.py [csv_path_or_url ...]

Defaults to the bundled ``wide_sample.csv``.  Shows the two ingest
shapes the engine offers for the reference's extract step:

1. BATCH — ``spark.read.format("http_csv")`` with one input partition
   per URL (executor-parallel fetch+parse), followed by the reference
   ETL's unpivot into the tidy fact shape;
2. STREAMING — a manifest file listing the same URLs, consumed
   incrementally with checkpointed offsets (run the script twice with
   the same scratch dir and the second run ingests nothing new).
"""

from __future__ import annotations

import os
import pathlib
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from world_vaccination_coverage_etl_spark.operators.reshape import (  # noqa: E402
    unpivot_measures,
)
from world_vaccination_coverage_etl_spark.session import get_spark  # noqa: E402
from world_vaccination_coverage_etl_spark.sources.http_csv_source import (  # noqa: E402
    register_http_csv,
)


def main() -> int:
    here = pathlib.Path(__file__).parent
    urls = sys.argv[1:] or [pathlib.Path(here / "wide_sample.csv").as_uri()]
    urls = [
        u if "://" in u else pathlib.Path(u).resolve().as_uri() for u in urls
    ]

    spark = get_spark("http-csv-demo")
    spark.sparkContext.setLogLevel("ERROR")
    register_http_csv(spark)

    # peek at the header to declare the schema (the source requires one;
    # a real deployment declares its contract up front)
    import csv as _csv
    import urllib.request

    with urllib.request.urlopen(urls[0], timeout=60) as r:
        header = next(_csv.reader([r.readline().decode()]))
    ddl = ", ".join(
        f"`{c}` double" if c.lower().startswith("coverage__")
        else (f"`{c}` int" if c.lower() == "year" else f"`{c}` string")
        for c in header
    )

    wide = (
        spark.read.format("http_csv")
        .schema(ddl)
        .option("urls", ",".join(urls))
        .load()
    )
    print(f"[batch] {wide.count()} rows from {len(urls)} url(s), "
          f"{wide.rdd.getNumPartitions()} partition(s)")

    measures = [c for c in wide.columns if c.lower().startswith("coverage__")]
    id_cols = [c for c in wide.columns if c.lower() in ("entity", "year")]
    tidy = unpivot_measures(
        wide, ids=id_cols, values=measures,
        variable_col="antigen", value_col="coverage_pct",
    )
    print(f"[batch] tidy fact rows: {tidy.count()}")
    tidy.show(5, truncate=False)

    scratch = tempfile.mkdtemp(prefix="http_csv_demo_")
    manifest = os.path.join(scratch, "manifest.txt")
    with open(manifest, "w") as f:
        f.write("\n".join(urls) + "\n")
    q = (
        spark.readStream.format("http_csv")
        .schema(ddl)
        .option("manifest", manifest)
        .load()
        .writeStream.format("parquet")
        .option("path", os.path.join(scratch, "out"))
        .option("checkpointLocation", os.path.join(scratch, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = spark.read.parquet(os.path.join(scratch, "out")).count()
    print(f"[stream] ingested {n} rows via manifest; scratch={scratch}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
