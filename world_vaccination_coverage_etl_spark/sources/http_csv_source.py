"""HTTP CSV as a first-class Spark data source (Python DataSource API).

The reference's extract step is a driver-side ``requests.get`` of the
OWID grapher CSV followed by an in-process pandas parse (reference
etl_pipeline.py:28-31,51-53, 60 s timeout).  The engine's original
port kept that shape (sources/csv_source.py: driver download → staged
file → ``spark.read.csv``).  This module upgrades the operator to the
Spark 4 Python DataSource API so the fetch itself is part of the
query plan:

- ``spark.read.format("http_csv").schema(ddl).option("urls", ...)`` —
  no driver staging, no temp files;
- one input partition PER URL: a multi-extract load (sharded exports,
  per-year files) fetches and parses in parallel ON EXECUTORS, which
  is the 100 TB posture — the driver never touches the bytes;
- rows are delivered to the JVM as Arrow RecordBatches (the fast
  path the API offers), not per-row Python tuples;
- the reference's column contract is preserved: header names resolve
  case-insensitively (etl_pipeline.py:56-58), missing declared columns
  surface as typed NULLs, undeclared CSV columns are dropped — the
  schema-drift guard stays where it was, ahead of the plan.

``file://`` URLs are supported for hermetic tests; ``http(s)://`` uses
stdlib urllib with the reference's 60 s default timeout (no external
deps).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _UrlPartition(InputPartition):
    def __init__(self, idx: int, url: str):
        super().__init__(idx)
        self.url = url


def _arrow_type(spark_type_name: str):
    import pyarrow as pa

    return {
        "string": pa.string(),
        "int": pa.int32(),
        "integer": pa.int32(),
        "bigint": pa.int64(),
        "long": pa.int64(),
        "double": pa.float64(),
        "float": pa.float32(),
        "boolean": pa.bool_(),
        "date": pa.date32(),
    }[spark_type_name]


class HttpCsvReader(DataSourceReader):
    def __init__(self, schema, options):
        self._schema = schema
        urls = options.get("urls") or options.get("path") or ""
        self._urls = [u.strip() for u in urls.split(",") if u.strip()]
        if not self._urls:
            raise ValueError("http_csv requires option 'urls' (comma-separated)")
        self._timeout = float(options.get("timeout", "60"))
        self._pushed: list = []

    def pushFilters(self, filters):
        """Handle conjunctive EqualTo filters inside the source: rows are
        dropped right after the parse, before Arrow serialization and the
        Python→JVM hop.  (For a remote CSV nothing is skipped server-side —
        the win is transfer volume out of the Python worker, which is why
        only the cheap equality case is claimed.)  Everything else is
        returned to Spark for post-scan evaluation."""
        from pyspark.sql.datasource import EqualTo

        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1:
                self._pushed.append(f)
            else:
                yield f

    def partitions(self):
        return [_UrlPartition(i, u) for i, u in enumerate(self._urls)]

    def read(self, partition):
        import io
        import urllib.request

        import pandas as pd
        import pyarrow as pa

        with urllib.request.urlopen(
            partition.url, timeout=self._timeout
        ) as resp:
            raw = resp.read()
        pdf = pd.read_csv(io.BytesIO(raw))
        # case-insensitive header resolution — the reference contract
        lower_to_actual = {c.lower(): c for c in pdf.columns}
        for f in self._pushed:
            actual = lower_to_actual.get(f.attribute[0].lower())
            if actual is not None:
                pdf = pdf[pdf[actual] == f.value]
        pdf = pdf.reset_index(drop=True)
        fields = []
        arrays = []
        n = len(pdf)
        for f in self._schema.fields:
            at = _arrow_type(f.dataType.simpleString())
            actual = lower_to_actual.get(f.name.lower())
            if actual is None:
                arrays.append(pa.nulls(n, type=at))
            else:
                arrays.append(
                    pa.array(pdf[actual], type=at, from_pandas=True)
                )
            fields.append(pa.field(f.name, at))
        table = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
        yield from table.to_batches()


class HttpCsvDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "http_csv"

    def schema(self):
        # an explicit schema is required: CSV-over-HTTP inference would
        # need a driver-side fetch, exactly what this source removes.
        raise NotImplementedError(
            "http_csv requires an explicit .schema(...) — inference would "
            "re-introduce the driver-side fetch this source removes"
        )

    def reader(self, schema) -> DataSourceReader:
        return HttpCsvReader(schema, self.options)

    def simpleStreamReader(self, schema):
        return HttpCsvStreamReader(schema, self.options)


def register_http_csv(spark) -> None:
    """Idempotently register the source on a session.

    Python-data-source filter pushdown is gated off by default
    (`spark.sql.python.filterPushdown.enabled`); the reader implements
    `pushFilters`, so registration enables the runtime conf alongside.
    """
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(HttpCsvDataSource)


def _fetch_pdf(url: str, timeout: float):
    """Fetch one CSV URL → pandas frame (shared by batch + stream)."""
    import io
    import urllib.request

    import pandas as pd

    with urllib.request.urlopen(url, timeout=timeout) as resp:
        raw = resp.read()
    return pd.read_csv(io.BytesIO(raw))


def _conform_tuples(pdf, schema):
    """Rows as tuples in declared-field order, case-insensitive header
    resolution, None for missing declared columns (the same contract the
    batch reader applies via Arrow)."""
    lower_to_actual = {c.lower(): c for c in pdf.columns}
    cols = []
    for f in schema.fields:
        actual = lower_to_actual.get(f.name.lower())
        if actual is None:
            cols.append([None] * len(pdf))
        else:
            vals = pdf[actual]
            cols.append([None if v != v else v for v in vals.tolist()])
    return list(zip(*cols)) if len(pdf) else []


class HttpCsvStreamReader(SimpleDataSourceStreamReader):
    """Manifest-driven incremental ingest: the stream's offset is how
    many lines of a manifest (one CSV URL per line, append-only) have
    been consumed.  Each micro-batch fetches exactly the URLs appended
    since the last committed offset — the idiom behind file-drop /
    export-feed ingestion where an upstream system publishes a new
    extract URL per period.

    The *simple* stream reader contract runs fetches on the DRIVER —
    right for control-plane-sized feeds (a weekly OWID extract, the
    reference's cadence); bulk backfills belong to the batch reader,
    which parallelizes per URL on executors.  Offsets are checkpointed
    by the engine, so a restarted query resumes after the last
    committed manifest line, and `readBetweenOffsets` replays a batch
    deterministically for recovery.
    """

    def __init__(self, schema, options):
        self._schema = schema
        self._manifest = options.get("manifest")
        if not self._manifest:
            raise ValueError("http_csv stream requires option 'manifest'")
        self._timeout = float(options.get("timeout", "60"))

    def _urls(self):
        import urllib.request

        if "://" in self._manifest:
            with urllib.request.urlopen(
                self._manifest, timeout=self._timeout
            ) as r:
                text = r.read().decode()
        else:
            with open(self._manifest) as f:
                text = f.read()
        return [ln.strip() for ln in text.splitlines() if ln.strip()]

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _rows_for(self, urls):
        rows = []
        for u in urls:
            rows.extend(
                _conform_tuples(_fetch_pdf(u, self._timeout), self._schema)
            )
        return rows

    def read(self, start: dict):
        urls = self._urls()
        i = int(start["i"])
        return iter(self._rows_for(urls[i:])), {"i": len(urls)}

    def readBetweenOffsets(self, start: dict, end: dict):
        urls = self._urls()[int(start["i"]):int(end["i"])]
        return iter(self._rows_for(urls))
