"""Custom Python Data Source: a paginated keyed REST endpoint as a
first-class Spark source (Spark 4 Python Data Source API).

The reference consumes paginated REST APIs with a driver-side while-loop
over ``nextPageToken`` (`buisness_profile_etl/main.py:296-308, 414-428` —
SURVEY §2.1 S7/S8): every page is a blocking round-trip in one Python
process.  The engine-native form is a DataSource whose PARTITIONS are the
pages: Spark schedules one task per page, so pages download in parallel
across executors, failed pages retry independently via normal task retry,
and downstream operators see an ordinary DataFrame — the U1 union of
pages is implicit in the scan.

The default fetcher is a deterministic synthetic endpoint (the same
network-free seam as the enrichment stage, `enrichment/stage.py`): page p
yields `page_size` items with arithmetic ids and templated payloads, so
the DuckDB oracle regenerates the exact rows and the source is value-hash
verifiable end-to-end.  The REAL fetcher is wired behind the ``endpoint``
option (or the ``SPARK_GRAFT_REST_ENDPOINT`` env var, read DRIVER-side at
plan time and shipped to executors inside the pickled reader): when set,
each page is one ``GET {endpoint}?page=N&page_size=M`` returning
``{"items": [{"page", "item_id", "payload"}, ...]}`` — everything
Spark-side (schema declaration, partition planning, per-task iteration,
Arrow transfer, offset checkpointing) is identical on both paths, which is
what the recorded-fixture test pins (tests/test_file_io.py serves the
synthetic rows over localhost HTTP and asserts byte-identical output).
"""

from __future__ import annotations

import os as _os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class PagePartition(InputPartition):
    def __init__(self, page: int, page_size: int):
        self.page = page
        self.page_size = page_size


def _resolve_endpoint(options) -> str | None:
    """Real-endpoint URL: explicit option wins, else the env var — read on
    the DRIVER (executor Python workers inherit the JVM's env, not the
    test's; baking the value into the pickled reader avoids that trap)."""
    return options.get("endpoint") or _os.environ.get(
        "SPARK_GRAFT_REST_ENDPOINT"
    )


def _fetch_page(
    page: int, page_size: int, endpoint: str | None = None
) -> Iterator[tuple]:
    """One page of items: HTTP GET when an endpoint is wired, else the
    deterministic mock rows (page, page*1000+i, templated payload)."""
    if endpoint:
        import json
        import urllib.request

        url = f"{endpoint}?page={page}&page_size={page_size}"
        with urllib.request.urlopen(url, timeout=30) as resp:
            items = json.load(resp)["items"]
        for it in items:
            yield (int(it["page"]), int(it["item_id"]), str(it["payload"]))
        return
    for i in range(page_size):
        yield (page, page * 1000 + i, f"item-{page}-{i}")


class RestPagesDataSource(DataSource):
    """``spark.read.format("restpages").option("pages", 4)`` source."""

    @classmethod
    def name(cls) -> str:
        return "restpages"

    def schema(self) -> str:
        return "page int, item_id bigint, payload string"

    def reader(self, schema) -> "RestPagesReader":
        return RestPagesReader(self.options)

    def simpleStreamReader(self, schema) -> "RestPagesStreamReader":
        return RestPagesStreamReader(self.options)


class RestPagesReader(DataSourceReader):
    def __init__(self, options):
        self.n_pages = int(options.get("pages", 4))
        self.page_size = int(options.get("page_size", 25))
        self.endpoint = _resolve_endpoint(options)

    def partitions(self):
        # one Spark task per page — pagination parallelised by the scheduler
        return [PagePartition(p, self.page_size) for p in range(self.n_pages)]

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        return _fetch_page(partition.page, partition.page_size, self.endpoint)


class RestPagesStreamReader(SimpleDataSourceStreamReader):
    """The same endpoint as an UNBOUNDED source: the stream OFFSET is the
    next unread page index — exactly the reference's ``nextPageToken``
    cursor (`main.py:296-308`), promoted to a checkpointed streaming
    offset.  Each micro-batch reads up to ``batch_pages`` new pages;
    `readBetweenOffsets` replays any committed page range verbatim
    (deterministic fetcher), which is what makes recovery exactly-once:
    after a crash, Spark re-asks for [start, end) and gets identical
    rows.  A real endpoint would look up the stored page cursor the same
    way."""

    def __init__(self, options):
        self.n_pages = int(options.get("pages", 6))
        self.page_size = int(options.get("page_size", 25))
        self.batch_pages = int(options.get("batch_pages", 2))
        self.endpoint = _resolve_endpoint(options)

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict):
        p0 = int(start["page"])
        p1 = min(p0 + self.batch_pages, self.n_pages)
        rows = [
            r
            for p in range(p0, p1)
            for r in _fetch_page(p, self.page_size, self.endpoint)
        ]
        return iter(rows), {"page": p1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [
                r
                for p in range(int(start["page"]), int(end["page"]))
                for r in _fetch_page(p, self.page_size, self.endpoint)
            ]
        )

    def commit(self, end: dict) -> None:
        pass  # nothing to acknowledge on the mock endpoint


class StagedFile(WriterCommitMessage):
    """Per-task commit message: the staged batch file this task produced."""

    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class RestPostDataSource(DataSource):
    """``df.write.format("restpost").option("path", dir)`` sink.

    The reference's only sinks are a full-file CSV rewrite per appended
    row (`main.py:710-715` — the O(n²) anti-pattern) and a blocking GCS
    upload with a sleep-based consistency wait (`Gonukkad_Merchants.py:
    126-157`).  This is the engine-native custom sink: each task POSTs
    its partition as one batch (mocked as a staged JSONL file) and
    returns a commit message; the driver's ``commit`` publishes a
    manifest ATOMICALLY listing exactly the acknowledged batches, and
    ``abort`` discards staged output — the standard two-phase commit
    that gives a REST/object-store sink all-or-nothing visibility with
    no sleeps.  Readers trust only the manifest, so a failed task's
    orphan stage files are invisible.
    """

    @classmethod
    def name(cls) -> str:
        return "restpost"

    def schema(self) -> str:  # sink-only source; schema comes from the df
        return "unused string"

    def writer(self, schema, overwrite: bool) -> "RestPostWriter":
        return RestPostWriter(self.options)


class RestPostWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator) -> StagedFile:
        """Executor-side: one 'POST batch' per partition → staged file."""
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f"stage-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return StagedFile(fname, n)

    def commit(self, messages) -> None:
        """Driver-side: publish the manifest of acknowledged batches."""
        import json
        import os

        manifest = {
            "files": sorted(m.path for m in messages),
            "n_rows": sum(m.n_rows for m in messages),
        }
        tmp = os.path.join(self.path, "_MANIFEST.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path, "_MANIFEST"))  # atomic publish

    def abort(self, messages) -> None:
        import os

        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass


def read_manifest(spark, path: str, schema: str):
    """Read back ONLY the batches the manifest acknowledges."""
    import json
    import os

    with open(os.path.join(path, "_MANIFEST")) as f:
        manifest = json.load(f)
    return spark.read.schema(schema).json(manifest["files"])


def register_restpages(spark) -> None:
    """Idempotently register the connector's source and sink."""
    for ds in (RestPagesDataSource, RestPostDataSource):
        try:
            spark.dataSource.register(ds)
        except Exception:
            pass  # already registered in this session
