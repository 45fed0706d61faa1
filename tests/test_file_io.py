"""CSV / JSON-archive source+sink tests (SURVEY.md §2.1 S4-S6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_etl_scripts_showcase__spark.functions import bool_to_int
from data_etl_scripts_showcase__spark.sources import load_table
from data_etl_scripts_showcase__spark.sources.files import (
    read_csv,
    read_json_archive,
    write_csv,
    write_json_archive,
)

SF = "/root/testdata/sf0.001"


class TestCsvRoundtrip:
    def test_header_schema_roundtrip(self, spark, tmp_path):
        """S4+S5: write with header, read back with DECLARED schema —
        values and dtypes survive exactly (no inference)."""
        path = str(tmp_path / "csv")
        src = (
            load_table(spark, SF, "region")
            .select("r_regionkey", "r_name")
            .orderBy("r_regionkey")
        )
        write_csv(src, path)
        back = read_csv(spark, path, "r_regionkey int, r_name string")
        assert back.schema.simpleString() == "struct<r_regionkey:int,r_name:string>"
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))

    def test_bool_int_export_convention(self, spark, tmp_path):
        """F7 at the sink: booleans export as 0/1 (the reference's
        convert_boolean applied to every CSV cell)."""
        path = str(tmp_path / "csvb")
        df = spark.createDataFrame(
            [(1, True), (2, False), (3, None)], "id int, flag boolean"
        ).select("id", bool_to_int("flag").alias("flag"))
        write_csv(df, path)
        back = read_csv(spark, path, "id int, flag int")
        assert {r.id: r.flag for r in back.collect()} == {1: 1, 2: 0, 3: None}


class TestJsonArchive:
    def test_partitioned_archive_replay(self, spark, tmp_path):
        """S6: per-(run, endpoint) archive; replay of one run×endpoint is a
        partition-pruned read, not a filename glob."""
        base = str(tmp_path / "archive")
        d1 = spark.createDataFrame([(1, '{"a":1}'), (2, '{"a":2}')], "k int, body string")
        d2 = spark.createDataFrame([(3, '{"a":3}')], "k int, body string")
        write_json_archive(d1, base, "2026-01-01", "location")
        write_json_archive(d2, base, "2026-01-01", "reviews")
        write_json_archive(d1, base, "2026-01-02", "location")

        one = read_json_archive(spark, base, "k int, body string",
                                run_ds="2026-01-01", endpoint="location")
        assert sorted(r.k for r in one.collect()) == [1, 2]
        everything = read_json_archive(spark, base, "k int, body string")
        assert everything.count() == 5


class TestOrcAndText:
    def test_orc_roundtrip_pushdown(self, spark, tmp_path):
        """ORC sink/source round-trip preserves schema + values, and a
        filtered read pushes the predicate to the ORC scan."""
        from data_etl_scripts_showcase__spark.sources import load_table
        from data_etl_scripts_showcase__spark.sources.files import read_orc, write_orc

        o = load_table(spark, "/root/testdata/sf0.001", "orders")
        p = str(tmp_path / "orders_orc")
        write_orc(o, p)
        back = read_orc(spark, p)
        assert back.schema == o.schema
        assert back.count() == o.count()
        import contextlib
        import io as _io

        from pyspark.sql import functions as F

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            back.where(F.col("o_orderkey") == 7).explain("formatted")
        assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,7)]" in buf.getvalue()

    def test_text_roundtrip(self, spark, tmp_path):
        """Raw-text corpus export: one line per document, read back intact."""
        from data_etl_scripts_showcase__spark.sources import load_table
        from data_etl_scripts_showcase__spark.sources.files import read_text, write_text

        d = load_table(spark, "/root/testdata/sf0.001", "documents")
        p = str(tmp_path / "corpus_txt")
        write_text(d, p, "text")
        back = read_text(spark, p, "text")
        assert back.count() == d.count()
        assert back.columns == ["text"]
        src = {r.text for r in d.select("text").collect()}
        got = {r.text for r in back.collect()}
        assert got == src


class TestPythonDataSourceSink:
    def test_manifest_ignores_orphan_stage_files(self, spark, tmp_path):
        """Two-phase commit contract: readers trust the manifest, so an
        orphaned stage file (a failed/zombie task's output) is invisible."""
        from data_etl_scripts_showcase__spark.sources.restpages import (
            read_manifest,
            register_restpages,
        )

        register_restpages(spark)
        out = str(tmp_path / "sink")
        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
        )
        df.write.format("restpost").option("path", out).mode("append").save()

        # zombie task drops an uncommitted stage file
        with open(f"{out}/stage-zombie.jsonl", "w") as f:
            f.write('{"k": 99, "v": "ghost"}\n')

        back = read_manifest(spark, out, "k bigint, v string")
        assert sorted((r.k, r.v) for r in back.collect()) == [
            (1, "a"), (2, "b"), (3, "c")
        ]


class TestRestEndpointFetcher:
    """The REAL HTTP fetcher behind the `endpoint` option (VERDICT r5 #7):
    a recorded-fixture server on localhost replays the synthetic rows over
    genuine HTTP, and the source must return byte-identical output on both
    paths — proving the production path changes ONLY where the bytes come
    from, never what Spark sees.  The env-var form is resolved driver-side
    at plan time (documented in sources/restpages.py)."""

    @staticmethod
    def _serve_fixture():
        import json
        import threading
        from http.server import BaseHTTPRequestHandler, HTTPServer
        from urllib.parse import parse_qs, urlparse

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                qs = parse_qs(urlparse(self.path).query)
                page = int(qs["page"][0])
                size = int(qs["page_size"][0])
                items = [
                    {
                        "page": page,
                        "item_id": page * 1000 + i,
                        "payload": f"item-{page}-{i}",
                    }
                    for i in range(size)
                ]
                body = json.dumps({"items": items}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # keep pytest output clean
                pass

        srv = HTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv, f"http://127.0.0.1:{srv.server_address[1]}/items"

    def test_http_path_identical_to_synthetic(self, spark):
        from data_etl_scripts_showcase__spark.sources.restpages import (
            register_restpages,
        )

        register_restpages(spark)
        srv, url = self._serve_fixture()
        try:
            via_http = sorted(
                tuple(r)
                for r in spark.read.format("restpages")
                .option("pages", 3)
                .option("page_size", 7)
                .option("endpoint", url)
                .load()
                .collect()
            )
            synthetic = sorted(
                tuple(r)
                for r in spark.read.format("restpages")
                .option("pages", 3)
                .option("page_size", 7)
                .load()
                .collect()
            )
        finally:
            srv.shutdown()
        assert via_http == synthetic
        assert len(via_http) == 21

    def test_streaming_offsets_over_http(self, spark, tmp_path):
        """The page-cursor offset discipline holds on the HTTP path too:
        two checkpointed availableNow runs together read every page
        exactly once (the simple stream reader drains one micro-batch of
        ``batch_pages`` per run)."""
        from data_etl_scripts_showcase__spark.sources.restpages import (
            register_restpages,
        )

        register_restpages(spark)
        srv, url = self._serve_fixture()
        ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "rows")

        def drain() -> None:
            q = (
                spark.readStream.format("restpages")
                .option("pages", 4)
                .option("page_size", 5)
                .option("batch_pages", 2)
                .option("endpoint", url)
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        try:
            drain()
            assert spark.read.parquet(out).count() == 10  # pages 0-1
            drain()
            rows = sorted(tuple(r) for r in spark.read.parquet(out).collect())
        finally:
            srv.shutdown()
        assert len(rows) == 20 and len(set(rows)) == 20  # all 4, no replay
