"""Keyed-enrichment stage (SURVEY.md §2.1 S7-S9, §2.11).

The reference enriches one merchant at a time with 8+ blocking HTTP calls in
a single thread (/root/reference/buisness_profile_etl/main.py:475-585), with
`nextPageToken` pagination loops (main.py:296-308, 414-428) and OAuth
exchange (main.py:116-138) inline.  Spark-first shape:

- the driving table stays a DataFrame; enrichment runs inside ``mapInPandas``
  — per-partition Arrow batches, so a 1000-executor cluster makes
  1000 × batch concurrent key fetches instead of 1;
- the fetcher is injected (auth + pagination live inside it), so tests and
  the oracle gate use a deterministic mock while production plugs a real
  HTTP client — the only place control leaves the SQL engine;
- responses come back as ONE json string column, parsed with an explicit
  ``from_json`` schema (never inferred — SURVEY §1.2), after which the
  whole shred/aggregate/case section is a declarative plan.

The mock fetcher is a pure function of the key via md5, which makes every
downstream value reproducible in ANSI SQL — the flagship pipeline is
oracle-checked end to end, mock network included.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable, Iterator
from datetime import date, timedelta

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Declared response schema (explicit, never inferred — SURVEY §1.2).
RESPONSE_SCHEMA = (
    "title string, rating double, review_count int, "
    "media struct<has_cover:boolean, has_menu:boolean>, "
    "metrics array<struct<metric:string, values:array<string>>>, "
    "posts array<struct<topicType:string, createTime:string>>, "
    "status struct<suspended:boolean, pending:boolean, "
    "hasVoiceOfMerchant:boolean, hasBusinessAuthority:boolean, "
    "duplicate:boolean>"
)

METRICS = ["CALL_CLICKS", "WEBSITE_CLICKS", "DIRECTIONS"]
PAGE_SIZE = 2  # posts per page (forces the pagination loop to run)


def _hx(s: str, lo: int, hi: int) -> int:
    """Integer from md5 hex substring [lo, hi) — the mock's entropy source."""
    return int(hashlib.md5(s.encode()).hexdigest()[lo:hi], 16)


def mock_fetch_page(key: str, page_token: int | None = None) -> dict:
    """Deterministic mock of the keyed REST endpoint (S7) with pagination (S8).

    Every field derives from md5 of the key, so the DuckDB oracle can
    recompute the enriched output exactly.  Values marked 'n/a' exercise
    the lossy-int skip (F8).  Pages carry PAGE_SIZE posts each and a
    ``nextPageToken`` until exhausted.
    """
    start = page_token or 0
    n_posts = 1 + _hx(f"loc:{key}", 0, 4) % 4
    posts = []
    for i in range(start, min(start + PAGE_SIZE, n_posts)):
        hp = _hx(f"post:{key}:{i}", 0, 4)
        d = date(2023, 1, 1) + timedelta(days=hp % 365)
        posts.append(
            {
                "topicType": "OFFER" if hp % 2 == 0 else "STANDARD",
                "createTime": d.strftime("%Y-%m-%dT00:00:00.000000Z"),
            }
        )
    page: dict = {"posts": posts}
    if start + PAGE_SIZE < n_posts:
        page["nextPageToken"] = start + PAGE_SIZE
    if start == 0:
        h = f"loc:{key}"
        s1 = _hx(h, 8, 12) % 5
        page.update(
            {
                "title": f"Biz {key}",
                "rating": (10 + _hx(h, 0, 4) % 41) / 10.0,
                "review_count": _hx(h, 4, 8) % 500,
                "media": {
                    "has_cover": _hx(h, 12, 16) % 2 == 0,
                    "has_menu": _hx(h, 16, 20) % 2 == 0,
                },
                "metrics": [
                    {
                        "metric": m,
                        "values": [
                            (
                                "n/a"
                                if _hx(f"{m}:{key}:{i}", 0, 4) % 17 == 0
                                else str(_hx(f"{m}:{key}:{i}", 0, 4) % 100)
                            )
                            for i in range(7)
                        ],
                    }
                    for m in METRICS
                ],
                "status": {
                    "suspended": s1 == 0,
                    "pending": s1 == 1,
                    "hasVoiceOfMerchant": s1 == 2,
                    "hasBusinessAuthority": s1 == 2,
                    "duplicate": s1 == 3,
                },
            }
        )
    return page


def fetch_document(
    key: str, fetch_page: Callable[[str, int | None], dict]
) -> dict:
    """Follow the pagination loop, merging post pages (S8/U1 semantics)."""
    doc = fetch_page(key, None)
    while "nextPageToken" in doc:
        token = doc.pop("nextPageToken")
        page = fetch_page(key, token)
        doc["posts"] = doc.get("posts", []) + page.get("posts", [])
        if "nextPageToken" in page:
            doc["nextPageToken"] = page["nextPageToken"]
    return doc


def enrich(
    df: DataFrame,
    key_col: str,
    fetch_page: Callable[[str, int | None], dict] = mock_fetch_page,
    schema: str = RESPONSE_SCHEMA,
) -> DataFrame:
    """The enrichment operator: keyed DataFrame → + ``resp`` struct column.

    mapInPandas batches keys per partition (the fan-out unit — repartition
    the input to control concurrency), the injected fetcher handles
    auth/pagination, and the response lands as a schema'd struct.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs = [
                json.dumps(fetch_document(str(k), fetch_page))
                for k in pdf[key_col]
            ]
            yield pdf.assign(response_json=docs)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    with_json = df.mapInPandas(run, f"{out_schema}, response_json string")
    return with_json.withColumn("resp", F.from_json("response_json", schema)).drop(
        "response_json"
    )


class TransientFetchError(RuntimeError):
    """A retryable fetch failure (HTTP 429/503-shaped)."""


def flaky_fetch_page(
    key: str, page_token: int | None = None, _attempts: dict | None = None
) -> dict:
    """Deterministically flaky mock: keys with md5('fail:<key>') % 5 == 0
    raise on their FIRST attempt and succeed after — the 429/503 shape.
    ``_attempts`` (per-task dict) tracks per-key attempt counts."""
    if _attempts is not None and _hx(f"fail:{key}", 0, 4) % 5 == 0:
        n = _attempts.get(key, 0)
        _attempts[key] = n + 1
        if n == 0:
            raise TransientFetchError(f"transient failure for {key}")
    return mock_fetch_page(key, page_token)


def fetch_document_with_retry(
    key: str,
    fetch_page: Callable[..., dict],
    max_attempts: int = 3,
    **fetch_kwargs,
) -> tuple[dict, int]:
    """Fetch with bounded retry: returns (document, attempts_used).

    The reference swallows fetch errors with try/except-print and emits
    half-empty rows (main.py:475-585); here a transient failure retries
    up to ``max_attempts`` and a persistent one RAISES — no silent
    degradation.  Backoff sleeping is the caller's policy knob; the mock
    path never sleeps so tests stay fast."""
    last: Exception | None = None
    for attempt in range(1, max_attempts + 1):
        try:
            return (
                fetch_document(
                    key, lambda k, t: fetch_page(k, t, **fetch_kwargs)
                ),
                attempt,
            )
        except TransientFetchError as e:  # noqa: PERF203
            last = e
    raise last  # persistent failure propagates


def enrich_with_retry(
    df: DataFrame,
    key_col: str,
    fetch_page: Callable[..., dict] = flaky_fetch_page,
    max_attempts: int = 3,
) -> DataFrame:
    """The enrichment operator with retry accounting: adds ``resp`` AND
    ``n_attempts`` so downstream can audit flakiness per key."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        attempts: dict = {}
        for pdf in batches:
            docs, n_att = [], []
            for k in pdf[key_col]:
                doc, n = fetch_document_with_retry(
                    str(k), fetch_page, max_attempts, _attempts=attempts
                )
                docs.append(json.dumps(doc))
                n_att.append(n)
            yield pdf.assign(response_json=docs, n_attempts=n_att)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    with_json = df.mapInPandas(
        run, f"{out_schema}, response_json string, n_attempts int"
    )
    return with_json.withColumn(
        "resp", F.from_json("response_json", RESPONSE_SCHEMA)
    ).drop("response_json")
