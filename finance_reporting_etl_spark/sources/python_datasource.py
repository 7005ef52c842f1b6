"""Spark 4 Python Data Source API connector (SURVEY §2.1 S1-S3, modernized).

The reference fetches REST pages in a driver-side loop — FRED series GET
(``data_loader/fetch_data.py:4-17``) and the companies x report_types
fan-out with a 15s inter-call sleep (``README.md:327-369``). rest.py
reproduces that loop faithfully; THIS module is the engine-native form:
a custom ``pyspark.sql.datasource.DataSource`` where every staged page
is an ``InputPartition``, so parse (and in a networked deployment,
fetch) runs ON EXECUTORS, one task per page, and the result enters the
plan as an ordinary DataFrame with a declared schema.

Why this matters at scale: the driver loop tops out at one page at a
time (fine for a 500-call free tier, the reference's world). A raw zone
with millions of staged page objects needs the read to parallelize like
any other scan — partition-per-page does exactly that, and Spark
schedules/retries page tasks like parquet splits. Schema is declared,
not inferred, so a malformed page fails its own task instead of
silently re-typing the whole load.

No network anywhere: pages are staged JSON files (the same injection
seam rest.py uses for tests); a real deployment would issue the HTTP
GET inside ``read()`` with the partition's URL.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

PAGE_SCHEMA = (
    "series_id string, observation_date date, value_raw string, value double, page int"
)


class PagePartition(InputPartition):
    """One staged page file == one Spark task."""

    def __init__(self, page: int, path: str):
        self.page = page
        self.path = path


class FredPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.dir = options["path"]

    def partitions(self) -> Sequence[PagePartition]:
        # Driver-side metadata listing only (same as parquet split
        # planning); rows are never read here.
        names = sorted(n for n in os.listdir(self.dir) if n.endswith(".json"))
        return [
            PagePartition(i, os.path.join(self.dir, n)) for i, n in enumerate(names)
        ]

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        # Executor-side: parse this partition's page only. A deployment
        # with live endpoints would fetch partition.url here instead.
        with open(partition.path) as f:
            payload = json.load(f)
        series_id = payload.get("series_id")
        for obs in payload.get("observations", []):
            raw = obs.get("value")
            try:
                value = float(raw)
            except (TypeError, ValueError):
                value = None  # "." missing marker, same as flatten_observations
            yield (
                series_id,
                _dt.date.fromisoformat(obs["date"]),
                raw,
                value,
                partition.page,
            )


class FredPagesDataSource(DataSource):
    """``spark.read.format("fred_pages").option("path", dir).load()``."""

    @classmethod
    def name(cls) -> str:
        return "fred_pages"

    def schema(self) -> str:
        return PAGE_SCHEMA

    def reader(self, schema) -> FredPagesReader:
        return FredPagesReader(self.options)


def register(spark) -> None:
    """Idempotent format registration for this session."""
    spark.dataSource.register(FredPagesDataSource)


# Deterministic staged pages shared by the catalog query and its oracle:
# 4 pages x 3 quarterly observations, with "." missing markers — the
# FRED payload shape from fetch_data.py:11-14. Explicit literals (not a
# formula) so the DuckDB VALUES oracle cannot drift from the writer.
CANNED_PAGES: list[dict] = [
    {
        "series_id": "GDP",
        "observations": [
            {"date": "2020-01-01", "value": "21481.367"},
            {"date": "2020-04-01", "value": "19477.444"},
            {"date": "2020-07-01", "value": "."},
        ],
    },
    {
        "series_id": "GDP",
        "observations": [
            {"date": "2020-10-01", "value": "21494.731"},
            {"date": "2021-01-01", "value": "22313.85"},
            {"date": "2021-04-01", "value": "23046.934"},
        ],
    },
    {
        "series_id": "GDP",
        "observations": [
            {"date": "2021-07-01", "value": "23550.42"},
            {"date": "2021-10-01", "value": "."},
            {"date": "2022-01-01", "value": "24740.48"},
        ],
    },
    {
        "series_id": "GDP",
        "observations": [
            {"date": "2022-04-01", "value": "25248.476"},
            {"date": "2022-07-01", "value": "25723.941"},
            {"date": "2022-10-01", "value": "26137.992"},
        ],
    },
]


def stage_canned_pages(base_dir: str) -> str:
    """Write CANNED_PAGES as page-NNN.json files; returns the dir."""
    os.makedirs(base_dir, exist_ok=True)
    for i, page in enumerate(CANNED_PAGES):
        tmp = os.path.join(base_dir, f".page-{i:03d}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(page, f)
        os.replace(tmp, os.path.join(base_dir, f"page-{i:03d}.json"))
    return base_dir
