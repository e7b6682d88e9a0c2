"""A first-class Spark data source for REST capture directories (Spark 4
Python DataSource API): ``spark.read.format("xboard_pages")`` over the
``page-<N>.json`` files that ``rest.fetch_entity_pages`` writes.

This closes the S5 loop Spark-natively: capture is driver-side cursor
walking (inherently serial — see ``rest.py``), but the READ of the capture
is a genuine distributed source — each page file is an ``InputPartition``,
so Spark schedules one task per page and the JSON parse runs where the
split is assigned, exactly like any file source. The emitted
(page, pos, raw) rows carry exactly the provenance
``ingest.ingest_entity_pages`` derives on the direct file path via
``_metadata.file_path`` + ``posexplode`` — a consumer applies the same
desc(page), desc(pos) last-write-wins window over ``from_json(raw)`` to
get identical overlap resolution (``tests/test_pages_datasource.py``
exercises the read side).

Why a DataSource and not ``spark.read.json``: the page ENVELOPE (one JSON
object wrapping an entity array, page order encoded in the file name) is
what carries the dedup/ordering semantics — a naive json read loses the
page/position provenance that ``ingest_entity_pages`` keys its
last-write-wins window on.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

PAGE_RE = re.compile(r"page-(\d+)\.json$")

SCHEMA = "page INT, pos INT, raw STRING"


class PageFilePartition(InputPartition):
    def __init__(self, path: str, page: int):
        self.path = path
        self.page = page


class PagesDataSource(DataSource):
    """format("xboard_pages") — options: ``path`` (capture directory),
    ``entity`` (key of the entity array inside each page envelope)."""

    @classmethod
    def name(cls) -> str:
        return "xboard_pages"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "PagesReader":
        return PagesReader(self.options)


class PagesReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.entity = options.get("entity")
        if not self.path or not self.entity:
            raise ValueError("xboard_pages requires path and entity options")

    def partitions(self):
        parts = []
        for name in sorted(os.listdir(self.path)):
            m = PAGE_RE.search(name)
            if m:
                parts.append(
                    PageFilePartition(
                        os.path.join(self.path, name), int(m.group(1))
                    )
                )
        if not parts:
            raise FileNotFoundError(
                f"no page-<N>.json files under {self.path}"
            )
        return parts

    def read(self, partition: PageFilePartition):
        with open(partition.path, "rb") as f:
            envelope = json.load(f)
        for pos, item in enumerate(envelope.get(self.entity, [])):
            yield (partition.page, pos, json.dumps(item, sort_keys=True))
