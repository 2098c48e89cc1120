"""Spark 4 Python DataSource for webdataset tar shards:
``spark.read.format("webdataset")``.

The read twin of ``sinks.export_webdataset``: a directory of
``shard-*.tar`` files whose members come in ``{key}.{suffix}`` pairs
(the public webdataset convention) loads as one input partition PER
TAR — the natural parallelism unit of the format, since a tar has no
random access and must stream anyway. Members group by key; each
sample becomes one row:

    (shard string, key string, txt string, meta string)

``txt`` is the ``.txt`` payload decoded as UTF-8, ``meta`` the raw
``.json`` sidecar (parse downstream with ``from_json`` against your
schema — the source stays schema-free the way binaryFile does). ALL
other member suffixes (the image/audio payloads of a multimodal
sample) arrive in ``bins`` — a ``map<string,binary>`` keyed by member
suffix, so a multi-payload export (``payload_cols`` with several
columns) round-trips losslessly (ADVICE r5). For the common
single-payload sample, ``bin``/``bin_suffix`` carry the FIRST
non-txt/json member in tar order as a convenience — feed either shape
to the operators/multimodal.py decode contract (bytes column +
mapInPandas) exactly like a binaryFile scan.

    spark.dataSource.register(WebdatasetDataSource)
    df = spark.read.format("webdataset").load("/data/shards")

Cluster contract: tars open on executors — shared filesystem/object
store, like every file source.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

WDS_SCHEMA = (
    "shard string, key string, txt string, meta string, "
    "bin binary, bin_suffix string, bins map<string,binary>"
)


class TarPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WebdatasetReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("webdataset source requires a path")

    def partitions(self) -> Sequence[InputPartition]:
        if os.path.isdir(self.path):
            tars = sorted(glob.glob(os.path.join(self.path, "*.tar")))
        else:
            tars = sorted(glob.glob(self.path)) or [self.path]
        return [TarPartition(p) for p in tars]

    def read(self, partition: TarPartition) -> Iterator[tuple]:
        """Stream one tar: adjacent members sharing a key merge into a
        sample row (webdataset writes a sample's members contiguously,
        which export_webdataset guarantees)."""
        import tarfile

        shard = os.path.basename(partition.path)
        cur_key: str | None = None
        txt: str | None = None
        meta: str | None = None
        bins: dict[str, bytes] = {}

        def row(key):
            first = next(iter(bins.items()), (None, None))
            return (shard, key, txt, meta, first[1], first[0], bins or None)

        with tarfile.open(partition.path) as tar:
            for member in tar:
                if not member.isfile():
                    continue
                key, _, suffix = member.name.rpartition(".")
                if key != cur_key and cur_key is not None:
                    yield row(cur_key)
                    txt = meta = None
                    bins = {}
                cur_key = key
                blob = tar.extractfile(member).read()
                if suffix == "txt":
                    txt = blob.decode("utf-8")
                elif suffix == "json":
                    meta = blob.decode("utf-8")
                else:
                    # dicts preserve insertion order -> first member in
                    # tar order is the bin/bin_suffix convenience slot
                    bins.setdefault(suffix, blob)
        if cur_key is not None:
            yield row(cur_key)


class WebdatasetDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "webdataset"

    def schema(self) -> str:
        return WDS_SCHEMA

    def reader(self, schema) -> WebdatasetReader:
        return WebdatasetReader(self.options)
