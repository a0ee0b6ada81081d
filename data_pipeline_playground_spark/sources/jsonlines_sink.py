"""`jsonlines` — a Spark 4 Python DataSource WRITER: the reference's
JSON response sink (SURVEY S7, realtimeapi.py's JSON API responses /
pipeline.py's final JSON dump) as a first-class Spark sink with real
two-phase commit semantics.

Register once per session, then:

    spark.dataSource.register(JsonLinesDataSource)
    df.write.format("jsonlines").mode("append").option("path", out).save()

Each task streams its partition to a uniquely-named file under
``<path>/_temporary/``; the driver-side ``commit`` renames every
task file into the final directory and drops a ``_SUCCESS`` marker,
``abort`` deletes the temp files. Readers therefore never observe a
partial write — the same task-file + driver-rename protocol Spark's
built-in FileFormat sinks use, expressed through the Python
DataSource API. At scale the rename is per task file (object-store
copy or metadata move), never a data shuffle; parallelism = upstream
partitions.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class JsonLinesCommit(WriterCommitMessage):
    def __init__(self, temp_file: str):
        self.temp_file = temp_file


class JsonLinesDataSource(DataSource):
    """JSON-lines directory sink with task-file two-phase commit."""

    @classmethod
    def name(cls) -> str:
        return "jsonlines"

    def writer(self, schema, overwrite: bool) -> "JsonLinesWriter":
        return JsonLinesWriter(self.options, overwrite)


class JsonLinesWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlines sink requires .option('path', dir)")
        self.overwrite = overwrite

    # -- executor side -------------------------------------------------------

    def write(self, iterator) -> JsonLinesCommit:
        tmp_dir = os.path.join(self.path, "_temporary")
        os.makedirs(tmp_dir, exist_ok=True)
        fname = os.path.join(tmp_dir, f"part-{uuid.uuid4().hex}.json")
        n = 0
        with open(fname, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return JsonLinesCommit(fname)

    # -- driver side ---------------------------------------------------------

    def commit(self, messages) -> None:
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.startswith("part-") and f.endswith(".json"):
                    os.remove(os.path.join(self.path, f))
        for m in messages:
            final = os.path.join(self.path, os.path.basename(m.temp_file))
            os.replace(m.temp_file, final)
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass
        self._cleanup_temp()

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.temp_file)
            except FileNotFoundError:
                pass
        self._cleanup_temp()

    def _cleanup_temp(self) -> None:
        tmp_dir = os.path.join(self.path, "_temporary")
        try:
            os.rmdir(tmp_dir)  # only removes when empty — i.e. all moved
        except OSError:
            pass


# Pickled to executor Python workers — ship by value (see
# newsfeed_datasource.py for why).
import sys as _sys

from pyspark.cloudpickle import register_pickle_by_value as _by_value

_by_value(_sys.modules[__name__])
