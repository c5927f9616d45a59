"""A pure-Python keyed row store exposed through Spark's Python
DataSource API — the RUNNABLE stand-in for the reference's
Cassandra/CosmosDB connector path.

The reference reads ``rhom.locations`` and appends ``rhom.heatmaps``
through a connector jar (reference heatmap.py:131–150,
submit-heatmap:15); this container has no such jar, so the wrappers in
sources/connectors.py gate cleanly but can never execute.  This module
closes that integration gap with PUBLIC PySpark 4 API only
(``pyspark.sql.datasource``, added in Spark 4.0/4.1): a registerable
``heatmap_rowstore`` format with a real batch reader (bucket + min/max
file pruning via ``pushFilters``), a real Arrow batch writer with a
two-phase task-file → manifest commit, a streaming reader whose
offsets are manifest versions (the CDC-feed analogue), and a streaming
writer whose per-epoch commits are idempotent (replayed batchIds
discard their rewrite).  Everything the jar-gated wrappers promise —
keyed reads, partitioned parallel scans, append sink, change feed —
runs and is oracle-tested here.

On-disk layout (all local/posix paths; single writer, like the
streaming stores' marker protocol):

* ``data/b<bucket>-<task>.arrow`` — Arrow IPC files, one per (bucket,
  write task).  The bucket is ``crc32(str(key)) % n_buckets`` — the
  Cassandra-partition-key analogue that makes point reads prune.
* ``MANIFEST.json`` — atomic-swap committed source of truth:
  schema (StructType JSON), bucket config, and one entry per data
  file carrying bucket id, row count, min/max of the bucket key, and
  the manifest VERSION that added it.  Readers list files from the
  manifest only, so uncommitted task files are invisible (writer
  crash ⇒ orphans, GC'd by the next overwrite) — same
  write-then-commit discipline as the streaming stores' ``_LATEST``.

Scale shape: one reader partition per data FILE (the parquet split
model — parallelism tracks file count even when one bucket is hot;
keyed scans still prune to 1/n_buckets of the FILES before any row
moves, and compaction shrinks point-read task counts), Arrow batches
end to end (no per-row Python in either direction), and pushed filters are
re-applied by Spark above the scan, so pruning is a pure optimization
— results are identical whether or not
``spark.sql.python.filterPushdown.enabled`` is on (it is off in a
plain session; heatmap_spark.get_spark enables it).

Every class is built inside a factory so cloudpickle ships the class
BY VALUE to executors — a module-level class pickles by reference and
breaks when the driver imported this package from a foreign cwd (the
same trap as mapInPandas kernels; see multimodal._png_codec).
"""

from __future__ import annotations

import json
import os
import zlib

from pyspark.sql import DataFrame, SparkSession

FORMAT_NAME = "heatmap_rowstore"
_MANIFEST = "MANIFEST.json"


def _bucket_of(value, n_buckets: int) -> int:
    """crc32 of the key's string form — stable across engines/runs."""
    return zlib.crc32(str(value).encode("utf-8")) % n_buckets


def read_manifest(path: str) -> dict | None:
    p = os.path.join(path, _MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _write_manifest(path: str, man: dict) -> None:
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(man, fh)
    os.replace(tmp, os.path.join(path, _MANIFEST))


def make_rowstore_datasource():
    """Build the DataSource class (factory → by-value pickling)."""
    import json as _json
    import os as _os
    import uuid as _uuid
    import zlib as _zlib
    from collections import defaultdict
    from dataclasses import dataclass

    import pyarrow as _pa
    import pyarrow.ipc as _ipc
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceArrowWriter,
        DataSourceReader,
        DataSourceStreamArrowWriter,
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        InputPartition,
        LessThan,
        LessThanOrEqual,
        SimpleDataSourceStreamReader,
        WriterCommitMessage,
    )
    from pyspark.sql.types import StructType

    _MAN = "MANIFEST.json"

    def _load_man(path):
        with open(_os.path.join(path, _MAN)) as fh:
            return _json.load(fh)

    def _bucket(value, n):
        return _zlib.crc32(str(value).encode("utf-8")) % n

    @dataclass
    class BucketPartition(InputPartition):
        files: tuple  # absolute paths, one bucket's committed files

    def _norm_batch(batch, canon, fill_types=None):
        """Normalize a batch to the store's canonical column ORDER with
        all-nullable fields (types untouched).  Two writes of the same
        Spark schema can reach Arrow with different column orders (a
        join reorders) or nullability metadata; files in one store must
        share ONE Arrow schema or a bin-packed read partition (and the
        runner's single stream writer) breaks on the mix.

        Columns in ``canon`` MISSING from the batch null-fill with
        their store Arrow type when ``fill_types`` carries one — the
        read-side half of additive schema evolution (files written
        before a column existed, and appends that omit a nullable
        column, both read as the union schema)."""
        if batch.schema.names == list(canon) and all(
            f.nullable for f in batch.schema
        ):
            return batch
        arrays, fields = [], []
        for n in canon:
            i = batch.schema.get_field_index(n)
            if i >= 0:
                a = batch.column(i)
            elif fill_types is not None and n in fill_types:
                a = _pa.nulls(batch.num_rows, type=fill_types[n])
            else:
                raise ValueError(
                    f"batch lacks column {n!r} and no fill type is known"
                )
            arrays.append(a)
            fields.append(_pa.field(n, a.type, nullable=True))
        return _pa.RecordBatch.from_arrays(arrays, schema=_pa.schema(fields))

    def _man_arrow_types(man):
        """name → Arrow type for every column of the manifest schema —
        the fill types evolution-aware readers/writers null-fill with."""
        from pyspark.sql.pandas.types import to_arrow_schema

        st = StructType.fromJson(_json.loads(man["schema"]))
        return {f.name: f.type for f in to_arrow_schema(st)}

    def _iter_ipc(files, canon=None, fill_types=None):
        for fn in files:
            with _ipc.open_file(fn) as r:
                for i in range(r.num_record_batches):
                    b = r.get_batch(i)
                    yield b if canon is None else _norm_batch(b, canon, fill_types)

    class RowStoreReader(DataSourceReader):
        """Batch scan: one partition per data file; pushFilters prunes
        buckets (EqualTo/In on the bucket key) and files (min/max
        stats vs range predicates).  All filters are RETURNED as
        unhandled — pruning never drops a matching row, Spark
        re-applies exact predicates above the scan (the parquet
        pushed-filters contract)."""

        def __init__(self, path, options=None):
            self.path = path
            self.man = _load_man(path)
            self._base_buckets = set(range(self.man["n_buckets"]))
            self.key_bounds = []  # (op, value) prunes on file min/max
            self.col_bounds = {}  # column -> [(op, value)] vs stats
            opts = options or {}
            # Spark's defaults for the analogous file-source knobs
            self.max_part_bytes = int(
                opts.get("max_partition_bytes", str(128 * 1024 * 1024))
            )
            self.open_cost = int(
                opts.get("open_cost_bytes", str(4 * 1024 * 1024))
            )
            # time travel: snapshot as of a manifest version — the
            # manifest is an append-only log of (file, adding version)
            # entries, so an as-of read just drops newer files.
            asof = opts.get("as_of_version")
            self.as_of = None if asof is None else int(asof)
            # explicit bucket routing (e.g. MERGE reads only touched
            # buckets): prunes files before any row moves, composing
            # with pushFilters pruning
            bl = opts.get("buckets")
            if bl:
                self._base_buckets &= {int(x) for x in bl.split(",")}
            self.keep_buckets = set(self._base_buckets)

        def pushFilters(self, filters):
            # Reset to the option-restricted base EVERY call: Spark
            # re-plans onto the SAME reader instance, and accumulated
            # prunes from a previous plan must not leak into this one
            # (they only ever shrink).  NOTE the engine-level caveat in
            # read_rowstore's docstring: if a later plan has no
            # filters at all, pyspark may reuse the first plan's frozen
            # scan without calling pushFilters/partitions again — use
            # a fresh read per differently-filtered action.
            self.keep_buckets = set(self._base_buckets)
            self.key_bounds = []
            self.col_bounds = {}  # column -> [(op, value)] vs file stats
            key = self.man["bucket_key"]
            n = self.man["n_buckets"]
            for f in filters:
                attr = getattr(f, "attribute", None)
                if attr is None or len(list(attr)) != 1:
                    continue
                if list(attr) != [key]:
                    # data skipping on NON-key columns via the per-file
                    # column stats (Delta-style): same op set, applied
                    # against entry["stats"][col] in _file_survives
                    col = list(attr)[0]
                    bs = self.col_bounds.setdefault(col, [])
                    if isinstance(f, EqualTo):
                        bs.append(("==", f.value))
                    elif isinstance(f, In):
                        bs.append(("in", tuple(f.value)))
                    elif isinstance(f, GreaterThan):
                        bs.append((">", f.value))
                    elif isinstance(f, GreaterThanOrEqual):
                        bs.append((">=", f.value))
                    elif isinstance(f, LessThan):
                        bs.append(("<", f.value))
                    elif isinstance(f, LessThanOrEqual):
                        bs.append(("<=", f.value))
                    continue
                if isinstance(f, EqualTo):
                    self.keep_buckets &= {_bucket(f.value, n)}
                    self.key_bounds.append(("==", f.value))
                elif isinstance(f, In):
                    self.keep_buckets &= {_bucket(v, n) for v in f.value}
                # inclusive and strict bounds prune DIFFERENTLY at the
                # boundary: a file whose max equals v still contains
                # rows matching >= v (row loss if pruned), but cannot
                # contain rows matching > v
                elif isinstance(f, GreaterThan):
                    self.key_bounds.append((">", f.value))
                elif isinstance(f, GreaterThanOrEqual):
                    self.key_bounds.append((">=", f.value))
                elif isinstance(f, LessThan):
                    self.key_bounds.append(("<", f.value))
                elif isinstance(f, LessThanOrEqual):
                    self.key_bounds.append(("<=", f.value))
            return filters  # Spark re-applies everything exactly

        def _visible(self, e) -> bool:
            # add/remove-log visibility: a file is live in snapshot S
            # iff added_at <= S < removed_at (rm absent = live now)
            v, rm = e.get("v", 0), e.get("rm")
            if self.as_of is None:
                return rm is None
            return v <= self.as_of and (rm is None or rm > self.as_of)

        @staticmethod
        def _range_survives(lo, hi, bounds) -> bool:
            # pruning is only ever an optimization: any doubt (missing
            # stats, cross-type comparison) keeps the file
            try:
                for op, v in bounds:
                    if op == "==" and not (lo <= v <= hi):
                        return False
                    if op == "in" and not any(lo <= x <= hi for x in v):
                        return False
                    if op == ">" and not (hi > v):
                        return False
                    if op == ">=" and not (hi >= v):
                        return False
                    if op == "<" and not (lo < v):
                        return False
                    if op == "<=" and not (lo <= v):
                        return False
            except TypeError:  # cross-type comparison — never prune
                return True
            return True

        def _file_survives(self, entry) -> bool:
            lo, hi = entry.get("min"), entry.get("max")
            if lo is not None and hi is not None:
                if not self._range_survives(lo, hi, self.key_bounds):
                    return False
            stats = entry.get("stats") or {}
            for col, bounds in self.col_bounds.items():
                rng = stats.get(col)
                if rng is None:
                    continue  # no stats for this column — keep
                if not self._range_survives(rng[0], rng[1], bounds):
                    return False
            return True

        def partitions(self):
            # Spark's file-split model: surviving files BIN-PACK into
            # byte-budgeted partitions (maxPartitionBytes) with an
            # open-cost pad per file (openCostInBytes) — so a hot
            # bucket with many task files still fans out across tasks,
            # while thousands of tiny files don't become thousands of
            # tiny tasks (the small-files trap: per-partition Python
            # worker overhead dominated a 2M-row scan 6× before
            # packing).  Pruning applies file-wise via bucket ids and
            # min/max stats before packing; compaction shrinks file
            # counts and therefore split counts.
            survivors = sorted(
                (
                    e
                    for e in self.man["files"]
                    if e["bucket"] in self.keep_buckets
                    and self._file_survives(e)
                    and self._visible(e)
                ),
                key=lambda e: (e["bucket"], e["name"]),
            )
            parts, cur, cur_cost = [], [], 0
            for e in survivors:
                fn = _os.path.join(self.path, e["name"])
                size = e.get("bytes")
                if size is None:
                    try:
                        size = _os.path.getsize(fn)
                    except OSError:
                        size = 0
                cost = size + self.open_cost
                if cur and cur_cost + cost > self.max_part_bytes:
                    parts.append(BucketPartition(tuple(cur)))
                    cur, cur_cost = [], 0
                cur.append(fn)
                cur_cost += cost
            if cur:
                parts.append(BucketPartition(tuple(cur)))
            return parts or [BucketPartition(())]

        def read(self, partition):
            canon = [
                f["name"]
                for f in _json.loads(self.man["schema"])["fields"]
            ]
            yield from _iter_ipc(partition.files, canon, _man_arrow_types(self.man))

    class RowStoreStreamReader(SimpleDataSourceStreamReader):
        """Micro-batch feed: offsets are manifest versions; a batch is
        every file ADDED in versions (start, latest] — the commit-log
        (CDC) view of the store.  Append-only stores only.

        The column set is FROZEN at stream start (the manifest schema
        when this reader is built — the schema Spark binds the stream
        to): files from commits that later EVOLVE the schema replay
        projected onto the start-time columns, so every micro-batch
        matches the stream's declared schema.

        ``max_versions_per_batch`` (reader option) rate-limits
        catch-up: a stream starting far behind the latest manifest
        version advances at most that many commits per micro-batch
        (Delta's maxFilesPerTrigger shape) instead of loading the
        whole backlog into one driver-side batch — the knob that keeps
        recovery batches bounded at scale.  A continuous
        (processing-trigger) stream catches up across successive
        micro-batches; an availableNow run takes ONE bounded batch
        from the checkpoint and stops (Spark sizes the run from the
        first read's end offset), so batch-mode catch-up is "repeat
        drains until the offset stops advancing" — pinned in
        tests."""

        def __init__(self, path, max_versions_per_batch=None):
            self.path = path
            self.max_versions = (
                int(max_versions_per_batch) if max_versions_per_batch else None
            )
            man = _load_man(path)
            self._canon = [
                f["name"] for f in _json.loads(man["schema"])["fields"]
            ]
            self._fill = _man_arrow_types(man)

        def initialOffset(self):
            return {"version": 0}

        def _files_between(self, start_v, end_v):
            man = _load_man(self.path)
            # The CDC view replays files by ADD version, which is only
            # a faithful change log while the store is append-only: a
            # MERGE/DELETE rewrites whole buckets (soft-deleting the
            # priors via 'rm' marks), so replaying adds at or past such
            # a commit would emit the pre-merge rows AND the rewritten
            # files that contain them again.  Windows ENTIRELY BEFORE
            # the earliest rewrite are still pure appends — allowing
            # them keeps previously-committed prefix replays (stream
            # restarts from a checkpoint) valid on stores that later
            # see a merge.  Fail loudly for anything overlapping.
            rewrites = [e["rm"] for e in man["files"] if "rm" in e]
            earliest = min(rewrites) if rewrites else None
            expired = man.get("earliest_rewrite")
            if expired is not None:
                earliest = expired if earliest is None else min(earliest, expired)
            if earliest is None and man.get("rewrites_expired"):
                # legacy tombstone without a recorded version: the
                # rewrite could have been anywhere — stay conservative
                earliest = 0
            if earliest is not None and end_v >= earliest:
                why = (
                    f"earliest rewrite at manifest version {earliest}"
                    if rewrites or expired is not None
                    else "'rm' marks expired by vacuum_rowstore"
                )
                raise ValueError(
                    "rowstore CDC stream requires an append-only "
                    f"history: the requested window ({start_v}, {end_v}] "
                    f"of manifest at {self.path!r} overlaps a "
                    f"MERGE/DELETE commit ({why}) — replaying adds "
                    "would double-count rewritten rows; read a snapshot "
                    "(read_rowstore) instead"
                )
            return [
                _os.path.join(self.path, e["name"])
                for e in man["files"]
                if start_v < e.get("v", 1) <= end_v
            ]

        def read(self, start):
            man = _load_man(self.path)
            latest = man["version"]
            end = latest
            if self.max_versions is not None:
                end = min(latest, start["version"] + self.max_versions)
            if end == start["version"]:
                # caught up: Spark's simple-reader wrapper probes a
                # SAME-OFFSET result with next(it) expecting
                # StopIteration — hand it an (empty) ITERATOR, not a
                # list (TypeError otherwise; latent until a drain ran
                # against an already-current store)
                return iter(()), {"version": end}
            rows = self._rows(self._files_between(start["version"], end))
            return rows, {"version": end}

        def readBetweenOffsets(self, start, end):
            return self._rows(self._files_between(start["version"], end["version"]))

        def _rows(self, files):
            # a LIST, not a generator: the simple stream reader's rows
            # are pickled driver-side for distribution (a generator
            # fails to pickle); micro-batches are commit-sized.
            out = []
            for batch in _iter_ipc(files, self._canon, self._fill):
                out.extend(tuple(r.values()) for r in batch.to_pylist())
            return out

        def commit(self, end):
            pass  # manifest is immutable history; nothing to ack

    @dataclass
    class TaskFiles(WriterCommitMessage):
        entries: tuple  # ((bucket, name, n_rows, min, max), ...)

    class RowStoreWriter(DataSourceArrowWriter):
        """Two-phase append/overwrite: tasks write bucket-split Arrow
        IPC files and report them; commit() merges the entries into
        the manifest in ONE atomic swap (version += 1).  A failed job
        leaves orphan data files that no manifest references."""

        def __init__(self, schema, path, bucket_key, n_buckets, overwrite,
                     replace_buckets=None):
            self.path = path
            self.bucket_key = bucket_key
            self.n_buckets = n_buckets
            self.overwrite = overwrite
            # the store schema is ALL-NULLABLE by policy — files are
            # written all-nullable (_norm_batch), evolution null-fills
            # omitted columns, and old files null-fill new ones; a
            # non-nullable field in the declared read schema would let
            # codegen read a null slot as a raw value
            from pyspark.sql.types import StructField

            self.schema_json = StructType(
                [
                    StructField(f.name, f.dataType, True, f.metadata)
                    for f in schema.fields
                ]
            ).json()
            # canonical column order: appends normalize their batches
            # to the STORE's order so every file shares one Arrow
            # schema (a join/union upstream reorders columns).
            # ADDITIVE SCHEMA EVOLUTION (Delta-style): an append may
            # carry NEW columns (the store schema widens to the union;
            # pre-existing files null-fill at read) and may OMIT
            # existing columns (null-filled at write) — but may never
            # change an existing column's type, and must always carry
            # the bucket key.
            man_path = _os.path.join(path, _MAN)
            self.fill_types = None
            if not overwrite and _os.path.exists(man_path):
                man = _load_man(path)
                store_fields = _json.loads(man["schema"])["fields"]
                new_fields = _json.loads(self.schema_json)["fields"]
                store_by = {f["name"]: f for f in store_fields}
                new_names = {f["name"] for f in new_fields}
                for f in new_fields:
                    old = store_by.get(f["name"])
                    if old is not None and old["type"] != f["type"]:
                        raise ValueError(
                            f"append changes column {f['name']!r} type "
                            f"from {old['type']} to {f['type']} — "
                            "rowstore schema evolution is additive only"
                        )
                if bucket_key not in new_names:
                    raise ValueError(
                        f"append batch lacks the bucket key {bucket_key!r}"
                    )
                self.union_fields = store_fields + [
                    dict(f, nullable=True)
                    for f in new_fields
                    if f["name"] not in store_by
                ]
                self.canon = [f["name"] for f in self.union_fields]
                if set(self.canon) != new_names:
                    # appended batches omit store columns and/or add
                    # new ones — null-fill from the union's Arrow types
                    self.fill_types = _man_arrow_types(
                        {
                            "schema": _json.dumps(
                                {"type": "struct", "fields": self.union_fields}
                            )
                        }
                    )
            else:
                self.canon = [f.name for f in schema.fields]
            # MERGE support: buckets whose pre-existing files this
            # commit REPLACES (soft-deleted via an 'rm' version mark in
            # the same atomic manifest swap — Delta's add/remove log)
            self.replace_buckets = replace_buckets or set()

        @staticmethod
        def _stat_cols(schema):
            # per-file min/max stats for every JSON-representable,
            # totally-ordered column type (the Delta data-skipping
            # set, minus temporals: a timestamp filter arrives as a
            # datetime while JSON stores a string — incomparable, so
            # skipping them keeps pruning provably lossless)
            import pyarrow.types as _pt

            return [
                f.name
                for f in schema
                if _pt.is_integer(f.type)
                or _pt.is_floating(f.type)
                or _pt.is_string(f.type)
                or _pt.is_large_string(f.type)
                or _pt.is_boolean(f.type)
            ]

        def write(self, iterator):
            import pyarrow.compute as _pc

            tid = _uuid.uuid4().hex[:12]
            _os.makedirs(_os.path.join(self.path, "data"), exist_ok=True)
            sinks = {}  # bucket -> [name, OSFile, ipc writer, n, mn, mx, cstats]
            stat_cols = None
            for batch in iterator:
                batch = _norm_batch(batch, self.canon, self.fill_types)
                if stat_cols is None:
                    stat_cols = self._stat_cols(batch.schema)
                keys = batch.column(self.bucket_key).to_pylist()
                by_b = defaultdict(list)
                for i, k in enumerate(keys):
                    by_b[_bucket(k, self.n_buckets)].append(i)
                for b, idxs in by_b.items():
                    sub = batch.take(_pa.array(idxs, type=_pa.int32()))
                    if b not in sinks:
                        name = f"data/b{b}-{tid}.arrow"
                        f = _pa.OSFile(_os.path.join(self.path, name), "wb")
                        sinks[b] = [
                            name, f, _ipc.new_file(f, batch.schema),
                            0, None, None, {},
                        ]
                    s = sinks[b]
                    s[2].write_batch(sub)
                    s[3] += sub.num_rows
                    kv = [keys[i] for i in idxs if keys[i] is not None]
                    if kv:
                        lo, hi = min(kv), max(kv)
                        s[4] = lo if s[4] is None else min(s[4], lo)
                        s[5] = hi if s[5] is None else max(s[5], hi)
                    for cn in stat_cols:
                        mm = _pc.min_max(sub.column(cn), skip_nulls=True)
                        lo, hi = mm["min"].as_py(), mm["max"].as_py()
                        if lo is None or hi is None or lo != lo or hi != hi:
                            continue  # all-null slice, or NaN bounds
                        cur = s[6].get(cn)
                        if cur is None:
                            s[6][cn] = [lo, hi]
                        else:
                            cur[0] = min(cur[0], lo)
                            cur[1] = max(cur[1], hi)
            entries = []
            for b, (name, f, w, n, mn, mx, cstats) in sinks.items():
                w.close()
                f.close()
                size = _os.path.getsize(_os.path.join(self.path, name))
                entries.append((b, name, n, mn, mx, size, cstats))
            return TaskFiles(tuple(entries))

        def commit(self, messages):
            man_path = _os.path.join(self.path, _MAN)
            if self.overwrite or not _os.path.exists(man_path):
                man = {
                    "version": 0,
                    "n_buckets": self.n_buckets,
                    "bucket_key": self.bucket_key,
                    "schema": self.schema_json,
                    "files": [],
                }
            else:
                man = _load_man(self.path)
                # schema evolution commits the UNION atomically with
                # the file entries: merge against the manifest AS OF
                # COMMIT TIME (keeping its field definitions for
                # existing names), so the widened schema and the files
                # carrying the new columns appear in one swap
                ours = getattr(
                    self, "union_fields",
                    _json.loads(self.schema_json)["fields"],
                )
                cur_fields = _json.loads(man["schema"])["fields"]
                cur_names = {f["name"] for f in cur_fields}
                added = [
                    dict(f, nullable=True)
                    for f in ours
                    if f["name"] not in cur_names
                ]
                if added:
                    man["schema"] = _json.dumps(
                        {"type": "struct", "fields": cur_fields + added}
                    )
            v = man["version"] + 1
            for m in messages:
                if m is None:
                    continue
                for b, name, n, mn, mx, size, cstats in m.entries:
                    e = {"bucket": b, "name": name, "n_rows": n,
                         "min": mn, "max": mx, "v": v, "bytes": size}
                    if cstats:
                        e["stats"] = cstats
                    man["files"].append(e)
            if self.replace_buckets:
                for e in man["files"]:
                    if (
                        e["bucket"] in self.replace_buckets
                        and e.get("v", 0) < v
                        and "rm" not in e
                    ):
                        e["rm"] = v
            man["version"] = v
            tmp = man_path + ".tmp"
            with open(tmp, "w") as fh:
                _json.dump(man, fh)
            _os.replace(tmp, man_path)

        def abort(self, messages):
            for m in messages or []:
                if m is None:
                    continue
                for _, name, *_rest in m.entries:
                    try:
                        _os.remove(_os.path.join(self.path, name))
                    except OSError:
                        pass

    class RowStoreStreamWriter(DataSourceStreamArrowWriter):
        """writeStream sink: one manifest commit per micro-batch,
        EPOCH-IDEMPOTENT — committed batchIds are recorded in the
        manifest, so a replayed epoch (restart after a crash between
        the sink's commit and the checkpoint's) discards its re-written
        task files instead of double-appending.  This is the
        exactly-once contract the streaming stores implement with
        ``_LATEST`` markers, expressed through the engine's own sink
        API: readStream → heatmap_rowstore → readStream composes into
        an end-to-end CDC pipe."""

        def __init__(self, schema, path, bucket_key, n_buckets):
            self.task = RowStoreWriter(schema, path, bucket_key, n_buckets, False)
            self.path = path

        def write(self, iterator):
            return self.task.write(iterator)

        def commit(self, messages, batchId):
            man_path = _os.path.join(self.path, _MAN)
            if _os.path.exists(man_path):
                man = _load_man(self.path)
            else:
                man = {
                    "version": 0,
                    "n_buckets": self.task.n_buckets,
                    "bucket_key": self.task.bucket_key,
                    "schema": self.task.schema_json,
                    "files": [],
                }
            epochs = man.setdefault("epochs", [])
            if batchId in epochs:  # replayed epoch: drop the rewrite
                self.abort(messages, batchId)
                return
            v = man["version"] + 1
            for m in messages:
                if m is None:
                    continue
                for b, name, n, mn, mx, size, cstats in m.entries:
                    e = {"bucket": b, "name": name, "n_rows": n,
                         "min": mn, "max": mx, "v": v, "bytes": size}
                    if cstats:
                        e["stats"] = cstats
                    man["files"].append(e)
            man["version"] = v
            epochs.append(batchId)
            tmp = man_path + ".tmp"
            with open(tmp, "w") as fh:
                _json.dump(man, fh)
            _os.replace(tmp, man_path)

        def abort(self, messages, batchId):
            self.task.abort(messages)

    class RowStoreDataSource(DataSource):
        @classmethod
        def name(cls):
            return "heatmap_rowstore"

        def schema(self):
            man = _load_man(self.options["path"])
            return StructType.fromJson(_json.loads(man["schema"]))

        def reader(self, schema):
            return RowStoreReader(self.options["path"], self.options)

        def simpleStreamReader(self, schema):
            return RowStoreStreamReader(
                self.options["path"],
                self.options.get("max_versions_per_batch"),
            )

        def streamWriter(self, schema, overwrite):
            path = self.options["path"]
            if _os.path.exists(_os.path.join(path, _MAN)):
                man = _load_man(path)
                bucket_key, n_buckets = man["bucket_key"], man["n_buckets"]
            else:
                bucket_key = self.options.get("bucket_key")
                if not bucket_key:
                    raise ValueError(
                        "heatmap_rowstore: option 'bucket_key' is required "
                        "when streaming into a new store"
                    )
                n_buckets = int(self.options.get("n_buckets", "16"))
            _os.makedirs(path, exist_ok=True)
            return RowStoreStreamWriter(schema, path, bucket_key, n_buckets)

        def writer(self, schema, overwrite):
            path = self.options["path"]
            if overwrite or not _os.path.exists(_os.path.join(path, _MAN)):
                bucket_key = self.options.get("bucket_key")
                if not bucket_key:
                    raise ValueError(
                        "heatmap_rowstore: option 'bucket_key' is required "
                        "for the first write / overwrite"
                    )
                n_buckets = int(self.options.get("n_buckets", "16"))
            else:  # appends inherit the store's layout
                man = _load_man(path)
                bucket_key = man["bucket_key"]
                n_buckets = man["n_buckets"]
            _os.makedirs(path, exist_ok=True)
            rb = self.options.get("replace_buckets")
            replace = {int(x) for x in rb.split(",")} if rb else None
            return RowStoreWriter(
                schema, path, bucket_key, n_buckets, overwrite, replace
            )

    return RowStoreDataSource


def register_rowstore(spark: SparkSession) -> None:
    """Idempotently register the ``heatmap_rowstore`` format on this
    session (registration replaces any prior one — the API has no
    lookup, so re-registering is the idempotent form).

    Also enables ``spark.sql.python.filterPushdown.enabled`` (runtime
    conf, default false): Spark REFUSES to plan a reader that
    implements pushFilters() while the conf is off, so the format
    self-configures the way load_table does for nanos timestamps —
    the driver's plain session needs no engine confs."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(make_rowstore_datasource())


def write_rowstore(
    df: DataFrame,
    path: str,
    bucket_key: str | None = None,
    n_buckets: int = 16,
    mode: str = "append",
) -> None:
    register_rowstore(df.sparkSession)
    w = df.write.format(FORMAT_NAME).option("path", path).mode(mode)
    if bucket_key is not None:
        w = w.option("bucket_key", bucket_key).option("n_buckets", str(n_buckets))
    w.save()


def merge_upsert_rowstore(
    spark: SparkSession, updates: DataFrame, path: str
) -> None:
    """MERGE INTO the store by its bucket key (Delta-style upsert with
    delete-matching-insert semantics for non-unique keys): every row
    of a key present in ``updates`` is replaced by that key's update
    rows; unmatched keys insert.

    Mechanics — the bucket-rewrite pattern every log-structured table
    format uses: only the buckets TOUCHED by the update are rewritten
    (current live rows of those buckets, minus updated keys, plus the
    updates), committed through the normal two-phase write whose
    manifest swap ALSO soft-deletes the buckets' prior files (an
    ``rm`` version mark — Delta's add/remove log).  One atomic swap ⇒
    a crash leaves either the old snapshot or the new one, never a
    double-count; time travel to pre-merge versions still sees the
    replaced files.

    Scale shape: untouched buckets move zero bytes; the rewrite is
    one distributed anti-join + union over the touched buckets'
    rows.  The driver collects only the touched BUCKET IDS
    (≤ n_buckets integers), never keys."""
    man = read_manifest(path)
    if man is None:
        raise ValueError(f"no rowstore at {path}")
    key, n = man["bucket_key"], man["n_buckets"]
    from pyspark.sql import functions as F

    bucket_expr = F.crc32(F.col(key).cast("string").cast("binary")) % n
    touched = sorted(
        r[0] for r in updates.select(bucket_expr.alias("b")).distinct().collect()
    )
    # route the read to the touched buckets at FILE level (the
    # buckets option prunes before any row moves); the residual
    # bucket_expr filter is belt-and-braces row-level equivalence
    current = read_rowstore(spark, path, buckets=touched).where(
        bucket_expr.isin(*touched)
    )
    keep = current.join(updates.select(key).distinct(), key, "left_anti")
    # no repartition needed: the writer normalizes every batch to the
    # store's canonical Arrow schema (a join/union reorders columns
    # and flips nullability metadata between the arms).
    # allowMissingColumns: updates may EVOLVE the schema (new columns
    # null-fill on the kept rows) or omit nullable store columns
    merged = keep.unionByName(updates, allowMissingColumns=True)
    register_rowstore(spark)
    (
        merged.write.format(FORMAT_NAME)
        .option("path", path)
        .option("replace_buckets", ",".join(str(b) for b in touched))
        .mode("append")
        .save()
    )


def merge_into_rowstore(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    *,
    matched_update: dict[str, str] | None = None,
    matched_update_cond: str | None = None,
    matched_delete_cond: str | None = None,
    insert_values: dict[str, str] | None = None,
) -> None:
    """Full conditional MERGE grammar (Delta's ``MERGE INTO`` with one
    UPDATE clause, one DELETE clause, and one INSERT clause), joined on
    the store's bucket key:

    - WHEN MATCHED AND ``matched_delete_cond`` THEN DELETE (evaluated
      FIRST, like a DELETE clause listed before UPDATE);
    - WHEN MATCHED [AND ``matched_update_cond``] THEN UPDATE SET
      ``matched_update`` (``{column: SQL expr}`` over ``t.``/``s.``
      aliases; unlisted columns keep their target value);
    - WHEN NOT MATCHED THEN INSERT ``insert_values`` (``{column: SQL
      expr}`` over ``s.``; omitted ⇒ no insert clause; columns absent
      from the mapping null-fill).

    Delta's multiple-matches contract is enforced: a source with two
    rows for one key raises instead of producing nondeterministic
    update results.  Same bucket-rewrite mechanics and crash safety as
    :func:`merge_upsert_rowstore` (which stays the fast path for the
    common replace-by-key upsert): only touched buckets rewrite, one
    atomic manifest swap with ``rm`` marks, time travel intact."""
    man = read_manifest(path)
    if man is None:
        raise ValueError(f"no rowstore at {path}")
    key, n = man["bucket_key"], man["n_buckets"]
    from pyspark.sql import functions as F

    if source.groupBy(key).count().where(F.col("count") > 1).limit(1).count():
        raise ValueError(
            "merge_into_rowstore: multiple source rows share a merge key — "
            "the UPDATE result would be nondeterministic (Delta's "
            "DELTA_MULTIPLE_SOURCE_ROW_MATCHING contract); pre-aggregate "
            "the source to one row per key"
        )
    schema_cols = [
        f["name"] for f in json.loads(man["schema"])["fields"]
    ]
    types = {f.name: f.dataType for f in read_rowstore(spark, path).schema.fields}
    bucket_expr = F.crc32(F.col(key).cast("string").cast("binary")) % n
    touched = sorted(
        r[0] for r in source.select(bucket_expr.alias("b")).distinct().collect()
    )
    current = read_rowstore(spark, path, buckets=touched).where(
        bucket_expr.isin(*touched)
    )
    t, s = current.alias("t"), source.alias("s")
    joined = t.join(s, F.col(f"t.`{key}`") == F.col(f"s.`{key}`"), "left")
    matched = F.col(f"s.`{key}`").isNotNull()
    # NULL-condition rows must fall through to "keep unchanged", not
    # vanish under where(~NULL) — coalesce to FALSE like SQL WHEN
    def _cond(expr_sql):
        return F.coalesce(F.expr(expr_sql).cast("boolean"), F.lit(False))

    delete = (
        matched & _cond(matched_delete_cond)
        if matched_delete_cond
        else F.lit(False)
    )
    update = matched & (
        _cond(matched_update_cond) if matched_update_cond else F.lit(True)
    )
    upd = matched_update or {}
    kept = joined.where(~delete).select(
        *[
            F.when(update, F.expr(upd[c]).cast(types[c]))
            .otherwise(F.col(f"t.`{c}`"))
            .alias(c)
            if c in upd
            else F.col(f"t.`{c}`").alias(c)
            for c in schema_cols
        ]
    )
    merged = kept
    if insert_values is not None:
        iv = insert_values
        inserts = (
            source.alias("s")
            .join(current.select(key).distinct(), key, "left_anti")
            .select(
                *[
                    F.expr(iv[c]).cast(types[c]).alias(c)
                    if c in iv
                    else F.lit(None).cast(types[c]).alias(c)
                    for c in schema_cols
                ]
            )
        )
        merged = kept.unionByName(inserts)
    register_rowstore(spark)
    (
        merged.write.format(FORMAT_NAME)
        .option("path", path)
        .option("replace_buckets", ",".join(str(b) for b in touched))
        .mode("append")
        .save()
    )


def read_rowstore(
    spark: SparkSession,
    path: str,
    as_of_version: int | None = None,
    buckets: list[int] | None = None,
) -> DataFrame:
    """Read the store — optionally a TIME-TRAVEL snapshot ``as of`` a
    manifest version (the Delta/Iceberg `VERSION AS OF` semantics,
    native to this store's append-only manifest log: an as-of read
    simply drops files added by newer commits; bucket/stats pruning
    still applies on top).

    USAGE NOTE (pyspark Python-DataSource engine behavior): the FIRST
    action on the returned DataFrame freezes its planned scan —
    including any keyed pruning pushed by that action's filters — and
    later actions on the SAME DataFrame reuse it.  Run each
    differently-filtered query against a fresh ``read_rowstore`` call
    (cheap: planning only re-reads the manifest).  Every internal
    caller follows this rule; tests/test_rowstore.py pins the
    fresh-read behavior."""
    register_rowstore(spark)
    r = spark.read.format(FORMAT_NAME).option("path", path)
    if as_of_version is not None:
        r = r.option("as_of_version", str(as_of_version))
    if buckets is not None:
        r = r.option("buckets", ",".join(str(b) for b in buckets))
    return r.load()


def rowstore_history(path: str) -> list[dict]:
    """The store's commit history, driver-side from the manifest log:
    one row per version — files/rows/bytes added and cumulative rows
    (the `DESCRIBE HISTORY` analogue)."""
    man = read_manifest(path)
    if man is None:
        return []
    per: dict[int, dict] = {}
    for e in man["files"]:
        v = e.get("v", 0)
        d = per.setdefault(
            v, {"version": v, "n_files_added": 0, "n_rows_added": 0, "bytes_added": 0}
        )
        d["n_files_added"] += 1
        d["n_rows_added"] += e.get("n_rows", 0)
        d["bytes_added"] += e.get("bytes", 0) or 0
    out, cum = [], 0
    for v in sorted(per):
        cum += per[v]["n_rows_added"]
        out.append({**per[v], "cum_rows": cum})
    return out


def stream_rowstore(
    spark: SparkSession, path: str, max_versions_per_batch: int | None = None
) -> DataFrame:
    """readStream over the store's commit log (manifest versions).

    ``max_versions_per_batch`` bounds how many commits a micro-batch
    may advance (catch-up rate limiting; None = unbounded; an
    availableNow run then takes one bounded batch per drain)."""
    register_rowstore(spark)
    r = spark.readStream.format(FORMAT_NAME).option("path", path)
    if max_versions_per_batch is not None:
        r = r.option("max_versions_per_batch", str(max_versions_per_batch))
    return r.load()


def stream_write_rowstore(
    stream_df: DataFrame,
    path: str,
    checkpoint_path: str,
    bucket_key: str | None = None,
    n_buckets: int = 16,
    available_now: bool = True,
):
    """writeStream into the store: one epoch-idempotent manifest
    commit per micro-batch (replayed batchIds discard their rewrite),
    so the sink is exactly-once under restart — composable with
    :func:`stream_rowstore` into a CDC pipe."""
    register_rowstore(stream_df.sparkSession)
    w = (
        stream_df.writeStream.format(FORMAT_NAME)
        .option("path", path)
        .option("checkpointLocation", checkpoint_path)
    )
    if bucket_key is not None:
        w = w.option("bucket_key", bucket_key).option("n_buckets", str(n_buckets))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


# --------------------------------------------------------------------------
# Reference-parity convenience paths (heatmap.py:131–150 analogues)
# --------------------------------------------------------------------------


def append_heatmaps_rowstore(heatmaps: DataFrame, store_path: str) -> None:
    """The reference's sink (`rhom.heatmaps` append, heatmap.py:149–150):
    (id, heatmap) rows keyed by result-set id."""
    write_rowstore(heatmaps, store_path, bucket_key="id", mode="append")


def read_locations_rowstore(spark: SparkSession, store_path: str) -> DataFrame:
    """The reference's source (`rhom.locations`, heatmap.py:137) read
    back through the registered format — keyed scans prune to the
    user's bucket when a user_id predicate is pushed."""
    return read_rowstore(spark, store_path)


def _carry_rewrite_tombstone(old_man: dict, new_man: dict, rewrite_v: int) -> None:
    """A compaction/clustering rewrite invalidates CDC replay windows
    at or past it — replaying adds at the rewrite version would emit
    every pre-rewrite row AND its rewritten copy — exactly like a
    MERGE's ``rm`` marks.  But the overwrite path writes a FRESH
    manifest, erasing any prior marks and the vacuum tombstone, so a
    checkpointed CDC stream crossing the rewrite would silently
    double-count instead of hitting ``_files_between``'s append-only
    guard.  Carry the guard across: record the rewrite itself, plus
    every earlier rewrite the pre-rewrite manifest knew about (live
    ``rm`` marks, an ``earliest_rewrite`` tombstone, or the legacy
    version-less ``rewrites_expired`` flag), as a durable
    ``earliest_rewrite`` tombstone on the new manifest."""
    cands = [rewrite_v]
    cands += [e["rm"] for e in old_man["files"] if "rm" in e]
    prev = old_man.get("earliest_rewrite")
    if prev is not None:
        cands.append(prev)
    elif old_man.get("rewrites_expired"):
        # legacy tombstone without a recorded version: the rewrite
        # could have been anywhere — stay conservative
        cands.append(0)
    new_man["rewrites_expired"] = True
    new_man["earliest_rewrite"] = min(cands)


def compact_rowstore(spark: SparkSession, path: str) -> int:
    """Cassandra-style compaction: many per-(task, epoch) files per
    bucket → one write's worth, fully THROUGH the engine (batch read →
    overwrite write, so the rewrite is distributed and bucket-split by
    the ordinary writer).  The manifest version stays monotonic
    (overwrite resets to 1, then we restore old_version + 1) so batch
    readers are unaffected; the rewrite records itself as an
    ``earliest_rewrite`` tombstone so a checkpointed CDC stream whose
    window crosses the compaction fails loudly (append-only guard)
    instead of double-counting the rewritten rows — windows entirely
    before it stay replayable.  Old data files become unreferenced;
    reclaim with :func:`vacuum_rowstore`.  Returns the number of files
    compacted away (before − after)."""
    man = read_manifest(path)
    if man is None:
        return 0
    before_files = {e["name"] for e in man["files"]}
    old_version, old_epochs = man["version"], man.get("epochs", [])
    df = read_rowstore(spark, path)
    # one shuffle-free rewrite: the writer re-buckets rows per task, so
    # coalescing first keeps files-per-bucket == 1 for modest stores
    write_rowstore(
        df.coalesce(max(1, man["n_buckets"] // 8)),
        path,
        bucket_key=man["bucket_key"],
        n_buckets=man["n_buckets"],
        mode="overwrite",
    )
    new = read_manifest(path)
    new["version"] = old_version + 1
    for e in new["files"]:
        e["v"] = old_version + 1
    if old_epochs:
        new["epochs"] = old_epochs  # replay guard survives compaction
    _carry_rewrite_tombstone(man, new, new["version"])
    _write_manifest(path, new)
    return max(0, len(before_files) - len(new["files"]))


def _zorder_expr(df: DataFrame, cols: list[str], bits: int = 8):
    """Multi-column ZORDER key the way Delta's OPTIMIZE builds one:
    quantile-bucket each column into 2^bits range ids (equal-FREQUENCY
    via percentile_approx, so skew splits instead of hot-spotting —
    equal-width buckets would put 99% of a skewed column in one id),
    then bit-interleave the ids.  One small aggregate computes the
    boundaries (2^bits-1 literals per column, embedded in the plan);
    the key itself is map-only Column math.  Numeric/timestamp columns
    only — the quantile step needs an ordered cast to double."""
    from pyspark.sql import functions as F

    n_b = (1 << bits) - 1
    qs = [i / (n_b + 1) for i in range(1, n_b + 1)]
    ids = []
    for c in cols:
        v = F.col(c).cast("double")
        bounds = (
            df.select(
                F.percentile_approx(v, qs, 10_000).alias("b")
            ).first()["b"]
        ) or []
        arr = F.array(*[F.lit(float(b)) for b in bounds]) if bounds else F.array()
        ids.append(
            F.aggregate(
                arr,
                F.lit(0).cast("bigint"),
                lambda acc, bv: acc
                + F.when(v >= bv, F.lit(1)).otherwise(F.lit(0)).cast("bigint"),
            )
        )
    # interleave: bit b of column i lands at position b*len(cols)+i
    terms = []
    for i, bid in enumerate(ids):
        for b in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(bid, b).bitwiseAND(F.lit(1)),
                    b * len(ids) + i,
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")


def optimize_rowstore(
    spark: SparkSession,
    path: str,
    by: str | list[str],
    n_partitions: int | None = None,
) -> int:
    """OPTIMIZE ... ZORDER-style clustering rewrite.  With a single
    ``by`` column: repartition the store BY RANGE on (bucket, ``by``)
    and rewrite, so each bucket's files carry tight, near-disjoint
    ``by`` ranges — which makes the per-file column stats (data
    skipping) selective for range predicates on ``by``.  With a LIST
    of columns: range-partition on (bucket, Morton key of the columns'
    quantile-bucket ids) — Delta's multi-column ZORDER — so range
    predicates on ANY listed column prune (each key range spans a
    bounded slab of every interleaved dimension; pinned in
    tests/test_rowstore.py).  Same distributed read → overwrite path
    and version restoration as :func:`compact_rowstore`; old files
    become unreferenced until :func:`vacuum_rowstore`.  Returns the
    number of live files after the rewrite.

    At scale this is the standard layout-maintenance job: run it on
    the cold tail after ingest settles; range partitioning samples the
    key distribution, so skew in ``by`` splits rather than hot-spots.
    """
    man = read_manifest(path)
    if man is None:
        raise ValueError(f"no rowstore at {path}")
    from pyspark.sql import functions as F

    key, nb = man["bucket_key"], man["n_buckets"]
    old_version, old_epochs = man["version"], man.get("epochs", [])
    n = n_partitions or max(2, len([e for e in man["files"] if "rm" not in e]))
    bucket_expr = F.crc32(F.col(key).cast("string").cast("binary")) % nb
    base = read_rowstore(spark, path)
    if isinstance(by, str):
        cluster_key = F.col(by)
    elif len(by) == 1:
        cluster_key = F.col(by[0])
    else:
        cluster_key = _zorder_expr(base, list(by))
    df = base.repartitionByRange(n, bucket_expr, cluster_key)
    write_rowstore(df, path, bucket_key=key, n_buckets=nb, mode="overwrite")
    new = read_manifest(path)
    new["version"] = old_version + 1
    for e in new["files"]:
        e["v"] = old_version + 1
    if old_epochs:
        new["epochs"] = old_epochs
    _carry_rewrite_tombstone(man, new, new["version"])
    _write_manifest(path, new)
    return len(new["files"])


def delete_from_rowstore(
    spark: SparkSession, keys: DataFrame, path: str
) -> None:
    """DELETE by key (GDPR-erasure shape): rewrite the touched buckets
    WITHOUT the given keys' rows — the merge machinery with an empty
    insert arm.  Same single-manifest-swap crash safety and
    time-travel semantics as :func:`merge_upsert_rowstore`; the bytes
    leave disk when :func:`vacuum_rowstore` expires the retention
    window (until then pre-delete snapshots still answer, which is the
    auditable-erasure pattern: logical delete now, physical on
    vacuum)."""
    man = read_manifest(path)
    if man is None:
        raise ValueError(f"no rowstore at {path}")
    key, n = man["bucket_key"], man["n_buckets"]
    from pyspark.sql import functions as F

    bucket_expr = F.crc32(F.col(key).cast("string").cast("binary")) % n
    touched = sorted(
        r[0] for r in keys.select(bucket_expr.alias("b")).distinct().collect()
    )
    current = read_rowstore(spark, path, buckets=touched).where(
        bucket_expr.isin(*touched)
    )
    keep = current.join(keys.select(key).distinct(), key, "left_anti")
    register_rowstore(spark)
    (
        keep.write.format(FORMAT_NAME)
        .option("path", path)
        .option("replace_buckets", ",".join(str(b) for b in touched))
        .mode("append")
        .save()
    )


def vacuum_rowstore(path: str, keep_versions: int | None = None) -> int:
    """Delete data files no manifest references (compaction leftovers,
    crashed-task orphans, pre-overwrite files).  Pure GC: the manifest
    is the source of truth, so unreferenced files are invisible to
    every reader already.  Returns the number of files removed.

    With ``keep_versions`` set, ALSO expires files soft-deleted by
    MERGE (``rm`` marks) at least that many manifest versions ago:
    their entries leave the manifest in one atomic swap FIRST (so no
    snapshot within the retention window references them), then the
    bytes are deleted — Delta VACUUM semantics; time travel further
    back than the window is the documented trade."""
    man = read_manifest(path)
    if man is None:
        return 0
    if keep_versions is not None:
        horizon = man["version"] - keep_versions
        keep_entries = [
            e for e in man["files"] if "rm" not in e or e["rm"] > horizon
        ]
        if len(keep_entries) < len(man["files"]):
            expired_rms = [
                e["rm"] for e in man["files"] if "rm" in e and e["rm"] <= horizon
            ]
            man["files"] = keep_entries
            # the expired 'rm' marks are what the CDC stream reader's
            # append-only guard looks for — leave a durable tombstone
            # (with the earliest expired rewrite version, so replays of
            # windows entirely BEFORE it stay valid) so vacuuming can
            # never silently re-arm a replay that would double-count
            # the rewritten rows
            man["rewrites_expired"] = True
            prev = man.get("earliest_rewrite")
            man["earliest_rewrite"] = min(
                expired_rms + ([prev] if prev is not None else [])
            )
            _write_manifest(path, man)
    live = {os.path.normpath(e["name"]) for e in man["files"]}
    data_dir = os.path.join(path, "data")
    removed = 0
    if os.path.isdir(data_dir):
        for fn in os.listdir(data_dir):
            rel = os.path.normpath(os.path.join("data", fn))
            if rel not in live:
                try:
                    os.remove(os.path.join(data_dir, fn))
                    removed += 1
                except OSError:
                    pass
    return removed
