"""Sharded-file ingestion for many-file corpora.

The reference's loaders open one wav per source per example
(`libri2mix.py:130-160`-style); at millions of small files the per-open
cost and metadata churn dominate. This packs a corpus into a few large
shard files (array-record style) with an O(1) byte-offset index, so random
access is one seek+read from the OS page cache — no decode at all (samples
are stored as raw little-endian float32) — and feeds the existing
threaded-prefetch DataLoader (data/loader.py), whose ``device_put_fn``
hook overlaps H2D transfer with the next batch's reads (the device-side
prefetch ring).

Format (version 1):
  <name>.shard-NNNNN.bin   concatenated raw record payloads
  <name>.index.json        {"version", "schema": [[field, dtype], ...],
                            "records": [[shard, offset, [shape...] per
                            field], ...]}

Records are tuples of ndarrays matching ``schema`` order; shapes may vary
per record (e.g. FUSS variable source counts), byte sizes derive from
dtype x shape.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

_VERSION = 1


def write_shards(
    records: Iterable[Tuple[np.ndarray, ...]],
    out_dir: str,
    name: str = "data",
    schema: Optional[Sequence[Tuple[str, str]]] = None,
    target_shard_bytes: int = 256 * 2**20,
) -> str:
    """Pack an iterable of array tuples into shards; returns the index path."""
    os.makedirs(out_dir, exist_ok=True)
    index: List = []
    shard_id, shard_f, shard_off = -1, None, 0

    def roll():
        nonlocal shard_id, shard_f, shard_off
        if shard_f is not None:
            shard_f.close()
        shard_id += 1
        shard_off = 0
        shard_f = open(
            os.path.join(out_dir, f"{name}.shard-{shard_id:05d}.bin"), "wb"
        )

    roll()
    for rec in records:
        rec = tuple(np.ascontiguousarray(a) for a in rec)
        if schema is None:
            schema = [(f"field{i}", str(a.dtype)) for i, a in enumerate(rec)]
        assert len(rec) == len(schema), "record arity != schema arity"
        if shard_off > 0 and shard_off >= target_shard_bytes:
            roll()
        shapes = []
        for (fname, dtype), a in zip(schema, rec):
            assert str(a.dtype) == dtype, (
                f"{fname}: dtype {a.dtype} != schema {dtype}"
            )
            shard_f.write(a.tobytes())
            shapes.append(list(a.shape))
        index.append([shard_id, shard_off, shapes])
        shard_off += sum(a.nbytes for a in rec)
    shard_f.close()

    index_path = os.path.join(out_dir, f"{name}.index.json")
    with open(index_path, "w") as fh:
        json.dump(
            {"version": _VERSION, "schema": [list(s) for s in schema],
             "records": index},
            fh,
        )
    return index_path


class ShardedDataset:
    """Map-style dataset over a shard set: __getitem__ is one pread per
    field. Compatible with data.loader.DataLoader (tuple records)."""

    def __init__(self, index_path: str):
        with open(index_path) as fh:
            meta = json.load(fh)
        assert meta["version"] == _VERSION, f"bad shard version {meta['version']}"
        self.schema = [(n, np.dtype(d)) for n, d in meta["schema"]]
        self.records = meta["records"]
        base = index_path[: -len(".index.json")]
        self._shard_path = lambda sid: f"{base}.shard-{sid:05d}.bin"
        self._files: dict = {}

    def __len__(self):
        return len(self.records)

    def _file(self, sid: int):
        f = self._files.get(sid)
        if f is None:
            f = open(self._shard_path(sid), "rb", buffering=0)
            self._files[sid] = f
        return f

    def __getitem__(self, idx: int):
        sid, off, shapes = self.records[idx]
        f = self._file(sid)
        out = []
        for (fname, dtype), shape in zip(self.schema, shapes):
            nbytes = int(np.prod(shape)) * dtype.itemsize if shape else dtype.itemsize
            buf = os.pread(f.fileno(), nbytes, off)
            out.append(np.frombuffer(buf, dtype=dtype).reshape(shape))
            off += nbytes
        return tuple(out)

    def get_generator(self, batch_size=4, shuffle=True, num_workers=4,
                      drop_last=True, **kw):
        from sudo_rm_rf_tpu.data.loader import DataLoader

        return DataLoader(self, batch_size=batch_size, shuffle=shuffle,
                          num_workers=num_workers, drop_last=drop_last, **kw)


def pack_dataset(dataset, out_dir: str, name: str = "data",
                 schema: Optional[Sequence[Tuple[str, str]]] = None,
                 target_shard_bytes: int = 256 * 2**20) -> str:
    """Pack any map-style dataset (tuples of arrays, or a single array per
    item) into shards — e.g. a WHAM/LibriMix/FUSS loader, so training epochs
    read from a handful of files instead of the raw corpus."""

    def gen():
        for i in range(len(dataset)):
            item = dataset[i]
            if not isinstance(item, tuple):
                item = (item,)
            yield tuple(np.asarray(a) for a in item)

    return write_shards(gen(), out_dir, name=name, schema=schema,
                        target_shard_bytes=target_shard_bytes)
