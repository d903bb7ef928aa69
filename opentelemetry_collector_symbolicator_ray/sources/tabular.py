"""Schema-evolution-tolerant parquet reading.

A 100 TB lake accumulates files written by different producer versions:
columns appear, disappear, and change width.  ``read_harmonized`` makes
one Dataset out of them: files are grouped by their FOOTER schema
(metadata-only driver pass — no data reads), each group is read with its
own ``read_parquet`` and normalized to the target schema in a streaming
``map_batches`` (missing columns materialize as nulls, extra columns
drop, compatible types cast), and the groups union into one logical
Dataset.  Casts use pyarrow's checked cast — a lossy narrowing raises
rather than silently corrupting."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data


def read_harmonized(paths: list[str], target: pa.Schema) -> "ray.data.Dataset":
    if not paths:
        raise ValueError("read_harmonized: empty path list")
    groups: dict[tuple, list[str]] = {}
    for p in sorted(paths):
        schema = pq.read_schema(p)  # one footer read per file
        key = tuple(sorted((n, str(schema.field(n).type)) for n in schema.names))
        groups.setdefault(key, []).append(p)

    def normalize(batch: pa.Table) -> pa.Table:
        cols = []
        for field in target:
            if field.name in batch.column_names:
                col = batch.column(field.name)
                if col.type != field.type:
                    col = pc.cast(col, field.type)
                cols.append(col)
            else:
                cols.append(pa.nulls(batch.num_rows, type=field.type))
        return pa.table(dict(zip(target.names, cols)))

    parts = [
        ray.data.read_parquet(files).map_batches(normalize, batch_format="pyarrow")
        for files in groups.values()
    ]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds
