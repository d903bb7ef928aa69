"""Per-partition checkpoint lineage (SURVEY.md §4, north rule).

A run is split into shards (groups of input files).  Each shard writes
its per-sink parquet parts as ``out/<sink>/part-<sid>-*.parquet`` and
then commits a manifest row ``manifest/<sid>.json`` atomically (write
temp + rename).  On resume, committed shards are skipped and any orphan
part files from a crashed shard are deleted before reprocessing, so a
killed run resumes without reprocessing completed partitions and
aggregates derived from manifests match a fresh run exactly.
"""

from __future__ import annotations

import glob
import json
import os


class ShardManifest:
    def __init__(self, output_dir: str) -> None:
        self.output_dir = output_dir
        self.manifest_dir = os.path.join(output_dir, "manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def _path(self, sid: int) -> str:
        return os.path.join(self.manifest_dir, f"shard-{sid:05d}.json")

    def is_committed(self, sid: int) -> bool:
        return os.path.exists(self._path(sid))

    def commit(self, sid: int, entry: dict) -> None:
        tmp = self._path(sid) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f, sort_keys=True)
        os.replace(tmp, self._path(sid))  # atomic commit

    def read(self, sid: int) -> dict:
        with open(self._path(sid)) as f:
            return json.load(f)

    def committed_shards(self) -> list[int]:
        out = []
        for path in glob.glob(os.path.join(self.manifest_dir, "shard-*.json")):
            name = os.path.basename(path)
            out.append(int(name[len("shard-"): -len(".json")]))
        return sorted(out)

    def record_failure(self, sid: int, input_files: list[str], error: str) -> None:
        """Note a shard that raised (skip_failed_shards mode): written
        atomically next to the manifests; the shard itself stays
        UNCOMMITTED so a resume retries it."""
        path = os.path.join(self.manifest_dir, f"failed-{sid:05d}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"shard": sid, "input_files": input_files, "error": error}, f)
        os.replace(tmp, path)

    def clear_failure(self, sid: int) -> None:
        path = os.path.join(self.manifest_dir, f"failed-{sid:05d}.json")
        if os.path.exists(path):
            os.remove(path)

    def failed_shards(self) -> dict[int, dict]:
        out: dict[int, dict] = {}
        for path in glob.glob(os.path.join(self.manifest_dir, "failed-*.json")):
            with open(path) as f:
                entry = json.load(f)
            out[int(entry["shard"])] = entry
        return out

    def clean_orphan_outputs(self, sid: int) -> int:
        """Delete part files of an uncommitted (crashed) shard."""
        removed = 0
        for path in glob.glob(
            os.path.join(self.output_dir, "*", f"part-{sid:05d}-*.parquet")
        ):
            os.remove(path)
            removed += 1
        return removed

    def aggregates(self) -> dict[str, dict[str, int]]:
        """Per-sink totals derived from committed manifests only.
        ``*_cache_size`` keys are gauges and merge with max; everything
        else (counters, duration sums, token hashes) sums."""
        totals: dict[str, dict[str, int]] = {}
        for sid in self.committed_shards():
            entry = self.read(sid)
            for sink, counters in entry["sinks"].items():
                acc = totals.setdefault(
                    sink,
                    {
                        "rows": 0,
                        "failed_rows": 0,
                        "frames_processed": 0,
                        "frames_failed": 0,
                        "fetch_failures": 0,
                        "token_hash": 0,
                    },
                )
                for key, value in counters.items():
                    if key.endswith("_cache_size"):
                        acc[key] = max(acc.get(key, 0), value)
                    else:
                        acc[key] = acc.get(key, 0) + value
        return totals
