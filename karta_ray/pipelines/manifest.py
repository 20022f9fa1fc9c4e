"""Checkpointed pipeline execution with per-stage manifests.

The reference has no checkpoint/resume at all (SURVEY.md §4); at 100 TB
it is mandatory. Model:

- A pipeline is a named sequence of stages; each stage is a function
  ``prev_dataset | None -> Dataset``.
- Every stage materializes to ``<root>/<stage>/`` as partitioned parquet
  and writes ``<root>/<stage>/_MANIFEST.json`` with row counts, the
  per-file partition inventory (path, rows, bytes), input lineage
  (upstream stage + its digest) and a digest over the partition
  inventory.
- On re-run, stages whose manifest is complete and whose upstream
  digest matches are skipped and re-read from parquet — a failed job
  resumes mid-pipeline; outputs are deterministic partition files, so
  re-execution is idempotent.
"""

from __future__ import annotations

import hashlib
import json
import os
import time


MANIFEST_NAME = "_MANIFEST.json"


def _partition_inventory(stage_dir: str):
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(stage_dir)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(stage_dir, name)
        md = pq.read_metadata(path)
        out.append({"file": name, "rows": md.num_rows,
                    "bytes": os.path.getsize(path)})
    return out


def _digest(obj) -> str:
    return hashlib.sha256(
        json.dumps(obj, sort_keys=True).encode()).hexdigest()[:16]


class CheckpointedPipeline:
    """Run stages with parquet checkpoints + manifest-based resume."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.executed: list[str] = []   # stages actually computed this run
        self.skipped: list[str] = []    # stages resumed from checkpoint
        self._last_digest: str | None = None
        self._last_stage: str | None = None

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.root, stage, MANIFEST_NAME)

    def read_manifest(self, stage: str):
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def stage(self, name: str, fn):
        """Execute (or resume) one stage; returns its Dataset."""
        import ray.data

        stage_dir = os.path.join(self.root, name)
        man = self.read_manifest(name)
        if (man and man.get("complete")
                and man.get("input_digest") == self._last_digest):
            self.skipped.append(name)
            self._last_digest = man["digest"]
            self._last_stage = name
            return ray.data.read_parquet(stage_dir)

        prev_ds = None
        if self._last_stage is not None:
            prev_ds = ray.data.read_parquet(
                os.path.join(self.root, self._last_stage))

        t0 = time.perf_counter()
        ds = fn(prev_ds)
        if os.path.isdir(stage_dir):
            for f in os.listdir(stage_dir):
                os.remove(os.path.join(stage_dir, f))
        os.makedirs(stage_dir, exist_ok=True)
        ds.write_parquet(stage_dir)
        wall = time.perf_counter() - t0

        inv = _partition_inventory(stage_dir)
        digest = _digest(inv)
        man = {
            "stage": name,
            "complete": True,
            "rows": sum(p["rows"] for p in inv),
            "partitions": inv,
            "input_stage": self._last_stage,
            "input_digest": self._last_digest,
            "digest": digest,
            "wall_s": round(wall, 3),
        }
        with open(self._manifest_path(name), "w") as f:
            json.dump(man, f, indent=1)
        self.executed.append(name)
        self._last_digest = digest
        self._last_stage = name
        import ray.data as rd

        return rd.read_parquet(stage_dir)
