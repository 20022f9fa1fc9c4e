"""Job entrypoint for the flagship pipeline (``ray job submit`` target).

Usage:
    ray job submit -- python scripts/run_flagship.py \
        --pages /data/pages_parquet --out /data/out --zoom 7
    # or locally:
    python scripts/run_flagship.py --pages /tmp/karta_ray_bench/pages_1000000 \
        --out /tmp/flagship_out

Runs pages -> extract -> cells -> PIP join -> per-(polygon, cell)
aggregate with per-stage parquet checkpoints + manifests; re-submitting
after a failure resumes from the last complete stage. Prints a JSON
summary (rows per stage, wall time, skipped/executed stages).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages parquet dir")
    ap.add_argument("--out", required=True, help="checkpoint/output root")
    ap.add_argument("--zoom", type=int, default=7)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only for local runs; under `ray job submit` the "
                         "cluster is already up and this is ignored")
    ap.add_argument("--shards", type=int, default=0,
                    help="also write the aggregate through the "
                         "shard-level resumable sink (stages/sink.py) "
                         "partitioned by cell_id into this many hash "
                         "shards; re-runs skip complete shards")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        if args.num_cpus:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False)
        else:
            ray.init()

    from karta_ray.pipelines.flagship import flagship_checkpointed

    t0 = time.perf_counter()
    agg, pipe = flagship_checkpointed(args.pages, args.out, zoom=args.zoom)
    rows = agg.count()
    shard_summary = None
    if args.shards:
        from karta_ray.stages.sink import resumable_parquet_sink

        metrics = resumable_parquet_sink(
            agg, os.path.join(args.out, "aggregate_shards"),
            by="cell_id", shards=args.shards).to_pandas()
        shard_summary = {
            "shards_written": int((~metrics.skipped).sum()),
            "shards_resumed": int(metrics.skipped.sum()),
            "rows": int(metrics.rows.sum()),
        }
    summary = {
        "ok": True,
        "wall_s": round(time.perf_counter() - t0, 2),
        "aggregate_rows": rows,
        "executed": pipe.executed,
        "resumed_from_checkpoint": pipe.skipped,
        "stages": {s: pipe.read_manifest(s)["rows"]
                   for s in ("extract", "cells", "join", "aggregate")
                   if pipe.read_manifest(s)},
        "out": args.out,
    }
    if shard_summary is not None:
        summary["sharded_sink"] = shard_summary
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
