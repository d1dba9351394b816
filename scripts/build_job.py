#!/usr/bin/env python
"""Production build job — the spark-submit entry point (north_star:
"runs via spark-submit --py-files at N and 4N executors").

Usage (cluster):

    zip -r cuckoo_filter_spark.zip cuckoo_filter_spark
    spark-submit --py-files cuckoo_filter_spark.zip \
        scripts/build_job.py \
        --input s3://bucket/pages --key-col url \
        --output s3://bucket/filter_shards \
        --num-shards 1024 --bits-per-item 16 \
        --checkpoint-dir s3://bucket/filter_ck

Local smoke:

    python scripts/build_job.py --input /tmp/pages.parquet \
        --key-col url --output /tmp/shards --num-shards 8

The job is idempotent/resumable: with --checkpoint-dir, completed
shards are skipped on rerun and the final filter is bit-identical.
With --checkpoint-dir the shard blobs live under
<checkpoint-dir>/shards (the checkpoint IS the output; --output is
not needed and rejected if both are given — the old behavior silently
ignored --output while reporting it as written). The checkpoint
manifest is managed with local-fs I/O, so --checkpoint-dir must be a
local/NFS path visible to the driver — an s3://-style URI fails loud
here rather than writing a literal './s3:/...' directory.
Prints one JSON line of build metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="parquet path / iceberg table")
    p.add_argument("--key-col", default="url")
    p.add_argument("--output", default=None,
                   help="shard blob parquet dir (required unless "
                        "--checkpoint-dir, whose <dir>/shards is the output)")
    p.add_argument("--num-shards", type=int, default=32)
    p.add_argument("--bits-per-item", type=int, default=16)
    p.add_argument("--tags-per-bucket", type=int, default=4)
    p.add_argument("--mode", default="unique_local",
                   choices=["unique_local", "unique_global", "multiset"])
    p.add_argument("--capacity", type=int, default=None)
    p.add_argument("--checkpoint-dir", default=None)
    args = p.parse_args()
    if args.checkpoint_dir:
        if args.output:
            p.error("--output and --checkpoint-dir are mutually exclusive: "
                    "the checkpointed build writes shards under "
                    "<checkpoint-dir>/shards (that IS the output)")
        if "://" in args.checkpoint_dir:
            p.error("--checkpoint-dir must be a local/NFS path (the "
                    "manifest uses local-fs I/O); remote URIs would write "
                    "a literal './scheme:/...' directory")
    elif not args.output:
        p.error("--output is required without --checkpoint-dir")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"cuckoo-build:{args.input}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    df = spark.read.parquet(args.input)

    t0 = time.perf_counter()
    if args.checkpoint_dir:
        from cuckoo_filter_spark.operators.checkpoint import build_checkpointed

        build = build_checkpointed(
            df, args.key_col, args.checkpoint_dir, capacity=args.capacity,
            num_shards=args.num_shards, tags_per_bucket=args.tags_per_bucket,
            bits_per_item=args.bits_per_item, mode=args.mode,
        )
    else:
        from cuckoo_filter_spark.operators.sharded import build_sharded_cuckoo_filter

        build = build_sharded_cuckoo_filter(
            df, args.key_col, capacity=args.capacity,
            num_shards=args.num_shards, tags_per_bucket=args.tags_per_bucket,
            bits_per_item=args.bits_per_item, mode=args.mode,
            output_path=args.output,
        )
    wall = time.perf_counter() - t0
    rows = sum(m["rows"] for m in build.metrics)
    print(json.dumps({
        "input": args.input,
        "output": args.output or build.path,
        "rows": rows,
        "stored": sum(m["stored"] for m in build.metrics),
        "kicks": sum(m["kicks"] for m in build.metrics),
        "max_load_factor": max((m["load_factor"] for m in build.metrics), default=0.0),
        "wall_sec": round(wall, 2),
        "inserts_per_sec": round(rows / wall, 1) if wall > 0 else None,
        "num_shards": args.num_shards,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
