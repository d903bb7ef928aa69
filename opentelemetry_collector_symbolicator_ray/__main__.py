"""CLI entry point — the `ray job submit` surface.

    python -m opentelemetry_collector_symbolicator_ray synth --out DIR --rows N
    python -m opentelemetry_collector_symbolicator_ray run --input DIR --output DIR
    python -m opentelemetry_collector_symbolicator_ray aggregates --output DIR

`run` is checkpointed: re-submitting the same job after a kill resumes
from the per-shard manifest without reprocessing completed partitions
(state/checkpoint.py).  Only this CLI owns the Ray session; library code
never calls ray.init().
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="opentelemetry_collector_symbolicator_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_synth = sub.add_parser("synth", help="generate a deterministic pre-tokenized corpus")
    p_synth.add_argument("--out", required=True)
    p_synth.add_argument("--rows", type=int, default=10000)
    p_synth.add_argument("--files", type=int, default=16)
    p_synth.add_argument("--seed", type=int, default=42)

    p_run = sub.add_parser("run", help="checkpointed routed symbolication run")
    p_run.add_argument("--input", required=True, help="corpus dir (tokens-*.parquet)")
    p_run.add_argument("--output", required=True, help="output dir (sinks + manifest)")
    p_run.add_argument("--artifacts", default=None, help="artifact dir (default <input>/artifacts)")
    p_run.add_argument("--shard-size", type=int, default=4)
    p_run.add_argument(
        "--collector-config",
        default=None,
        help="reference collector config.yaml: processor sections map onto "
        "the engine config (attribute-key remaps, store selection, caches); "
        "CLI flags still control pool sizing",
    )
    p_run.add_argument("--concurrency", type=int, default=None)
    p_run.add_argument("--batch-size", type=int, default=2048)
    p_run.add_argument("--salted", action="store_true", help="salted debug-id repartition")
    p_run.add_argument(
        "--shared-cache", action="store_true",
        help="cross-actor single-flight artifact cache (named coordinator actors)",
    )
    p_run.add_argument(
        "--cache-shards", type=int, default=1,
        help="hash-partition the shared cache over N coordinator shards",
    )
    p_run.add_argument(
        "--sequential",
        action="store_true",
        help="force per-shard sequential executions (default: one pipelined "
        "execution with a warm actor pool across all pending shards)",
    )
    p_run.add_argument(
        "--skip-failed-shards",
        action="store_true",
        help="record failing shards in the manifest and continue (resume retries them)",
    )

    p_agg = sub.add_parser("aggregates", help="print per-sink totals from committed manifests")
    p_agg.add_argument("--output", required=True)

    p_serve = sub.add_parser(
        "serve",
        help="OTLP/HTTP listener + periodic micro-batch symbolication drains",
    )
    p_serve.add_argument("--spool", required=True, help="JSONL spool dir")
    p_serve.add_argument("--output", required=True, help="sink/manifest output dir")
    p_serve.add_argument("--artifacts", required=True)
    p_serve.add_argument("--host", default="127.0.0.1")
    p_serve.add_argument(
        "--port", type=int, default=None,
        help="listener port (default 4318; an explicit value always wins "
        "over a --collector-config endpoint)",
    )
    p_serve.add_argument("--drain-interval", type=float, default=10.0)
    p_serve.add_argument(
        "--max-drains", type=int, default=None,
        help="stop after N drains (default: run until interrupted)",
    )
    p_serve.add_argument("--rotate-records", type=int, default=10_000)
    p_serve.add_argument(
        "--archive-drained", action="store_true",
        help="move committed spool files to <spool>/drained/ (bounds the "
        "spool listing for long-running listeners)",
    )
    p_serve.add_argument("--concurrency", type=int, default=None)
    p_serve.add_argument("--batch-size", type=int, default=2048)
    p_serve.add_argument(
        "--collector-config",
        default=None,
        help="reference collector config.yaml; also supplies the listener "
        "endpoint from receivers.otlp.protocols.http unless --port is given",
    )

    p_compact = sub.add_parser(
        "compact-spool",
        help="merge <spool>/drained/*.jsonl into a parquet archive "
        "(replayable via read_archived_spool with identical doc_ids)",
    )
    p_compact.add_argument("--spool", required=True)
    p_compact.add_argument(
        "--keep-jsonl", action="store_true",
        help="keep the source drained files (default: delete after the "
        "archive rename commits)",
    )

    args = parser.parse_args(argv)

    if args.cmd == "compact-spool":
        from .sources.otlp_http import compact_drained_spool

        print(
            json.dumps(
                compact_drained_spool(args.spool, delete=not args.keep_jsonl),
                sort_keys=True,
            )
        )
        return 0

    if args.cmd == "synth":
        from .synth import generate_corpus

        generate_corpus(args.out, args.rows, num_files=args.files, seed=args.seed)
        print(json.dumps({"out": args.out, "rows": args.rows, "files": args.files}))
        return 0

    if args.cmd == "aggregates":
        from .state.checkpoint import ShardManifest

        print(json.dumps(ShardManifest(args.output).aggregates(), sort_keys=True))
        return 0

    if args.cmd == "serve":
        import time

        import ray

        if not ray.is_initialized():
            ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)
        try:
            from .config import PipelineConfig
            from .sources.otlp_http import OTLPHttpReceiver, drain_spool_checkpointed

            host, port = args.host, args.port
            if args.collector_config:
                from .collector_config import load_collector_config

                loaded = load_collector_config(
                    args.collector_config, artifacts_dir=args.artifacts
                )
                cfg = loaded["config"]
                cfg.concurrency = args.concurrency or (
                    1, max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
                )
                if "send_batch_size" not in loaded["batch"]:
                    cfg.batch_size = args.batch_size
                if loaded["otlp"]["http"] and port is None:
                    ep = loaded["otlp"]["http"]
                    ep_host, sep, p_str = ep.rpartition(":")
                    if not sep or not p_str.isdigit():
                        raise SystemExit(
                            f"collector config otlp http endpoint {ep!r} "
                            "must be host:port"
                        )
                    host = ep_host or args.host
                    port = int(p_str)
            else:
                cfg = PipelineConfig.with_default_routing(
                    args.artifacts,
                    concurrency=args.concurrency
                    or (1, max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)),
                    batch_size=args.batch_size,
                )
            receiver = OTLPHttpReceiver(
                args.spool, host=host, port=4318 if port is None else port,
                rotate_records=args.rotate_records,
            )
            print(
                json.dumps(
                    {"listening": f"http://{receiver.host}:{receiver.port}",
                     "spool": args.spool, "output": args.output}
                ),
                flush=True,
            )
            drains = 0
            try:
                while args.max_drains is None or drains < args.max_drains:
                    time.sleep(args.drain_interval)
                    receiver.rotate()
                    res = drain_spool_checkpointed(
                        args.spool, args.output, cfg, archive=args.archive_drained
                    )
                    drains += 1
                    print(json.dumps({"drain": drains, **res}, sort_keys=True), flush=True)
            except KeyboardInterrupt:
                pass
            finally:
                receiver.close()
        finally:
            ray.shutdown()
        return 0

    # run
    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)
    try:
        from .config import PipelineConfig
        from .pipelines.symbolicate import run_checkpointed

        artifacts = args.artifacts or os.path.join(args.input, "artifacts")
        if args.collector_config:
            from .collector_config import load_collector_config

            loaded = load_collector_config(args.collector_config, artifacts_dir=artifacts)
            cfg = loaded["config"]
            cfg.concurrency = args.concurrency or (
                1, max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
            )
            if "send_batch_size" not in loaded["batch"]:
                cfg.batch_size = args.batch_size
            cfg.shared_artifact_cache = args.shared_cache
            cfg.artifact_cache_shards = args.cache_shards
        else:
            cfg = PipelineConfig.with_default_routing(
                artifacts,
                concurrency=args.concurrency or (1, max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)),
                batch_size=args.batch_size,
                shared_artifact_cache=args.shared_cache,
                artifact_cache_shards=args.cache_shards,
            )
        totals = run_checkpointed(
            args.input,
            args.output,
            cfg,
            shard_size=args.shard_size,
            salted=args.salted,
            skip_failed_shards=args.skip_failed_shards,
            pipelined=False if args.sequential else None,
        )
        print(json.dumps(totals, sort_keys=True))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
