"""CLI entry points — ``python -m deduper_ray <cmd>``.

Replaces the reference's programmatic-only API (Config builder + the
Deduper class, README.md:150-260 usage samples) with a job-file CLI
runnable locally or via ``ray job submit -- python -m deduper_ray ...``.

Commands:
  dedupe  --config job.json        exact dedup (DedupeConfig fields)
  neardup --source X --out DIR     near-dup clustering (NearDupConfig)
  neardup-incr --source X --out DIR --prior SIGS
                                   incremental near-dup vs a prior
                                   signature stage (S3 generalized)
  sample  --config job.json        first-row hash probe (getSampleHash)
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False, logging_level="ERROR"
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="deduper_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pd_ = sub.add_parser("dedupe", help="exact dedup job from a config file")
    pd_.add_argument("--config", required=True, help="JSON file of DedupeConfig fields")

    pn = sub.add_parser("neardup", help="near-dup detection + clustering")
    pn.add_argument("--source", required=True)
    pn.add_argument("--out", required=True)
    pn.add_argument("--config", help="JSON file of NearDupConfig fields")
    pn.add_argument("--no-resume", action="store_true")
    pn.add_argument("--containment", action="store_true")

    pi = sub.add_parser(
        "neardup-incr",
        help="incremental near-dup of a new batch vs prior signatures",
    )
    pi.add_argument("--source", required=True)
    pi.add_argument("--out", required=True)
    pi.add_argument("--prior", required=True,
                    help="prior run's signatures stage directory")
    pi.add_argument("--config", help="JSON file of NearDupConfig fields")

    ps = sub.add_parser("sample", help="first-row hash probe")
    ps.add_argument("--config", required=True)

    pc_ = sub.add_parser(
        "curate",
        help="gate -> decontaminate -> exact dedup -> near-dup -> annotate",
    )
    pc_.add_argument("--source", required=True)
    pc_.add_argument("--out", required=True)
    pc_.add_argument("--config", help="JSON of CurateConfig fields; a "
                     "'neardup' object maps to NearDupConfig")
    pc_.add_argument("--no-resume", action="store_true")

    args = p.parse_args(argv)
    _init_ray(args.num_cpus)
    import ray

    try:
        if args.cmd == "dedupe":
            from deduper_ray.config import DedupeConfig
            from deduper_ray.pipelines.exact_dedupe import dedupe

            with open(args.config) as f:
                raw = json.load(f)
            for k in ("hash_keys", "columns"):
                if raw.get(k) is not None:
                    raw[k] = tuple(raw[k])
            report = dedupe(DedupeConfig(**raw))
            print(report.to_json())
        elif args.cmd == "neardup":
            from deduper_ray.config import NearDupConfig
            from deduper_ray.pipelines.neardup import run_neardup

            raw = {}
            if args.config:
                with open(args.config) as f:
                    raw = json.load(f)
            res = run_neardup(
                args.source, args.out, NearDupConfig(**raw),
                resume=not args.no_resume, containment=args.containment,
            )
            print(json.dumps(res.__dict__, default=str, indent=2))
        elif args.cmd == "neardup-incr":
            from deduper_ray.config import NearDupConfig
            from deduper_ray.pipelines.incremental import (
                run_neardup_incremental,
            )

            raw = {}
            if args.config:
                with open(args.config) as f:
                    raw = json.load(f)
            res = run_neardup_incremental(
                args.source, args.out, NearDupConfig(**raw),
                prior_signatures=args.prior,
            )
            print(json.dumps(res.__dict__, default=str, indent=2))
        elif args.cmd == "curate":
            from deduper_ray.config import NearDupConfig
            from deduper_ray.pipelines.curate import (
                CurateConfig,
                run_curation,
            )

            raw = {}
            if args.config:
                with open(args.config) as f:
                    raw = json.load(f)
            if raw.get("neardup") is not None:
                raw["neardup"] = NearDupConfig(**raw["neardup"])
            if raw.get("benchmark_grams") is not None:
                raw["benchmark_grams"] = tuple(raw["benchmark_grams"])
            res = run_curation(
                args.source, args.out, CurateConfig(**raw),
                resume=not args.no_resume,
            )
            print(json.dumps(res.__dict__, default=str, indent=2))
        elif args.cmd == "sample":
            from deduper_ray.config import DedupeConfig
            from deduper_ray.pipelines.exact_dedupe import sample_hash

            with open(args.config) as f:
                raw = json.load(f)
            raw = {k: v for k, v in raw.items()
                   if k in ("source", "hash_keys", "columns", "order_by")}
            if raw.get("hash_keys"):
                raw["hash_keys"] = tuple(raw["hash_keys"])
            s, h = sample_hash(DedupeConfig(**raw))
            print(json.dumps({"sample_string": s, "sample_hash": h}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
