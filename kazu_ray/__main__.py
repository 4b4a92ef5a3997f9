"""CLI entry points.

    python -m kazu_ray run --sf-dir DIR --out DIR [--multiplier K]
        full KG pipeline → materialized, manifest-tracked triple store
        (re-running resumes: finished partitions are skipped)
    python -m kazu_ray annotate --sf-dir DIR --out DIR
        annotated-docs corpus with failed-docs side channel
    python -m kazu_ray lookup --store DIR --subj ID
        partition-pruned point query over a materialized triple store
    python -m kazu_ray build-caches [--cache-dir DIR]
        (re)build the ontology cache tables

These scripts own their Ray session (guarded init, shutdown at exit) —
library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_run(args) -> None:
    ray = _ray_session()
    from kazu_ray.pipelines.kg import broadcast_store, triples_dataset
    from kazu_ray.stages.materialize import materialize_triples

    cache_dir = None
    if getattr(args, "pack", None):
        from kazu_ray.state.pack import load_pack

        cache_dir = load_pack(args.pack)
    store_ref = broadcast_store(cache_dir)
    if args.by_shard:
        from kazu_ray.pipelines.resumable import run_resumable
        from kazu_ray.sources.corpus import ensure_pages_parquet

        pages_dir = args.pages_dir or ensure_pages_parquet(
            args.sf_dir, args.multiplier
        )
        result = run_resumable(
            pages_dir, args.out, store_ref=store_ref,
            num_shards=args.num_parts or 16,
        )
        print(json.dumps({"out": args.out, **result}))
        ray.shutdown()
        return
    extra = {}
    if getattr(args, "warc", None):
        # raw-crawl input: WARC segment files -> canonical pages shape;
        # no stored lang column, so the gate is the langid heuristic
        import glob as _glob

        from kazu_ray.sources.warc import pages_from_warc

        paths = sorted(
            p
            for pat in args.warc
            for p in (_glob.glob(pat) or [pat])
        )
        extra = {"pages_ds": pages_from_warc(paths), "lang": "auto"}
    triples = triples_dataset(
        args.sf_dir, store_ref=store_ref, multiplier=args.multiplier, **extra
    )
    manifests = materialize_triples(
        triples, args.out, num_parts=args.num_parts or None
    )
    print(
        json.dumps(
            {
                "out": args.out,
                "partitions": len(manifests),
                "rows": sum(m["row_count"] for m in manifests),
            }
        )
    )
    ray.shutdown()


def cmd_update(args) -> None:
    """Incrementally absorb a new corpus into an existing triple store
    (``update_triple_store``): only partitions receiving new rows are
    rewritten; re-running the same --update-id resumes/no-ops."""
    ray = _ray_session()
    from kazu_ray.pipelines.kg import broadcast_store, triples_dataset
    from kazu_ray.stages.materialize import update_triple_store

    store_ref = broadcast_store()
    triples = triples_dataset(
        args.sf_dir, store_ref=store_ref, multiplier=args.multiplier
    )
    manifests = update_triple_store(triples, args.store, update_id=args.update_id)
    print(
        json.dumps(
            {
                "store": args.store,
                "update_id": args.update_id,
                "partitions": len(manifests),
                "rows": sum(m["row_count"] for m in manifests),
            }
        )
    )
    ray.shutdown()


def cmd_delta_update(args) -> None:
    """Reconcile a store with a new crawl snapshot: classify the url
    delta (new/gone/changed by content digest), retract stale triples,
    re-annotate only the new+changed pages, merge
    (``pipelines/incremental.py::apply_crawl_delta``). Re-running the
    same --update-id is a fast no-op; a crash replays safely."""
    ray = _ray_session()
    import ray.data as rd

    from kazu_ray.pipelines.incremental import apply_crawl_delta
    from kazu_ray.pipelines.kg import broadcast_store

    summary = apply_crawl_delta(
        rd.read_parquet(args.old_pages),
        rd.read_parquet(args.new_pages),
        args.store,
        args.update_id,
        store_ref=broadcast_store(),
        docs_dir=args.docs,
    )
    print(json.dumps(summary))
    ray.shutdown()


def cmd_annotate(args) -> None:
    ray = _ray_session()
    from kazu_ray.pipelines.kg import annotated_docs, broadcast_store
    from kazu_ray.stages.materialize import write_annotated

    store_ref = broadcast_store()
    if args.by_shard:
        from kazu_ray.pipelines.resumable import annotate_resumable
        from kazu_ray.sources.corpus import ensure_pages_parquet

        pages_dir = args.pages_dir or ensure_pages_parquet(
            args.sf_dir, args.multiplier
        )
        result = annotate_resumable(
            pages_dir, args.out, store_ref=store_ref,
            num_shards=args.num_parts or 16,
        )
        print(json.dumps({"out": args.out, **result}))
        ray.shutdown()
        return
    docs = annotated_docs(args.sf_dir, store_ref=store_ref, multiplier=args.multiplier)
    result = write_annotated(docs, args.out, num_parts=args.num_parts or None)
    print(json.dumps(result))
    ray.shutdown()


def cmd_lookup(args) -> None:
    from kazu_ray.stages.materialize import lookup_triples

    table = lookup_triples(args.store, args.subj)
    for row in table.to_pylist():
        print(json.dumps(row))


def cmd_build_caches(args) -> None:
    from kazu_ray.state.store import ensure_default_caches

    print(ensure_default_caches(args.cache_dir))


def cmd_pack(args) -> None:
    if args.acceptance:
        _ray_session()
    from kazu_ray.state.pack import build_pack

    manifest = build_pack(
        args.out, cache_dir=args.cache_dir, run_acceptance=args.acceptance
    )
    print(
        json.dumps(
            {
                "out": args.out,
                "files": len(manifest["files"]),
                "ontology_version": manifest["ontology_version"],
                "acceptance": (manifest["acceptance"] or {}).get("passed"),
            }
        )
    )


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="kazu_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("run", help="KG pipeline → materialized triple store")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True)
    p.add_argument("--multiplier", type=int, default=1)
    p.add_argument("--num-parts", type=int, default=16,
                   help="store partitions; 0 = auto-size from input bytes")
    p.add_argument("--by-shard", action="store_true",
                   help="checkpoint the whole pipeline per input shard")
    p.add_argument("--pages-dir", default=None)
    p.add_argument("--warc", nargs="+", default=None,
                   help="WARC segment file(s)/glob(s) as the corpus "
                        "(raw-crawl ingestion; lang gate = langid heuristic)")
    p.add_argument("--pack", default=None,
                   help="run with caches from a model pack (verified on load)")
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("update", help="merge a new corpus into an existing store")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--store", required=True)
    p.add_argument("--update-id", required=True)
    p.add_argument("--multiplier", type=int, default=1)
    p.set_defaults(fn=cmd_update)

    p = sub.add_parser(
        "delta-update",
        help="reconcile a store with a new crawl snapshot (retract + re-annotate)",
    )
    p.add_argument("--old-pages", required=True, help="old snapshot parquet dir")
    p.add_argument("--new-pages", required=True, help="new snapshot parquet dir")
    p.add_argument("--store", required=True)
    p.add_argument("--update-id", required=True)
    p.add_argument(
        "--docs",
        default=None,
        help="also reconcile this annotated-docs sink (write_annotated dir)",
    )
    p.set_defaults(fn=cmd_delta_update)

    p = sub.add_parser("annotate", help="annotated docs + failure side channel")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True)
    p.add_argument("--multiplier", type=int, default=1)
    p.add_argument("--num-parts", type=int, default=16,
                   help="resume/parallelism unit of the docs store; "
                        "0 = auto-size from input bytes")
    p.add_argument("--by-shard", action="store_true",
                   help="checkpoint the whole annotate pipeline per input shard")
    p.add_argument("--pages-dir", default=None)
    p.set_defaults(fn=cmd_annotate)

    p = sub.add_parser("lookup", help="point query over a triple store")
    p.add_argument("--store", required=True)
    p.add_argument("--subj", required=True)
    p.set_defaults(fn=cmd_lookup)

    p = sub.add_parser("build-caches", help="(re)build ontology caches")
    p.add_argument("--cache-dir", default=None)
    p.set_defaults(fn=cmd_build_caches)

    p = sub.add_parser("pack", help="archive caches as a verified model pack")
    p.add_argument("--out", required=True)
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--acceptance", action="store_true",
                   help="gate the pack on the e2e acceptance P/R scorer")
    p.set_defaults(fn=cmd_pack)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
