"""Forced-distributed graph drill: run kg_components / kg_triangles /
kg_clustering twice on the REAL co-occurrence graph of a testdata sf —
once with the size-dispatched driver paths, once with the distributed
branches forced via env caps — and assert exact equality.

Usage: python scripts/graph_scale_drill.py [sf_dir]   (default sf0.01)
"""

import os
import sys
import time


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entry

    qs = entry.queries()

    def run(tag):
        out = {}
        for name in ("kg_components", "kg_triangles", "kg_clustering"):
            t0 = time.time()
            r = qs[name](sf)
            out[name] = (r.sort_values(list(r.columns)).reset_index(drop=True), round(time.time() - t0, 1))
        return out

    base = run("driver")
    os.environ["KAZU_CC_MAX_DRIVER_PAIRS"] = "1"
    os.environ["KAZU_TRI_MAX_DRIVER_EDGES"] = "1"
    forced = run("distributed")
    for name in base:
        a, ta = base[name]
        b, tb = forced[name]
        assert a.equals(b), f"{name} differs between paths"
        print(f"{name}: EQUAL ({len(a)} rows; driver {ta}s, distributed {tb}s)")
    ray.shutdown()


if __name__ == "__main__":
    main()
