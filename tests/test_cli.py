"""CLI surface: drive `python -m kazu_ray` end to end via subprocess
(a separate process owns its own Ray session, as the CLI contract says)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args):
    out = subprocess.run(
        [sys.executable, "-m", "kazu_ray", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout.strip().splitlines()


def test_cli_run_lookup_resume(tmp_path):
    store = str(tmp_path / "store")
    r1 = json.loads(
        _run("run", "--sf-dir", "/root/testdata/sf0.001", "--out", store, "--num-parts", "4")[-1]
    )
    assert r1["partitions"] == 4 and r1["rows"] > 0
    # resume: second run returns from manifests with identical totals
    r2 = json.loads(
        _run("run", "--sf-dir", "/root/testdata/sf0.001", "--out", store, "--num-parts", "4")[-1]
    )
    assert r2 == r1
    # point lookup through the partition-pruned path
    rows = _run("lookup", "--store", store, "--subj", "CHEMBL:CHEMBL1020")
    assert rows and all(
        json.loads(r)["subj"] == "CHEMBL:CHEMBL1020" for r in rows
    )


def test_cli_build_caches():
    out = _run("build-caches")
    assert out[-1].startswith("/tmp/kazu_ray_cache/")


def test_cli_pack_and_run_with_pack(tmp_path):
    pack = str(tmp_path / "model.tgz")
    r = json.loads(_run("pack", "--out", pack)[-1])
    assert r["files"] > 0 and os.path.exists(pack)
    store = str(tmp_path / "store")
    r2 = json.loads(
        _run(
            "run", "--sf-dir", "/root/testdata/sf0.001", "--out", store,
            "--num-parts", "4", "--pack", pack,
        )[-1]
    )
    assert r2["rows"] > 0


def test_cli_run_from_warc(tmp_path, ray_session):
    """`run --warc`: build a triple store straight from a WARC segment
    (raw-crawl ingestion, langid-heuristic gate). The store must be
    non-empty, partitioned, and point-lookupable like any other."""
    import glob

    import pyarrow.parquet as pq

    from kazu_ray.sources.corpus import ensure_pages_parquet
    from kazu_ray.sources.warc import write_warc_bytes

    pages_dir = ensure_pages_parquet("/root/testdata/sf0.001")
    rows = []
    for f in sorted(glob.glob(f"{pages_dir}/*.parquet")):
        rows.extend(
            pq.read_table(f, columns=["url", "warc_ts", "html"]).to_pylist()
        )
    seg = tmp_path / "seg.warc.gz"
    seg.write_bytes(write_warc_bytes(rows[:200], per_record_gzip=True))
    store = str(tmp_path / "store")
    r = json.loads(
        _run(
            "run", "--warc", str(seg), "--out", store, "--num-parts", "2"
        )[-1]
    )
    assert r["partitions"] == 2 and r["rows"] > 0
