"""Deterministic Common-Crawl-style ``pages`` corpus.

BASELINE.json's ``input_hint`` fixes the input table shape:
``(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)``. No external data is permitted, so the corpus is
synthesised as a pure function of ``doc_id``: the driver's testdata
``documents`` table supplies the row skeleton (ids + scale), and each
page's text is generated from seeded sentence templates that plant known
ontology mentions (mirroring the reference's own test docs,
``/root/reference/conftest.py:57-71`` — "EGFR mutations are often
implicated in lung cancer").

Generation runs inside ``map_batches`` (an actor pool holding the
mention bank), so corpus synthesis itself streams and scales with input
partitioning — at bench scale this is the "read" stage of the pipeline.

Planted phenomena: Zipf-weighted entity choice (hub entities → skew),
abbreviation definitions ("acute lymphoblastic leukemia (ALL)"),
non-contiguous mentions ("BRCA1/2"), ~5%% null ``text`` rows forcing the
html extraction path, 2%% non-English rows for the lang filter.
"""

from __future__ import annotations

import os
import random
from functools import lru_cache

import numpy as np
import pandas as pd
import pyarrow as pa

from kazu_ray.ontology.generate import generate_ontology_tables

EPOCH_US = 1_600_000_000_000_000  # fixed base timestamp (µs)

# Bump when generated PAGE CONTENT changes (links, shell, hosts…) —
# ensure_pages_parquet keys its /tmp cache on this so a content change
# can never silently reuse a stale corpus (the ONTOLOGY_VERSION lesson).
CORPUS_VERSION = 3

# realistic-ish page shell: head (dropped whole by the extractor),
# escaped body text, and a <nav> outlink block on its own line — the
# extractor keeps only the longest text line, so short "ref" anchors
# never perturb the extracted-text sha invariant. Kept deterministic
# and invertible so the invariant is testable byte-for-byte.
HTML_SHELL = (
    "<html><head><title>doc {doc_id}</title>"
    '<meta charset="utf-8"><script>var x=1;</script></head>'
    "<body><h1>Document {doc_id}</h1>\n<p>{body}</p>\n"
    "<nav>{links}</nav>\n"
    '<div class="footer">generated</div></body></html>'
)

# host bank for page source hosts and outlink targets: Zipf-weighted
# choice plants the hub-host skew a real crawl's link graph has
HOST_BANK = [f"w{i:02d}.example.org" for i in range(40)]


def outlinks_for_doc(doc_id: int) -> list[str]:
    """Outlink URLs as a pure function of doc_id (separate rng stream —
    adding links must not shift the text/lang draws of existing
    corpora). 0-4 links, Zipf-weighted target host; ~40% are INTERNAL
    links to a recent page's exact url (so frontier/anti-join analyses
    have real already-crawled hits — a link to doc_id-k is in-corpus
    whenever that id exists at the current scale), the rest point
    outside the crawl."""
    rng = random.Random(f"links:{doc_id}")
    n = rng.randint(0, 4)
    out = []
    for _ in range(n):
        if rng.random() < 0.4 and doc_id > 0:
            t = max(0, doc_id - rng.randint(1, 500))
            out.append(f"https://{src_host_for_doc(t)}/doc/{t:08d}")
        else:
            out.append(f"https://{_zipf_choice(rng, HOST_BANK)}/d/{rng.randint(0, 99999)}")
    return out


def src_host_for_doc(doc_id: int) -> str:
    """The page's own host — Zipf-weighted so page counts per host skew
    like a real crawl (hub sites have many pages)."""
    rng = random.Random(f"srchost:{doc_id}")
    return _zipf_choice(rng, HOST_BANK)

TEMPLATES = [
    "{GENE} mutations are often implicated in {DISEASE}.",
    "Treatment with {DRUG} improved {DISEASE} outcomes.",
    "Patients with {DISEASE} received {DRUG} daily.",
    "Expression of {GENE} was elevated in {DISEASE} samples.",
    "{GENE} interacts with {GENE2} in tumor cells.",
    "The trial compared {DRUG} with {DRUG2} in {DISEASE}.",
    "{DISEASE_LONG} ({DISEASE_ABBREV}) was observed in the cohort.",
    "BRCA1/2 are oncogenes.",
    "No significant adverse events were reported during follow up.",
    "The study was conducted across twelve research centers.",
    "Participants completed questionnaires at baseline and week eight.",
    "Further validation in larger cohorts is warranted.",
]


@lru_cache(maxsize=1)
def mention_bank() -> dict[str, list[str]]:
    """Surface forms per slot, deterministic order (hub-first for Zipf)."""
    tables = generate_ontology_tables()
    genes = sorted(
        {
            s
            for s in tables["hgnc_like"]["syn"]
            if s.isupper() and s not in {"ABC1"}
        }
    )
    diseases = sorted(
        {
            s
            for s, m in zip(tables["mondo_like"]["syn"], tables["mondo_like"]["mapping_type"])
            if m == "lbl" and s.islower()
        }
    )
    drugs = sorted({s for s in tables["chembl_like"]["syn"] if s.islower() and " " not in s})
    # long-form/abbrev pairs for the abbreviation-finder case
    abbrev_pairs = [
        ("acute lymphoblastic leukemia", "ALL"),
        ("type 2 diabetes mellitus", "T2DM"),
        ("breast cancer", "BC"),
    ]
    return {
        "GENE": genes,
        "DISEASE": diseases,
        "DRUG": drugs,
        "ABBREV": [f"{long}|{short}" for long, short in abbrev_pairs],
    }


def _zipf_choice(rng: random.Random, options: list[str]) -> str:
    """Rank-weighted (1/rank) choice → hub-entity skew."""
    n = len(options)
    weights = [1.0 / (i + 1) for i in range(n)]
    return rng.choices(options, weights=weights, k=1)[0]


def page_text_for_doc(doc_id: int) -> str:
    """The corpus contract: text is a pure function of doc_id."""
    rng = random.Random(f"pages:{doc_id}")
    bank = mention_bank()
    n_sent = rng.randint(1, 8)
    sents = []
    for _ in range(n_sent):
        template = rng.choice(TEMPLATES)
        s = template
        if "{GENE}" in s:
            s = s.replace("{GENE}", _zipf_choice(rng, bank["GENE"]))
        if "{GENE2}" in s:
            s = s.replace("{GENE2}", _zipf_choice(rng, bank["GENE"]))
        if "{DISEASE}" in s:
            s = s.replace("{DISEASE}", _zipf_choice(rng, bank["DISEASE"]))
        if "{DRUG}" in s:
            s = s.replace("{DRUG}", _zipf_choice(rng, bank["DRUG"]))
        if "{DRUG2}" in s:
            s = s.replace("{DRUG2}", _zipf_choice(rng, bank["DRUG"]))
        if "{DISEASE_LONG}" in s:
            long, short = rng.choice(bank["ABBREV"]).split("|")
            s = s.replace("{DISEASE_LONG}", long).replace("{DISEASE_ABBREV}", short)
        sents.append(s)
    return " ".join(sents)


def synthesize_pages_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` function: documents-row skeleton → pages rows.

    Stateless task op (the mention bank is a module-level lru_cache, so
    it builds once per worker process — no actor pool needed, which
    keeps the minimum CPU footprint of the pipeline small)."""
    doc_ids = batch["doc_id"].to_pylist()
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for doc_id in doc_ids:
        rng = random.Random(f"pagemeta:{doc_id}")
        text = page_text_for_doc(doc_id)
        urls.append(f"https://{src_host_for_doc(doc_id)}/doc/{doc_id:08d}")
        tss.append(EPOCH_US + int(doc_id) * 1_000_000)
        import html as _html

        links = "".join(f'<a href="{u}">ref</a>' for u in outlinks_for_doc(doc_id))
        htmls.append(
            HTML_SHELL.format(
                doc_id=doc_id, body=_html.escape(text), links=links
            ).encode("utf-8")
        )
        # ~5% rows publish no pre-extracted text → html path
        texts.append(None if rng.random() < 0.05 else text)
        langs.append("de" if rng.random() < 0.02 else "en")
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.large_string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def pages_dataset(sf_dir: str, multiplier: int = 1):
    """Pages corpus as a streaming Dataset, scaled by the testdata
    ``documents`` table at ``sf_dir`` (column-pruned read: only doc_id
    leaves storage). ``multiplier`` fans each skeleton row out to K
    deterministic page ids — used by the bench to reach corpus sizes the
    fixed-size documents table can't provide."""
    import ray.data as rd

    # override_num_blocks splits the single skeleton file into many blocks
    # at the read (no all-to-all), so synthesis and every downstream stage
    # parallelize across the node
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"], override_num_blocks=64
    )
    if multiplier > 1:
        def expand(batch: pa.Table, _k: int = multiplier) -> pa.Table:
            ids = batch["doc_id"].to_pylist()
            return pa.table(
                {"doc_id": pa.array([i * _k + j for i in ids for j in range(_k)])}
            )

        ds = ds.map_batches(expand, batch_format="pyarrow")
    return ds.map_batches(synthesize_pages_batch, batch_format="pyarrow", batch_size=512)


def ensure_pages_parquet(
    sf_dir: str, multiplier: int = 1, out_root: str = "/tmp/kazu_ray_pages"
) -> str:
    """Materialize the synthetic pages corpus as a real Parquet dataset
    (the exact input shape BASELINE.json's input_hint names) and return
    its directory. Idempotent: content is a pure function of
    (sf_dir, multiplier), so an existing directory is reused.

    Reading pages from Parquet rather than synthesizing inline matters
    for physics, not just realism: block/bundle sizing in the read path
    is derived from actual bytes, so downstream operators parallelize
    correctly — with inline synthesis the planner sees only the tiny
    doc_id skeleton and under-splits the expensive stages.
    """
    import ray.data as rd

    from kazu_ray.ontology.generate import ONTOLOGY_VERSION

    # keyed by ontology version (the mention bank derives from the
    # generated ontology tables) AND the corpus version (shell/link/host
    # changes), so corpus content changes can never reuse a stale cache
    tag = sf_dir.rstrip("/").split("/")[-1]
    out_dir = os.path.join(
        out_root, f"{tag}_x{multiplier}_{ONTOLOGY_VERSION}_c{CORPUS_VERSION}"
    )
    done_marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done_marker):
        return out_dir
    ds = pages_dataset(sf_dir, multiplier=multiplier)
    ds.write_parquet(out_dir, min_rows_per_file=2000)
    with open(done_marker, "w") as f:
        f.write("ok")
    return out_dir


def pages_from_parquet(pages_dir: str, num_cpus_hint: int | None = None):
    """Read a materialized pages corpus with block sizing matched to the
    cluster (≈8 blocks per CPU: tasks big enough that dispatch overhead
    amortizes, small enough that the last scheduling wave's straggler
    costs ≤ 1/8 of a CPU-round — doc-length variance makes equal-row
    tasks unequal-time)."""
    import ray
    import ray.data as rd

    if num_cpus_hint is None:
        try:
            num_cpus_hint = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            num_cpus_hint = 8
    return rd.read_parquet(pages_dir, override_num_blocks=max(32, 8 * num_cpus_hint))


def pages_pandas(sf_dir: str, limit: int | None = None) -> pd.DataFrame:
    """Driver-side corpus for the single-process oracle in tests."""
    import pyarrow.parquet as pq

    doc_ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])["doc_id"].to_numpy()
    if limit is not None:
        doc_ids = doc_ids[:limit]
    table = synthesize_pages_batch(pa.table({"doc_id": pa.array(np.asarray(doc_ids))}))
    return table.to_pandas()
