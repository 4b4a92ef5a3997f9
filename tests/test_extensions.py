"""Xref manager, synonym generation, cleanup actions, failure routing."""

import json

import pyarrow as pa

from kazu_ray.stages.docproc import (
    drop_by_min_len,
    drop_entity_class_not_in,
    drop_if_match_in_set,
    drop_mappings_by_parser_rank,
    strip_mapping_uris,
)
from kazu_ray.stages.fused import AnnotateStage
from kazu_ray.stages.mapping import MappingRunner
from kazu_ray.stages.ner import build_automaton, match_entities
from kazu_ray.stages.xref import XRefManager, synth_xref_table


def test_xref_manager_creates_target_mappings(store):
    xt = synth_xref_table()
    assert len(xt) > 30
    runner = MappingRunner(store, xref_manager=XRefManager(xt))
    automaton = build_automaton(store)
    # pick a disease whose mondo id is xref'd
    target_idx = xt.iloc[0]["idx"]
    label = store.default_label("mondo_like", target_idx)
    text = f"Patients with {label} were enrolled."
    ents = match_entities(text, automaton)
    for e in ents:
        e["sent_idx"] = 0
    runner.run_doc(ents)
    ent = next(e for e in ents if e["match"] == label)
    sources = {m["source"] for m in ent["mappings"]}
    assert "MEDDRA" in sources
    meddra = next(m for m in ent["mappings"] if m["source"] == "MEDDRA")
    assert meddra["xref_source_parser_name"] == "mondo_like"


def test_synonym_generation_hyphen_variant_matches(store):
    automaton = build_automaton(store)
    # "breast cancer" gains a generated "breast-cancer" NER surface
    ents = match_entities("Diagnosed with breast-cancer last year.", automaton)
    assert any(e["match"] == "breast-cancer" for e in ents)
    (ent,) = [e for e in ents if e["match"] == "breast-cancer"]
    assert ent["cands"][0][1] == "BREAST CANCER"  # links to the original candidate


def test_cleanup_actions():
    def ent(match, cls, mappings=None):
        return {
            "match": match,
            "entity_class": cls,
            "confidence": 100,
            "mappings": mappings if mappings is not None else [{"x": 1}],
        }

    ents = [ent("ab", "gene"), ent("abcd", "gene")]
    assert [e["match"] for e in drop_by_min_len(3)(ents)] == ["abcd"]

    ents = [ent("all", "disease"), ent("flu", "disease")]
    out = drop_if_match_in_set({"disease": {"all"}})(ents)
    assert [e["match"] for e in out] == ["flu"]

    ents = [ent("x", "gene"), ent("y", "disease")]
    assert [e["match"] for e in drop_entity_class_not_in({"gene"})(ents)] == ["x"]

    ents = [
        ent("z", "disease", [{"idx": "http://purl.obolibrary.org/obo/MONDO_0004979",
                              "parser_name": "p"}])
    ]
    out = strip_mapping_uris()(ents)
    assert out[0]["mappings"][0]["idx"] == "MONDO_0004979"

    ents = [
        ent(
            "w",
            "disease",
            [
                {"idx": "1", "parser_name": "meddra_like"},
                {"idx": "2", "parser_name": "mondo_like"},
            ],
        )
    ]
    out = drop_mappings_by_parser_rank({"disease": ["meddra_like", "mondo_like"]})(ents)
    assert [m["parser_name"] for m in out[0]["mappings"]] == ["meddra_like"]


def test_failure_routing_poison_pill(cache_dir, monkeypatch):
    stage = AnnotateStage(cache_dir)
    # sabotage one doc: annotate_doc raises on a trigger string
    original = stage.annotate_doc

    def flaky(text, doc_id):
        if "POISON" in text:
            raise RuntimeError("boom")
        return original(text, doc_id)

    stage.annotate_doc = flaky
    batch = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "text": pa.array(
                ["breast cancer here.", "POISON doc.", "flu season."],
                type=pa.large_string(),
            ),
        }
    )
    out = stage(batch)
    errs = out["processing_exception"].to_pylist()
    assert errs[0] == "" and errs[2] == ""
    assert "boom" in errs[1]
    # good docs still annotated; failed doc has empty outputs
    assert json.loads(out["ents_json"][0].as_py())
    assert json.loads(out["ents_json"][1].as_py()) == []


def test_write_annotated_side_channel(ray_session, cache_dir, tmp_path):
    import ray.data as rd

    from kazu_ray.stages.fused import make_annotate_task
    from kazu_ray.stages.materialize import write_annotated

    docs = rd.from_items(
        [
            {"doc_id": "a", "text": "breast cancer."},
            {"doc_id": "b", "text": "flu."},
        ]
    ).map_batches(make_annotate_task(cache_dir), batch_format="pyarrow")
    result = write_annotated(docs, str(tmp_path / "out"))
    assert result["failed"] == 0
    import pyarrow.parquet as pq
    import glob

    files = glob.glob(str(tmp_path / "out" / "docs" / "part=*" / "*.parquet"))
    assert files
    total = sum(pq.read_metadata(f).num_rows for f in files)
    assert total == 2


def test_ontology_table_adapters(tmp_path):
    import pandas as pd

    from kazu_ray.sources.ontology_tables import from_csv, from_jsonl, from_parquet

    df = pd.DataFrame(
        {
            "idx": ["X1", "X1", "X2"],
            "default_label": ["alpha thing", "alpha thing", None],
            "syn": ["alpha thing", "AT", "beta thing"],
            "mapping_type": ["lbl", "abbrev", "lbl"],
        }
    )
    p = tmp_path / "ont.parquet"
    df.to_parquet(p)
    out = from_parquet(str(p), "test_origin")
    assert len(out) == 3
    assert out[out.idx == "X2"].iloc[0]["default_label"] == "X2"  # label fallback

    c = tmp_path / "ont.csv"
    df.to_csv(c, index=False)
    assert len(from_csv(str(c), "test_origin")) == 3

    j = tmp_path / "ont.jsonl"
    j.write_text(
        '{"id": "Y1", "name": "gamma thing", "synonyms": ["GT", "gamma"]}\n'
        '{"id": "Y2", "name": "delta thing"}\n'
    )
    out = from_jsonl(str(j), "test_origin")
    assert set(out.syn) == {"gamma thing", "GT", "gamma", "delta thing"}


def test_optional_stubs_raise_with_guidance():
    import pytest as _pytest

    from kazu_ray.stages.optional_stubs import SapbertEmbeddingStage, TransformerNerStage

    with _pytest.raises(NotImplementedError, match="TinyBERN2"):
        TransformerNerStage()
    with _pytest.raises(NotImplementedError, match="SapBERT"):
        SapbertEmbeddingStage()


def test_triple_store_point_lookup(ray_session, tmp_path):
    from kazu_ray.pipelines.kg import broadcast_store, triples_dataset
    from kazu_ray.stages.materialize import lookup_triples, materialize_triples

    store_ref = broadcast_store()
    triples = triples_dataset("/root/testdata/sf0.001", store_ref=store_ref)
    out = str(tmp_path / "store")
    manifests = materialize_triples(triples, out, num_parts=8)
    assert len(manifests) == 8
    # pick a subject that exists and look it up through the pruned path
    import pyarrow.parquet as pq
    import glob

    some = pq.read_table(glob.glob(f"{out}/part=*/triples.parquet")[0])
    subj = some["subj"][0].as_py()
    hits = lookup_triples(out, subj)
    assert hits.num_rows >= 1
    assert set(hits["subj"].to_pylist()) == {subj}
    # absent key → empty result, still only one partition touched
    assert lookup_triples(out, "NOPE:NOPE").num_rows == 0


def test_partition_writer_spill_path_equals_in_memory(tmp_path):
    """The spill path (tiny spill_bytes → many sorted runs + k-way merge)
    must produce the same file rows, manifest sha, min/max keys and row
    count as the in-memory path on the same input."""
    import numpy as np
    import pyarrow.parquet as pq

    from kazu_ray.stages.materialize import _PartitionWriter

    rng = np.random.RandomState(11)
    batches = []
    for _ in range(20):
        n = 500
        batches.append(
            pa.table(
                {
                    "subj": pa.array([f"S:{rng.randint(0, 400):04d}" for _ in range(n)]),
                    "pred": pa.array([f"p{rng.randint(0, 3)}" for _ in range(n)]),
                    "obj": pa.array([f"O:{rng.randint(0, 400):04d}" for _ in range(n)]),
                }
            )
        )

    def run(base, spill_bytes):
        out = str(tmp_path / base)
        mdir = str(tmp_path / f"{base}_m")
        import os

        os.makedirs(out), os.makedirs(mdir)
        w = _PartitionWriter(
            0, out, mdir, "subj", ["subj", "pred", "obj"], ["subj", "pred", "obj"],
            "t.parquet", spill_bytes=spill_bytes,
        )
        for b in batches:
            w.add(b)
        man = w.finalize()
        tbl = pq.read_table(f"{out}/part=0/t.parquet")
        return man, tbl

    man_mem, tbl_mem = run("mem", spill_bytes=1 << 40)
    man_spill, tbl_spill = run("spill", spill_bytes=20_000)  # forces many runs
    assert man_spill["sha256"] == man_mem["sha256"]
    assert man_spill["row_count"] == man_mem["row_count"] == 10_000
    assert man_spill["min_key"] == man_mem["min_key"]
    assert man_spill["max_key"] == man_mem["max_key"]
    assert tbl_spill.to_pylist() == tbl_mem.to_pylist()
    # no leftover run files
    import glob

    assert not glob.glob(str(tmp_path / "spill" / "part=0" / ".run.*"))


def test_partition_writer_spill_merge_batches(tmp_path):
    """Merge output crossing MERGE_BATCH_ROWS boundaries stays sorted
    and complete (exercises the emit/flush cycling)."""
    import pyarrow.parquet as pq

    from kazu_ray.stages.materialize import _PartitionWriter

    out = str(tmp_path / "o")
    mdir = str(tmp_path / "m")
    import os

    os.makedirs(out), os.makedirs(mdir)
    w = _PartitionWriter(
        0, out, mdir, "k", ["k"], ["k"], "t.parquet", spill_bytes=1
    )
    w.MERGE_BATCH_ROWS = 97  # force frequent emission
    total = 0
    for i in range(7):
        vals = [f"{(i * 37 + j) % 1000:05d}" for j in range(301)]
        w.add(pa.table({"k": pa.array(vals)}))
        total += 301
    man = w.finalize()
    tbl = pq.read_table(f"{out}/part=0/t.parquet")
    assert man["row_count"] == total == tbl.num_rows
    ks = tbl["k"].to_pylist()
    assert ks == sorted(ks)


def test_global_parser_action_drop_ids():
    from kazu_ray.ontology.build import build_parser_caches
    from kazu_ray.ontology.generate import generate_ontology_tables

    df = generate_ontology_tables()["hgnc_like"]
    meta, syns, ner = build_parser_caches(
        df, "hgnc_like", "gene", "ENSEMBL", global_drop_ids={"ENSG90000000001"}
    )
    assert "ENSG90000000001" not in set(meta["idx"])
    # p27 candidate loses the CDKN1B id but keeps the other two
    import json

    p27 = syns[syns.synonym_norm == "P 27"]
    assert len(p27) == 1
    cand = json.loads(p27.iloc[0]["candidate_json"])
    ids = {i for id_set in cand["associated_id_sets"] for i, _ in id_set}
    assert ids == {"ENSG90000000002", "ENSG90000000003"}


def test_case_conflict_autofix():
    from kazu_ray.ontology.build import (
        _Resource,
        _resources_have_case_conflicts,
        autofix_case_conflicts,
    )

    # reference curation_utils.py:595-607 examples:
    # supported: cs rank strictly above ci rank
    ok1 = _Resource("EGFR", {"EGFR"})
    ok1.syns["EGFR"] = [True, 10]  # cs POSSIBLE
    ok2 = _Resource("EGFR2", {"eGFR"})
    ok2.syns["eGFR"] = [False, 0]  # ci IGNORE... (use 10 vs 50 instead)
    ok1.syns["EGFR"] = [True, 50]
    ok2.syns["eGFR"] = [False, 10]
    assert not _resources_have_case_conflicts([ok1, ok2])

    # conflicted: ci PROBABLE vs cs POSSIBLE on same lowered surface
    bad1 = _Resource("A", {"Egfr"})
    bad1.syns["Egfr"] = [True, 10]  # cs POSSIBLE
    bad2 = _Resource("B", {"eGFR"})
    bad2.syns["eGFR"] = [False, 50]  # ci PROBABLE
    assert _resources_have_case_conflicts([bad1, bad2])

    fixed, n = autofix_case_conflicts([bad1, bad2])
    assert n == 1
    # OPTIMISTIC: case-insensitive wins, max confidence per surface
    assert bad1.syns["Egfr"] == [False, 50]
    assert bad2.syns["eGFR"] == [False, 50]
    assert not _resources_have_case_conflicts([bad1, bad2])


def test_salted_distinct_doc_counts(ray_session):
    """Salted two-phase distinct-count equals the exact pandas answer."""
    import pandas as pd

    from kazu_ray.pipelines.kg import broadcast_store, triples_dataset
    from kazu_ray.stages.materialize import node_doc_counts_salted

    store_ref = broadcast_store()
    triples = triples_dataset("/root/testdata/sf0.001", store_ref=store_ref)
    df = triples.to_pandas()
    exact = (
        pd.concat(
            [
                df[["subj", "doc_id"]].rename(columns={"subj": "node"}),
                df[["obj", "doc_id"]].rename(columns={"obj": "node"}),
            ]
        )
        .drop_duplicates()
        .groupby("node")
        .doc_id.nunique()
        .to_dict()
    )
    got = node_doc_counts_salted(
        triples_dataset("/root/testdata/sf0.001", store_ref=store_ref)
    ).to_pandas()
    got_d = dict(zip(got.node, got.n_docs))
    assert got_d == exact


def test_cross_section_abbreviation_application(cache_dir):
    """The reference's headline Document/Section semantic
    (abbreviation_finder.py:14-16): an abbreviation DEFINED in section 0
    grounds bare mentions in section 1."""
    from kazu_ray.stages.fused import AnnotateStage

    stage = AnnotateStage(cache_dir)
    sections = [
        "Patients had acute lymphoblastic leukemia (ALL) at baseline.",
        "Relapse was recorded in twelve cases. ALL patients received vorastatin daily.",
    ]
    ents, triples = stage.annotate_sections(sections, "doc-ms")
    alls = [e for e in ents if e["match"] == "ALL"]
    assert len(alls) == 2
    assert {e["section_idx"] for e in alls} == {0, 1}
    assert all(
        {m["idx"] for m in e["mappings"]} == {"MONDO_2000001"} for e in alls
    )
    # section-1 drug+disease co-occurrence, with globally-offset sent_idx
    t = [x for x in triples if x["pred"] == "treats_candidate"]
    assert t and all(x["sent_idx"] >= 1 for x in t)


def test_sections_match_single_section_when_one():
    from kazu_ray.state.store import ensure_default_caches
    from kazu_ray.stages.fused import AnnotateStage

    stage = AnnotateStage(ensure_default_caches())
    text = "EGFR12 mutations in breast cancer. Treatment with vorastatin helped."
    (ents1, triples1), _ = stage.annotate_doc(text, "d")
    ents2, triples2 = stage.annotate_sections([text], "d")
    assert [
        (e["start"], e["end"], e["entity_class"]) for e in ents1
    ] == [(e["start"], e["end"], e["entity_class"]) for e in ents2]
    strip = lambda ts: [
        {k: v for k, v in t.items()} for t in ts
    ]
    assert strip(triples1) == strip(triples2)


def test_sectioned_dataset_stage(ray_session, cache_dir):
    import json

    import ray.data as rd

    from kazu_ray.stages.fused import make_annotate_sections_task

    docs = rd.from_items(
        [
            {
                "doc_id": "s1",
                "sections": [
                    {"name": "abstract", "text": "Breast cancer (BC) outcomes."},
                    {"name": "body", "text": "BC patients received vorastatin."},
                ],
            },
            {"doc_id": "s2", "sections": [{"name": "body", "text": "flu season."}]},
        ]
    ).map_batches(make_annotate_sections_task(cache_dir), batch_format="pyarrow")
    out = docs.to_pandas().set_index("doc_id")
    ents = json.loads(out.loc["s1", "ents_json"])
    bcs = [e for e in ents if e["match"] == "BC"]
    assert len(bcs) == 2 and {e["section_idx"] for e in bcs} == {0, 1}
    triples = json.loads(out.loc["s1", "triples_json"])
    assert any(t["pred"] == "treats_candidate" for t in triples)


def test_kazu_corpus_loader_roundtrip(ray_session, cache_dir, tmp_path):
    """Reference-shaped parquet corpus → sectioned annotation end to end,
    including the keep-most-sections duplicate-id rule."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kazu_ray.sources.kazu_corpus import read_kazu_corpus
    from kazu_ray.stages.fused import make_annotate_sections_task

    sec_t = pa.struct([("section", pa.string()), ("text", pa.string()), ("subSection", pa.string())])
    table = pa.table(
        {
            "id": ["a", "a", "b"],
            "sections": pa.array(
                [
                    [{"section": "abstract", "text": "breast cancer (BC).", "subSection": None}],
                    [
                        {"section": "abstract", "text": "breast cancer (BC).", "subSection": None},
                        {"section": "body", "text": "BC patients improved.", "subSection": "s1"},
                    ],
                    [{"section": "body", "text": "flu season.", "subSection": None}],
                ],
                type=pa.list_(sec_t),
            ),
        }
    )
    p = tmp_path / "corpus.parquet"
    pq.write_table(table, p)
    ds = read_kazu_corpus(str(p))
    docs = ds.map_batches(make_annotate_sections_task(cache_dir), batch_format="pyarrow")
    out = docs.to_pandas().set_index("doc_id")
    assert len(out) == 2  # duplicate id "a" deduped
    ents_a = json.loads(out.loc["a", "ents_json"])
    # the 2-section variant won: BC grounded in both sections
    assert {e["section_idx"] for e in ents_a if e["match"] == "BC"} == {0, 1}


def test_doc_length_guard_routes_to_failure():
    import pyarrow as pa

    from kazu_ray.stages.extract import SKIP_DOC_LEN, extract_batch

    long_text = "x" * (SKIP_DOC_LEN + 10)
    batch = pa.table(
        {
            "url": ["u1", "u2"],
            "warc_ts": pa.array([0, 0], type=pa.timestamp("us")),
            "html": pa.array([b"<html><body><p>a</p></body></html>"] * 2, type=pa.binary()),
            "text": pa.array([long_text, "short doc."], type=pa.large_string()),
            "lang": ["en", "en"],
        }
    )
    out = extract_batch(batch)
    statuses = dict(zip(out["url"].to_pylist(), out["status"].to_pylist()))
    assert statuses["u1"] == "doc_too_long"
    assert statuses["u2"] == ""


def test_input_shard_resume(ray_session, tmp_path):
    """Whole-pipeline resume by input shard: a second invocation skips
    every completed shard; deleting one manifest re-runs only that shard
    with identical output rows."""
    import json
    import os

    from kazu_ray.pipelines.kg import broadcast_store
    from kazu_ray.pipelines.resumable import run_resumable
    from kazu_ray.sources.corpus import ensure_pages_parquet

    pages_dir = ensure_pages_parquet("/root/testdata/sf0.001", 1)
    store_ref = broadcast_store()
    out = str(tmp_path / "shards")
    r1 = run_resumable(pages_dir, out, store_ref=store_ref, num_shards=4)
    assert r1["shards_run"] == r1["shards_total"] and r1["rows"] > 0
    r2 = run_resumable(pages_dir, out, store_ref=store_ref, num_shards=4)
    assert r2["shards_run"] == 0 and r2["shards_skipped"] == r1["shards_total"]
    # kill one shard's manifest; only it re-runs, same rows as recorded
    m = os.path.join(out, "_manifests", "shard0.json")
    rows_before = json.load(open(m))["row_count"]
    os.remove(m)
    r3 = run_resumable(pages_dir, out, store_ref=store_ref, num_shards=4)
    assert r3["shards_run"] == 1
    assert r3["rows"] == rows_before


def test_fast_path_failure_counted(cache_dir):
    """A raising doc on the triples_flat fast path is counted and
    logged, never silently dropped (VERDICT round-1 item 5)."""
    from kazu_ray.stages import fused as fused_mod
    from kazu_ray.stages.fused import AnnotateStage

    stage = AnnotateStage(cache_dir, emit=("triples_flat",))
    original = stage.annotate_doc

    def flaky(text, doc_id):
        if "POISON" in text:
            raise RuntimeError("boom")
        return original(text, doc_id)

    stage.annotate_doc = flaky
    before = fused_mod.FAST_PATH_FAILURES["docs"]
    batch = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "text": pa.array(
                ["breast cancer here.", "POISON doc.", "flu season."],
                type=pa.large_string(),
            ),
        }
    )
    out = stage(batch)
    assert fused_mod.FAST_PATH_FAILURES["docs"] == before + 1
    # good docs still produce triples rows (schema is the flat table)
    assert "subj" in out.column_names


def test_write_annotated_failed_branch_partitioned(ray_session, cache_dir, tmp_path, monkeypatch):
    """Failed docs land in the partitioned, manifest-tracked failed/
    sink (no driver collect)."""
    import glob

    import pyarrow.parquet as pq
    import ray.data as rd

    from kazu_ray.stages.materialize import write_annotated

    def poisoned(batch: pa.Table) -> pa.Table:
        import pyarrow as pa

        errs = ["" if "flu" in t else "RuntimeError: boom" for t in batch["text"].to_pylist()]
        out = batch.append_column("ents_json", pa.array(["[]"] * batch.num_rows, type=pa.large_string()))
        out = out.append_column("triples_json", pa.array(["[]"] * batch.num_rows, type=pa.large_string()))
        return out.append_column("processing_exception", pa.array(errs, type=pa.large_string()))

    docs = rd.from_items(
        [
            {"doc_id": "a", "text": "breast cancer."},
            {"doc_id": "b", "text": "flu."},
            {"doc_id": "c", "text": "totally poisoned."},
        ]
    ).map_batches(poisoned, batch_format="pyarrow")
    result = write_annotated(docs, str(tmp_path / "out"))
    assert result["failed"] == 2
    files = glob.glob(str(tmp_path / "out" / "failed" / "part=*" / "*.parquet"))
    assert files
    total = sum(pq.read_metadata(f).num_rows for f in files)
    assert total == 2
    manifests = glob.glob(str(tmp_path / "out" / "failed" / "_manifests" / "*.json"))
    assert manifests


def test_annotated_store_roundtrip_recomputes_triples(ray_session, tmp_path):
    """write_annotated → read_annotated must round-trip losslessly: the
    triples exploded from the stored annotations equal the pipeline's
    direct triples — downstream-only re-runs never pay NER again."""
    from kazu_ray.pipelines.kg import annotated_docs, broadcast_store
    from kazu_ray.stages.materialize import (
        explode_triples,
        read_annotated,
        write_annotated,
    )

    sf = "/root/testdata/sf0.001"
    store_ref = broadcast_store()
    docs = annotated_docs(sf, store_ref=store_ref)
    direct = (
        explode_triples(annotated_docs(sf, store_ref=store_ref))
        .to_pandas()
        .sort_values(["doc_id", "subj", "pred", "obj", "sent_idx"])
        .reset_index(drop=True)
    )
    out = str(tmp_path / "store")
    write_annotated(docs, out)
    roundtrip = (
        explode_triples(read_annotated(out))
        .to_pandas()
        .sort_values(["doc_id", "subj", "pred", "obj", "sent_idx"])
        .reset_index(drop=True)
    )
    assert len(roundtrip) == len(direct) > 0
    assert roundtrip.equals(direct)


def test_model_pack_roundtrip_and_verification(ray_session, tmp_path):
    """Model-pack build/load parity (build_and_test_model_packs.py):
    archive carries per-file sha256 + ontology version; load verifies
    both and the extracted caches drive the pipeline."""
    import json as _json

    from kazu_ray.state.pack import build_pack, load_pack
    from kazu_ray.state.store import ensure_default_caches

    pack_path = str(tmp_path / "model.pack.tgz")
    manifest = build_pack(pack_path)
    assert manifest["files"], "pack must carry cache tables"

    extracted = load_pack(pack_path, dest_dir=str(tmp_path / "x1"))
    # the extracted dir is a complete cache dir: ensure_default_caches
    # accepts it without rebuilding
    assert ensure_default_caches(extracted) == extracted

    # corruption is detected file-by-file
    import tarfile

    victim = sorted(manifest["files"])[0]
    with open(str(tmp_path / "x1" / victim), "ab") as f:
        f.write(b"corrupt")
    from kazu_ray.state.pack import _sha256_file

    assert _sha256_file(str(tmp_path / "x1" / victim)) != manifest["files"][victim]

    bad_dir = str(tmp_path / "x2")
    load_pack(pack_path, dest_dir=bad_dir)  # fresh extract still fine
    with open(f"{bad_dir}/{victim}", "ab") as f:
        f.write(b"corrupt")
    import pytest as _pytest

    # re-verify against the manifest catches the corruption
    with open(f"{bad_dir}/pack_manifest.json") as f:
        m2 = _json.load(f)
    assert _sha256_file(f"{bad_dir}/{victim}") != m2["files"][victim]


def test_model_pack_acceptance_gate(ray_session, tmp_path):
    """--acceptance packs are gated on the e2e P/R scorer and record the
    scores in the manifest."""
    from kazu_ray.state.pack import build_pack

    manifest = build_pack(str(tmp_path / "gated.tgz"), run_acceptance=True)
    assert manifest["acceptance"]["passed"] is True
    assert manifest["acceptance"]["scores"], "per-class scores recorded"


def test_store_partition_hash_rule_guard(ray_session, tmp_path):
    """A store written under a different (or pre-versioning) partition
    hash rule must be refused loudly, not silently misread."""
    import json as _json

    import pytest as _pytest

    from kazu_ray.pipelines.kg import broadcast_store, triples_dataset
    from kazu_ray.stages.materialize import lookup_triples, materialize_triples

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "store")
    store_ref = broadcast_store()
    materialize_triples(
        triples_dataset(sf, store_ref=store_ref), out, num_parts=4
    )
    # tamper: claim a different hash rule
    with open(f"{out}/_format.json", "w") as f:
        _json.dump({"partition_hash_rule": "md5-v1"}, f)
    with _pytest.raises(ValueError, match="partition-hash rule"):
        lookup_triples(out, "CHEMBL:CHEMBL1020")
    with _pytest.raises(ValueError, match="partition-hash rule"):
        materialize_triples(triples_dataset(sf, store_ref=store_ref), out, num_parts=4)
    # legacy store: manifests but no marker at all
    import os as _os

    _os.remove(f"{out}/_format.json")
    with _pytest.raises(ValueError, match="predates"):
        lookup_triples(out, "CHEMBL:CHEMBL1020")


def test_annotate_shard_resume_roundtrip(ray_session, tmp_path):
    """annotate --by-shard: per-shard resume of the full annotation
    pipeline; the written shards load back and re-explode to the same
    triples as the direct pipeline."""
    from kazu_ray.pipelines.kg import annotated_docs, broadcast_store
    from kazu_ray.pipelines.resumable import annotate_resumable
    from kazu_ray.sources.corpus import ensure_pages_parquet
    from kazu_ray.stages.materialize import explode_triples

    import ray.data as rd

    pages_dir = ensure_pages_parquet("/root/testdata/sf0.001", 1)
    store_ref = broadcast_store()
    out = str(tmp_path / "ann_shards")
    r1 = annotate_resumable(pages_dir, out, store_ref=store_ref, num_shards=4)
    assert r1["shards_run"] == r1["shards_total"] and r1["rows"] > 0
    r2 = annotate_resumable(pages_dir, out, store_ref=store_ref, num_shards=4)
    assert r2["shards_run"] == 0 and r2["shards_skipped"] == r1["shards_total"]
    # the persisted annotations re-explode to the direct pipeline's triples
    import glob

    stored = rd.read_parquet(sorted(glob.glob(f"{out}/shard=*/*.parquet")))
    roundtrip = explode_triples(stored).to_pandas()
    direct = explode_triples(
        annotated_docs("/root/testdata/sf0.001", store_ref=store_ref)
    ).to_pandas()
    key = ["doc_id", "subj", "pred", "obj", "sent_idx"]
    assert sorted(map(tuple, roundtrip[key].values.tolist())) == sorted(
        map(tuple, direct[key].values.tolist())
    )


def test_materialize_exchange_fails_loud_and_resumes(ray_session, tmp_path):
    """A feed-stage failure must abort the materialize loudly (no silent
    double-delivery, actors reaped by the finally), and a job-level
    retry must complete from whatever partition manifests landed."""
    import pyarrow as pa
    import pytest as _pytest
    import ray
    import ray.data as rd

    from kazu_ray.stages.materialize import load_manifests, materialize_partitioned

    rows = pa.table(
        {
            "key": pa.array([f"k{i}" for i in range(1000)]),
            "v": pa.array(list(range(1000)), type=pa.int64()),
        }
    )
    out = str(tmp_path / "store")

    def poison(batch: pa.Table) -> pa.Table:
        # deterministic failure on the block carrying k0 (a shared
        # driver-side counter would not survive worker serialization)
        if "k0" in batch["key"].to_pylist():
            raise RuntimeError("planted feed failure")
        return batch

    poisoned = rd.from_arrow(rows).repartition(16).map_batches(poison, batch_format="pyarrow")
    with _pytest.raises(Exception, match="planted feed failure"):
        materialize_partitioned(poisoned, out, key_col="key", num_parts=4)
    # job-level retry with a healthy pipeline completes the store
    clean = rd.from_arrow(rows).repartition(16)
    manifests = materialize_partitioned(clean, out, key_col="key", num_parts=4)
    assert sum(m["row_count"] for m in manifests) == 1000
    assert len(load_manifests(out)) == 4


def test_incremental_update_equals_one_shot_build(ray_session, tmp_path):
    """update_triple_store: build on half the corpus, update with the
    other half → byte-identical manifests (content sha included) to the
    one-shot build on the full corpus; re-applying the same update is a
    no-op; a fresh update id with zero new rows touches nothing."""
    from kazu_ray.pipelines.kg import broadcast_store, triples_dataset
    from kazu_ray.stages.materialize import (
        load_manifests,
        materialize_triples,
        update_triple_store,
    )

    store_ref = broadcast_store()

    # split on a doc_id predicate (md5 parity of the id string)
    import hashlib as _hl

    def _is_a(batch, invert=False):
        mask = [
            (int(_hl.md5(d.encode()).hexdigest()[:4], 16) % 2 == 0) != invert
            for d in batch["doc_id"].to_pylist()
        ]
        import pyarrow as pa

        return batch.filter(pa.array(mask))

    full = triples_dataset("/root/testdata/sf0.001", store_ref=store_ref)
    part_a = full.map_batches(lambda t: _is_a(t), batch_format="pyarrow")
    part_b = full.map_batches(lambda t: _is_a(t, invert=True), batch_format="pyarrow")

    one_shot = str(tmp_path / "one_shot")
    incremental = str(tmp_path / "incr")
    m_full = materialize_triples(full, one_shot, num_parts=4)
    materialize_triples(part_a, incremental, num_parts=4)
    m_updated = update_triple_store(part_b, incremental, update_id="day2")

    strip = lambda ms: [
        {k: m[k] for k in ("partition_id", "row_count", "min_key", "max_key", "sha256")}
        for m in sorted(ms, key=lambda m: m["partition_id"])
    ]
    assert strip(m_updated) == strip(m_full)

    # idempotent re-apply (resume rule: expected counts already met)
    m_again = update_triple_store(part_b, incremental, update_id="day2")
    assert strip(m_again) == strip(m_full)

    # an empty update under a new id changes nothing
    empty = full.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")
    m_empty = update_triple_store(empty, incremental, update_id="day3")
    assert strip(m_empty) == strip(m_full)
    assert load_manifests(incremental) == m_empty


def test_incremental_update_with_spill(ray_session, tmp_path, monkeypatch):
    """The update path under a tiny spill cap: preloaded partitions
    spill sorted runs like the build path; manifests still equal the
    one-shot build."""
    from kazu_ray.pipelines.kg import broadcast_store, triples_dataset
    from kazu_ray.stages.materialize import materialize_triples, update_triple_store

    store_ref = broadcast_store()
    full = triples_dataset("/root/testdata/sf0.001", store_ref=store_ref)
    one_shot = str(tmp_path / "one_shot")
    m_full = materialize_triples(full, one_shot, num_parts=2)

    monkeypatch.setenv("KAZU_WRITER_SPILL_BYTES", str(16 * 1024))
    incr = str(tmp_path / "incr")
    half = full.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")
    # build empty store shell on zero rows, then absorb everything as
    # one update so every row flows through the preload+spill merge
    materialize_triples(half, incr, num_parts=2)
    m_upd = update_triple_store(full, incr, update_id="all")

    strip = lambda ms: sorted(
        (m["partition_id"], m["row_count"], m["sha256"]) for m in ms
    )
    assert strip(m_upd) == strip(m_full)


def test_auto_num_parts_scales_with_input_and_pins_on_resume(
    ray_session, tmp_path, monkeypatch
):
    """num_parts=None sizes the store from measured input bytes (two
    sizes → two counts), pins the chosen count in _format.json, reuses
    it on resume even if the sizing target changes, and refuses a
    conflicting explicit count."""
    import pytest as _pytest
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.ops.exchange import auto_partition_count
    from kazu_ray.stages.materialize import load_manifests, materialize_partitioned

    assert auto_partition_count(0) == 4          # lo floor
    assert auto_partition_count(10**15) == 4096  # hi cap

    monkeypatch.setenv("KAZU_TARGET_PART_BYTES", "4096")

    def make(n):
        return rd.from_arrow(
            pa.table(
                {
                    "key": pa.array([f"k{i}" for i in range(n)]),
                    "v": pa.array([f"{'x' * 32}{i}" for i in range(n)]),
                }
            )
        ).repartition(4)

    small_out = str(tmp_path / "small")
    big_out = str(tmp_path / "big")
    m_small = materialize_partitioned(make(200), small_out, key_col="key", num_parts=None)
    m_big = materialize_partitioned(make(3000), big_out, key_col="key", num_parts=None)
    assert len(m_big) > len(m_small) >= 4
    assert sum(m["row_count"] for m in m_big) == 3000

    # resume: a DIFFERENT sizing target must not re-route keys — the
    # pinned count wins
    monkeypatch.setenv("KAZU_TARGET_PART_BYTES", str(256 * 1024 * 1024))
    m_resume = materialize_partitioned(
        make(3000), big_out, key_col="key", num_parts=None
    )
    assert len(m_resume) == len(m_big)
    assert len(load_manifests(big_out)) == len(m_big)

    # an explicit conflicting count is a loud error, not silent mixing
    with _pytest.raises(ValueError, match="num_parts"):
        materialize_partitioned(
            make(3000), big_out, key_col="key", num_parts=len(m_big) + 1
        )


def test_exchange_groups_auto_raises_bucket_count(ray_session, monkeypatch):
    """When exchange_groups materializes the input itself, measured
    bytes can only RAISE the caller's bucket count — and results stay
    identical to the explicit-count run."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.ops.exchange import exchange_groups

    rng = np.random.RandomState(5)
    n = 4000
    df = pd.DataFrame({"k": rng.randint(0, 25, n), "v": rng.randint(0, 100, n)})
    ds = rd.from_pandas(df).repartition(8)

    def per_bucket(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("k", as_index=False).agg(s=("v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    empty = pa.table(
        {"k": pa.array([], type=pa.int64()), "s": pa.array([], type=pa.int64())}
    )
    want = (
        df.groupby("k", as_index=False).agg(s=("v", "sum"))
        .sort_values("k").reset_index(drop=True)
    )
    # tiny target → auto count far above the caller's 2; fully-auto
    # (None) and auto-raised (2) must both match the local groupby
    monkeypatch.setenv("KAZU_TARGET_PART_BYTES", "2048")
    for nb in (None, 2):
        got = (
            exchange_groups(ds, ["k"], nb, per_bucket, empty)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_auto_sized_store_resumes_partial_build_under_pinned_count(
    ray_session, tmp_path, monkeypatch
):
    """num_parts=None + a partially-built store (some partitions written,
    some lost): the re-run must resume under the count pinned by the
    first attempt — never recompute auto-sizing across attempts, even
    when the sizing target changed — and rebuild exactly the missing
    partitions."""
    import json
    import os
    import shutil

    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.stages.materialize import load_manifests, materialize_partitioned

    monkeypatch.setenv("KAZU_TARGET_PART_BYTES", "4096")
    rows = pa.table(
        {
            "key": pa.array([f"k{i}" for i in range(2000)]),
            "v": pa.array([f"{'x' * 32}{i}" for i in range(2000)]),
        }
    )
    out = str(tmp_path / "store")
    full = materialize_partitioned(
        rd.from_arrow(rows).repartition(8), out, key_col="key", num_parts=None,
        sort_cols=["key", "v"],
    )
    with open(os.path.join(out, "_format.json")) as f:
        pinned = json.load(f)["num_parts"]
    assert pinned == len(full) and pinned > 4
    by_part = {m["partition_id"]: m for m in full}

    # simulate a crash that lost two partitions (manifest + data)
    lost = sorted(by_part)[:2]
    for p_id in lost:
        os.remove(os.path.join(out, "_manifests", f"{p_id}.json"))
        shutil.rmtree(os.path.join(out, f"part={p_id}"), ignore_errors=True)

    # resume with a DIFFERENT sizing target: pinned count must win
    monkeypatch.setenv("KAZU_TARGET_PART_BYTES", str(256 * 1024 * 1024))
    resumed = materialize_partitioned(
        rd.from_arrow(rows).repartition(8), out, key_col="key", num_parts=None,
        sort_cols=["key", "v"],
    )
    assert len(resumed) == pinned
    assert sum(m["row_count"] for m in resumed) == 2000
    # rebuilt partitions carry the same content hash as the first build
    for m in load_manifests(out):
        assert m["sha256"] == by_part[m["partition_id"]]["sha256"]


def test_build_metrics_artifact(ray_session, tmp_path):
    """Every store build writes _metrics/last_build.json: wall time,
    rows, written-vs-resumed partitions; a full-resume no-op leaves the
    previous attempt's metrics in place."""
    import json
    import os

    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.stages.materialize import materialize_partitioned

    rows = pa.table(
        {"key": pa.array([f"k{i}" for i in range(300)]),
         "v": pa.array(list(range(300)), type=pa.int64())}
    )
    out = str(tmp_path / "store")
    materialize_partitioned(rd.from_arrow(rows), out, key_col="key", num_parts=4)
    mpath = os.path.join(out, "_metrics", "last_build.json")
    with open(mpath) as f:
        m = json.load(f)
    assert m["row_count"] == 300 and m["num_parts"] == 4
    assert m["written_parts"] == [0, 1, 2, 3] and m["resumed_parts"] == []
    assert m["wall_sec"] > 0 and m["rows_per_sec"] > 0
    first = m

    # full resume: nothing pending, metrics unchanged
    materialize_partitioned(rd.from_arrow(rows), out, key_col="key", num_parts=4)
    with open(mpath) as f:
        assert json.load(f) == first

    # partial resume: one partition lost -> metrics show the split
    os.remove(os.path.join(out, "_manifests", "2.json"))
    import shutil

    shutil.rmtree(os.path.join(out, "part=2"), ignore_errors=True)
    materialize_partitioned(rd.from_arrow(rows), out, key_col="key", num_parts=4)
    with open(mpath) as f:
        m2 = json.load(f)
    assert m2["written_parts"] == [2] and m2["resumed_parts"] == [0, 1, 3]
    assert m2["row_count"] == 300


def test_apply_crawl_delta_equals_rebuild(ray_session, tmp_path):
    """The incremental cycle (crawl_delta -> retract_docs -> re-annotate
    -> update_triple_store) must land on per-partition manifests (row
    counts AND content hashes) IDENTICAL to a from-scratch rebuild over
    the new snapshot — including after a full crash-replay of the whole
    cycle under the same update_id."""
    import os

    import ray.data as rd

    from kazu_ray.pipelines.incremental import apply_crawl_delta
    from kazu_ray.pipelines.kg import annotated_docs, broadcast_store
    from kazu_ray.sources.corpus import pages_pandas, synthesize_pages_batch
    from kazu_ray.stages.materialize import (
        explode_triples,
        load_manifests,
        materialize_triples,
    )

    base = pages_pandas("/root/testdata/sf0.001", limit=120)
    ids = base["url"].str.extract(r"/doc/(\d+)$", expand=False).astype(int)

    old_df = base[(ids % 3 != 0).to_numpy()].reset_index(drop=True)
    new_df = base[(ids % 3 != 1).to_numpy()].reset_index(drop=True)
    nids = new_df["url"].str.extract(r"/doc/(\d+)$", expand=False).astype(int)
    # changed pages (present in BOTH snapshots): same url, entirely new
    # content from a far-away doc id — their triples genuinely differ
    changed_mask = ((nids % 5 == 0) & (nids % 3 == 2)).to_numpy()
    repl = synthesize_pages_batch(
        pa.table({"doc_id": pa.array((nids[changed_mask] + 1_000_000).tolist())})
    ).to_pandas()
    for col in ("html", "text", "lang"):
        new_df.loc[changed_mask, col] = repl[col].values

    old_ds = rd.from_arrow(pa.Table.from_pandas(old_df, preserve_index=False))
    new_ds = rd.from_arrow(pa.Table.from_pandas(new_df, preserve_index=False))

    ref = broadcast_store()

    from kazu_ray.stages.materialize import write_annotated

    def build(ds, out, docs_out=None):
        ann = annotated_docs(None, store_ref=ref, pages_ds=ds)
        if docs_out is not None:
            ann = ann.materialize()
            write_annotated(ann, docs_out, num_parts=4)
        triples = explode_triples(ann)
        materialize_triples(triples, out, num_parts=4)

    out_inc = str(tmp_path / "incremental")
    out_ref = str(tmp_path / "rebuild")
    docs_inc = str(tmp_path / "docs_incremental")
    docs_ref = str(tmp_path / "docs_rebuild")
    build(old_ds, out_inc, docs_inc)
    build(new_ds, out_ref, docs_ref)

    s = apply_crawl_delta(
        old_ds, new_ds, out_inc, "day2", store_ref=ref, docs_dir=docs_inc
    )
    assert s["n_new"] > 0 and s["n_gone"] > 0 and s["n_changed"] > 0
    assert s["retracted_rows"] > 0 and s["added_rows"] > 0

    def key(ms):
        return sorted((m["partition_id"], m["row_count"], m["sha256"]) for m in ms)

    assert key(load_manifests(out_inc)) == key(load_manifests(out_ref))

    # docs sink reconciled too: per-partition row counts + the exact
    # doc_id multiset match the rebuild (the docs store is unsorted, so
    # content shas hash arrival order and are not comparable)
    def docs_state(root):
        import glob

        import pyarrow.parquet as pq

        counts = {
            m["partition_id"]: m["row_count"]
            for m in load_manifests(os.path.join(root, "docs"))
        }
        ids = []
        for f in glob.glob(os.path.join(root, "docs", "part=*", "docs.parquet")):
            ids.extend(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
        return counts, sorted(ids)

    assert s["docs_retracted_rows"] > 0
    assert docs_state(docs_inc) == docs_state(docs_ref)

    # fully-applied re-run: fast no-op via the done marker
    again = apply_crawl_delta(old_ds, new_ds, out_inc, "day2", store_ref=ref)
    assert again.get("resumed_noop")

    # crash-replay: drop the marker and re-run the WHOLE cycle — the
    # retract-all-delta-urls + re-add path must land on the same store
    os.remove(os.path.join(out_inc, "_updates", "day2", "_DELTA_DONE"))
    replay = apply_crawl_delta(
        old_ds, new_ds, out_inc, "day2", store_ref=ref, docs_dir=docs_inc
    )
    assert not replay.get("resumed_noop")
    assert key(load_manifests(out_inc)) == key(load_manifests(out_ref))
    assert docs_state(docs_inc) == docs_state(docs_ref)


def test_retract_docs_full_and_partial(ray_session, tmp_path):
    """retract_docs edge cases: partial retraction rewrites only the
    partitions holding matching rows (others byte-untouched); full
    retraction leaves schema-stable empty partitions with row_count-0
    manifests; retraction is idempotent."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from kazu_ray.stages.materialize import (
        load_manifests,
        materialize_triples,
        retract_docs,
    )

    rows = [
        {
            "subj": f"S:{i % 7:02d}",
            "pred": "p",
            "obj": f"O:{i % 5:02d}",
            "doc_id": f"https://h.org/doc/{i:04d}",
        }
        for i in range(200)
    ]
    out = str(tmp_path / "store")
    materialize_triples(rd.from_items(rows), out, num_parts=4)
    base = {m["partition_id"]: m for m in load_manifests(out)}
    files_before = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{out}/part=*/triples.parquet")
    }

    # bloom sidecars written by the build
    assert len(glob.glob(f"{out}/part=*/docs.bloom.npy")) == 4

    # partial: retract one doc's rows — the bloom pre-check must open
    # only the partition(s) that can contain it
    s = retract_docs(out, ["https://h.org/doc/0000"], "r1")
    assert s["retracted_rows"] == 1
    assert s["parts_scanned"] + s["parts_bloom_skipped"] == 4
    assert s["parts_scanned"] == len(s["rewritten_parts"])  # zero false scans here
    after = {m["partition_id"]: m for m in load_manifests(out)}
    touched = set(s["rewritten_parts"])
    assert touched  # the doc's subject bucket
    for p, m in after.items():
        if p in touched:
            assert m["row_count"] == base[p]["row_count"] - 1
            assert m["sha256"] != base[p]["sha256"]
        else:
            assert m == base[p]
    # untouched partitions: files not rewritten
    for f, mtime in files_before.items():
        part = int(f.split("part=")[1].split("/")[0])
        if part not in touched:
            assert os.path.getmtime(f) == mtime

    # idempotent: same retraction again is a no-op — and the rewritten
    # partition's REBUILT bloom now excludes the doc, so nothing scans
    s2 = retract_docs(out, ["https://h.org/doc/0000"], "r1")
    assert s2["retracted_rows"] == 0 and not s2["rewritten_parts"]
    assert s2["parts_scanned"] == 0 and s2["parts_bloom_skipped"] == 4

    # legacy store (no sidecars): every partition is scanned
    for f in glob.glob(f"{out}/part=*/docs.bloom.npy"):
        os.remove(f)
    s_legacy = retract_docs(out, ["https://h.org/doc/0001"], "r1b")
    assert s_legacy["parts_scanned"] == 4 and s_legacy["parts_bloom_skipped"] == 0
    assert s_legacy["retracted_rows"] == 1

    # full: retract everything -> empty but schema-stable partitions
    remaining = sum(m["row_count"] for m in load_manifests(out))
    s3 = retract_docs(out, [r["doc_id"] for r in rows], "r2")
    assert s3["retracted_rows"] == remaining
    for m in load_manifests(out):
        assert m["row_count"] == 0
    for f in glob.glob(f"{out}/part=*/triples.parquet"):
        t = pq.read_table(f)
        assert t.num_rows == 0
        assert "subj" in t.schema.names and "doc_id" in t.schema.names


def test_retract_docs_keyed_store_prunes_partitions(ray_session, tmp_path):
    """Docs-layout retraction (doc_col == key_col): the retract ids hash
    straight to their partitions — other partitions are never submitted
    (parts_key_pruned), and the removal is exact."""
    import ray.data as rd

    from kazu_ray.stages.materialize import (
        load_manifests,
        materialize_partitioned,
        retract_docs,
    )

    rows = [
        {"doc_id": f"https://h.org/doc/{i:04d}", "payload": f"p{i}"}
        for i in range(100)
    ]
    out = str(tmp_path / "docs_store")
    materialize_partitioned(
        rd.from_items(rows),
        out,
        key_col="doc_id",
        num_parts=8,
        file_name="docs.parquet",
        bloom_col="doc_id",
    )
    total = sum(m["row_count"] for m in load_manifests(out))
    assert total == 100

    s = retract_docs(
        out,
        ["https://h.org/doc/0007"],
        "r1",
        doc_col="doc_id",
        file_name="docs.parquet",
        key_col="doc_id",
    )
    assert s["retracted_rows"] == 1
    assert s["parts_key_pruned"] == 7  # only the id's own partition submitted
    assert s["parts_scanned"] + s["parts_bloom_skipped"] == 1
    assert sum(m["row_count"] for m in load_manifests(out)) == 99


def test_retract_docs_repairs_crashed_manifest(ray_session, tmp_path):
    """Simulate a crash between the data-file rename and the manifest
    rename: the file is already filtered but the manifest still
    describes the pre-retract rows. Re-running the retraction under the
    same update_id must repair the manifest (row count AND sha) to
    exactly what an uncrashed retraction produces — through BOTH the
    stale-manifest scan path and regardless of the bloom shortcut."""
    import glob
    import json as _json
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from kazu_ray.stages.materialize import (
        load_manifests,
        materialize_triples,
        retract_docs,
    )

    rows = [
        {
            "subj": f"S:{i % 5:02d}",
            "pred": "p",
            "obj": f"O:{i % 3:02d}",
            "doc_id": f"https://h.org/doc/{i:04d}",
        }
        for i in range(60)
    ]

    # reference: an uncrashed retraction of doc 0003
    ref_out = str(tmp_path / "ref")
    materialize_triples(rd.from_items(rows), ref_out, num_parts=2)
    retract_docs(ref_out, ["https://h.org/doc/0003"], "r1")
    ref_manifests = {m["partition_id"]: m for m in load_manifests(ref_out)}

    # crashed store: filter the doc's rows out of the data files by
    # hand (simulating the post-file-rename, pre-manifest-rename crash)
    # while leaving manifests AND bloom sidecars untouched
    out = str(tmp_path / "crashed")
    materialize_triples(rd.from_items(rows), out, num_parts=2)
    for f in glob.glob(f"{out}/part=*/triples.parquet"):
        t = pq.read_table(f)
        t = t.filter(
            pc.invert(pc.equal(t["doc_id"], "https://h.org/doc/0003"))
        )
        pq.write_table(t, f)
    stale = {m["partition_id"]: m for m in load_manifests(out)}
    assert any(
        stale[p]["row_count"] != ref_manifests[p]["row_count"] for p in stale
    )  # the crash state really is inconsistent

    s = retract_docs(out, ["https://h.org/doc/0003"], "r1")
    # nothing left to remove, but the manifests must now be repaired
    assert s["retracted_rows"] == 0
    repaired = {m["partition_id"]: m for m in load_manifests(out)}
    for p, m in ref_manifests.items():
        assert repaired[p]["row_count"] == m["row_count"]
        assert repaired[p]["sha256"] == m["sha256"]
