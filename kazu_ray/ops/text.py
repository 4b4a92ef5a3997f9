"""Text-analysis operators for large-scale training-data pipelines.

Each operator is a vectorized ``map_batches`` over the ``documents``
table (or any table with a ``text`` column) and has a DuckDB-SQL oracle
in ``__ray_entry__.oracle_sql`` with matching column names.

* token counting   — whitespace tokens + a BPE-ish subword regex count
* quality scoring  — length / punctuation / stopword ratios
* language ID      — character-n-gram heuristic over stopword hits
* fingerprinting   — md5 content fingerprint + 64-bit rolling hash
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")

# BPE-ish token pattern: runs of letters, digits, or single punctuation
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_chars, n_tokens (whitespace), n_subwords (regex)."""
    texts = batch["text"]
    n_chars = pc.utf8_length(texts)
    # whitespace token count = space count + 1 (documents have single spaces)
    n_spaces = pc.count_substring(texts, " ")
    n_tokens = pc.add(n_spaces, 1)
    n_subwords = pa.array(
        [len(_BPE_RE.findall(t)) for t in texts.to_pylist()], type=pa.int64()
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_subwords": n_subwords,
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_words, n_stopwords, sum_word_len — the standard cheap
    quality signals (C4/Gopher-style length & stopword heuristics).
    Ratios are left to the consumer: integer counts compare exactly
    against the SQL oracle with no float-rounding hazards."""
    texts = batch["text"].to_pylist()
    n_words, n_stop, sum_len = [], [], []
    stopset = set(STOPWORDS)
    for t in texts:
        words = t.split(" ")
        n_words.append(len(words))
        n_stop.append(sum(1 for w in words if w in stopset))
        sum_len.append(sum(len(w) for w in words))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words, type=pa.int64()),
            "n_stopwords": pa.array(n_stop, type=pa.int64()),
            "sum_word_len": pa.array(sum_len, type=pa.int64()),
        }
    )


class LangIdStage:
    """Heuristic language ID: score = fraction of words in per-language
    stopword lists. Deterministic, model-free; the actor compiles word
    sets once (``__init__``)."""

    LANG_WORDS = {
        "en": {"the", "and", "of", "is", "was", "in", "a", "to"},
        "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit"},
        "es": {"el", "la", "los", "es", "un", "una", "que", "y"},
        "fr": {"le", "la", "les", "est", "une", "et", "que", "dans"},
    }

    def __init__(self):
        self.tables = {k: frozenset(v) for k, v in self.LANG_WORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        for t in batch["text"].to_pylist():
            words = t.lower().split(" ")
            best_lang, best = "unknown", 0
            for lang, table in sorted(self.tables.items()):
                hits = sum(1 for w in words if w in table)
                if hits > best:
                    best, best_lang = hits, lang
            preds.append(best_lang)
        return pa.table(
            {"doc_id": batch["doc_id"], "lang_pred": pa.array(preds, type=pa.string())}
        )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """md5 content fingerprint (SQL-checkable) + 64-bit polynomial
    rolling hash (engine-only)."""
    md5s, rolls = [], []
    for t in batch["text"].to_pylist():
        md5s.append(hashlib.md5(t.encode()).hexdigest())
        h = 0
        for ch in t:
            h = (h * 1000003 + ord(ch)) & 0xFFFFFFFFFFFFFFFF
        rolls.append(h)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "md5": pa.array(md5s, type=pa.string()),
            "rolling_hash": pa.array(rolls, type=pa.uint64()),
        }
    )


def word_count_partial_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial word counts (the combiner for a vocabulary
    build); a groupby-sum over these partials gives exact global counts
    with hub-word fan-in bounded by block count."""
    counts: dict[str, int] = {}
    for t in batch["text"].to_pylist():
        for w in t.split(" "):
            counts[w] = counts.get(w, 0) + 1
    words = sorted(counts)
    return pa.table(
        {
            "word": pa.array(words, type=pa.string()),
            "partial": pa.array([counts[w] for w in words], type=pa.int64()),
        }
    )


def vocabulary(docs_ds, min_count: int = 1):
    """Global word-frequency table (vocabulary/BPE prep shape)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from kazu_ray.ops.dedup import shuffle_parts

    partials = docs_ds.map_batches(word_count_partial_batch, batch_format="pyarrow")
    agg = partials.repartition(shuffle_parts()).groupby("word").aggregate(
        Sum("partial", alias_name="n")
    )
    if min_count > 1:
        agg = agg.map_batches(
            lambda t: t.filter(pc.greater_equal(t["n"], min_count)),
            batch_format="pyarrow",
        )
    return agg


class DecontaminateStage:
    """Benchmark decontamination: flag corpus docs sharing any k-word
    shingle with a benchmark text set. The benchmark shingle set is
    broadcast (built once per worker from the payload), the corpus
    streams — the standard shape for removing eval-set leakage from
    training data."""

    def __init__(self, benchmark_texts: tuple, k: int = 8):
        self.k = k
        self.shingles: set[str] = set()
        for t in benchmark_texts:
            words = t.split(" ")
            if len(words) < k:
                self.shingles.add(" ".join(words))
            for i in range(len(words) - k + 1):
                self.shingles.add(" ".join(words[i : i + k]))

    def __call__(self, batch: pa.Table) -> pa.Table:
        flags = []
        for t in batch["text"].to_pylist():
            words = t.split(" ")
            hit = False
            if len(words) < self.k:
                hit = " ".join(words) in self.shingles
            else:
                for i in range(len(words) - self.k + 1):
                    if " ".join(words[i : i + self.k]) in self.shingles:
                        hit = True
                        break
            flags.append(hit)
        return batch.append_column("contaminated", pa.array(flags, type=pa.bool_()))




# --- sequence packing (distributed prefix sum) --------------------------


def pack_chunks(docs_ds, chunk_tokens: int = 64, bucket_size: int = 4096):
    """GPT-style sequence packing layout: concatenate every document's
    whitespace tokens into one global stream (ordered by ``doc_id`` —
    the cross-engine order contract) and report, per doc, its token
    offset and the fixed-size training chunks it lands in:
    (doc_id, n_tokens, start_tok, first_chunk, last_chunk).

    The global token offset is a PREFIX SUM — inherently sequential, so
    it runs as the classic two-phase distributed scan instead of a
    driver loop or a global sort:

    1. one streaming pass computes the narrow (doc_id, n_tokens,
       bucket = doc_id // bucket_size) table (2 int64s + key — this is
       the only thing materialized, never the corpus);
    2. a tiny ``groupby(bucket)`` sum gives per-bucket totals; the
       driver prefix-sums THOSE (one row per bucket — 10^12 docs /
       bucket_size rows) into bucket base offsets;
    3. a ``groupby(bucket).map_groups`` adds the within-bucket cumsum
       to the broadcast base offsets.

    Chunks then follow arithmetically: first/last = start // C and
    (start + n - 1) // C. Token rule = ``len(text.split(" "))``,
    matching the SQL oracle's ``len(string_split(text, ' '))``.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def counts(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.cast(batch["doc_id"], pa.int64())
        n = [len(t.split(" ")) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": ids,
                "n_tokens": pa.array(n, type=pa.int64()),
                "bucket": pc.divide(ids, bucket_size),
            }
        )

    narrow = docs_ds.map_batches(counts, batch_format="pyarrow").materialize()
    totals = (
        narrow.groupby("bucket")
        .aggregate(Sum("n_tokens", alias_name="total"))
        .to_pandas()
        .sort_values("bucket")
    )
    base = dict(
        zip(totals["bucket"], totals["total"].cumsum() - totals["total"])
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        start = base[g["bucket"].iloc[0]] + (g["n_tokens"].cumsum() - g["n_tokens"])
        out = pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "n_tokens": g["n_tokens"],
                "start_tok": start.astype("int64"),
            }
        )
        out["first_chunk"] = out["start_tok"] // chunk_tokens
        out["last_chunk"] = (out["start_tok"] + out["n_tokens"] - 1) // chunk_tokens
        return out

    return narrow.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


# --- bloom-filter decontamination (the 10^9-shingle scale path) --------

BLOOM_M_BITS = 1 << 20  # bitmap size; 128 KiB packed
BLOOM_K = 4  # hash functions (4 disjoint 8-hex-char slices of one md5)


def bloom_positions(shingle: str, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K):
    """Bit positions for one shingle: k disjoint 8-hex-char slices of
    md5(shingle), each mod m_bits. md5-derived on purpose — DuckDB
    recomputes the identical positions (same trick as ops/sample.py),
    so even the bloom's FALSE POSITIVES are reproduced by the SQL
    oracle and the decision column compares exactly."""
    h = hashlib.md5(shingle.encode()).hexdigest()
    return [int(h[8 * i : 8 * i + 8], 16) % m_bits for i in range(k)]


def _doc_shingles(text: str, k_words: int):
    words = text.split(" ")
    if len(words) < k_words:
        return {" ".join(words)}
    return {
        " ".join(words[i : i + k_words]) for i in range(len(words) - k_words + 1)
    }


def build_bloom(benchmark_ds, k_words: int = 8, m_bits: int = BLOOM_M_BITS) -> bytes:
    """Distributed bloom build over the benchmark Dataset: each batch
    emits one packed partial bitmap (m_bits/8 bytes); the driver ORs
    the per-batch partials — at 10^9 benchmark shingles the driver
    handles n_batches × 128 KiB rows, never the shingles. This replaces
    the broadcast shingle SET of DecontaminateStage when the benchmark
    itself is large (a set of 10^9 shingles is tens of GB; the bitmap
    is 128 KiB at any cardinality, trading a quantified false-positive
    rate: k=4, m=2^20 → ~0.24% at 10^5 shingles)."""

    def partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits, dtype=bool)
        for t in batch["text"].to_pylist():
            for s in _doc_shingles(t, k_words):
                bits[bloom_positions(s, m_bits)] = True
        return pa.table({"bitmap": pa.array([np.packbits(bits).tobytes()])})

    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    for b in benchmark_ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for buf in b["bitmap"].to_pylist():
            merged |= np.frombuffer(buf, dtype=np.uint8)
    return merged.tobytes()


class BloomDecontaminateStage:
    """Corpus-side membership test against a broadcast bloom bitmap
    (``ray.put`` once; zero-copy read per worker). Emits the same
    ``contaminated`` column shape as :class:`DecontaminateStage`."""

    def __init__(self, bloom_ref, k_words: int = 8, m_bits: int = BLOOM_M_BITS):
        import ray

        raw = ray.get(bloom_ref) if not isinstance(bloom_ref, (bytes, bytearray)) else bloom_ref
        self.bits = np.unpackbits(np.frombuffer(raw, dtype=np.uint8)).astype(bool)
        self.k_words = k_words
        self.m_bits = m_bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        flags = []
        bits = self.bits
        for t in batch["text"].to_pylist():
            hit = False
            for s in _doc_shingles(t, self.k_words):
                if all(bits[p] for p in bloom_positions(s, self.m_bits)):
                    hit = True
                    break
            flags.append(hit)
        return batch.append_column("contaminated", pa.array(flags, type=pa.bool_()))


# --- PII scrubbing -----------------------------------------------------

# deliberately simple patterns shared verbatim with the DuckDB oracle
# (regexp dialects agree on this subset)
PII_EMAIL = r"[a-zA-Z0-9_.]+@[a-zA-Z0-9_.]+"
PII_PHONE = r"\+?[0-9][0-9\-]{7,14}[0-9]"


def scrub_pii_batch(batch: pa.Table) -> pa.Table:
    """Redact emails/phones; emits the scrubbed text plus per-doc
    redaction counts (the audit trail a compliance pipeline needs)."""
    email_re = re.compile(PII_EMAIL)
    phone_re = re.compile(PII_PHONE)
    texts, n_emails, n_phones = [], [], []
    for t in batch["text"].to_pylist():
        t2, ne = email_re.subn("<EMAIL>", t)
        t3, np_ = phone_re.subn("<PHONE>", t2)
        texts.append(t3)
        n_emails.append(ne)
        n_phones.append(np_)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "text": pa.array(texts, type=pa.large_string()),
            "n_emails": pa.array(n_emails, type=pa.int64()),
            "n_phones": pa.array(n_phones, type=pa.int64()),
        }
    )


# --- chunking ----------------------------------------------------------


def chunk_batch(batch: pa.Table, chunk_words: int = 64, overlap: int = 8) -> pa.Table:
    """Split docs into overlapping word-window chunks (training-sample
    prep). flat-map shape: one input doc → ⌈n/(chunk-overlap)⌉ rows with
    (doc_id, chunk_idx, chunk_text, n_words)."""
    doc_ids, chunk_idxs, chunks, sizes = [], [], [], []
    step = chunk_words - overlap
    for doc_id, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        words = t.split(" ")
        if not words:
            continue
        i = 0
        idx = 0
        while i < len(words):
            piece = words[i : i + chunk_words]
            doc_ids.append(doc_id)
            chunk_idxs.append(idx)
            chunks.append(" ".join(piece))
            sizes.append(len(piece))
            if i + chunk_words >= len(words):
                break
            i += step
            idx += 1
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "chunk_idx": pa.array(chunk_idxs, type=pa.int64()),
            "chunk_text": pa.array(chunks, type=pa.large_string()),
            "n_words": pa.array(sizes, type=pa.int64()),
        }
    )


# --- repetition filter -------------------------------------------------


def repetition_stats_batch(batch: pa.Table, ngram: int = 3) -> pa.Table:
    """Gopher-style within-doc repetition signal: fraction of word
    n-grams that are duplicates of an earlier occurrence."""
    doc_ids, fracs = [], []
    for doc_id, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        words = t.split(" ")
        total = max(0, len(words) - ngram + 1)
        if total == 0:
            frac = 0.0
        else:
            seen = set()
            dup = 0
            for i in range(total):
                g = tuple(words[i : i + ngram])
                if g in seen:
                    dup += 1
                else:
                    seen.add(g)
            frac = dup / total
        doc_ids.append(doc_id)
        fracs.append(frac)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "dup_ngram_frac": pa.array(fracs, type=pa.float64()),
        }
    )


def bigram_count_partial_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial bigram counts (combiner form, like
    ``word_count_partial_batch``): fan-in per bigram is bounded by the
    block count, so the downstream groupby moves ≤ |distinct bigrams| ×
    blocks rows, never corpus-sized data."""
    counts: dict[str, int] = {}
    for t in batch["text"].to_pylist():
        ws = t.split(" ")
        for i in range(len(ws) - 1):
            g = ws[i] + " " + ws[i + 1]
            counts[g] = counts.get(g, 0) + 1
    grams = sorted(counts)
    return pa.table(
        {
            "bigram": pa.array(grams, type=pa.string()),
            "partial": pa.array([counts[g] for g in grams], type=pa.int64()),
        }
    )


def top_bigrams(docs_ds, min_count: int = 2):
    """Global bigram-frequency table (phrase-mining / tokenizer-merge
    prep shape): combiner partials → groupby sum → count filter."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from kazu_ray.ops.dedup import shuffle_parts

    partials = docs_ds.map_batches(bigram_count_partial_batch, batch_format="pyarrow")
    agg = partials.repartition(shuffle_parts()).groupby("bigram").aggregate(
        Sum("partial", alias_name="n")
    )
    if min_count > 1:
        agg = agg.map_batches(
            lambda t: t.filter(pc.greater_equal(t["n"], min_count)),
            batch_format="pyarrow",
        )
    return agg


def _doc_kgrams(text: str, k_words: int) -> list[str]:
    ws = text.split(" ")
    return [" ".join(ws[i : i + k_words]) for i in range(len(ws) - k_words + 1)]


def dup_shingle_stats(docs_ds, k_words: int = 3, min_docs: int = 2):
    """Cross-document duplicated-span statistics (the signal behind
    exact-substring training-data dedup, Lee et al. 2021 "Deduplicating
    Training Data Makes Language Models Better"): for every doc, how
    many of its word ``k_words``-grams also appear in ≥ ``min_docs``
    distinct documents corpus-wide.

    Two streaming passes: (1) per-doc DISTINCT shingles → combiner
    partial doc-counts → groupby sum → the duplicated-shingle set,
    which is bounded by the number of *repeated* spans, not corpus
    size, and is broadcast once via ``ray.put``; (2) re-scan the corpus
    counting membership. At 100-TB scale pass 1's collected set would
    move behind the bloom-filter machinery (``build_bloom``) with the
    same two-pass shape; here the exact set keeps the DuckDB oracle
    bit-exact."""
    import ray
    from ray.data.aggregate import Sum

    from kazu_ray.ops.dedup import shuffle_parts

    def distinct_partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch["text"].to_pylist():
            for g in set(_doc_kgrams(t, k_words)):
                counts[g] = counts.get(g, 0) + 1
        grams = sorted(counts)
        return pa.table(
            {
                "shingle": pa.array(grams, type=pa.string()),
                "partial": pa.array([counts[g] for g in grams], type=pa.int64()),
            }
        )

    dup = (
        docs_ds.map_batches(distinct_partial, batch_format="pyarrow")
        .repartition(shuffle_parts())
        .groupby("shingle")
        .aggregate(Sum("partial", alias_name="n_docs"))
        .filter(lambda r: r["n_docs"] >= min_docs)
    )
    dup_set = frozenset(dup.to_pandas()["shingle"])
    dup_ref = ray.put(dup_set)

    def membership(batch: pa.Table) -> pa.Table:
        banned = ray.get(dup_ref)
        doc_ids, totals, dups = [], [], []
        for doc_id, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            grams = _doc_kgrams(t, k_words)
            doc_ids.append(doc_id)
            totals.append(len(grams))
            dups.append(sum(1 for g in grams if g in banned))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "n_shingles": pa.array(totals, type=pa.int64()),
                "n_dup_shingles": pa.array(dups, type=pa.int64()),
            }
        )

    return docs_ds.map_batches(membership, batch_format="pyarrow")


# --- the end-to-end training-corpus cleaning funnel ----------------------


class FunnelFlagsStage:
    """One corpus pass → a narrow per-doc flag table: everything the
    training-corpus funnel consumes (language prediction, quality
    counts, content hash, benchmark contamination) computed TOGETHER so
    the corpus text streams exactly once. Actor-pool stage: the
    language tables and the benchmark shingle set build once per worker
    (``__init__``)."""

    def __init__(self, benchmark_texts: tuple):
        self._lang = LangIdStage()
        self._decon = DecontaminateStage(benchmark_texts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lang = self._lang(batch)["lang_pred"]
        q = quality_batch(batch)
        cont = self._decon(batch)["contaminated"]
        h = pa.array(
            [
                hashlib.md5(t.encode()).hexdigest()
                for t in batch["text"].to_pylist()
            ],
            type=pa.string(),
        )
        p_lang = pc.equal(lang, "en")
        p_q = pc.and_(
            pc.greater_equal(q["n_words"], 30),
            pc.greater_equal(q["n_stopwords"], 3),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "h": h,
                "p_lang": p_lang,
                "p_q": p_q,
                "contaminated": cont,
            }
        )


def training_corpus_funnel(docs_ds, benchmark_texts: tuple):
    """The canonical LLM training-data cleaning pipeline, end-to-end,
    with per-stage survivor counts (the "funnel" report every data
    curation writeup publishes)::

        0 raw            → every document
        1 lang_en        → language-ID predicts English
        2 quality        → C4-style gate (≥30 words, ≥3 stopwords)
        3 exact_dedup    → keep-min-doc_id per identical md5(text),
                           computed AMONG stage-2 survivors (a doc
                           removed upstream cannot claim a keep slot)
        4 decontaminated → kept doc shares no 8-word shingle with the
                           benchmark set

    Returns (stage_idx, stage, n_docs) — 5 rows, all-integer so the SQL
    oracle is hash-exact.

    Shapes: ONE streaming pass over the corpus text
    (:class:`FunnelFlagsStage`, actor pool) emits a narrow flags table
    (~1% of corpus bytes — doc_id, md5, three booleans) which is
    materialized to the object store (spillable) and reused by every
    stage; stage counts 0-2 are per-batch partial sums (blocks×1 rows
    to the driver); the dedup keep is a hash-keyed exchange on the md5
    (:func:`~kazu_ray.ops.exchange.exchange_groups` — each bucket
    resolves its groups' min-doc winners vectorized and emits TWO
    integers), so nothing doc-sized is ever collected or globally
    sorted. Duplicate groups never straddle buckets (hash co-location
    on the full key)."""
    import pandas as pd

    from kazu_ray.ops.dedup import shuffle_parts
    from kazu_ray.ops.exchange import exchange_groups

    flags = docs_ds.map_batches(
        FunnelFlagsStage,
        fn_constructor_args=(tuple(benchmark_texts),),
        batch_format="pyarrow",
        concurrency=(1, 4),
    ).materialize()

    def count_partial(t: pa.Table) -> pa.Table:
        pl = t["p_lang"].to_numpy(zero_copy_only=False).astype(bool)
        pq_ = t["p_q"].to_numpy(zero_copy_only=False).astype(bool)
        return pa.table(
            {
                "n_raw": pa.array([t.num_rows], type=pa.int64()),
                "n_lang": pa.array([int(pl.sum())], type=pa.int64()),
                "n_q": pa.array([int((pl & pq_).sum())], type=pa.int64()),
            }
        )

    c = flags.map_batches(count_partial, batch_format="pyarrow").to_pandas().sum()

    survivors = flags.map_batches(
        lambda t: t.filter(pc.and_(t["p_lang"], t["p_q"])).select(
            ["h", "doc_id", "contaminated"]
        ),
        batch_format="pyarrow",
    )

    def bucket_keep_min(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        keep = df.sort_values(["h", "doc_id"], kind="mergesort").drop_duplicates(
            "h", keep="first"
        )
        return pa.table(
            {
                "n_kept": pa.array([len(keep)], type=pa.int64()),
                "n_clean": pa.array(
                    [int((~keep["contaminated"].astype(bool)).sum())],
                    type=pa.int64(),
                ),
            }
        )

    empty = pa.table(
        {
            "n_kept": pa.array([], type=pa.int64()),
            "n_clean": pa.array([], type=pa.int64()),
        }
    )
    kept = exchange_groups(
        survivors, ["h"], shuffle_parts(), bucket_keep_min, empty
    ).to_pandas().sum()

    return pd.DataFrame(
        {
            "stage_idx": np.arange(5, dtype=np.int64),
            "stage": [
                "raw",
                "lang_en",
                "quality",
                "exact_dedup",
                "decontaminated",
            ],
            "n_docs": np.array(
                [
                    c["n_raw"],
                    c["n_lang"],
                    c["n_q"],
                    kept.get("n_kept", 0),
                    kept.get("n_clean", 0),
                ],
                dtype=np.int64,
            ),
        }
    )
