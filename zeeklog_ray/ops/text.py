"""Text-analysis operators over a document table (vectorized map_batches).

Operators a large-scale training-data pipeline needs on every document:
language ID (character n-gram heuristic), quality scoring (length /
punctuation / stopword ratios), token counting (whitespace + BPE-ish regex),
and document fingerprinting (rolling hash).  All per-row work is pandas/numpy
vectorized; stateful pieces (compiled regexes, n-gram profiles) live in
callable classes so Ray runs them as actor pools with one-time setup.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

import ray.data

STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "pour", "dans"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "por", "para"},
}

# Integer 1e-4 fixed-point ratios (floor) keep outputs float-free so oracle
# comparisons are exact (same policy as relational.py).
_E4 = 10_000


def _floor_e4(num: pd.Series, den: pd.Series) -> pd.Series:
    den = den.replace(0, 1)
    return np.floor(num * _E4 / den).astype("int64")


def quality_metrics(ds: "ray.data.Dataset", text_col: str = "text",
                    id_col: str = "doc_id") -> "ray.data.Dataset":
    """Per-document quality features: word count, average word length,
    punctuation ratio, English-stopword ratio (all int64 / 1e-4 fixed point).

    Every feature is expressible in SQL (string_split + list_filter), so the
    whole operator is oracle-checked.
    """
    en_stop = frozenset(STOPWORDS["en"])

    def feats(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[text_col].reset_index(drop=True)
        n_chars = text.str.len().astype("int64")
        # words = space-separated non-empty tokens, matching the oracle's
        # STRING_SPLIT(text, ' ') exactly (NOT regex \S+, which differs on
        # tab/newline whitespace)
        n_words = text.str.count(r"[^ ]+").astype("int64")
        n_nonspace = (n_chars - text.str.count(" ")).astype("int64")
        # (?a) → ASCII word/space classes, matching DuckDB RE2 semantics on
        # non-ASCII letters
        n_punct = text.str.count(r"(?a)[^\w\s]").astype("int64")
        n_stop = pd.Series(
            _member_counts(text.str.split(" "), en_stop, len(text)))
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_chars": n_chars,
            "n_words": n_words,
            "avg_word_len_e4": _floor_e4(n_nonspace, n_words),
            "punct_ratio_e4": _floor_e4(n_punct, n_chars),
            "stopword_ratio_e4": _floor_e4(n_stop, n_words),
        })

    return ds.map_batches(feats, batch_format="pandas", batch_size=None)


def _member_counts(words: pd.Series, vocab: frozenset, n: int) -> np.ndarray:
    """Per-row count of words that are in ``vocab`` — vectorized via one
    explode + isin + bincount (no Python loop over rows or words).
    ``words`` must be positionally indexed (0..n-1)."""
    ex = words.explode()
    valid = ex.notna()
    if not valid.any():
        return np.zeros(n, dtype="int64")
    exv = ex[valid]
    rows = exv.index.to_numpy().astype(np.int64)
    hit = exv.isin(vocab).to_numpy()
    return np.bincount(rows[hit], minlength=n).astype("int64")


class LangId:
    """Language-ID heuristic: score each language by stopword hit-rate over
    the document's words; emit the argmax (ties → alphabetical first).

    Callable class → actor pool; the per-language word sets are built once
    per actor (the reference's ST3 compiled-table pattern,
    /root/reference/src/zeek/zeek_log.rs:82-95 — state built once, applied
    per record).
    """

    def __init__(self) -> None:
        self.langs = sorted(STOPWORDS)
        self.sets = {k: frozenset(v) for k, v in STOPWORDS.items()}
        self.word_re = re.compile(r"[a-zA-Zäöüßéèàùâêîôûñ]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        words = batch["text"].reset_index(drop=True) \
            .str.lower().str.findall(self.word_re)
        # one explode + per-language isin/bincount — vectorized scoring,
        # no Python loop over rows or words
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        ex = words.explode()
        exv = ex[ex.notna()]
        if len(exv):
            rows = exv.index.to_numpy().astype(np.int64)
            for j, lang in enumerate(self.langs):
                hit = exv.isin(self.sets[lang]).to_numpy()
                scores[:, j] = np.bincount(rows[hit], minlength=n)
        top = scores.max(axis=1)
        # argmax takes the FIRST max → alphabetical tie-break (langs sorted)
        pred = np.asarray(self.langs, dtype=object)[scores.argmax(axis=1)]
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "lang_pred": np.where(top > 0, pred, "unknown"),
        })


def lang_id(ds: "ray.data.Dataset", concurrency=(1, 4)) -> "ray.data.Dataset":
    return ds.map_batches(LangId, batch_format="pandas", batch_size=None,
                          concurrency=concurrency)


_BPE_RE = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"


def token_counts(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """BPE-ish token counting: words, digit runs (≤3), punctuation marks —
    the pre-tokenizer split of GPT-style BPE (regexp count, vectorized)."""

    def count(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_bpe_tokens": batch["text"].str.count(_BPE_RE).astype("int64"),
        })

    return ds.map_batches(count, batch_format="pandas", batch_size=None)


def normalize_text(ds: "ray.data.Dataset", col: str = "text",
                   out: str = "text_norm", *, nfc: bool = True,
                   lower: bool = True, collapse_ws: bool = True,
                   strip: bool = True) -> "ray.data.Dataset":
    """Text canonicalization — the pass every corpus pipeline runs BEFORE
    dedup/fingerprinting so byte-level variants of the same content
    collide: Unicode NFC (combining sequences → precomposed), lowercase,
    ASCII-whitespace-run collapse to one space, edge strip.

    Row-local ``map_batches``, no shuffle: one streaming pass at any
    scale.  ``unicodedata.normalize`` is a per-string C call (the ASCII
    fast path is O(1)-ish); the case/whitespace steps are pandas string
    kernels.

    Oracle parity (pinned empirically, tests/test_ops_text.py): NFC,
    lower, ``[ \\t\\n\\r\\f\\v]+`` collapse and space-strip all match
    DuckDB ``lower(nfc_normalize(..))`` + ``regexp_replace`` +
    ``trim(.., ' ')`` EXCEPT two documented divergences — Python
    lowercases final-position Σ contextually to ς and expands İ to
    ``i\\u0307`` (DuckDB: plain σ / bare i).  Queries gated by the DuckDB
    oracle must not feed those two code points."""
    import re
    import unicodedata

    ws_re = re.compile(r"[ \t\n\r\f\v]+", re.ASCII)

    def norm(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[col]
        if nfc:
            s = pd.Series(
                [None if t is None else unicodedata.normalize("NFC", t)
                 for t in s],
                index=s.index, dtype="object")
        if lower:
            s = s.str.lower()
        if collapse_ws:
            s = s.str.replace(ws_re, " ", regex=True)
        if strip:
            s = s.str.strip(" ")
        batch = batch.copy()
        batch[out] = s
        return batch

    return ds.map_batches(norm, batch_format="pandas", batch_size=None)


def prep_digest_stage(attr_col: str, min_words: int = 15,
                      min_stop_ratio_e4: int = 200):
    """The shared ROW-LOCAL stage of the corpus-prep family (one source of
    truth for :func:`corpus_prep` and ``prep.prep_manifest``): quality
    metrics + filter + 128-bit content digest + BPE-ish token count,
    carrying ``attr_col`` (lang / source / …) through.  Returns a
    ``map_batches``-ready callable emitting
    ``(h1, h2, doc_id, attr_col, n_bpe)`` — the only stage that touches
    text; everything downstream moves scalars."""
    import numpy as np

    en_stop = frozenset(STOPWORDS["en"])

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].reset_index(drop=True)
        n_words = text.str.count(r"[^ ]+").astype("int64")
        n_stop = pd.Series(_member_counts(text.str.split(" "), en_stop,
                                          len(text)))
        ratio_e4 = np.floor(n_stop * _E4 /
                            n_words.replace(0, 1)).astype("int64")
        keep = ((n_words >= min_words) &
                (ratio_e4 >= min_stop_ratio_e4)).to_numpy()
        kept = text[keep]
        # 128-bit content digest (two independent 64-bit hashes — the
        # exact_dedup_docs collision argument)
        h1 = pd.util.hash_pandas_object(kept, index=False).astype("uint64")
        h2 = pd.util.hash_pandas_object(
            kept, index=False, hash_key="zeeklog-dedup-02").astype("uint64")
        return pd.DataFrame({
            "h1": h1.to_numpy(), "h2": h2.to_numpy(),
            "doc_id": batch["doc_id"].to_numpy()[keep],
            attr_col: batch[attr_col].to_numpy()[keep],
            "n_bpe": kept.str.count(_BPE_RE).astype("int64").to_numpy()})

    return prep


def digest_dedup(prepped: "ray.data.Dataset", attr_col: str,
                 num_buckets: int = 2048) -> "ray.data.Dataset":
    """First-wins exact dedup on the 128-bit content digest, shared by the
    prep chains: MIN over every carried attribute per (h1, h2) group
    (algebraic — ``n_bpe`` is constant per content group; for identical
    texts with different ``attr_col`` values this keeps MIN(attr), by
    design: Min vectorizes where arg-min would pay per-group Python).

    Bucketed on ``h1 % num_buckets`` so the per-group Python cost is paid
    per BUCKET (measured 189 s → 17 s at 1M docs); same h1 ⇒ same bucket
    keeps every copy co-located.  Output drops the digests:
    ``(doc_id, attr_col, n_bpe)``.

    Bucket sizing (measured at 1M docs / 32 CPUs: 2048 buckets 7.3 s,
    512 5.6 s, 64 9.1 s): past ~4×CPUs buckets the wall is the shuffle
    itself, below it stragglers dominate — target ≥ ~2k digests per
    bucket and at least a few buckets per CPU; the conservative default
    serves the corpus scale this is designed for, tune DOWN for small
    inputs."""
    import numpy as np

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["_bucket"] = (batch["h1"] %
                            np.uint64(num_buckets)).astype("int64")
        return batch

    def dedup_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(["h1", "h2"], sort=False)
        return g.agg(doc_id=("doc_id", "min"), **{attr_col: (attr_col, "min")},
                     n_bpe=("n_bpe", "min")).reset_index() \
            .drop(columns=["h1", "h2"])

    return (prepped.map_batches(bucketize, batch_format="pandas",
                                batch_size=None)
            .groupby("_bucket").map_groups(dedup_bucket,
                                           batch_format="pandas"))


def corpus_prep(ds: "ray.data.Dataset", min_words: int = 15,
                min_stop_ratio_e4: int = 200,
                num_buckets: int = 2048) -> "ray.data.Dataset":
    """Training-corpus preparation CHAIN: quality filter → exact dedup
    (first-wins by content) → BPE token count → per-language rollup.
    Output: one row per language — ``lang, n_docs, sum_bpe_tokens``.

    Scale shape: one map stage does metrics + filter + 128-bit digest +
    token count (all row-local, before any shuffle); only
    (h1, h2, doc_id, lang, n_bpe) shuffles — never text; the dedup is a
    BUCKETED groupby (below); the rollup is the combiner-first
    :func:`zeeklog_ray.relational.grouped_sum`.

    Group semantics: each content group keeps MIN(doc_id), and the
    group's language is MIN(lang) over its members (``n_bpe`` is a pure
    function of the text, hence constant per group).  For identical texts
    labelled with different languages this differs from keep-the-min-row
    arg-min semantics by design — Min is algebraic and vectorizes; argmin
    would force per-group Python.

    Dedup mechanics: digest-count groups ≈ distinct docs, and BOTH Ray
    grouped paths pay Python per group (`map_groups` ~2.7 ms/group,
    `aggregate(Min)` ~0.19 ms/group — measured 189 s for 1M docs), so the
    digests are hash-BUCKETED first (`h1 % num_buckets`) and each bucket
    dedups with one C-level pandas groupby: the shuffle still co-locates
    every copy of a digest (same h1 ⇒ same bucket), but the per-group
    Python cost is paid per BUCKET instead of per document.  Measured:
    189 s → 17 s for 1M docs (58k docs/s).  Size ``num_buckets`` so a
    bucket fits one task's memory (see relational.with_hash_bucket).
    """
    from zeeklog_ray.relational import grouped_sum

    prepped = ds.map_batches(
        prep_digest_stage("lang", min_words=min_words,
                          min_stop_ratio_e4=min_stop_ratio_e4),
        batch_format="pandas", batch_size=None)
    deduped = digest_dedup(prepped, "lang", num_buckets=num_buckets)
    return grouped_sum(deduped.select_columns(["lang", "n_bpe"]), ["lang"],
                       sums={"n_bpe": "sum_bpe_tokens"}, count_as="n_docs")


_FP_BASE = 1_000_003
_FP_MOD = (1 << 61) - 1


def rolling_kgram_hashes(data: np.ndarray, k: int = 8) -> np.ndarray:
    """Vectorized polynomial rolling hash of every k-byte window of ``data``
    (uint8) — k shift-and-add passes over the whole array, no per-row loop.
    Arithmetic in uint64 (mod 2^64), deterministic everywhere."""
    v = data.astype(np.uint64)
    n = len(v) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    h = np.zeros(n, dtype=np.uint64)
    base = np.uint64(_FP_BASE)
    for j in range(k):
        h = h * base + v[j:j + n]
    return h


def fingerprints(ds: "ray.data.Dataset", text_col: str = "text",
                 k: int = 8) -> "ray.data.Dataset":
    """Rolling-hash document fingerprint: min k-gram hash per document
    (winnowing-style), int64.

    Deterministic across processes (fixed base, uint64 arithmetic, no
    PYTHONHASHSEED dependence) so fingerprints computed on different nodes
    agree — the property distributed dedup relies on.  Fully vectorized:
    one concatenated byte array per batch, k shift-and-add passes, then a
    per-document min over window slices via ``np.minimum.reduceat``.
    """

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        enc = batch[text_col].str.encode("utf-8")
        lengths = enc.str.len().to_numpy()
        data = np.frombuffer(b"".join(enc.to_numpy()), dtype=np.uint8)
        offsets = np.zeros(len(batch) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        win = rolling_kgram_hashes(data, k)
        out = np.zeros(len(batch), dtype=np.uint64)
        # valid windows for doc i: [offsets[i], offsets[i+1]-k]; docs
        # shorter than k get fingerprint 0
        starts = offsets[:-1]
        ends = offsets[1:] - (k - 1)
        ok = ends > starts
        if ok.any() and len(win):
            # reduceat over [start_i, start_{i+1}) would include cross-doc
            # windows; mask those to MAX so the per-doc min ignores them
            valid = np.zeros(len(win) + 1, dtype=np.int64)
            np.add.at(valid, np.minimum(starts[ok], len(win)), 1)
            np.add.at(valid, np.minimum(ends[ok], len(win)), -1)
            mask = np.cumsum(valid[:-1]) > 0
            win_masked = np.where(mask, win, np.uint64(0xFFFFFFFFFFFFFFFF))
            out[ok] = np.minimum.reduceat(win_masked, starts[ok])
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "fingerprint": out.astype(np.int64)})

    return ds.map_batches(fp, batch_format="pandas", batch_size=None)


def top_terms_per_source(ds: "ray.data.Dataset",
                         source_counts: dict[str, int],
                         text_col: str = "text",
                         source_col: str = "source",
                         doc_col: str = "doc_id",
                         k: int = 10) -> "ray.data.Dataset":
    """Top-k characteristic terms per source by a LINEAR-idf tf-idf.

    Terms are lowercase ``[a-z0-9]+`` runs.  Per (source, term):
    ``tf`` = total occurrences, ``df`` = documents containing the term,
    and ``score_e4 = (tf * n_docs(source) * 10^4) // df`` — linear idf
    (tf·N/df) in EXACT integer arithmetic so the DuckDB oracle matches
    bit-for-bit; log-idf would drag floats into the hash compare for no
    ranking benefit at fixed N (float policy, relational.py).

    Shuffle shape: the explode happens inside ``map_batches`` and each
    batch emits per-(source, term) PARTIALS — ``tf`` as a count and ``df``
    as a within-batch doc count (docs are rows, so batches partition docs
    and the partials sum exactly).  Only (source, term, tf, df) rows cross
    the wire, never term streams.  The final combine inherits
    ``grouped_sum``'s one-block assumption — fine while distinct
    (source, term) fits a block; shard by term hash first at web scale.

    ``source_counts`` (docs per source) is computed by the caller — a tiny
    separate aggregate — and broadcast into the scoring stage.
    """
    from zeeklog_ray.relational import grouped_sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        terms = batch[text_col].str.lower().str.findall(r"[a-z0-9]+")
        e = pd.DataFrame({source_col: batch[source_col],
                          doc_col: batch[doc_col],
                          "term": terms}).explode("term")
        e = e.dropna(subset=["term"])
        return (e.groupby([source_col, "term"], sort=False)
                .agg(tf=(doc_col, "size"), df=(doc_col, "nunique"))
                .reset_index())

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=None)
    combined = grouped_sum(partials, [source_col, "term"],
                           sums={"tf": "tf", "df": "df"})

    nd = dict(source_counts)

    def score_and_rank(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch[source_col].map(nd).astype("int64")
        batch = batch.assign(
            score_e4=(batch["tf"].astype("int64") * n * 10_000)
            // batch["df"].astype("int64"))
        batch = batch.sort_values(["score_e4", "term"],
                                  ascending=[False, True], kind="mergesort")
        out = batch.groupby(source_col, sort=False).head(k)
        return out[[source_col, "term", "tf", "df", "score_e4"]]

    # combined is a single block (grouped_sum contract), so the per-source
    # head(k) sees every term of a source in one batch
    return combined.map_batches(score_and_rank, batch_format="pandas",
                                batch_size=None)


def df_census(ds: "ray.data.Dataset", text_col: str = "text",
              id_col: str = "doc_id") -> "ray.data.Dataset":
    """Corpus-wide DOCUMENT FREQUENCY census of space-split tokens:
    one row per distinct token with the number of documents containing
    it.  Tokenization is exactly ``string_split(text, ' ')`` (empties
    included) so the SQL replay is bit-exact.

    Shuffle shape: each batch emits per-token PARTIAL doc counts
    (explode → within-batch (doc, token) distinct → size) — batches
    partition documents, so partials sum exactly; only
    ``(token, df)`` rows cross the wire, never token streams.  The
    final combine is the combiner-first ``grouped_sum`` (vocabulary
    must fit one block — true for natural-language vocabularies;
    shard by token hash first at web scale).
    """
    from zeeklog_ray.relational import grouped_sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # integer-code census (ops/wordhash, keep_empty=True — the
        # plain-STRING_SPLIT contract): per-doc distinct via packed
        # (row, code) np.unique, then df per code with bincount; token
        # strings materialize only for the distinct output rows
        from zeeklog_ray.ops.wordhash import split_words

        batch = batch.reset_index(drop=True)
        doc_of, flat = split_words(batch[text_col], keep_empty=True)
        if not len(doc_of):
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "df": pd.Series([], dtype="int64")})
        de = flat.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = de.dictionary.to_numpy(zero_copy_only=False)
        n_uniq = np.int64(len(vocab))
        pk = np.unique(doc_of * n_uniq + codes)
        df_counts = np.bincount((pk % n_uniq).astype(np.int64),
                                minlength=len(vocab))
        return pd.DataFrame({"token": vocab,
                             "df": df_counts.astype("int64")})

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=None)
    return grouped_sum(partials, ["token"], sums={"df": "df"})


def df_token_scrub(ds: "ray.data.Dataset", frequent: "frozenset[str]",
                   text_col: str = "text", id_col: str = "doc_id"
                   ) -> "ray.data.Dataset":
    """Data-driven boilerplate removal: drop every token that is in the
    ``frequent`` set (discovered by :func:`df_census` — tokens present
    in more than a threshold fraction of documents) and re-join the
    survivors with single spaces, preserving order.  The line-level
    analog (split on newline, scrub lines shared by many documents) is
    the same operator with a different separator — this corpus is
    single-line, so the registry exercises the token granularity.

    Row-local ``map_batches`` over a BROADCAST frequent set (tiny by
    construction: only tokens above the df threshold ride the closure);
    no shuffle.  Vectorized: one explode + isin mask + bincount for the
    removal counts; the per-document re-join is one C-allocated
    ``str.join`` call per doc (O(docs) Python calls, not O(tokens)).

    Output: ``(id_col, n_removed, text_clean)``; documents whose every
    token is scrubbed yield ``text_clean = ''``.
    """

    def scrub(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        toks = batch[text_col].reset_index(drop=True).str.split(" ")
        ex = toks.explode()
        rows = ex.index.to_numpy().astype(np.int64)
        drop = ex.isin(frequent).to_numpy()
        n_removed = np.bincount(rows[drop], minlength=n).astype("int64")
        kept = ex[~drop]
        joined = kept.groupby(level=0).agg(" ".join)
        clean = joined.reindex(range(n), fill_value="")
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_removed": n_removed,
            "text_clean": clean.to_numpy(),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        scrub, batch_format="pandas", batch_size=None)


def term_scrub(ds: "ray.data.Dataset", terms: "list[str]",
               replacement: str = "<TERM>", text_col: str = "text",
               id_col: str = "doc_id") -> "ray.data.Dataset":
    """Blocklist redaction: replace every whole-word occurrence of
    ``terms`` with ``replacement`` and count the redactions — the
    PII-scrub operator shape (on real data the compiled pattern is an
    email/phone/SSN alternation; the plumbing is identical).

    Row-local ``map_batches`` (no shuffle); the alternation is compiled
    once per pattern object and applied via pandas' C string loop
    (``str.count`` + ``str.replace``).  Word boundaries are regex ``\\b``
    — RE2 (DuckDB) and Python ``re`` agree on them over ASCII, which is
    what makes the SQL replay exact.

    Output: ``(id_col, n_redactions, text_clean)``.
    """
    import re

    if not terms:
        raise ValueError("term_scrub: empty blocklist")
    pat = re.compile(r"\b(?:" + "|".join(re.escape(t) for t in terms) + r")\b")

    def scrub(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col]
        return pd.DataFrame({
            id_col: batch[id_col],
            "n_redactions": s.str.count(pat).astype("int64"),
            "text_clean": s.str.replace(pat, replacement, regex=True),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        scrub, batch_format="pandas", batch_size=None)


def tfidf_top_terms(docs: "ray.data.Dataset", k: int = 3,
                    n_docs: int | None = None,
                    text_col: str = "text", id_col: str = "doc_id",
                    num_buckets: int = 1024,
                    broadcast_vocab: int = 2_000_000) -> "ray.data.Dataset":
    """Per-document top-``k`` terms by TF-IDF with a linear idf
    (``score_ppm = tf · 10^6 · N // (n_words · df)``) — integer-exact end
    to end, so the DuckDB replay hash-matches; the ``log``-idf variant
    would differ in the last ulp between libm implementations.

    Shape at scale (the point of the design):

    * term-frequency extraction is ROW-LOCAL — a document lives entirely
      in its row, so ``(doc, word, tf, n_words)`` long rows come out of
      one ``map_batches`` pass with no shuffle;
    * document frequency is an ENTITY-shaped grouped count over the long
      table (``grouped_sum_bucketed`` on ``word`` — vocab cardinality,
      stays distributed);
    * the long table attaches ``df`` tiered: vocab ≤ ``broadcast_vocab``
      broadcasts once (row-local merge, the common case); a 10^8-term
      web-scale vocab falls back to a bucketed equi-join on ``word``;
    * the final per-doc top-k is the bucketed-groupby pattern
      (:func:`zeeklog_ray.relational.with_hash_bucket` sizing rule).

    Ties break by word ascending (deterministic on both sides).  Output:
    ``(doc_id, rank, word, tf, score_ppm)``, rank 1..k.
    """
    from zeeklog_ray.relational import (
        bucketed_equi_join,
        grouped_sum_bucketed,
        with_hash_bucket,
    )

    if n_docs is None:
        n_docs = docs.count()

    def doc_terms(batch: pd.DataFrame) -> pd.DataFrame:
        # integer-code census (ops/wordhash): (doc, word) pairs pack into
        # one int64 (row·|vocab| + code) and count via np.unique — no
        # object-string groupby in the hot path
        from zeeklog_ray.ops.wordhash import split_word_codes

        batch = batch.reset_index(drop=True)
        doc_of, codes, vocab = split_word_codes(batch[text_col])
        if not len(codes):
            return pd.DataFrame({
                id_col: pd.Series([], dtype=batch[id_col].dtype),
                "word": pd.Series([], dtype=object),
                "tf": pd.Series([], dtype="int64"),
                "n_words": pd.Series([], dtype="int64")})
        n_uniq = np.int64(len(vocab))
        pk, tf = np.unique(doc_of * n_uniq + codes, return_counts=True)
        rows = (pk // n_uniq).astype(np.int64)
        n_words_doc = np.bincount(doc_of, minlength=len(batch))
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy()[rows],
            "word": vocab[(pk % n_uniq).astype(np.int64)],
            "tf": tf.astype("int64"),
            "n_words": n_words_doc[rows].astype("int64"),
        })

    long = docs.select_columns([id_col, text_col]).map_batches(
        doc_terms, batch_format="pandas", batch_size=None).materialize()
    # (doc, word) rows are unique by construction → df = rows per word
    df = grouped_sum_bucketed(long.select_columns(["word"]), ["word"],
                              count_as="df",
                              num_buckets=num_buckets).materialize()
    # TIERED df attachment: a vocabulary up to broadcast_vocab entries
    # broadcasts once via ray.put (row-local merge, big side never
    # shuffles); a 10^8-term web-scale vocab falls back to the
    # partitioned bucketed equi-join
    if df.count() <= broadcast_vocab:
        from zeeklog_ray.relational import broadcast_merge

        joined = broadcast_merge(long, df.to_pandas(), on="word")
    else:
        joined = bucketed_equi_join(long, df, on="word",
                                    num_buckets=num_buckets)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        batch["score_ppm"] = (batch["tf"] * 1_000_000 * n_docs) \
            // (batch["n_words"] * batch["df"])
        return batch[[id_col, "word", "tf", "score_ppm"]]

    scored = joined.map_batches(score, batch_format="pandas", batch_size=None)

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        # partial top-k BEFORE the shuffle: any true top-k row of a doc
        # is top-k within its own block, so per-block head(k) is a safe
        # superset even if a doc's rows straddle blocks — the exchange
        # shrinks from |doc·term| rows to ≤ k per (doc, block)
        g = batch.sort_values([id_col, "score_ppm", "word"],
                              ascending=[True, False, True],
                              kind="mergesort")
        return g.groupby(id_col, sort=False).head(k)

    pruned = scored.map_batches(prune, batch_format="pandas",
                                batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "score_ppm", "word"],
                          ascending=[True, False, True], kind="mergesort")
        g["rank"] = (g.groupby(id_col, sort=False).cumcount() + 1).astype("int64")
        return g[g["rank"] <= k][[id_col, "rank", "word", "tf", "score_ppm"]]

    return with_hash_bucket(pruned, id_col, num_buckets) \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def source_distribution_tv(docs: "ray.data.Dataset", k: int = 50,
                           text_col: str = "text",
                           source_col: str = "source",
                           num_buckets: int = 1024) -> pd.DataFrame:
    """Data-mixture diagnostics: pairwise TOTAL-VARIATION distance (ppm,
    fixed point) between the per-source word distributions, restricted
    to the global top-``k`` vocabulary — how different two sources'
    language actually is, the number a mixture designer reads before
    setting sampling rates.

    Scale shape: per-(source, word) counts are one entity-shaped
    bucketed sum (only partial count rows shuffle); the global top-k
    needs the vocabulary-sized word totals once; everything after is a
    k × |sources| table on the driver with exact Python-int arithmetic
    (``tv_ppm = Σ|a_i·N_b − b_i·N_a| · 10^6 // (2·N_a·N_b)`` — the
    products exceed int64 at corpus scale, which is why the finish is
    big-int Python and the oracle HUGEINT).  Output: one row per
    unordered source pair ``(source_a < source_b, tv_ppm)``."""
    from zeeklog_ray.relational import grouped_sum_bucketed, top_k

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        # pre-aggregated (source, word, n) partials — integer-code census
        # (ops/wordhash), same shape as source_distinctive_terms
        from zeeklog_ray.ops.wordhash import split_word_codes

        batch = batch.reset_index(drop=True)  # blocks may carry any index
        doc_of, codes, vocab = split_word_codes(batch[text_col])
        if not len(codes):
            return pd.DataFrame({
                source_col: pd.Series([], dtype=object),
                "word": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64")})
        src_codes, src_uniq = pd.factorize(batch[source_col])
        sc = src_codes.astype(np.int64)[doc_of]
        n_uniq = np.int64(len(vocab))
        pk, c = np.unique(sc * n_uniq + codes, return_counts=True)
        return pd.DataFrame({
            source_col: src_uniq.to_numpy()[(pk // n_uniq).astype(np.int64)],
            "word": vocab[(pk % n_uniq).astype(np.int64)],
            "n": c.astype("int64")})

    long = docs.select_columns([source_col, text_col]).map_batches(
        explode, batch_format="pandas", batch_size=None)
    counts = grouped_sum_bucketed(long, [source_col, "word"],
                                  sums={"n": "n"},
                                  num_buckets=num_buckets).materialize()
    # per-word totals are VOCABULARY-cardinality — entity-shaped bucketed
    # sum (report-shaped grouped_sum would funnel the vocab into one block)
    totals = grouped_sum_bucketed(counts.select_columns(["word", "n"]),
                                  ["word"], sums={"n": "tot"},
                                  num_buckets=num_buckets)
    top = top_k(totals, by=["tot", "word"], descending=[True, False],
                k=k).to_pandas()
    vocab = set(top["word"])

    def keep_top(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["word"].isin(vocab)]

    table = counts.map_batches(keep_top, batch_format="pandas",
                               batch_size=None).to_pandas()
    pivot = table.pivot_table(index="word", columns=source_col, values="n",
                              aggfunc="sum", fill_value=0)
    sources = sorted(pivot.columns)
    n_tot = {s: int(pivot[s].sum()) for s in sources}
    rows = []
    for i, sa in enumerate(sources):
        for sb in sources[i + 1:]:
            na, nb = n_tot[sa], n_tot[sb]
            if na == 0 or nb == 0:
                continue
            acc = sum(abs(int(a) * nb - int(b) * na)
                      for a, b in zip(pivot[sa], pivot[sb]))
            rows.append((sa, sb, acc * 1_000_000 // (2 * na * nb)))
    return pd.DataFrame(rows, columns=["source_a", "source_b", "tv_ppm"]) \
        .astype({"tv_ppm": "int64"})


def repetition_stats(ds: "ray.data.Dataset", text_col: str = "text",
                     id_col: str = "doc_id") -> "ray.data.Dataset":
    """Intra-document repetition features — the Gopher-rules repetition
    filter family (Rae et al. 2021 §A1.1: repetitive documents are
    low-quality even when their surface stats look fine):

    - ``distinct_ratio_e4``  — distinct words / words (low ⇒ repetitive)
    - ``top_word_ratio_e4``  — occurrences of the most frequent word / words
    - ``top_bigram_ratio_e4``— occurrences of the most frequent word bigram
      / (words-1)

    Words are the non-empty ' '-split tokens (the doc_quality definition).
    All-integer 1e-4 fixed point, so the DuckDB oracle matches exactly.
    ZERO shuffle: documents are rows, so every feature is row-local; the
    heavy lifting is one explode + two C-level pandas groupbys per batch.
    """

    def feats(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        text = batch[text_col].reset_index(drop=True)
        ex = text.str.split(" ").explode()
        keep = ex.notna() & (ex != "")
        exv = ex[keep]
        n_words = np.zeros(n, dtype=np.int64)
        distinct = np.zeros(n, dtype=np.int64)
        top_w = np.zeros(n, dtype=np.int64)
        top_b = np.zeros(n, dtype=np.int64)
        if len(exv):
            rows = exv.index.to_numpy().astype(np.int64)
            n_words = np.bincount(rows, minlength=n).astype(np.int64)
            wc = pd.DataFrame({"_r": rows, "_w": exv.to_numpy()}) \
                .groupby(["_r", "_w"], sort=False).size()
            byrow = wc.groupby(level=0, sort=False)
            distinct[byrow.size().index.to_numpy()] = byrow.size().to_numpy()
            top_w[byrow.max().index.to_numpy()] = byrow.max().to_numpy()
            same = rows[:-1] == rows[1:]
            if same.any():
                wv = exv.to_numpy()
                bseries = (pd.Series(wv[:-1][same]) + " "
                           + pd.Series(wv[1:][same]))
                bc = pd.DataFrame({"_r": rows[:-1][same], "_b": bseries}) \
                    .groupby(["_r", "_b"], sort=False).size() \
                    .groupby(level=0, sort=False).max()
                top_b[bc.index.to_numpy()] = bc.to_numpy()
        nw1 = np.maximum(n_words, 1)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_words": n_words,
            "distinct_ratio_e4": distinct * _E4 // nw1,
            "top_word_ratio_e4": top_w * _E4 // nw1,
            "top_bigram_ratio_e4": top_b * _E4 // np.maximum(n_words - 1, 1),
        })

    return ds.map_batches(feats, batch_format="pandas", batch_size=None)


# --------------------------------------------------------------------------
# Corpus-statistics scoring: PMI collocations, rare-word ratio, unigram LM
# --------------------------------------------------------------------------


def doc_word_long(docs: "ray.data.Dataset", text_col: str = "text",
                  id_col: str = "doc_id") -> "ray.data.Dataset":
    """Row-local (doc_id, word, cnt, n_words) long table — one map pass, no
    shuffle (a document lives entirely in its row, so its per-word counts
    are already global).  Words are the non-empty ' '-split tokens."""

    def doc_terms(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch[text_col].reset_index(drop=True).str.split(" ").explode()
        w = w[w != ""].dropna()
        tf = (pd.DataFrame({"i": w.index.to_numpy(np.int64),
                            "word": w.to_numpy()})
              .groupby(["i", "word"], sort=False).size()
              .rename("cnt").reset_index())
        tf["n_words"] = tf.groupby("i", sort=False)["cnt"].transform("sum")
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy()[tf["i"].to_numpy()],
            "word": tf["word"],
            "cnt": tf["cnt"].astype("int64"),
            "n_words": tf["n_words"].astype("int64"),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        doc_terms, batch_format="pandas", batch_size=None)


def bigram_pmi_topk(docs: "ray.data.Dataset", k: int = 20,
                    min_count: int = 5, text_col: str = "text",
                    num_buckets: int = 1024,
                    spill_dir: str | None = None) -> pd.DataFrame:
    """Top-``k`` word-bigram collocations by count with EXACT pointwise
    mutual information: ``pmi_e4 = c_xy · N · 10^4 // (c_x · c_y)`` where
    ``N`` is total word occurrences — the linear (un-logged) PMI ratio in
    big-int arithmetic, so the HUGEINT SQL replay matches bit-for-bit
    (log-PMI preserves the same ordering at fixed N but drags floats into
    the hash gate).

    Shuffle shape: ONE pass over the corpus emits unigram and bigram
    partial counts into a single (w1, w2, c) table — unigrams ride with
    ``w2 = ''`` (words are non-empty after the split filter, so the
    sentinel can't collide) — so the corpus is read/exploded once and the
    entity-shaped bucketed sum runs once.  A global top-k on the bigram
    slice, then the ≤ 2k needed unigram counts come back as a tiny
    filtered pull.  The finish is k rows of Python big-int on the
    driver."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from zeeklog_ray.relational import grouped_sum_bucketed, top_k

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # integer-code census (ops/wordhash): dictionary-encode once,
        # count unigram codes with bincount and bigram PAIRS as packed
        # int64 codes (c1·|vocab| + c2, no overflow: per-batch vocab ≪
        # 2^31) — strings only materialize for the unique output rows
        from zeeklog_ray.ops.wordhash import split_word_codes

        doc_of, codes, vocab = split_word_codes(batch[text_col])
        if not len(codes):
            return pd.DataFrame({"w1": pd.Series([], dtype=object),
                                 "w2": pd.Series([], dtype=object),
                                 "c": pd.Series([], dtype="int64")})
        n_uniq = np.int64(len(vocab))
        uni = pd.DataFrame({
            "w1": vocab, "w2": "",
            "c": np.bincount(codes, minlength=len(vocab)).astype("int64")})
        same = doc_of[:-1] == doc_of[1:]
        if not same.any():
            return uni
        packed = codes[:-1][same] * n_uniq + codes[1:][same]
        pk, pcount = np.unique(packed, return_counts=True)
        bc = pd.DataFrame({"w1": vocab[pk // n_uniq],
                           "w2": vocab[pk % n_uniq],
                           "c": pcount.astype("int64")})
        return pd.concat([uni, bc], ignore_index=True)

    from zeeklog_ray.spill import pin_or_spill

    # thrice-consumed intermediate (N, top-k, unigram pull); the pin is
    # entity-shaped (unigram+bigram vocabulary) — at web scale pass
    # spill_dir= and it streams through Parquet instead of the object
    # store (spill.pin_or_spill)
    counts = pin_or_spill(grouped_sum_bucketed(
        docs.map_batches(partial, batch_format="pandas", batch_size=None),
        ["w1", "w2"], sums={"c": "c"},
        num_buckets=num_buckets), spill_dir, "pmi_counts")
    uni = counts.map_batches(
        lambda t: t.filter(pc.equal(t["w2"], "")),
        batch_format="pyarrow", batch_size=None)
    bi = counts.map_batches(
        lambda t: t.filter(pc.not_equal(t["w2"], "")),
        batch_format="pyarrow", batch_size=None)
    n_total = int(uni.sum("c"))
    top = top_k(bi.filter(expr=f"c >= {min_count}"),
                by=["c", "w1", "w2"], descending=[True, False, False],
                k=k).to_pandas()

    need = pa.array(sorted(frozenset(top["w1"]) | frozenset(top["w2"])),
                    type=pa.string())

    def pull(t: "pa.Table") -> "pa.Table":
        # Arrow-native semi-filter: empty results stay typed (an empty
        # pandas object block trips Ray's block-size estimator)
        return t.filter(pc.and_(pc.is_in(t["w1"], value_set=need),
                                pc.equal(t["w2"], "")))

    wc = counts.map_batches(pull, batch_format="pyarrow",
                            batch_size=None).to_pandas() \
        .rename(columns={"w1": "word"})
    lut = dict(zip(wc["word"], wc["c"].astype(int)))
    pmi = [int(cxy) * n_total * 10_000
           // (lut[w1] * lut[w2])
           for w1, w2, cxy in zip(top["w1"], top["w2"], top["c"])]
    return pd.DataFrame({"w1": top["w1"], "w2": top["w2"],
                         "pair_count": top["c"].astype("int64"),
                         "pmi_e4": pd.Series(pmi, dtype="int64")})


def rare_word_stats(docs: "ray.data.Dataset", min_corpus_count: int = 5,
                    text_col: str = "text", id_col: str = "doc_id",
                    num_buckets: int = 1024,
                    broadcast_vocab: int = 2_000_000,
                    spill_dir: str | None = None) -> "ray.data.Dataset":
    """Per-document rare-word ratio against the CORPUS unigram table — the
    integer-exact core of perplexity-style quality filtering (a doc made
    of words the corpus has barely seen is noise, OCR garbage, or another
    language).  ``n_rare`` counts word POSITIONS whose corpus count is
    below ``min_corpus_count``.

    Tiered on the size of the RARE TAIL itself (not the whole vocab):

    * tail ≤ ``broadcast_vocab`` distinct words — broadcast the rare SET
      once and finish in ONE row-local pass (n_words and n_rare per doc
      straight out of the explode; no long table, no join, no doc-shaped
      shuffle — measured 42.8 s → ~8 s at 1M docs);
    * huge tail (a raw web crawl where most of the vocabulary is
      singletons) — the long-table path: row-local extraction
      (:func:`doc_word_long`), bucketed equi-join against the rare subset,
      doc-shaped bucketed finish (the tfidf_top_terms tier shape).

    Both tiers are exact and text never shuffles."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray as _ray

    from zeeklog_ray.relational import (
        bucketed_equi_join,
        grouped_sum_bucketed,
    )

    def uni_partial(batch: pd.DataFrame) -> pd.DataFrame:
        from zeeklog_ray.ops.wordhash import split_word_codes

        _doc_of, codes, vocab = split_word_codes(batch[text_col])
        return pd.DataFrame({
            "word": vocab,
            "cnt": np.bincount(codes, minlength=len(vocab))
                     .astype("int64")})

    from zeeklog_ray.spill import pin_or_spill

    # twice-consumed vocab table (tail count + tail pull/join); at a
    # raw-crawl vocabulary pass spill_dir= (spill.pin_or_spill)
    wc = pin_or_spill(grouped_sum_bucketed(
        docs.map_batches(uni_partial, batch_format="pandas",
                         batch_size=None),
        ["word"], sums={"cnt": "c"}, num_buckets=num_buckets),
        spill_dir, "rare_wc")

    def rare_only(t: "pa.Table") -> "pa.Table":
        return t.filter(pc.less(t["c"], min_corpus_count))

    rare_wc = wc.map_batches(rare_only, batch_format="pyarrow",
                             batch_size=None)
    n_rare_words = rare_wc.count()
    if n_rare_words <= broadcast_vocab:
        # an all-empty dataset's to_pandas() loses its columns (the Ray
        # empty-block schema wart) — build the empty set explicitly
        rare_ref = _ray.put(
            frozenset(rare_wc.to_pandas()["word"]) if n_rare_words
            else frozenset())

        def stats(batch: pd.DataFrame) -> pd.DataFrame:
            from zeeklog_ray.ops.wordhash import split_word_codes

            n = len(batch)
            doc_of, codes, vocab = split_word_codes(batch[text_col])
            n_words = np.zeros(n, dtype=np.int64)
            n_rare = np.zeros(n, dtype=np.int64)
            if len(codes):
                n_words = np.bincount(doc_of, minlength=n).astype(np.int64)
                # membership per UNIQUE word, gathered back per occurrence
                vhit = pd.Series(vocab).isin(_ray.get(rare_ref)).to_numpy()
                n_rare = np.bincount(doc_of[vhit[codes]], minlength=n) \
                    .astype(np.int64)
            return pd.DataFrame({
                id_col: batch[id_col].to_numpy(),
                "n_words": n_words,
                "n_rare": n_rare,
                "rare_ratio_e4": n_rare * _E4 // np.maximum(n_words, 1),
            })

        return docs.map_batches(stats, batch_format="pandas",
                                batch_size=None)

    long = doc_word_long(docs, text_col=text_col, id_col=id_col)
    joined = bucketed_equi_join(long, rare_wc, on="word",
                                num_buckets=num_buckets)

    def rare_partial(batch: pd.DataFrame) -> pd.DataFrame:
        # inner join against the rare subset: every surviving row is rare
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_words": np.int64(0),
            "n_rare": batch["cnt"].to_numpy().astype("int64"),
        })

    def spine(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_words": batch[text_col].str.count(r"[^ ]+").astype("int64"),
            "n_rare": np.int64(0),
        })

    both = docs.map_batches(spine, batch_format="pandas", batch_size=None) \
        .union(joined.map_batches(rare_partial, batch_format="pandas",
                                  batch_size=None))
    summed = grouped_sum_bucketed(both, [id_col],
                                  sums={"n_words": "n_words",
                                        "n_rare": "n_rare"},
                                  num_buckets=num_buckets)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        nw = batch["n_words"].to_numpy().astype(np.int64)
        nr = batch["n_rare"].to_numpy().astype(np.int64)
        batch["rare_ratio_e4"] = nr * _E4 // np.maximum(nw, 1)
        return batch

    return summed.map_batches(finish, batch_format="pandas",
                              batch_size=None)


def unigram_logprob(docs: "ray.data.Dataset", text_col: str = "text",
                    id_col: str = "doc_id",
                    num_buckets: int = 1024,
                    broadcast_vocab: int = 2_000_000,
                    spill_dir: str | None = None) -> "ray.data.Dataset":
    """Per-document average unigram log-likelihood under the corpus's own
    unigram LM: ``avg_logprob = (Σ cnt_w·log2 c_w − n_words·log2 N) /
    n_words`` — the classic perplexity-style quality score (docs far from
    the corpus distribution score low).

    FLOAT by design (log2), so the driver gate is rows-only; exactness is
    pinned by a pure-pandas parity pytest, and the integer-exact twin that
    IS hash-gated is :func:`rare_word_stats` (same pass structure).  Every
    word has corpus count ≥ 1 (the doc itself), so no smoothing term is
    needed."""
    from zeeklog_ray.relational import (
        broadcast_merge,
        bucketed_equi_join,
        grouped_sum_bucketed,
    )
    from zeeklog_ray.spill import pin_or_spill

    # long = O(doc·distinct-word) rows, wc = vocab-shaped — both consumed
    # twice; pass spill_dir= at corpus scale (spill.pin_or_spill)
    long = pin_or_spill(doc_word_long(docs, text_col=text_col,
                                      id_col=id_col), spill_dir, "lm_long")
    wc = pin_or_spill(grouped_sum_bucketed(
        long.select_columns(["word", "cnt"]), ["word"],
        sums={"cnt": "c"}, num_buckets=num_buckets), spill_dir, "lm_wc")
    n_total = int(wc.sum("c"))
    if wc.count() <= broadcast_vocab:
        joined = broadcast_merge(long, wc.to_pandas(), on="word")
    else:
        joined = bucketed_equi_join(long, wc, on="word",
                                    num_buckets=num_buckets)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_words": np.int64(0),
            "sum_log2c": batch["cnt"].to_numpy()
            * np.log2(batch["c"].to_numpy().astype(np.float64)),
        })

    def spine(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_words": batch[text_col].str.count(r"[^ ]+").astype("int64"),
            "sum_log2c": np.float64(0.0),
        })

    both = docs.map_batches(spine, batch_format="pandas", batch_size=None) \
        .union(joined.map_batches(partial, batch_format="pandas",
                                  batch_size=None))
    summed = grouped_sum_bucketed(both, [id_col],
                                  sums={"n_words": "n_words",
                                        "sum_log2c": "sum_log2c"},
                                  num_buckets=num_buckets)
    log2n = np.log2(np.float64(n_total)) if n_total else np.float64(0.0)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        nw = batch["n_words"].to_numpy().astype(np.float64)
        s = batch["sum_log2c"].to_numpy()
        batch["avg_logprob"] = np.where(
            nw > 0, (s - nw * log2n) / np.maximum(nw, 1.0), 0.0)
        return batch[[id_col, "n_words", "avg_logprob"]]

    return summed.map_batches(finish, batch_format="pandas",
                              batch_size=None)


def repetition_filter(ds: "ray.data.Dataset",
                      min_distinct_e4: int = 3000,
                      max_top_bigram_e4: int = 1000,
                      text_col: str = "text") -> "ray.data.Dataset":
    """Row-local Gopher-rule FILTER: keep documents whose distinct-word
    ratio is at least ``min_distinct_e4`` and whose top-bigram ratio is
    at most ``max_top_bigram_e4`` (integer e4, the repetition_stats
    definitions).  All original columns pass through; zero shuffle."""

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        if not n:
            return batch
        ex = batch[text_col].reset_index(drop=True).str.split(" ").explode()
        ex = ex[ex.notna() & (ex != "")]
        n_words = np.zeros(n, dtype=np.int64)
        distinct = np.zeros(n, dtype=np.int64)
        top_b = np.zeros(n, dtype=np.int64)
        if len(ex):
            rows = ex.index.to_numpy().astype(np.int64)
            n_words = np.bincount(rows, minlength=n).astype(np.int64)
            byrow = pd.DataFrame({"_r": rows, "_w": ex.to_numpy()}) \
                .groupby(["_r", "_w"], sort=False).size() \
                .groupby(level=0, sort=False)
            distinct[byrow.size().index.to_numpy()] = byrow.size().to_numpy()
            same = rows[:-1] == rows[1:]
            if same.any():
                wv = ex.to_numpy()
                bc = pd.DataFrame({
                    "_r": rows[:-1][same],
                    "_b": pd.Series(wv[:-1][same]) + " "
                    + pd.Series(wv[1:][same]),
                }).groupby(["_r", "_b"], sort=False).size() \
                    .groupby(level=0, sort=False).max()
                top_b[bc.index.to_numpy()] = bc.to_numpy()
        nw1 = np.maximum(n_words, 1)
        ok = (distinct * _E4 // nw1 >= min_distinct_e4) \
            & (top_b * _E4 // np.maximum(n_words - 1, 1)
               <= max_top_bigram_e4)
        return batch[ok]

    return ds.map_batches(keep, batch_format="pandas", batch_size=None)


def source_distinctive_terms(docs: "ray.data.Dataset", k: int = 10,
                             min_count: int = 20,
                             text_col: str = "text",
                             source_col: str = "source",
                             num_buckets: int = 1024,
                             broadcast_vocab: int = 2_000_000
                             ) -> "ray.data.Dataset":
    """Per-source distinctive vocabulary: for every source, the top-``k``
    words whose in-source usage rate most exceeds their rate in the REST
    of the corpus — the report a mixture designer reads to see what a
    domain actually contributes (code tokens from a code crawl, legalese
    from a filings dump) before setting sampling weights.

    Score (all int64, floor division, so the DuckDB replay hash-matches):

        rate_in_ppm  = c_sw * 10^6 // N_s
        rate_out_ppm = (c_w - c_sw) * 10^6 // max(N_tot - N_s, 1)
        score_e4     = rate_in_ppm * 10^4 // (rate_out_ppm + 1)

    where ``c_sw`` is the word's count inside the source, ``c_w`` its
    corpus count, ``N_s`` / ``N_tot`` the source / corpus word totals.
    The ``+1`` floor on the outside rate keeps source-exclusive words
    finite; int64 bound: ``c_sw * 10^6 < 2^63`` holds while no single
    word exceeds ~9.2e12 occurrences in one source (~36 TB of that word
    alone) — documented, not checked per row.

    Scale shape (the tfidf_top_terms structure on the source axis):
    per-(source, word) counts are one entity-shaped bucketed sum — only
    count partials shuffle, never word streams; word totals are a second
    vocabulary-shaped bucketed sum with a tiered attach (broadcast below
    ``broadcast_vocab`` distinct words, bucketed equi-join above);
    source totals are report-shaped (|sources| rows) and ride the task
    closure.  Per-block per-source head(k) prunes the exchange before
    the final source-bucketed rank, exactly like the TF-IDF prune: a
    true top-k row is top-k inside every subset containing it, so the
    per-block head is a safe superset under the identical sort key.

    Output: ``(source, rank, word, tf_source, score_e4)``, rank 1..k by
    (score_e4 desc, word asc).
    """
    from zeeklog_ray.relational import (
        broadcast_merge,
        bucketed_equi_join,
        grouped_sum,
        grouped_sum_bucketed,
        with_hash_bucket,
    )

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        # pre-aggregated (source, word, c_sw) partials via integer codes
        # (ops/wordhash): the map output shrinks from one row per word
        # OCCURRENCE to one per distinct (source, word) in the block
        from zeeklog_ray.ops.wordhash import split_word_codes

        batch = batch.reset_index(drop=True)  # blocks may carry any index
        doc_of, codes, vocab = split_word_codes(batch[text_col])
        if not len(codes):
            return pd.DataFrame({
                source_col: pd.Series([], dtype=object),
                "word": pd.Series([], dtype=object),
                "c_sw": pd.Series([], dtype="int64")})
        src_codes, src_uniq = pd.factorize(batch[source_col])
        sc = src_codes.astype(np.int64)[doc_of]
        n_uniq = np.int64(len(vocab))
        pk, c = np.unique(sc * n_uniq + codes, return_counts=True)
        return pd.DataFrame({
            source_col: src_uniq.to_numpy()[(pk // n_uniq).astype(np.int64)],
            "word": vocab[(pk % n_uniq).astype(np.int64)],
            "c_sw": c.astype("int64")})

    long = docs.select_columns([source_col, text_col]).map_batches(
        explode, batch_format="pandas", batch_size=None)
    counts = grouped_sum_bucketed(long, [source_col, "word"],
                                  sums={"c_sw": "c_sw"},
                                  num_buckets=num_buckets).materialize()
    word_tot = grouped_sum_bucketed(
        counts.select_columns(["word", "c_sw"]), ["word"],
        sums={"c_sw": "c_w"}, num_buckets=num_buckets).materialize()
    # source totals are report-shaped: |sources| rows on the driver
    src_tot = grouped_sum(counts, [source_col],
                          sums={"c_sw": "n_s"}).to_pandas()
    n_s = dict(zip(src_tot[source_col], src_tot["n_s"].astype("int64")))
    n_tot = int(sum(n_s.values()))

    if word_tot.count() <= broadcast_vocab:
        joined = broadcast_merge(counts, word_tot.to_pandas(), on="word")
    else:
        joined = bucketed_equi_join(counts, word_tot, on="word",
                                    num_buckets=num_buckets)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["c_w"] >= min_count]
        if not len(batch):
            return pd.DataFrame({source_col: pd.Series([], dtype="object"),
                                 "word": pd.Series([], dtype="object"),
                                 "tf_source": pd.Series([], dtype="int64"),
                                 "score_e4": pd.Series([], dtype="int64")})
        ns = batch[source_col].map(n_s).to_numpy().astype("int64")
        c_sw = batch["c_sw"].to_numpy().astype("int64")
        c_w = batch["c_w"].to_numpy().astype("int64")
        rate_in = c_sw * 1_000_000 // ns
        rate_out = (c_w - c_sw) * 1_000_000 // np.maximum(n_tot - ns, 1)
        return pd.DataFrame({
            source_col: batch[source_col].to_numpy(),
            "word": batch["word"].to_numpy(),
            "tf_source": c_sw,
            "score_e4": rate_in * 10_000 // (rate_out + 1),
        })

    scored = joined.map_batches(score, batch_format="pandas",
                                batch_size=None)

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.sort_values([source_col, "score_e4", "word"],
                              ascending=[True, False, True],
                              kind="mergesort")
        return g.groupby(source_col, sort=False).head(k)

    pruned = scored.map_batches(prune, batch_format="pandas",
                                batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([source_col, "score_e4", "word"],
                          ascending=[True, False, True], kind="mergesort")
        g["rank"] = (g.groupby(source_col, sort=False).cumcount() + 1) \
            .astype("int64")
        return g[g["rank"] <= k][
            [source_col, "rank", "word", "tf_source", "score_e4"]]

    return with_hash_bucket(pruned, source_col, num_buckets) \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def passage_chunks(ds: "ray.data.Dataset", text_col: str = "text",
                   id_col: str = "doc_id", chunk_words: int = 32,
                   stride: int = 24) -> "ray.data.Dataset":
    """Overlapping passage chunking — the RAG/context-window splitter:
    each document becomes word windows starting at 0, stride, 2·stride,
    ... (every start < the doc's word count; trailing windows may be
    short), emitted as (id, chunk_idx, chunk_text, n_words).

    Row-local, zero shuffle — chunking is embarrassingly parallel and
    output size is ~(chunk_words/stride)× the corpus, so the only scale
    concern is downstream block size, not exchange.  Construction is
    one Arrow split + three numpy repeat/cumsum passes per batch; the
    unavoidable per-chunk piece is the final string join (there is no C
    kernel for grouped join), applied once per OUTPUT chunk."""
    if stride <= 0 or chunk_words <= 0:
        raise ValueError("passage_chunks: chunk_words and stride must "
                         "be positive")

    from zeeklog_ray.ops.wordhash import split_words

    def chunk(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        out_cols = {id_col: np.int64, "chunk_idx": np.int64,
                    "n_words": np.int64}
        doc_of, flat = split_words(batch[text_col])
        counts = np.bincount(doc_of, minlength=n).astype(np.int64)
        n_chunks = -(-counts // stride)            # ceil; 0 words → 0
        total_c = int(n_chunks.sum())
        if total_c == 0:
            empty = pd.DataFrame({c: np.array([], dtype=d)
                                  for c, d in out_cols.items()})
            empty["chunk_text"] = pd.array([], dtype="string")
            return empty[[id_col, "chunk_idx", "chunk_text", "n_words"]]
        chunk_doc = np.repeat(np.arange(n), n_chunks)
        first_of_doc = np.concatenate(([0], np.cumsum(n_chunks)))[:-1]
        chunk_idx = np.arange(total_c) - first_of_doc[chunk_doc]
        starts = chunk_idx * stride
        lens = np.minimum(counts[chunk_doc] - starts, chunk_words)
        doc_start = np.concatenate(([0], np.cumsum(counts)))[:-1]
        total_w = int(lens.sum())
        first_of_chunk = np.concatenate(([0], np.cumsum(lens)))[:-1]
        within = np.arange(total_w) - np.repeat(first_of_chunk, lens)
        gidx = np.repeat(doc_start[chunk_doc] + starts, lens) + within
        labels = np.repeat(np.arange(total_c), lens)
        words_np = flat.to_numpy(zero_copy_only=False)
        texts_out = pd.Series(words_np[gidx]).groupby(labels) \
            .agg(" ".join)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy()[chunk_doc],
            "chunk_idx": chunk_idx,
            "chunk_text": texts_out.to_numpy(),
            "n_words": lens})

    return ds.map_batches(chunk, batch_format="pandas", batch_size=None)
