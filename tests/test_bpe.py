"""BPE subword tokenizer gates (round 8, VERDICT r7 #5).

The oracle here is a pure-Python SEQUENTIAL reference encoder — the
textbook formulation that applies the merge list in training order,
one full left-to-right pass per merge.  The engine's kernel uses the
greedy lowest-rank formulation (GPT-2 ``bpe()``); the two are provably
equivalent when merge tables come from real training (a pair involving
a merged symbol can only be learned after that symbol exists), and the
differential below checks it over the whole corpus vocabulary plus
adversarial synthetics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from frizzle_spark.functions import text as T
from frizzle_spark.operators.bpe import (
    BPE_N_MERGES,
    EOW,
    corpus_merges,
    encode_word,
    train_bpe,
)
from frizzle_spark.sources.tables import load_table


def ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Sequential reference: apply each merge in training order with one
    left-to-right non-overlapping pass — deliberately a DIFFERENT
    algorithm shape than the engine's greedy-by-rank kernel."""
    syms = list(word) + [EOW]
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_train_bpe_deterministic_and_orders_by_frequency():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    m1 = train_bpe(wc, n_merges=10)
    m2 = train_bpe(list(reversed(wc)), n_merges=10)
    assert m1 == m2, "merge table must be input-order independent"
    # 'est' dominates: e+s appears in newest+widest with weight 9 — the
    # first merge must be the (count DESC, pair ASC) winner
    pair_counts = {}
    for w, c in wc:
        syms = list(w) + [EOW]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + c
    want_first = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert m1[0] == want_first
    assert len(m1) <= 10


def test_encode_word_matches_sequential_reference_synthetics():
    wc = [("aaab", 4), ("abab", 3), ("banana", 5), ("bandana", 2), ("ab", 9)]
    merges = train_bpe(wc, n_merges=15)
    ranks = {p: i for i, p in enumerate(merges)}
    cases = [
        "aaab", "abab", "banana", "bandana", "ab",  # trained words
        "a", "b", "",  # degenerate
        "aaaaaaa", "bananaband",  # overlap stress
        "zzz", "añob",  # unseen chars / unicode
    ]
    for w in cases:
        assert encode_word(w, ranks) == ref_encode(w, merges), w
        # reconstruction: concatenating subwords restores word + EOW
        assert "".join(encode_word(w, ranks)) == w + EOW, w


def test_encode_word_matches_reference_over_corpus_vocab(spark, sf_dir):
    """Full-vocabulary differential: every distinct corpus word encodes
    identically under greedy-by-rank and sequential-apply, with exact
    reconstruction."""
    merges = corpus_merges(spark, sf_dir)
    assert 0 < len(merges) <= BPE_N_MERGES
    ranks = {p: i for i, p in enumerate(merges)}
    words = [
        r["w"]
        for r in (
            load_table(spark, sf_dir, "documents")
            .where(F.col("text").isNotNull())
            .select(F.explode(T.words(F.lower(F.col("text")))).alias("w"))
            .where(F.length("w") >= 1)
            .distinct()
            .collect()
        )
    ]
    assert len(words) >= 20  # sf0.001's synthetic vocab is ~30 words
    for w in words:
        got = encode_word(w, ranks)
        assert got == ref_encode(w, merges), w
        assert "".join(got) == w + EOW, w


def test_bpe_encode_query_invariants(spark, sf_dir):
    """qz14_bpe_encode: counts consistent, order-preserved reconstruction
    — flattened subwords per doc concatenate back to the lowercased
    whitespace-token stream (with one EOW per word), run-to-run
    deterministic."""
    from frizzle_spark.plans.registry import REGISTRY

    fn = REGISTRY["qz14_bpe_encode"].fn
    rows = {r["doc_id"]: r for r in fn(spark, sf_dir).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
        .collect()
    }
    merges = corpus_merges(spark, sf_dir)
    ranks = {p: i for i, p in enumerate(merges)}
    assert set(rows) == {
        d for d, t in docs.items() if [w for w in t.lower().split() if w]
    }
    for doc_id, r in rows.items():
        assert r["n_bpe_tokens"] == len(r["bpe_toks"])
        wordlist = [w for w in docs[doc_id].lower().split() if w]
        want = [s for w in wordlist for s in encode_word(w, ranks)]
        assert r["bpe_toks"] == want, doc_id


def test_token_budget_bpe_recomputation_gate(spark, sf_dir):
    """qz22_token_budget_bpe: per-doc n_tokens re-derives independently
    via the sequential reference encoder; cum_tokens is exactly the
    running sum in global (md5 key, doc_id) order; the slice respects
    the budget and is the MAXIMAL prefix."""
    import hashlib

    from frizzle_spark.plans.registry import REGISTRY
    from frizzle_spark.plans.sql_surface import (
        BPE_TOKEN_BUDGET,
        TOKEN_BUDGET_SEED,
    )

    got = {
        r["doc_id"]: r
        for r in REGISTRY["qz22_token_budget_bpe"].fn(spark, sf_dir).collect()
    }
    merges = corpus_merges(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    counts = {}
    for r in docs:
        wordlist = [w for w in (r["text"] or "").lower().split() if w]
        counts[r["doc_id"]] = sum(len(ref_encode(w, merges)) for w in wordlist)

    def key(doc_id):
        return hashlib.md5(f"{doc_id}:{TOKEN_BUDGET_SEED}".encode()).hexdigest()

    order = sorted(counts, key=lambda d: (key(d), d))
    cum = 0
    want = {}
    for d in order:
        cum += counts[d]
        if cum > BPE_TOKEN_BUDGET:
            break
        want[d] = cum
    assert set(got) == set(want)
    for d, r in got.items():
        assert r["n_tokens"] == counts[d], d
        assert r["cum_tokens"] == want[d], d
    assert want, "budget must select a non-empty prefix at test scale"


# ---------------------------------------------------------------------------
# Hypothesis fuzz: the greedy-by-rank / sequential-apply equivalence must
# hold for ANY trained merge table, not just the hand-picked synthetics —
# random tiny-alphabet corpora maximize merge collisions ("ab"+"ab",
# merged symbols re-pairing with their own constituents).
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _ALPHA = "abc"
    _words = st.text(alphabet=_ALPHA, min_size=1, max_size=10)

    @settings(max_examples=200, deadline=None)
    @given(
        wc=st.lists(
            st.tuples(_words, st.integers(min_value=1, max_value=9)),
            min_size=1,
            max_size=12,
        ),
        probes=st.lists(_words, min_size=1, max_size=8),
        n_merges=st.integers(min_value=1, max_value=25),
    )
    def test_encode_word_fuzz_matches_reference(wc, probes, n_merges):
        merges = train_bpe(wc, n_merges=n_merges)
        ranks = {p: i for i, p in enumerate(merges)}
        for w in probes + [w for w, _ in wc]:
            got = encode_word(w, ranks)
            assert got == ref_encode(w, merges), (w, merges)
            assert "".join(got) == w + EOW, (w, merges)

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


# ---------------------------------------------------------------------------
# Round 9 (VERDICT r8 #4): distributed trainer identity + cap sensitivity.
#
# train_bpe runs driver-side over the top-BPE_WORD_CAP word table — an
# honest, corpus-size-independent posture, but until now ungated: nothing
# measured what the cap costs.  The gates below pin both halves:
# (a) the cap is FREE on every testdata corpus (vocab 31 words << 4000,
#     so capped ≡ uncapped — asserted, not assumed), and on synthetic
#     over-cap vocabularies the divergence is REAL and appears as soon
#     as the cap drops meaningful token mass (measured: first-divergence
#     index 1 at 69% head mass) — the cap is a head-mass bet, not a
#     free lunch;
# (b) train_bpe_distributed removes the bet entirely: identical merge
#     table to the driver trainer on ANY input (identity-gated on the
#     corpus table, a tie-heavy unicode synthetic, and the over-cap
#     Zipf vocabulary where it sides with the UNCAPPED table).
# ---------------------------------------------------------------------------


def _zipf_vocab(n_words: int = 400, seed: int = 7) -> list[tuple[str, int]]:
    import numpy as np

    rng = np.random.RandomState(seed)
    alpha = list("abcdefghij")
    words: list[str] = []
    seen: set[str] = set()
    while len(words) < n_words:
        w = "".join(rng.choice(alpha, size=rng.randint(3, 9)))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return [(w, max(1, int(2000 / (i + 1)))) for i, w in enumerate(words)]


def test_bpe_cap_free_on_corpus_vocab(spark, sf_dir):
    """On the real corpus the cap never binds (vocab far below
    BPE_WORD_CAP), so the shipped capped trainer must equal the
    uncapped one exactly — the claim 'capped training is exact here'
    is asserted, not assumed."""
    from frizzle_spark.operators.bpe import BPE_WORD_CAP, corpus_wordcounts

    full = [(r["w"], r["c"]) for r in corpus_wordcounts(spark, sf_dir, cap=None).collect()]
    assert 0 < len(full) < BPE_WORD_CAP  # the regime the corpus sits in
    capped = [(r["w"], r["c"]) for r in corpus_wordcounts(spark, sf_dir).collect()]
    assert train_bpe(capped) == train_bpe(full)


def test_bpe_cap_divergence_measured_on_overcap_vocab():
    """Where the cap DOES bind, the divergence is real: capping a Zipf
    vocabulary at 50/400 words (≈69% token mass) changes the merge
    table almost immediately, while a non-binding cap changes nothing.
    Pins the measured first-divergence index so a silent behavior
    change in either trainer trips the gate."""
    wc = _zipf_vocab()
    full = train_bpe(wc, n_merges=15)
    capped_tbl = sorted(wc, key=lambda kv: (-kv[1], kv[0]))[:50]
    capped = train_bpe(capped_tbl, n_merges=15)
    div = next(
        (i for i, (x, y) in enumerate(zip(full, capped)) if x != y), None
    )
    assert div is not None, "a 69%-mass cap must not be merge-table-neutral"
    assert div <= 3, f"measured first divergence moved: {div}"
    # a cap that keeps the whole vocabulary is exact by construction
    assert train_bpe(sorted(wc, key=lambda kv: (-kv[1], kv[0]))[:400], 15) == full


def test_train_bpe_distributed_identity(spark, sf_dir):
    """The distributed trainer must produce the BIT-IDENTICAL merge
    list as the driver trainer on the same input — on the real corpus
    table, and on a tie-heavy unicode synthetic (ties resolve through
    the same total (count DESC, pair ASC) order; UTF-8 binary order ==
    code-point order, so Spark's string sort agrees with Python's)."""
    from frizzle_spark.operators.bpe import corpus_wordcounts, train_bpe_distributed

    wc_df = corpus_wordcounts(spark, sf_dir, cap=None)
    rows = [(r["w"], r["c"]) for r in wc_df.collect()]
    assert train_bpe_distributed(wc_df, n_merges=25) == train_bpe(rows, n_merges=25)

    ties = [("añob", 7), ("banana", 7), ("abba", 7), ("ñaña", 3), ("x", 2), ("zz", 2)]
    df = spark.createDataFrame(ties, "w string, c long")
    assert train_bpe_distributed(df, n_merges=12) == train_bpe(ties, n_merges=12)


def test_train_bpe_distributed_sides_with_uncapped(spark):
    """On the over-cap Zipf vocabulary the distributed trainer (which
    needs no cap — the table never leaves the cluster) must equal the
    UNCAPPED driver trainer, diverging from the capped one exactly
    where the cap-divergence gate measured — i.e. it removes cap
    sensitivity rather than reproducing it."""
    from frizzle_spark.operators.bpe import train_bpe_distributed

    wc = _zipf_vocab()
    df = spark.createDataFrame(wc, "w string, c long")
    full = train_bpe(wc, n_merges=10)
    capped = train_bpe(
        sorted(wc, key=lambda kv: (-kv[1], kv[0]))[:50], n_merges=10
    )
    dist = train_bpe_distributed(df, n_merges=10)
    assert dist == full
    assert dist != capped


def test_save_load_bpe_merges_roundtrip(spark, sf_dir, tmp_path):
    # the persisted artifact must reproduce the trainer's merge table
    # exactly (training ORDER included — the greedy encoder keys on
    # rank), and encoding through the loaded table must be identical
    from frizzle_spark.operators.bpe import (
        corpus_merges,
        encode_word,
        load_bpe_merges,
        save_bpe_merges,
    )

    merges = corpus_merges(spark, sf_dir)
    base = str(tmp_path / "bpe_index")
    save_bpe_merges(spark, merges, base)
    loaded = load_bpe_merges(spark, base)
    assert loaded == merges
    ranks = {p: i for i, p in enumerate(merges)}
    ranks_l = {p: i for i, p in enumerate(loaded)}
    for w in ("the", "tokenizer", "qzx", "a"):
        assert encode_word(w, ranks) == encode_word(w, ranks_l)


def test_save_load_bpe_merges_empty(spark, tmp_path):
    # degenerate corpus -> zero merges: the artifact round-trips through
    # a data-less parquet dir (explicit schema covers the _SUCCESS-only
    # read that inference would fail on)
    from frizzle_spark.operators.bpe import load_bpe_merges, save_bpe_merges

    base = str(tmp_path / "bpe_empty")
    save_bpe_merges(spark, [], base)
    assert load_bpe_merges(spark, base) == []
