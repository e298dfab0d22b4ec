"""Subword tokenization — real byte-pair-encoding encode (round 8,
VERDICT r7 #5).

The engine already had BPE merge *statistics* (qz14_bpe_pairs — the
first training iteration) and word-level vocabulary ids
(qz14_vocab_encode); this module closes the loop with an actual
tokenizer-apply operator, so token budgets / packing / length buckets
can operate in TRUE subword-token space — the unit LLM pipelines bill
in — instead of the whitespace-word proxy.

The reference has no tokenizer (its transforms are byte-level framing,
reference transform.go:15-40); this is north-star extension territory.

Algorithm (Sennrich et al., ACL 2016):

* ``train_bpe(wordcounts, n_merges)`` — pure-Python, DETERMINISTIC
  merge-table learner over a (word, count) frequency table: each round
  counts adjacent symbol pairs weighted by word frequency and merges
  the (count DESC, pair ASC) winner everywhere.  Runs driver-side over
  the CAPPED top-``BPE_WORD_CAP`` word table — corpus-size-INDEPENDENT
  by construction (one bounded collect; at 100 TB the merge table is a
  train-once-offline artifact and every operator here takes it as a
  parameter).
* ``encode_word(word, ranks)`` — greedy lowest-rank merge apply
  (the GPT-2 ``bpe()`` formulation): repeatedly merge every
  left-to-right non-overlapping occurrence of the lowest-ranked pair
  present.  Equivalent to applying the merge list sequentially in
  training order (pairs involving a merged symbol can only be learned
  AFTER that symbol exists, so later merges never resurrect earlier
  pairs) — the pytest differential gate runs the sequential reference
  implementation against this one over the whole corpus vocabulary
  plus adversarial synthetics.

Spark shape (the part that matters at 100 TB): the Arrow kernel runs
over the DISTINCT WORD table only — |vocab| rows, corpus-size
independent — never the token stream.  The per-word subword expansion
then broadcast-joins back onto the exploded tokens, so the corpus-sized
side never moves for the join and document sequences re-assemble with
ONE shuffle keyed by doc_id (identical scale shape to qz14_vocab_encode,
which pins the collect_list-order hazard this module inherits the fix
for).  Python cost is O(|vocab| x word_len^2) total, Arrow-batched.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frizzle_spark.functions import text as T
from frizzle_spark.plans.registry import query
from frizzle_spark.sources.tables import load_table

EOW = "</w>"  # end-of-word sentinel symbol (Sennrich-style)
BPE_N_MERGES = 200  # learned merge-table size
BPE_WORD_CAP = 4000  # top words (count DESC, word ASC) used for training
BPE_MIN_PAIR = 2  # stop early once the best pair is a singleton


def train_bpe(
    wordcounts: Iterable[tuple[str, int]], n_merges: int = BPE_N_MERGES
) -> list[tuple[str, str]]:
    """Learn a deterministic BPE merge list from a (word, count) table.

    Pure Python, driver-side, over the capped vocabulary — the input is
    bounded (``BPE_WORD_CAP`` rows), so this is O(cap x len x merges)
    regardless of corpus size.  Tie-break is total: (count DESC,
    pair ASC), so the merge list is a pure function of the frequency
    table.
    """
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in wordcounts:
        syms = tuple(list(w) + [EOW])
        vocab[syms] = vocab.get(syms, 0) + int(c)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < BPE_MIN_PAIR:
            break
        merges.append(best)
        a, b = best
        merged: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            merged[key] = merged.get(key, 0) + c
        vocab = merged
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank BPE apply for one word → subword symbol list.

    Each round finds the lowest-ranked pair present and merges ALL its
    left-to-right non-overlapping occurrences; terminates because every
    round shortens the symbol list.  Equivalent to sequential
    merge-list application (differential-gated in pytest)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
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


# ---------------------------------------------------------------------------
# Corpus-derived merge table, memoized per (process, sf_dir) — the same
# one-artifact-per-corpus-snapshot posture as graph._cached_knn_edges.
# At 100 TB the table is trained once offline; everything below takes
# it as a broadcastable parameter.
# ---------------------------------------------------------------------------

_MERGES_CACHE: dict[str, list[tuple[str, str]]] = {}


BPE_MERGES_SCHEMA = "rank long, left string, right string"


def save_bpe_merges(
    spark: SparkSession, merges: list[tuple[str, str]], base_path: str
) -> None:
    """Persist a trained merge table to ``<base_path>/merges`` — the
    tokenizer sibling of ``materialize_knn_index`` / the persisted IVF
    and cluster indexes: the merge table IS the offline artifact this
    module's posture assumes (train once per corpus snapshot, encode
    everywhere), and until round 9 it lived only in the per-process
    memo cache.  The artifact is tiny (``n_merges`` rows — rank, left,
    right), so one parquet file; rank preserves training order, which
    the greedy encoder depends on."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        BPE_MERGES_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(f"{base_path}/merges")


def load_bpe_merges(spark: SparkSession, base_path: str) -> list[tuple[str, str]]:
    """Read a persisted merge table back in training order.  Explicit
    schema: an empty merge table (degenerate corpus) writes a parquet
    dir with only _SUCCESS, where inference would fail.  The collect is
    ``n_merges`` rows — bounded by construction, never corpus-sized."""
    rows = (
        spark.read.schema(BPE_MERGES_SCHEMA)
        .parquet(f"{base_path}/merges")
        .collect()
    )
    return [(r.left, r.right) for r in sorted(rows, key=lambda r: r.rank)]


def corpus_wordcounts(
    spark: SparkSession, sf_dir: str, cap: int | None = BPE_WORD_CAP
) -> DataFrame:
    """(w, c) frequency table of the corpus vocabulary — the trainers'
    shared input.  The shuffle is the word-count reduce (map-side
    combined); ``cap`` keeps the driver trainer's collect bounded
    (count DESC, word ASC — a total order, so the capped table is a
    pure function of the corpus); ``cap=None`` returns the full
    distinct-word table for the distributed trainer, which never
    collects it."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    wc = (
        docs.select(F.explode(T.words(F.lower(F.col("text")))).alias("w"))
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if cap is not None:
        wc = wc.orderBy(F.desc("c"), F.asc("w")).limit(cap)
    return wc


def corpus_merges(spark: SparkSession, sf_dir: str) -> list[tuple[str, str]]:
    """Train (or fetch the memoized) merge table for a corpus dir: one
    bounded collect of the top-``BPE_WORD_CAP`` word counts (the shuffle
    is the word-count reduce, map-side combined; the collect is ≤cap
    rows — NOT corpus-sized), then pure-Python training."""
    key = str(sf_dir)
    if key not in _MERGES_CACHE:
        wc = corpus_wordcounts(spark, sf_dir).collect()
        _MERGES_CACHE[key] = train_bpe([(r["w"], r["c"]) for r in wc])
    return _MERGES_CACHE[key]


def train_bpe_distributed(
    wordcounts: DataFrame, n_merges: int = BPE_N_MERGES
) -> list[tuple[str, str]]:
    """Distributed BPE merge-table learner: the SAME algorithm and
    (count DESC, pair ASC) tie-break as ``train_bpe`` — identity-gated
    against it in pytest — but the vocabulary table never leaves the
    cluster, so the word cap becomes unnecessary (round 9, VERDICT r8
    #4; the cap-sensitivity gate measures what the cap costs the
    driver trainer).

    Per round (the algorithm is inherently sequential — each merge
    depends on the table the previous one produced):

    * pair counting is the ``qz14_bpe_pairs`` shape generalized to
      symbol arrays: adjacent pairs expand from the |vocab|-row symbol
      table INSIDE codegen (transform over sequence), weighted by word
      count, and reduce through one map-side-combined groupBy —
      corpus-size-independent, |vocab|-bounded.
    * the winner travels to the driver as ONE row (the only per-round
      driver traffic; the vocabulary itself never moves).
    * the merge applies everywhere via a codegen-side ``aggregate``
      fold that rewrites each symbol array left-to-right
      non-overlapping — equivalent to the imperative scan because the
      freshly-merged symbol ``a+b`` can never string-equal the left
      element ``a`` (``b`` is non-empty), so a token produced this
      round is never re-merged as a left operand this round.

    Words reduced to a single symbol stop contributing pairs and are
    filtered at each checkpoint; lineage is truncated per round
    (the vocab table is |vocab| rows — tiny next to the corpus)."""
    vocab = (
        wordcounts.select(
            F.expr(
                "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
            ).alias("syms"),
            F.col("c").cast("long").alias("c"),
        )
        .select(F.concat("syms", F.array(F.lit(EOW))).alias("syms"), "c")
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            vocab.select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(syms[i-1] AS a, syms[i] AS b))"
                    )
                ).alias("p"),
                "c",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("c").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < BPE_MIN_PAIR:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        fold = F.aggregate(
            "syms",
            F.expr("cast(array() as array<string>)"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (s == F.lit(b)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.lit(a + b)),
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )
        vocab = (
            vocab.select(fold.alias("syms"), "c")
            .where(F.size("syms") >= 2)
            .localCheckpoint()
        )
    return merges


def encode_words_df(
    distinct_words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(w) → (w, subs array<string>, n_sub int) via an Arrow-batched
    ``mapInPandas`` kernel over the DISTINCT word table.  The merge
    table travels in the serialized closure (≤ a few KB — pairs of
    short strings); rank lookup is an O(1) dict per executor."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            subs = [encode_word(w, ranks) for w in pdf["w"]]
            yield pd.DataFrame(
                {
                    "w": pdf["w"],
                    "subs": subs,
                    "n_sub": [len(s) for s in subs],
                }
            )

    return distinct_words.select("w").mapInPandas(
        kernel, "w string, subs array<string>, n_sub int"
    )


def bpe_token_counts(
    spark: SparkSession, sf_dir: str, merges: list[tuple[str, str]] | None = None
) -> DataFrame:
    """Per-document TRUE subword token counts: (doc_id, n_tokens).

    Null/empty text encodes to 0 tokens (whitespace split of '' yields
    [''], which encodes to [EOW]-only… so empties are filtered explicitly
    to keep counts honest).  Shape: distinct-word encode (vocab-bounded
    kernel) → broadcast join onto the token stream → ONE doc_id-keyed
    sum shuffle."""
    merges = corpus_merges(spark, sf_dir) if merges is None else merges
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(T.words(F.lower(F.col("text")))).alias("w")
    ).where(F.length("w") >= 1)
    enc = encode_words_df(tok.select("w").distinct(), merges)
    per_doc = (
        tok.join(F.broadcast(enc.select("w", "n_sub")), "w")
        .groupBy("doc_id")
        .agg(F.sum("n_sub").cast("long").alias("n_tokens"))
    )
    # docs with no encodable words (null/empty text) still belong in the
    # budget ordering with 0 tokens
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens")
        )
    )


@query("qz14_bpe_encode", oracle=None)
def qz14_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BPE tokenizer apply: every document → its subword token
    sequence (order-preserved) under the corpus-trained merge table:
    (doc_id, n_bpe_tokens, bpe_toks array<string>).

    Rows-only at the driver (BPE is iterative symbol rewriting — not
    single-statement SQL); pytest gates: a SEQUENTIAL pure-Python
    reference encoder differential over the full corpus vocabulary and
    adversarial synthetics (unicode, unseen chars, singletons), plus
    determinism and count-consistency invariants.

    Scale shape: the Python kernel touches |vocab| distinct words, not
    the corpus; documents re-assemble with one doc_id shuffle, positions
    pinned by in-row struct sort (same hazard-fix as qz14_vocab_encode).
    """
    merges = corpus_merges(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    tok = docs.select(
        "doc_id", F.posexplode(T.words(F.lower(F.col("text")))).alias("pos", "w")
    ).where(F.length("w") >= 1)
    enc = encode_words_df(tok.select("w").distinct(), merges)
    seq = tok.join(F.broadcast(enc.select("w", "subs")), "w").select(
        "doc_id", F.struct("pos", "subs").alias("ps")
    )
    return seq.groupBy("doc_id").agg(
        F.flatten(
            F.transform(F.array_sort(F.collect_list("ps")), lambda s: s["subs"])
        ).alias("bpe_toks")
    ).select(
        "doc_id",
        F.size("bpe_toks").cast("long").alias("n_bpe_tokens"),
        "bpe_toks",
    )
