"""Text-analysis queries over ``documents`` (north-star extension inventory).

Oracle mirrors are generated from the SAME regex/stopword constants as
the Spark column functions (frizzle_spark.functions.text), so the two
sides cannot drift.  Rounding happens at the same intermediate points on
both sides to keep the value hash bit-stable.

Scale: all three queries are narrow projections — zero shuffles, one
WholeStageCodegen span over the scan; they stream at parquet-read speed
regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frizzle_spark.functions import text as T
from frizzle_spark.plans.registry import query
from frizzle_spark.sources.tables import load_table

_STATS_ORACLE = f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST(len(string_split_regex(trim(text), '{T.WS_RE}')) AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(text, '{T.TOKEN_RE}')) AS BIGINT)   AS n_tokens,
           CAST(len(regexp_extract_all(text, '{T.PUNCT_RE}')) AS BIGINT)   AS n_punct,
           round(len(regexp_extract_all(text, '{T.PUNCT_RE}'))
                 / length(text), 6)                                        AS punct_ratio,
           round(len(regexp_extract_all(lower(text), '{T.LANG_STOPWORDS["en"]}'))
                 / len(string_split_regex(trim(text), '{T.WS_RE}')), 6)    AS stop_ratio,
           round(list_sum(list_transform(string_split_regex(trim(text), '{T.WS_RE}'),
                                         w -> length(w)))
                 / len(string_split_regex(trim(text), '{T.WS_RE}')), 6)    AS avg_word_len
    FROM documents
"""


@query("q14_text_stats", oracle=_STATS_ORACLE)
def q14_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/word/punctuation statistics (all JVM built-ins)."""
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        F.length(c).cast("long").alias("n_chars_calc"),
        T.word_count(c).alias("n_words"),
        T.token_count(c).alias("n_tokens"),
        T.punct_count(c).alias("n_punct"),
        T.punct_ratio(c).alias("punct_ratio"),
        T.stopword_ratio(c).alias("stop_ratio"),
        T.avg_word_len(c).alias("avg_word_len"),
    )


_QUALITY_ORACLE = f"""
    WITH base AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '{T.WS_RE}')) AS BIGINT)      AS wc,
               CAST(length(text) AS BIGINT)                                          AS len,
               CAST(len(regexp_extract_all(lower(text), '{T.LANG_STOPWORDS["en"]}')) AS BIGINT) AS sc,
               CAST(len(regexp_extract_all(text, '{T.PUNCT_RE}')) AS BIGINT)         AS pc,
               CAST(list_sum(list_transform(string_split_regex(trim(text), '{T.WS_RE}'),
                                            w -> length(w))) AS BIGINT)              AS aww
        FROM documents
    )
    SELECT doc_id,
           ((2000000 * least(20 * wc * len,
                             greatest(0, 10 * wc * len + 40 * sc * len
                                         - 60 * pc * wc - len * abs(aww - 5 * wc)))
             + 20 * wc * len)
            // (2 * 20 * wc * len)) / 1000000.0 AS quality
    FROM base
"""


@query("q14_quality_score", oracle=_QUALITY_ORACLE)
def q14_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document quality heuristic in [0,1]."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.quality_score(F.col("text")).alias("quality"))


_LANG_CASES = " ".join(
    f"len(regexp_extract_all(lower(text), '{pat}')) AS {lang}_hits,"
    for lang, pat in T.LANG_STOPWORDS.items()
)

_LANG_ORACLE = f"""
    WITH scored AS (
        SELECT doc_id, lang, {_LANG_CASES.rstrip(',')}
        FROM documents
    )
    SELECT doc_id, lang,
           CAST(en_hits AS BIGINT) AS en_hits,
           CAST(de_hits AS BIGINT) AS de_hits,
           CAST(fr_hits AS BIGINT) AS fr_hits,
           CAST(es_hits AS BIGINT) AS es_hits,
           CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
                WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
                WHEN fr_hits >= es_hits THEN 'fr'
                ELSE 'es' END AS lang_pred
    FROM scored
"""


@query("q14_lang_id", oracle=_LANG_ORACLE)
def q14_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-inventory language heuristic with deterministic argmax."""
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    s = T.lang_scores(c)
    return docs.select(
        "doc_id",
        "lang",
        s["en"].alias("en_hits"),
        s["de"].alias("de_hits"),
        s["fr"].alias("fr_hits"),
        s["es"].alias("es_hits"),
        T.predicted_lang(c).alias("lang_pred"),
    )


_FP_ORACLE = f"""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '{T.WS_RE}', ' ', 'g')) AS fp
    FROM documents
"""


@query("q14_fingerprint", oracle=_FP_ORACLE)
def q14_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of normalized text) per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))


@query("qz14_redact", oracle=None)
def qz14_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus: emails / phone-shaped numbers /
    IPv4 literals replaced with typed placeholder tags (the scrub step
    before training-data emission).

    Registered rows-only because the driver's 50 oracle-backed slots are
    spoken for (SURVEY §2.3 naming contract); the SAME patterns are
    DuckDB-differential-tested in tests/test_text_redact.py, so the
    redaction is still hash-verified — just via pytest rather than the
    driver.  Pure regexp_replace chain: zero shuffles, codegen'd scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    red = T.redact_pii(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(F.encode(red, "UTF-8")).alias("redacted_fp"),
        (red != F.col("text")).cast("long").alias("was_redacted"),
    )


CHUNK_WORDS = 32
CHUNK_STRIDE = 24  # 8-word overlap between consecutive chunks

_CHUNK_ORACLE = f"""
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '{{WS}}') AS ws
        FROM documents WHERE text IS NOT NULL
    ),
    s AS (
        SELECT doc_id, ws,
               unnest(generate_series(0, greatest(len(ws) - 1, 0),
                                      {CHUNK_STRIDE})) AS start
        FROM w
    )
    SELECT doc_id,
           CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(len(ws[start + 1 : start + {CHUNK_WORDS}]) AS BIGINT)
               AS n_words_chunk,
           array_to_string(ws[start + 1 : start + {CHUNK_WORDS}], ' ')
               AS chunk_text
    FROM s
"""


@query("qz14_chunk", oracle=_CHUNK_ORACLE.replace("{WS}", T.WS_RE))
def qz14_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking: overlapping word windows (32 words, stride 24)
    — the tokenize-and-pack step between a cleaned corpus and a training
    run, as a query.  One narrow explode (rows × ~n_words/stride), no
    shuffle; chunk boundaries are deterministic functions of the word
    array, so the operator parallelizes per document with zero state.
    qz-prefixed (the driver's 50 oracle slots are spoken for) but fully
    oracle-backed: the differential sweep in tests/test_relational.py
    hash-checks it against the DuckDB mirror above.  NULL-text docs are
    dropped (no words → no windows; the oracle filters identically).
    """
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    ws = T.words(F.col("text"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(ws) - 1, F.lit(0)), F.lit(CHUNK_STRIDE)
    )
    d = docs.select("doc_id", ws.alias("ws"), F.explode(starts).alias("start"))
    chunk = F.slice(F.col("ws"), F.col("start") + 1, F.lit(CHUNK_WORDS))
    return d.select(
        "doc_id",
        (F.col("start") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_words_chunk"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def _rep_sql(n: int) -> str:
    """DuckDB repeated-n-gram fraction from the shared word split."""
    concat = " || ' ' || ".join(f"ws[i+{j}]" for j in range(n))
    g = f"list_transform(generate_series(1, len(ws) - {n - 1}), i -> {concat})"
    return (
        f"CASE WHEN len(ws) >= {n} THEN "
        f"round(1 - len(list_distinct({g})) / CAST(len({g}) AS DOUBLE), 6) "
        f"ELSE 0.0 END"
    )


_REPETITION_ORACLE = f"""
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '{{WS}}') AS ws
        FROM documents
    )
    SELECT doc_id,
           round(1 - len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE), 6) AS rep1,
           {_rep_sql(2)} AS rep2,
           {_rep_sql(3)} AS rep3
    FROM w
"""


def _rep_col(n: int) -> F.Column:
    """Spark repeated-n-gram fraction over the bound ``ws`` column."""
    concat = ", ".join(f"ws[i+{j}]" for j in range(n))
    grams = F.expr(
        f"transform(sequence(0, size(ws) - {n}), i -> concat_ws(' ', {concat}))"
    )
    frac = 1 - F.size(F.array_distinct(grams)) / F.size(grams).cast("double")
    return F.when(F.size(F.col("ws")) >= n, F.round(frac, 6)).otherwise(
        F.lit(0.0)
    )


@query("qz14_repetition", oracle=_REPETITION_ORACLE.replace("{WS}", T.WS_RE))
def qz14_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals: fraction of duplicated words / 2-grams
    / 3-grams per document (the Gopher-style "repetitious text" filters
    used to drop boilerplate and spam from training corpora).  Pure
    array expressions over the shared word split — zero shuffles, one
    codegen span; n-gram guards keep Spark's descending-sequence edge
    (size < n) at exactly 0.0 on both sides.  qz-prefixed but fully
    oracle-backed via the pytest differential sweep.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = T.words(F.col("text"))
    rep1 = F.round(
        1 - F.size(F.array_distinct(F.col("ws"))) / F.size(F.col("ws")).cast("double"),
        6,
    )
    return docs.select("doc_id", ws.alias("ws")).select(
        "doc_id",
        rep1.alias("rep1"),
        _rep_col(2).alias("rep2"),
        _rep_col(3).alias("rep3"),
    )


SEQ_BUDGET_WORDS = 256  # packing budget per training sequence


@query("qz14_pack", oracle=None)
def qz14_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: greedily pack the qz14_chunk windows into
    training sequences of ≤ SEQ_BUDGET_WORDS words — the step between a
    chunked corpus and a fixed-context training run (short pieces
    concatenated up to the budget so no context window ships half
    empty).

    Scale shape: packing is PER-PARTITION imperative logic — the one
    place the mapInPandas tier is genuinely required (a greedy fold has
    loop-carried state no relational operator expresses).  Each Arrow
    batch folds into an open bin carried across batches; sequence ids
    are (partition_id << 32 | local_seq), so partitions pack fully
    independently — no shuffle, no coordination, and the waste bound is
    one partial tail sequence per partition.  Global bin packing would
    be NP-hard and serial; per-partition greedy is the standard
    trade and the fill-rate gate (pytest) pins its efficiency.
    Rows-only: output partitioning is intentionally engine-defined.
    """
    chunks = qz14_chunk(spark, sf_dir).select(
        "doc_id", "chunk_id", "n_words_chunk", "chunk_text"
    )

    def pack(batches):  # pragma: no cover - executed on executors
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seq = 0
        members: list[str] = []
        words = 0
        chunks_n = 0

        def flush():
            nonlocal seq, members, words, chunks_n
            row = {
                "seq_id": (pid << 32) | seq,
                "n_chunks": chunks_n,
                "n_words": words,
                "text": " ".join(members),
            }
            seq += 1
            members, words, chunks_n = [], 0, 0
            return row

        out: list[dict] = []
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                if words + r.n_words_chunk > SEQ_BUDGET_WORDS and chunks_n:
                    out.append(flush())
                members.append(r.chunk_text)
                words += int(r.n_words_chunk)
                chunks_n += 1
            if out:
                yield pd.DataFrame(out)
                out = []
        if chunks_n:
            yield pd.DataFrame([flush()])

    return chunks.mapInPandas(
        pack, "seq_id long, n_chunks long, n_words long, text string"
    )


# --- BM25 keyword retrieval -------------------------------------------------

BM25_TERMS = ("spark", "join", "window", "hash")  # the standing query
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def _bm25_oracle() -> str:
    """DuckDB mirror generated from the SAME constants/tokenization as the
    Spark side — formula parenthesization is kept textually identical so
    both engines evaluate the IEEE operations in the same order (the only
    tolerated divergence is a possible 1-ulp ``ln`` libm difference,
    annihilated by the shared round-to-6)."""
    toks = f"string_split_regex(trim(text), '{T.WS_RE}')"
    tf = ",\n               ".join(
        f"len(list_filter({toks}, w -> w = '{t}')) AS tf{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df = ",\n               ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(BM25_TERMS))
    )
    terms = "\n             + ".join(
        f"ln(1 + (n - df{i} + 0.5) / (df{i} + 0.5)) * tf{i} * {BM25_K1 + 1!r}"
        f" / (tf{i} + {BM25_K1!r} * ({1 - BM25_B!r} + {BM25_B!r} * dl / avgdl))"
        for i in range(len(BM25_TERMS))
    )
    return f"""
    WITH tf AS (
        SELECT doc_id,
               len({toks}) AS dl,
               {tf}
        FROM documents
    ),
    stats AS (
        SELECT count(*) AS n, avg(dl) AS avgdl,
               {df}
        FROM tf
    )
    SELECT doc_id, round(s, 6) AS bm25
    FROM (
        SELECT doc_id,
               {terms} AS s
        FROM tf, stats
    )
    ORDER BY round(s, 6) DESC, doc_id
    LIMIT {BM25_TOPK}
"""


@query("qz14_bm25", oracle=_bm25_oracle())
def qz14_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k keyword retrieval over ``documents`` — the standing
    lexical-search primitive a curation pipeline uses to pull topical
    slices out of a crawl (Robertson/Sparck Jones BM25, k1=1.2 b=0.75).

    Scale shape: two narrow passes over the corpus — pass 1 reduces to
    ONE row of corpus statistics (N, avgdl, per-term document
    frequencies) via map-side partial aggregation; pass 2 re-scans,
    broadcast-crosses that single row back in, scores each document in
    one codegen span, and takes top-k as per-partition heap + driver
    merge (TakeOrderedAndProject — no global sort, no shuffle of the
    corpus at any point).  Term frequencies are array expressions over
    the shared whitespace split, not an exploded posting list: the
    standing-query case (few terms) never materializes doc×term rows.
    At 100 TB both passes stream at parquet-scan speed.

    qz-prefixed but fully oracle-backed via the pytest differential
    sweep (driver-slot naming contract, SURVEY.md §2.3).
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = T.words(F.col("text"))
    nt = len(BM25_TERMS)

    def tf_col(t: str):
        # single-arg lambda only: a 2-arg lambda would be bound as
        # (element, index) by F.filter and compare tokens to positions
        return F.size(F.filter(ws, lambda w: w == F.lit(t))).cast("long")

    base = docs.select(
        "doc_id",
        F.size(ws).cast("long").alias("dl"),
        *[tf_col(t).alias(f"tf{i}") for i, t in enumerate(BM25_TERMS)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(nt)
        ],
    )

    def term(i: int):
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log(F.lit(1) + (F.col("n") - df + F.lit(0.5)) / (df + F.lit(0.5)))
        return (
            idf
            * tf
            * F.lit(BM25_K1 + 1)
            / (
                tf
                + F.lit(BM25_K1)
                * (F.lit(1 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl"))
            )
        )

    score = term(0)
    for i in range(1, nt):
        score = score + term(i)
    # Top-k selection runs on the ROUNDED score (ADVICE r5): the raw
    # Spark-vs-DuckDB scores can differ by 1 ulp of libm ln, and two
    # docs straddling the k-th boundary within that ulp would make the
    # engines pick different row sets.  round(,6) annihilates the
    # divergence, so it must be the selection key, not just the
    # published value.
    return (
        base.crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(BM25_TOPK)
    )


# --- vocabulary encoding ----------------------------------------------------

VOCAB_SIZE = 500  # top-V corpus words become ids 1..V; 0 = OOV


def _vocab_encode_oracle() -> str:
    toks = f"string_split_regex(trim(text), '{T.WS_RE}')"
    return f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(tk) AS w,
               unnest(range(1, len(tk) + 1)) AS pos
        FROM (SELECT doc_id, {toks} AS tk FROM documents)
    ),
    vocab AS (
        SELECT w, row_number() OVER (ORDER BY n DESC, w) AS tok_id
        FROM (SELECT w, count(*) AS n FROM tok GROUP BY w)
        ORDER BY n DESC, w
        LIMIT {VOCAB_SIZE}
    )
    SELECT t.doc_id, list(coalesce(v.tok_id, 0) ORDER BY t.pos) AS ids
    FROM tok t LEFT JOIN vocab v USING (w)
    GROUP BY t.doc_id
"""


@query("qz14_vocab_encode", oracle=_vocab_encode_oracle())
def qz14_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary encoding — the step between a curated corpus and a
    training run: build a frequency-ranked vocabulary (top-V words,
    ids 1..V by count desc / word asc; 0 = OOV) and encode every
    document as its id sequence, order-preserved.

    Scale shape: the vocabulary is a corpus-wide word count REDUCED
    map-side (partial aggregation means the shuffle carries one row per
    distinct word per partition, not one per token) and capped to V via
    TakeOrderedAndProject; the rank-assigning window then runs over
    only V rows.  Encoding broadcasts that V-row dictionary against the
    exploded token stream — the corpus-sized side never shuffles for
    the join — and the per-document re-aggregation is ONE shuffle keyed
    by doc_id, with position order restored by sorting (pos, id) structs
    inside the row (collect_list order is otherwise engine-undefined —
    relying on it would be a silent-corruption bug under AQE re-plans).
    At 100 TB: two shuffles total (word-count reduce, doc re-agg), both
    over narrow rows.

    qz-prefixed but fully oracle-backed via the pytest differential
    sweep (zipped-unnest + list(... ORDER BY pos) on the DuckDB side).
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    ws = T.words(F.col("text"))
    tok = docs.select("doc_id", F.posexplode(ws).alias("pos0", "w")).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "w"
    )
    counts = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    # limit first: the rank window then sorts V rows, not the whole count
    vocab = (
        counts.orderBy(F.desc("n"), "w")
        .limit(VOCAB_SIZE)
        .select(
            "w",
            F.row_number()
            .over(Window.orderBy(F.desc("n"), "w"))
            .cast("long")
            .alias("tok_id"),
        )
    )
    enc = tok.join(F.broadcast(vocab), "w", "left").select(
        "doc_id", "pos", F.coalesce("tok_id", F.lit(0).cast("long")).alias("tid")
    )
    return enc.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tid"))),
            lambda s: s.getField("tid"),
        ).alias("ids")
    )


# --- unigram language-model scoring ----------------------------------------

LM_VOCAB = 500  # top-V corpus words form the unigram model; rest are OOV


def _unigram_logprob_oracle() -> str:
    toks = f"string_split_regex(trim(text), '{T.WS_RE}')"
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest({toks}) AS w FROM documents
    ),
    stats AS (SELECT count(*) AS n_total FROM tok),
    vocab AS (
        SELECT w, c FROM (SELECT w, count(*) AS c FROM tok GROUP BY w)
        ORDER BY c DESC, w LIMIT {LM_VOCAB}
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(ln((coalesce(v.c, 0) + 1.0)
                        / (s.n_total + {LM_VOCAB} + 1))), 6) AS avg_logprob
    FROM tok t LEFT JOIN vocab v USING (w), stats s
    GROUP BY t.doc_id
"""


@query("qz14_unigram_logprob", oracle=_unigram_logprob_oracle())
def qz14_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring — the perplexity-style quality
    signal data-curation pipelines filter on (CCNet/Gopher lineage:
    score each document under a corpus-level LM; gibberish, boilerplate
    and wrong-language text score far below fluent prose).  Here the LM
    is the corpus' own top-``LM_VOCAB`` unigram distribution with
    add-one smoothing; the signal is mean token log-probability.

    Scale shape — the same two-narrow-pass discipline as BM25/vocab:
    pass 1 reduces the token stream to ONE total-count row plus a
    V-row top-vocabulary (map-side partial counts; TakeOrdered caps at
    V); pass 2 re-scans, joins the BROADCAST vocabulary + stats onto
    the exploded tokens (the corpus-sized side never shuffles), and
    re-aggregates per document — one shuffle keyed by doc_id carrying
    (doc_id, logprob) pairs.  At 100 TB: two token-stream passes, two
    narrow shuffles, model ships as a V-row broadcast.

    qz-prefixed but fully oracle-backed via the pytest differential
    sweep (DuckDB twin of the tokenizer, vocabulary, and smoothing).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(T.words(F.col("text"))).alias("w"))
    stats = tok.agg(F.count(F.lit(1)).alias("n_total"))
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(LM_VOCAB)
    )
    lp = F.log(
        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
        / (F.col("n_total") + F.lit(LM_VOCAB + 1))
    )
    return (
        tok.join(F.broadcast(vocab), "w", "left")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(lp), 6).alias("avg_logprob"),
        )
    )


HH_K = 20  # heavy-hitter report size
HH_TRACKED = 8192  # sketch capacity per partial (bounds shuffle + memory)


@query("qz9_heavy_hitters", oracle=None)
def qz9_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: the K most frequent words in the corpus via the
    ``approx_top_k`` sketch (qz9 sketch family, beside HLL++ distinct
    and approximate percentiles).

    Why a sketch and not the exact word count: the exact top-K shuffles
    one row per distinct word per partition — fine for words, ruinous
    for high-cardinality keys (URLs, n-grams, user ids).  The sketch
    caps every partial at HH_TRACKED entries, so shuffle volume is
    O(partitions × HH_TRACKED) regardless of key cardinality, and
    partials merge associatively.  At test scale the corpus vocabulary
    fits inside HH_TRACKED, making the sketch EXACT — the pytest gate
    exploits that: every reported count must equal the exact count, and
    every strict heavy hitter (exact count above the exact K-th count)
    must appear, tie-order-independently.  Rows-only at the driver
    (sketch output; DuckDB has no equivalent).
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = T.words(F.col("text"))
    tok = docs.select(F.explode(ws).alias("w"))
    sketch = tok.agg(
        F.expr(f"approx_top_k(w, {HH_K}, {HH_TRACKED})").alias("top")
    )
    return sketch.select(F.explode("top").alias("e")).select(
        F.col("e.item").alias("word"),
        F.col("e.count").cast("long").alias("n"),
    )


# --- composite curation filter ----------------------------------------------

FILTER_QUALITY_MIN = 0.5  # drop below (≈ p25-p50 of the corpus)
FILTER_REP3_MAX = 0.1  # drop above: heavy 3-gram repetition
FILTER_LANG = "en"  # corpus language target


def _filter_pipeline_oracle() -> str:
    toks = f"string_split_regex(trim(text), '{T.WS_RE}')"
    return f"""
    WITH w AS (
        SELECT doc_id, text, {toks} AS ws FROM documents
    ),
    scored AS (
        SELECT doc_id,
               {_LANG_CASES.rstrip(',')},
               ((2000000 * least(20 * wc * len,
                                 greatest(0, 10 * wc * len + 40 * sc * len
                                             - 60 * pc * wc - len * abs(aww - 5 * wc)))
                 + 20 * wc * len)
                // (2 * 20 * wc * len)) / 1000000.0 AS quality,
               {_rep_sql(3)} AS rep3
        FROM (
            SELECT doc_id, text, ws,
                   CAST(len(ws) AS BIGINT) AS wc,
                   CAST(length(text) AS BIGINT) AS len,
                   CAST(len(regexp_extract_all(lower(text), '{T.LANG_STOPWORDS["en"]}')) AS BIGINT) AS sc,
                   CAST(len(regexp_extract_all(text, '{T.PUNCT_RE}')) AS BIGINT) AS pc,
                   CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT) AS aww
            FROM w
        )
    ),
    verdict AS (
        SELECT doc_id, quality, rep3,
               CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
                    WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
                    WHEN fr_hits >= es_hits THEN 'fr'
                    ELSE 'es' END AS lang_pred
        FROM scored
    )
    SELECT doc_id, lang_pred, quality, rep3,
           CASE WHEN lang_pred <> '{FILTER_LANG}' THEN 'lang'
                WHEN quality < {FILTER_QUALITY_MIN} THEN 'quality'
                WHEN rep3 > {FILTER_REP3_MAX} THEN 'repetition'
                ELSE 'ok' END AS reason,
           (CASE WHEN lang_pred <> '{FILTER_LANG}' THEN 'lang'
                 WHEN quality < {FILTER_QUALITY_MIN} THEN 'quality'
                 WHEN rep3 > {FILTER_REP3_MAX} THEN 'repetition'
                 ELSE 'ok' END) = 'ok' AS keep
    FROM verdict
"""


@query("qz14_filter_pipeline", oracle=_filter_pipeline_oracle())
def qz14_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation recipe as ONE operator: language gate → quality gate
    → repetition gate, with a per-document keep/drop verdict and the
    FIRST failing rule as the reason (the C4/Gopher-style filter
    cascade a training pipeline actually runs, plus the audit column
    that tells you WHY a document died — the observability half most
    filter recipes drop).

    Scale shape: every signal (stopword-argmax lang id, integer-exact
    quality score, repeated-3-gram fraction) is a column expression
    over one shared scan and word split — zero shuffles, zero joins,
    zero Python; the whole cascade is a single WholeStageCodegen span
    that streams at parquet-read speed and rides predicate pushdown
    when composed (``.where("keep")`` prunes at the scan).  Fully
    oracle-backed via the pytest differential sweep: DuckDB computes
    the identical cascade from the same shared regex/arithmetic
    constants.
    """
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    base = docs.select(
        "doc_id",
        T.predicted_lang(c).alias("lang_pred"),
        T.quality_score(c).alias("quality"),
        T.words(c).alias("ws"),
    ).select("doc_id", "lang_pred", "quality", _rep_col(3).alias("rep3"))
    reason = (
        F.when(F.col("lang_pred") != FILTER_LANG, "lang")
        .when(F.col("quality") < FILTER_QUALITY_MIN, "quality")
        .when(F.col("rep3") > FILTER_REP3_MAX, "repetition")
        .otherwise("ok")
    )
    return base.select(
        "doc_id",
        "lang_pred",
        "quality",
        "rep3",
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


# --- markup stripping / link extraction -------------------------------------


def _markup_extract_oracle() -> str:
    return f"""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(text, '{T.TAG_RE}', ' ', 'g'),
                                   '{T.WS_RE}', ' ', 'g'))) AS clean_fp,
           CAST(length(text)
                - length(regexp_replace(text, '{T.TAG_RE}', '', 'g')) AS BIGINT)
               AS markup_chars,
           CAST(len(regexp_extract_all(text, '{T.URL_RE}')) AS BIGINT) AS n_links,
           regexp_extract_all(text, '{T.URL_RE}') AS links
    FROM documents
"""


@query("qz14_markup_extract", oracle=_markup_extract_oracle())
def qz14_markup_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup stripping + link extraction — the first pass a crawled
    corpus takes before any of the Q14 text analysis applies: remove
    angle-bracket markup (fingerprinted so the differential check stays
    narrow), measure how much of the document WAS markup (a strong
    boilerplate/quality signal: markup_chars ≈ 0 for prose, huge for
    nav-heavy pages), and pull out the outbound links (the seed stream
    for crawl frontier / link-graph work).

    Single codegen pass, no shuffle, no UDF — regexp_replace /
    regexp_extract_all are JVM-side; patterns stay in the shared
    java-regex∩RE2 subset (functions/text.py) so the DuckDB twin runs
    the identical strings.  qz-prefixed but fully oracle-backed via the
    pytest differential sweep.
    """
    docs = load_table(spark, sf_dir, "documents")
    txt = F.col("text")
    return docs.select(
        "doc_id",
        F.md5(T.strip_markup(txt)).alias("clean_fp"),
        (
            F.length(txt) - F.length(F.regexp_replace(txt, T.TAG_RE, ""))
        ).cast("long").alias("markup_chars"),
        F.size(T.extract_urls(txt)).cast("long").alias("n_links"),
        T.extract_urls(txt).alias("links"),
    )


# ---------------------------------------------------------------------------
# qz14_tfidf_keywords — per-document keyword extraction by tf-idf
# ---------------------------------------------------------------------------

TFIDF_TOP_TERMS = 3

_TFIDF_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
        WHERE trim(text) <> ''
    ),
    tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM toks GROUP BY term
    ),
    n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM toks),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               round(tf.tf * (ln((CAST(n.n_docs AS DOUBLE) + 1.0)
                                 / (CAST(df.df AS DOUBLE) + 1.0)) + 1.0),
                     6) AS score
        FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, term) AS rnk
        FROM scored
    )
    SELECT doc_id, term, tf, score, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {TFIDF_TOP_TERMS}
    """


@query("qz14_tfidf_keywords", oracle=_TFIDF_ORACLE)
def qz14_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TFIDF_TOP_TERMS} tf-idf keywords per document — the classic
    document-signature / tagging pass (Salton & Buckley 1988 weighting,
    smoothed idf = ln((N+1)/(df+1)) + 1 so no term hits idf 0).

    Plan: one (doc, term) count shuffle for tf; term document-frequency
    is a VOCABULARY-sized aggregate that joins back broadcast (a natural
    corpus has ~1e5-1e7 terms — always the small side against a 100 TB
    token stream); N is a 1-row broadcast; per-doc top-k is
    WindowGroupLimit (rank pushed into the shuffle, never a full sort
    per group).  Scores are rounded BEFORE the rank so selection never
    rides a last-ulp ln divergence between engines (the bm25 lesson).
    Fully oracle-backed via the pytest differential sweep.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.where(F.trim(F.col("text")) != "")
        .select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
        )
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfq = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = toks.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs").cast("double") + 1.0)
                        / (F.col("df").cast("double") + 1.0)
                    )
                    + 1.0
                ),
                6,
            ).alias("score"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TFIDF_TOP_TERMS)
        .select("doc_id", "term", "tf", "score", "rnk")
    )


# ---------------------------------------------------------------------------
# qz14_classifier_score — linear quality-classifier scoring (model inference
# as codegen)
# ---------------------------------------------------------------------------

# Stand-in for published fastText-style quality-classifier weights
# (the CCNet/FineWeb "model filter" stage): fixed public constants over
# interpretable features, so inference is reproducible on any engine.
CLF_WEIGHTS = (2.0, -8.0, 0.35, -0.15)
CLF_BIAS = -1.2

_CLF_ORACLE = f"""
    WITH feats AS (
        SELECT doc_id,
               round(len(regexp_extract_all(lower(text), '{T.LANG_STOPWORDS["en"]}'))
                     / CAST(len(string_split_regex(trim(text), '{T.WS_RE}')) AS DOUBLE),
                     6) AS f_stop,
               round(len(regexp_extract_all(text, '{T.PUNCT_RE}'))
                     / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS f_punct,
               round(ln(1.0 + len(string_split_regex(trim(text), '{T.WS_RE}'))), 6)
                   AS f_logwc,
               round(list_sum(list_transform(string_split_regex(trim(text), '{T.WS_RE}'),
                                             w -> length(w)))
                     / CAST(len(string_split_regex(trim(text), '{T.WS_RE}')) AS DOUBLE),
                     6) AS f_aww
        FROM documents
        WHERE text IS NOT NULL
    )
    SELECT doc_id, f_stop, f_punct, f_logwc, f_aww,
           round(1.0 / (1.0 + exp(-({CLF_WEIGHTS[0]} * f_stop
                                     + {CLF_WEIGHTS[1]} * f_punct
                                     + {CLF_WEIGHTS[2]} * f_logwc
                                     + {CLF_WEIGHTS[3]} * f_aww
                                     + {CLF_BIAS}))), 6) AS clf_score
    FROM feats
    """


@query("qz14_classifier_score", oracle=_CLF_ORACLE)
def qz14_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model inference as a map-only pass: a linear quality classifier
    (the fastText-filter stage every public LLM-data pipeline runs —
    CCNet, RedPajama, FineWeb) scored entirely in whole-stage codegen.

    Features (stopword ratio, punctuation density, log word count,
    mean word length) are each rounded to 6dp BEFORE the dot product so
    both engines feed the sigmoid identical doubles; weights live in a
    broadcast-style literal array and the dot product is
    ``zip_with`` + ``aggregate`` — the exact shape a real exported
    linear model (N weights instead of 4) would use, with the weights
    array coming from a broadcast variable instead of a literal.  No
    UDF, no Python: scoring a 100 TB corpus is one scan at IO speed.
    Fully oracle-backed.
    """
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    txt = F.col("text")
    ws = T.words(txt)
    wc = F.size(ws).cast("double")
    f_stop = F.round(T.stopword_count(txt, "en") / wc, 6)
    f_punct = F.round(
        T.punct_count(txt) / F.greatest(F.length(txt), F.lit(1)).cast("double"), 6
    )
    f_logwc = F.round(F.log(1.0 + wc), 6)
    f_aww = F.round(
        F.aggregate(
            F.transform(ws, lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        / wc,
        6,
    )
    feats = docs.select(
        "doc_id",
        f_stop.alias("f_stop"),
        f_punct.alias("f_punct"),
        f_logwc.alias("f_logwc"),
        f_aww.alias("f_aww"),
    )
    x = F.array("f_stop", "f_punct", "f_logwc", "f_aww")
    w = F.array(*[F.lit(v) for v in CLF_WEIGHTS])
    z = F.aggregate(
        F.zip_with(x, w, lambda xi, wi: xi * wi),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ) + F.lit(CLF_BIAS)
    return feats.withColumn("clf_score", F.round(1.0 / (1.0 + F.exp(-z)), 6))


# ---------------------------------------------------------------------------
# BPE-pair statistics — the first iteration of byte-pair-encoding
# tokenizer training (Sennrich et al., ACL 2016): global frequencies of
# adjacent character pairs, weighted by word frequency.
#
# Scale shape (the part worth pinning): pairs are expanded from the
# DISTINCT word table, not the corpus — the first shuffle carries one
# row per word occurrence (the unavoidable vocabulary fold), the second
# carries |vocab|×(avg_len−1) pair rows, which is corpus-size-INDEPENDENT.
# A naive per-occurrence pair explode would shuffle ~5× the corpus token
# count instead.  Top-k compiles to TakeOrderedAndProject (heap), never a
# global sort.
# ---------------------------------------------------------------------------

_BPE_PAIRS_ORACLE = r"""
    WITH words AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '{WS}')) AS w
      FROM documents WHERE text IS NOT NULL
    ),
    wc AS (
      SELECT w, count(*) AS c FROM words WHERE length(w) >= 2 GROUP BY 1
    ),
    pairs AS (
      SELECT substring(w, i, 2) AS pair, c
      FROM wc, unnest(generate_series(1, length(w) - 1)) AS t(i)
    )
    SELECT pair, CAST(sum(c) AS BIGINT) AS cnt
    FROM pairs GROUP BY 1
    ORDER BY cnt DESC, pair ASC
    LIMIT 50
"""


@query("qz14_bpe_pairs", oracle=_BPE_PAIRS_ORACLE.replace("{WS}", T.WS_RE))
def qz14_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent character pairs by corpus frequency (the BPE
    merge-candidate table): whitespace words, lowercased, pairs expanded
    from the distinct-word table weighted by occurrence count.
    Deterministic top-k: (cnt DESC, pair ASC)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    words = docs.select(
        F.explode(T.words(F.lower(F.col("text")))).alias("w")
    ).where(F.length("w") >= 2)
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    pairs = wc.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "c",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Collocation mining via pointwise mutual information (Church & Hanks,
# CL 1990) — which word pairs co-occur within a ±3 window far more often
# than their marginal frequencies predict (multiword expressions,
# boilerplate signatures, entity bigrams).
#
# Scale shape: the pair fan-out is ≤3 per token and expands INSIDE
# codegen (nested transform over the words array, flatten, explode) —
# no self-join on position, which is the naive formulation's quadratic
# trap.  Marginal counts broadcast back into the pair table; N (token
# count) is a 1-row broadcast fold.  PMI is computed on exact integer
# counts; ln noise lives at 1e-16, ten orders under the 6-dp grid.
# ---------------------------------------------------------------------------

_COLLOCATION_MIN_PAIR = 20


def _collocations_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT string_split_regex(lower(trim(text)), '{T.WS_RE}') AS ws
      FROM documents WHERE text IS NOT NULL
    ),
    pairs AS (
      SELECT ws[i] AS a, ws[j] AS b
      FROM toks, unnest(generate_series(1, len(ws) - 1)) t(i),
           unnest(generate_series(i + 1, least(i + 3, len(ws)))) u(j)
    ),
    pc AS (
      SELECT a, b, count(*) AS c_ab FROM pairs GROUP BY 1, 2
      HAVING count(*) >= {_COLLOCATION_MIN_PAIR}
    ),
    wc AS (
      SELECT unnest(ws) AS w FROM toks
    ),
    wcnt AS (SELECT w, count(*) AS c FROM wc GROUP BY 1),
    n AS (SELECT count(*) AS n_tokens FROM wc)
    SELECT a, b, c_ab,
           round(ln(CAST(c_ab AS DOUBLE) * n_tokens
                    / (wa.c * wb.c)), 6) AS pmi
    FROM pc
    JOIN wcnt wa ON wa.w = a
    JOIN wcnt wb ON wb.w = b
    CROSS JOIN n
    """


@query("qz14_collocations", oracle=_collocations_oracle())
def qz14_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed (±3) word-pair collocations with PMI, for pairs seen
    ≥{_COLLOCATION_MIN_PAIR} times: (a, b, c_ab, pmi).  Counts are
    exact integers in both engines, so the query is fully
    oracle-backed."""
    from frizzle_spark.operators.dedup import _docs_spread

    # the windowed-pair HOF below is the family's priciest per-row
    # expression and the corpus scans as ONE effective split locally
    # (single row group) — spread like the shingle family
    docs = _docs_spread(spark, sf_dir).where(F.col("text").isNotNull())
    toks = docs.select(T.words(F.lower(F.col("text"))).alias("ws"))
    pair_expr = F.expr(
        "flatten(transform(sequence(1, size(ws) - 1), i -> "
        "transform(sequence(i + 1, least(i + 3, size(ws))), j -> "
        "struct(element_at(ws, i) AS a, element_at(ws, j) AS b))))"
    )
    pairs = (
        toks.where(F.size("ws") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    pc = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= _COLLOCATION_MIN_PAIR)
    )
    wc = toks.select(F.explode("ws").alias("w"))
    wcnt = wc.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n = wc.agg(F.count(F.lit(1)).alias("n_tokens"))
    wa = wcnt.select(F.col("w").alias("wa_w"), F.col("c").alias("c_a"))
    wb = wcnt.select(F.col("w").alias("wb_w"), F.col("c").alias("c_b"))
    return (
        pc.join(F.broadcast(wa), F.col("a") == F.col("wa_w"))
        .join(F.broadcast(wb), F.col("b") == F.col("wb_w"))
        .crossJoin(F.broadcast(n))
        .select(
            "a",
            "b",
            "c_ab",
            F.round(
                F.log(
                    F.col("c_ab").cast("double")
                    * F.col("n_tokens")
                    / (F.col("c_a") * F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# Readability scoring — Flesch reading ease (Flesch 1948) with the
# standard computable proxies: sentences = runs of [.!?] (min 1),
# syllables = vowel-group runs per lowercased text.  The exact constants
# and evaluation order are mirrored in the oracle so the doubles agree
# bit-for-bit (integer counts → two divisions → one linear combination).
# A curation pipeline thresholds this to drop both word-salad (score
# ≪ 0) and telegraphic fragments (score > 100).
# Scale: map-only codegen (split/regexp counts), no shuffle at all.
# ---------------------------------------------------------------------------

_READABILITY_ORACLE = r"""
    WITH d AS (
      SELECT doc_id, trim(text) AS t
      FROM documents WHERE text IS NOT NULL
    ),
    c AS (
      SELECT doc_id,
             CAST(len(string_split_regex(t, '{WS}')) AS BIGINT) AS words,
             CAST(greatest(len(regexp_extract_all(t, '[.!?]+')), 1) AS BIGINT)
               AS sentences,
             CAST(len(regexp_extract_all(lower(t), '[aeiouy]+')) AS BIGINT)
               AS syllables
      FROM d
    )
    SELECT doc_id, words, sentences, syllables,
           round(206.835
                 - 1.015 * (words / CAST(sentences AS DOUBLE))
                 - 84.6 * (syllables / CAST(words AS DOUBLE)), 4) AS flesch
    FROM c WHERE words >= 1
"""


@query("qz14_readability", oracle=_READABILITY_ORACLE.replace("{WS}", T.WS_RE))
def qz14_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease per document with its integer components:
    (doc_id, words, sentences, syllables, flesch).  Map-only codegen;
    fully oracle-backed (identical constants and evaluation order)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    t = F.trim(F.col("text"))
    words = F.size(F.split(t, T.WS_RE)).cast("long")
    sentences = F.greatest(
        F.size(F.expr(r"regexp_extract_all(trim(text), '[.!?]+', 0)")), F.lit(1)
    ).cast("long")
    syllables = F.size(
        F.expr(r"regexp_extract_all(lower(trim(text)), '[aeiouy]+', 0)")
    ).cast("long")
    c = docs.select(
        "doc_id",
        words.alias("words"),
        sentences.alias("sentences"),
        syllables.alias("syllables"),
    ).where(F.col("words") >= 1)
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("words") / F.col("sentences").cast("double"))
        - F.lit(84.6) * (F.col("syllables") / F.col("words").cast("double"))
    )
    return c.select(
        "doc_id",
        "words",
        "sentences",
        "syllables",
        F.round(flesch, 4).alias("flesch"),
    )


_SOURCE_OVERLAP_ORACLE = f"""
    WITH vocab AS (
      SELECT DISTINCT source, token FROM (
        SELECT source,
               unnest(string_split_regex(trim(text), '{T.WS_RE}')) AS token
        FROM documents
      ) WHERE token <> ''
    ), sizes AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM vocab GROUP BY 1
    ), inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM vocab a JOIN vocab b
        ON a.token = b.token AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, n_common,
           round(CAST(n_common AS DOUBLE)
                 / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.source = inter.src_a
    JOIN sizes sb ON sb.source = inter.src_b
"""


@query("qz14_source_overlap", oracle=_SOURCE_OVERLAP_ORACLE)
def qz14_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-grain vocabulary overlap: exact Jaccard similarity of the
    distinct-token vocabularies of every SOURCE pair — the
    corpus-composition diagnostic (which feeds deduplicate? which
    sources are near-mirrors?) that the doc-grain dedup family never
    computes.

    Shape: inverted index at the CORPUS grain.  One explode+distinct
    collapses the text to (source, token); the pairwise intersection is
    an equi-join on token (shuffle carries tokens once), aggregated by
    source pair; vocabulary sizes broadcast back onto the ≤|S|² result.
    Nothing is ever all-pairs over documents — the pair lattice lives
    at the source grain, which is an organizational unit (10s–100s even
    at 100 TB).

    The quadratic risk is a token present in ALL sources (contributes
    |S|²/2 join rows): bounded by |S| being corpus-grain small; for
    catalog-scale |S| the df-capped variant (drop tokens in >cap
    sources, exact for the discriminative mass, the NGRAM_DF_CAP
    posture in operators/dedup.py) is the documented fallback.

    Tokenization is the module-wide whitespace convention (functions/
    text.py WS_RE) — textually identical in the oracle, no lowercasing
    (locale-dependent case folding is the one cross-engine hazard
    qz8_collation pins separately).
    """
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            "source", F.explode(T.words(F.col("text"))).alias("token")
        )
        .where(F.col("token") != "")
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = vocab.select(F.col("source").alias("src_a"), "token")
    b = vocab.select(F.col("source").alias("src_b"), "token")
    inter = (
        a.join(b, ["token"])
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
