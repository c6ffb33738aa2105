"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting — all as JVM column
expressions (no UDFs; these run over every document at 100 TB, so the
hot path must stay in whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny function-word profiles per language. A real system ships proper
# n-gram profiles; the *operator shape* (argmax over per-language
# evidence counts computed as array intersections) is what scales.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "and", "of", "to", "is", "in"),
    "es": ("el", "la", "los", "que", "es", "y"),
    "fr": ("le", "la", "les", "et", "est", "dans"),
    "zh": ("的", "是", "了", "在", "我", "不"),
}

STOPWORDS_EN = (
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
)


def _tokens(col: Column) -> Column:
    return F.split(F.trim(F.lower(col)), r"\s+")


def lang_scores(col: Column) -> list[Column]:
    """Per-language evidence: count of tokens that are that language's
    function words (array_intersect-free: size of filter)."""
    toks = _tokens(col)
    out = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        out.append(score.alias(f"score_{lang}"))
    return out


def lang_predict(score_cols: list[str]) -> Column:
    """argmax with deterministic ties: highest score wins, first
    language in sorted order breaks ties. Each column is paired with
    its language BY NAME (``score_<lang>``, the lang_scores naming) —
    positional zip against sorted(LANG_MARKERS) silently permuted
    every label when callers passed any other order; unknown names
    raise."""
    by_lang: dict[str, str] = {}
    for c in score_cols:
        lang = c.rsplit("_", 1)[-1]
        if not c.endswith(f"_{lang}") or lang not in LANG_MARKERS:
            raise ValueError(
                f"lang_predict: column {c!r} does not name a known "
                f"language (expected 'score_<lang>', langs: "
                f"{sorted(LANG_MARKERS)})"
            )
        by_lang[lang] = c
    langs = sorted(by_lang)
    best = F.greatest(*[F.col(c) for c in score_cols])
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when(F.col(by_lang[lang]) == best, F.lit(lang)).otherwise(pred)
    return F.when(best <= 0, F.lit("und")).otherwise(pred)


def token_count_ws(col: Column) -> Column:
    """Whitespace token count. CONVENTION: an empty or whitespace-only
    string splits to [''] and counts as 1 — the regexp-split behavior
    BOTH engines share, and the convention every oracle in this repo
    mirrors with len(regexp_split_to_array(trim(text), '\\s+')).
    Callers that must treat empty docs as 0-token (tf_idf, bm25) drop
    the '' pseudo-token explicitly at their explode instead — changing
    the convention here would silently shift every token-budget and
    profile oracle."""
    return F.size(F.split(F.trim(col), r"\s+"))


# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space
# symbol — the shape GPT-style tokenizers use before merges.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def token_count_bpe_ish(col: Column) -> Column:
    # group index 0 = whole match (Spark defaults to group 1, which
    # errors on group-free patterns)
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0))


def quality_features(col: Column) -> dict[str, Column]:
    """The standard cheap quality signals (length, mean word length,
    stopword density, punctuation density, alpha ratio)."""
    toks = _tokens(col)
    n_tok = F.size(toks)
    n_chars = F.length(col)
    stop = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_punct = F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))
    n_alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_tok_len": (n_alpha.cast("double") / F.greatest(n_tok, F.lit(1))),
        "stopword_ratio": (n_stop.cast("double") / F.greatest(n_tok, F.lit(1))),
        "punct_ratio": (n_punct.cast("double") / F.greatest(n_chars, F.lit(1))),
    }


def quality_flag(feats: dict[str, Column]) -> Column:
    """Gopher-style keep/drop heuristic over the cheap features."""
    return (
        (feats["n_tokens"] >= 10)
        & (feats["mean_tok_len"] >= 2.0)
        & (feats["mean_tok_len"] <= 12.0)
        & (feats["punct_ratio"] <= 0.2)
    )


def fingerprint(col: Column) -> Column:
    """Normalization-invariant document fingerprint: md5 of the
    lower-cased, whitespace-collapsed text. Robust to the formatting
    jitter that defeats raw content hashes."""
    norm = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.md5(norm)


def tf_idf(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_k: int = 5,
) -> DataFrame:
    """Top-k TF-IDF terms per document (smoothed idf:
    ln((N+1)/(df+1)) + 1, sklearn's convention).

    Shuffle inventory at scale: one exchange for per-doc term counts,
    one for document frequencies (count-distinct by term collapses
    map-side first because tf is already one row per (doc, term)), one
    window for per-doc top-k. The term→df join is NOT hinted broadcast
    — the vocabulary is corpus-sized at 100 TB; AQE converts it to a
    broadcast at runtime when it is actually small. Only the 1-row
    corpus count is broadcast unconditionally. Scores are rounded to 4
    decimals BEFORE ranking so the top-k cut is engine-portable
    (log() last-ulp jitter never reorders)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    ).where(F.col("term") != "")  # ''/NULL docs split to [''] — not a term
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.count(F.lit(1)).alias("n"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                    + F.lit(1.0)
                ),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k)
        .select("doc_id", "term", "tf", "tfidf", "rn")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into overlapping token windows (context-window
    prep): chunk c covers tokens [1 + c·(chunk-overlap), …], the last
    window may be short, and a document shorter than one window yields
    exactly one chunk. Pure array built-ins — the windows are produced
    INSIDE the row (sequence of starts → slice → concat), so the only
    data movement is the final explode; nothing shuffles.

    At 100 TB this is the shape you want: chunking is embarrassingly
    row-parallel, and emitting (doc_id, chunk_id) keys up front lets
    the downstream tokenize/embed stages partition on chunks, not
    documents, which evens out long-document skew."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    # a NULL text previously fabricated a phantom chunk (size(NULL) is
    # NULL, greatest/least SKIP nulls → starts=[1], chunk_text='' and a
    # claimed n_tokens of a full window) — downstream packing would
    # budget chunk_tokens nonexistent tokens per NULL doc
    df = df.where(F.col(text_col).isNotNull())
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # guard: sequence(1, 0) would be DESCENDING, not empty
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks) - F.lit(overlap), F.lit(1)), F.lit(step)
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            F.concat_ws(" ", F.slice(toks, s, chunk_tokens)).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens), F.size(toks) - s + F.lit(1)
            ).alias("n_tokens"),
        ),
    )
    out = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(chunks).alias("chunk_id", "c")
    )
    return out.select(
        "doc_id",
        "chunk_id",
        F.col("c.start").alias("start_token"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_tokens").alias("n_tokens"),
    )


def repetition_ratio(col: Column, n: int = 3) -> Column:
    """Intra-document repetition: 1 − distinct/total word n-grams —
    the standard boilerplate/spam signal (near-0 for natural prose,
    →1 for looped templates). Pure in-row array expressions: the
    n-gram list never leaves its row, zero shuffle. Documents shorter
    than ``n`` tokens score 0.0 (nothing can repeat)."""
    from full_docker_etl_spark.operators.dedup import tokens, word_ngrams

    # The gram ARRAY must appear exactly once in the expression tree:
    # referencing it from when()/size()/array_distinct separately lets
    # CollapseProject inline the whole n-gram construction per
    # reference (~3x the work — measured 3x slower at sf0.1).
    # total comes from the token count instead (no gram strings
    # needed), so only the distinct count touches the array.
    total = F.greatest(F.size(tokens(col)) - (n - 1), F.lit(0))
    distinct = F.size(F.array_distinct(word_ngrams(col, n)))
    return F.when(
        total > 0,
        F.round(1.0 - distinct / total.cast("double"), 4),
    ).otherwise(F.lit(0.0))


# PII patterns kept to the Java-regex ∩ RE2 common subset (no
# lookaround, no backreferences) so the exact same strings run on
# Spark's JVM regex AND the DuckDB/RE2 oracle with identical matches.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}-\d{3}-\d{3,10}", "<PHONE>"),
)


def pii_scrub(col: Column) -> dict[str, Column]:
    """PII redaction for training corpora: mask emails, IPv4 addresses
    and international phone numbers with typed placeholder tokens, and
    count what was masked (the counts feed the per-source PII-rate
    dashboards that decide whether a crawl slice is usable at all).

    Pure JVM regexp built-ins — ``regexp_count`` + chained
    ``regexp_replace`` — so the scrub runs inside whole-stage codegen
    over every document; at 100 TB this is a map-only pass with zero
    shuffle and nothing leaves the row. Email is scrubbed FIRST: its
    local/domain parts can contain dotted digit runs that the IPv4
    pattern would otherwise tear in half, while the placeholders
    themselves (``<EMAIL>`` etc.) match no later pattern, so the chain
    order is confluent for the remaining two.

    Returns named columns: ``n_<kind>`` match counts (pre-scrub) and
    ``clean_text``. Deliberately regex-only — names/addresses need NER
    models (an Arrow-UDF stage like operators/news.py summarize), but
    the structured kinds here are the standard regex tier every
    pretraining pipeline runs first."""
    out: dict[str, Column] = {}
    clean = col
    for kind, pat, token in PII_PATTERNS:
        out[f"n_{kind}"] = F.regexp_count(col, F.lit(pat))
        clean = F.regexp_replace(clean, pat, token)
    out["clean_text"] = clean
    return out


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark DECONTAMINATION: flag corpus documents sharing any
    word n-gram with a benchmark/test set — train/test overlap is the
    classic silent evaluation corruption at pretraining scale. Returns
    (doc_id, n_hits = number of DISTINCT benchmark n-grams the doc
    contains) for contaminated docs only; anti-join the result to
    clean the corpus.

    Scale shape: the benchmark side is tiny next to a 100 TB corpus —
    its distinct hashed n-grams groupBy down to one small frame that
    AQE broadcasts into the probe join, so corpus shingles are never
    exchanged; per-doc distinctness is enforced in-row (array_distinct
    before the explode), and the only wide movement is (doc_id, hash)
    pairs of actual hits."""
    from full_docker_etl_spark.operators.dedup import shingle_arrays

    bench_grams = (
        shingle_arrays(benchmark, text_col, id_col, n)
        .select(F.explode(F.transform("sh_arr", lambda s: F.xxhash64(s))).alias("sh"))
        .distinct()
    )
    corpus_grams = shingle_arrays(corpus, text_col, id_col, n).select(
        "doc_id",
        F.explode(F.transform("sh_arr", lambda s: F.xxhash64(s))).alias("sh"),
    )
    return (
        corpus_grams.join(bench_grams, "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def bm25_search(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """BM25 ranked retrieval: top-k documents for a bag of query terms
    (Robertson/Sparck-Jones idf, the Okapi tf saturation + length
    normalization every search engine defaults to).

    Scale shape: term rows are filtered to the QUERY terms immediately
    after the explode — the per-(doc, term) aggregation and everything
    downstream touch only the query terms' posting lists, never the
    corpus vocabulary. Per-term document frequencies are ≤|query|
    rows (broadcast); doc lengths join on the doc key; the global
    top-k compiles to TakeOrderedAndProject. Per-term scores are
    rounded before summing and the sum re-rounded, so ranking is
    engine-portable (log/division last-ulp jitter never reorders).
    """
    if not query_terms:
        raise ValueError("bm25_search: query_terms must be non-empty")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    ).where(F.col("term") != "")  # ''/NULL docs split to [''] — dl 0, not 1
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n"))
    tf = (
        toks.where(F.col("term").isin(query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dft"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("dft") + F.lit(0.5)) / (F.col("dft") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    per_term = F.round(idf * F.col("tf") * F.lit(k1 + 1.0) / norm, 4)
    scored = (
        tf.join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(avgdl))
        .groupBy("doc_id")
        .agg(F.round(F.sum(per_term), 4).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(
        top_k
    )


def compression_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The COMPRESSION-RATIO quality signal (the zlib feature
    CCNet/Gopher-style curation pipelines cut on): compressed bytes /
    raw bytes at a FIXED zlib level (6), so boilerplate, template spam
    and character-level repetition — which token-level repetition_ratio
    can miss — score low, while natural prose sits in the 0.4-0.7
    band. Also emits the doubled-text ratio (compress(text+text) /
    2·len): a correct compressor prices the second copy almost free,
    so ``comp_ratio_2x < comp_ratio`` is a per-row invariant the
    verdict query pins (a broken UDF emitting constants fails the
    strict inequality).

    This is a genuine Python stage (zlib has no Catalyst form), so it
    follows the repo's ingestion-boundary rule: ONE Arrow-batched
    mapInPandas with an explicit schema, column-pruned to (id, text)
    around the boundary — per-batch, not per-row, Python crossing.
    Deterministic: fixed level, no dictionaries."""
    import pandas as pd  # noqa: F401  (worker-side)

    # the id column keeps ITS OWN type — hardcoding 'long' made the
    # Arrow conversion throw (or coerce) for string/UUID ids, which
    # nothing in this signature forbids
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, comp_ratio double, comp_ratio_2x double"

    def gen(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            ids, r1, r2 = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                b = (t or "").encode("utf-8")
                ids.append(i)
                if not b:
                    # empty/NULL text has no bytes to price: a ratio of
                    # compress(b'')/1 = 8.0 is pure stream overhead and
                    # would poison any range invariant downstream —
                    # NULL is the honest signal value here
                    r1.append(None)
                    r2.append(None)
                else:
                    n = len(b)
                    r1.append(len(zlib.compress(b, 6)) / n)
                    r2.append(len(zlib.compress(b + b, 6)) / (2 * n))
            yield pd.DataFrame(
                {id_col: ids, "comp_ratio": r1, "comp_ratio_2x": r2}
            )

    return df.select(id_col, text_col).mapInPandas(gen, schema)


def bigram_cross_entropy(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: float = 0.5,
) -> DataFrame:
    """Per-document LANGUAGE-MODEL cross-entropy under a bigram model
    trained on the corpus itself — the CCNet/Gopher-style perplexity
    quality filter (their KenLM stage, re-expressed relationally): a
    doc whose word transitions are typical of the corpus scores low,
    gibberish / boilerplate-shuffled text scores high. Add-k smoothing
    (``k``) over the corpus vocabulary; ``xent`` is the mean −log2
    bigram probability, so perplexity = 2^xent.

    Everything is counting and joins — the canonical map-reduce LM
    shape, no UDFs: in-row bigram arrays (arrays_zip of two slices —
    no per-token explode before the pair is formed), one count shuffle
    per table (bigram, left-unigram), a broadcast one-row vocabulary
    scalar, and a per-doc mean. At 100 TB the count tables are the
    standard n-gram-corpus build; nothing here is quadratic.

    Returns (doc_id, n_bigrams, xent) for every doc with ≥ 1 bigram,
    ``xent`` rounded to 4 decimals (the repo's AVG determinism rule)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
    pairs = F.arrays_zip(
        F.slice(F.col("_t"), 1, F.size("_t") - 1),
        F.slice(F.col("_t"), 2, F.size("_t") - 1),
    )
    bg = (
        base.where(F.size("_t") >= 2)
        .select("doc_id", F.explode(pairs).alias("_p"))
        .select(
            "doc_id",
            F.col("_p")["0"].alias("w1"),
            F.col("_p")["1"].alias("w2"),
        )
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = base.select(F.explode("_t").alias("w")).agg(
        F.count_distinct("w").alias("v")
    )
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            (
                -F.log2(
                    (F.col("c12") + F.lit(k))
                    / (F.col("c1") + F.lit(k) * F.col("v"))
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("nll"), 4).alias("xent"),
    )


def nb_quality_classifier(
    df: DataFrame,
    text_col: str,
    id_col: str,
    label_col: str,
) -> DataFrame:
    """TRAINED quality classifier — the fastText/CCNet "target-domain
    filter" stage (GPT-3's WebText-vs-CommonCrawl classifier, CCNet's
    fastText language/quality head), re-expressed as its exact
    closed-form relational equivalent: multinomial Naive Bayes with
    add-1 smoothing over whitespace tokens. fastText with a linear
    head on bag-of-words features and log-loss converges to per-token
    log-odds weights; NB computes those weights in closed form from
    counts, which is why it is the standard relational surrogate.
    ``label_col`` must be 0/1 (1 = target domain / "high quality"
    seed); every doc is then scored by the sum of its tokens'
    log-odds plus the (add-1 smoothed) class-prior log-odds.

    Everything is counting and joins, no UDFs and no driver-side
    training: one token explode feeds (a) the per-word class counts,
    (b) the one-row class-total/vocab scalar (broadcast back), and
    (c) the per-doc scoring join. At 100 TB the word-odds table is
    vocab-sized (shuffle-join on the token, map-side-combined counts);
    nothing is quadratic and nothing collects. The model is
    self-trained on the scored corpus, so there is no OOV path — an
    unseen-token default (the smoothed 0-count odds) is what serving
    a frozen model elsewhere would add.

    Returns (doc_id, n_tokens, log_odds, pred_pos) for every doc with
    ≥ 1 token; ``log_odds`` rounded to 4 decimals (the repo's AVG/SUM
    determinism rule) and ``pred_pos`` derived from the ROUNDED value
    so the oracle's boundary decisions match bit-for-bit.

    Composition of :func:`nb_train` + :func:`nb_score` — self-trained
    on the scored corpus, so every token hits the word-odds table and
    the OOV default never fires; serving the frozen model on OTHER
    data (e.g. a stream — see ``stream_model_scores``) is the same
    :func:`nb_score` call where the default does the work."""
    return nb_score(df, text_col, id_col, *nb_train(df, text_col, label_col))


def nb_train(
    df: DataFrame,
    text_col: str,
    label_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Train the NB/fastText-surrogate model (see
    :func:`nb_quality_classifier`): returns ``(odds, scalars)`` —
    ``odds`` is the vocab-sized (w, lo) log-odds table, ``scalars`` is
    ONE row (lp = smoothed class-prior log-odds, oov_lo = the
    smoothed zero-count log-odds an unseen token scores at serve
    time). Both are plain DataFrames: persist them with the ordinary
    sink path and the model is a frozen, versionable artifact."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    tok = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(label_col).cast("int").alias("y"),
            F.explode(toks).alias("w"),
        )
        # split of an empty/whitespace-only text yields one '' token;
        # counting it would inflate vocab and class totals (and shift
        # every smoothed odds) — same predicate corpus_stats/BPE apply
        .where(F.length("w") > 0)
    )
    cw = tok.groupBy("w").agg(
        F.sum("y").alias("c_pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("c_neg"),
    )
    tots = tok.agg(
        F.sum("y").alias("tot_pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("tot_neg"),
        F.count_distinct("w").alias("v"),
    )
    prior = (
        df.where(F.col(text_col).isNotNull())
        .agg(
            F.log(
                (F.sum(F.col(label_col).cast("int")) + F.lit(1.0))
                / (
                    F.count(F.lit(1))
                    - F.sum(F.col(label_col).cast("int"))
                    + F.lit(1.0)
                )
            ).alias("lp")
        )
    )
    odds = cw.crossJoin(F.broadcast(tots)).select(
        "w",
        (
            F.log((F.col("c_pos") + 1.0) / (F.col("tot_pos") + F.col("v")))
            - F.log((F.col("c_neg") + 1.0) / (F.col("tot_neg") + F.col("v")))
        ).alias("lo"),
    )
    scalars = prior.crossJoin(F.broadcast(tots)).select(
        "lp",
        (
            F.log(F.lit(1.0) / (F.col("tot_pos") + F.col("v")))
            - F.log(F.lit(1.0) / (F.col("tot_neg") + F.col("v")))
        ).alias("oov_lo"),
    )
    return odds, scalars


def nb_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    odds: DataFrame,
    scalars: DataFrame,
) -> DataFrame:
    """Score documents under a FROZEN :func:`nb_train` model: token
    left-join against the word-odds table (unseen tokens take the
    smoothed zero-count default ``oov_lo``), per-doc sum plus the
    class prior. Pure join + aggregate — the same code path serves a
    batch backfill and a foreachBatch micro-batch, and at 100 TB it
    is one vocab-sized shuffle join per scored corpus."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    tok = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("w"))
        .where(F.length("w") > 0)
    )
    scored = (
        tok.join(odds, "w", "left")
        .crossJoin(F.broadcast(scalars))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum(F.coalesce(F.col("lo"), F.col("oov_lo")))
                + F.first("lp")
            ).alias("raw"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        F.round("raw", 4).alias("log_odds"),
        (F.round("raw", 4) > 0).alias("pred_pos"),
    )


def _bpe_initial_syms(w) -> "Column":
    """Initial BPE segmentation of a word: characters, with the
    end-of-word marker ``</w>`` FUSED onto the final character —
    the published Sennrich et al. learn_bpe form (word[:-1] +
    [word[-1] + '</w>']). The marker lets merges distinguish
    word-final pairs ('e','r</w>') from word-internal ones ('e','r'),
    which is what makes the learned vocab match real BPE tokenizers;
    fusing (rather than appending a separate symbol) keeps the initial
    symbol count equal to the word length."""
    chars = F.split(w, r"(?!^)(?=.)")
    return F.concat(
        F.slice(chars, 1, F.size(chars) - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit("</w>"))),
    )


def _bpe_apply_merge(arr: Column, lt: Column, rt: Column) -> Column:
    """ONE greedy left-to-right application of the merge (lt, rt) over
    a symbol array — THE fold shared by the learn loop
    (:func:`bpe_merge_table`) and the apply path (:func:`bpe_tokenize`).
    One definition on purpose: two hand-synced copies of this lambda
    previously had to be kept byte-identical by eye, and a semantics
    fix to one would silently leave the other stale — breaking the
    learn/apply exactness the differential test pins."""
    return F.aggregate(
        arr,
        F.expr("array()").cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lt)
            & (x == rt),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_merge_table(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """Distributed BPE merge LEARNING — the tokenizer-prep stage
    (Sennrich et al. 2016, the GPT-2/SentencePiece vocabulary build):
    learn the first ``k`` byte-pair merges from the corpus, returning
    the merge table (round, left, right, merged, pair_count).

    The classic single-machine algorithm is reproduced exactly, but
    over the distributed word-TYPE table (the standard trick: BPE
    statistics depend only on distinct words and their frequencies, so
    a 100 TB corpus reduces to a vocab-sized frame after ONE wordcount
    shuffle). Each round then costs one map-side-combined pair-count
    aggregation over that frame plus a map-local re-segmentation:

    - pair counts: in-row adjacent zip + explode, SUM(freq) — exact
      integer weights, deterministic argmax with (count DESC, left,
      right) tie-break;
    - applying the merge: a JVM higher-order fold (``F.aggregate``)
      over each word's symbol array implements the greedy
      left-to-right scan — merged output can never re-merge within a
      round because ``left+right != left`` always, which makes the
      one-pass fold EXACT (pinned by the differential test against a
      naive reference);
    - per-round ``localCheckpoint`` keeps the plan from growing
      k-fold (k is a handful here; a production 30k-merge build would
      batch rounds the same way — the per-round primitive is what
      this operator demonstrates).

    The one-row argmax is collected driver-side each round (bounded:
    exactly ≤ 1 row — the repo's bounded-collect rule) both to build
    the next round's literal and to early-stop when no pair remains.
    Initial segmentation carries the ``</w>`` end-of-word marker fused
    onto the final character (:func:`_bpe_initial_syms` — the
    published learn_bpe setup), so word-final merges are learned as
    distinct symbols, matching real BPE vocabularies."""
    from full_docker_etl_spark.operators.util import release_checkpoint

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    words = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
        )
        .where(F.length("w") > 0)
    )
    cur = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("freq", _bpe_initial_syms(F.col("w")).alias("syms"))
        .localCheckpoint(eager=True)
    )
    spark = df.sparkSession
    out: list[tuple[int, str, str, str, int]] = []
    try:
        for rnd in range(1, k + 1):
            arr = F.col("syms")
            zipped = F.arrays_zip(
                F.slice(arr, 1, F.size(arr) - 1),
                F.slice(arr, 2, F.size(arr) - 1),
            )
            pair_counts = (
                cur.where(F.size("syms") >= 2)
                .select("freq", F.explode(zipped).alias("_p"))
                .groupBy(
                    F.col("_p")["0"].alias("left"),
                    F.col("_p")["1"].alias("right"),
                )
                .agg(F.sum("freq").alias("pair_count"))
            )
            best = pair_counts.orderBy(
                F.desc("pair_count"), "left", "right"
            ).limit(1).collect()
            if not best:
                break
            left, right, c = best[0]
            out.append((rnd, left, right, left + right, int(c)))
            lt, rt = F.lit(left), F.lit(right)
            fold = _bpe_apply_merge(arr, lt, rt)
            nxt = cur.select("freq", fold.alias("syms")).localCheckpoint(
                eager=True
            )
            release_checkpoint(cur)
            cur = nxt
    finally:
        release_checkpoint(cur)
    return spark.createDataFrame(
        out,
        "round int, left string, right string, merged string, "
        "pair_count long",
    )


def bpe_tokenize(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """Apply a corpus-LEARNED BPE vocabulary (:func:`bpe_merge_table`,
    first ``k`` merges) back to the corpus — the second half of the
    tokenizer-prep story, and the honest way to count training tokens
    under the vocab that will actually tokenize them (the whitespace
    and regex counters over-estimate once merges exist). Returns per
    doc (doc_id, n_words, n_bpe_tokens, bpe_ratio) with bpe_ratio =
    n_bpe_tokens / n_words rounded to 4 dp (≥ 1; 1.0 means every word
    became a single token).

    Scale shape: learning is :func:`bpe_merge_table` (one wordcount
    shuffle + k bounded argmaxes); application segments each DISTINCT
    word once — the k greedy folds run on the vocab-sized TYPE table,
    not per occurrence (higher-order array lambdas are interpreted,
    not codegen'd: folding every occurrence cost ~5× the type path
    even at bench scale, and the gap grows with the duplication
    ratio) — then occurrences join the (word → token count) table,
    which AQE broadcasts while the vocab is small and shuffle-joins
    when it is not. One extra distinct shuffle buys fold work
    proportional to |vocab| instead of |corpus|."""
    merges = [
        (r["left"], r["right"])
        for r in bpe_merge_table(df, text_col, k)
        .orderBy("round")
        .collect()
    ]
    words = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("w"),
        )
        .where(F.length("w") > 0)
    )
    types = words.select("w").distinct()
    syms = _bpe_initial_syms(F.col("w"))
    for left, right in merges:
        syms = _bpe_apply_merge(syms, F.lit(left), F.lit(right))
    wt = types.select("w", F.size(syms).alias("_n"))
    per_word = words.join(wt, "w").select("doc_id", "_n")
    return per_word.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("_n").alias("n_bpe_tokens"),
        F.round(
            F.sum("_n") / F.count(F.lit(1)), 4
        ).alias("bpe_ratio"),
    )


def normalize_text(col: Column) -> Column:
    """Text NORMALIZATION — the CCNet/C4 cleanup pass that runs before
    any hashing or tokenization (dedup keys and shingles are only
    stable if formatting jitter is removed first): control/format
    characters → space, curly quotes → straight, en/em dashes → '-',
    ellipsis → '...', whitespace runs collapsed to single spaces,
    ends trimmed. One chain of regexp_replace built-ins — map-local,
    whole-stage codegen, identical semantics available in ANSI SQL
    (DuckDB needs the explicit 'g' flag; Spark replaces globally by
    default). Compose with :func:`fingerprint` (which additionally
    lowercases) for normalization-invariant dedup keys."""
    s = F.regexp_replace(
        col, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", " "
    )
    s = F.regexp_replace(s, "[‘’‚]", "'")
    s = F.regexp_replace(s, "[“”„]", '"')
    s = F.regexp_replace(s, "[–—]", "-")
    s = F.regexp_replace(s, "…", "...")
    return F.trim(F.regexp_replace(s, r"\s+", " "))
