"""Property tests for the training-data prep operators: chunking must
be lossless, packing must respect its overflow bound, splits must
partition the corpus with stable proportions."""

from __future__ import annotations

from pyspark.sql import functions as F

from full_docker_etl_spark.operators.sampling import hash_split, pack_chunks
from full_docker_etl_spark.operators.text import chunk_documents
from full_docker_etl_spark.sources.catalog import load_table

CHUNK, OVERLAP = 24, 8


def _varied_docs(spark):
    """~120 docs with adversarial lengths: every boundary around the
    chunk/step sizes plus a deterministic pseudo-random spread."""
    lengths = list(range(1, 30)) + [CHUNK - 1, CHUNK, CHUNK + 1, 2 * CHUNK]
    lengths += [((i * 37) % 300) + 1 for i in range(80)]
    rows = [
        (i, " ".join(f"d{i}w{j}" for j in range(1, n + 1)))
        for i, n in enumerate(lengths)
    ]
    return spark.createDataFrame(rows, "doc_id int, text string"), {
        i: n for i, n in enumerate(lengths)
    }


def test_chunking_is_lossless(spark):
    """Dropping the first `overlap` tokens of every chunk after the
    first reconstructs the document exactly — no token lost, none
    duplicated, order preserved."""
    df, lengths = _varied_docs(spark)
    out = chunk_documents(df, "text", "doc_id", CHUNK, OVERLAP).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(lengths)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        rebuilt: list[str] = []
        for k, r in enumerate(chunks):
            toks = r.chunk_text.split()
            assert len(toks) == r.n_tokens
            rebuilt.extend(toks if k == 0 else toks[OVERLAP:])
        expected = [f"d{doc_id}w{j}" for j in range(1, lengths[doc_id] + 1)]
        assert rebuilt == expected, f"doc {doc_id} len {lengths[doc_id]}"


def test_packing_overflow_bound(spark):
    """First-fit-in-order: every packed sequence holds at most
    budget + (max chunk - 1) tokens, bins are dense from 0, and chunk
    order within a bin follows the declared order."""
    budget = 100
    df, _ = _varied_docs(spark)
    chunks = chunk_documents(df, "text", "doc_id", CHUNK, OVERLAP).withColumn(
        "shard", F.col("doc_id") % 4
    )
    packed = pack_chunks(
        chunks, "shard", [("doc_id", True), ("chunk_id", True)], "n_tokens", budget
    )
    agg = packed.groupBy("shard", "seq_bin").agg(
        F.sum("n_tokens").alias("tok"), F.count(F.lit(1)).alias("n")
    )
    rows = agg.collect()
    max_chunk = CHUNK
    for r in rows:
        assert r.tok <= budget + max_chunk - 1, (r.shard, r.seq_bin, r.tok)
    for shard in {r.shard for r in rows}:
        bins = sorted(r.seq_bin for r in rows if r.shard == shard)
        assert bins == list(range(len(bins))), f"shard {shard} bins not dense"


def test_balanced_shards_matches_naive_prefix_sum(spark):
    """The two-level distributed prefix sum must equal a naive Python
    running sum exactly — cumulative weights, shard cut points, and
    the contiguity/size invariants: shards are contiguous id ranges,
    every shard except the last carries >= target (overflowing by at
    most one doc), and ids with sparse gaps still work (bucketing by
    id RANGE, not position)."""
    import random

    from full_docker_etl_spark.operators.sampling import balanced_shards

    rng = random.Random(7)
    # sparse, gappy ids — the bucket map must not require density
    ids = sorted(rng.sample(range(100_000), 500))
    rows = [(i, rng.randrange(1, 200)) for i in ids]
    target = 3_000
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {
        r.doc_id: (r.cum_weight, r.shard)
        for r in balanced_shards(
            df, "doc_id", "w", target, n_buckets=32
        ).collect()
    }
    cum = 0
    want = {}
    for i, w in rows:
        want[i] = (cum + w, cum // target)
        cum += w
    assert got == want

    # invariants over the result
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for i, w in rows:
        by_shard.setdefault(want[i][1], []).append((i, w))
    shards = sorted(by_shard)
    assert shards == list(range(len(shards)))  # dense from 0
    for s in shards:
        ids_s = [i for i, _ in by_shard[s]]
        lo, hi = min(ids_s), max(ids_s)
        assert all(
            not (lo <= i <= hi) or want[i][1] == s for i, _ in rows
        ), f"shard {s} not a contiguous id range"
        if s != shards[-1]:
            # start-offset cuts: a shard reaches the next multiple of
            # target but may have started late (the previous doc
            # overflowed into its range), so its total is within one
            # max-doc-weight of target on either side
            tot = sum(w for _, w in by_shard[s])
            max_w = max(w for _, w in rows)
            assert target - max_w < tot <= target + max_w, (s, tot)

    # snowflake-scale 64-bit ids: long math (id * n_buckets) would wrap
    # negative and scramble the cuts; the double-space bucket map must
    # stay monotone and exact (reviewed-in regression)
    big_base = 1_400_000_000_000_000_000  # ~2^60.3, wraps at n_buckets=1024
    big_rows = [(big_base + i * 1_000_003, rng.randrange(1, 50))
                for i in range(200)]
    big = spark.createDataFrame(big_rows, "doc_id long, w long")
    got_big = {
        r.doc_id: (r.cum_weight, r.shard)
        for r in balanced_shards(big, "doc_id", "w", 500).collect()
    }
    cum = 0
    for i, w in big_rows:
        assert got_big[i] == (cum + w, cum // 500), (i, got_big[i])
        cum += w

    # all-negative ids: min-anchored width must stay >= 1
    neg = spark.createDataFrame(
        [(-30, 5), (-20, 5), (-10, 5)], "doc_id long, w long"
    )
    got_neg = {
        r.doc_id: r.shard for r in balanced_shards(neg, "doc_id", "w", 7).collect()
    }
    assert got_neg == {-30: 0, -20: 0, -10: 1}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="target_weight"):
        balanced_shards(df, "doc_id", "w", 0)
    with _pytest.raises(ValueError, match="n_buckets"):
        balanced_shards(df, "doc_id", "w", 10, n_buckets=0)

    # NULL weight = corrupt input: must fail loudly at execution time
    # (sum() would skip the null but cum/shard of that row would go
    # NULL — wrong-looking rows, no error)
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    nullw = spark.createDataFrame(
        [(1, 5), (2, None), (3, 5)], "doc_id long, w long"
    )
    with _pytest.raises(SparkRuntimeException, match="NULL w at doc_id=2"):
        balanced_shards(nullw, "doc_id", "w", 7).collect()

    # NULL id = corrupt input too: its NULL bucket would be silently
    # dropped by the offsets join — must fail loudly instead
    nullid = spark.createDataFrame(
        [(1, 5), (None, 5), (3, 5)], "doc_id long, w long"
    )
    with _pytest.raises(SparkRuntimeException, match="NULL doc_id"):
        balanced_shards(nullid, "doc_id", "w", 7).collect()


def test_stratified_split_exact_proportions(spark):
    """The two-level bucketed rank must equal the naive per-stratum
    md5-order rank exactly (every row's split identical to a Python
    reimplementation), and per-stratum split sizes must be EXACT
    integer bands — including 1-row and 2-row strata where
    expectation-based hash banding can return an empty eval set."""
    import hashlib

    from full_docker_etl_spark.operators.sampling import stratified_split

    rows = (
        [("big", i) for i in range(100)]
        + [("mid", 1000 + i) for i in range(7)]
        + [("two", 2000), ("two", 2001)]
        + [("one", 3000)]
    )
    df = spark.createDataFrame(rows, "lang string, doc_id long")
    got = {
        r.doc_id: r.split
        for r in stratified_split(df, ["lang"], "doc_id").collect()
    }

    def md5(k: int) -> str:
        return hashlib.md5(f"strat0:{k}".encode()).hexdigest()

    want = {}
    by_stratum: dict[str, list[int]] = {}
    for lang, k in rows:
        by_stratum.setdefault(lang, []).append(k)
    for lang, ks in by_stratum.items():
        ordered = sorted(ks, key=lambda k: (md5(k), k))
        n = len(ordered)
        for r, k in enumerate(ordered):
            want[k] = (
                "train" if r * 8 < n * 6
                else "val" if r * 8 < n * 7
                else "test"
            )
    assert got == want

    # exact integer band sizes per stratum
    from collections import Counter

    for lang, ks in by_stratum.items():
        n = len(ks)
        c = Counter(got[k] for k in ks)
        n_train = sum(1 for r in range(n) if r * 8 < n * 6)
        n_val = sum(1 for r in range(n) if n * 6 <= r * 8 < n * 7)
        assert c["train"] == n_train and c["val"] == n_val, (lang, c)
    # band arithmetic on tiny strata: n=1 → train; n=2 → both train
    # (ceil(6n/8) rows are train; val/test appear from n=3 and n=7)
    assert got[3000] == "train"
    assert [got[2000], got[2001]] == ["train", "train"]

    # NULL strata form their own group (SQL PARTITION BY semantics) —
    # a null-unsafe join-back would silently drop these rows
    withnull = spark.createDataFrame(
        [(None, 9000 + i) for i in range(8)] + [("en", 9100)],
        "lang string, doc_id long",
    )
    nres = {
        r.doc_id: (r.lang, r.split)
        for r in stratified_split(withnull, ["lang"], "doc_id").collect()
    }
    assert len(nres) == 9, "NULL-stratum rows were dropped"
    null_splits = sorted(
        s for k, (lang, s) in nres.items() if lang is None
    )
    assert null_splits.count("train") == 6  # exact band on n=8
    assert null_splits.count("val") == 1 and null_splits.count("test") == 1

    # a NULL order KEY (vs stratum) is corrupt input — concat_ws would
    # silently fold it into one shared hash; must raise instead
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    nullkey = spark.createDataFrame(
        [("en", 1), ("en", None)], "lang string, doc_id long"
    )
    with _pytest.raises(SparkRuntimeException, match="NULL doc_id"):
        stratified_split(nullkey, ["lang"], "doc_id").collect()
    # the 100-row stratum hits the exact 75/12.5/12.5 counts
    c100 = Counter(got[k] for k in by_stratum["big"])
    assert (c100["train"], c100["val"], c100["test"]) == (75, 13, 12)


def test_balanced_shards_plan_is_bucketed_not_global(spark, sf_dir):
    """The scalable-prefix-sum contract in the PLAN: no
    rangepartitioning exchange anywhere (the naive form would global-
    sort the corpus), and the only single-partition exchange feeds the
    <= n_buckets offsets frame — i.e. it sits downstream of the bucket
    aggregation, never under the full-corpus window."""
    from full_docker_etl_spark.operators.sampling import balanced_shards
    from full_docker_etl_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("w")
    )
    out = balanced_shards(d, "doc_id", "w", 10_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan, plan
    # the in-bucket window must be hash-partitioned on the bucket
    assert "hashpartitioning(_bucket" in plan, plan


def test_stratified_split_plan_is_bucketed_not_global(spark, sf_dir):
    """The two-level-rank contract in the PLAN: no rangepartitioning
    exchange (the naive form would sort each stratum globally — a
    corpus-sized partition for a dominant stratum), and the in-bucket
    row_number window is hash-partitioned on (stratum, bucket) so the
    per-partition sort is bounded by the bucket, not the stratum."""
    from full_docker_etl_spark.operators.sampling import stratified_split
    from full_docker_etl_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = stratified_split(d, ["lang"], "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan, plan
    assert "hashpartitioning(lang" in plan, plan
    assert "_bkt" in plan, plan


def test_hash_split_partitions_corpus(spark, sf_dir):
    """Every doc gets exactly one split; proportions land near
    75/12.5/12.5; assignment depends only on the key (re-running on a
    subset never reassigns)."""
    docs = load_table(spark, sf_dir, "documents")
    out = hash_split(docs, "doc_id")
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    assert total == docs.count()
    assert 0.65 <= counts.get("train", 0) / total <= 0.85
    # stability: the same keys in a filtered frame keep their split
    sub = hash_split(docs.where("doc_id % 3 = 0"), "doc_id")
    full = {r.doc_id: r.split for r in out.select("doc_id", "split").collect()}
    for r in sub.select("doc_id", "split").collect():
        assert full[r.doc_id] == r.split


def test_leakage_safe_split_colocates_transitive_chain(spark):
    """Docs chained by shared passages (a~b via P, b~c via Q — a and c
    never pair directly) must all land in ONE split keyed by the
    component's min id; unrelated docs keep their own key. The split
    letter itself must equal hash_split's band for the cluster key."""
    import hashlib

    from full_docker_etl_spark.operators.sampling import leakage_safe_split

    P = " ".join(f"p{i}" for i in range(25))
    Q = " ".join(f"q{i}" for i in range(25))
    rows = [
        (10, P),
        (20, P + " " + Q),
        (30, Q),
        (40, " ".join(f"z{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.cluster, r.split)
        for r in leakage_safe_split(df, "text", "doc_id").collect()
    }
    h1 = hashlib.md5(b"10").hexdigest()[0]
    expect_split = (
        "train" if h1 <= "b" else "val" if h1 in ("c", "d") else "test"
    )
    assert got[10] == got[20] == got[30] == (10, expect_split)
    assert got[40][0] == 40


def test_leakage_safe_split_no_pair_straddles_on_fixture(spark, sf_dir):
    """End-to-end invariant on the real corpus: every substring-span
    pair must land in one split (per-doc hashing provably violates
    this on the fixture — that's the operator's reason to exist)."""
    from full_docker_etl_spark.operators.dedup import substring_spans
    from full_docker_etl_spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = substring_spans(docs, "text", "doc_id").select(
        "d1", "d2"
    ).distinct()
    safe = {
        r.doc_id: r.split
        for r in leakage_safe_split(docs, "text", "doc_id").collect()
    }
    naive = {
        r.doc_id: r.split
        for r in hash_split(docs, "doc_id").select("doc_id", "split").collect()
    }
    got_pairs = [(r.d1, r.d2) for r in pairs.collect()]
    assert got_pairs, "fixture should contain duplicated passages"
    assert all(safe[a] == safe[b] for a, b in got_pairs)
    # the naive splitter actually leaks on this corpus — if it ever
    # stops leaking, the fixture no longer exercises the operator
    assert any(naive[a] != naive[b] for a, b in got_pairs)


def test_leakage_safe_split_no_pairs_degenerates_to_hash_split(spark):
    """A corpus with zero shared passages (empty span graph) must
    degrade exactly to per-doc hash splitting — every doc its own
    cluster, empty-graph connected components handled."""
    from full_docker_etl_spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
    )

    df = spark.createDataFrame(
        [(i, " ".join(f"v{i}_{j}" for j in range(30))) for i in range(4)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.cluster, r.split)
        for r in leakage_safe_split(df, "text", "doc_id").collect()
    }
    naive = {
        r.doc_id: r.split for r in hash_split(df, "doc_id").collect()
    }
    assert got == {i: (i, naive[i]) for i in range(4)}


def test_epoch_shuffle_is_permutation_and_seed_sensitive(spark, sf_dir):
    """Every row keeps exactly one (shard, pos) slot; positions are
    dense 1..n per shard; a different seed yields a different order;
    the same seed is bit-stable across invocations."""
    from full_docker_etl_spark.operators.sampling import epoch_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    a = epoch_shuffle(docs, "doc_id", seed="e1", n_shards=4)
    assert a.count() == n
    # dense positions per shard
    per_shard = a.groupBy("shard").agg(
        F.count("*").alias("c"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    ).collect()
    assert len(per_shard) == 4          # all shards populated
    for r in per_shard:
        assert (r.mn, r.mx) == (1, r.c)
        assert r.c > n // 16            # roughly uniform routing
    # determinism: same seed → identical assignment
    b = epoch_shuffle(docs, "doc_id", seed="e1", n_shards=4)
    assert a.exceptAll(b).count() == 0
    # seed sensitivity: a new epoch reorders
    c = epoch_shuffle(docs, "doc_id", seed="e2", n_shards=4)
    assert a.exceptAll(c).count() > 0


def test_temperature_mix_flattens_toward_uniform(spark, sf_dir):
    """α=0.5 on the lang-skewed corpus: the smallest group survives
    intact, kept counts track min_n^(1-α)·n^α within binomial noise,
    the sample is a subset, deterministic, and α=1 is the identity."""
    import math

    import pytest

    from full_docker_etl_spark.operators.sampling import temperature_mix

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    n_by = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    min_n = min(n_by.values())
    out = temperature_mix(docs, "lang", "doc_id", alpha=0.5)
    kept = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # smallest group keeps 100% (rate = 1)
    smallest = min(n_by, key=n_by.get)
    assert kept[smallest] == n_by[smallest]
    # kept ∝ n^α within ~4 binomial sigmas
    for lang, n in n_by.items():
        rate = (n / min_n) ** -0.5
        exp = n * rate
        sigma = math.sqrt(n * rate * (1 - rate)) if rate < 1 else 0.0
        assert abs(kept.get(lang, 0) - exp) <= 4 * sigma + 1, (lang, kept, exp)
    # subset of the input, never duplicated
    assert out.count() == out.select("doc_id").distinct().count()
    assert out.join(docs, ["doc_id", "lang"], "left_anti").count() == 0
    # deterministic across invocations
    again = temperature_mix(docs, "lang", "doc_id", alpha=0.5)
    assert out.exceptAll(again).count() == 0
    # α=1 keeps the natural mix untouched
    ident = temperature_mix(docs, "lang", "doc_id", alpha=1.0)
    assert ident.count() == docs.count()
    with pytest.raises(ValueError):
        temperature_mix(docs, "lang", "doc_id", alpha=0.0)


def test_temperature_upsample_repeats_toward_uniform(spark, sf_dir):
    """α=0.5 upsampling: dominant group stays exactly 1×, small groups
    emit n·rate copies within binomial noise, replicas are ordinal-
    distinct, the run is deterministic, and the blow-up guard raises
    in-plan when a group would exceed max_repeat."""
    import math

    import pytest

    from full_docker_etl_spark.operators.sampling import temperature_upsample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    n_by = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    max_n = max(n_by.values())
    out = temperature_upsample(docs, "lang", "doc_id", alpha=0.5)
    kept = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    biggest = max(n_by, key=n_by.get)
    assert kept[biggest] == n_by[biggest]          # dominant group: 1×
    for lang, n in n_by.items():
        rate = (n / max_n) ** -0.5
        frac = rate - math.floor(rate)
        sigma = math.sqrt(n * frac * (1 - frac))
        assert abs(kept[lang] - n * rate) <= 4 * sigma + 1, (lang, kept[lang], n * rate)
    # replicas are distinct (doc_id, rep) pairs, rep dense from 1
    assert out.count() == out.select("doc_id", "rep").distinct().count()
    assert out.agg(F.min("rep")).first()[0] == 1
    # deterministic
    again = temperature_upsample(docs, "lang", "doc_id", alpha=0.5)
    assert out.exceptAll(again).count() == 0
    # in-plan guard: max_repeat=1 must raise once a group needs ≥1 extra
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises(SparkRuntimeException, match="temperature_upsample"):
        temperature_upsample(docs, "lang", "doc_id", alpha=0.5, max_repeat=1).count()


def test_negative_samples_never_self_and_deterministic(spark, sf_dir):
    """Every anchor emits exactly k negatives, never itself, all in
    [0, n); same seed → identical draws, new seed → different ones."""
    import pytest

    from full_docker_etl_spark.operators.sampling import negative_samples

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    out = negative_samples(docs, "doc_id", n_rows=n, k=4)
    assert out.count() == 4 * n
    assert out.where("neg_id = doc_id").count() == 0
    assert out.where(f"neg_id < 0 OR neg_id >= {n}").count() == 0
    per = out.groupBy("doc_id").count().where("count != 4")
    assert per.count() == 0
    again = negative_samples(docs, "doc_id", n_rows=n, k=4)
    assert out.exceptAll(again).count() == 0
    other = negative_samples(docs, "doc_id", n_rows=n, k=4, seed="neg1")
    assert out.exceptAll(other).count() > 0
    with pytest.raises(ValueError):
        negative_samples(docs, "doc_id", n_rows=1)


def test_normalized_host_rules(spark):
    """Table-driven pin of every normalization rule: scheme case,
    userinfo, port, path/query/fragment, www. stripping (leading only,
    exactly once), case folding, and the malformed-URL → '' contract."""
    from full_docker_etl_spark.operators.curation import normalized_host

    cases = [
        ("https://example.com/a", "example.com"),
        ("HTTPS://Example.COM", "example.com"),
        ("http://WWW.News.Example.COM:8443/p?q=1#f", "news.example.com"),
        ("ftp://user:pw@www.Files.org/x", "files.org"),
        ("https://wwwx.example.com", "wwwx.example.com"),
        ("https://www.www.example.com", "www.example.com"),
        ("not a url", ""),
        ("//no-scheme.example.com/a", ""),
    ]
    df = spark.createDataFrame(cases, "url string, want string")
    got = df.select("want", normalized_host(F.col("url")).alias("got"))
    assert all(r.got == r.want for r in got.collect()), got.collect()


def test_blocklist_and_quota_semantics(spark):
    """Blocklist drops exactly the listed hosts; the quota keeps the
    ``quota`` LOWEST-order rows per host, ranks them 1..quota, and
    reports the PRE-cap host size; an under-quota host survives
    whole."""
    from full_docker_etl_spark.operators.curation import (
        blocklist_filter,
        host_quota_cap,
    )

    rows = [(i, "big.com") for i in range(10)]
    rows += [(100 + i, "small.com") for i in range(3)]
    rows += [(200 + i, "evil.com") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    blocked = spark.createDataFrame([("evil.com",)], "host string")
    kept = blocklist_filter(df, "host", blocked)
    assert kept.where("host = 'evil.com'").count() == 0
    capped = host_quota_cap(kept, "host", [("doc_id", True)], quota=4)
    got = {
        (r.doc_id, r.host_rank, r.n_host_docs) for r in capped.collect()
    }
    want = {(i, i + 1, 10) for i in range(4)} | {
        (100 + i, i + 1, 3) for i in range(3)
    }
    assert got == want
    import pytest

    with pytest.raises(ValueError, match="quota"):
        host_quota_cap(kept, "host", [("doc_id", True)], quota=0)


def test_dsir_selects_target_like_docs(spark):
    """DSIR semantics under a REAL distribution shift: source = 30
    vocab-A docs + 30 vocab-B docs, target = fresh vocab-A docs; the
    resample at frac=0.5 must select exactly the A docs, and every A
    doc must out-weigh every B doc."""
    from full_docker_etl_spark.operators.sampling import (
        dsir_importance,
        dsir_resample,
    )

    def doc(i, vocab, n=40):
        return " ".join(f"{vocab}{(i * 7 + j) % 12}" for j in range(n))

    src_rows = [(i, doc(i, "alpha")) for i in range(30)]
    src_rows += [(100 + i, doc(i, "beta")) for i in range(30)]
    source = spark.createDataFrame(src_rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(1000 + i, doc(i + 3, "alpha")) for i in range(10)],
        "doc_id long, text string",
    )
    w = {
        r.doc_id: r.avg_logw
        for r in dsir_importance(
            source, target, "text", "doc_id", n_buckets=256
        ).collect()
    }
    assert len(w) == 60
    assert min(w[i] for i in range(30)) > max(w[100 + i] for i in range(30))
    picked = {
        r.doc_id
        for r in dsir_resample(
            source, target, "text", "doc_id", frac=0.5, n_buckets=256
        ).collect()
    }
    assert picked == set(range(30))
    import pytest

    with pytest.raises(ValueError, match="frac"):
        dsir_resample(source, target, "text", "doc_id", frac=0.0)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_importance(source, target, "text", "doc_id", n_buckets=1)


def test_token_budget_plan_cap_and_shares(spark):
    """Mixture-planner semantics: a tiny upweighted source hits the
    epoch cap (epochs == max_epochs, planned < target), an abundant
    source stays under it (planned == target); achieved shares sum
    to 1; total planned tokens never exceed epochs-cap × avail."""
    from full_docker_etl_spark.operators.sampling import token_budget_plan

    rows = [("big", 10_000), ("mid", 400), ("tiny", 25)]
    df = spark.createDataFrame(
        [(s, 1, n) for s, n in rows], "source string, doc int, ntok long"
    )
    got = {
        r.source: r
        for r in token_budget_plan(
            df, "source", "ntok", budget_frac=0.5, alpha=0.5, max_epochs=2.0
        ).collect()
    }
    assert set(got) == {"big", "mid", "tiny"}
    # α=0.5 upweights tiny far beyond 2 epochs of its 25 tokens → capped
    assert got["tiny"].epochs == 2.0
    assert got["tiny"].planned_tokens == 50.0
    assert got["tiny"].planned_tokens < got["tiny"].target_tokens
    # big is downweighted: target below avail → uncapped, planned==target
    assert got["big"].epochs < 2.0
    assert abs(got["big"].planned_tokens - got["big"].target_tokens) < 1e-6
    assert abs(sum(r.achieved_share for r in got.values()) - 1.0) < 1e-5
    assert abs(sum(r.weight for r in got.values()) - 1.0) < 1e-5
    for r in got.values():
        assert r.planned_tokens <= 2.0 * r.avail_tokens + 1e-9


def test_degenerate_inputs_round14_hardening(spark):
    """Round-14 review regressions, pinned:
    - NULL-text docs must yield NO chunks (previously a phantom chunk
      claiming a full window of tokens);
    - NULL group rows must be THINNED, not dropped, by temperature_mix
      and repeated by temperature_upsample (null-safe join-back);
    - hash_split must raise on NULL keys instead of silently piling
      them into 'test';
    - tf_idf must never emit the '' pseudo-term for empty docs;
    - compression_features must honor a non-long id type;
    - lang_predict must pair scores to languages BY NAME, not position;
    - token_budget_plan must reject degenerate parameters."""
    import pytest

    from full_docker_etl_spark.operators.sampling import (
        temperature_mix,
        temperature_upsample,
        token_budget_plan,
    )
    from full_docker_etl_spark.operators.text import (
        compression_features,
        lang_predict,
        lang_scores,
        tf_idf,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f", "en"),
            (2, None, "en"),
            (3, "", None),
            (4, "x y z w v u", None),
        ],
        "doc_id long, text string, lang string",
    )
    # NULL text: no chunks; doc 3 ('') yields its single-token chunk
    got = chunk_documents(docs, "text", "doc_id", 4, 1).collect()
    assert not [r for r in got if r.doc_id == 2]

    # NULL-group rows survive temperature ops (2 en + 2 NULL: rates=1)
    kept = temperature_mix(docs, "lang", "doc_id", alpha=1.0)
    assert kept.count() == 4  # alpha=1: keep everything, incl. NULL grp
    reps = temperature_upsample(docs, "lang", "doc_id", alpha=1.0)
    assert reps.where(F.col("lang").isNull()).count() == 2

    with pytest.raises(Exception, match="NULL doc_id"):
        hash_split(docs.select(
            F.when(F.col("doc_id") == 2, None).otherwise(F.col("doc_id"))
            .alias("doc_id")
        ), "doc_id").collect()

    terms = tf_idf(docs, "text", "doc_id", top_k=3).collect()
    assert all(r.term != "" for r in terms)
    assert not [r for r in terms if r.doc_id == 3]  # empty doc: no terms

    sdocs = spark.createDataFrame(
        [("k1", "hello world")], "sid string, text string"
    )
    feats = compression_features(sdocs, "text", "sid").collect()
    assert feats[0].sid == "k1"

    scored = docs.where("text IS NOT NULL").select(
        "doc_id", *lang_scores(F.col("text"))
    )
    cols = [c for c in scored.columns if c.startswith("score_")]
    a = scored.select("doc_id", lang_predict(cols).alias("p")).collect()
    b = scored.select(
        "doc_id", lang_predict(list(reversed(cols))).alias("p")
    ).collect()
    assert {(r.doc_id, r.p) for r in a} == {(r.doc_id, r.p) for r in b}
    with pytest.raises(ValueError, match="does not name a known"):
        lang_predict(["score_xx"])

    for bad in (
        dict(budget_frac=0.0, alpha=0.5, max_epochs=4),
        dict(budget_frac=0.5, alpha=-1.0, max_epochs=4),
        dict(budget_frac=0.5, alpha=0.5, max_epochs=0),
    ):
        with pytest.raises(ValueError):
            token_budget_plan(
                docs.withColumn("nt", F.lit(10)), "lang", "nt", **bad
            )
