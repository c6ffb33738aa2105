"""Deterministic sampling / split assignment for training-data
pipelines.

Both operators are pure row-local or single-window transforms chosen
for reproducibility ACROSS ENGINES and across retries — no RNG state,
no `rand()` (which breaks task retry determinism):

- :func:`hash_split` — stable train/val/test assignment from the hex
  prefix of md5(key). A document's split never changes as the corpus
  grows (property of hashing the key, not the position), which is the
  invariant training pipelines need for leak-free evaluation sets.
- :func:`quota_per_group` — cap rows per group (per-source /
  per-domain quotas, the standard pretraining rebalance) with a
  deterministic keep-order.
- :func:`temperature_mix` — temperature-based domain reweighting
  (sample sources ∝ countᵅ), the GPT-3/PaLM-style mixing knob, as
  deterministic hash-thinning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# hex-prefix bands: 12/16 = 75% train, 2/16 = 12.5% val, 2/16 test
_TRAIN_MAX = "b"
_VAL_SET = ("c", "d")


def _uniform_u32(seed: str, *keys: "str | F.Column") -> F.Column:
    """The shared uniform-[0, 2^32) draw: first 8 hex digits of
    md5(seed:key[:key2...]) as an integer. Every sampling decision in
    this module compares against thresholds in this exact integer
    u-space — no rand() (breaks task-retry determinism), portable to
    any engine that can md5 (the oracles recompute it in SQL). Extra
    key components (e.g. a per-anchor rank) join the same ':'-separated
    preimage. (epoch_shuffle predates this helper and is pinned to a
    different preimage convention — seed+':' concatenated, not
    concat_ws — by its oracle; do not rewire it without a lockstep
    oracle change.)"""
    cols = [
        (F.col(k) if isinstance(k, str) else k).cast("string") for k in keys
    ]
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(seed), *cols)), 1, 8),
        16,
        10,
    ).cast("long")


def hash_split(df: DataFrame, key_col: str, out_col: str = "split") -> DataFrame:
    """Assign train (75%) / val (12.5%) / test (12.5%) from the first
    hex digit of md5(key): '0'-'b' → train, 'c'-'d' → val, 'e'-'f' →
    test. String-range logic only, so any engine that can md5 agrees
    bit-for-bit — no hex→int conversion, no RNG. NULL keys raise
    IN-PLAN (house style): md5(NULL) is NULL, every when() would
    evaluate false, and all corrupt-key rows would silently pile into
    the 'test' fallthrough — corrupting eval proportions (the
    stratified_split precondition, applied here)."""
    h1 = F.when(
        F.col(key_col).isNull(),
        F.raise_error(
            F.lit(
                f"hash_split: NULL {key_col} — a null key cannot be "
                "hashed and would silently land in 'test'"
            )
        ).cast("string"),
    ).otherwise(F.substring(F.md5(F.col(key_col).cast("string")), 1, 1))
    split = (
        F.when(h1 <= F.lit(_TRAIN_MAX), F.lit("train"))
        .when(h1.isin(*_VAL_SET), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(out_col, split)


def stratified_split(
    df: DataFrame,
    stratum_cols: list[str],
    key_col: str,
    seed: str = "strat0",
    out_col: str = "split",
) -> DataFrame:
    """EXACT-proportion stratified train/val/test split: within each
    stratum, rows ordered by md5(seed:key) take dense 0-indexed ranks
    r among the stratum's n rows and split by INTEGER bands —
    8r < 6n → train (75%), 8r < 7n → val (12.5%), else test — so every
    stratum's split sizes are exact to the row. :func:`hash_split` is
    exact only in expectation, which under-represents small strata in
    eval sets; this is the balanced-eval-set form. Pure integer
    comparisons → bit-identical on any engine that can md5.

    Scale shape: a per-stratum rank semantically needs a per-stratum
    total order — naively one window per stratum, a corpus-sized sort
    partition for a hot stratum. This is the two-level rank instead
    (the :func:`balanced_shards` pattern): the first 2 hex chars of the
    order hash give 256 ORDERED buckets per stratum (a hex prefix
    orders consistently with the full string); per-(stratum, bucket)
    counts aggregate map-side; the exclusive prefix and stratum total
    run over that bounded frame (≤ 256 rows per stratum); offsets
    broadcast back; the in-bucket row_number windows per
    (stratum, bucket) — partition-local sort, no rangepartitioning
    anywhere. The offsets frame is |strata|·256 rows — tiny for the
    intended strata (languages/domains/sources), so AQE converts its
    join to broadcast at runtime; it is deliberately NOT hinted
    broadcast, so a pathological high-cardinality stratum column
    (stratifying by near-unique keys) degrades to a shuffle join
    instead of a driver OOM — the same rule as the rare-shingle frame
    in ``jaccard_pairs``.

    ``key_col`` must be UNIQUE and NON-NULL (it is the tie-break after
    the hash; duplicates would make ranks retry- and engine-dependent,
    and concat_ws SKIPS a null key so every null-key row would share
    one hash with a null tie-break — enforced in-plan, fails loudly)."""
    h = F.when(
        F.col(key_col).isNull(),
        F.raise_error(
            F.lit(
                f"stratified_split: NULL {key_col} — the order key must"
                " be unique and non-null"
            )
        ).cast("string"),
    ).otherwise(
        F.md5(F.concat_ws(":", F.lit(seed), F.col(key_col).cast("string")))
    )
    tagged = df.withColumn("_h", h).withColumn(
        "_bkt", F.substring("_h", 1, 2)
    )
    counts = tagged.groupBy(*stratum_cols, "_bkt").agg(
        F.count(F.lit(1)).alias("_c")
    )
    w_off = (
        Window.partitionBy(*stratum_cols)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy(*stratum_cols)
    offsets = counts.select(
        *stratum_cols,
        "_bkt",
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_c").over(w_tot).alias("_n"),
    )
    w_in = Window.partitionBy(*stratum_cols, "_bkt").orderBy("_h", key_col)
    r = F.col("_off") + F.row_number().over(w_in) - 1
    split = (
        F.when(r * 8 < F.col("_n") * 6, F.lit("train"))
        .when(r * 8 < F.col("_n") * 7, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    # NULL-SAFE join on the stratum keys: window partitioning groups
    # NULL strata together (matching SQL PARTITION BY), so the join
    # back must too — a plain equi-join would silently DROP every
    # NULL-stratum row while the oracle keeps them ranked. Explicit
    # aliases keep the self-derived frames' attributes distinct.
    keys = [*stratum_cols, "_bkt"]
    t, o = tagged.alias("_t"), offsets.alias("_o")
    cond = None
    for c in keys:
        eq = F.col(f"_t.{c}").eqNullSafe(F.col(f"_o.{c}"))
        cond = eq if cond is None else cond & eq
    return (
        t.join(o, cond)
        .drop(*[o[c] for c in keys])
        .withColumn(out_col, split)
        .drop("_h", "_bkt", "_off", "_n")
    )


def leakage_safe_split(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    min_tokens: int = 20,
    max_occ: int = 1000,
    out_col: str = "split",
) -> DataFrame:
    """Train/val/test split that co-locates duplicate content:
    documents connected by a shared ≥``min_tokens``-token verbatim
    passage (transitively, via the substring-span pair graph's
    connected components) share one split, keyed by the component's
    min doc id — so a duplicated passage can never sit in train and
    eval at once, the contamination mode plain per-doc hash splitting
    cannot prevent. Singletons key by their own id; the assignment
    rule is :func:`hash_split`'s md5-hex-prefix bands applied to the
    cluster key. Returns (id_col, cluster, ``out_col``) plus the
    input's other columns."""
    from full_docker_etl_spark.operators.dedup import (
        connected_components,
        substring_spans,
    )

    pairs = (
        substring_spans(df, text_col, id_col, n, min_tokens, max_occ)
        .select("d1", "d2")
        .distinct()
    )
    comp = connected_components(pairs)
    labeled = df.join(comp, df[id_col] == comp["node"], "left").select(
        *[c for c in df.columns if c != text_col],
        F.coalesce("comp", id_col).alias("cluster"),
    )
    return hash_split(labeled, "cluster", out_col)


def quota_per_group(
    df: DataFrame,
    group_cols: list[str],
    order: list[tuple[str, bool]],
    quota: int,
) -> DataFrame:
    """Keep at most ``quota`` rows per group, deterministically (the
    explicit ``order`` + unique tie-break the caller supplies). One
    shuffle on the group key; per-group state is the quota counter —
    skew-safe because a hot group still emits only ``quota`` rows."""
    w = Window.partitionBy(*group_cols).orderBy(
        *[F.col(c).asc() if asc else F.col(c).desc() for c, asc in order]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= quota)
        .drop("__rn")
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float,
    seed: str = "mix0",
) -> DataFrame:
    """Temperature-based domain mixing: keep a deterministic subsample
    whose per-group sizes are ∝ n_gᵅ (``alpha`` = 1 keeps the natural
    mix, → 0 flattens toward uniform across groups) — the standard
    pretraining corpus-reweighting dial, downsampling-only (no
    replacement, no row duplication).

    Per-group keep rate r_g = (n_g / min_n)^(α-1), so the smallest
    group keeps 100% and expected kept counts are min_n^(1-α) · n_gᵅ.
    A row survives iff u(row) < r_g where u is the uniform-[0,1) value
    from the first 8 hex digits of md5(seed:key) — no rand(), so the
    sample is identical across engines, task retries, and epochs, and
    a document's fate never changes as OTHER groups grow (only its own
    group's count moves its rate).

    Scale shape: ONE map-side-combined count aggregation over the
    corpus (#groups rows out), rates derived on that tiny frame (a
    global window over #groups rows, fine because domains number in
    the hundreds, not millions), broadcast back, and the thinning
    itself is a map-local hash compare — the corpus is never shuffled.
    The rate is rounded to 6 decimals and compared in exact integer
    u-space (floor(r·2³²); ×2³² is a power-of-two scale, exact in
    binary) so the keep decision is bit-reproducible cross-engine.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    w_all = Window.partitionBy()
    thr = F.floor(
        F.round(
            F.pow(F.col("__n") / F.min("__n").over(w_all), F.lit(alpha - 1.0)),
            6,
        )
        * F.lit(4294967296.0)
    ).cast("long")
    rates = counts.select(group_col, thr.alias("__thr"))
    u = _uniform_u32(seed, key_col)
    # NULL-SAFE join back on the group: groupBy treats NULL as a real
    # group, so the rates frame HAS a NULL-group threshold row — a
    # plain equi-join would silently DROP (not thin) every NULL-group
    # document, violating the downsampling-only contract (the
    # stratified_split trap, same fix).
    d, r = df.alias("_d"), F.broadcast(rates).alias("_r")
    return (
        d.join(r, F.col(f"_d.{group_col}").eqNullSafe(F.col(f"_r.{group_col}")))
        .drop(F.col(f"_r.{group_col}"))
        .where(u < F.col("__thr"))
        .drop("__thr")
    )


def token_budget_plan(
    df: DataFrame,
    group_col: str,
    tokens_col: str,
    budget_frac: float,
    alpha: float,
    max_epochs: float,
) -> DataFrame:
    """Pretraining-mixture PLANNER — the published data-recipe stage
    (LLaMA/GPT-style mixture tables): given per-group available token
    counts, α-temperature target weights (w_g ∝ availᵍᵅ), a total
    token budget (``budget_frac`` of the corpus), and a repetition cap
    (``max_epochs``), emit each group's planned allocation:

      target_g  = budget · w_g
      epochs_g  = min(max_epochs, target_g / avail_g)
      planned_g = epochs_g · avail_g

    plus the achieved post-cap share — the number a training run
    actually consumes (capped groups fall short of their target; the
    shortfall is visible as achieved_share < weight).

    Scale shape: ONE map-side-combined sum over the corpus reduces it
    to #groups rows; everything after is arithmetic and unpartitioned
    windows over that tiny frame (domains number in the hundreds).
    The corpus is scanned once and never shuffled. Doubles are rounded
    (weights/shares 6 dp, token quantities 4 dp) on a ≤#groups frame
    where FP error is ~1e-12 — far below the grid."""
    # parameter validation, like every sibling sampler: budget_frac=0
    # would plan 0 tokens everywhere and NULL out achieved_share
    # (0/sum(0)), a wrong-looking report instead of an error; a
    # negative alpha silently INVERTS the weights.
    if not 0.0 < budget_frac <= 1.0:
        raise ValueError(f"budget_frac must be in (0, 1], got {budget_frac}")
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be positive, got {max_epochs}")
    g = (
        df.groupBy(group_col)
        .agg(F.sum(tokens_col).cast("double").alias("avail"))
    )
    w_all = Window.partitionBy()
    weighted = g.select(
        group_col,
        "avail",
        F.sum("avail").over(w_all).alias("tot"),
        (
            F.pow("avail", F.lit(alpha))
            / F.sum(F.pow("avail", F.lit(alpha))).over(w_all)
        ).alias("w"),
    )
    planned = weighted.select(
        group_col,
        "avail",
        "w",
        (F.lit(budget_frac) * F.col("tot") * F.col("w")).alias("target"),
        F.least(
            F.lit(max_epochs),
            F.lit(budget_frac) * F.col("tot") * F.col("w") / F.col("avail"),
        ).alias("epochs"),
    )
    return planned.select(
        group_col,
        F.col("avail").cast("long").alias("avail_tokens"),
        F.round("w", 6).alias("weight"),
        F.round("target", 4).alias("target_tokens"),
        F.round("epochs", 6).alias("epochs"),
        F.round(F.col("epochs") * F.col("avail"), 4).alias("planned_tokens"),
        F.round(
            F.col("epochs") * F.col("avail")
            / F.sum(F.col("epochs") * F.col("avail")).over(w_all),
            6,
        ).alias("achieved_share"),
    )


def temperature_upsample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float,
    seed: str = "mix0",
    max_repeat: int = 16,
    rep_col: str = "rep",
) -> DataFrame:
    """The upsampling companion to :func:`temperature_mix`: reach the
    ∝ n_gᵅ mix by REPEATING under-represented groups instead of
    dropping the over-represented one — the "N epochs over the small
    high-quality corpus" recipe. Rates are normalized to the LARGEST
    group (r_g = (n_g / max_n)^(α-1) ≥ 1, so the dominant group stays
    at exactly 1×): each row emits floor(r_g) copies plus one more iff
    u(row) < frac(r_g), with u the same md5-derived uniform as
    temperature_mix — deterministic, engine-portable, retry-stable.

    Output carries ``rep_col`` (1..k) so replicas are distinguishable
    downstream (epoch shuffling and packing need distinct keys).

    Scale shape: same as temperature_mix — one count agg, tiny
    broadcast, and the replication itself is a map-local
    explode(sequence(...)), no shuffle. Row blow-up is bounded by
    (max_n/min_n)^(1-α); ``max_repeat`` guards the pathological case
    (a tiny junk domain silently exploding the corpus) by raising
    instead of emitting — cap the domain list or raise α if it fires.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    w_all = Window.partitionBy()
    rate = F.round(
        F.pow(F.col("__n") / F.max("__n").over(w_all), F.lit(alpha - 1.0)), 6
    )
    rates = counts.select(
        F.col(group_col),
        F.floor(rate).cast("int").alias("__base"),
        F.floor((rate - F.floor(rate)) * F.lit(4294967296.0))
        .cast("long")
        .alias("__fthr"),
    )
    u = _uniform_u32(seed, key_col)
    # guard lives IN the plan (no eager extra pass, cannot be pruned:
    # it's a branch of the expression every output row evaluates)
    n_rep = F.when(
        F.col("__base") >= max_repeat,
        F.raise_error(
            F.concat(
                F.lit("temperature_upsample: group "),
                F.col(group_col).cast("string"),
                F.lit(
                    f" would be repeated >={max_repeat}x (bound "
                    "(max_n/min_n)^(1-alpha)); raise alpha, drop the "
                    "tiny group, or raise max_repeat"
                ),
            )
        ).cast("int"),
    ).otherwise(F.col("__base") + F.when(u < F.col("__fthr"), 1).otherwise(0))
    # NULL-SAFE join back (see temperature_mix): a NULL group is a real
    # group with a real repeat rate; a plain equi-join would delete its
    # rows instead of repeating them.
    d, r = df.alias("_d"), F.broadcast(rates).alias("_r")
    return (
        d.join(r, F.col(f"_d.{group_col}").eqNullSafe(F.col(f"_r.{group_col}")))
        .drop(F.col(f"_r.{group_col}"))
        .withColumn(rep_col, F.explode(F.sequence(F.lit(1), n_rep)))
        .drop("__base", "__fthr")
    )


def pack_chunks(
    chunks: DataFrame,
    shard_col,
    order: list[tuple[str, bool]],
    token_col: str,
    budget: int,
) -> DataFrame:
    """Pack chunks into training sequences of ~``budget`` tokens,
    in-order within shards (first-fit-in-order: a chunk joins the
    sequence its running token count falls into, so a sequence can
    overflow by at most one chunk — the standard streaming-packing
    approximation).

    Scale shape: packing is inherently sequential, so it is SHARDED —
    the running sum windows over ``shard_col``, never globally; each
    shard packs independently and in parallel. Returns the input plus
    (seq_id) = (shard, bin)."""
    w = Window.partitionBy(shard_col).orderBy(
        *[F.col(c).asc() if asc else F.col(c).desc() for c, asc in order]
    ).rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum(F.col(token_col)).over(w)
    bin_ = F.floor((cum - F.col(token_col)) / F.lit(budget))
    return chunks.withColumn("seq_bin", bin_.cast("long"))


def balanced_shards(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    target_weight: int,
    n_buckets: int = 1024,
) -> DataFrame:
    """Contiguous WEIGHT-balanced shard assignment — the
    tokenizer-output sharding step: cut the corpus, kept in ``id_col``
    order, into shards of ~``target_weight`` tokens each (a shard may
    overflow by at most one document, the same streaming-packing
    approximation as :func:`pack_chunks`). Contiguity is the point:
    curriculum order, resumable ingestion, and range-readable shards
    all need "shard k = ids between two cut points", which hash
    sharding (:func:`epoch_shuffle`) cannot give.

    A contiguous cut needs the GLOBAL running weight sum — the naive
    form is a global sort + single window, both forbidden at scale.
    This is the classic two-level distributed prefix sum instead:

    1. map each row to one of ``n_buckets`` deterministic id-range
       buckets (one bounded 1-row max-id aggregate, broadcast back);
    2. per-bucket weight totals — ≤ n_buckets rows (one
       map-side-combined shuffle);
    3. EXCLUSIVE prefix over that tiny frame (the only
       single-partition window, bounded at n_buckets rows by
       construction) → each bucket's starting offset;
    4. broadcast offsets back; the in-bucket running sum windows
       per bucket (scalable: partition-local sort, no
       rangepartitioning anywhere) and adds the bucket offset.

    shard = floor(start_offset / target_weight), where start_offset =
    global cumulative weight BEFORE the row — so a document belongs to
    the shard its first token lands in. Returns the input columns plus
    (cum_weight inclusive, shard). ``id_col`` must be UNIQUE (ties in
    the ROWS-frame running sum would make cum_weight order-dependent
    between the tied rows), and ``weight_col`` must be NON-NULL —
    both preconditions are on corrupt input, so the null case raises
    at execution time (sum() would skip the null but the running
    `cum - weight` and the shard floor would both go NULL, yielding
    wrong-looking rows instead of an error). Id-range bucketing
    assumes ids are
    roughly dense/uniform (true for generated doc ids); a pathological
    id distribution degrades to fewer effective buckets, never to
    wrong results."""
    if target_weight < 1:
        raise ValueError(f"target_weight must be >= 1, got {target_weight}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    idc = F.col(id_col).cast("long")
    # non-null id/weight preconditions, enforced IN the plan (corrupt
    # input must fail loudly, not emit wrong-looking rows): a NULL id
    # maps to a NULL bucket that the null-unsafe offsets join silently
    # drops; a NULL weight would be skipped by the bucket-total sum()
    # yet null out the running cum/shard of its own row. The guard
    # rides the weight expression, which every row evaluates in both
    # the bucket-total aggregate and the in-bucket window.
    wgt = (
        F.when(
            F.col(id_col).isNull(),
            F.raise_error(
                F.lit(
                    f"balanced_shards: NULL {id_col} — ids must be"
                    " unique and non-null (a NULL id's bucket would be"
                    " silently dropped)"
                )
            ).cast("long"),
        )
        .when(
            F.col(weight_col).isNull(),
            F.raise_error(
                F.concat(
                    F.lit(f"balanced_shards: NULL {weight_col} at {id_col}="),
                    F.col(id_col).cast("string"),
                    F.lit(" — weights must be non-null"),
                )
            ).cast("long"),
        )
        .otherwise(F.col(weight_col).cast("long"))
    )
    # Bucket arithmetic runs in DOUBLE space: long math (id * n_buckets)
    # silently wraps for snowflake-scale 64-bit ids (>= 2^63/n_buckets)
    # and would produce a NON-monotone id->bucket map — wrong cuts, no
    # error. long->double conversion and division by a positive
    # constant are both monotone (adjacent huge ids may collapse into
    # one bucket past 2^53 — fewer effective buckets, never wrong
    # results), and min-anchoring keeps all-negative id ranges valid.
    bounds = df.agg(
        F.min(idc).cast("double").alias("_min_id"),
        F.max(idc).cast("double").alias("_max_id"),
    )
    width = F.greatest(
        F.lit(1.0),
        F.ceil(
            (F.col("_max_id") - F.col("_min_id") + 1.0) / n_buckets
        ).cast("double"),
    )
    bucketed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_bucket",
        F.floor((idc.cast("double") - F.col("_min_id")) / width),
    )
    totals = bucketed.groupBy("_bucket").agg(
        F.sum(wgt).alias("_bw")
    )
    # partitionBy(lit) keeps the (bounded, <= n_buckets rows) prefix
    # window on one partition — same execution as an empty partition
    # spec without WindowExec's move-all-data warning on every run
    w_off = (
        Window.partitionBy(F.lit(0))
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_bucket",
        F.coalesce(F.sum("_bw").over(w_off), F.lit(0)).alias("_off"),
    )
    w_in = Window.partitionBy("_bucket").orderBy(idc.asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = F.col("_off") + F.sum(wgt).over(w_in)
    start = cum - wgt
    return (
        bucketed.join(F.broadcast(offsets), "_bucket")
        .withColumn("cum_weight", cum.cast("long"))
        .withColumn(
            "shard", F.floor(start / F.lit(target_weight)).cast("long")
        )
        .drop("_bucket", "_min_id", "_max_id", "_off")
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    seed: str,
    n_shards: int,
) -> DataFrame:
    """Deterministic global training-order shuffle: every epoch needs
    the corpus in a fresh pseudo-random order, reproducible under task
    retry and identical across engines — so the permutation key is
    md5(seed || key), never rand() or an engine-private hash. Change
    ``seed`` per epoch for a fresh order.

    ``key_col`` must be UNIQUE (it is the whole sort key after the
    hash): duplicate keys share a sort key, making their relative pos
    engine- and retry-dependent — which breaks the reproducibility
    contract. Epoch shuffling runs after dedup/canonicalization in any
    real pipeline, where the doc id is unique by construction; run
    exact_dedup/natural_key_dedup first if yours is not.

    Scale shape: a literal global sort of 100 TB is one giant
    range-partitioned sort whose only consumer reads the output
    serially — the wrong shape. Training readers consume SHARDS, so
    the shuffle is sharded too: the hash key routes each row to one of
    ``n_shards`` shards (uniform by construction), and ordering is
    imposed WITHIN each shard by a per-shard window — n_shards
    independent sorts that parallelize perfectly and stream straight
    into per-shard writers. Returns the input plus (shard, pos); pos
    is the row's deterministic position within its shard."""
    key = F.md5(F.concat(F.lit(seed + ":"), F.col(key_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long"), F.lit(n_shards)
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("__key").asc(), F.col(key_col).asc())
    return (
        df.withColumn("__key", key)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w))
        .drop("__key")
    )


def negative_samples(
    df: DataFrame,
    key_col: str,
    n_rows: int,
    k: int = 4,
    seed: str = "neg0",
) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive
    training: each anchor row gets ``k`` pseudo-random OTHER keys,
    reproducible across engines, epochs, and task retries (md5 u-space
    again — never rand()). Requires keys dense in [0, n_rows) — the
    state every corpus is in after canonical re-indexing (exact-dedup
    keep-list → row id); the modular draw then needs NO join against
    the corpus to know which negatives exist.

    Self-collisions shift to the next index (mod n) instead of
    re-drawing, so each anchor emits exactly ``k`` negatives in one
    map-local pass — no filtering, no variable fan-out, no shuffle.
    Emits (anchor key, neg_rank 1..k, neg_id)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_rows < 2:
        raise ValueError("need at least 2 rows to draw negatives")
    rank = F.explode(F.sequence(F.lit(1), F.lit(k))).alias("neg_rank")
    out = df.select(F.col(key_col), rank)
    # the module-wide u-space draw, keyed by (anchor, rank)
    u = _uniform_u32(seed, key_col, F.col("neg_rank"))
    cand = F.pmod(u, F.lit(n_rows))
    neg = F.when(
        cand == F.col(key_col), F.pmod(cand + 1, F.lit(n_rows))
    ).otherwise(cand)
    return out.select(key_col, "neg_rank", neg.cast("long").alias("neg_id"))


def dsir_importance(
    source: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 4096,
    add_k: float = 0.5,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every SOURCE
    document by how much more likely its hashed n-gram features are
    under the TARGET corpus's feature distribution than the source's —
    log w(doc) = Σ_grams [log p̂_target(bucket) − log p̂_source(bucket)]
    over unigram+bigram occurrences hashed into ``n_buckets`` buckets,
    both distributions add-k smoothed over the bucket space. The
    hashing is the paper's trick: the two LMs collapse to two
    bucket-count vectors, so "train two n-gram models and score a
    100 TB corpus" is three counting aggregations and one broadcast
    join.

    Scale shape: gram explosion is in-row (tokens ∪ bigrams, one
    posexplode-free concat); each corpus pays ONE map-side-combined
    count to ≤ n_buckets rows; the log-ratio table (≤ n_buckets rows,
    a few hundred KB) BROADCASTS onto the per-(doc, bucket) counts, so
    scoring never shuffles the corpus beyond its own (doc, bucket)
    combine. The bucket hash is md5-derived (engine-portable, no
    xxhash) so a DuckDB oracle can replicate every weight.

    Returns one row per source doc with ≥1 token:
    (``id_col``, n_grams, logw, avg_logw) — logw is the paper's
    resampling weight (length-correlated, as published), avg_logw the
    length-normalized variant; both rounded to 4 decimals (the repo's
    cross-engine float contract)."""
    from full_docker_etl_spark.operators.dedup import tokens, word_ngrams

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")

    def grams(df: DataFrame) -> DataFrame:
        g = F.concat(
            tokens(F.col(text_col)), word_ngrams(F.col(text_col), 2)
        )
        bkt = F.pmod(
            F.conv(F.substring(F.md5(F.col("_g")), 1, 8), 16, 10).cast(
                "long"
            ),
            F.lit(n_buckets),
        )
        # spread: the gram explosion + per-gram md5 bucketing is the
        # pass's CPU, and a single-row-group corpus file arrives as
        # ONE scan partition — one core would hash every gram. No-op
        # at real scale (operators/util.spread).
        from full_docker_etl_spark.operators.util import spread

        return (
            spread(df.where(F.col(text_col).isNotNull()))
            .select(F.col(id_col).alias("_did"), F.explode(g).alias("_g"))
            .select("_did", bkt.alias("_bkt"))
        )

    src_g = grams(source)
    # per-(doc, bucket) counts: the corpus-side combine that both the
    # source model AND the scoring pass reuse — one wide child, two
    # cheap parents. MATERIALIZED once (eager localCheckpoint): the
    # two parents' canonical plans diverge past Spark's ReuseExchange
    # (measured: zero ReusedExchange, the explode+combine ran twice),
    # and this frame is the DSIR paper's feature matrix — the thing a
    # production run persists anyway. Released by the bench/session
    # sweep; one-shot callers hold it for the query's lifetime only.
    doc_feats = (
        src_g.groupBy("_did", "_bkt")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .localCheckpoint(eager=True)
    )
    src_counts = doc_feats.groupBy("_bkt").agg(F.sum("_cnt").alias("_cq"))
    tgt_counts = grams(target).groupBy("_bkt").agg(
        F.count(F.lit(1)).alias("_cp")
    )
    # corpus totals as a broadcast one-row scalar (the sanctioned
    # crossJoin shape) — smoothing denominators, never collected
    totals = (
        src_counts.agg(F.sum("_cq").alias("_tq"))
        .crossJoin(
            tgt_counts.agg(
                F.coalesce(F.sum("_cp"), F.lit(0)).alias("_tp")
            )
        )
    )
    denom = F.lit(add_k) * F.lit(float(n_buckets))
    ratios = (
        src_counts.join(tgt_counts, "_bkt", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "_bkt",
            (
                F.log(F.coalesce(F.col("_cp"), F.lit(0)) + F.lit(add_k))
                - F.log(F.col("_tp") + denom)
                - F.log(F.col("_cq") + F.lit(add_k))
                + F.log(F.col("_tq") + denom)
            ).alias("_lw"),
        )
    )
    return (
        doc_feats.join(F.broadcast(ratios), "_bkt")
        .groupBy("_did")
        .agg(
            F.sum("_cnt").cast("long").alias("n_grams"),
            F.sum(F.col("_cnt") * F.col("_lw")).alias("_s"),
        )
        .select(
            F.col("_did").alias(id_col),
            "n_grams",
            F.round(F.col("_s"), 4).alias("logw"),
            F.round(F.col("_s") / F.col("n_grams"), 4).alias("avg_logw"),
        )
    )


def dsir_resample(
    source: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    frac: float = 0.2,
    n_buckets: int = 4096,
    add_k: float = 0.5,
) -> DataFrame:
    """The DSIR selection step: keep the ⌊frac·|source|⌋ source docs
    with the highest importance weight, deterministically (rounded
    logw desc, then id asc — ranking on the ROUNDED weight so the
    boundary is engine-portable). The top-k compiles to
    TakeOrderedAndProject (no global-sort exchange); |source| is one
    bounded scalar count."""
    import math

    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    n = source.where(F.col(text_col).isNotNull()).count()
    k = max(1, math.floor(frac * n))
    w = dsir_importance(source, target, text_col, id_col, n_buckets, add_k)
    return w.orderBy(F.col("logw").desc(), F.col(id_col).asc()).limit(k)
