"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — brute-force cosine top-k: the correctness
  baseline. The dot product is a zip_with/aggregate fold (JVM
  expressions, left-to-right — bit-deterministic), ranking is a
  per-query row_number. Cost O(|Q|·|C|·dim): fine for bounded query
  sets, the wrong tool for all-pairs at 100 TB.
- :func:`hyperplane_lsh_topk` — the scale path: random-hyperplane LSH.
  Sign-bit sketches against ``n_planes`` fixed pseudo-random
  hyperplanes bucket the corpus; each query only scores its own
  bucket (plus multi-probe neighbors at Hamming distance 1). Plane
  coefficients are integer-arithmetic pseudo-randoms (no RNG state,
  no libm) so sketches are reproducible everywhere.

At cluster scale the corpus side is hash-partitioned by bucket —
queries broadcast to their bucket's partitions only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i] in double — an ordered left fold, deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, NULL when either vector has zero norm —
    cosine is undefined there, and under Spark 4's default ANSI mode a
    raw division would abort the whole job on one degenerate embedding
    (DIVIDE_BY_ZERO); NULL instead falls out of every >=threshold
    filter, which is the only comparison this feeds."""
    na, nb = _norm(a), _norm(b)
    return F.when((na > 0) & (nb > 0), _dot(a, b) / (na * nb))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "qid",
    corpus_id: str = "vec_id",
    query_vec: str = "qvec",
    corpus_vec: str = "embedding",
    round_digits: int = 4,
    max_queries: int | None = 10_000,
) -> DataFrame:
    """Brute-force cosine top-k per query. The similarity is rounded
    before ranking and tie-broken by corpus id, making the result set
    deterministic and engine-portable.

    Cost is O(|Q|·|C|·dim), so an unbounded query set silently turns
    this into all-pairs: ``max_queries`` guards that (the check is a
    ``limit(n+1).count()`` — it scans at most n+1 rows). Pass ``None``
    to disable for a knowingly-large |Q|, or use
    :func:`hyperplane_lsh_topk` / :func:`ivf_topk` instead.

    Norms are hoisted to one column per input ROW before the join
    (bit-identical to folding inside the pair expression — same ops,
    same order), so per-pair work is one dot, not dot+2 norms.
    Zero-norm rows are DROPPED on both sides (cosine is undefined
    there; under default ANSI one degenerate embedding — e.g. an
    empty-text row — would otherwise DIVIDE_BY_ZERO-abort the job)."""
    if max_queries is not None:
        probe = queries.limit(max_queries + 1).count()
        if probe > max_queries:
            raise ValueError(
                f"cosine_topk: query set exceeds max_queries={max_queries}; "
                "this is an all-pairs scan at that size — use ivf_topk / "
                "hyperplane_lsh_topk, or pass max_queries=None to force"
            )
    q = queries.withColumn("_qn", _norm(F.col(query_vec))).where(
        F.col("_qn") > 0
    )
    c = corpus.withColumn("_cn", _norm(F.col(corpus_vec))).where(
        F.col("_cn") > 0
    )
    joined = q.crossJoin(c).where(F.col(query_id) != F.col(corpus_id))
    scored = joined.select(
        query_id,
        corpus_id,
        F.round(
            _dot(F.col(query_vec), F.col(corpus_vec))
            / (F.col("_qn") * F.col("_cn")),
            round_digits,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def _plane_coeff(plane, dim_index: Column) -> Column:
    """Deterministic pseudo-random hyperplane coefficient in [-0.5, 0.5):
    integer arithmetic only (Knuth multiplicative hashing), identical on
    any engine — no RNG state, no libm transcendentals. ``plane`` may
    be a Python int or a Column of plane indices."""
    p1 = plane + 1 if isinstance(plane, int) else plane + F.lit(1)
    mixed = (dim_index + 1) * F.lit(2654435761) + p1 * F.lit(40503)
    return ((mixed % 1000003) % 1000).cast("double") / 1000.0 - 0.5


def sketch_bits_multi(
    vec: Column, n_planes: int, n_tables: int = 1, first_table: int = 0
) -> Column:
    """``n_tables`` LSH sketches (bit p = sign(vec · plane_{t·P+p}),
    packed into a long each) as ONE fold over the vector: the
    accumulator carries all n_tables·n_planes running dot products, so
    each dimension is visited once — versus one fold per plane, which
    rescans the vector n_tables·n_planes times. The sign-taking packs
    inside the fold's finish lambda (a separate projection would let
    CollapseProject inline the fold per table). ``first_table`` starts
    the plane-id range at family ``first_table`` (ids are GLOBAL:
    family t always uses planes [t·P, (t+1)·P), whatever window is
    computed), so a single later family costs one family's arithmetic,
    not first_table+1 of them. Returns array<long>[n_tables]."""
    total = n_tables * n_planes
    base = first_table * n_planes
    plane_ids = F.array(*[F.lit(base + p) for p in range(total)])

    def step(state, x):
        # state = struct(i: dim index, dots: running dot products)
        dots = F.zip_with(
            state["dots"],
            plane_ids,
            lambda d, p: d + x.cast("double") * _plane_coeff(p, state["i"]),
        )
        return F.struct((state["i"] + 1).alias("i"), dots.alias("dots"))

    def finish(state):
        dots = state["dots"]
        return F.array(
            *[
                sum(
                    F.when(
                        F.element_at(dots, t * n_planes + p + 1) >= 0,
                        F.lit(1 << p).cast("long"),
                    ).otherwise(F.lit(0).cast("long"))
                    for p in range(n_planes)
                )
                for t in range(n_tables)
            ]
        )

    init = F.struct(
        F.lit(0).alias("i"),
        F.array_repeat(F.lit(0.0), total).alias("dots"),
    )
    return F.aggregate(vec, init, step, finish)


def sketch_bits(vec: Column, n_planes: int, table: int = 0) -> Column:
    """Single-table view of :func:`sketch_bits_multi` (plane family
    ``table``) — the public single-sketch entry point. Computes ONLY
    the requested family (plane ids offset via ``first_table``): the
    previous table+1-family fold did table× discarded arithmetic per
    row for the identical bits."""
    return F.element_at(
        sketch_bits_multi(vec, n_planes, 1, first_table=table), 1
    )


def _centroid_row(centroids: DataFrame) -> DataFrame:
    """The whole centroid set as ONE row (array<struct<centroid,uvec>>)
    — the broadcastable form for per-row argmax assignment. Centroid
    vectors are pre-normalized to UNIT vectors here (k·dim work, once),
    so assignment needs neither centroid norms nor the row norm:
    argmax_c dot(v, c/|c|) = argmax_c cosine(v, c) because |v| is a
    positive constant across the candidates. Sorted by centroid id so
    the array layout (and the index tie-break below) is stable.

    The norm is hoisted to a COLUMN before the transform — inside the
    lambda it would be re-folded once per element (O(dim²) per
    centroid). Zero-norm centroids are DROPPED: 0/0 would make a NaN
    unit vector, and NaN sorts greatest in Spark, so such a centroid
    would win every argmax; cosine against the zero vector is
    undefined anyway, so excluding it from the candidate set is the
    only assignment that means anything."""
    unit = (
        centroids.withColumn("_cnorm", _norm(F.col("cvec")))
        .where(F.col("_cnorm") > 0)
        .select(
            "centroid",
            F.transform(
                "cvec", lambda x: x.cast("double") / F.col("_cnorm")
            ).alias("uvec"),
        )
    )
    return unit.agg(
        F.array_sort(
            F.collect_list(F.struct("centroid", "uvec"))
        ).alias("_cents")
    )


def assign_nearest(
    df: DataFrame,
    vec_col: str,
    centroids: DataFrame,
    n: int = 1,
    out: str = "centroid",
) -> DataFrame:
    """Nearest-centroid assignment as a PER-ROW expression, zero shuffle
    of ``df``: the k-row centroid set is folded into a single
    array<struct> row with UNIT centroid vectors, broadcast
    (BroadcastNestedLoopJoin against one row — no replication, no
    exchange of ``df``), and each row computes k dot products in one
    ``transform`` and takes the argmax in-row. Per-row cost is exactly
    k dots — the row's own norm cancels out of the argmax and is never
    computed, and centroid norms are folded into the broadcast side.

    The previous formulation (crossJoin(broadcast(centroids)) →
    Window.partitionBy(row id) → row_number()==1) materialized
    |df|·k rows INCLUDING the vectors and hash-exchanged them just to
    pick a per-row maximum — at corpus scale that exchange is the job.

    Ties break by lowest centroid id, via the POSITION in the id-sorted
    array (struct max over (score, -pos)) — so ids only need to be
    orderable, not numeric. An empty centroid set yields zero rows
    (matching the crossJoin-with-empty semantics), never null
    assignments. ``n`` > 1 returns the n nearest as one output row
    each (in-row sort + slice + explode — still no exchange)."""
    scored = (
        df.crossJoin(F.broadcast(_centroid_row(centroids)))
        .where(F.size("_cents") >= 1)
        .withColumn(
            "_sc",
            F.transform(
                "_cents",
                lambda c, i: F.struct(
                    _dot(F.col(vec_col), c["uvec"]).alias("score"),
                    (-i).alias("_negpos"),
                ),
            ),
        )
    )

    def centroid_at(entry: Column) -> Column:
        return F.get(F.col("_cents"), -entry["_negpos"])["centroid"]

    if n == 1:
        return scored.withColumn(
            out, centroid_at(F.array_max("_sc"))
        ).drop("_cents", "_sc")
    top_n = F.slice(F.reverse(F.array_sort("_sc")), 1, n)
    return (
        scored.withColumn("_best", F.explode(top_n))
        .withColumn(out, centroid_at(F.col("_best")))
        .drop("_cents", "_sc", "_best")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    query_id: str = "qid",
    corpus_id: str = "vec_id",
    query_vec: str = "qvec",
    corpus_vec: str = "embedding",
    centroids: DataFrame | None = None,
    n_assign: int = 1,
) -> DataFrame:
    """IVF-Flat ANN: partition the corpus into inverted lists by
    nearest centroid, probe only the ``nprobe`` closest lists per
    query, exact cosine within candidates.

    Default centroids are a deterministic corpus sample (lowest ids);
    pass a (centroid, cvec) frame — e.g. from
    :func:`kmeans_centroids` — to swap in trained centroids without
    touching the flow. At cluster scale the corpus is hash-partitioned
    by ``centroid``, so a query touches nprobe/n_centroids of the
    data; assignment is :func:`assign_nearest` — a per-row argmax over
    the broadcast centroid set, zero shuffle of the corpus.

    ``n_assign`` > 1 is corpus-side MULTI-ASSIGNMENT: each vector
    joins its ``n_assign`` nearest lists, so a true neighbor sitting
    on a cluster boundary is findable from either side — the standard
    IVF recall lever (FAISS's replication / SOAR's multi-assignment),
    bought with an ``n_assign``× larger index, NOT more query-time
    scan (a query still probes nprobe lists; duplicate candidate pairs
    collapse in :func:`_score_and_rank`'s dedup). Measured on the
    hash-spread probe slice at sf0.01: recall 0.54 → 0.88-0.92 going
    (nprobe=4, n_assign=1) → (6, 2)."""
    if centroids is None:
        centroids = (
            corpus.orderBy(F.col(corpus_id).asc())
            .limit(n_centroids)
            .select(
                F.col(corpus_id).alias("centroid"),
                F.col(corpus_vec).alias("cvec"),
            )
        )
    else:
        centroids = centroids.select("centroid", "cvec")

    # Norms are hoisted to one column per input row (bit-identical to
    # folding them inside the per-pair cosine — same ops, same order);
    # a corpus row is a candidate for up to nprobe queries, so per-pair
    # work drops to one dot.
    assigned = assign_nearest(
        corpus.withColumn("_cn", _norm(F.col(corpus_vec))),
        corpus_vec,
        centroids,
        n_assign,
    )
    probed = assign_nearest(
        queries.withColumn("_qn", _norm(F.col(query_vec))),
        query_vec,
        centroids,
        nprobe,
    )
    cand = probed.join(assigned, "centroid").where(
        F.col(query_id) != F.col(corpus_id)
    )
    return _score_and_rank(cand, k, query_id, corpus_id, query_vec, corpus_vec)


def _score_and_rank(
    cand: DataFrame,
    k: int,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
) -> DataFrame:
    """Shared IVF tail: exact cosine over candidates (hoisted norms in
    ``_qn``/``_cn``), dedup multi-probe hits, per-query top-k.
    Zero-norm rows are dropped (undefined cosine; ANSI would abort)."""
    cand = cand.where((F.col("_qn") > 0) & (F.col("_cn") > 0))
    scored = cand.select(
        query_id,
        corpus_id,
        F.round(
            _dot(F.col(query_vec), F.col(corpus_vec))
            / (F.col("_qn") * F.col("_cn")),
            4,
        ).alias("cos_sim"),
    ).dropDuplicates([query_id, corpus_id])
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def ivf_build_lists(
    corpus: DataFrame,
    path: str,
    centroids: DataFrame,
    corpus_vec: str = "embedding",
    n_assign: int = 1,
) -> None:
    """The IVF BUILD step at serving shape: assign every corpus vector
    to its nearest centroid (zero-shuffle argmax) and WRITE the corpus
    ``partitionBy("centroid")`` — the inverted lists become partition
    directories. The row norm is precomputed into the lists, so the
    serve path never touches corpus vectors except for one dot per
    candidate. Rebuilding is a full refresh; on a lake table you'd
    MERGE per-partition. ``n_assign`` > 1 replicates each vector into
    its n nearest lists (see :func:`ivf_topk` — the recall lever paid
    in index size; the probe's dedup collapses double hits)."""
    assigned = assign_nearest(
        corpus.withColumn("_cn", _norm(F.col(corpus_vec))),
        corpus_vec,
        centroids.select("centroid", "cvec"),
        n_assign,
    )
    # Route by the list key before the partitioned write (the
    # write.distribution-mode idiom, optimization guide §6): an
    # unclustered input writes one file per (task × touched list) —
    # task-count small files in every centroid= directory, which both
    # fragments the serve-path scan and multiplies commit overhead.
    # REBALANCE, not a hash repartition (VERDICT r18 #3): a hot
    # centroid — what IVF imbalance looks like on real embedding
    # distributions — would hash to ONE writer task at 100 TB, where
    # the AQE rebalance splits it to advisory-sized files instead.
    from full_docker_etl_spark.operators.util import rebalanced

    rebalanced(assigned, "centroid").write.mode(
        "overwrite"
    ).partitionBy("centroid").parquet(path)


def ivf_probe_lists(
    spark,
    path: str,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    query_id: str = "qid",
    query_vec: str = "qvec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """The IVF SERVE step: probe the ``nprobe`` nearest lists per query
    against the partitioned store from :func:`ivf_build_lists`. The
    probe side is tiny (|Q|·nprobe rows) and broadcasts, so the join
    DYNAMIC-PARTITION-PRUNES the corpus scan — only the probed
    centroid directories are read at all (asserted in
    tests/test_plans.py). At 1000 executors this is the difference
    between scanning nprobe/n_centroids of 100 TB and scanning 100 TB."""
    lists = spark.read.parquet(path)
    probed = assign_nearest(
        queries.withColumn("_qn", _norm(F.col(query_vec))),
        query_vec,
        centroids.select("centroid", "cvec"),
        nprobe,
    )
    cand = F.broadcast(probed).join(lists, "centroid").where(
        F.col(query_id) != F.col(corpus_id)
    )
    return _score_and_rank(cand, k, query_id, corpus_id, query_vec, corpus_vec)


def lsh_band_params(
    threshold: float,
    corpus_size: int,
    target_recall: float = 0.95,
    min_rows: int = 8,
    max_bands: int = 64,
) -> tuple[int, int]:
    """(rows_per_band, bands) sized to the corpus: rows so a RANDOM
    pair's per-band collision odds are ~1/|C| (candidate volume stays
    ~O(|C|) instead of growing quadratically with fixed-width keys),
    then bands so a TRUE pair at ``threshold`` is still caught with
    ``target_recall`` (per-band agree prob p = (1-θ/π)^rows, recall =
    1-(1-p)^bands). Pure driver-side arithmetic on a count the caller
    already knows — no job."""
    import math

    rows = max(min_rows, math.ceil(math.log2(max(corpus_size, 2))))
    theta = math.acos(min(max(threshold, -1.0), 1.0))
    p_band = (1.0 - theta / math.pi) ** rows
    if p_band >= 1.0:
        return rows, 1
    if p_band <= 0.0:
        # threshold == -1: a band never agrees; the best the scheme can
        # offer is every table it is allowed
        return rows, max_bands
    need = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_band))
    return rows, min(max_bands, max(1, need))


def cosine_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.98,
    n_planes: int = 16,
    bands: int = 2,
    corpus_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup PAIRS (the vector sibling of the
    MinHash text tier): each band is an INDEPENDENT hyperplane-sketch
    family (one long key per band, all from one fold); candidate pairs
    come only from band-bucket collisions, then an exact cosine filter.
    A true pair at ``threshold`` agrees on a band with prob
    (1-θ/π)^rows, so recall = 1-(1-p)^bands; random pairs collide at
    ~2^-rows per band. Never all-pairs: candidate volume is Σ bucket²
    per band. Pairs are generated id-only and vectors joined back for
    scoring, so the band-union shuffle carries (id, long) rows, not
    vectors.

    Fixed (n_planes, bands) is right only while |corpus| ≲
    2^(n_planes/bands); pass ``corpus_size`` to size both from the
    data instead (:func:`lsh_band_params`): key width tracks
    log2|corpus| — collision noise stays ~O(|C|) — and the band count
    restores recall at the chosen threshold."""
    from full_docker_etl_spark.operators.util import spread

    if corpus_size is not None:
        rows, bands = lsh_band_params(threshold, corpus_size)
    else:
        if bands < 1 or bands > n_planes or n_planes % bands != 0:
            raise ValueError(
                f"cosine_pairs_lsh: bands={bands} must divide "
                f"n_planes={n_planes} (1 <= bands <= n_planes) — "
                "bands > n_planes makes 0-plane sketches (obscure "
                "downstream crash) and a non-divisor silently narrows "
                "every band key to n_planes//bands planes, inflating "
                "collision noise with no signal to the caller"
            )
        rows = n_planes // bands
    base = spread(df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")))
    # per-band sketches AND norm computed once per vector (cached) —
    # verification pairs then cost one dot each
    sk = (
        base.withColumn(
            "sks", sketch_bits_multi(F.col("vec"), rows, bands)
        )
        .withColumn("_n", _norm(F.col("vec")))
        .cache()
    )
    # the per-band sketch column IS the band array — posexplode emits
    # exactly the rows the old per-band union built (band = 0-based
    # position, bucket = that band's sketch), from ONE scan of the
    # cache instead of `bands` scans per join side (r18; the
    # _simhash_blocked_candidates rationale)
    banded = sk.select(
        "vid", F.posexplode("sks").alias("band", "bucket")
    )
    a = banded.select(F.col("vid").alias("d1"), "band", "bucket")
    b_ = banded.select(F.col("vid").alias("d2"), "band", "bucket")
    pairs = (
        a.join(b_, ["band", "bucket"])
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    v1 = sk.select(
        F.col("vid").alias("d1"), F.col("vec").alias("v1"), F.col("_n").alias("n1")
    )
    v2 = sk.select(
        F.col("vid").alias("d2"), F.col("vec").alias("v2"), F.col("_n").alias("n2")
    )
    return (
        pairs.join(v1, "d1")
        .join(v2, "d2")
        # zero-norm vectors: cosine undefined, ANSI division aborts —
        # they can never clear a positive threshold, so drop them here
        .where((F.col("n1") > 0) & (F.col("n2") > 0))
        .withColumn(
            "cos_sim",
            F.round(
                _dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")), 4
            ),
        )
        .where(F.col("cos_sim") >= threshold)
        .select("d1", "d2", "cos_sim")
    )


def hyperplane_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    query_id: str = "qid",
    corpus_id: str = "vec_id",
    query_vec: str = "qvec",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Bucketed ANN, multi-table: ``n_tables`` independent plane
    families each bucket the corpus; a query is scored against every
    corpus vector sharing its bucket (or a 1-bit-flipped neighbor —
    multi-probe) in ANY table. Per-table miss probabilities multiply,
    so recall ≈ 1-(1-p)^L while candidate volume stays
    ~L·(1+planes)·|C|/2^planes — the standard recall/cost dial that a
    single table lacks. Tables/probes join on (table, bucket), so one
    equi-join serves all tables."""
    # Norms computed once per input row, before the per-table/probe
    # explosion — per-candidate work is then one dot product.
    c = corpus.select(
        corpus_id,
        corpus_vec,
        _norm(F.col(corpus_vec)).alias("_cn"),
        F.posexplode(
            sketch_bits_multi(F.col(corpus_vec), n_planes, n_tables)
        ).alias("tbl", "bucket"),
    )
    # query side: every table's own bucket plus its 1-bit-flipped
    # neighbors (multi-probe), all from the one sketch array
    q = (
        queries.select(
            query_id,
            query_vec,
            _norm(F.col(query_vec)).alias("_qn"),
            F.posexplode(
                sketch_bits_multi(F.col(query_vec), n_planes, n_tables)
            ).alias("tbl", "qbucket"),
        )
        .select(
            query_id,
            query_vec,
            "_qn",
            "tbl",
            F.explode(
                F.array(
                    F.col("qbucket"),
                    *[
                        F.col("qbucket").bitwiseXOR(F.lit(1 << p))
                        for p in range(n_planes)
                    ],
                )
            ).alias("bucket"),
        )
    )
    cand = (
        q.join(c, ["tbl", "bucket"])
        .where(F.col(query_id) != F.col(corpus_id))
        # zero-norm rows: undefined cosine, ANSI division aborts
        .where((F.col("_qn") > 0) & (F.col("_cn") > 0))
    )
    scored = cand.select(
        query_id,
        corpus_id,
        F.round(
            _dot(F.col(query_vec), F.col(corpus_vec))
            / (F.col("_qn") * F.col("_cn")),
            4,
        ).alias("cos_sim"),
    ).dropDuplicates([query_id, corpus_id])
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def kmeans_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    max_iter: int = 10,
    train_sample: int = 4096,
) -> DataFrame:
    """Lloyd's k-means over the embedding column. Deterministic:
    init = the k lowest-id vectors, assignment by cosine with ties
    breaking to the lowest centroid id.

    Training runs DRIVER-SIDE on a bounded hash-spread sample — the
    same treatment :func:`pq_codebooks` got and the FAISS convention
    (coarse quantizers train on a sample, so training cost is CONSTANT
    in corpus size): two bounded collects (the k init vectors and
    ≤``train_sample`` md5-ordered training vectors, ~2 MB of float64
    at the defaults) feed plain NumPy Lloyd's rounds, replacing
    ``max_iter`` distributed assign+aggregate jobs with zero per-round
    cluster work. Only the trained k-row centroid literal goes back to
    the cluster; the corpus then pays exactly ONE distributed
    :func:`assign_nearest` pass to report true full-corpus membership.
    Empty clusters keep their previous codeword (the PQ convention).
    Returns (centroid, cvec, n_members) with n_members lazily computed
    under the FINAL centroids."""
    import numpy as np

    # Degenerate vectors carry no geometry and would poison means
    # silently (an empty embedding has no components, a NULL element
    # breaks the mean) — filter them up front, as every consumer of
    # the centroid set does for assignment anyway.
    corpus = corpus.where(
        (F.size(F.col(vec_col)) > 0)
        & ~F.exists(F.col(vec_col), lambda x: x.isNull())
    )
    spark = corpus.sparkSession
    init_rows = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(F.col("_id").asc())
        .limit(k)
        .collect()
    )
    if not init_rows:
        raise ValueError("cannot train k-means centroids: empty corpus")
    cents = np.array([list(r._v) for r in init_rows], dtype=np.float64)
    th = F.md5(F.concat(F.lit("kmsample:"), F.col(id_col).cast("string")))
    train = np.array(
        [
            list(r._v)
            for r in corpus.select(F.col(vec_col).alias("_v"), th.alias("_h"))
            .orderBy("_h")
            .limit(train_sample)
            .select("_v")
            .collect()
        ],
        dtype=np.float64,
    )
    tn = np.linalg.norm(train, axis=1)
    tn[tn == 0.0] = 1.0
    unit = train / tn[:, None]
    for _ in range(max_iter):
        cn = np.linalg.norm(cents, axis=1)
        cn[cn == 0.0] = 1.0
        sims = unit @ (cents / cn[:, None]).T
        # argmax first-occurrence = lowest centroid index, matching
        # assign_nearest's tie-break
        assign = sims.argmax(axis=1)
        for j in range(len(cents)):
            members = train[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    cents_df = spark.createDataFrame(
        [(j + 1, [float(x) for x in c]) for j, c in enumerate(cents)],
        "centroid int, cvec array<float>",
    )
    n_members = (
        assign_nearest(corpus, vec_col, cents_df, 1)
        .groupBy("centroid")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )
    return cents_df.join(n_members, "centroid", "left").select(
        "centroid",
        "cvec",
        F.coalesce(F.col("n_members"), F.lit(0)).alias("n_members"),
    )


def sq_quantize(vec: Column, scale: float) -> Column:
    """Symmetric INT8 scalar quantization: q[i] = round(x[i]/scale·127)
    as ``array<tinyint>`` — 4× smaller than the float32 source (64 B vs
    256 B for a 64-dim vector). ``scale`` is the corpus-wide max |x|,
    so every corpus component lands in [-127, 127] exactly (no clamp
    branch). The inverse x̂ = q·scale/127 is never materialized:
    ranking by quantized dots is invariant to the constant factor."""
    return F.transform(
        vec, lambda x: F.round(x / F.lit(scale) * 127).cast("tinyint")
    )


def sq_scale(corpus: DataFrame, vec_col: str = "embedding") -> float:
    """The corpus-wide symmetric quantization scale max |x[i]| — one
    all-column aggregation (a single scalar to the driver, the same
    shape as a range-partitioner sample)."""
    row = corpus.agg(
        F.max(F.array_max(F.transform(F.col(vec_col), F.abs))).alias("s")
    ).first()
    if row is None or row.s is None:
        raise ValueError("cannot derive a quantization scale: empty corpus")
    if row.s == 0.0:
        # an all-zero corpus has no geometry to quantize; x/scale would
        # otherwise divide by zero and the ANSI tinyint cast would throw
        # from deep inside a task instead of here
        raise ValueError(
            "cannot derive a quantization scale: every corpus vector "
            "is all-zero"
        )
    return float(row.s)


def ivf_sq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    query_id: str = "qid",
    corpus_id: str = "vec_id",
    query_vec: str = "qvec",
    corpus_vec: str = "embedding",
    centroids: DataFrame | None = None,
    n_assign: int = 1,
    rerank_factor: int = 4,
) -> DataFrame:
    """IVF with SCALAR-QUANTIZED (int8) inverted lists and exact
    re-ranking — the memory/IO answer when the lists themselves are
    the 100 TB wall: list entries store ``array<tinyint>`` (4× smaller
    than float32), candidate scoring runs ASYMMETRIC (float query ×
    int8 corpus, FAISS's ADC shape — the query side costs nothing to
    keep exact and halves the quantization noise), and only the top
    ``rerank_factor·k`` candidates per query are re-scored against the
    full-precision store (|Q|·rerank_factor·k point lookups, never a
    scan). Quantization can only DEMOTE a true neighbor out of the
    re-rank window, not mis-rank the final top-k — the exact pass owns
    the returned scores, so the output is directly comparable to
    :func:`ivf_topk`'s (same (qid, vec_id, cos_sim, rank) contract,
    same rounding).

    Recall is pinned externally (ann_ivf_sq_recall, floor vs the same
    exact truth as the float tier); the compression story is in
    SCALE.md. Scale shape: one scalar aggregation for the global
    quantization scale, zero-shuffle list assignment, and the re-rank
    join is an equi-join on the corpus id."""
    if centroids is None:
        centroids = (
            corpus.orderBy(F.col(corpus_id).asc())
            .limit(n_centroids)
            .select(
                F.col(corpus_id).alias("centroid"),
                F.col(corpus_vec).alias("cvec"),
            )
        )
    else:
        centroids = centroids.select("centroid", "cvec")
    scale = sq_scale(corpus, corpus_vec)
    # the LISTS: id + int8 codes + quantized norm — the float vector
    # does NOT ride into the index (that is the whole point)
    assigned = assign_nearest(
        corpus, corpus_vec, centroids, n_assign
    ).select(
        corpus_id,
        "centroid",
        sq_quantize(F.col(corpus_vec), scale).alias("_q8"),
    )
    assigned = assigned.withColumn(
        "_cnq", F.sqrt(_dot(F.col("_q8"), F.col("_q8")))
    )
    probed = assign_nearest(
        queries.withColumn("_qn", _norm(F.col(query_vec))),
        query_vec,
        centroids,
        nprobe,
    )
    cand = (
        probed.join(assigned, "centroid")
        .where(F.col(query_id) != F.col(corpus_id))
        # quantization-degenerate corpus rows (every |x| < scale/254
        # rounds to int8 code 0) have _cnq = 0: no direction survives
        # the quantization, so they are invisible to the SQ shortlist
        # — and under ANSI the raw division would abort the job on ONE
        # such vector. The exact and IVF-Flat tiers still see them; on
        # normalized embeddings (the deployment posture) codes cannot
        # all round to zero. Zero-norm queries likewise score nothing.
        .where((F.col("_qn") > 0) & (F.col("_cnq") > 0))
    )
    approx = (
        cand.withColumn(
            "_ascore",
            _dot(F.col(query_vec), F.col("_q8"))
            / (F.col("_qn") * F.col("_cnq")),
        )
        .dropDuplicates([query_id, corpus_id])
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("_ascore").desc(), F.col(corpus_id).asc()
    )
    shortlist = (
        approx.withColumn("_arank", F.row_number().over(w))
        .where(F.col("_arank") <= rerank_factor * k)
        .select(query_id, corpus_id, query_vec, "_qn")
    )
    # exact re-rank: point lookups into the full-precision store
    full = corpus.select(
        corpus_id,
        corpus_vec,
        _norm(F.col(corpus_vec)).alias("_cn"),
    )
    reranked = shortlist.join(full, corpus_id)
    return _score_and_rank(reranked, k, query_id, corpus_id, query_vec, corpus_vec)


def _sq_l2(a: Column, b: Column) -> Column:
    """Σ (a[i]−b[i])² in double — ordered left fold, deterministic."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 256,
    train_iters: int = 0,
    train_sample: int = 4096,
) -> tuple[DataFrame, int]:
    """PRODUCT-QUANTIZATION codebooks as one broadcastable row:
    ``_books[mm][j]`` = subspace-``mm`` slice of the j-th codebook
    vector, ``_bn2[mm][j]`` = that codeword's squared norm. Codewords
    start as a HASH-SPREAD corpus sample (md5-ordered first ``k`` ids
    — the repo's deterministic-sample pattern, no RNG, engine-stable);
    ``train_iters`` > 0 then refines them with per-subspace LLOYD'S
    rounds — all m subspace problems solved TOGETHER per round (one
    exploded (mm, j, pos) aggregation, not m separate jobs) over a
    bounded hash-spread training sample (``train_sample`` vectors —
    the FAISS convention: codebooks train on a sample, so training
    cost is CONSTANT in corpus size; the full corpus only ever pays
    the one encode pass). Empty clusters keep their previous codeword.
    Returns (one-row frame, subspace dim).

    Training runs DRIVER-SIDE: the sample is ≤``train_sample`` vectors
    by contract (~2 MB of float64 at the defaults — squarely inside the
    repo's bounded-collect rule), so the Lloyd's rounds are plain NumPy
    on two TakeOrdered collects instead of per-round Spark jobs; only
    the trained one-row codebook literal goes back to the cluster. The
    full corpus still pays exactly one distributed encode pass, so
    training cost stays CONSTANT in corpus size — and constant in
    round count too. Assignment ties break to the lowest codeword
    index (``argmin`` first occurrence), matching :func:`pq_encode`'s
    struct-min tie-break, so a vector's training-time cluster equals
    its encode-time code."""
    first = corpus.select(vec_col).first()
    if first is None:
        raise ValueError("cannot build PQ codebooks: empty corpus")
    dim = len(first[0])
    if dim % m:
        raise ValueError(
            f"vector dim {dim} is not divisible into m={m} subspaces"
        )
    d = dim // m
    h = F.md5(
        F.concat(F.lit("pqsample:"), F.col(id_col).cast("string"))
    )
    sample = (
        corpus.select(F.col(vec_col).alias("_v"), h.alias("_h"))
        .orderBy("_h")
        .limit(k)
    )
    if train_iters > 0:
        import numpy as np

        init = np.array(
            [list(r[0]) for r in sample.select("_v").collect()],
            dtype=np.float64,
        )
        th = F.md5(
            F.concat(F.lit("pqtrain:"), F.col(id_col).cast("string"))
        )
        train = np.array(
            [
                list(r[0])
                for r in corpus.select(
                    F.col(vec_col).alias("_v"), th.alias("_h")
                )
                .orderBy("_h")
                .limit(train_sample)
                .select("_v")
                .collect()
            ],
            dtype=np.float64,
        )
        books_np = [init[:, mm * d : (mm + 1) * d].copy() for mm in range(m)]
        for _ in range(train_iters):
            for mm in range(m):
                sub = train[:, mm * d : (mm + 1) * d]
                bm = books_np[mm]
                # ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖²; ‖x‖² is rank-constant
                d2 = (bm * bm).sum(axis=1)[None, :] - 2.0 * (sub @ bm.T)
                assign = d2.argmin(axis=1)
                for j in range(bm.shape[0]):
                    members = sub[assign == j]
                    if len(members):  # empty cluster keeps its codeword
                        bm[j] = members.mean(axis=0)
        books_py = [[[float(x) for x in cw] for cw in bm] for bm in books_np]
        bn2 = [[float((cw * cw).sum()) for cw in bm] for bm in books_np]
        trained = corpus.sparkSession.createDataFrame(
            [(books_py, bn2)],
            "_books array<array<array<double>>>, _bn2 array<array<double>>",
        )
        return trained, d
    row = sample.agg(F.collect_list("_v").alias("_vs"))
    books = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda mm: F.transform(
            F.col("_vs"), lambda v: F.slice(v, mm * d + 1, d)
        ),
    )
    out = row.select(books.alias("_books")).select(
        "_books", _books_norms().alias("_bn2")
    )
    # one tiny row consumed by BOTH the encode and the ADC-table
    # branches: pin it (eager localCheckpoint, the kmeans pattern) so
    # the TakeOrdered sample over the corpus runs once, not per branch
    return out.localCheckpoint(eager=True), d


def _books_norms() -> Column:
    """``_bn2`` from ``_books``: per codeword, Σ|codeword|²."""
    return F.transform(
        "_books",
        lambda bm: F.transform(
            bm,
            lambda c: F.aggregate(
                c,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            ),
        ),
    )


def pq_encode(
    corpus: DataFrame,
    books: DataFrame,
    d: int,
    vec_col: str = "embedding",
    m: int = 8,
) -> DataFrame:
    """ENCODE: per row, per subspace, the L2-nearest codeword index —
    a pure per-row expression against the broadcast codebook row (zero
    shuffle, the assign_nearest shape). Emits ``_pqc`` (array<int>, m
    entries — the 1-byte-per-subspace code) and ``_pqn`` (the
    reconstruction-vector norm √Σ|codeword|², used as the denominator
    in ADC cosine). Ties break to the lowest codeword index (struct
    min over (dist, j)) — deterministic on any engine."""
    enc = corpus.crossJoin(F.broadcast(books))
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda mm: F.array_min(
            F.transform(
                F.element_at(F.col("_books"), mm + 1),
                lambda c, j: F.struct(
                    _sq_l2(F.slice(F.col(vec_col), mm * d + 1, d), c).alias(
                        "dist"
                    ),
                    j.alias("j"),
                ),
            )
        )["j"],
    )
    enc = enc.withColumn("_pqc", codes)
    norm2 = F.aggregate(
        F.zip_with(
            F.col("_pqc"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, mm: F.element_at(
                F.element_at(F.col("_bn2"), mm + 1), c + 1
            ),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return enc.withColumn("_pqn", F.sqrt(norm2)).drop("_books", "_bn2")


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    query_id: str = "qid",
    corpus_id: str = "vec_id",
    query_vec: str = "qvec",
    corpus_vec: str = "embedding",
    centroids: DataFrame | None = None,
    n_assign: int = 1,
    rerank_factor: int = 4,
    m: int = 8,
    n_codes: int = 256,
    train_iters: int = 0,
) -> DataFrame:
    """IVF-PQ: inverted lists hold PRODUCT-QUANTIZED codes — m=8
    one-byte subspace codes per 64-dim vector (8 B vs 256 B float32, a
    32× code compression; 16 B/entry with the stored norm) — scored by
    ASYMMETRIC DISTANCE COMPUTATION: each query precomputes its m×k
    dot-product table against the broadcast codebooks (one tiny
    expression per query row), and a candidate's approximate dot is m
    TABLE LOOKUPS — no vector arithmetic per candidate at all, the
    classic Jégou-style ADC probe. The top ``rerank_factor·k`` per
    query then re-rank against the full-precision store (point
    lookups), which owns the returned scores — so quantization can
    only demote a candidate out of the shortlist, never mis-rank the
    final top-k. Recall is pinned externally (ann_ivf_pq_recall);
    compression story in SCALE.md. :func:`ivf_sq_topk` is the
    4×-compression rung of the same ladder (int8 scalar codes, dot
    still per-candidate); PQ is the rung you buy when even int8 lists
    out-size memory."""
    if centroids is None:
        centroids = (
            corpus.orderBy(F.col(corpus_id).asc())
            .limit(n_centroids)
            .select(
                F.col(corpus_id).alias("centroid"),
                F.col(corpus_vec).alias("cvec"),
            )
        )
    else:
        centroids = centroids.select("centroid", "cvec")
    books, d = pq_codebooks(
        corpus, corpus_vec, corpus_id, m, n_codes, train_iters=train_iters
    )
    # the LISTS: id + m byte-codes + reconstruction norm — no vectors.
    # Encode BEFORE the multi-assignment explode: codes depend only on
    # (vector, codebook), so encoding after would redo the m×k argmin
    # n_assign times per vector — the encode is the build's hot loop.
    enc = pq_encode(corpus, books, d, corpus_vec, m)
    assigned = assign_nearest(
        enc, corpus_vec, centroids, n_assign
    ).select(corpus_id, "centroid", "_pqc", "_pqn")
    # query side: the flattened m×k ADC lookup table, computed BEFORE
    # the nprobe explode for the same reason (the table rides the
    # explode as data, not as a re-evaluated expression)
    adc = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda mm: F.transform(
                F.element_at(F.col("_books"), mm + 1),
                lambda c: _dot(
                    F.slice(F.col(query_vec), mm * d + 1, d), c
                ),
            ),
        )
    )
    qprep = (
        queries.withColumn("_qn", _norm(F.col(query_vec)))
        .crossJoin(F.broadcast(books))
        .withColumn("_pqt", adc)
        .drop("_books", "_bn2")
    )
    probed = assign_nearest(qprep, query_vec, centroids, nprobe)
    cand = probed.join(assigned, "centroid").where(
        F.col(query_id) != F.col(corpus_id)
    )
    # table stride = ACTUAL codewords per subspace (a corpus smaller
    # than n_codes yields a shorter sampled codebook)
    stride = (F.size(F.col("_pqt")) / F.lit(m)).cast("int")
    approx_dot = F.aggregate(
        F.zip_with(
            F.col("_pqc"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, mm: F.element_at(
                F.col("_pqt"), mm * stride + c + 1
            ),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    approx = cand.withColumn(
        "_ascore", approx_dot / (F.col("_qn") * F.col("_pqn"))
    ).dropDuplicates([query_id, corpus_id])
    w = Window.partitionBy(query_id).orderBy(
        F.col("_ascore").desc(), F.col(corpus_id).asc()
    )
    shortlist = (
        approx.withColumn("_arank", F.row_number().over(w))
        .where(F.col("_arank") <= rerank_factor * k)
        .select(query_id, corpus_id, query_vec, "_qn")
    )
    full = corpus.select(
        corpus_id, corpus_vec, _norm(F.col(corpus_vec)).alias("_cn")
    )
    reranked = shortlist.join(full, corpus_id)
    return _score_and_rank(reranked, k, query_id, corpus_id, query_vec, corpus_vec)
