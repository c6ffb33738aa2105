"""Join operators (SURVEY.md §2.3 J1-J4).

The reference has NO explicit joins — it smuggles master-data in as
literals while looping over per-company collections
(``TransForm_Load_Yfinance.py:223-224,395-410``), probes existence row
by row (``extract_iqplus_news_dag.py:144``), and hands off id-lists in
pickle files (``TransForm_Load_Yfinance.py:432-434``). Each of those
becomes a real distributed join here:

- J1 → :func:`broadcast_enrich`: broadcast hash join of small master
  dims onto the fact table. At 100 TB the fact side never shuffles —
  the dim ships to every executor instead.
- J2 → :func:`anti_probe`: left-anti join (insert-if-absent dedup
  probe) — one pass, no per-row find_one.
- J3 → :func:`semi_manifest`: left-semi join against a manifest of
  processed keys.
- J4 → plain equi-join; Catalyst/AQE picks broadcast vs sort-merge and
  splits skewed partitions (skew-join handling is on in session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_enrich(
    fact: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """J1: enrich a fact table with a small dimension via an explicit
    broadcast hint. Replaces the reference's per-entity literal smuggle:
    the dim rides to executors, the fact table stays put (no shuffle)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def anti_probe(new: DataFrame, existing: DataFrame, on) -> DataFrame:
    """J2: rows of ``new`` whose key is NOT in ``existing`` — the
    insert-if-absent probe (``find_one`` per row in the reference) as a
    single left-anti join."""
    return new.join(existing, on=on, how="left_anti")


def semi_manifest(df: DataFrame, manifest: DataFrame, on) -> DataFrame:
    """J3: keep rows whose key appears in the manifest (the reference's
    pickle-file id-list handoff) as a left-semi join — the manifest is
    typically tiny, so hint broadcast."""
    return df.join(F.broadcast(manifest), on=on, how="left_semi")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int,
    out: str = "edit_dist",
    block: str = "first_token",
    max_token_df: int = 1000,
) -> DataFrame:
    """RECORD-LINKAGE join: pairs whose edit distance is ≤ ``max_dist``,
    without the all-pairs cartesian that a naive fuzzy match plans.
    Two-layer candidate generation, standard blocking design:

    - BLOCKING KEY (lossy, part of the operator's contract), two modes:
      ``block="first_token"`` — the first whitespace token must match
      exactly; cheapest candidate volume, misses pairs whose edit sits
      in the first token (measured recall 0.14 on the multi-word
      part-name vocabulary, where edits usually hit a whole word).
      ``block="any_token"`` — OR-blocking on EVERY token (exploded
      equi-join; a pair is a candidate if the two names share ANY
      token): measured recall 1.0 on the same vocabulary at ~4.5×
      fewer candidates than all-pairs — edit-distance-close multi-word
      names almost always share a full word. Tokens appearing in more
      than ``max_token_df`` names per side are dropped from the
      candidate generator (the posting-list cap, same as the Jaccard
      tier's max_df) so a stopword-like token can never explode the
      fan-out at 100 TB; pairs sharing ONLY capped tokens are the
      mode's documented recall trade. Both modes' measured recall is
      pinned externally by the join_fuzzy_recall verdict.
      PRECONDITION (any_token): input rows must be DISTINCT — the
      explode fan-out is collapsed with a dropDuplicates over all
      columns, so two byte-identical input rows return ONE pair row
      where first_token mode returns two; dedup (exact_dedup or
      .distinct()) before linking if your rows are not unique.
    - LENGTH BAND (lossless prune): ``levenshtein(a,b) ≥ |len(a) −
      len(b)|``, so pairs outside the band CANNOT match — an
      equi-join-side filter that costs nothing and kills most of each
      block before the quadratic distance evaluate.

    The plan is an equi-join on the block key (hash-partitioned, no
    cartesian) with the band + distance as post-join filters; at 100 TB
    the cost is Σ|block|² over blocks, which the blocking key keeps
    bounded — the same shape as the dedup tiers' banded candidates.
    Spark evaluates levenshtein JVM-side (no UDF).

    The output carries BOTH inputs' columns side by side, so the two
    column sets must be DISJOINT (rename one side before calling — the
    usual record-linkage convention; a silent ambiguous-column output
    would fail only at first downstream reference). Raises ValueError
    up front on any overlap, including with the operator's own
    internal working columns."""
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            "fuzzy_join emits both inputs' columns side by side; these "
            f"names appear on BOTH sides: {sorted(overlap)}. Rename one "
            "side (e.g. .withColumnRenamed) before joining."
        )
    internal = ["__fzj_l", "__fzj_r", "__fzj_lb", "__fzj_rb"]
    clash = set(internal) & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"fuzzy_join reserves internal columns {internal}; rename "
            f"the colliding input columns: {sorted(clash)}"
        )
    if block not in ("first_token", "any_token"):
        raise ValueError(
            f"block must be 'first_token' or 'any_token', got {block!r}"
        )
    lf = left.select(*left.columns, F.col(left_col).alias("__fzj_l"))
    rf = right.select(*right.columns, F.col(right_col).alias("__fzj_r"))
    if block == "first_token":
        lb = F.split(F.col("__fzj_l"), r"\s+").getItem(0)
        rb = F.split(F.col("__fzj_r"), r"\s+").getItem(0)
        pairs = lf.withColumn("__fzj_lb", lb).join(
            rf.withColumn("__fzj_rb", rb),
            F.col("__fzj_lb") == F.col("__fzj_rb"),
        )
    else:
        lt = _capped_tokens(lf, "__fzj_l", "__fzj_lb", max_token_df)
        rt = _capped_tokens(rf, "__fzj_r", "__fzj_rb", max_token_df)
        # a pair sharing k tokens joins k times; the cheap lossless
        # length-band predicate runs BEFORE the collapse so the
        # dropDuplicates shuffle carries only surviving candidates
        # (the band is deterministic per pair, so filtering before or
        # after deduplication selects the same pair set); then collapse
        # to one row per candidate (inputs are distinct-row by contract)
        pairs = (
            lt.join(rt, F.col("__fzj_lb") == F.col("__fzj_rb"))
            .where(
                F.abs(F.length("__fzj_l") - F.length("__fzj_r")) <= max_dist
            )
            .dropDuplicates(list(left.columns) + list(right.columns))
        )
    return (
        pairs.where(
            F.abs(F.length("__fzj_l") - F.length("__fzj_r")) <= max_dist
        )
        .withColumn(out, F.levenshtein(F.col("__fzj_l"), F.col("__fzj_r")))
        .where(F.col(out) <= max_dist)
        .drop(*internal)
    )


def _capped_tokens(df: DataFrame, src: str, out: str, max_df: int) -> DataFrame:
    """Explode ``src`` into one row per (row, token) with tokens whose
    per-side document frequency exceeds ``max_df`` removed — the
    posting-list cap that keeps any_token blocking's equi-join fan-out
    bounded by max_df·|tokens| instead of the square of a hot token's
    posting list."""
    tok = df.withColumn(
        out, F.explode(F.split(F.trim(F.col(src)), r"\s+"))
    )
    freq = (
        tok.select(out, src)
        .distinct()
        .groupBy(out)
        .agg(F.count(F.lit(1)).alias("__fzj_df"))
        .where(F.col("__fzj_df") <= max_df)
        .drop("__fzj_df")
    )
    # no broadcast hint: the surviving-token list is vocabulary-sized
    # (can be huge at corpus scale); the equi-join shuffles by token,
    # the same partitioning the candidate join needs anyway, and AQE
    # may still elect broadcast when the vocab is actually small
    return tok.join(freq, out)
