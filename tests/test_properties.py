"""Property-based tests (hypothesis) for pure scheme-level invariants
— no SparkSession needed, so hundreds of cases run in milliseconds:

- LSH band sizing must satisfy its own recall formula and key-width
  floor for ANY threshold/corpus size.
- Excel column-letter encoding must round-trip.
- The Manku block-combination scheme's pigeonhole guarantee must hold
  for arbitrary signatures and Hamming budgets (simulated bit-exactly
  in Python with the same widths/starts arithmetic as the Spark
  expressions in operators/dedup.py).
"""

from __future__ import annotations

import math
from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    threshold=st.floats(min_value=0.0, max_value=0.9999),
    size=st.integers(min_value=1, max_value=10**12),
)
def test_lsh_band_params_invariants(threshold, size):
    from full_docker_etl_spark.operators.similarity import lsh_band_params

    rows, bands = lsh_band_params(threshold, size, target_recall=0.95)
    assert rows >= max(8, math.ceil(math.log2(max(size, 2))))
    assert 1 <= bands <= 64
    p_band = (1 - math.acos(threshold) / math.pi) ** rows
    recall = 1 - (1 - p_band) ** bands
    # either the target is met, or the scheme honestly maxed out
    assert recall >= 0.95 or bands == 64


@settings(max_examples=200, deadline=None)
@given(i=st.integers(min_value=0, max_value=10_000))
def test_xlsx_column_letters_roundtrip(i):
    from full_docker_etl_spark.queries.sources_q import _xlsx_col_letters
    from full_docker_etl_spark.sources.files import _col_index

    letters = _xlsx_col_letters(i)
    assert letters.isalpha() and letters.isupper()
    assert _col_index(f"{letters}17") == i


def _block_keys(sig: int, d: int, b: int) -> set:
    """Python mirror of dedup._simhash_blocked_candidates' keying:
    b near-equal blocks of the 64-bit signature, one key per
    (b-d)-block combination."""
    widths = [64 // b + (1 if i < 64 % b else 0) for i in range(b)]
    starts = [sum(widths[:i]) for i in range(b)]
    blocks = [
        (sig >> starts[i]) & ((1 << widths[i]) - 1) for i in range(b)
    ]
    return {
        (ci, tuple(blocks[i] for i in combo))
        for ci, combo in enumerate(combinations(range(b), b - d))
    }


@settings(max_examples=200, deadline=None)
@given(
    sig=st.integers(min_value=0, max_value=(1 << 64) - 1),
    flips=st.lists(st.integers(min_value=0, max_value=63), max_size=6, unique=True),
    d=st.integers(min_value=0, max_value=6),
    extra=st.integers(min_value=0, max_value=4),
)
def test_manku_blocking_pigeonhole_recall(sig, flips, d, extra):
    """A pair within Hamming distance d MUST share at least one
    (b-d)-block combination key for every legal block count
    b in [d+1, d+1+extra] — zero false negatives, any geometry."""
    other = sig
    for bit in flips:
        other ^= 1 << bit
    hamming = bin(sig ^ other).count("1")
    b = d + 1 + extra
    if hamming <= d:
        assert _block_keys(sig, d, b) & _block_keys(other, d, b)


@given(n=st.integers(min_value=2, max_value=10**12), d=st.integers(min_value=1, max_value=8))
@settings(max_examples=200, deadline=None)
def test_simhash_blocks_for_corpus_invariants(n, d):
    """The auto-dial must always return a pigeonhole-valid block count
    within the table cap, with key width covering the corpus whenever
    the cap allows it."""
    import math

    from full_docker_etl_spark.operators.dedup import simhash_blocks_for_corpus

    b = simhash_blocks_for_corpus(n, d)
    assert d + 1 <= b <= 64
    assert math.comb(b, b - d) <= 512
    width = 64 * (b - d) / b
    # either the width covers log2(n)+8, or the very next b would
    # break the table cap (width is monotone in b)
    if width < math.log2(max(n, 2)) + 8:
        assert math.comb(b + 1, b + 1 - d) > 512


@given(
    counts=st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=30),
    alpha=st.floats(min_value=0.05, max_value=1.0, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_temperature_rates_invariants(counts, alpha):
    """The mixing math (shared by temperature_mix / _upsample): down-
    sampling rates (n/min)^(α-1) are in (0, 1] with the smallest group
    at exactly 1; upsampling rates (n/max)^(α-1) are ≥ 1 with the
    largest at exactly 1; expected kept counts n·rate are ∝ n^α —
    i.e. the kept-ratio of any two groups is (n_i/n_j)^α; and rates
    are monotone in n (bigger groups thinned harder)."""
    mn, mx = min(counts), max(counts)
    down = [(n / mn) ** (alpha - 1.0) for n in counts]
    up = [(n / mx) ** (alpha - 1.0) for n in counts]
    assert all(0.0 < r <= 1.0 + 1e-12 for r in down)
    assert abs(down[counts.index(mn)] - 1.0) < 1e-12
    assert all(r >= 1.0 - 1e-12 for r in up)
    assert abs(up[counts.index(mx)] - 1.0) < 1e-12
    for i in range(len(counts)):
        for j in range(len(counts)):
            if counts[j] == 0:
                continue
            want = (counts[i] / counts[j]) ** alpha
            got = (counts[i] * down[i]) / (counts[j] * down[j])
            assert abs(got - want) <= 1e-6 * max(1.0, want)
    ordered = sorted(zip(counts, down))
    assert all(a[1] >= b[1] - 1e-12 for a, b in zip(ordered, ordered[1:]))


class _SchemaStub:
    """Duck-typed stand-in for the only DataFrame surface
    _plan_type_reconciliation touches (.dtypes)."""

    def __init__(self, dtypes):
        self.dtypes = dtypes


_TYPE_POOL = [
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "string", "date", "decimal(18,2)",
]


def test_widening_relation_is_a_strict_partial_order():
    """No cycles (a widening must never be reversible — that would let
    two retrying writers flip a column's type forever) and closed
    under composition (a retry that widened byte→short must be able to
    continue short→int without a dead end)."""
    from full_docker_etl_spark.sources.sinks import _WIDENINGS

    for a, b in _WIDENINGS:
        assert (b, a) not in _WIDENINGS, f"cycle: {a}<->{b}"
        assert a != b
    for a, b in _WIDENINGS:
        for c, d in _WIDENINGS:
            if b == c:
                assert (a, d) in _WIDENINGS, f"not transitive: {a}->{b}->{d}"


@settings(max_examples=300, deadline=None)
@given(
    te=st.sampled_from(_TYPE_POOL),
    tu=st.sampled_from(_TYPE_POOL),
    exempt=st.booleans(),
)
def test_type_reconciliation_trichotomy(te, tu, exempt):
    """For ANY pair of (table type, batch type) on a shared column the
    plan is exactly one of: no-op (equal or exempt), batch up-cast
    (batch strictly narrower), table widen (batch strictly wider), or
    a loud ValueError — never a silent pass-through of a non-lossless
    mismatch, and never both casts at once."""
    import pytest

    from full_docker_etl_spark.sources.sinks import (
        _WIDENINGS,
        _plan_type_reconciliation,
    )

    ex = _SchemaStub([("k", "int"), ("c", te)])
    up = _SchemaStub([("k", "int"), ("c", tu)])
    exempt_set = frozenset({"c"}) if exempt else frozenset()
    if exempt or te == tu:
        cu, ce = _plan_type_reconciliation(ex, up, exempt_set)
        assert cu == {} and ce == {}
    elif (tu, te) in _WIDENINGS:
        cu, ce = _plan_type_reconciliation(ex, up, exempt_set)
        assert cu == {"c": te} and ce == {}
    elif (te, tu) in _WIDENINGS:
        cu, ce = _plan_type_reconciliation(ex, up, exempt_set)
        assert cu == {} and ce == {"c": tu}
    else:
        with pytest.raises(ValueError, match="incompatible"):
            _plan_type_reconciliation(ex, up, exempt_set)


@settings(max_examples=300, deadline=None)
@given(
    n_queries=st.integers(min_value=1, max_value=200),
    n_pinned=st.integers(min_value=0, max_value=20),
    seed=st.integers(min_value=0, max_value=10**6),
)
def test_next_window_policy_invariants(n_queries, n_pinned, seed):
    """The rotation tool's window composition, for ANY registry shape:
    the output is a permutation of the registered set; every pinned
    verdict row and every zero-evidence query lands INSIDE the window
    (when they fit); the window's non-pinned lead is the stalest
    available; and rows-only sketches never displace an equally-stale
    oracle-checked query."""
    import random

    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from next_window import WINDOW, proposed_order

    rng = random.Random(seed)
    registered = [f"q{i:03d}" for i in range(n_queries)]
    pinned = [f"p{i:02d}_recall" for i in range(n_pinned)]
    registered += pinned
    rng.shuffle(registered)
    latest = {
        n: rng.randint(1, 9)
        for n in registered
        if rng.random() < 0.9  # ~10% zero-evidence
    }
    rows_only = {n for n in registered if rng.random() < 0.15}
    order = proposed_order(registered, latest, rows_only)
    assert sorted(order) == sorted(registered)

    window = set(order[:WINDOW])
    zero = [n for n in registered
            if n not in latest and not n.endswith("_recall")]
    if len(pinned) + len(zero) <= WINDOW:
        assert set(pinned) <= window
        assert set(zero) <= window
    # stalest-first on the lead: no query OUTSIDE the window may be
    # strictly staler than a non-pinned, non-zero lead entry — unless
    # the outside one is a rows-only sketch at the same staleness
    lead = [n for n in order[:WINDOW]
            if n in latest and not n.endswith("_recall")]
    outside = [n for n in order[WINDOW:] if n in latest]
    if lead and outside:
        worst_in = max(latest[n] for n in lead)
        for n in outside:
            assert latest[n] >= worst_in, (n, latest[n], worst_in)


def test_sample_order_is_a_permutation_of_the_registry():
    """_SAMPLE_ORDER must list every registered query exactly once:
    a duplicate would silently shrink the external-evidence window
    (the driver samples a prefix), and an omission would pin a query
    to unrotated registration order forever. next_window.py --check
    validates the WINDOW against policy; this pins the full list."""
    from full_docker_etl_spark import registry
    from full_docker_etl_spark.registry import all_specs

    specs = all_specs()
    order = registry._SAMPLE_ORDER
    assert len(order) == len(set(order)), "duplicate names in _SAMPLE_ORDER"
    assert set(order) == set(specs), (
        f"missing from order: {sorted(set(specs) - set(order))}; "
        f"stale in order: {sorted(set(order) - set(specs))}"
    )


def test_coverage_md_totals_match_registry():
    """COVERAGE.md's headline registry totals must equal the live
    registry (VERDICT r10 #4: the header drifted to 155/145 while the
    registry held 159/149) — parse the bolded totals line and compare
    against all_specs(), so the doc can't silently drift again."""
    import os
    import re

    from full_docker_etl_spark.registry import all_specs

    specs = all_specs()
    n_reg = len(specs)
    n_oracle = sum(1 for s in specs.values() if s.oracle)
    doc = " ".join(
        open(
            os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
        ).read().split()
    )
    m = re.search(
        r"(\d+) registered queries \D+(\d+) oracle-checked, (\d+) rows-only",
        doc,
    )
    assert m, "COVERAGE.md registry-totals line not found"
    assert (int(m.group(1)), int(m.group(2)), int(m.group(3))) == (
        n_reg,
        n_oracle,
        n_reg - n_oracle,
    ), f"COVERAGE.md says {m.groups()}, registry has {n_reg}/{n_oracle}"


@settings(max_examples=300, deadline=None)
@given(
    threshold=st.floats(min_value=0.05, max_value=1.0),
    k=st.integers(min_value=8, max_value=128),
    target=st.floats(min_value=0.5, max_value=0.99),
    floor_frac=st.floats(min_value=0.1, max_value=1.0),
    max_gap=st.one_of(st.none(), st.integers(min_value=0, max_value=12)),
)
def test_ensemble_gap_specs_invariants(
    threshold, k, target, floor_frac, max_gap
):
    """The containment-ensemble band tuning must satisfy its own
    guarantees for ANY parameters, not just the pinned defaults:
    consecutive gaps from 0; every derived scheme fits the signature
    (b <= k//r) and meets the target at its gap's worst-case J; every
    best-effort tail scheme uses all k bands at r=1 and (when the
    floor governs, max_gap=None) still clears the floor; the first
    uncovered gap is genuinely past the floor; and an explicit
    max_gap yields exactly gaps 0..max_gap whose floor-covered prefix
    matches the default tuning (the cutoff moves, the tuning of
    covered gaps never does)."""
    from full_docker_etl_spark.operators.dedup import _ensemble_gap_specs

    floor = max(1e-6, min(target, floor_frac * target))
    specs = _ensemble_gap_specs(threshold, k, target, floor, max_gap)

    def j_min(gap):
        return threshold / (1.0 + 2.0 ** (gap + 1) - threshold)

    def detect(gap, r, b):
        return 1.0 - (1.0 - min(1.0, j_min(gap) ** r)) ** b

    assert [g for g, _, _ in specs] == list(range(len(specs)))
    for gap, r, b in specs:
        assert r in (8, 4, 2, 1) and 1 <= b <= k // r
        if (r, b) != (1, k):
            # derived scheme: meets the target by construction
            assert detect(gap, r, b) >= target - 1e-9, (gap, r, b)
        elif max_gap is None:
            # floor-governed best-effort tail (could also be a derived
            # r=1 scheme that needed exactly k bands — then it meets
            # the target, which implies the floor)
            assert detect(gap, r, b) >= floor - 1e-9, (gap, r, b)

    if max_gap is None:
        # terminated by the floor: the NEXT gap is genuinely past it
        # even with every band at r=1
        assert detect(len(specs), 1, k) < floor
        assert len(specs) >= 1 or detect(0, 1, k) < floor
    else:
        assert len(specs) == max_gap + 1
        default = _ensemble_gap_specs(threshold, k, target, floor, None)
        n = min(len(specs), len(default))
        assert specs[:n] == default[:n]
        # extension past the floor bound is all-k r=1 best-effort
        for gap, r, b in specs[len(default):]:
            assert (r, b) == (1, k)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        max_size=30,
    ),
    mask=st.lists(st.booleans(), min_size=30, max_size=30),
    scores=st.lists(st.integers(0, 5), min_size=16, max_size=16),
)
@settings(max_examples=300, deadline=None)
def test_verified_subset_pairs_never_false_drop(edges, mask, scores):
    """The graph-theoretic claim dedup_arrival_probe's no-false-drop
    verdict rests on (jaccard_verify_pairs output ⊆ exact pairs ⇒
    probe-side resolution drops ⊆ exact-side drops): dropping edges
    from a pair graph only REFINES its components, and each
    fragment's winner under any fixed total order is beaten by its
    containing exact-component's winner — so every fragment non-winner
    is an exact non-winner too. Checked over random graphs, random
    edge subsets and random (tie-heavy) score functions with the same
    id tie-break the operator uses."""
    nodes = range(16)

    def components(es):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in es:
            if a != b:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
        groups: dict[int, set] = {}
        for n in nodes:
            groups.setdefault(find(n), set()).add(n)
        return groups.values()

    def drops(es):
        out = set()
        for comp in components(es):
            # first under (score desc, id asc) — the operator's order
            winner = min(comp, key=lambda n: (-scores[n], n))
            out |= comp - {winner}
        return out

    exact = [e for e in edges]
    subset = [e for e, keep in zip(exact, mask) if keep]
    assert drops(subset) <= drops(exact)
