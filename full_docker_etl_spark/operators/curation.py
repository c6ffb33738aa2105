"""Domain/URL-level corpus curation — the C4/CCNet pre-filter stage.

The standard web-corpus pipelines curate at the HOST level before any
content-level stage runs: C4 drops blocklisted domains outright and
CCNet buckets quality per domain, and a per-host quota is the usual
guard against a single crawler-friendly site dominating the mix. The
reference's nearest analogue is its category-from-link transform
(transform_iqplus_news_dags.py:138-141: route metadata derived from the
article URL); this module generalizes that to the curation trio —
normalized-host extraction, host-level accounting, blocklist
filtering, and per-host quota capping.

Everything here is pure built-in expressions (regexp + window), JVM
whole-stage-codegen'd, and expressible identically in ANSI SQL so the
driver's DuckDB oracles mirror it value for value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# scheme '://', optional userinfo '@', then the host: everything up to
# the first ':' (port), '/' (path), '?' or '#'. One capture group.
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"


def normalized_host(url: Column) -> Column:
    """The canonical host of a URL: scheme, userinfo, port, path,
    query and fragment stripped; lowercased; one leading ``www.``
    removed — so ``HTTPS://user@WWW.News.Example.COM:8443/a?b`` and
    ``http://news.example.com/c`` both curate under
    ``news.example.com``. Malformed URLs (no scheme) normalize to ''
    — group them, don't drop them silently; the caller decides.

    Built from one ``regexp_extract`` + one anchored
    ``regexp_replace`` (no UDF, no parser object per row), and the
    same two calls exist verbatim in DuckDB/ANSI SQL for oracle
    parity."""
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    return F.regexp_replace(host, r"^www\.", "")


def host_doc_counts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host document counts ``(host, n_docs)`` — the curation
    census that sizes quotas and surfaces dominating domains. One
    map-side-combined aggregation; output cardinality = #hosts, tiny
    next to the corpus."""
    return df.groupBy(
        normalized_host(F.col(url_col)).alias("host")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


def blocklist_filter(
    df: DataFrame, host_col: str, blocked: DataFrame
) -> DataFrame:
    """Drop every row whose ``host_col`` appears in ``blocked`` (a
    one-column frame of normalized hosts). Blocklists are small —
    10³-10⁶ hosts against a corpus of billions of docs — so the
    anti-join is explicitly BROADCAST: no corpus shuffle, the filter
    rides the scan."""
    bcol = blocked.columns[0]
    return df.join(
        F.broadcast(blocked.select(F.col(bcol).alias(host_col)).distinct()),
        host_col,
        "left_anti",
    )


def host_quota_cap(
    df: DataFrame,
    host_col: str,
    order: list[tuple[str, bool]],
    quota: int,
) -> DataFrame:
    """Keep at most ``quota`` rows per host, deterministically (the
    explicit ``order`` must end in a unique tie-break), annotating each
    survivor with its ``host_rank`` (1-based admission rank) and
    ``n_host_docs`` (the PRE-cap host size, so the caller sees how much
    the cap bit) — the rank-and-filter shape shared with
    ``sampling.quota_per_group``.

    One exchange: both windows hash-partition on the host, so rank and
    census ride the same shuffle. Skew posture: a hot host concentrates
    its rows on one partition for the window, but emits only ``quota``
    rows — if a single host's row count itself outgrows a partition at
    extreme scale, pre-thin with a salted two-phase top-k
    (operators/skew.py) before capping."""
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    w = Window.partitionBy(host_col).orderBy(
        *[F.col(c).asc() if asc else F.col(c).desc() for c, asc in order]
    )
    wc = Window.partitionBy(host_col)
    return (
        df.withColumn("host_rank", F.row_number().over(w).cast("long"))
        .withColumn("n_host_docs", F.count(F.lit(1)).over(wc).cast("long"))
        .where(F.col("host_rank") <= quota)
    )
