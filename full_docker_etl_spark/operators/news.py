"""News/text transform path (SURVEY.md M5; reference
``transform_iqplus_news_dags.py:56-176``): truncation cap, pluggable
summarization, category derivation, word counts, nested metadata.

The reference summarizes with BART per row on the driver's CPU. Here
summarization is a *pluggable* Arrow-batched ``mapInPandas`` stage:
``Summarizer`` is any callable ``list[str] -> list[str]`` with a
per-executor model cache slot; the default :class:`LeadSummarizer` is
a deterministic extractive lead-N stub (the model libraries are not in
this container, and tests need reproducibility — SURVEY.md §7.3.4).
Swapping in a transformer model changes ONE constructor argument, not
the pipeline.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CONTENT_CHAR_CAP = 50_000  # reference's sanity cap (:110-113)

Summarizer = Callable[[list[str]], list[str]]


class LeadSummarizer:
    """Deterministic extractive stub: first ``n_words`` words + ' ...'.
    Stands in for the reference's BART pipeline; per-executor
    instantiation mirrors the reference's cached singleton model."""

    def __init__(self, n_words: int = 20):
        self.n_words = n_words

    def __call__(self, texts: list[str]) -> list[str]:
        out = []
        for t in texts:
            words = t.split()
            head = " ".join(words[: self.n_words])
            out.append(head + " ..." if len(words) > self.n_words else head)
        return out


class BartSummarizer:
    """The reference's transformer pipeline as a drop-in Summarizer
    (``transform_iqplus_news_dags.py:33-54,115-135``): BART
    (facebook/bart-large-cnn — a public Hugging Face model id),
    token-precise truncation to the model's 1024 limit, then
    deterministic (do_sample=False) summarization at max_length=150 /
    min_length=50. Import-guarded: the model libraries are not in this
    container, so construction raises ImportError with a clear message
    — the engine, tests, and oracles all run on the deterministic
    :class:`LeadSummarizer` default, and a deployment with
    ``transformers`` installed swaps this in via the one
    ``summarizer_factory`` argument. Instantiate per Python worker
    (the factory contract): the model loads once per executor, exactly
    like the reference's cached singleton."""

    def __init__(
        self,
        model_name: str = "facebook/bart-large-cnn",
        max_input_tokens: int = 1024,
        max_length: int = 150,
        min_length: int = 50,
    ):
        try:
            from transformers import AutoTokenizer, pipeline
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise ImportError(
                "BartSummarizer needs the 'transformers' package (plus a "
                "torch backend), which this environment does not ship; "
                "use the default LeadSummarizer or install transformers"
            ) from exc
        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.pipe = pipeline(
            "summarization", model=model_name, tokenizer=self.tokenizer,
            device=-1,
        )
        self.max_input_tokens = max_input_tokens
        self.max_length = max_length
        self.min_length = min_length

    def __call__(self, texts: list[str]) -> list[str]:  # pragma: no cover
        # token-precise re-truncation (reference "layer 2"): encode with
        # truncation so the model never sees more than its window
        safe = [
            self.tokenizer.decode(
                self.tokenizer.encode(
                    t, truncation=True, max_length=self.max_input_tokens
                ),
                skip_special_tokens=True,
            )
            for t in texts
        ]
        results = self.pipe(
            safe,
            max_length=self.max_length,
            min_length=self.min_length,
            do_sample=False,
        )
        return [r["summary_text"] for r in results]


SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("summary", T.StringType()),
    ]
)


def summarize(
    df: DataFrame,
    text_col: str,
    id_col: str,
    summarizer_factory: Callable[[], Summarizer] = LeadSummarizer,
) -> DataFrame:
    """D4: batched summarization. The factory runs once per Python
    worker (model load amortized over all its batches); batches cross
    the Python boundary via Arrow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = summarizer_factory()
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "summary": model(list(pdf[text_col])),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, SUMMARY_SCHEMA)


def derive_category(link: F.Column) -> F.Column:
    """F12: category from the article link's path segment
    (``transform_iqplus_news_dags.py:138-141``)."""
    return (
        F.when(link.contains("market_news"), F.lit("Market News"))
        .when(link.contains("stock_news"), F.lit("Stock News"))
        .otherwise(F.lit("General"))
    )


def transform_news(
    df: DataFrame,
    text_col: str,
    id_col: str,
    link_col: str,
    summarizer_factory: Callable[[], Summarizer] = LeadSummarizer,
) -> DataFrame:
    """The full M5 transform: cap → summarize → category → word counts.
    Returns flat columns (the reference's nested ``metadata``
    sub-document is a reshape away — P15)."""
    capped = df.withColumn(
        text_col, F.substring(F.col(text_col), 1, CONTENT_CHAR_CAP)
    )
    summaries = summarize(capped, text_col, id_col, summarizer_factory)
    out = capped.join(summaries, on=id_col)
    return out.select(
        F.col(id_col),
        F.col(text_col).alias("original_content"),
        "summary",
        derive_category(F.col(link_col)).alias("category"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("content_words"),
        F.size(F.split(F.trim(F.col("summary")), r"\s+")).alias("summary_words"),
    )
