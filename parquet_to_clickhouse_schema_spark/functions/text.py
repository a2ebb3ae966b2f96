"""Facade for the text-analysis operator family, split in r18 into two
modules (VERDICT r17 task #5 — functions/text.py had grown to 3,489
lines):

- text_core   — language ID, quality/repetition filters, token counts,
                fingerprints, PII, DP releases, TF-IDF/BM25, unigram NLL,
                perplexity buckets, DSIR, PMI, corpus histograms, BPE pair
                mining + trainer + verified twin, Zipf/OOV/frequency,
                language confusion, filter sweep
- text_models — hashed bigram LM, gated BPE encoder + fertility, Naive
                Bayes + confidence bins + feature MI, vocab overlap,
                burstiness, n-gram novelty, AUC marker, CDC chunking,
                MinHash union, quantile normalization, boilerplate
                n-grams, negative sampling, cross-source dups, vocab
                coverage, source-mix KL/JSD

A mechanical move with zero behavior change: statements kept verbatim in
their original order within each module. This facade re-exports every name
so existing imports (`from ...functions.text import X`) keep working; the
registry merges the two split modules directly, so nothing here
double-registers.
"""

from __future__ import annotations

from parquet_to_clickhouse_schema_spark.functions import text_core, text_models
from parquet_to_clickhouse_schema_spark.functions.text_core import *  # noqa: F401,F403
from parquet_to_clickhouse_schema_spark.functions.text_models import *  # noqa: F401,F403

# Underscore-prefixed names star-import skips but tests import:
from parquet_to_clickhouse_schema_spark.functions.text_core import (  # noqa: F401
    _DP_2P60,
    _LANG_MARKERS,
)

# Merged registries for callers that introspect text.QUERIES/ORACLES.
# registry._MODULES lists the two split modules, NOT this facade — these
# dicts are a read-only view, never registered.
QUERIES = {**text_core.QUERIES, **text_models.QUERIES}
ORACLES = {**text_core.ORACLES, **text_models.ORACLES}
