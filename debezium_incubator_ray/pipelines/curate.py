"""Document-curation pipeline: the composed training-data pass.

The standard pre-training curation recipe, expressed as ONE streaming
Ray Data pipeline over the documents table:

    read → exact dedup (content-hash, min-id winner)
         → quality gates (token floor, mean-token-length / punctuation
           ceilings, language allowlist)
         → deterministic stratified sampling (per-language rates)

Scale shape: the only shuffle in the whole pass is exact_dedup's 24-byte
(h1, h2, id) exchange (functions/dedup.py); every other stage is a
stateless vectorized map_batches, so the pipeline streams end-to-end with
backpressure and its cost is one text scan + one narrow shuffle. Order of
stages is deliberate: dedup before quality (a duplicate passing quality
gates is still a duplicate), sampling last (rates apply to the cleaned
distribution).

Every stage is individually DuckDB-oracle-checked (dedup_exact,
docs_quality_filter, sample_stratified); the composition has its own
end-to-end oracle (docs_curation_pipeline) so stage-ordering bugs can't
hide behind per-stage correctness.
"""

from __future__ import annotations

from typing import Dict, Optional

from debezium_incubator_ray.functions.dedup import exact_dedup
from debezium_incubator_ray.functions.sample import (
    quality_filter,
    stratified_sample,
)


def curate(
    docs_ds,
    rates: Dict[str, float],
    default_rate: float = 0.0,
    min_tokens: int = 0,
    max_mean_token_len: Optional[float] = None,
    max_punct_ratio: Optional[float] = None,
    langs: Optional[tuple] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str = "lang",
    dedup_buckets: int = 64,
):
    """documents Dataset → curated Dataset (winner rows + quality metric
    columns), one streaming pass. See module docstring for the shape."""
    ds = exact_dedup(
        docs_ds, col=text_col, id_col=id_col, buckets=dedup_buckets,
        unique_ids=True,
    )
    ds = quality_filter(
        ds,
        min_tokens=min_tokens,
        max_mean_token_len=max_mean_token_len,
        max_punct_ratio=max_punct_ratio,
        langs=langs,
        text_col=text_col,
    )
    return stratified_sample(
        ds, rates, strata_col=strata_col, id_col=id_col,
        default_rate=default_rate,
    )
