"""The reference's flagship batch pipeline, Ray-Data-native
(SURVEY.md §3.1 steps 5-8: process → validate → dedup → summarize).

Reference flow: pacong/services/commodity_service.py:266-301 →
processor.process_raw_data → validator.validate_data_list →
processor.merge_duplicate_data → generate_market_summary. There it is a
single-threaded list[dict] loop; here each step is a vectorized
map_batches / groupby stage over Arrow batches.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.cleaning import (
    categorize_batch,
    clean_percentage_batch,
    clean_price_batch,
    standardize_commodity_name,
)
from ..stages.aggregate import category_stats, market_summary, top_k
from ..stages.dedup import dedup_latest_wins
from ..stages.validate import ApplyRules, not_null, numeric_range, timestamp_rule


def clean_records(batch: pd.DataFrame) -> pd.DataFrame:
    """F1-F5 over a raw-records batch (processor.py:216-333 semantics):
    parse price/change strings, standardize + categorize names."""
    out = batch.copy()
    out["price_value"] = clean_price_batch(batch["price"])
    out["change_percent"] = clean_percentage_batch(batch["change"])
    out["name_std"] = batch["name"].map(standardize_commodity_name)
    out["category"] = categorize_batch(out["name_std"], batch["symbol"])
    return out


def default_rules(now: pd.Timestamp, max_age_hours: int = 48):
    """V1 rule set for commodity records (validator.py:123-145 shape)."""
    return [
        not_null("name_std"),
        numeric_range("price_value", min_val=0.0, max_val=1e6),
        timestamp_rule("timestamp", now=now, max_age_hours=max_age_hours),
    ]


def run_clean_pipeline(raw_ds, now: pd.Timestamp, n_rows_hint: int | None = None):
    """raw records Dataset → (valid deduped Dataset). The invalid stream
    is a second filter on the same validated Dataset (lineage kept as
    the errors column, not an exception path)."""
    cleaned = raw_ds.map_batches(clean_records, batch_format="pandas")
    validated = cleaned.map_batches(ApplyRules(default_rules(now)), batch_format="pandas")
    valid = validated.filter(expr="n_errors == 0")
    deduped = dedup_latest_wins(
        valid, keys=["name_std", "symbol"], ts_col="timestamp", tie_col="price_value",
        source_col="source", n_rows_hint=n_rows_hint,
    )
    return deduped


def summarize(deduped):
    """A1 global summary + A2 category stats + O2 top-5 movers."""
    summary = market_summary(deduped, "change_percent")
    per_cat = category_stats(deduped, "category", "change_percent")
    # Ray's filter-expr parser has no "is not null"; use a pandas mask
    non_null = deduped.map_batches(
        lambda b: b.dropna(subset=["change_percent"]), batch_format="pandas"
    )
    gainers = top_k(non_null, "change_percent", k=5, descending=True, tie_col="name_std")
    return summary, per_cat, gainers
