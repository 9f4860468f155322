"""Validation rule engine (SURVEY.md §2.9 V1-V5), vectorized.

Reference semantics: pacong/data/validator.py — NotNullRule (:35-44),
NumericRangeRule (:47-68), RegexRule (:71-82), TimestampRule (:85-113,
max-age hours + not->1h-future), business rules (:231-275), batch split
into (valid, invalid+reasons) (:277-318).

Engine form: each rule is (column, vectorized predicate) → boolean
mask + error string; ``apply_rules`` runs all rules in one pass over a
pandas batch and emits an ``errors`` list column; the valid/invalid
split is two filters on ``n_errors``. Determinism: the reference
compares against wall-clock ``datetime.now()`` — the engine takes
``now`` as an explicit parameter so runs are reproducible.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

import numpy as np
import pandas as pd


@dataclass
class Rule:
    column: str
    name: str
    mask_fn: Callable[[pd.Series], pd.Series]  # True = valid

    def apply(self, batch: pd.DataFrame) -> pd.Series:
        if self.column not in batch.columns:
            return pd.Series(True, index=batch.index)
        return self.mask_fn(batch[self.column]).fillna(False)


def not_null(column: str) -> Rule:
    """V1 NotNullRule: None and "" are invalid (validator.py:35-44)."""
    return Rule(column, f"not_null:{column}", lambda s: s.notna() & (s.astype(str) != ""))


def numeric_range(column: str, min_val: float | None = None, max_val: float | None = None) -> Rule:
    def fn(s: pd.Series) -> pd.Series:
        v = pd.to_numeric(s, errors="coerce")
        ok = v.notna()
        if min_val is not None:
            ok &= v >= min_val
        if max_val is not None:
            ok &= v <= max_val
        return ok

    return Rule(column, f"numeric_range:{column}", fn)


def regex_rule(column: str, pattern: str) -> Rule:
    """V1 RegexRule: ``re.match`` anchoring (validator.py:71-82)."""
    pat = re.compile(pattern)
    return Rule(
        column,
        f"regex:{column}",
        lambda s: s.astype(str).str.match(pat, na=False),
    )


def timestamp_rule(column: str, now: pd.Timestamp, max_age_hours: int = 24) -> Rule:
    """V1 TimestampRule vs an explicit ``now`` (validator.py:85-113):
    age ≤ max_age_hours and not more than 1 h in the future."""

    def fn(s: pd.Series) -> pd.Series:
        ts = pd.to_datetime(s, errors="coerce")
        age_ok = (now - ts) <= pd.Timedelta(hours=max_age_hours)
        future_ok = ts <= now + pd.Timedelta(hours=1)
        return ts.notna() & age_ok & future_ok

    return Rule(column, f"timestamp:{column}", fn)


def timestamp_window(column: str, min_ts: str, max_ts: str) -> Rule:
    """Deterministic variant of TimestampRule for oracle-checked runs:
    fixed [min_ts, max_ts] window instead of wall-clock age."""
    lo, hi = pd.Timestamp(min_ts), pd.Timestamp(max_ts)

    def fn(s: pd.Series) -> pd.Series:
        ts = pd.to_datetime(s, errors="coerce")
        return ts.notna() & (ts >= lo) & (ts <= hi)

    return Rule(column, f"timestamp:{column}", fn)


def commodity_business_rules() -> list[Rule]:
    """V2 (validator.py:231-253) — vectorized. Checks are conditional on
    the participating fields being present (reference short-circuits on
    falsy values)."""

    return [
        FrameRule(
            "price_consistency",
            lambda df: ~(
                df["current_price"].notna()
                & df["value"].notna()
                & ((df["current_price"] - df["value"]).abs() > 0.001)
            ),
        ),
        FrameRule(
            "high_ge_low",
            lambda df: ~(
                df["high_price"].notna()
                & df["low_price"].notna()
                & (df["high_price"] < df["low_price"])
            ),
        ),
        FrameRule(
            "current_in_range",
            lambda df: ~(
                df["current_price"].notna()
                & (
                    (df["high_price"].notna() & (df["current_price"] > df["high_price"]))
                    | (df["low_price"].notna() & (df["current_price"] < df["low_price"]))
                )
            ),
        ),
        FrameRule(
            "change_sane",
            lambda df: ~(df["change_percent"].notna() & (df["change_percent"].abs() > 50)),
        ),
    ]


def forex_business_rules() -> list["FrameRule"]:
    """V3 (validator.py:255-275): bid ≤ ask; spread ≤ 10%·bid;
    |mid − (bid+ask)/2| ≤ 1e-4."""
    return [
        FrameRule(
            "bid_le_ask",
            lambda df: ~(
                df["bid_price"].notna() & df["ask_price"].notna() & (df["bid_price"] > df["ask_price"])
            ),
        ),
        FrameRule(
            "spread_sane",
            lambda df: ~(
                df["bid_price"].notna()
                & df["ask_price"].notna()
                & ((df["ask_price"] - df["bid_price"]) > df["bid_price"] * 0.1)
            ),
        ),
        FrameRule(
            "mid_consistent",
            lambda df: ~(
                df["mid_price"].notna()
                & df["bid_price"].notna()
                & df["ask_price"].notna()
                & ((df["mid_price"] - (df["bid_price"] + df["ask_price"]) / 2).abs() > 1e-4)
            ),
        ),
    ]


@dataclass
class FrameRule:
    """A rule over the whole frame (cross-column business logic)."""

    name: str
    mask_fn: Callable[[pd.DataFrame], pd.Series]

    def apply(self, batch: pd.DataFrame) -> pd.Series:
        return self.mask_fn(batch).fillna(True)


class ApplyRules:
    """map_batches stage: adds ``n_errors:int32`` and ``errors:string``
    (semicolon-joined failing rule names — the reference's reason list,
    validator.py:300-306) to each row. Downstream: ``filter(n_errors ==
    0)`` for the valid stream, ``filter(n_errors > 0)`` for quarantine.
    """

    def __init__(self, rules: list):
        self.rules = rules

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_err = np.zeros(len(batch), dtype=np.int32)
        err: list[list[str]] = [[] for _ in range(len(batch))]
        for rule in self.rules:
            ok = rule.apply(batch).to_numpy(dtype=bool, na_value=False)
            bad = ~ok
            n_err += bad.astype(np.int32)
            for i in np.nonzero(bad)[0]:
                err[i].append(rule.name)
        batch = batch.copy()
        batch["n_errors"] = n_err
        batch["errors"] = [";".join(e) for e in err]
        return batch
