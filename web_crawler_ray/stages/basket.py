"""Market-basket co-occurrence: item pairs that appear in the same
group (order/session/page) with support and lift — the association-
rules / co-purchase primitive, which is also the bipartite projection
of the (group, item) graph onto items.

Scale shape: the quadratic step is per-GROUP (a basket has a handful
of items; ``max_group_items`` raises on degenerate baskets instead of
silently going g²), pair partials combine through one (item_a, item_b)
exchange, the support filter runs DISTRIBUTED on the combined counts
(the driver only ever sees survivors + the catalog-sized item counts),
and the lift denominators are item-cardinality-bounded. Public
knowledge: Agrawal & Srikant 1994 (support/lift), standard one-mode
projection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.rounding import sql_round
from .grouped import grouped_triu, partitioned_apply


def cooccurrence_pairs(ds, group_col: str, item_col: str,
                       min_support: int = 2, max_group_items: int = 10_000,
                       num_partitions: int = 32,
                       ndigits: int = 6) -> pd.DataFrame:
    """All item pairs co-occurring in ≥ ``min_support`` groups, with

        lift = n_ab · N / (n_a · n_b)

    where n_a is the number of groups containing item a and N the
    total group count (lift > 1 ⇒ the pair co-occurs more than
    independence predicts). Duplicate (group, item) rows collapse
    before counting, so multiplicities inside one group never inflate
    support.

    One group-keyed exchange (each group's rows co-locate, so the
    in-partition dedup, the per-item counts, the group count AND the
    size-class ``grouped_triu`` pair enumeration are all exact there),
    then one (item_a, item_b) combine of the tagged partials. Returns
    (item_a, item_b, n_groups:int64, lift:float64-rounded)."""

    def distinct_gi(b: pd.DataFrame) -> pd.DataFrame:
        return b[[group_col, item_col]].drop_duplicates()

    gi = ds.select_columns([group_col, item_col]).map_batches(
        distinct_gi, batch_format="pandas")

    def pairs(part: pd.DataFrame) -> pd.DataFrame:
        # all rows of a group are here: batch-level dup survivors die now
        part = part.drop_duplicates([group_col, item_col])
        part = part.sort_values([group_col, item_col], kind="mergesort")
        ia, ib = grouped_triu(part[group_col].to_numpy(np.int64),
                              max_size=max_group_items,
                              raise_on_exceed=True)
        items = part[item_col].to_numpy(np.int64)
        pp = (pd.DataFrame({"item_a": items[ia], "item_b": items[ib]})
              .groupby(["item_a", "item_b"], sort=False)
              .size().rename("n").reset_index())
        pp["_kind"] = 0
        cnt = (part.groupby(item_col, sort=False).size()
               .rename("n").reset_index())
        return pd.concat([
            pp,
            pd.DataFrame({"item_a": cnt[item_col].astype("int64"),
                          "item_b": np.int64(-1), "n": cnt["n"],
                          "_kind": np.int64(1)}),
            pd.DataFrame({"item_a": [np.int64(-1)],
                          "item_b": [np.int64(-1)],
                          "n": [np.int64(part[group_col].nunique())],
                          "_kind": [np.int64(2)]}),
        ], ignore_index=True)

    parts = partitioned_apply(gi, [group_col], pairs,
                              num_partitions=num_partitions)
    support = int(min_support)

    def fold(p: pd.DataFrame) -> pd.DataFrame:
        # vectorized combine + DISTRIBUTED support filter: the driver
        # sees survivors only (pair cardinality is high, so this is a
        # coarse-hash exchange, not a native multi-key groupby)
        g = (p.groupby(["item_a", "item_b", "_kind"], sort=False)["n"]
             .sum().reset_index())
        return g[(g["_kind"] != 0) | (g["n"] >= support)]

    merged = partitioned_apply(parts, ["item_a", "item_b", "_kind"], fold,
                               num_partitions=num_partitions).to_pandas()
    n_total = int(merged.loc[merged["_kind"] == 2, "n"].sum())
    ic = merged[merged["_kind"] == 1].set_index("item_a")["n"]
    pr = merged[merged["_kind"] == 0]
    if not len(pr):
        return pd.DataFrame({"item_a": pd.Series(dtype="int64"),
                             "item_b": pd.Series(dtype="int64"),
                             "n_groups": pd.Series(dtype="int64"),
                             "lift": pd.Series(dtype="float64")})
    na = ic.reindex(pr["item_a"]).to_numpy(np.int64)
    nb = ic.reindex(pr["item_b"]).to_numpy(np.int64)
    nab = pr["n"].to_numpy(np.int64)
    lift = (nab * n_total).astype(np.float64) / (na * nb).astype(np.float64)
    out = pd.DataFrame({"item_a": pr["item_a"].astype("int64"),
                        "item_b": pr["item_b"].astype("int64"),
                        "n_groups": nab.astype("int64"),
                        "lift": sql_round(lift, ndigits)})
    return (out.sort_values(["item_a", "item_b"], kind="mergesort")
            .reset_index(drop=True))
