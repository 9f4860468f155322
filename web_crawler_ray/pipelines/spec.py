"""Declarative pipeline specs (SURVEY.md §2.11 user-extension surface).

The reference instantiates zero-code scrapers from YAML blocks
(pacong/config/settings.yaml:81-192 via generic_scraper.py:424-447 and
simple_generic.py:187-204: ``urls``, ``method``, ``parser``,
``extraction``, ``validation``, ``cleaning`` keys). The engine
equivalent is a dict → Ray Data pipeline compiler: each op becomes a
map_batches / groupby / sort stage, so a user adds a pipeline without
writing engine code.

Spec format (list of op dicts, applied in order):

    {"op": "select",      "columns": [...]}
    {"op": "filter",      "expr": "l_quantity > 10"}            # Ray expr
    {"op": "with_column", "name": "rev", "expr": "l_extendedprice * (1 - l_discount)"}  # pandas.eval
    {"op": "with_money_e4", "name": "rev", "price": col, "discount": col}
                          # exact int64 price*(1-discount) in 1e-4-dollar
                          # units: sums are order-exact (no half-cent
                          # rounding flake); round back with "scale"
    {"op": "rename",      "mapping": {"old": "new"}}
    {"op": "groupby_agg", "keys": [...], "aggs": {"out": ["sum"|"mean"|"count"|"min"|"max", col]}}
    {"op": "round",       "spec": {"col": ndigits}, "scale": {"col": 10000.0}}
    {"op": "sort",        "keys": [...], "descending": [...]}
    {"op": "limit",       "n": 10}
    {"op": "join",        "right": "/path.parquet", "on": [...],
                          "right_on": [...], "right_columns": [...],
                          "how": "inner"|"left_outer"|..., "num_partitions": N}
    {"op": "lookup",      "right": "/path.parquet", "key": col,
                          "right_key": col, "value": col, "out": name}
                          # broadcast small-side join: the right table is
                          # read ONCE into a key→value dict and shipped
                          # via the object store — no shuffle
    {"op": "semi_join",   "right": "/path.parquet", "on": col, "right_on": col}
    {"op": "anti_join",   "right": "/path.parquet", "on": col, "right_on": col}
    {"op": "melt",        "id_cols": [...], "value_cols": [...],
                          "var_col": "variable", "val_col": "value"}
    {"op": "explode",     "column": col, "out": name, "index_col": name}
    {"op": "redact",      "patterns": {name: regex}, "text_col": "text",
                          "out_col": "text_redacted"}
    {"op": "cap_per_group", "group": col, "id": col, "k": N}
    {"op": "hash_split",  "id": col, "train_frac": 0.8, "out_col": "split"}
    {"op": "chunk",       "text_col": "text", "id": col, "window": W, "stride": S}
    {"op": "pack",        "text_col": "text", "id": col, "seq_len": N}
    {"op": "dedup_blocks", "text_col": "text", "id": col, "block": N,
                          "min_count": 2}
    {"op": "quantile_gate", "column": col, "q": 0.75, "keep": "ge"|"lt"}
    {"op": "epoch_shuffle", "id": col, "num_shards": N, "seed": 0}
    {"op": "lm_score",    "text_col": "text", "id": col, "vocab_size": V}
    {"op": "winsorize",   "column": col, "lo_q": 0.01, "hi_q": 0.99,
                  "out": col}
    {"op": "islands",     "id": col}
    {"op": "rank_transform", "column": col, "tie": col, "out": "pct_rank"}
    {"op": "assoc",       "a": col, "b": col}
    {"op": "mad_outliers", "key": col, "column": col, "c": 3.0}
    {"op": "ks_drift",    "key": col, "column": col, "flag": col}
    {"op": "weighted_median", "key": col, "column": col, "weight": col}
    {"op": "sample_k",    "id": col, "k": N}
    {"op": "gini",        "key": col}
    {"op": "aspect_buckets", "id": col, "w": col, "h": col,
                  "batch_size": N}
    {"op": "window_distinct", "ts_col": "ts", "key": col,
                  "stride_us": S, "width_us": W}
    {"op": "mixture",     "id": col, "source": col, "weights": {src: w},
                  "default_weight": 1.0}
    {"op": "hopping_window", "ts_col": "ts", "stride_us": S, "width_us": W,
                  "aggs": {"out": ["sum"|"count"|..., col]}}
    {"op": "wds_write",   "root": dir, "key": col, "payload": col,
                  "ext": "bin", "meta_cols": [...], "max_shard_bytes": N}
    {"op": "salted_join", "right": "/path.parquet", "on": col,
                          "right_on": col, "right_columns": [...],
                          "n_salts": 8}
    {"op": "winnow_pairs", "text_col": "text", "id": col, "k": 3, "w": 4,
                  "min_shared": 2, "max_bucket": None}
    {"op": "zorder",      "a": col, "b": col, "num_partitions": 16,
                  "bits": 16}
    {"op": "window_dedup", "key": col, "ts_col": "ts", "width_us": W,
                  "tie": col}
    {"op": "equidepth_hist", "column": col, "k": 10}
    {"op": "skew_report", "key": col, "hot_frac": 0.01,
                  "max_partitions": 32}
    {"op": "cooccur_edges", "group": col, "item": col, "max_group": 1024}
    {"op": "triangle_count", "a": "id_a", "b": "id_b"}
    {"op": "benford",     "column": col, "scale": 100}
    {"op": "pmi_bigrams", "text_col": "text", "k": 20, "min_count": 5}
    {"op": "chi2_terms",  "text_col": "text", "label": col,
                  "terms": [...], "k": 20}
    {"op": "token_budget", "id": col, "quality": col, "tokens": col,
                  "budget": N}
    {"op": "cdc_chunks",  "text_col": "text", "id": col, "k": 4,
                  "mask": 63}
    {"op": "bigram_lm",   "text_col": "text", "id": col, "lam": 0.7}
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..functions.rounding import revenue_e4, sql_round

_AGGS = {"sum": Sum, "mean": Mean, "min": Min, "max": Max}


def _apply_op(ds, op: dict):
    kind = op["op"]
    if kind == "select":
        return ds.select_columns(op["columns"])
    if kind == "filter":
        return ds.filter(expr=op["expr"])
    if kind == "with_column":
        name, expr = op["name"], op["expr"]

        def add(batch: pd.DataFrame) -> pd.DataFrame:
            batch[name] = batch.eval(expr)
            return batch

        return ds.map_batches(add, batch_format="pandas")
    if kind == "with_money_e4":
        # exact integer money derive: price*(1-discount) in 1e-4-dollar
        # units (int64), so downstream sums are order-exact — the float
        # product can land EXACTLY on a half-cent rounding boundary and
        # hash-flip by summation order; round with
        # {"op": "round", "spec": {col: 2}, "scale": {col: 10000.0}}
        name, price, disc = op["name"], op["price"], op["discount"]

        def add_e4(batch: pd.DataFrame) -> pd.DataFrame:
            # revenue_e4 must be a module-top import: a deferred import
            # here would re-resolve on foreign-cwd workers (the driver
            # ships web_crawler_ray by value, not by path)
            batch[name] = revenue_e4(batch[price], batch[disc])
            return batch

        return ds.map_batches(add_e4, batch_format="pandas")
    if kind == "rename":
        mapping = op["mapping"]
        return ds.map_batches(
            lambda b: b.rename(columns=mapping), batch_format="pandas"
        )
    if kind == "groupby_agg":
        aggs = []
        for out, (fn, col) in op["aggs"].items():
            if fn == "count":
                aggs.append(Count(alias_name=out))
            else:
                aggs.append(_AGGS[fn](col, alias_name=out))
        return ds.groupby(op["keys"]).aggregate(*aggs)
    if kind == "round":
        spec = op["spec"]
        scale = op.get("scale", {})

        def rnd(batch: pd.DataFrame) -> pd.DataFrame:
            for col, nd in spec.items():
                v = batch[col]
                if col in scale:  # integer-unit column back to dollars
                    v = v.astype("float64") / scale[col]
                batch[col] = sql_round(v, nd)
            return batch

        return ds.map_batches(rnd, batch_format="pandas")
    if kind == "sort":
        return ds.sort(op["keys"], descending=op.get("descending", False))
    if kind == "limit":
        return ds.limit(op["n"])
    if kind == "join":
        right = rd.read_parquet(op["right"], columns=op.get("right_columns"))
        return ds.join(
            right,
            join_type=op.get("how", "inner"),
            num_partitions=op.get("num_partitions", 8),
            on=tuple(op["on"]),
            right_on=tuple(op["right_on"]) if op.get("right_on") else None,
        )
    if kind == "lookup":
        import pyarrow.parquet as _pq

        from ..stages.joins import broadcast_lookup

        rk = op.get("right_key", op["key"])
        tab = _pq.read_table(op["right"], columns=[rk, op["value"]])
        mapping = dict(zip(tab[rk].to_pylist(), tab[op["value"]].to_pylist()))
        return broadcast_lookup(ds, mapping, op["key"], op["out"])
    if kind in ("semi_join", "anti_join"):
        from ..stages.joins import anti_join, semi_join

        right = rd.read_parquet(op["right"], columns=[op.get("right_on", op["on"])])
        fn = semi_join if kind == "semi_join" else anti_join
        return fn(ds, right, op["on"], op.get("right_on"))
    if kind == "melt":
        from ..stages.explode import melt

        return melt(ds, op["id_cols"], op["value_cols"],
                    var_col=op.get("var_col", "variable"),
                    val_col=op.get("val_col", "value"))
    if kind == "explode":
        from ..stages.explode import explode_column

        return explode_column(ds, op["column"], out_col=op.get("out"),
                              index_col=op.get("index_col"))
    if kind == "redact":
        from ..stages.text_quality import redact_patterns

        return redact_patterns(ds, op["patterns"],
                               text_col=op.get("text_col", "text"),
                               out_col=op.get("out_col", "text_redacted"))
    if kind == "cap_per_group":
        from ..stages.sampling import cap_per_group

        return cap_per_group(ds, op["group"], op["id"], op["k"])
    if kind == "hash_split":
        from ..stages.sampling import hash_split

        return hash_split(ds, op["id"],
                          train_frac=op.get("train_frac", 0.8),
                          out_col=op.get("out_col", "split"))
    if kind == "chunk":
        from ..stages.packing import chunk_documents

        return chunk_documents(ds, text_col=op.get("text_col", "text"),
                               id_col=op.get("id", "doc_id"),
                               window=op.get("window", 64),
                               stride=op.get("stride", 64))
    if kind == "pack":
        from ..stages.packing import pack_sequences

        return pack_sequences(ds, text_col=op.get("text_col", "text"),
                              id_col=op.get("id", "doc_id"),
                              seq_len=op.get("seq_len", 256))
    if kind == "dedup_blocks":
        from ..stages.text_quality import drop_duplicate_blocks

        return drop_duplicate_blocks(ds, text_col=op.get("text_col", "text"),
                                     id_col=op.get("id", "doc_id"),
                                     block=op.get("block", 8),
                                     min_count=op.get("min_count", 2))
    if kind == "quantile_gate":
        from ..stages.aggregate import quantile_gate

        return quantile_gate(ds, op["column"], op["q"],
                             keep=op.get("keep", "ge"))
    if kind == "lm_score":
        from ..stages.text_rank import unigram_logprob

        return unigram_logprob(ds, op.get("text_col", "text"),
                               op.get("id", "doc_id"),
                               vocab_size=op.get("vocab_size", 100))
    if kind == "gini":
        from ..stages.aggregate import gini_coefficient

        return gini_coefficient(ds, op["key"])
    if kind == "winsorize":
        from ..stages.aggregate import winsorize

        return winsorize(ds, op["column"], lo_q=op.get("lo_q", 0.01),
                         hi_q=op.get("hi_q", 0.99), out_col=op.get("out"))
    if kind == "islands":
        from ..stages.windows import sequence_islands

        return sequence_islands(ds, op["id"])
    if kind == "rank_transform":
        from ..stages.windows import rank_transform

        return rank_transform(ds, op["column"], op["tie"],
                              out_col=op.get("out", "pct_rank"))
    if kind == "assoc":
        import ray.data as _rd

        from ..stages.stats import contingency_assoc

        return _rd.from_pandas(contingency_assoc(ds, op["a"], op["b"]))
    if kind == "mad_outliers":
        from ..stages.stats import group_mad_outliers

        return group_mad_outliers(ds, op["key"], op["column"],
                                  c=op.get("c", 3.0))
    if kind == "ks_drift":
        from ..stages.stats import group_ks_drift

        return group_ks_drift(ds, op["key"], op["column"], op["flag"])
    if kind == "weighted_median":
        from ..stages.stats import group_weighted_median

        return group_weighted_median(ds, op["key"], op["column"],
                                     op["weight"])
    if kind == "sample_k":
        from ..stages.sampling import sample_exact_k

        return sample_exact_k(ds, op["id"], op["k"])
    if kind == "aspect_buckets":
        from ..stages.multimodal import aspect_bucket_plan

        return aspect_bucket_plan(ds, op["id"], op.get("w", "w"),
                                  op.get("h", "h"),
                                  batch_size=op.get("batch_size", 16))
    if kind == "window_distinct":
        from ..stages.windows import hopping_window_distinct

        return hopping_window_distinct(ds, op.get("ts_col", "ts"),
                                       op["key"], op["stride_us"],
                                       op["width_us"])
    if kind == "epoch_shuffle":
        from ..stages.sampling import epoch_shuffle_plan

        return epoch_shuffle_plan(ds, op["id"], op["num_shards"],
                                  seed=op.get("seed", 0))
    if kind == "mixture":
        from ..stages.sampling import mixture_plan

        return mixture_plan(ds, op["id"], op["source"], op["weights"],
                            default_weight=op.get("default_weight", 1.0))
    if kind == "hopping_window":
        from ..stages.windows import hopping_window_agg

        return hopping_window_agg(
            ds, op.get("ts_col", "ts"), op["stride_us"], op["width_us"],
            {out: tuple(a) for out, a in op["aggs"].items()})
    if kind == "wds_write":
        from ..io.wds import write_wds_shards

        man = write_wds_shards(
            ds, op["root"], op["key"], op["payload"],
            ext=op.get("ext", "bin"), meta_cols=op.get("meta_cols"),
            max_shard_bytes=op.get("max_shard_bytes", 64 << 20))
        return rd.from_items([{"shard": k, **v}
                              for k, v in sorted(man["shards"].items())])
    if kind == "salted_join":
        from ..stages.joins import salted_inner_join

        right = rd.read_parquet(op["right"], columns=op.get("right_columns"))
        return salted_inner_join(ds, right, op["on"], op.get("right_on"),
                                 n_salts=op.get("n_salts", 8))
    if kind == "winnow_pairs":
        from ..stages.text_quality import winnow_dup_pairs

        return winnow_dup_pairs(ds, text_col=op.get("text_col", "text"),
                                id_col=op.get("id", "doc_id"),
                                k=op.get("k", 3), w=op.get("w", 4),
                                min_shared=op.get("min_shared", 2),
                                max_bucket=op.get("max_bucket"))
    if kind == "zorder":
        from ..stages.layout import zorder_key

        return zorder_key(ds, op["a"], op["b"],
                          num_partitions=op.get("num_partitions", 16),
                          bits=op.get("bits", 16))
    if kind == "window_dedup":
        from ..stages.windows import window_dedup

        return window_dedup(ds, op["key"], op.get("ts_col", "ts"),
                            op["width_us"], op["tie"])
    if kind == "equidepth_hist":
        from ..stages.aggregate import equidepth_histogram

        return equidepth_histogram(ds, op["column"], k=op.get("k", 10))
    if kind == "skew_report":
        from ..stages.aggregate import shuffle_skew_report

        return shuffle_skew_report(ds, op["key"],
                                   hot_frac=op.get("hot_frac", 0.01),
                                   max_partitions=op.get("max_partitions", 32))
    if kind == "cooccur_edges":
        from ..stages.graph import cooccurrence_edges

        return cooccurrence_edges(ds, op["group"], op["item"],
                                  max_group=op.get("max_group", 1024))
    if kind == "triangle_count":
        from ..stages.graph import triangle_count

        return triangle_count(ds, a_col=op.get("a", "id_a"),
                              b_col=op.get("b", "id_b"))
    if kind == "benford":
        from ..stages.stats import benford_profile

        return rd.from_pandas(
            benford_profile(ds, op["column"], scale=op.get("scale", 100)))
    if kind == "pmi_bigrams":
        from ..stages.text_rank import pmi_bigrams

        return rd.from_pandas(
            pmi_bigrams(ds, op.get("text_col", "text"), k=op.get("k", 20),
                        min_count=op.get("min_count", 5)))
    if kind == "chi2_terms":
        from ..stages.text_rank import chi2_terms

        return rd.from_pandas(
            chi2_terms(ds, op.get("text_col", "text"), op["label"],
                       op["terms"], k=op.get("k", 20)))
    if kind == "token_budget":
        from ..stages.sampling import token_budget_select

        return token_budget_select(ds, op["id"], op["quality"],
                                   op["tokens"], op["budget"])
    if kind == "cdc_chunks":
        from ..stages.text_quality import cdc_chunk_stats

        return cdc_chunk_stats(ds, op.get("text_col", "text"),
                               op.get("id", "doc_id"), k=op.get("k", 4),
                               mask=op.get("mask", 63))
    if kind == "bigram_lm":
        from ..stages.text_rank import bigram_lm_score

        return bigram_lm_score(ds, op.get("text_col", "text"),
                               op.get("id", "doc_id"),
                               lam=op.get("lam", 0.7))
    raise ValueError(f"unknown op: {kind}")


def _spec_columns(source_path: str, ops: list[dict]) -> list[str] | None:
    """Columns the spec actually touches, for pruning at the read.
    Conservative: every identifier referenced by any op, minus names the
    pipeline itself creates, intersected with the file schema (so expr
    tokens that aren't columns never break the read)."""
    import ast as _ast

    import pyarrow.parquet as _pq

    def expr_names(e: str) -> set[str]:
        try:
            tree = _ast.parse(e, mode="eval")
        except SyntaxError:
            return set()
        return {n.id for n in _ast.walk(tree) if isinstance(n, _ast.Name)}

    # Positional tracking: a referenced name is a SOURCE column only if
    # no EARLIER op created it. A with_column/rename may redefine an
    # existing source column (e.g. with_column('price', 'price * 2'));
    # its defining expr still reads the source column, so the need is
    # recorded before the creation — global subtraction would prune it.
    needed: set[str] = set()
    created: set[str] = set()

    def need(names) -> None:
        needed.update(n for n in names if n not in created)

    for op in ops:
        kind = op["op"]
        if kind == "select":
            need(op["columns"])
        elif kind == "filter":
            need(expr_names(op["expr"]))
        elif kind == "with_column":
            need(expr_names(op["expr"]))
            created.add(op["name"])
        elif kind == "with_money_e4":
            need([op["price"], op["discount"]])
            created.add(op["name"])
        elif kind == "rename":
            need(op["mapping"])
            created |= set(op["mapping"].values())
        elif kind == "groupby_agg":
            need(op["keys"])
            for out, (fn, col) in op["aggs"].items():
                if col:
                    need([col])
                created.add(out)
        elif kind == "round":
            need(op["spec"])
        elif kind == "sort":
            need(op["keys"])
        elif kind == "join":
            need(op["on"])
            created |= set(op.get("right_columns") or [])
        elif kind == "lookup":
            need([op["key"]])
            created.add(op["out"])
        elif kind in ("semi_join", "anti_join"):
            need([op["on"]])
        elif kind == "melt":
            need(op["id_cols"])
            need(op["value_cols"])
            created.add(op.get("var_col", "variable"))
            created.add(op.get("val_col", "value"))
        elif kind == "explode":
            need([op["column"]])
            if op.get("out"):
                created.add(op["out"])
            if op.get("index_col"):
                created.add(op["index_col"])
        elif kind == "redact":
            need([op.get("text_col", "text")])
            created.add(op.get("out_col", "text_redacted"))
            created |= {f"n_{n}" for n in op["patterns"]}
        elif kind == "cap_per_group":
            need([op["group"], op["id"]])
        elif kind == "hash_split":
            need([op["id"]])
            created.add(op.get("out_col", "split"))
        elif kind in ("chunk", "pack", "dedup_blocks"):
            need([op.get("text_col", "text"), op.get("id", "doc_id")])
            created |= ({"chunk_idx", "n_tokens", "chunk_text"}
                        if kind == "chunk" else
                        {"chunk_id", "n_tokens"} if kind == "pack" else
                        {"n_blocks", "n_dup_blocks", "text_deduped"})
        elif kind == "quantile_gate":
            need([op["column"]])
        elif kind == "salted_join":
            need([op["on"]])
            created |= set(op.get("right_columns") or [])
        elif kind == "epoch_shuffle":
            need([op["id"]])
            created |= {"shard", "pos"}
        elif kind == "lm_score":
            need([op.get("text_col", "text"), op.get("id", "doc_id")])
            created |= {"n_tokens", "logprob"}
        elif kind == "gini":
            need([op["key"]])
            created |= {"gini", "n_keys"}
        elif kind == "winsorize":
            need([op["column"]])
            if op.get("out"):
                created.add(op["out"])
        elif kind == "islands":
            need([op["id"]])
            created |= {"start_id", "end_id", "n"}
        elif kind == "rank_transform":
            need([op["column"], op["tie"]])
            created.add(op.get("out", "pct_rank"))
        elif kind == "assoc":
            need([op["a"], op["b"]])
            created |= {"n", "pmi", "chi2_term"}
        elif kind == "mad_outliers":
            need([op["key"], op["column"]])
            created |= {"med", "mad", "n_out"}
        elif kind == "ks_drift":
            need([op["key"], op["column"], op["flag"]])
            created |= {"ks", "n1", "n2"}
        elif kind == "weighted_median":
            need([op["key"], op["column"], op["weight"]])
            created.add("wmedian")
        elif kind == "sample_k":
            need([op["id"]])
            created.add("h")
        elif kind == "aspect_buckets":
            need([op["id"], op.get("w", "w"), op.get("h", "h")])
            created |= {"bucket", "batch_idx"}
        elif kind == "window_distinct":
            need([op.get("ts_col", "ts"), op["key"]])
            created |= {"w_start", "n_distinct"}
        elif kind == "mixture":
            need([op["id"], op["source"]])
            created.add("n_repeats")
        elif kind == "hopping_window":
            need([op.get("ts_col", "ts")])
            for out, (fn, col) in op["aggs"].items():
                if col:
                    need([col])
                created.add(out)
            created.add("w_start")
        elif kind == "wds_write":
            need([op["key"], op["payload"], *(op.get("meta_cols") or [])])
            created |= {"shard", "rows", "bytes", "key_lo", "key_hi"}
        elif kind == "winnow_pairs":
            need([op.get("text_col", "text"), op.get("id", "doc_id")])
            created |= {"id_a", "id_b", "n_shared"}
        elif kind == "zorder":
            need([op["a"], op["b"]])
            created |= {"zkey", "zpart"}
        elif kind == "window_dedup":
            need([op["key"], op.get("ts_col", "ts"), op["tie"]])
            created.add("w_start")
        elif kind == "equidepth_hist":
            need([op["column"]])
            created |= {"bucket", "n", "v_min", "v_max"}
        elif kind == "skew_report":
            need([op["key"]])
            created |= {"n", "share_ppm", "n_salts"}
        elif kind == "cooccur_edges":
            need([op["group"], op["item"]])
            created |= {"id_a", "id_b"}
        elif kind == "triangle_count":
            need([op.get("a", "id_a"), op.get("b", "id_b")])
            created |= {"n_edges", "n_wedges", "n_triangles"}
        elif kind == "benford":
            need([op["column"]])
            created |= {"digit", "n_vals", "share", "expected"}
        elif kind == "pmi_bigrams":
            need([op.get("text_col", "text")])
            created |= {"bigram", "n", "pmi"}
        elif kind == "chi2_terms":
            need([op.get("text_col", "text"), op["label"]])
            created |= {"term", "label", "n_docs", "chi2"}
        elif kind == "token_budget":
            need([op["id"], op["quality"], op["tokens"]])
        elif kind == "cdc_chunks":
            need([op.get("text_col", "text"), op.get("id", "doc_id")])
            created |= {"n_chars", "n_cuts", "n_chunks"}
        elif kind == "bigram_lm":
            need([op.get("text_col", "text"), op.get("id", "doc_id")])
            created |= {"n_bigrams", "lm_score"}
    cols = sorted(needed & set(_pq.read_schema(source_path).names))
    return cols or None


def build_pipeline(source: str | object, ops: list[dict]):
    """Compile a spec into a Dataset pipeline. ``source`` is a parquet
    path — read with ``columns=`` pruned to what the spec references —
    or an existing Dataset."""
    if isinstance(source, str):
        ds = rd.read_parquet(source, columns=_spec_columns(source, ops))
    else:
        ds = source
    for op in ops:
        ds = _apply_op(ds, op)
    return ds


# registry for named pipelines (the engine analogue of the scraper
# factory, pacong/scrapers/factory.py:10-68)
_REGISTRY: dict[str, tuple[str, list[dict]]] = {}


def register_pipeline(name: str, source: str, ops: list[dict]) -> None:
    _REGISTRY[name] = (source, ops)


def create_pipeline(name: str, sf_dir: str):
    source, ops = _REGISTRY[name]
    return build_pipeline(f"{sf_dir}/{source}.parquet", ops)


def list_pipelines() -> list[str]:
    return sorted(_REGISTRY)
