"""Unit tests: lance-like sink commit/resume semantics, coarse-partition
grouped apply vs naive groupby, pipeline-spec registry."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from web_crawler_ray.io import lancelike
from web_crawler_ray.pipelines.spec import (
    build_pipeline,
    create_pipeline,
    list_pipelines,
    register_pipeline,
)
from web_crawler_ray.stages.grouped import grouped_apply, partitioned_drop_duplicates


def _tab(n=10):
    return pa.table({"k": pa.array([i % 3 for i in range(n)]), "v": pa.array(range(n))})


def test_lancelike_fragment_commit_and_resume_skip(tmp_path):
    root = str(tmp_path / "ds")
    name = lancelike.write_fragment(root, _tab(), 0, 0, "fp-a")
    assert name == "part-00000-r000"
    m1 = lancelike.read_manifest(root)
    assert m1["version"] == 1 and m1["fragments"][name]["rows"] == 10
    # identical fingerprint → idempotent skip (no version bump)
    lancelike.write_fragment(root, _tab(), 0, 0, "fp-a")
    assert lancelike.read_manifest(root)["version"] == 1
    # changed fingerprint → recommit
    lancelike.write_fragment(root, _tab(4), 0, 0, "fp-b")
    m2 = lancelike.read_manifest(root)
    assert m2["version"] == 2 and m2["fragments"][name]["rows"] == 4
    # second fragment + read-back
    lancelike.write_fragment(root, _tab(6), 1, 0, "fp-c")
    assert lancelike.read_dataset(root).num_rows == 10
    assert len(lancelike.dataset_paths(root)) == 2
    # lineage sidecars exist
    assert os.path.exists(os.path.join(root, name + ".lineage.json"))


def _image_hint_table(n=6) -> pa.Table:
    """The north rule's input_hint schema: image + caption rows."""
    return pa.table({
        "image_id": pa.array([f"img-{i:04d}" for i in range(n)], pa.string()),
        "bytes": pa.array([bytes([i % 251] * (16 + i)) for i in range(n)],
                          pa.binary()),
        "w": pa.array([32 + i for i in range(n)], pa.int32()),
        "h": pa.array([24 + i for i in range(n)], pa.int32()),
        "fmt": pa.array(["png" if i % 2 else "jpeg" for i in range(n)],
                        pa.string()),
        "caption": pa.array([f"caption {i}" for i in range(n)], pa.string()),
        "phash": pa.array([(i * 2654435761) % (1 << 62) for i in range(n)],
                          pa.int64()),
    })


def test_lance_seam_fail_fast_and_parquet_roundtrip(tmp_path):
    """The format seam (SURVEY §2.1 K4): data_format='lance' must fail
    fast when the lib is absent (never silently write parquet), and the
    parquet lookalike must round-trip the input_hint image schema
    byte-exactly through write_fragment → read_dataset."""
    root = str(tmp_path / "seam")
    tab = _image_hint_table()
    if not lancelike.HAVE_LANCE:
        with pytest.raises(ImportError, match="lance"):
            lancelike.write_fragment(root, tab, 0, 0, "fp",
                                     data_format="lance")
    with pytest.raises(ValueError, match="unknown data_format"):
        lancelike.write_fragment(root, tab, 0, 0, "fp", data_format="orc")
    lancelike.write_fragment(root, tab, 0, 0, "fp", data_format="parquet")
    back = lancelike.read_dataset(root)
    assert back.equals(tab)  # schema + values, bytes included


@pytest.mark.skipif(not lancelike.HAVE_LANCE,
                    reason="pylance not installed in this sandbox")
def test_lancelike_lance_roundtrip_parity(tmp_path):
    """Conformance when REAL lance is importable: the same commits
    through data_format='lance' and 'parquet' read back identically
    (input_hint schema), resume-skip works in both, and 'auto'
    resolves to lance — swapping libs touches zero call sites."""
    tab = _image_hint_table()
    roots = {}
    for fmt in ("lance", "parquet"):
        root = str(tmp_path / fmt)
        lancelike.write_fragment(root, tab, 0, 0, "fp-a", data_format=fmt)
        lancelike.write_fragment(root, _image_hint_table(3), 1, 0, "fp-b",
                                 data_format=fmt)
        # resume skip: same fingerprint → no version bump
        v = lancelike.read_manifest(root)["version"]
        lancelike.write_fragment(root, tab, 0, 0, "fp-a", data_format=fmt)
        assert lancelike.read_manifest(root)["version"] == v
        roots[fmt] = lancelike.read_dataset(root)
    assert roots["lance"].equals(roots["parquet"])
    assert lancelike._resolve_format("auto") == "lance"
    auto_root = str(tmp_path / "auto")
    lancelike.write_fragment(auto_root, tab, 0, 0, "fp", data_format="auto")
    frag = lancelike.read_manifest(auto_root)["fragments"]["part-00000-r000"]
    assert frag["file"].endswith(".lance")


def test_lancelike_dir_fragment(tmp_path):
    import pyarrow.parquet as pq

    root = str(tmp_path / "ds2")
    os.makedirs(os.path.join(root, "round-000"))
    pq.write_table(_tab(5), os.path.join(root, "round-000", "part-a.parquet"))
    pq.write_table(_tab(7), os.path.join(root, "round-000", "part-b.parquet"))
    lancelike.commit_dir_fragment(root, "round-000", "round-000", 12, "fp-x")
    assert lancelike.read_dataset(root).num_rows == 12
    # idempotent on same fingerprint
    lancelike.commit_dir_fragment(root, "round-000", "round-000", 12, "fp-x")
    assert lancelike.read_manifest(root)["version"] == 1


def test_grouped_apply_matches_naive(ray_session):
    df = pd.DataFrame(
        {
            "k1": [f"g{i % 17}" for i in range(500)],
            "k2": [i % 3 for i in range(500)],
            "v": range(500),
        }
    )

    def reducer(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"k1": [g["k1"].iloc[0]], "k2": [g["k2"].iloc[0]],
             "s": [int(g["v"].sum())], "n": [len(g)]}
        )

    got = (
        grouped_apply(rd.from_pandas(df).repartition(5), ["k1", "k2"], reducer)
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    want = (
        df.groupby(["k1", "k2"], sort=True)["v"]
        .agg(["sum", "size"])
        .rename(columns={"sum": "s", "size": "n"})
        .reset_index()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"s": "int64", "n": "int64"}), want.astype({"s": "int64", "n": "int64"})
    )


def test_partitioned_drop_duplicates(ray_session):
    df = pd.DataFrame({"k": [1, 1, 2, 2, 3], "v": [5, 3, 9, 9, 1], "tag": list("abcde")})
    out = (
        partitioned_drop_duplicates(
            rd.from_pandas(df), ["k"], sort_keys=["k", "v"], ascending=[True, True]
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["v"].tolist() == [3, 9, 1]  # min-v winner per key, deterministic


def test_spec_registry(ray_session):
    register_pipeline(
        "orders_by_priority", "orders",
        [{"op": "groupby_agg", "keys": ["o_orderpriority"], "aggs": {"n": ["count", None]}}],
    )
    assert "orders_by_priority" in list_pipelines()
    out = create_pipeline("orders_by_priority", "/root/testdata/sf0.001").to_pandas()
    assert out["n"].sum() == 1500


def test_spec_unknown_op():
    with pytest.raises(ValueError, match="unknown op"):
        build_pipeline("/root/testdata/sf0.001/orders.parquet", [{"op": "nope"}])


def test_latest_wins_vectorized_matches_reducer(ray_session):
    """The vectorized D1 partition pass (sort + drop_duplicates +
    source-union fix-up) equals the per-group reducer on a fixture with
    dup keys, ts ties, multi-source keys and empty sources."""
    import numpy as np

    from web_crawler_ray.stages.dedup import (
        _latest_wins_partition,
        dedup_latest_wins,
        latest_wins_reducer,
    )

    rng = np.random.default_rng(11)
    n = 2000
    df = pd.DataFrame(
        {
            "sym": [f"s{int(i)}" for i in rng.integers(0, 400, n)],
            "ts": rng.integers(0, 5, n).astype("int64"),  # many ties
            "uid": np.arange(n, dtype="int64"),
            "source": rng.choice(["alpha", "beta", "gamma", ""], n),
            "v": rng.random(n),
        }
    )
    want = (
        pd.concat(
            [
                latest_wins_reducer(g, "ts", "uid", "source")
                for _, g in df.groupby("sym", sort=True)
            ],
            ignore_index=True,
        )
        .sort_values("sym")
        .reset_index(drop=True)
    )
    # partition-level pass over the whole frame
    got_part = (
        _latest_wins_partition(df, ["sym"], "ts", "uid", "source")
        .sort_values("sym")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_part, want)
    # full Dataset path (shuffle + per-partition pass)
    got_ds = (
        dedup_latest_wins(rd.from_pandas(df).repartition(6), ["sym"], "ts", "uid", "source")
        .to_pandas()
        .sort_values("sym")
        .reset_index(drop=True)[want.columns.tolist()]
    )
    pd.testing.assert_frame_equal(got_ds, want)


def test_pre_dedup_combiner_identical_results(ray_session):
    """pre_dedup=True (map-side combiner) must produce exactly the rows
    of pre_dedup=False for a winner-preserving sort order."""
    import numpy as np

    from web_crawler_ray.stages.grouped import partitioned_drop_duplicates

    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 200, n),
            "v": rng.integers(0, 8, n),
            "uid": np.arange(n, dtype=np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(7)

    def run(pre):
        return (
            partitioned_drop_duplicates(
                ds, ["k", "v"], sort_keys=["k", "v", "uid"], pre_dedup=pre
            )
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(True), run(False))
    # and vs plain pandas
    want = (
        df.sort_values(["k", "v", "uid"], kind="mergesort")
        .drop_duplicates(subset=["k", "v"], keep="first")
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(run(True)[want.columns.tolist()], want)


def test_curate_corpus_semantics(ray_session):
    """Quality gate drops short/junk docs; duplicate text keeps the
    min-doc_id row (even across langs); sample keeps zh at rate 1.0."""
    from web_crawler_ray.pipelines.curate import corpus_stats, curate_corpus

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "w " * 30,            # 30 tokens, passes gate
                "w " * 30,            # exact dup of doc 1 → dropped (min id wins)
                "short doc",          # < 25 tokens → gated out
                "x" * 400 + " y",     # 2 tokens → gated out (and junk ratio)
                "z " * 40,            # zh doc, passes
                "q " * 25,            # passes
            ],
            "lang": ["en", "fr", "en", "en", "zh", "zh"],
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    ds = rd.from_pandas(docs).repartition(3)
    out = (
        curate_corpus(ds, {"zh": 1.0, "en": 1.0, "fr": 1.0}, default_rate=1.0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 5, 6]
    assert out.loc[0, "lang"] == "en"  # min-id winner keeps ITS lang, not the dup's
    assert out["n_tokens"].tolist() == [30, 40, 25]
    stats = corpus_stats(
        curate_corpus(ds, {"zh": 1.0, "en": 1.0, "fr": 1.0}, default_rate=1.0)
    ).to_pandas().sort_values("lang").reset_index(drop=True)
    assert stats["lang"].tolist() == ["en", "zh"]
    assert stats["n_docs"].tolist() == [1, 2]
    assert stats["total_tokens"].tolist() == [30, 65]


def test_hll_distinct_accuracy_and_parallel_invariance(ray_session):
    """HLL estimate within 3% of exact at p=12, and bit-identical
    across different block layouts (register max-merge is associative)."""
    import numpy as np

    from web_crawler_ray.stages.sketch import hll_distinct

    rng = np.random.default_rng(7)
    n = 60_000
    df = pd.DataFrame(
        {
            "k": np.where(rng.random(n) < 0.5, "a", "b"),
            "v": rng.integers(0, 20_000, n),
        }
    )
    exact = df.groupby("k")["v"].nunique()
    out1 = (
        hll_distinct(rd.from_pandas(df).repartition(2), "k", "v")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    out2 = (
        hll_distinct(rd.from_pandas(df).repartition(13), "k", "v")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out1, out2)  # layout-invariant
    for _, row in out1.iterrows():
        rel = abs(row["n_distinct_approx"] - exact[row["k"]]) / exact[row["k"]]
        assert rel < 0.03, (row["k"], row["n_distinct_approx"], exact[row["k"]])


def test_hll_partial_null_keys_isolated():
    """Null keys form their OWN register block: they must not scatter
    rho values into the last sorted key's block (inflating its
    estimate) nor vanish — matching the dropna=False merge step."""
    import numpy as np

    from web_crawler_ray.stages.sketch import hll_partial

    df = pd.DataFrame({
        "k": ["a"] * 3 + [None] * 200 + ["z"] * 2,
        "v": list(range(3)) + list(range(1000, 1200)) + [1, 2],
    })
    out = hll_partial(df, "k", "v", p=8)
    assert len(out) == 3  # a, z, and the null group
    by_key = {(k if pd.notna(k) else None): np.frombuffer(r, dtype=np.uint8)
              for k, r in zip(out["k"], out["regs"])}
    assert set(by_key) == {"a", "z", None}
    # z saw exactly 2 values → at most 2 non-zero registers (the old
    # sentinel bug wrote the 200 null-key rows into z's block)
    assert (by_key["z"] > 0).sum() <= 2
    assert (by_key[None] > 0).sum() > 50  # nulls' mass lands in own block


def test_hash_bucket_large_id_no_overflow():
    """ids past 2^31 are folded before the Knuth multiply, so the
    int64 product cannot wrap (numpy wraps silently; DuckDB promotes
    to HUGEINT — divergence). Fold is identity below 2^31."""
    import numpy as np

    from web_crawler_ray.stages.sampling import hash_bucket

    small = np.array([0, 1, 12345, 2**31 - 1], dtype=np.int64)
    assert (hash_bucket(small, 1000)
            == (small * 2654435761) % (1 << 32) % 1000).all()
    huge = np.array([2**31, 2**40, 2**62, 9_000_000_000], dtype=np.int64)
    b = hash_bucket(huge, 1000)
    assert ((b >= 0) & (b < 1000)).all()
    # matches the folded reference expression exactly (what the SQL
    # oracle computes with (id % 2147483648) * K)
    ref = ((huge % (1 << 31)) * 2654435761) % (1 << 32) % 1000
    assert (b == ref).all()


def test_hll_leading_zeros_exact():
    """Bisection CLZ matches int.bit_length on random 64-bit words."""
    import numpy as np

    from web_crawler_ray.stages.sketch import _leading_zeros64

    rng = np.random.default_rng(3)
    w = rng.integers(0, 2**63, 1000, dtype=np.uint64) * 2 + rng.integers(0, 2, 1000, dtype=np.uint64)
    w[:5] = [0, 1, 2**63, 2**63 - 1, 2**32]
    got = _leading_zeros64(w)
    want = [64 - int(x).bit_length() for x in w]
    assert got.tolist() == want


def test_spec_join_ops(ray_session):
    """Spec-compiler join family: join (hash), lookup (broadcast),
    semi_join and anti_join ops compile and match pandas reference."""
    sf = "/root/testdata/sf0.001"
    cust, nation = f"{sf}/customer.parquet", f"{sf}/nation.parquet"

    out = (
        build_pipeline(
            cust,
            [
                {"op": "lookup", "right": nation, "key": "c_nationkey",
                 "right_key": "n_nationkey", "value": "n_name", "out": "nation"},
                {"op": "groupby_agg", "keys": ["nation"],
                 "aggs": {"n": ["count", None]}},
            ],
        )
        .to_pandas().sort_values("nation").reset_index(drop=True)
    )
    cdf = pd.read_parquet(cust)
    ndf = pd.read_parquet(nation)
    want = (
        cdf.merge(ndf, left_on="c_nationkey", right_on="n_nationkey")
        .groupby("n_name").size().rename("n").reset_index()
        .rename(columns={"n_name": "nation"})
    )
    assert out["nation"].tolist() == want["nation"].tolist()
    assert out["n"].tolist() == want["n"].tolist()

    # semi/anti partition customers exactly
    semi = build_pipeline(
        cust,
        [{"op": "semi_join", "right": f"{sf}/orders.parquet",
          "on": "c_custkey", "right_on": "o_custkey"}],
    ).count()
    anti = build_pipeline(
        cust,
        [{"op": "anti_join", "right": f"{sf}/orders.parquet",
          "on": "c_custkey", "right_on": "o_custkey"}],
    ).count()
    odf = pd.read_parquet(f"{sf}/orders.parquet")
    n_with = cdf["c_custkey"].isin(odf["o_custkey"]).sum()
    assert semi == n_with and anti == len(cdf) - n_with


def test_bipartite_power_scores_paths_agree(ray_session):
    """Graph power iteration: broadcast fast path == join scale path ==
    hand-computed pandas reference on a small bipartite graph."""
    import numpy as np

    from web_crawler_ray.stages.graph import bipartite_power_scores

    rng = np.random.default_rng(11)
    edges = pd.DataFrame(
        {"o": rng.integers(0, 40, 400), "p": rng.integers(0, 25, 400)}
    )
    ds = rd.from_pandas(edges).repartition(4)

    def reference():
        e = edges.drop_duplicates()
        d_o = e.groupby("o").size()
        d_p = e.groupby("p").size()
        s_p = pd.Series(1.0, index=d_p.index)
        for _ in range(2):
            contrib = e["p"].map(s_p / d_p)
            s_o = pd.DataFrame({"o": e["o"], "c": contrib}).groupby("o")["c"].sum()
            contrib2 = e["o"].map(s_o / d_o)
            s_p = pd.DataFrame({"p": e["p"], "c": contrib2}).groupby("p")["c"].sum()
        return s_p.round(6)

    want = reference()
    fast = (
        bipartite_power_scores(ds, "o", "p", iterations=2)
        .to_pandas().sort_values("p").reset_index(drop=True)
    )
    slow = (
        bipartite_power_scores(ds, "o", "p", iterations=2,
                               num_partitions=4, broadcast_nodes_max=0)
        .to_pandas().sort_values("p").reset_index(drop=True)
    )
    assert fast["p"].tolist() == sorted(want.index.tolist())
    assert np.allclose(fast["score"], want.loc[fast["p"]].to_numpy())
    pd.testing.assert_frame_equal(slow, fast)


def test_explode_column_edges(ray_session):
    """Null and empty lists produce no rows; ordinality is 1-based per
    parent; non-list columns repeat."""
    from web_crawler_ray.stages.explode import explode_column

    tab = pa.table(
        {
            "id": [1, 2, 3, 4],
            "tags": pa.array([["a", "b"], [], None, ["c"]], pa.list_(pa.string())),
        }
    )
    out = (
        explode_column(rd.from_arrow(tab).repartition(2), "tags",
                       out_col="tag", index_col="pos")
        .to_pandas().sort_values(["id", "pos"]).reset_index(drop=True)
    )
    assert out["id"].tolist() == [1, 1, 4]
    assert out["tag"].tolist() == ["a", "b", "c"]
    assert out["pos"].tolist() == [1, 2, 1]


def test_heavy_hitters_exact_and_fallback(ray_session):
    """Two-pass Misra–Gries top-k equals the exact top-k on a skewed
    corpus; with m too small for the guarantee the exact fallback
    kicks in and the result is still exact."""
    import numpy as np

    from web_crawler_ray.stages.sketch import heavy_hitters

    rng = np.random.default_rng(11)
    # zipf-ish skew over 2000 keys
    keys = (rng.zipf(1.3, 50_000) % 2000).astype("int64")
    df = pd.DataFrame({"k": keys})
    exact = (df["k"].value_counts().rename("cnt").rename_axis("k").reset_index()
             .sort_values(["cnt", "k"], ascending=[False, True], kind="mergesort")
             .head(10).reset_index(drop=True))
    for m in (512, 4):  # m=4 forces the guarantee gate → exact fallback
        out = heavy_hitters(rd.from_pandas(df).repartition(8), "k", k=10, m=m,
                            n_rows_hint=len(df))
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True).astype({"cnt": "int64"}),
            exact.astype({"cnt": "int64"}), check_names=False)


def test_mg_compress_guarantee():
    """MG compression never under-counts a key by more than the
    removed pivot, and keeps at most m counters."""
    import numpy as np

    from web_crawler_ray.stages.sketch import _mg_compress

    rng = np.random.default_rng(5)
    counts = pd.Series(rng.integers(1, 100, 500),
                       index=np.arange(500)).astype("int64")
    out = _mg_compress(counts, 50)
    assert len(out) <= 50
    pivot = np.sort(counts.to_numpy())[::-1][50]
    for k, v in out.items():
        assert counts[k] - v == pivot


def test_bloom_semi_join_exact(ray_session):
    """Bloom-pushdown semi-join returns EXACTLY the plain semi-join
    (bloom false positives removed by the exact fix-up), independent of
    block layout, including with a deliberately tiny/collision-heavy
    bloom."""
    import numpy as np

    from web_crawler_ray.stages.joins import bloom_semi_join, semi_join

    rng = np.random.default_rng(3)
    left = pd.DataFrame({"k": rng.integers(0, 5000, 20_000), "v": np.arange(20_000)})
    right = pd.DataFrame({"rk": rng.integers(0, 5000, 300)})
    want = (
        semi_join(rd.from_pandas(left), rd.from_pandas(right), on="k", right_on="rk")
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    assert 0 < len(want) < len(left)
    for bits in (20, 10):  # 2^10 bits over 300 keys → many false positives
        got = (
            bloom_semi_join(rd.from_pandas(left).repartition(7),
                            rd.from_pandas(right).repartition(3),
                            on="k", right_on="rk", bits_log2=bits)
            .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["k", "v"]], want[["k", "v"]])


def test_ddsketch_quantiles_accuracy_and_invariance(ray_session):
    """DDSketch per-key quantiles are within the α relative-error
    guarantee of the exact quantile_disc rank value, and bit-identical
    across block layouts (integer bucket counts merge associatively)."""
    import math

    import numpy as np

    from web_crawler_ray.stages.sketch import ddsketch_quantiles

    rng = np.random.default_rng(17)
    n = 40_000
    df = pd.DataFrame({
        "k": np.where(rng.random(n) < 0.5, "a", "b"),
        "v": np.exp(rng.normal(2.0, 1.5, n)),  # heavy-tailed positives
    })
    alpha = 0.005
    qs = {"p50": 0.5, "p95": 0.95, "p99": 0.99}
    outs = []
    for parts in (3, 11):
        outs.append(
            ddsketch_quantiles(rd.from_pandas(df).repartition(parts), "k", "v",
                               qs, alpha=alpha)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    for k, g in df.groupby("k"):
        vs = np.sort(g["v"].to_numpy())
        row = outs[0][outs[0]["k"] == k].iloc[0]
        assert row["n"] == len(vs)
        for name, q in qs.items():
            exact = vs[max(1, math.ceil(q * len(vs))) - 1]
            assert abs(row[name] - exact) <= alpha * exact * 1.0001, (k, name)


def test_melt_unpivot(ray_session):
    """melt emits one row per (row × value col) with names in
    'variable' — block-local, order-preserving within a block."""
    from web_crawler_ray.stages.explode import melt

    df = pd.DataFrame({"id": [1, 2], "a": [10.0, 20.0], "b": [0.5, 0.25]})
    out = (melt(rd.from_pandas(df), ["id"], ["a", "b"])
           .to_pandas().sort_values(["id", "variable"]).reset_index(drop=True))
    assert len(out) == 4
    assert out["value"].tolist() == [10.0, 0.5, 20.0, 0.25]
    assert out["variable"].tolist() == ["a", "b", "a", "b"]


def test_heavy_hitters_weighted(ray_session):
    """Weighted MG top-k equals exact top-k by summed weight, with the
    tiny-m fallback still exact."""
    import numpy as np

    from web_crawler_ray.stages.sketch import heavy_hitters

    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "k": (rng.zipf(1.4, 30_000) % 500).astype("int64"),
        "w": rng.uniform(0.0, 10.0, 30_000),
    })
    exact = (df.groupby("k")["w"].sum().rename("cnt").rename_axis("k")
             .reset_index()
             .sort_values(["cnt", "k"], ascending=[False, True], kind="mergesort")
             .head(8).reset_index(drop=True))
    for m in (512, 4):
        out = heavy_hitters(rd.from_pandas(df).repartition(6), "k", k=8, m=m,
                            weight_col="w").reset_index(drop=True)
        assert out["k"].tolist() == exact["k"].tolist()
        assert np.allclose(out["cnt"], exact["cnt"], rtol=0, atol=1e-6)


def test_spec_melt_explode_ops(ray_session):
    """Spec-compiler reshape ops: melt unpivots and explode unnests,
    with the column-pruned read still carrying every referenced col."""
    sf = "/root/testdata/sf0.001"
    out = build_pipeline(
        f"{sf}/orders.parquet",
        [
            {"op": "melt", "id_cols": ["o_orderkey"],
             "value_cols": ["o_totalprice", "o_custkey"]},
            {"op": "groupby_agg", "keys": ["variable"],
             "aggs": {"n": ["count", None]}},
        ],
    ).to_pandas().sort_values("variable").reset_index(drop=True)
    n_orders = len(pd.read_parquet(f"{sf}/orders.parquet"))
    assert out["variable"].tolist() == ["o_custkey", "o_totalprice"]
    assert out["n"].tolist() == [n_orders, n_orders]

    emb = build_pipeline(
        f"{sf}/embeddings.parquet",
        [{"op": "explode", "column": "embedding", "out": "x",
          "index_col": "pos"}, {"op": "limit", "n": 7}],
    ).to_pandas()
    assert list(emb.columns[-2:]) == ["x", "pos"] or {"x", "pos"} <= set(emb.columns)
    assert emb["pos"].iloc[0] == 1


def test_weighted_sample_proportional_and_invariant(ray_session):
    """A-Res weighted sample: layout-invariant, and heavy-weight rows
    are selected far more often than light ones (inclusion ∝ weight)."""
    import numpy as np

    from web_crawler_ray.stages.sampling import weighted_sample

    n = 10_000
    df = pd.DataFrame({
        "id": np.arange(n, dtype="int64"),
        # first 100 rows carry 100× the weight of the rest
        "w": np.where(np.arange(n) < 100, 1000.0, 10.0),
    })
    outs = []
    for parts in (2, 7):
        out = weighted_sample(rd.from_pandas(df).repartition(parts),
                              "id", "w", k=50)
        outs.append(out["id"].tolist())
    assert outs[0] == outs[1]
    heavy = sum(1 for i in outs[0] if i < 100)
    assert heavy >= 20  # 1% of rows, ~100× weight → dominate the sample


def test_connected_components_chain_and_isolated(ray_session):
    """Min-label propagation: a 5-node chain collapses to one component
    (multi-hop propagation), disjoint pairs stay separate, and results
    are layout-invariant."""
    from web_crawler_ray.stages.graph import connected_components

    edges = pd.DataFrame({
        "id_a": [1, 2, 3, 4, 10, 20],
        "id_b": [2, 3, 4, 5, 11, 21],
    })
    expect = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10,
              20: 20, 21: 20}
    for parts in (1, 3):
        for dmax in (2_000_000, 0):  # driver fast path AND broadcast
            out = (connected_components(
                rd.from_pandas(edges).repartition(parts),
                driver_edges_max=dmax)
                .to_pandas()  # stage returns a Dataset
                .set_index("node")["component"].to_dict())
            assert out == expect


def test_connected_components_join_path_matches_broadcast(ray_session):
    """The distributed join-propagation path (auto-selected past the
    node gate) returns the SAME label map as the broadcast path on a
    graph with long chains, a star, and random extra edges."""
    import numpy as np

    from web_crawler_ray.stages.graph import connected_components

    rng = np.random.default_rng(11)
    # chain 0..8 (multi-hop), star 100<-101..110, random pairs
    a = list(range(0, 8)) + [100] * 10 + rng.integers(
        200, 260, 20).tolist()
    b = list(range(1, 9)) + list(range(101, 111)) + rng.integers(
        200, 260, 20).tolist()
    edges = pd.DataFrame({"id_a": np.array(a, dtype="int64"),
                          "id_b": np.array(b, dtype="int64")})
    edges = edges[edges.id_a != edges.id_b]
    ds = rd.from_pandas(edges).repartition(4)
    drv = (connected_components(ds).to_pandas()  # driver fast path
           .set_index("node")["component"].to_dict())
    bc = (connected_components(ds, driver_edges_max=0).to_pandas()
          .set_index("node")["component"].to_dict())
    jn = (connected_components(ds, force_join_path=True, num_partitions=4)
          .to_pandas().set_index("node")["component"].to_dict())
    assert jn == bc
    assert drv == bc


def test_attach_components_join_matches_broadcast(ray_session):
    """attach_components must produce the same labels through the
    broadcast (searchsorted) and distributed (left-outer hash join)
    paths, including rows with NO component (keep own id)."""
    from web_crawler_ray.stages.graph import attach_components

    rows = pd.DataFrame({"rid": [5, 1, 9, 3, 7, 2],
                         "val": list("abcdef")})
    comps = pd.DataFrame({"node": [9, 3, 5], "component": [3, 3, 1]})
    ds = rd.from_pandas(rows).repartition(3)
    cds = rd.from_pandas(comps)
    expect = {5: 1, 1: 1, 9: 3, 3: 3, 7: 7, 2: 2}
    for force in (False, True):
        out = attach_components(ds, cds, "rid", out_col="ent",
                                num_partitions=2,
                                force_join_path=force).to_pandas()
        assert list(out.columns) == ["rid", "val", "ent"]
        assert dict(zip(out["rid"], out["ent"])) == expect


def test_entity_resolution_both_attach_paths_identical(ray_session):
    """The record-linkage flagship must return identical golden records
    through the broadcast-attach path and the forced distributed
    join path (same invariance pattern as the crawl's salting test)."""
    import __ray_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    bc = entry_mod._entity_resolution_impl(sf, force_join_path=False)
    jn = entry_mod._entity_resolution_impl(sf, force_join_path=True)
    pd.testing.assert_frame_equal(bc, jn)
    assert len(bc) > 0


def test_connected_components_raises_on_no_convergence(ray_session):
    """Exhausting max_iter without convergence must RAISE, not return
    silently wrong labels (min-label needs O(diameter) passes)."""
    import pytest

    from web_crawler_ray.stages.graph import connected_components

    edges = pd.DataFrame({"id_a": list(range(0, 30)),
                          "id_b": list(range(1, 31))})
    with pytest.raises(RuntimeError, match="convergence"):
        # driver_edges_max=0 pins the iterative broadcast path (the
        # driver fast path is exact and cannot fail to converge)
        connected_components(rd.from_pandas(edges), max_iter=3,
                             driver_edges_max=0)


def test_interval_overlap_join_exact(ray_session):
    """Bucketized overlap join equals the brute-force quadratic
    reference — multi-bucket spans deduped by the canonical-bucket
    rule, no dedup shuffle — at two widths and layouts."""
    import numpy as np

    from web_crawler_ray.stages.joins import interval_overlap_join

    rng = np.random.default_rng(7)
    lo = rng.uniform(0, 50, 120)
    spans = rng.uniform(0.1, 9.0, 120)  # many intervals span >1 bucket
    a = pd.DataFrame({"id": np.arange(120, dtype="int64"),
                      "lo": lo, "hi": lo + spans})
    want = set()
    for i in range(120):
        for j in range(120):
            if a.lo[i] <= a.hi[j] and a.lo[j] <= a.hi[i]:
                want.add((i, j))
    for width in (2.0, 5.0):
        ds = rd.from_pandas(a).repartition(4)
        out = interval_overlap_join(ds, ds, "lo", "hi", "lo", "hi",
                                    bucket_width=width).to_pandas()
        got = set(zip(out["id"], out["id_b"]))
        assert got == want


def test_hll_intersect_accuracy(ray_session):
    """HLL inclusion-exclusion intersection estimate within 5% of the
    exact overlap (relative to the UNION size, the sketch's error
    scale), layout-invariant."""
    import numpy as np

    from web_crawler_ray.stages.sketch import hll_intersect

    a = pd.DataFrame({"k": np.arange(0, 30_000, dtype="int64")})
    b = pd.DataFrame({"k": np.arange(20_000, 55_000, dtype="int64")})
    outs = []
    for parts in (2, 9):
        out = hll_intersect(rd.from_pandas(a).repartition(parts),
                            rd.from_pandas(b).repartition(parts), "k")
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    est = int(outs[0]["n_intersect_approx"].iloc[0])
    union = 55_000
    assert abs(est - 10_000) <= 0.05 * union, est


def test_countmin_bounds(ray_session):
    """Count-Min estimates never under-count, stay within the
    2n/width bound for hot keys, and are layout-invariant."""
    import numpy as np

    from web_crawler_ray.stages.sketch import countmin_frequencies

    rng = np.random.default_rng(31)
    keys = (rng.zipf(1.3, 60_000) % 5000).astype("int64")
    df = pd.DataFrame({"k": keys})
    true = df["k"].value_counts()
    queries = true.head(20).index.tolist() + [4999, 4998]
    outs = []
    for parts in (3, 8):
        out = countmin_frequencies(rd.from_pandas(df).repartition(parts),
                                   "k", queries)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    bound = 2 * len(df) / (1 << 14)
    for _, row in outs[0].iterrows():
        t = int(true.get(row["k"], 0))
        assert row["freq_est"] >= t
        assert row["freq_est"] <= t + bound + 1


def test_redact_patterns_counts_and_text(ray_session):
    """Named-pattern scrub: counts on the ORIGINAL text, replacements
    in sorted-name order, nulls treated as empty."""
    from web_crawler_ray.stages.text_quality import redact_patterns

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["call 123 or 456 now", "customer abc paid 9", None],
    })
    out = (redact_patterns(rd.from_pandas(df),
                           {"num": "[0-9]+", "cust": "customer [a-z]+"})
           .to_pandas().sort_values("doc_id"))
    assert out["n_num"].tolist() == [2, 1, 0]
    assert out["n_cust"].tolist() == [0, 1, 0]
    # cust applied before num (sorted names), counts from original
    assert out["text_redacted"].tolist() == [
        "call [NUM] or [NUM] now", "[CUST] paid [NUM]", ""]


def test_repetition_ratio_known_values(ray_session):
    """Hand-checked trigram ratios incl. the <n-token degenerate doc,
    layout-invariant."""
    from web_crawler_ray.stages.text_quality import repetition_ratio

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c a b c a b c",  # 7 trigrams, 3 distinct
                 "x y z w",            # 2 trigrams, distinct
                 "hi"],                # < 3 tokens
    })
    for parts in (1, 3):
        out = (repetition_ratio(rd.from_pandas(df).repartition(parts))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["n_trigrams"].tolist() == [7, 2, 0]
        assert out["rep_ratio"].tolist() == [
            round(1 - 3 / 7, 6), 0.0, 0.0]


def test_decontaminate_distinct_hits(ray_session):
    """Per-doc hit count is over DISTINCT corpus grams; clean docs are
    absent from the output."""
    from web_crawler_ray.stages.text_quality import decontaminate

    bench = pd.DataFrame({"doc_id": [100], "text": ["the red fox runs"]})
    corpus = pd.DataFrame({
        "doc_id": [1, 2, 3],
        # doc 1: 'the red fox' twice (distinct → 1 hit) + 'red fox runs'
        "text": ["the red fox the red fox runs",
                 "nothing shared here at all",
                 "red fox runs"],
    })
    out = (decontaminate(rd.from_pandas(corpus), rd.from_pandas(bench))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 3]
    assert out["n_hits"].tolist() == [2, 1]


def test_cap_per_group_deterministic_and_nested(ray_session):
    """Per-group cap: ≤k rows per group, layout-invariant, and the k=3
    winners are a subset of the k=8 winners (nested-cap consistency)."""
    import numpy as np

    from web_crawler_ray.stages.sampling import cap_per_group

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 300),
        "id": np.arange(300, dtype="int64"),
    })
    outs = []
    for parts in (2, 9):
        out = (cap_per_group(rd.from_pandas(df).repartition(parts),
                             "g", "id", k=8)
               .to_pandas().sort_values(["g", "id"]).reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert (outs[0].groupby("g").size() == 8).all()
    small = (cap_per_group(rd.from_pandas(df), "g", "id", k=3)
             .to_pandas())
    big_ids = set(outs[0]["id"])
    assert set(small["id"]) <= big_ids and len(small) == 9


def test_spec_text_quality_ops(ray_session):
    """The zero-code spec surface covers the round-4 curation ops:
    redact → cap_per_group → hash_split composes end-to-end."""
    from web_crawler_ray.pipelines.spec import build_pipeline

    out = build_pipeline("/root/testdata/sf0.001/documents.parquet", [
        {"op": "redact", "patterns": {"cust": "customer [a-z]+"}},
        {"op": "cap_per_group", "group": "lang", "id": "doc_id", "k": 4},
        {"op": "hash_split", "id": "doc_id"},
        {"op": "select", "columns": ["doc_id", "lang", "n_cust", "split"]},
    ]).to_pandas()
    assert (out.groupby("lang").size() <= 4).all()
    assert set(out["split"]) <= {"train", "test"}
    assert (out["n_cust"] >= 0).all()


class TestSaltedJoin:
    def test_identical_to_plain_join_under_skew(self):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from web_crawler_ray.stages.joins import salted_inner_join

        rng = np.random.default_rng(3)
        # 90% of left rows hit ONE hot key
        keys = np.where(rng.random(5000) < 0.9, 7,
                        rng.integers(0, 50, 5000)).astype(np.int64)
        left = rd.from_pandas(pd.DataFrame(
            {"k": keys, "v": np.arange(5000, dtype=np.int64)}))
        right = rd.from_pandas(pd.DataFrame(
            {"rk": np.arange(50, dtype=np.int64),
             "w": np.arange(50, dtype=np.int64) * 10}))
        out = salted_inner_join(left, right, on="k", right_on="rk",
                                n_salts=8).to_pandas()
        ref = (pd.DataFrame({"k": keys, "v": np.arange(5000)})
               .merge(pd.DataFrame({"k": np.arange(50),
                                    "w": np.arange(50) * 10}), on="k"))
        out = out.sort_values(["k", "v"]).reset_index(drop=True)
        ref = ref.sort_values(["k", "v"]).reset_index(drop=True)
        assert len(out) == len(ref)
        assert (out[["k", "v", "w"]].to_numpy()
                == ref[["k", "v", "w"]].to_numpy()).all()

    def test_hot_key_spreads_over_salts(self):
        import numpy as np
        import pandas as pd

        # the salting primitive itself: one hot key's rows get >1 salt
        df = pd.DataFrame({"k": np.full(1000, 7),
                           "v": np.arange(1000)})
        h = pd.util.hash_pandas_object(df, index=False).to_numpy()
        assert len(np.unique(h % 8)) == 8


def test_spec_packing_and_gate_ops(ray_session):
    """Spec surface round-4b: dedup_blocks → quantile_gate → pack
    compose end-to-end, with column pruning at the read."""
    from web_crawler_ray.pipelines.spec import build_pipeline

    out = build_pipeline("/root/testdata/sf0.001/documents.parquet", [
        {"op": "quantile_gate", "column": "n_chars", "q": 0.5},
        {"op": "chunk", "text_col": "text", "id": "doc_id",
         "window": 16, "stride": 16},
    ]).to_pandas()
    assert {"doc_id", "chunk_idx", "n_tokens", "chunk_text"} <= set(out.columns)
    assert (out["n_tokens"] <= 16).all() and len(out) > 0

    packed = build_pipeline("/root/testdata/sf0.001/documents.parquet", [
        {"op": "pack", "seq_len": 128},
    ]).to_pandas()
    full = packed.groupby("chunk_id")["n_tokens"].sum().sort_index()
    assert (full.iloc[:-1] == 128).all()

    scrubbed = build_pipeline("/root/testdata/sf0.001/documents.parquet", [
        {"op": "dedup_blocks", "block": 3, "min_count": 2},
    ]).to_pandas()
    assert (scrubbed["n_dup_blocks"] <= scrubbed["n_blocks"]).all()

    joined = build_pipeline("/root/testdata/sf0.001/lineitem.parquet", [
        {"op": "salted_join", "right": "/root/testdata/sf0.001/supplier.parquet",
         "on": "l_suppkey", "right_on": "s_suppkey",
         "right_columns": ["s_suppkey", "s_nationkey"], "n_salts": 4},
        {"op": "groupby_agg", "keys": ["s_nationkey"],
         "aggs": {"n": ["count", None]}},
    ]).to_pandas()
    assert joined["n"].sum() > 0 and len(joined) >= 5


def test_pagerank_paths_match_and_sum_to_one(ray_session):
    """PageRank broadcast vs join path: identical rounded scores on the
    same graph, and total mass stays 1 (dangling redistribution)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from web_crawler_ray.stages.graph import pagerank

    rng = np.random.default_rng(11)
    edges = pd.DataFrame({
        "src": rng.integers(0, 40, 300).astype(np.int64),
        "dst": rng.integers(20, 70, 300).astype(np.int64),  # 40-69 dangle
    })
    ds = rd.from_pandas(edges).repartition(4)
    fast = pagerank(ds, iterations=3).to_pandas().sort_values(
        "node").reset_index(drop=True)
    slow = pagerank(rd.from_pandas(edges).repartition(4), iterations=3,
                    force_join_path=True).to_pandas().sort_values(
        "node").reset_index(drop=True)
    assert (fast["node"] == slow["node"]).all()
    assert np.allclose(fast["score"], slow["score"], atol=1e-9)
    assert abs(fast["score"].sum() - 1.0) < 1e-3  # rounded at 6 digits


def test_spec_hopping_window_and_wds(ray_session, tmp_path):
    """The declarative surface drives the new ops end-to-end: hopping
    window over events, then a wds_write whose returned manifest rows
    account for every input row."""
    out = build_pipeline(
        "/root/testdata/sf0.001/events.parquet",
        [{"op": "hopping_window", "ts_col": "ts",
          "stride_us": 21_600_000_000, "width_us": 86_400_000_000,
          "aggs": {"n": ["count", None]}}],
    ).to_pandas()
    import pyarrow.parquet as pq
    n_events = pq.read_metadata("/root/testdata/sf0.001/events.parquet").num_rows
    assert out["n"].sum() == 4 * n_events  # each event in exactly 4 windows

    root = str(tmp_path / "wds_spec")
    man = build_pipeline(
        "/root/testdata/sf0.001/documents.parquet",
        [{"op": "with_column", "name": "key", "expr": "doc_id"},
         {"op": "wds_write", "root": root, "key": "key", "payload": "text",
          "ext": "txt", "meta_cols": ["lang"], "max_shard_bytes": 1 << 18}],
    ).to_pandas()
    n_docs = pq.read_metadata("/root/testdata/sf0.001/documents.parquet").num_rows
    assert man["rows"].sum() == n_docs
    from web_crawler_ray.io.wds import read_wds_shards
    assert read_wds_shards(root).count() == n_docs


def test_epoch_shuffle_plan_properties(ray_session):
    """Positions are dense 0..n-1 per shard, the plan covers every id
    exactly once, is invariant to partition count, and a different
    seed produces a different permutation."""
    import ray.data as rd

    from web_crawler_ray.stages.sampling import epoch_shuffle_plan

    ids = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64)})

    def plan(nparts, seed):
        out = epoch_shuffle_plan(rd.from_pandas(ids).repartition(3),
                                 "doc_id", num_shards=4, seed=seed,
                                 num_partitions=nparts).to_pandas()
        return out.sort_values(["shard", "pos"]).reset_index(drop=True)

    p1 = plan(4, seed=1)
    assert len(p1) == 200 and set(p1["doc_id"]) == set(range(200))
    for _, g in p1.groupby("shard"):
        assert g["pos"].tolist() == list(range(len(g)))
    # cluster-size invariance: partition count doesn't change the plan
    p2 = plan(9, seed=1)
    pd.testing.assert_frame_equal(p1, p2)
    # a new seed actually reshuffles
    p3 = plan(4, seed=2)
    assert not p1.equals(p3)


def test_mixture_plan_nested_and_expected_share(ray_session):
    """floor+Bernoulli repetition: weights 0/0.5/1/2.25 give exact
    floors, the fractional keeps are nested (raising a weight never
    drops a doc), and the mean matches the recipe within hash noise."""
    import ray.data as rd

    from web_crawler_ray.stages.sampling import mixture_plan

    df = pd.DataFrame({"doc_id": np.arange(4000, dtype=np.int64),
                       "src": ["a", "b", "c", "d"] * 1000})
    ds = rd.from_pandas(df).repartition(4)

    def reps(weights):
        out = mixture_plan(ds, "doc_id", "src", weights).to_pandas()
        return out.set_index("doc_id").sort_index()

    r = reps({"a": 0.0, "b": 0.5, "c": 1.0, "d": 2.25})
    by = r.groupby("src")["n_repeats"]
    assert by.max()["a"] == 0
    assert set(r[r["src"] == "b"]["n_repeats"]) == {0, 1}
    assert by.min()["c"] == 1 and by.max()["c"] == 1
    assert set(r[r["src"] == "d"]["n_repeats"]) <= {2, 3}
    assert abs(by.mean()["b"] - 0.5) < 0.1
    assert abs(by.mean()["d"] - 2.25) < 0.1
    # nested: weight 0.25 keeps a subset of weight 0.5's keeps
    lo = reps({"b": 0.25})
    kept_lo = set(lo[(lo["src"] == "b") & (lo["n_repeats"] > 0)].index)
    kept_hi = set(r[(r["src"] == "b") & (r["n_repeats"] > 0)].index)
    assert kept_lo <= kept_hi


def test_spec_analytics_ops(ray_session):
    """Declarative lm_score → quantile_gate chain and gini op."""
    out = build_pipeline(
        "/root/testdata/sf0.001/documents.parquet",
        [{"op": "lm_score", "text_col": "text", "id": "doc_id"},
         {"op": "quantile_gate", "column": "logprob", "q": 0.25,
          "keep": "ge"}],
    ).to_pandas()
    assert {"doc_id", "n_tokens", "logprob"} <= set(out.columns)
    assert 0 < len(out) < 500

    g = build_pipeline(
        "/root/testdata/sf0.001/events.parquet",
        [{"op": "gini", "key": "user_id"}],
    ).to_pandas()
    assert 0.0 <= g["gini"].iloc[0] < 1.0

    w = build_pipeline(
        "/root/testdata/sf0.001/events.parquet",
        [{"op": "window_distinct", "ts_col": "ts", "key": "user_id",
          "stride_us": 21_600_000_000, "width_us": 86_400_000_000}],
    ).to_pandas()
    assert (w["n_distinct"] > 0).all() and len(w) == 123


def test_lancelike_compaction(tmp_path):
    """Compaction merges small adjacent fragments, preserves the rows
    and read order, passes large fragments through, and is idempotent."""
    import pyarrow as pa

    root = str(tmp_path / "cds")
    for i in range(6):
        t = pa.table({"k": pa.array([i] * (3 + i)), "v": pa.array(range(3 + i))})
        lancelike.write_fragment(root, t, i, 0, f"fp-{i}")
    big = pa.table({"k": pa.array([99] * 50), "v": pa.array(range(50))})
    lancelike.write_fragment(root, big, 9, 0, "fp-big")
    before = lancelike.read_dataset(root)
    assert before.num_rows == sum(3 + i for i in range(6)) + 50

    man = lancelike.compact(root, target_rows=10)
    names = sorted(man["fragments"])
    assert any(n.startswith("compact-") for n in names)
    # the 50-row fragment is already >= target: untouched
    assert "part-00009-r000" in man["fragments"]
    after = lancelike.read_dataset(root)
    assert after.num_rows == before.num_rows
    # rows preserved (order may regroup across fragments; compare sorted)
    import pandas as pd
    pd.testing.assert_frame_equal(
        before.to_pandas().sort_values(["k", "v"]).reset_index(drop=True),
        after.to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    # merged sources deleted from disk
    assert not os.path.exists(os.path.join(root, "part-00000-r000.parquet"))
    # idempotent: second pass changes nothing but the version
    man2 = lancelike.compact(root, target_rows=10)
    assert sorted(man2["fragments"]) == names
    assert lancelike.read_dataset(root).num_rows == before.num_rows


def test_compaction_preserves_resume_skip(tmp_path):
    """After compaction, completed_fragment still reports merged-away
    (partition, round) fragments as done — a resumed run must not
    re-commit rows that now live inside a merged file."""
    import pyarrow as pa

    root = str(tmp_path / "cds2")
    for i in range(4):
        t = pa.table({"v": pa.array(range(2))})
        lancelike.write_fragment(root, t, i, 0, f"fp-{i}")
    lancelike.compact(root, target_rows=5)
    for i in range(4):
        assert lancelike.completed_fragment(root, i, 0, f"fp-{i}")
        assert not lancelike.completed_fragment(root, i, 0, "other-fp")
    assert lancelike.read_dataset(root).num_rows == 8


def test_dir_fragment_file_list_and_in_dir_compaction(tmp_path):
    """Dir fragments record their committed file list (stray files from
    crashed attempts are invisible to readers); in-dir compaction merges
    small files and swaps the list atomically."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "dds")
    os.makedirs(os.path.join(root, "round-000"))
    for i in range(5):
        pq.write_table(pa.table({"v": pa.array([i] * 4)}),
                       os.path.join(root, "round-000", f"part-{i}.parquet"))
    lancelike.commit_dir_fragment(root, "round-000", "round-000", 20, "fp")
    # a stray file landing AFTER commit is not part of the fragment
    pq.write_table(pa.table({"v": pa.array([99] * 100)}),
                   os.path.join(root, "round-000", "stray.parquet"))
    assert lancelike.read_dataset(root).num_rows == 20

    man = lancelike.compact(root, target_rows=10)
    files = man["fragments"]["round-000"]["files"]
    assert any(f.startswith("merged-") for f in files)
    assert "stray.parquet" not in files
    assert lancelike.read_dataset(root).num_rows == 20
    # replaced small files were deleted; the stray remains (orphan)
    left = sorted(os.listdir(os.path.join(root, "round-000")))
    assert "part-0.parquet" not in left and "stray.parquet" in left
    # resume fingerprint still matches for the dir fragment
    assert lancelike.read_manifest(root)["fragments"]["round-000"][
        "input_fingerprint"] == "fp"


def test_spec_winsorize(ray_session):
    out = build_pipeline(
        "/root/testdata/sf0.001/events.parquet",
        [{"op": "select", "columns": ["event_id", "value"]},
         {"op": "winsorize", "column": "value", "lo_q": 0.1, "hi_q": 0.9,
          "out": "value_w"}],
    ).to_pandas()
    import duckdb
    want = duckdb.sql("""
        WITH t AS (SELECT quantile_disc(value, 0.1) lo,
                          quantile_disc(value, 0.9) hi
                   FROM '/root/testdata/sf0.001/events.parquet')
        SELECT least(greatest(value, lo), hi) AS value_w
        FROM '/root/testdata/sf0.001/events.parquet', t ORDER BY event_id
    """).df()
    got = out.sort_values("event_id").reset_index(drop=True)
    assert (got["value_w"].to_numpy() == want["value_w"].to_numpy()).all()


def test_spec_islands_and_rank(ray_session):
    out = build_pipeline(
        "/root/testdata/sf0.001/events.parquet",
        [{"op": "filter", "expr": "event_type == 'click'"},
         {"op": "islands", "id": "event_id"}],
    ).to_pandas()
    assert (out["end_id"] >= out["start_id"]).all()
    assert out["n"].sum() == 210  # click count at sf0.001

    r = build_pipeline(
        "/root/testdata/sf0.001/events.parquet",
        [{"op": "rank_transform", "column": "value", "tie": "event_id"}],
    ).to_pandas()
    assert len(r) == 1000
    assert r["pct_rank"].min() == 0.0 and r["pct_rank"].max() == 1.0


def test_spec_stats_ops(ray_session):
    # assoc: contingency over documents lang x source
    out = build_pipeline(
        "/root/testdata/sf0.001/documents.parquet",
        [{"op": "select", "columns": ["lang", "source"]},
         {"op": "assoc", "a": "lang", "b": "source"}],
    ).to_pandas()
    assert {"lang", "source", "n", "pmi", "chi2_term"} <= set(out.columns)
    assert out["n"].sum() == 500  # docs at sf0.001

    # mad_outliers + ks_drift + weighted_median + sample_k smoke through
    # the compiler (kernel correctness is pinned in tests/test_stats.py)
    m = build_pipeline(
        "/root/testdata/sf0.001/events.parquet",
        [{"op": "select", "columns": ["event_type", "value"]},
         {"op": "mad_outliers", "key": "event_type", "column": "value"}],
    ).to_pandas()
    assert {"med", "mad", "n_out"} <= set(m.columns) and len(m) == 5

    s = build_pipeline(
        "/root/testdata/sf0.001/documents.parquet",
        [{"op": "sample_k", "id": "doc_id", "k": 7}],
    ).to_pandas()
    assert len(s) == 7 and s["doc_id"].is_unique

    w = build_pipeline(
        "/root/testdata/sf0.001/lineitem.parquet",
        [{"op": "select",
          "columns": ["l_returnflag", "l_extendedprice", "l_quantity"]},
         {"op": "weighted_median", "key": "l_returnflag",
          "column": "l_extendedprice", "weight": "l_quantity"}],
    ).to_pandas()
    assert len(w) == 3 and (w["wmedian"] > 0).all()


def test_winnow_fingerprints_reference(ray_session):
    """Batch window-min kernel equals the per-doc reference (explicit
    sliding min over the doc's own gram list), and the winnowing
    guarantee holds: docs sharing a run of >= w+k-1 tokens share a
    fingerprint. Layout-invariant across block counts."""
    from web_crawler_ray.functions.text import TOKEN_RE
    from web_crawler_ray.stages.text_quality import winnow_fingerprints

    k, w = 3, 4
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 25)))
             for _ in range(40)]
    shared = "s1 s2 s3 s4 s5 s6"  # w+k-1 = 6 tokens
    texts[5] = texts[5] + " " + shared
    texts[17] = shared + " " + texts[17]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})

    def ref_doc(t):
        toks = TOKEN_RE.findall(t or "")
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        return {min(grams[i:i + w]) for i in range(len(grams) - w + 1)}

    expect = {(i, fp) for i, t in enumerate(texts) for fp in ref_doc(t)}
    for parts in (1, 4):
        out = winnow_fingerprints(
            rd.from_pandas(df).repartition(parts), k=k, w=w).to_pandas()
        got = set(zip(out["doc_id"], out["fp"]))
        assert got == expect
    shared5 = {fp for i, fp in expect if i == 5}
    shared17 = {fp for i, fp in expect if i == 17}
    assert shared5 & shared17  # the guarantee


def test_winnow_dup_pairs_counts(ray_session):
    """Pair multiplicity is the number of DISTINCT shared fingerprints
    (repeats inside one doc count once) and min_shared gates."""
    from web_crawler_ray.stages.text_quality import winnow_dup_pairs

    a = "p q r s t u v w"          # long shared run with b
    b = "p q r s t u v w x y"
    c = "p q r s t u"              # shares exactly the first window min
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [a, b, c]})
    out = (winnow_dup_pairs(rd.from_pandas(df), k=3, w=4, min_shared=2)
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert [(r.id_a, r.id_b) for r in out.itertuples()] == [(1, 2)]
    assert (out["n_shared"] >= 2).all()
    out1 = (winnow_dup_pairs(rd.from_pandas(df), k=3, w=4, min_shared=1)
            .to_pandas())
    assert {(r.id_a, r.id_b) for r in out1.itertuples()} >= {(1, 2), (1, 3), (2, 3)}


def test_spec_winnow_and_zorder(ray_session):
    pairs = build_pipeline(
        "/root/testdata/sf0.001/documents.parquet",
        [{"op": "winnow_pairs", "k": 3, "w": 4, "min_shared": 1}],
    ).to_pandas()
    assert list(pairs.columns) == ["id_a", "id_b", "n_shared"]
    assert (pairs["id_a"] < pairs["id_b"]).all()

    z = build_pipeline(
        "/root/testdata/sf0.001/orders.parquet",
        [{"op": "select", "columns": ["o_orderkey", "o_custkey"]},
         {"op": "zorder", "a": "o_custkey", "b": "o_orderkey",
          "num_partitions": 8, "bits": 8}],
    ).to_pandas()
    assert {"zkey", "zpart"} <= set(z.columns)
    assert z["zpart"].between(0, 7).all()


def test_snapshot_diff_classification(ray_session):
    """added/removed/changed/unchanged classification on a hand-built
    pair of snapshots; unchanged ids are absent from the output."""
    from web_crawler_ray.stages.dedup import snapshot_diff

    old = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                        "text": ["a", "b", "c", ""]})
    new = pd.DataFrame({"doc_id": [2, 3, 4, 5],
                        "text": ["b", "C", "", "e"]})
    out = (snapshot_diff(rd.from_pandas(old), rd.from_pandas(new))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(zip(out["doc_id"], out["status"])) == [
        (1, "removed"), (3, "changed"), (5, "added")]


def test_window_dedup_first_wins(ray_session):
    """Exactly one survivor per (key, window); min-ts then min-tie
    wins; windows are tumbling (boundary event starts a new window)."""
    from web_crawler_ray.stages.windows import window_dedup

    ts = pd.to_datetime([
        "2024-01-01 00:00:05", "2024-01-01 00:00:30",  # u1 window 0
        "2024-01-01 00:01:00",                          # u1 window 1 (boundary)
        "2024-01-01 00:00:10", "2024-01-01 00:00:10",  # u2 tie on ts
    ])
    df = pd.DataFrame({"u": [1, 1, 1, 2, 2], "ts": ts,
                       "eid": [11, 10, 12, 21, 20]})
    out = (window_dedup(rd.from_pandas(df).repartition(3), "u", "ts",
                        60_000_000, "eid")
           .to_pandas().sort_values("eid").reset_index(drop=True))
    assert out["eid"].tolist() == [11, 12, 20]  # ts wins, then tie by eid


def test_apply_changes_semantics(ray_session):
    """Last change per id wins; delete removes; upsert inserts or
    replaces; untouched base rows pass through."""
    from web_crawler_ray.stages.dedup import apply_changes

    base = pd.DataFrame({"doc_id": [1, 2, 3, 4], "v": [10, 20, 30, 40]})
    ch = pd.DataFrame({
        "doc_id": [2, 2, 3, 9],
        "op": ["upsert", "delete", "upsert", "upsert"],
        "seq": [1, 2, 1, 1],
        "v": [99, 0, 33, 90],
    })
    out = (apply_changes(rd.from_pandas(base), rd.from_pandas(ch),
                         id_col="doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(zip(out["doc_id"], out["v"])) == [
        (1, 10), (3, 33), (4, 40), (9, 90)]  # 2 deleted (seq 2 > 1)


def test_spec_round4_ops(ray_session):
    dedup = build_pipeline(
        "/root/testdata/sf0.001/events.parquet",
        [{"op": "window_dedup", "key": "user_id", "ts_col": "ts",
          "width_us": 3_600_000_000, "tie": "event_id"}],
    ).to_pandas()
    assert not dedup.duplicated(subset=["user_id", "w_start"]).any()

    hist = build_pipeline(
        "/root/testdata/sf0.001/events.parquet",
        [{"op": "equidepth_hist", "column": "value", "k": 5}],
    ).to_pandas()
    assert hist["n"].sum() == 1000 and len(hist) == 5

    skew = build_pipeline(
        "/root/testdata/sf0.001/events.parquet",
        [{"op": "skew_report", "key": "event_type"}],
    ).to_pandas()
    assert (skew["n_salts"] >= 1).all()

    tri = build_pipeline(
        "/root/testdata/sf0.001/lineitem.parquet",
        [{"op": "cooccur_edges", "group": "l_orderkey", "item": "l_partkey"},
         {"op": "triangle_count"}],
    ).to_pandas()
    assert tri["n_edges"].iloc[0] > 0


def test_bucketed_join_matches_merge(ray_session, tmp_path):
    import ray.data as rd

    from web_crawler_ray.stages.joins import bucketed_join, bucketed_write

    rng = np.random.default_rng(7)
    left = pd.DataFrame({"k": rng.integers(0, 50, 300),
                         "lv": np.arange(300)})
    right = pd.DataFrame({"k2": np.arange(0, 60),
                          "rv": np.arange(0, 60) * 10})
    lp = bucketed_write(rd.from_pandas(left), "k", 8, str(tmp_path / "l"))
    rp = bucketed_write(rd.from_pandas(right), "k2", 8, str(tmp_path / "r"))
    got = (bucketed_join(lp, rp, on="k", right_on="k2", num_buckets=8)
           .to_pandas().sort_values(["lv"]).reset_index(drop=True))
    exp = (left.merge(right, left_on="k", right_on="k2")
           .sort_values(["lv"]).reset_index(drop=True))
    assert got[["k", "lv", "rv"]].equals(exp[["k", "lv", "rv"]])


def test_bucketed_write_idempotent_by_fingerprint(ray_session, tmp_path):
    import os

    import ray.data as rd

    from web_crawler_ray.stages.joins import bucketed_write

    df = pd.DataFrame({"k": [1, 2, 3], "v": [1, 2, 3]})
    p = bucketed_write(rd.from_pandas(df), "k", 4, str(tmp_path / "t"),
                       fingerprint="fp1")
    mtimes = {f: os.path.getmtime(os.path.join(dp, f))
              for dp, _dn, fn in os.walk(p) for f in fn}
    bucketed_write(rd.from_pandas(df), "k", 4, str(tmp_path / "t"),
                   fingerprint="fp1")
    mtimes2 = {f: os.path.getmtime(os.path.join(dp, f))
               for dp, _dn, fn in os.walk(p) for f in fn}
    assert mtimes == mtimes2  # second build skipped entirely


def test_zonemap_prunes_files_and_stays_exact(ray_session, tmp_path):
    import ray.data as rd

    from web_crawler_ray.stages.layout import zonemap_prune, zonemap_scan

    # range-clustered layout: sorted on x, many files
    df = pd.DataFrame({"x": np.arange(1000), "y": np.arange(1000) % 7})
    (rd.from_pandas(df).repartition(10).sort("x")
     .write_parquet(str(tmp_path / "z")))
    kept, total = zonemap_prune(str(tmp_path / "z"), "x", 100, 199)
    assert total >= 5 and len(kept) < total  # the footer stats pruned
    got = (zonemap_scan(str(tmp_path / "z"), "x", 100, 199)
           .to_pandas().sort_values("x").reset_index(drop=True))
    exp = df[(df.x >= 100) & (df.x <= 199)].reset_index(drop=True)
    assert got["x"].tolist() == exp["x"].tolist()
    assert got["y"].tolist() == exp["y"].tolist()


def test_zonemap_scan_raises_when_all_pruned(ray_session, tmp_path):
    import pytest as _pytest
    import ray.data as rd

    from web_crawler_ray.stages.layout import zonemap_scan

    df = pd.DataFrame({"x": np.arange(100)})
    rd.from_pandas(df).write_parquet(str(tmp_path / "z2"))
    with _pytest.raises(ValueError, match="pruned every file"):
        zonemap_scan(str(tmp_path / "z2"), "x", 10_000, 20_000)


def test_spec_profile_and_budget_ops(ray_session):
    """Spec-compiler round-4 ops: benford / pmi_bigrams / chi2_terms /
    token_budget compile and run over the column-pruned read."""
    sf = "/root/testdata/sf0.001"
    ben = build_pipeline(
        f"{sf}/lineitem.parquet",
        [{"op": "benford", "column": "l_extendedprice"}],
    ).to_pandas()
    assert set(ben.columns) == {"digit", "n_vals", "share", "expected"}
    assert ben["digit"].between(1, 9).all()

    pmi = build_pipeline(
        f"{sf}/documents.parquet",
        [{"op": "pmi_bigrams", "k": 5, "min_count": 2}],
    ).to_pandas()
    assert len(pmi) == 5 and {"bigram", "n", "pmi"} <= set(pmi.columns)

    chi = build_pipeline(
        f"{sf}/documents.parquet",
        [{"op": "chi2_terms", "label": "lang", "terms": ["table", "query"],
          "k": 4}],
    ).to_pandas()
    assert len(chi) == 4 and (chi["chi2"] >= 0).all()

    sel = build_pipeline(
        f"{sf}/documents.parquet",
        [{"op": "token_budget", "id": "doc_id", "quality": "n_chars",
          "tokens": "n_chars", "budget": 50_000}],
    ).to_pandas()
    # greedy prefix by n_chars desc: replay
    ref = pd.read_parquet(f"{sf}/documents.parquet",
                          columns=["doc_id", "n_chars"])
    ref = ref.sort_values(["n_chars", "doc_id"], ascending=[False, True],
                          kind="mergesort")
    ref = ref[ref["n_chars"].cumsum() <= 50_000]
    assert sorted(sel["doc_id"]) == sorted(ref["doc_id"])


def test_read_evolved_union_schema(ray_session, tmp_path):
    import ray.data as rd

    from web_crawler_ray.io.evolve import evolved_schema, read_evolved

    v1 = pd.DataFrame({"id": [1, 2], "a": [10, 20]})
    v2 = pd.DataFrame({"id": [3], "a": [30], "b": ["x"]})
    rd.from_pandas(v1).write_parquet(str(tmp_path / "v1"))
    rd.from_pandas(v2).write_parquet(str(tmp_path / "v2"))

    sch = evolved_schema([str(tmp_path / "v1"), str(tmp_path / "v2")])
    assert set(sch.names) == {"id", "a", "b"}

    # default backfill + lineage tag
    out = (read_evolved([str(tmp_path / "v1"), str(tmp_path / "v2")],
                        defaults={"b": "?"}, source_col="src")
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert out["b"].tolist() == ["?", "?", "x"]
    assert out["src"].tolist() == [0, 0, 1]

    # NULL backfill when no default
    out2 = (read_evolved([str(tmp_path / "v1"), str(tmp_path / "v2")])
            .to_pandas().sort_values("id").reset_index(drop=True))
    assert out2["b"].isna().tolist() == [True, True, False]


def test_bigram_lm_hand_case(ray_session):
    from web_crawler_ray.stages.text_rank import bigram_lm_score

    # corpus: one doc "a b a b", one doc "a"
    # unigrams: a=3, b=2, N=5; bigrams: "a b"x2, "b a"x1; heads: a->2, b->1
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a b a b", "a"]})
    out = (bigram_lm_score(rd.from_pandas(df), "text", "doc_id", lam=0.7)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # doc 1 has <2 tokens -> dropped
    assert out["doc_id"].tolist() == [0]
    p_ab = 0.7 * (2 / 2.0) + 0.3 * (2 / 5.0)   # P(b|a), P(b)
    p_ba = 0.7 * (1 / 1.0) + 0.3 * (3 / 5.0)   # P(a|b), P(a)
    exp = (np.log(p_ab) + np.log(p_ba) + np.log(p_ab)) / 3.0
    assert out["n_bigrams"].tolist() == [3]
    assert abs(out["lm_score"].iloc[0] - round(exp, 6)) <= 1e-6


def test_cdc_chunk_stats_reference_and_edit_stability(ray_session):
    from web_crawler_ray.stages.text_quality import cdc_chunk_stats

    k, base, mod, mask = 4, 31, 1 << 20, 63

    def naive_cuts(t):
        cuts = 0
        for i in range(len(t) - k + 1):
            h = 0
            for j, ch in enumerate(t[i:i + k]):
                h = (h + ord(ch) * pow(base, k - 1 - j, mod)) % mod
            if h & mask == 0:
                cuts += 1
        return cuts

    rng = np.random.default_rng(11)
    texts = ["".join(chr(97 + c) for c in rng.integers(0, 26, n))
             for n in (0, 1, 3, 4, 50, 400, 1000)]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = (cdc_chunk_stats(rd.from_pandas(df), "text", "doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_cuts"].tolist() == [naive_cuts(t) for t in texts]
    assert out["n_chunks"].tolist() == [
        naive_cuts(t) + (1 if t else 0) for t in texts]

    # content-defined property: an edit at the front shifts ALL
    # fixed-width boundaries but CDC cut positions after the edit
    # window are unchanged (counts differ by at most the cuts in the
    # perturbed neighborhood)
    t = texts[-1]
    edited = "zzz" + t
    base_cuts = naive_cuts(t)
    edited_cuts = naive_cuts(edited)
    # the suffix t[3:] contributes identical cut positions in both
    assert abs(edited_cuts - base_cuts) <= k + 3


def test_spec_cdc_and_bigram_ops(ray_session):
    sf = "/root/testdata/sf0.001"
    cdc = build_pipeline(
        f"{sf}/documents.parquet",
        [{"op": "cdc_chunks", "mask": 63}],
    ).to_pandas()
    assert {"doc_id", "n_chars", "n_cuts", "n_chunks"} <= set(cdc.columns)
    assert (cdc["n_chunks"] >= 1).all()

    lm = build_pipeline(
        f"{sf}/documents.parquet",
        [{"op": "bigram_lm"}, {"op": "limit", "n": 5}],
    ).to_pandas()
    assert {"doc_id", "n_bigrams", "lm_score"} <= set(lm.columns)
    assert (lm["lm_score"] <= 0).all()


def test_bfs_depth_paths_agree_and_semantics(ray_session):
    """bfs_depth: driver and broadcast paths return identical depths;
    depths are true shortest-hop counts (a shortcut beats the chain);
    unreachable nodes are omitted; edge-only seeds still appear at 0."""
    import numpy as np

    from web_crawler_ray.stages.graph import bfs_depth

    # chain 0→1→…→6 plus shortcut 0→5; island 50→51 (unreachable);
    # seed 99 touches no edge (still depth 0 in the output)
    edges = pd.DataFrame({
        "src": np.array([0, 1, 2, 3, 4, 5, 0, 50], dtype="int64"),
        "dst": np.array([1, 2, 3, 4, 5, 6, 5, 51], dtype="int64")})
    expect = {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 1, 6: 2, 99: 0}
    for parts in (1, 3):
        ds = rd.from_pandas(edges).repartition(parts)
        drv = (bfs_depth(ds, [0, 99]).to_pandas()
               .set_index("node")["depth"].to_dict())
        bc = (bfs_depth(ds, [0, 99], driver_edges_max=0).to_pandas()
              .set_index("node")["depth"].to_dict())
        assert drv == expect
        assert bc == expect


def test_bfs_depth_guards(ray_session):
    """Empty seed set raises; max_iter exhaustion on the broadcast
    path raises instead of returning silently-wrong depths."""
    import pytest as _pytest

    from web_crawler_ray.stages.graph import bfs_depth

    edges = rd.from_pandas(pd.DataFrame(
        {"src": [0, 1, 2, 3], "dst": [1, 2, 3, 4]}))
    with _pytest.raises(ValueError, match="empty seed"):
        bfs_depth(edges, [])
    with _pytest.raises(RuntimeError, match="no convergence"):
        bfs_depth(edges, [0], driver_edges_max=0, max_iter=2)


def test_mirror_hosts_exact_sets(ray_session):
    """mirror_hosts on hand-built sets: jaccard values exact, the
    boilerplate cap excludes over-shared contents from pairs AND set
    sizes, sub-threshold pairs are dropped."""
    import numpy as np

    from web_crawler_ray.stages.dedup import mirror_hosts

    rows = []
    # hosts 1 & 2: contents {10,11,12,13} vs {10,11,12,14} → J = 3/5
    rows += [(1, c) for c in (10, 11, 12, 13)]
    rows += [(2, c) for c in (10, 11, 12, 14)]
    # host 3 shares one content with host 1 → J = 1/7 (dropped at 0.5)
    rows += [(3, c) for c in (13, 30, 31, 32)]
    # boilerplate content 999 on every host incl. 4 & 5 (cap = 3 hosts)
    rows += [(h, 999) for h in (1, 2, 3, 4, 5)]
    df = pd.DataFrame(rows, columns=["host", "content"]).astype("int64")
    out = (mirror_hosts(rd.from_pandas(df).repartition(3),
                        min_jaccard=0.5, max_hosts_per_content=3)
           .to_pandas().sort_values(["host_a", "host_b"])
           .reset_index(drop=True))
    assert out[["host_a", "host_b"]].values.tolist() == [[1, 2]]
    assert out.loc[0, "shared"] == 3
    assert out.loc[0, "n_a"] == 4 and out.loc[0, "n_b"] == 4  # no 999
    assert out.loc[0, "jaccard"] == 0.6


def test_resolve_redirects_paths_agree(ray_session):
    """resolve_redirects: driver and join paths return identical
    terminal targets and hop counts on chains, branches-into-shared
    tails, self-redirects, and chain-ends-on-self-redirect."""
    import numpy as np

    from web_crawler_ray.stages.graph import resolve_redirects

    # chain 10→11→12→13 (13 terminal, not a source); 20→12 joins the
    # tail; 30→30 self-redirect; 40→30 ends ON a self-redirect
    red = pd.DataFrame({
        "src": np.array([10, 11, 12, 20, 30, 40], dtype="int64"),
        "dst": np.array([11, 12, 13, 12, 30, 30], dtype="int64")})
    expect = {10: (13, 3), 11: (13, 2), 12: (13, 1), 20: (13, 2),
              30: (30, 1), 40: (30, 1)}
    for parts in (1, 3):
        ds = rd.from_pandas(red).repartition(parts)
        for kw in ({}, {"force_join_path": True, "num_partitions": 4}):
            out = resolve_redirects(ds, **kw).to_pandas()
            got = {int(r.src): (int(r.target), int(r.n_hops))
                   for r in out.itertuples()}
            assert got == expect, kw


def test_resolve_redirects_guards(ray_session):
    """Cycles raise on BOTH paths — including even-length cycles,
    which pointer doubling collapses to fixpoints rather than failing
    to converge; duplicate sources raise."""
    import pytest as _pytest

    from web_crawler_ray.stages.graph import resolve_redirects

    for cyc in ([[1, 2], [2, 1]],                 # 2-cycle: converges fake
                [[1, 2], [2, 3], [3, 1]],         # 3-cycle: never converges
                [[0, 1], [1, 2], [2, 1]]):        # tail INTO a 2-cycle
        ds = rd.from_pandas(pd.DataFrame(
            {"src": [r[0] for r in cyc], "dst": [r[1] for r in cyc]}))
        with _pytest.raises(RuntimeError, match="cycle"):
            resolve_redirects(ds)
        with _pytest.raises(RuntimeError, match="cycle"):
            resolve_redirects(ds, force_join_path=True, num_partitions=2,
                              max_iter=8)

    dup = rd.from_pandas(pd.DataFrame({"src": [1, 1], "dst": [2, 3]}))
    with _pytest.raises(ValueError, match="duplicate source"):
        resolve_redirects(dup)
    with _pytest.raises(Exception, match="duplicate source"):
        resolve_redirects(dup, force_join_path=True,
                          num_partitions=2).to_pandas()


def test_resolve_redirects_random_vs_brute(ray_session):
    """Pointer doubling equals brute-force chain following on seeded
    random acyclic tables (dst < src ⇒ acyclic; a sprinkle of
    self-redirects), including hop counts."""
    import numpy as np

    from web_crawler_ray.stages.graph import resolve_redirects

    rng = np.random.default_rng(7)
    for trial in range(8):
        n = int(rng.integers(1, 120))
        srcs = rng.choice(np.arange(1, 500), size=n, replace=False)
        dsts = np.array([s if s % 11 == 0 else int(rng.integers(0, s))
                         for s in srcs], dtype=np.int64)
        red = pd.DataFrame({"src": srcs.astype("int64"), "dst": dsts})
        table = dict(zip(red["src"].tolist(), red["dst"].tolist()))
        expect = {}
        for s, d in table.items():
            cur, hops = d, 1
            while cur in table and table[cur] != cur:
                cur, hops = table[cur], hops + 1
            expect[s] = (cur, hops)
        kw = ({"force_join_path": True, "num_partitions": 3}
              if trial % 4 == 0 else {})
        out = resolve_redirects(rd.from_pandas(red), **kw).to_pandas()
        got = {int(r.src): (int(r.target), int(r.n_hops))
               for r in out.itertuples()}
        assert got == expect, (trial, kw)


def test_kcore_paths_agree_vs_bruteforce(ray_session):
    """kcore: driver and broadcast paths agree with a brute-force
    simultaneous-peel reference on deterministic pseudo-random graphs,
    for k=2 and k=3; duplicate/reversed edges and self-loops are
    canonicalized away before degrees are counted."""
    import numpy as np

    from web_crawler_ray.stages.graph import kcore

    def brute(edges, k):
        es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        alive = {n for e in es for n in e}
        while True:
            deg = {}
            for a, b in es:
                if a in alive and b in alive:
                    deg[a] = deg.get(a, 0) + 1
                    deg[b] = deg.get(b, 0) + 1
            new = {n for n in alive if deg.get(n, 0) >= k}
            if new == alive:
                return sorted((n, deg.get(n, 0)) for n in alive)
            alive = new

    rng = np.random.RandomState(7)
    for trial, k in [(0, 2), (1, 2), (2, 3)]:
        n = 60
        m = 140
        a = rng.randint(0, n, m)
        b = rng.randint(0, n, m)
        # inject duplicates, reversals, self-loops
        edges = pd.DataFrame({
            "src": np.concatenate([a, b[:20], np.arange(5)]),
            "dst": np.concatenate([b, a[:20], np.arange(5)]),
        }).astype("int64")
        want = brute(list(zip(edges["src"], edges["dst"])), k)
        ds = rd.from_pandas(edges).repartition(3)
        drv = kcore(ds, k).to_pandas()
        bc = kcore(ds, k, driver_edges_max=0).to_pandas()
        got_drv = sorted(zip(drv["node"], drv["core_deg"]))
        got_bc = sorted(zip(bc["node"], bc["core_deg"]))
        assert got_drv == want, f"driver path trial {trial}"
        assert got_bc == want, f"broadcast path trial {trial}"


def test_kcore_semantics(ray_session):
    """kcore: a tendril hanging off a triangle peels away round by
    round; closing the tendril into a cycle makes it survive; the
    within-core degree is the degree AFTER peeling."""
    from web_crawler_ray.stages.graph import kcore

    # triangle 0-1-2 with tendril 0-10-11-12
    tri = pd.DataFrame({"src": [0, 1, 0, 0, 10, 11],
                        "dst": [1, 2, 2, 10, 11, 12]}).astype("int64")
    out = kcore(rd.from_pandas(tri), 2).to_pandas()
    assert sorted(zip(out["node"], out["core_deg"])) == [(0, 2), (1, 2), (2, 2)]
    # close the tendril back to node 1: everything survives
    closed = pd.concat([tri, pd.DataFrame({"src": [12], "dst": [1]})])
    out2 = kcore(rd.from_pandas(closed.astype("int64")), 2).to_pandas()
    got = dict(zip(out2["node"], out2["core_deg"]))
    assert got == {0: 3, 1: 3, 2: 2, 10: 2, 11: 2, 12: 2}


def test_ppr_paths_agree_and_mass_reenters_seeds(ray_session):
    """Personalized PageRank: broadcast and force-join paths return
    identical rounded scores; a node outside the seed set with no
    in-edges scores 0 (mass only re-enters through seeds); missing
    seeds raise on both paths."""
    import numpy as np
    import pytest as _pytest

    from web_crawler_ray.stages.graph import pagerank

    # 40-cycle plus node 100 → 0 (100 has no in-edges); seeds {0, 5}
    edges = pd.DataFrame({"src": list(range(40)) + [100],
                          "dst": [(i + 1) % 40 for i in range(40)] + [0]}
                         ).astype("int64")
    ds = rd.from_pandas(edges).repartition(2)
    bc = pagerank(ds, iterations=2, teleport_seeds=[0, 5]).to_pandas()
    jn = pagerank(ds, iterations=2, teleport_seeds=[0, 5],
                  force_join_path=True).to_pandas()
    b = bc.sort_values("node").reset_index(drop=True)
    j = jn.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(b, j)
    scores = dict(zip(b["node"], b["score"]))
    assert scores[100] == 0.0  # not a seed, no in-edges
    assert scores[0] > 0.0 and scores[1] > 0.0
    assert scores[20] == 0.0  # > 2 hops from both seeds, 2 iterations
    for kw in ({}, {"force_join_path": True}):
        with _pytest.raises(Exception, match="seed"):
            pagerank(ds, teleport_seeds=[99], **kw)


def test_seasonal_index_semantics(ray_session):
    """seasonal_index: a key whose Monday values run 2× its Friday
    values gets idx>1 on Monday, <1 on Friday; an all-equal key gets
    1.0 on every observed day; ISO numbering (Mon=1)."""
    from web_crawler_ray.stages.timeseries import seasonal_index

    # 2024-01-01 is a Monday, 2024-01-05 a Friday
    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"] * 2,
        "ts": pd.to_datetime(["2024-01-01", "2024-01-01",
                              "2024-01-05", "2024-01-05",
                              "2024-01-01", "2024-01-05"]),
        "v": [4.0, 4.0, 2.0, 2.0, 7.0, 7.0],
    })
    out = (seasonal_index(rd.from_pandas(df).repartition(2), "k", "ts", "v")
           .to_pandas().sort_values(["k", "dow"]).reset_index(drop=True))
    a = out[out["k"] == "a"]
    assert a["dow"].tolist() == [1, 5]
    assert a["seasonal_idx"].tolist() == [1.333333, 0.666667]  # round(6)
    b = out[out["k"] == "b"]
    assert b["seasonal_idx"].tolist() == [1.0, 1.0]


def test_skyline2d_semantics(ray_session):
    """skyline2d: duplicate maximal points keep their full multiplicity
    across batches; a point equal in one coordinate and lower in the
    other is dominated; incomparable points coexist."""
    from web_crawler_ray.stages.pareto import skyline2d

    df = pd.DataFrame({
        "x": [5.0, 5.0, 5.0, 3.0, 3.0, 1.0, 4.0],
        "y": [2,   2,   1,   9,   9,   9,   2],
    })
    # skyline: (5,2) ×2 and (3,9) ×2 — (5,1) dominated by (5,2),
    # (1,9) by (3,9), (4,2) by (5,2)
    out = (skyline2d(rd.from_pandas(df).repartition(3), "x", "y")
           .to_pandas().sort_values("x").reset_index(drop=True))
    assert list(zip(out["x"], out["y"], out["n"])) == [
        (3.0, 9, 2), (5.0, 2, 2)]


def test_scd2_versions_semantics(ray_session):
    """scd2_versions: a new version per attribute change (returning to
    an old value opens a NEW version), contiguous validity, NaN
    valid_to on the current version."""
    import numpy as np

    from web_crawler_ray.stages.windows import scd2_versions

    base = 1_700_000_000_000_000
    df = pd.DataFrame({
        "u": [1, 1, 1, 1, 2],
        "ts": pd.to_datetime(
            np.array([base, base + 10, base + 20, base + 30, base]),
            unit="us"),
        "tie": [1, 2, 3, 4, 5],
        "a": [7, 7, 8, 7, 9],  # 7 → 8 → back to 7: three versions
    })
    out = (scd2_versions(rd.from_pandas(df).repartition(2),
                         "u", "ts", "tie", "a")
           .to_pandas().sort_values(["u", "version"])
           .reset_index(drop=True))
    u1 = out[out["u"] == 1]
    assert u1["version"].tolist() == [1, 2, 3]
    assert u1["a"].tolist() == [7, 8, 7]
    assert u1["valid_from"].tolist() == [base, base + 20, base + 30]
    assert u1["valid_to"].tolist()[:2] == [base + 20, base + 30]
    assert pd.isna(u1["valid_to"].iloc[2])
    assert pd.isna(out[out["u"] == 2]["valid_to"]).all()


def test_grouped_agg_wide_matches_pandas(ray_session):
    """grouped_agg_wide: the coarse-partitioned one-exchange path must
    return exactly the pandas groupby result — names, dtypes (int64
    sums stay int64 — the exact-money contract), and values — for
    mixed sum/min/max specs at key cardinality well above a batch."""
    import numpy as np
    import ray.data as rd

    from web_crawler_ray.stages.grouped import (grouped_agg_wide,
                                                grouped_sum_wide)

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k1": rng.integers(0, 500, 20_000),
        "k2": rng.integers(0, 4, 20_000),
        "x": rng.integers(-1000, 1000, 20_000),        # int64
        "y": rng.normal(size=20_000),                  # float64
    })
    ds = rd.from_pandas(df).repartition(8)

    out = (grouped_agg_wide(ds, ["k1", "k2"],
                            {"sx": ("sum", "x"), "mn": ("min", "y"),
                             "mx": ("max", "y")})
           .to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True))
    want = (df.groupby(["k1", "k2"])
            .agg(sx=("x", "sum"), mn=("y", "min"), mx=("y", "max"))
            .reset_index().sort_values(["k1", "k2"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out.astype({"k1": want["k1"].dtype, "k2": want["k2"].dtype}), want)
    assert str(out["sx"].dtype) == "int64"

    s = (grouped_sum_wide(ds, ["k1"], ["x"])
         .to_pandas().sort_values("k1").reset_index(drop=True))
    ws = (df.groupby("k1", as_index=False)[["x"]].sum()
          .sort_values("k1").reset_index(drop=True))
    assert s["x"].tolist() == ws["x"].tolist()
