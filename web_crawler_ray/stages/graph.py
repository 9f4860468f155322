"""Iterative graph analytics over an edge list — HITS/PageRank-style
power iteration expressed as per-iteration Ray Data joins + partial
aggregates (no driver-side score pulls, no whole-graph materialization
on any single node).

Scale shape: the edge list is the big table and is touched once per
half-iteration through a hash join on the propagating side's key; the
score tables are node-sized. Every aggregation is a map-side partial
sum + tiny combine. The edge list (with degrees attached) is reused
every iteration — ``cache_edges=True`` pins it in the object store,
which is right while edges fit cluster memory; at a 100-TB edge list
pass ``cache_edges=False`` and each iteration re-scans the lazy
pipeline instead (same results, the streaming executor re-executes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .grouped import (grouped_triu as _grouped_triu, partitioned_apply,
                      partitioned_drop_duplicates)
from ..functions.rounding import sql_round


def grouped_sum(ds, key: str, col: str, out: str, num_partitions: int = 16):
    """Exact per-key sum for MODERATE/HIGH-cardinality keys: batch-local
    pre-combine, one coarse hash shuffle, vectorized per-partition sum.
    (``Dataset.groupby().aggregate()`` degrades badly past ~10^3 keys —
    measured 11 s vs 0.3 s on 1.5×10^4 keys.)"""

    def psum(p: pd.DataFrame) -> pd.DataFrame:
        return p.groupby(key, sort=True)[col].sum().rename(out).reset_index()

    def pre(p: pd.DataFrame) -> pd.DataFrame:
        return p.groupby(key, sort=False)[col].sum().rename(out).reset_index().rename(
            columns={out: col}
        )

    return partitioned_apply(ds, [key], psum, num_partitions, pre_combine=pre)


def _broadcast_power(e, left: str, right: str, iterations: int, ndigits: int):
    """Fast path for node sets that fit one machine: degree and score
    arrays are broadcast via the object store, each half-iteration is a
    single map_batches pass over the edges with batch-local pre-combine
    (one row per (node, batch) comes back), no joins, no shuffles."""
    import ray
    import ray.data as rd

    def degrees(col):
        # one map pass (batch-local counts) + node-sized driver combine
        # — Dataset.groupby().aggregate() is ~100× slower at 10^4+ keys
        part = e.map_batches(
            lambda b: b.groupby(col, sort=False).size().rename("d").reset_index(),
            batch_format="pandas",
        ).to_pandas()
        ser = part.groupby(col)["d"].sum().sort_index()
        return ser.index.to_numpy(), ser.to_numpy().astype(np.float64)

    l_keys, l_deg = degrees(left)
    r_keys, r_deg = degrees(right)
    s_r = np.ones(len(r_keys), dtype=np.float64)

    def half_step(src_col, dst_col, src_keys, contrib):
        ref = ray.put((src_keys, contrib))

        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            keys, c = ray.get(ref)
            vals = c[np.searchsorted(keys, batch[src_col].to_numpy())]
            g = (
                pd.DataFrame({dst_col: batch[dst_col], "c": vals})
                .groupby(dst_col, sort=False)["c"].sum().reset_index()
            )
            return g

        part = e.map_batches(fn, batch_format="pandas").to_pandas()
        return part.groupby(dst_col)["c"].sum()  # node-sized driver combine

    for _ in range(iterations):
        s_l_ser = half_step(right, left, r_keys, s_r / r_deg)
        s_l = s_l_ser.reindex(l_keys).fillna(0.0).to_numpy()
        s_r_ser = half_step(left, right, l_keys, s_l / l_deg)
        s_r = s_r_ser.reindex(r_keys).fillna(0.0).to_numpy()

    return rd.from_pandas(
        pd.DataFrame({right: r_keys, "score": sql_round(pd.Series(s_r), ndigits)})
    )


def bipartite_power_scores(edges_ds, left: str, right: str, iterations: int = 2,
                           num_partitions: int = 16, ndigits: int = 6,
                           cache_edges: bool = True,
                           broadcast_nodes_max: int = 5_000_000):
    """HITS-style mutual-reinforcement scores on a bipartite graph.

    With E the distinct (left, right) edge set, deg_l/deg_r the node
    degrees and s_r(0) = 1.0:

        s_l(t+1) = Σ_{(l,r) ∈ E} s_r(t)  / deg_r
        s_r(t+1) = Σ_{(l,r) ∈ E} s_l(t+1) / deg_l

    Returns one row per right node: (right, score) with score rounded
    to ``ndigits`` (SQL-replayable by unrolling the iterations into
    chained CTEs)."""
    e = partitioned_drop_duplicates(
        edges_ds.select_columns([left, right]), [left, right],
        num_partitions, pre_dedup=True,
    )
    if cache_edges:
        e = e.materialize()
    # small-graph gate: when the node sets fit one machine, propagate
    # through broadcast arrays (one map pass per half-iteration, no
    # joins). Edge count bounds node count, and is free on the
    # materialized edge set — a conservative, zero-cost probe. The
    # join path below is the 10^9-node scale shape.
    if cache_edges and e.count() <= broadcast_nodes_max:
        return _broadcast_power(e, left, right, iterations, ndigits)
    def add_one(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_one"] = np.int64(1)
        return batch

    ones = e.map_batches(add_one, batch_format="pandas")
    deg_l = grouped_sum(ones, left, "_one", "d_l", num_partitions)
    deg_r = grouped_sum(ones, right, "_one", "d_r", num_partitions)
    # Materialize between joins: each Dataset.join spawns its own
    # aggregator-actor pool, and a DAG chaining several joins holds all
    # pools alive at once — on a small session that starves the task
    # slots and the pipeline hangs (same failure mode as oversized
    # map_batches pools). The barriers keep at most one join's pool
    # live; everything materialized is edge- or node-sized and stays
    # distributed in the object store.
    e = e.join(deg_l, join_type="inner", num_partitions=num_partitions,
               on=(left,)).materialize()
    e = e.join(deg_r, join_type="inner", num_partitions=num_partitions,
               on=(right,))
    if cache_edges:
        e = e.materialize()

    # s_r(0) = 1.0 for every right node
    def init_score(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({right: batch[right], "s": 1.0})

    s_r = deg_r.map_batches(init_score, batch_format="pandas")

    def over(d_col):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch["c"] = batch["s"] / batch[d_col]
            return batch
        return fn

    for _ in range(iterations):
        j = e.join(s_r, join_type="inner", num_partitions=num_partitions,
                   on=(right,))
        s_l = grouped_sum(
            j.map_batches(over("d_r"), batch_format="pandas"),
            left, "c", "s", num_partitions,
        ).materialize()  # node-sized barrier — see join-pool note above
        j2 = e.join(s_l, join_type="inner", num_partitions=num_partitions,
                    on=(left,))
        s_r = grouped_sum(
            j2.map_batches(over("d_l"), batch_format="pandas"),
            right, "c", "s", num_partitions,
        ).materialize()

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["score"] = sql_round(batch["s"], ndigits)
        return batch[[right, "score"]]

    return s_r.map_batches(finish, batch_format="pandas")


def connected_components(edges_ds, id_a: str = "id_a", id_b: str = "id_b",
                         max_iter: int = 50,
                         broadcast_nodes_max: int = 5_000_000,
                         num_partitions: int = 16,
                         force_join_path: bool = False,
                         driver_edges_max: int = 2_000_000):
    """Connected components over an undirected edge list by min-label
    propagation: every node's label converges to the minimum node id in
    its component (the canonical-representative rule dedup clustering
    needs: near-dup PAIRS → dup CLUSTERS).

    Triple path, auto-selected by edge count (the same zero-cost gate
    as :func:`bipartite_power_scores` — edges bound nodes):

    * **driver** (≤ ``driver_edges_max`` edges): the 2-column int64
      edge table is pulled once (≤ 32 MB at the 2M default — the same
      driver-state class as the node-label arrays the broadcast path
      already holds) and resolved exactly by numpy hook + pointer-
      jumping compression in O(log n) vectorized rounds, ZERO
      per-iteration Dataset executions. Near-dup pair lists are almost
      always this small; per-pass scheduling overhead (not compute)
      dominated them before.
    * **broadcast** (≤ ``broadcast_nodes_max``): labels are NODE-sized
      state broadcast via the object store; each iteration is ONE
      streaming map pass over the edges emitting batch-local
      (node, min-neighbor-label) partials — the edge list never lands
      on the driver.
    * **join** (past the gate, or ``force_join_path=True``): labels stay
      a DISTRIBUTED Dataset; each iteration hash-joins them onto both
      edge endpoints, emits (node, min(la, lb)) candidates, and reduces
      with a coarse-partitioned grouped min — no node-sized driver
      state, the 10^9-node scale shape (min instead of the power
      iteration's sum).

    The distributed paths converge in O(component diameter) passes and
    raise if ``max_iter`` passes exhaust without convergence (an
    unconverged label map is silently WRONG clusters, not an
    approximation); the driver path is exact by construction.

    Returns a DATASET of (node:int64, component:int64) — node-sized,
    so a 10^9-node caller is never forced through the driver; small
    callers add ``.to_pandas()`` at the query layer.
    """
    n_edges = edges_ds.count()
    if force_join_path or n_edges > broadcast_nodes_max:
        return _join_components(edges_ds, id_a, id_b, max_iter,
                                num_partitions)
    if n_edges <= driver_edges_max:
        return _driver_components(edges_ds, id_a, id_b)
    import ray

    # node set: batch-local uniques → node-sized driver union
    parts = edges_ds.map_batches(
        lambda b: pd.DataFrame({"n": pd.unique(pd.concat([b[id_a], b[id_b]]))}),
        batch_format="pandas",
    ).to_pandas()
    nodes = np.sort(pd.unique(parts["n"]))
    labels = nodes.copy()

    converged = False
    for _ in range(max_iter):
        ref = ray.put((nodes, labels))

        def step(batch: pd.DataFrame) -> pd.DataFrame:
            ns, ls = ray.get(ref)
            a = batch[id_a].to_numpy()
            b = batch[id_b].to_numpy()
            la = ls[np.searchsorted(ns, a)]
            lb = ls[np.searchsorted(ns, b)]
            node = np.concatenate([a, b])
            lab = np.concatenate([np.minimum(la, lb)] * 2)
            return (pd.DataFrame({"n": node, "lab": lab})
                    .groupby("n", sort=False)["lab"].min().reset_index())

        part = edges_ds.map_batches(step, batch_format="pandas").to_pandas()
        mins = part.groupby("n")["lab"].min()
        new = labels.copy()
        idx = np.searchsorted(nodes, mins.index.to_numpy())
        new[idx] = np.minimum(new[idx], mins.to_numpy())
        if (new == labels).all():
            converged = True
            break
        labels = new

    if not converged:
        raise RuntimeError(
            f"connected_components: no convergence after {max_iter} "
            f"iterations — a component's diameter exceeds max_iter; "
            f"raise max_iter (labels would be silently wrong)")
    import ray.data as rd
    return rd.from_pandas(pd.DataFrame({
        "node": nodes.astype("int64"),
        "component": labels.astype("int64")}))


def _driver_components(edges_ds, id_a: str, id_b: str):
    """Exact driver-side components for small edge lists (gated by
    ``driver_edges_max``): Shiloach–Vishkin-style hook + full pointer-
    jumping compression over numpy index arrays. Each outer round is
    two O(E) scatters plus an O(N log d) compression, and rounds are
    O(log n) because compression at least halves every chain — a
    2M-edge list resolves in milliseconds where the per-pass Dataset
    scheduling of the broadcast path cost ~1 s × diameter."""
    import ray.data as rd

    pdf = edges_ds.select_columns([id_a, id_b]).to_pandas()
    if not len(pdf):
        return rd.from_pandas(pd.DataFrame({
            "node": pd.Series([], dtype="int64"),
            "component": pd.Series([], dtype="int64")}))
    a = pdf[id_a].to_numpy(np.int64)
    b = pdf[id_b].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    lab = np.arange(len(nodes), dtype=np.int64)
    # every non-converged round advances the component min ≥1 graph
    # hop, so rounds ≤ max component diameter ≤ n — compression makes
    # real inputs converge in a handful; the bound only guards against
    # returning silently-wrong labels
    for _ in range(len(nodes) + 2):
        m = np.minimum(lab[ia], lab[ib])
        new = lab.copy()
        np.minimum.at(new, ia, m)
        np.minimum.at(new, ib, m)
        while True:  # pointer jumping to fixpoint (labels are indices)
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        if np.array_equal(new, lab):
            break
        lab = new
    else:  # unreachable by the diameter bound; fail loudly, not wrong
        raise RuntimeError("connected_components(driver path): no "
                           "convergence within the diameter bound")
    return rd.from_pandas(pd.DataFrame({
        "node": nodes.astype("int64"),
        "component": nodes[lab].astype("int64")}))


def _join_components(edges_ds, id_a: str, id_b: str, max_iter: int,
                     num_partitions: int):
    """Distributed min-label propagation: labels live as a Dataset the
    whole time; per iteration two hash joins attach labels to the edge
    endpoints, a map pass emits (node, candidate=min(la, lb), old)
    for BOTH endpoints, and a coarse-partitioned grouped min produces
    the new label table plus a changed-count for the convergence test.
    min over edges (a,b) of min(la, lb) = min(la, min over neighbors
    lb), so the grouped candidate min IS the propagation step — no
    join back onto the old labels needed. Every node appears in ≥1
    edge by construction, so the label table always covers the node
    set. ``.materialize()`` between joins keeps at most one join's
    aggregator-actor pool alive (chained lazy joins hold all pools at
    once and starve small sessions)."""

    e = edges_ds.select_columns([id_a, id_b]).materialize()

    def endpoints(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"n": pd.unique(pd.concat([b[id_a], b[id_b]]).to_numpy())})

    # repartition() after every partitioned_apply-derived table that
    # feeds a join: map_groups emits ZERO-COLUMN blocks for empty sort
    # partitions, map_batches skips empty blocks (so a map can't repair
    # the schema), and a hash-join partition composed only of such
    # blocks loses the key column ("No match for FieldRef" in Acero).
    # repartition merges them into typed blocks; labels are node-sized.
    labels = partitioned_drop_duplicates(
        e.map_batches(endpoints, batch_format="pandas"), ["n"],
        num_partitions, pre_dedup=True,
    ).map_batches(lambda b: b.assign(lab=b["n"]),
                  batch_format="pandas").repartition(
        num_partitions).materialize()

    def reduce_part(p: pd.DataFrame) -> pd.DataFrame:
        g = (p.groupby("n", sort=True)
             .agg(cand=("cand", "min"), old=("old", "min")).reset_index())
        return g

    converged = False
    for _ in range(max_iter):
        la = labels.map_batches(
            lambda b: pd.DataFrame({id_a: b["n"], "_la": b["lab"]}),
            batch_format="pandas")
        j = e.join(la, join_type="inner", num_partitions=num_partitions,
                   on=(id_a,)).materialize()
        lb = labels.map_batches(
            lambda b: pd.DataFrame({id_b: b["n"], "_lb": b["lab"]}),
            batch_format="pandas")
        j = j.join(lb, join_type="inner", num_partitions=num_partitions,
                   on=(id_b,)).materialize()

        def emit(b: pd.DataFrame) -> pd.DataFrame:
            la_v = b["_la"].to_numpy()
            lb_v = b["_lb"].to_numpy()
            m = np.minimum(la_v, lb_v)
            return pd.DataFrame({
                "n": np.concatenate([b[id_a].to_numpy(), b[id_b].to_numpy()]),
                "cand": np.concatenate([m, m]),
                "old": np.concatenate([la_v, lb_v]),
            })

        reduced = partitioned_apply(
            j.map_batches(emit, batch_format="pandas"), ["n"], reduce_part,
            num_partitions, pre_combine=reduce_part,
        ).materialize()
        changed = int(reduced.map_batches(
            lambda b: pd.DataFrame(
                {"c": [int((b["cand"].to_numpy()
                            < b["old"].to_numpy()).sum())]}),
            batch_format="pandas").sum("c") or 0)
        labels = reduced.map_batches(
            lambda b: pd.DataFrame({"n": b["n"], "lab": b["cand"]}),
            batch_format="pandas").repartition(  # see zero-column note
            num_partitions).materialize()
        if changed == 0:
            converged = True
            break

    if not converged:
        raise RuntimeError(
            f"connected_components(join path): no convergence after "
            f"{max_iter} iterations — raise max_iter")
    return labels.map_batches(
        lambda b: pd.DataFrame(
            {"node": b["n"].to_numpy().astype("int64"),
             "component": b["lab"].to_numpy().astype("int64")}),
        batch_format="pandas")


def attach_components(ds, comps_ds, id_col: str, out_col: str = "component",
                      broadcast_nodes_max: int = 5_000_000,
                      num_partitions: int = 16,
                      force_join_path: bool = False):
    """Attach component labels onto a row Dataset: rows whose id is
    absent from the component table keep their OWN id as the label
    (singleton components). Dual path on the component-table size —
    the same gate as :func:`connected_components`:

    * **broadcast** (≤ ``broadcast_nodes_max`` labelled nodes): the
      (node, component) table ships ONCE via the object store as two
      sorted numpy arrays; the attach is a vectorized ``searchsorted``
      inside one streaming map pass. No dict, no Python loop.
    * **join** (past the gate, or ``force_join_path=True``): labels
      stay a distributed Dataset and attach via ONE left-outer hash
      join; missing labels fill with the row's own id in a map pass.

    The output column order is the input's columns with ``out_col``
    appended, both paths — callers can rely on one schema."""
    import ray
    import ray.data as rd  # noqa: F401  (symmetry with connected_components)

    if not force_join_path and comps_ds.count() <= broadcast_nodes_max:
        comp = comps_ds.to_pandas()
        order = np.argsort(comp["node"].to_numpy(), kind="mergesort")
        ref = ray.put((comp["node"].to_numpy()[order],
                       comp["component"].to_numpy()[order]))

        def tag(batch: pd.DataFrame) -> pd.DataFrame:
            ns, cs = ray.get(ref)
            ids = batch[id_col].to_numpy()
            lab = ids.astype("int64", copy=True)
            if len(ns):
                idx = np.clip(np.searchsorted(ns, ids), 0, len(ns) - 1)
                hit = ns[idx] == ids
                lab[hit] = cs[idx[hit]]
            batch = batch.copy()
            batch[out_col] = lab
            return batch

        return ds.map_batches(tag, batch_format="pandas")

    cols = [c for c in ds.schema().names]
    lab = comps_ds.map_batches(
        lambda b: pd.DataFrame({id_col: b["node"], "_lab": b["component"]}),
        batch_format="pandas")
    j = ds.join(lab, join_type="left_outer", num_partitions=num_partitions,
                on=(id_col,))

    def fill(batch: pd.DataFrame) -> pd.DataFrame:
        lv = batch["_lab"].to_numpy()
        own = batch[id_col].to_numpy().astype("int64")
        miss = pd.isna(lv)
        out = np.where(miss, own, np.where(miss, 0, lv)).astype("int64")
        # (inner where zeroes the NaN slots before the cast so object /
        # float nulls from the outer join never reach astype)
        batch = batch[cols].copy()
        batch[out_col] = out
        return batch

    return j.map_batches(fill, batch_format="pandas")


def pagerank(edges_ds, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iterations: int = 2,
             ndigits: int = 6, num_partitions: int = 16,
             broadcast_nodes_max: int = 5_000_000,
             force_join_path: bool = False,
             teleport_seeds=None):
    """PageRank with damping over a directed DISTINCT edge list,
    dangling mass redistributed uniformly (the standard formulation):

        s(0)   = 1/N
        s(t+1) = (1-d)/N + d·(Σ_{(u,v)∈E} s_u(t)/outdeg_u  +  D(t)/N)

    where D(t) is the total score held by zero-outdegree nodes. Fixed
    ``iterations`` so the result is SQL-replayable by CTE unrolling.

    ``teleport_seeds`` switches to PERSONALIZED PageRank (Page et al.
    1999 §6; the crawl-frontier 'relevance to my seed list' signal):
    the uniform vector 1/N is replaced everywhere — initial scores,
    restart term, dangling redistribution — by the indicator vector
    1[v ∈ S]/|S|, so score mass always re-enters through the seeds.
    Seeds are a small list by contract (they ride the closure /
    object store).

    Dual path on the same node gate as :func:`bipartite_power_scores` /
    :func:`connected_components`: broadcast (node-sized arrays via the
    object store, one map pass per iteration) under the gate; past it,
    scores stay a distributed Dataset and each iteration is one hash
    join + coarse grouped sum (+ one scalar dangling aggregate) — the
    10^9-node shape. Contributions are summed in sorted (dst, src)
    order for run-to-run determinism of the float sum."""
    import ray
    import ray.data as rd

    e = partitioned_drop_duplicates(
        edges_ds.select_columns([src, dst]), [src, dst],
        num_partitions, pre_dedup=True,
    ).materialize()

    if force_join_path or e.count() > broadcast_nodes_max:
        return _join_pagerank(e, src, dst, damping, iterations, ndigits,
                              num_partitions, teleport_seeds)

    # node set + outdegrees: batch-local partials, node-sized driver state
    parts = e.map_batches(
        lambda b: pd.DataFrame(
            {"n": pd.unique(pd.concat([b[src], b[dst]]).to_numpy())}),
        batch_format="pandas").to_pandas()
    nodes = np.sort(pd.unique(parts["n"]))
    degp = e.map_batches(
        lambda b: b.groupby(src, sort=False).size().rename("d").reset_index(),
        batch_format="pandas").to_pandas()
    deg_ser = degp.groupby(src)["d"].sum()
    outdeg = np.zeros(len(nodes), dtype=np.float64)
    outdeg[np.searchsorted(nodes, deg_ser.index.to_numpy())] = (
        deg_ser.to_numpy())
    n = float(len(nodes))
    if teleport_seeds is None:
        tele = np.full(len(nodes), 1.0 / n)
    else:
        seeds = np.asarray(sorted(set(int(x) for x in teleport_seeds)),
                           dtype=np.int64)
        if not len(seeds):
            raise ValueError("pagerank: empty teleport seed set")
        tele = np.zeros(len(nodes), dtype=np.float64)
        idx = np.searchsorted(nodes, seeds)
        hit = (idx < len(nodes)) & (nodes[np.minimum(idx, len(nodes) - 1)]
                                    == seeds)
        if not hit.all():
            raise ValueError("pagerank: teleport seed not in the graph")
        tele[idx] = 1.0 / len(seeds)
    s = tele.copy()

    for _ in range(iterations):
        contrib = np.divide(s, outdeg, out=np.zeros_like(s),
                            where=outdeg > 0)
        ref = ray.put((nodes, contrib))

        def step(batch: pd.DataFrame) -> pd.DataFrame:
            ns, c = ray.get(ref)
            b = batch.sort_values([dst, src], kind="mergesort")
            vals = c[np.searchsorted(ns, b[src].to_numpy())]
            return (pd.DataFrame({dst: b[dst].to_numpy(), "c": vals})
                    .groupby(dst, sort=True)["c"].sum().reset_index())

        part = e.map_batches(step, batch_format="pandas").to_pandas()
        part = part.sort_values([dst, "c"], kind="mergesort")
        in_ser = part.groupby(dst)["c"].sum()
        in_sum = np.zeros(len(nodes), dtype=np.float64)
        in_sum[np.searchsorted(nodes, in_ser.index.to_numpy())] = (
            in_ser.to_numpy())
        dangling = float(s[outdeg == 0].sum())
        if teleport_seeds is None:
            # keep the uniform path's float op order bit-stable (the
            # q_pagerank / q_graph_scores replays pin it)
            s = (1.0 - damping) / n + damping * (in_sum + dangling / n)
        else:
            s = ((1.0 - damping) * tele
                 + damping * (in_sum + dangling * tele))

    return rd.from_pandas(pd.DataFrame({
        "node": nodes.astype("int64"),
        "score": sql_round(pd.Series(s), ndigits)}))


def _join_pagerank(e, src: str, dst: str, damping: float, iterations: int,
                   ndigits: int, num_partitions: int,
                   teleport_seeds=None):
    """Distributed PageRank: scores live as a Dataset; per iteration one
    hash join attaches scores to edge sources, a coarse grouped sum
    reduces per destination, and the dangling mass is one scalar
    aggregate. Materialize barriers between joins (chained lazy join
    DAGs hold every aggregator pool alive and starve small sessions)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def endpoints(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.unique(pd.concat([b[src], b[dst]]).to_numpy())})

    nodes = partitioned_drop_duplicates(
        e.map_batches(endpoints, batch_format="pandas"), ["node"],
        num_partitions, pre_dedup=True).materialize()
    n = float(nodes.count())

    def count_src(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby(src, sort=False).size().rename("od")
                .reset_index().rename(columns={src: "node"}))

    deg = grouped_sum(e.map_batches(count_src, batch_format="pandas"),
                      "node", "od", "od", num_partitions)
    if teleport_seeds is None:
        seed_arr, tshare = None, 0.0
    else:
        seed_arr = np.asarray(sorted(set(int(x) for x in teleport_seeds)),
                              dtype=np.int64)
        if not len(seed_arr):
            raise ValueError("pagerank: empty teleport seed set")
        tshare = 1.0 / len(seed_arr)
        present = nodes.map_batches(
            lambda b, _sa=seed_arr: pd.DataFrame({"hits": [int(np.isin(
                b["node"].to_numpy(np.int64), _sa).sum())]}),
            batch_format="pandas").to_pandas()["hits"].sum()
        if int(present) != len(seed_arr):
            raise ValueError("pagerank: teleport seed not in the graph")

    def init_s(b: pd.DataFrame) -> pd.DataFrame:
        od = b["od"].fillna(0).astype("float64")
        if seed_arr is None:
            return pd.DataFrame({"node": b["node"], "od": od, "s": 1.0 / n})
        t = np.where(np.isin(b["node"].to_numpy(np.int64), seed_arr),
                     tshare, 0.0)
        return pd.DataFrame({"node": b["node"], "od": od, "t": t, "s": t})

    scores = nodes.join(deg, join_type="left_outer",
                        num_partitions=num_partitions,
                        on=("node",)).map_batches(
        init_s, batch_format="pandas").materialize()

    for _ in range(iterations):
        dang = scores.map_batches(
            lambda b: pd.DataFrame(
                {"dm": [float(b.loc[b["od"] == 0, "s"].sum())]}),
            batch_format="pandas").aggregate(Sum("dm", alias_name="dm"))
        dangling = float(dang["dm"] or 0.0)

        contrib = scores.map_batches(
            lambda b: pd.DataFrame(
                {src: b.loc[b["od"] > 0, "node"],
                 "c": b.loc[b["od"] > 0, "s"] / b.loc[b["od"] > 0, "od"]}),
            batch_format="pandas")
        j = e.join(contrib, join_type="inner",
                   num_partitions=num_partitions, on=(src,)).materialize()

        def pre_sorted(p: pd.DataFrame) -> pd.DataFrame:
            p = p.sort_values([dst, src], kind="mergesort")
            return (p.groupby(dst, sort=True)["c"].sum().rename("c")
                    .reset_index())

        in_sum = partitioned_apply(
            j.select_columns([src, dst, "c"]), [dst],
            lambda p: (p.sort_values([dst, "c"], kind="mergesort")
                       .groupby(dst, sort=True)["c"].sum().rename("m")
                       .reset_index().rename(columns={dst: "node"})),
            num_partitions, pre_combine=pre_sorted).materialize()

        base = (1.0 - damping) / n + damping * dangling / n

        def update(b: pd.DataFrame, _base=base, _dang=dangling):
            if seed_arr is None:
                return pd.DataFrame(
                    {"node": b["node"], "od": b["od"],
                     "s": _base + damping * b["m"].fillna(0.0)})
            t = b["t"].to_numpy(np.float64)
            return pd.DataFrame(
                {"node": b["node"], "od": b["od"], "t": t,
                 "s": (1.0 - damping) * t
                      + damping * (b["m"].fillna(0.0).to_numpy(np.float64)
                                   + _dang * t)})

        scores = scores.join(
            in_sum, join_type="left_outer", num_partitions=num_partitions,
            on=("node",)).map_batches(update,
                                      batch_format="pandas").materialize()

    return scores.map_batches(
        lambda b: pd.DataFrame({"node": b["node"].astype("int64"),
                                "score": sql_round(b["s"], ndigits)}),
        batch_format="pandas")


def cooccurrence_edges(ds, group_col: str, item_col: str,
                       num_partitions: int = 32, max_group: int = 1024):
    """Undirected co-occurrence edges: items sharing a group (parts on
    one order, tokens in one doc) become an (id_a < id_b) edge, distinct
    across the corpus. One co-locating shuffle on ``group_col`` with a
    batch-local distinct pre-combine; pair fan-out per group is
    vectorized triu (groups are receipt-sized — ``max_group`` raises on
    pathological groups rather than silently emitting g² rows)."""

    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[[group_col, item_col]].drop_duplicates()

    def pairs_part(part: pd.DataFrame) -> pd.DataFrame:
        part = (part.drop_duplicates()
                .sort_values([group_col, item_col], kind="mergesort"))
        keys = part[group_col].to_numpy()
        items = part[item_col].to_numpy()
        # size-class triu broadcasting; oversized groups abort loudly
        ia, ib = _grouped_triu(keys, max_size=max_group,
                               raise_on_exceed=True)
        if not len(ia):
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "id_a": items[ia].astype("int64"),
            "id_b": items[ib].astype("int64"),
        }).drop_duplicates()

    pairs = partitioned_apply(
        ds.map_batches(pre, batch_format="pandas"),
        [group_col], pairs_part, num_partitions=num_partitions)
    return partitioned_drop_duplicates(pairs, ["id_a", "id_b"],
                                       num_partitions=num_partitions)


def triangle_count(edges_ds, a_col: str = "id_a", b_col: str = "id_b",
                   num_partitions: int = 32,
                   broadcast_gate: int = 20_000_000):
    """Distributed triangle count over a distinct (a < b) edge list —
    the clustering-structure probe of the graph suite. Id-orientation
    wedge enumeration: every triangle a<b<c is counted exactly once as
    a wedge (b, c) opened at its smallest vertex a and closed by the
    edge (b, c).

    Shape: shuffle 1 co-locates edges by ``a``; each partition
    enumerates its wedges vectorized. Closure has two paths, the same
    dual-path rule as ``bipartite_power_scores``: at or below
    ``broadcast_gate`` edges (and 31-bit ids) the sorted packed edge-key
    array broadcasts once via ``ray.put`` and wedges close map-side with
    a searchsorted probe — the (wedges ≫ edges) set never shuffles.
    Past the gate, wedges pre-aggregate to (b, c, n_wedge) rows and a
    second shuffle co-locates them with edges — nothing ever gathers a
    neighborhood on the driver. Wedge fan-out is quadratic in
    out-degree by id order; for power-law graphs switch the orientation
    to (degree, id) order (standard trick, same join), which caps
    fan-out at O(E^1.5).
    Returns one row: (n_edges, n_wedges, n_triangles)."""
    import ray

    # consumed by BOTH the wedge branch and the closure tag — without a
    # barrier the whole upstream edge build executes twice
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()

    if n_edges <= broadcast_gate:
        keys_parts, small_ids = [], True
        for b in edges_ds.iter_batches(batch_format="pandas"):
            a = b[a_col].to_numpy(np.int64)
            bb = b[b_col].to_numpy(np.int64)
            if len(a) and (a.min() < 0 or bb.min() < 0
                           or max(a.max(), bb.max()) >= (1 << 31)):
                small_ids = False
                break
            keys_parts.append((a << 32) | bb)
        if small_ids:
            edge_keys = np.sort(np.concatenate(keys_parts)
                                if keys_parts else np.array([], np.int64))
            ref = ray.put(edge_keys)

            def close_map(part: pd.DataFrame) -> pd.DataFrame:
                ek = ray.get(ref)
                part = (part.drop_duplicates(subset=[a_col, b_col])
                        .sort_values([a_col, b_col], kind="mergesort"))
                keys = part[a_col].to_numpy()
                nbrs = part[b_col].to_numpy(np.int64)
                # size-class triu broadcasting (the edit-join trick):
                # loop over distinct group SIZES, never over groups,
                # and probe all wedges with one searchsorted
                ia, ib = _grouped_triu(keys)
                if not len(ia):
                    return pd.DataFrame({"n_wedges": [np.int64(0)],
                                         "n_triangles": [np.int64(0)]})
                wk = (nbrs[ia] << 32) | nbrs[ib]
                pos = np.searchsorted(ek, wk)
                ok = pos < len(ek)
                n_t = int((ek[pos[ok]] == wk[ok]).sum())
                return pd.DataFrame({"n_wedges": [np.int64(len(wk))],
                                     "n_triangles": [np.int64(n_t)]})

            partials = partitioned_apply(edges_ds, [a_col], close_map,
                                         num_partitions=num_partitions)
            n_w = n_t = 0
            for b in partials.iter_batches(batch_format="pandas"):
                n_w += int(b["n_wedges"].sum())
                n_t += int(b["n_triangles"].sum())
            import ray.data as rd

            return rd.from_pandas(pd.DataFrame(
                {"n_edges": np.array([n_edges], dtype=np.int64),
                 "n_wedges": np.array([n_w], dtype=np.int64),
                 "n_triangles": np.array([n_t], dtype=np.int64)}))

    def wedges_part(part: pd.DataFrame) -> pd.DataFrame:
        part = (part.drop_duplicates(subset=[a_col, b_col])
                .sort_values([a_col, b_col], kind="mergesort"))
        keys = part[a_col].to_numpy()
        nbrs = part[b_col].to_numpy()
        ia, ib = _grouped_triu(keys)  # size-class triu broadcasting
        if not len(ia):
            return pd.DataFrame({"x": pd.Series([], dtype="int64"),
                                 "y": pd.Series([], dtype="int64"),
                                 "n_wedge": pd.Series([], dtype="int64"),
                                 "is_edge": pd.Series([], dtype="int64")})
        out = (pd.DataFrame({"x": nbrs[ia].astype("int64"),
                             "y": nbrs[ib].astype("int64")})
               .groupby(["x", "y"], sort=False).size()
               .rename("n_wedge").reset_index())
        out["is_edge"] = np.int64(0)
        return out

    wedges = partitioned_apply(edges_ds, [a_col], wedges_part,
                               num_partitions=num_partitions)

    def tag_edges(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "x": batch[a_col].to_numpy().astype("int64"),
            "y": batch[b_col].to_numpy().astype("int64"),
            "n_wedge": np.zeros(len(batch), dtype=np.int64),
            "is_edge": np.ones(len(batch), dtype=np.int64),
        })

    def close_part(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(["x", "y"], sort=False).agg(
            n_wedge=("n_wedge", "sum"), is_edge=("is_edge", "max"))
        return pd.DataFrame({
            "n_edges": [np.int64(g["is_edge"].sum())],
            "n_wedges": [np.int64(g["n_wedge"].sum())],
            "n_triangles": [np.int64(
                g.loc[g["is_edge"] > 0, "n_wedge"].sum())],
        })

    both = wedges.union(
        edges_ds.map_batches(tag_edges, batch_format="pandas"))
    partials = partitioned_apply(both, ["x", "y"], close_part,
                                 num_partitions=num_partitions)
    tot = np.zeros(3, dtype=np.int64)
    for b in partials.iter_batches(batch_format="pandas"):
        tot += np.array([b["n_edges"].sum(), b["n_wedges"].sum(),
                         b["n_triangles"].sum()], dtype=np.int64)
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(
        {"n_edges": [tot[0]], "n_wedges": [tot[1]],
         "n_triangles": [tot[2]]}))


def hash_walks(edges, a_col: str, b_col: str, n_steps: int = 2,
               num_partitions: int = 8, num_blocks: int = 8):
    """Deterministic 'random' walks over a bipartite edge list — the
    DeepWalk/node2vec sampling stage made exactly reproducible: one
    walk starts at every distinct ``a_col`` node, and at step t the
    next node u minimizes the integer hash
    ``((walk % 2^31)·1315423911 + t·2654435761 + (u % 2^31)·97867)
    mod 2^32`` (ties by ascending u), so cluster size, partitioning
    and retries never change the sampled paths and the whole walk set
    replays in SQL.

    Each step is one hash join (frontier ⋈ edges on the current side)
    followed by a per-walk vectorized argmin inside a coarse partition
    — the exchange carries candidate rows (Σ degree of the frontier),
    never the corpus. The visited path rides ALONG the frontier as
    n1..nt columns (no end-of-walk reassembly joins). Steps alternate
    sides (a→b→a→…). Frontiers are node-sized, MATERIALIZED between
    joins (chained join DAGs hold every aggregator pool alive at once
    — measured hang at 8 CPUs) and REPARTITIONED first: map_groups
    leaves schema-less empty blocks that the Arrow hash join rejects
    ('no match for key field'), and repartition absorbs them into
    typed blocks."""
    from .grouped import partitioned_apply, partitioned_drop_duplicates

    def _ren(ds, mapping):
        # Dataset.rename_columns requires Arrow blocks; these pipelines
        # carry pandas blocks, so rename inside a map
        return ds.map_batches(
            lambda b, _m=dict(mapping): b.rename(columns=_m),
            batch_format="pandas")

    e = partitioned_drop_duplicates(
        edges.select_columns([a_col, b_col]), [a_col, b_col],
        num_partitions=num_partitions).repartition(num_blocks).materialize()

    def start(p: pd.DataFrame) -> pd.DataFrame:
        w = p[a_col].drop_duplicates()
        return pd.DataFrame({"walk_id": w.astype("int64"),
                             "cur": w.astype("int64")})

    frontier = partitioned_apply(
        e, [a_col], start, num_partitions=num_partitions,
    ).repartition(num_blocks).materialize()
    for t in range(1, n_steps + 1):
        side_in, side_out = (a_col, b_col) if t % 2 == 1 else (b_col, a_col)
        cand = frontier.join(
            _ren(e, {side_in: "cur", side_out: "nxt"}),
            join_type="inner", on=("cur",), num_partitions=num_partitions)

        def pick(p: pd.DataFrame, _t=t) -> pd.DataFrame:
            w = p["walk_id"].to_numpy(np.int64)
            u = p["nxt"].to_numpy(np.int64)
            h = ((w % (1 << 31)) * 1315423911 + _t * 2654435761
                 + (u % (1 << 31)) * 97867) % (1 << 32)
            q = p.assign(h=h).sort_values(["walk_id", "h", "nxt"],
                                          kind="mergesort")
            win = q.drop_duplicates("walk_id", keep="first")
            win = win.drop(columns=["cur", "h"]).rename(
                columns={"nxt": f"n{_t}"})
            win["cur"] = win[f"n{_t}"]
            return win.reset_index(drop=True)

        frontier = partitioned_apply(
            cand, ["walk_id"], pick, num_partitions=num_partitions,
        ).repartition(num_blocks).materialize()

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop(columns=["cur"])

    return frontier.map_batches(finish, batch_format="pandas")


def _driver_label_propagation(e, id_a: str, id_b: str, iterations: int):
    """Driver-side label propagation for gated-small edge lists:
    identical synchronous semantics (mode of neighbour labels, ties →
    highest count then smallest label, multi-edges counted per row —
    the same convention as the distributed path), one numpy lexsort +
    run-length count per iteration, zero per-iteration Dataset
    executions."""
    import ray.data as rd

    pdf = e.to_pandas()
    if not len(pdf):
        return rd.from_pandas(pd.DataFrame({
            "node": pd.Series([], dtype="int64"),
            "label": pd.Series([], dtype="int64")}))
    a = pdf[id_a].to_numpy(np.int64)
    b = pdf[id_b].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    recv = np.concatenate([ia, ib])  # receiver node (index)
    nbr = np.concatenate([ib, ia])   # its neighbour on this edge
    lab = nodes.copy()               # label VALUES per node index
    for _ in range(iterations):
        nl = lab[nbr]
        order = np.lexsort((nl, recv))
        r_s, l_s = recv[order], nl[order]
        head = np.empty(len(r_s), dtype=bool)
        head[0] = True
        head[1:] = (r_s[1:] != r_s[:-1]) | (l_s[1:] != l_s[:-1])
        gidx = np.flatnonzero(head)
        counts = np.diff(np.append(gidx, len(r_s)))
        gr, gl = r_s[gidx], l_s[gidx]
        o2 = np.lexsort((gl, -counts, gr))  # count desc, label asc
        first = np.empty(len(o2), dtype=bool)
        first[0] = True
        first[1:] = gr[o2][1:] != gr[o2][:-1]
        sel = o2[first]
        new = lab.copy()
        new[gr[sel]] = gl[sel]
        lab = new
    return rd.from_pandas(pd.DataFrame({
        "node": nodes.astype("int64"),
        "label": lab.astype("int64")}))


def label_propagation(edges_ds, id_a: str, id_b: str, iterations: int = 2,
                      num_partitions: int = 32,
                      driver_edges_max: int = 2_000_000):
    """Synchronous label propagation (Raghavan et al. 2007) for
    community detection over an undirected edge list: labels start as
    node ids; each iteration every node adopts the most frequent label
    among its NEIGHBOURS (ties → highest count, then smallest label —
    the deterministic variant, so the result is a pure function of the
    data). ``iterations`` is fixed (the SQL oracle unrolls the same
    number), not run-to-convergence.

    Dual path on the same edge-count gate as
    :func:`connected_components`: at ≤ ``driver_edges_max`` edges the
    2-column int64 table is pulled once and each iteration is a numpy
    lexsort + run-length count (the two per-iteration hash exchanges
    below cost ~1 s of scheduling each at small scale — pure fixed
    overhead, not compute).

    Scale shape past the gate: the label table stays a Dataset; each
    iteration is a reduce-side merge — edge rows keyed by neighbour
    UNION label rows keyed by node co-locate in one hash exchange, the
    partition task attaches labels and pre-counts (node, label) pairs,
    and a second key-sized exchange picks the winner per node. No join
    actor pool: for a key-row × key-row merge the union+exchange is
    both the cheaper and the deterministic shape (cf.
    ``_join_components``, which needs the real hash join because edges
    carry payload)."""
    from .grouped import partitioned_apply

    e = edges_ds.select_columns([id_a, id_b]).materialize()
    if e.count() <= driver_edges_max:
        return _driver_label_propagation(e, id_a, id_b, iterations)

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": np.concatenate([b[id_b].to_numpy(), b[id_a].to_numpy()]),
            "node": np.concatenate([b[id_a].to_numpy(), b[id_b].to_numpy()]),
            "lab": np.int64(0),
            "is_lab": np.int8(0),
        })

    und = e.map_batches(undirect, batch_format="pandas").materialize()

    def seed_labels(b: pd.DataFrame) -> pd.DataFrame:
        n = pd.unique(b["node"].to_numpy())
        return pd.DataFrame({"key": n, "node": np.int64(0), "lab": n,
                             "is_lab": np.int8(1)})

    # distinct node set with label = node id (map-side pre-dedup; the
    # attach step dedups again after the co-locating exchange)
    labels = und.map_batches(seed_labels, batch_format="pandas")

    def attach_and_count(part: pd.DataFrame) -> pd.DataFrame:
        is_lab = part["is_lab"].to_numpy() == 1
        lm = part.loc[is_lab, ["key", "lab"]].drop_duplicates("key")
        ed = part.loc[~is_lab, ["key", "node"]]
        m = ed.merge(lm, on="key")
        g = m.groupby(["node", "lab"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    def pick(part: pd.DataFrame) -> pd.DataFrame:
        g = (part.groupby(["node", "lab"], sort=False)["n"].sum()
             .reset_index())
        g = g.sort_values(["node", "n", "lab"],
                          ascending=[True, False, True], kind="mergesort")
        out = g.drop_duplicates(subset=["node"], keep="first")
        return pd.DataFrame({"key": out["node"].to_numpy(),
                             "node": np.int64(0),
                             "lab": out["lab"].to_numpy(),
                             "is_lab": np.int8(1)})

    for _ in range(iterations):
        counted = partitioned_apply(und.union(labels), ["key"],
                                    attach_and_count, num_partitions)
        labels = partitioned_apply(counted, ["node"], pick,
                                   num_partitions,
                                   pre_combine=None).materialize()

    # node-sized result stays a Dataset — a 10^9-node caller is never
    # forced through the driver; query layers .to_pandas()+sort as needed
    # repartition merges the zero-column empty-partition blocks
    # map_groups can emit (they break downstream hash joins)
    return labels.map_batches(
        lambda b: pd.DataFrame(
            {"node": b["key"].to_numpy().astype("int64"),
             "label": b["lab"].to_numpy().astype("int64")}),
        batch_format="pandas").repartition(num_partitions)


def bfs_depth(edges_ds, seeds, src: str = "src", dst: str = "dst",
              max_iter: int = 100, driver_edges_max: int = 2_000_000):
    """Unweighted shortest-hop depth from a seed set over a DIRECTED
    edge list — the crawl-depth computation: seeds are depth 0, every
    reachable node's depth is the minimum over in-neighbours of
    depth+1, unreachable nodes are omitted. Reference capability
    analogue: the BFS frontier rounds of the crawl driver
    (`pacong/core/engine.py` run loop), recast as a graph measurement
    over an already-harvested link table (what "crawl depth ≤ k"
    budget policies and seed-set audits consume).

    Dual path, gated by edge count like :func:`connected_components`:

    * **driver** (≤ ``driver_edges_max`` edges): the 2-column int64
      edge table is pulled once and relaxed with vectorized
      ``np.minimum.at`` scatter rounds — exact, ZERO per-round Dataset
      executions, rounds bounded by the true depth.
    * **broadcast** (past the gate): the (nodes, depth) arrays are
      node-sized driver state broadcast via the object store; each
      round is ONE streaming map pass over the edges emitting
      batch-local (dst, candidate-depth) minima — the edge list never
      lands on the driver. Raises if ``max_iter`` rounds exhaust
      without convergence (an unconverged depth table is silently
      wrong, not an approximation).

    Returns a Dataset of (node:int64, depth:int64), reachable nodes
    only; small callers add ``.to_pandas()`` at the query layer."""
    import ray
    import ray.data as rd

    seeds = np.asarray(sorted(set(int(s) for s in seeds)), dtype=np.int64)
    if not len(seeds):
        raise ValueError("bfs_depth: empty seed set")
    INF = np.iinfo(np.int64).max

    if edges_ds.count() <= driver_edges_max:
        pdf = edges_ds.select_columns([src, dst]).to_pandas()
        a = pdf[src].to_numpy(np.int64)
        b = pdf[dst].to_numpy(np.int64)
        nodes = np.unique(np.concatenate([a, b, seeds]))
        ia = np.searchsorted(nodes, a)
        ib = np.searchsorted(nodes, b)
        depth = np.full(len(nodes), INF, dtype=np.int64)
        depth[np.searchsorted(nodes, seeds)] = 0
        # min-relaxation to fixpoint: each non-converged round extends
        # every shortest path by ≥1 hop, so rounds ≤ max finite depth
        for _ in range(len(nodes) + 2):
            known = depth[ia] != INF
            new = depth.copy()
            np.minimum.at(new, ib[known], depth[ia[known]] + 1)
            if np.array_equal(new, depth):
                break
            depth = new
        else:  # unreachable by the depth bound; fail loudly, not wrong
            raise RuntimeError("bfs_depth(driver path): no convergence "
                               "within the depth bound")
        keep = depth != INF
        return rd.from_pandas(pd.DataFrame({
            "node": nodes[keep].astype("int64"),
            "depth": depth[keep].astype("int64")}))

    # node set: batch-local uniques → node-sized driver union
    parts = edges_ds.map_batches(
        lambda bt: pd.DataFrame(
            {"n": pd.unique(pd.concat([bt[src], bt[dst]]))}),
        batch_format="pandas").to_pandas()
    nodes = np.unique(np.concatenate(
        [pd.unique(parts["n"]).astype(np.int64), seeds]))
    depth = np.full(len(nodes), INF, dtype=np.int64)
    depth[np.searchsorted(nodes, seeds)] = 0

    converged = False
    for _ in range(max_iter):
        ref = ray.put((nodes, depth))

        def step(batch: pd.DataFrame) -> pd.DataFrame:
            ns, dp = ray.get(ref)
            a = batch[src].to_numpy(np.int64)
            b = batch[dst].to_numpy(np.int64)
            da = dp[np.searchsorted(ns, a)]
            known = da != INF
            if not known.any():
                return pd.DataFrame({"n": pd.Series([], dtype="int64"),
                                     "d": pd.Series([], dtype="int64")})
            return (pd.DataFrame({"n": b[known], "d": da[known] + 1})
                    .groupby("n", sort=False)["d"].min().reset_index())

        part = edges_ds.map_batches(step, batch_format="pandas").to_pandas()
        new = depth.copy()
        if len(part):
            mins = part.groupby("n")["d"].min()
            idx = np.searchsorted(nodes, mins.index.to_numpy())
            np.minimum.at(new, idx, mins.to_numpy())
        if np.array_equal(new, depth):
            converged = True
            break
        depth = new

    if not converged:
        raise RuntimeError(
            f"bfs_depth: no convergence after {max_iter} rounds — a "
            f"shortest path exceeds max_iter hops; raise max_iter "
            f"(depths would be silently wrong)")
    keep = depth != INF
    return rd.from_pandas(pd.DataFrame({
        "node": nodes[keep].astype("int64"),
        "depth": depth[keep].astype("int64")}))


def resolve_redirects(redirects_ds, src: str = "src", dst: str = "dst",
                      max_iter: int = 64, num_partitions: int = 16,
                      driver_edges_max: int = 2_000_000,
                      force_join_path: bool = False):
    """Redirect-chain resolution: follow src → dst hops to each
    source's TERMINAL target (a node with no outgoing redirect),
    counting hops — the canonicalizer table a frontier consults so an
    alias URL is charged to its final location. Sources are unique by
    contract (one redirect per URL; duplicated sources raise). A
    self-redirect resolves to itself in one hop; longer cycles never
    converge and raise loudly instead of returning wrong targets.
    Reference capability analogue: per-fetch redirect following in
    `pacong`'s HTTP session, lifted to a set-at-once table the
    politeness/seen stages can consume.

    Both paths run POINTER DOUBLING — round r resolves chains of
    length ≤ 2^r, so rounds are O(log max-chain), not O(chain):

    * **driver** (≤ ``driver_edges_max`` rows): two sorted numpy
      arrays, each round one searchsorted + gather; hop counts double
      by adding the jumped-through row's count.
    * **join** (past the gate, or ``force_join_path=True``): the
      resolve table stays a distributed Dataset; each round unions it
      with itself as a lookup side and one coarse hash exchange
      re-points every non-terminal row — no node-sized driver state.

    Returns a Dataset of (src:int64, target:int64, n_hops:int64)."""
    import ray.data as rd

    n_rows = redirects_ds.count()
    if not force_join_path and n_rows <= driver_edges_max:
        pdf = redirects_ds.select_columns([src, dst]).to_pandas()
        if not len(pdf):
            return rd.from_pandas(pd.DataFrame(
                {"src": pd.Series([], dtype="int64"),
                 "target": pd.Series([], dtype="int64"),
                 "n_hops": pd.Series([], dtype="int64")}))
        s = pdf[src].to_numpy(np.int64)
        order = np.argsort(s, kind="mergesort")
        s = s[order]
        if len(s) > 1 and (s[1:] == s[:-1]).any():
            raise ValueError("resolve_redirects: duplicate source URLs")
        t = pdf[dst].to_numpy(np.int64)[order]
        orig_t = t.copy()
        hops = np.ones(len(s), dtype=np.int64)
        bound = int(np.ceil(np.log2(max(len(s), 2)))) + 2
        for _ in range(bound):
            idx = np.searchsorted(s, t)
            j = np.minimum(idx, len(s) - 1)
            # jump through t when t is itself a source whose target
            # moves; a current self-loop (t[j] == t) is a fixpoint
            hit = (idx < len(s)) & (s[j] == t) & (t[j] != t)
            if not hit.any():
                break
            t = np.where(hit, t[j], t)
            hops = np.where(hit, hops + hops[j], hops)
        else:
            raise RuntimeError(
                "resolve_redirects: no convergence within the doubling "
                "bound — the redirect table contains a cycle")
        # Even-length cycles collapse to fixpoints instead of failing
        # to converge: every such node now points at itself without
        # being an ORIGINAL self-redirect. Refuse to return them.
        if ((t == s) & (orig_t != s)).any():
            raise RuntimeError(
                "resolve_redirects: the redirect table contains a cycle")
        return rd.from_pandas(pd.DataFrame({
            "src": s.astype("int64"), "target": t.astype("int64"),
            "n_hops": hops.astype("int64")}))

    from .grouped import partitioned_apply

    resolve = redirects_ds.map_batches(
        lambda b: pd.DataFrame({"s": b[src].to_numpy(np.int64),
                                "t": b[dst].to_numpy(np.int64),
                                "o": b[dst].to_numpy(np.int64),
                                "h": np.ones(len(b), dtype=np.int64)}),
        batch_format="pandas").repartition(num_partitions).materialize()

    def jump(part: pd.DataFrame) -> pd.DataFrame:
        look = part[part["side"] == 1]
        ls = look["k"].to_numpy(np.int64)
        o = np.argsort(ls, kind="mergesort")
        ls, lt, lh = (ls[o], look["t"].to_numpy(np.int64)[o],
                      look["h"].to_numpy(np.int64)[o])
        if len(ls) > 1 and (ls[1:] == ls[:-1]).any():
            raise ValueError("resolve_redirects: duplicate source URLs")
        car = part[part["side"] == 0]
        k = car["k"].to_numpy(np.int64)
        h = car["h"].to_numpy(np.int64)
        if len(ls):
            idx = np.minimum(np.searchsorted(ls, k), len(ls) - 1)
            hit = (ls[idx] == k) & (lt[idx] != k)  # self-loop = fixpoint
            nt = np.where(hit, lt[idx], k)
            nh = np.where(hit, h + lh[idx], h)
            ch = hit
        else:
            nt, nh, ch = k, h, np.zeros(len(k), dtype=bool)
        return pd.DataFrame({"s": car["s"].to_numpy(np.int64), "t": nt,
                             "o": car["o"].to_numpy(np.int64),
                             "h": nh, "ch": ch.astype(np.int64)})

    converged = False
    for _ in range(max_iter):
        tagged = resolve.map_batches(
            lambda b: pd.DataFrame({"k": b["t"], "s": b["s"], "t": b["t"],
                                    "o": b["o"], "h": b["h"],
                                    "side": np.zeros(len(b), dtype=np.int64)}),
            batch_format="pandas").union(resolve.map_batches(
                lambda b: pd.DataFrame(
                    {"k": b["s"], "s": b["s"], "t": b["t"], "o": b["o"],
                     "h": b["h"],
                     "side": np.ones(len(b), dtype=np.int64)}),
                batch_format="pandas"))
        nxt = partitioned_apply(tagged, ["k"], jump,
                                num_partitions).materialize()
        changed = int(nxt.map_batches(
            lambda b: pd.DataFrame({"c": [int(b["ch"].sum())]}),
            batch_format="pandas").sum("c") or 0)
        resolve = nxt.map_batches(
            lambda b: b[["s", "t", "o", "h"]],
            batch_format="pandas").repartition(
            num_partitions).materialize()  # zero-column-block note above
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"resolve_redirects: no convergence after {max_iter} doubling "
            f"rounds — the redirect table contains a cycle")
    # Even-length cycles collapse to fixpoints and converge: nodes now
    # point at themselves without being ORIGINAL self-redirects.
    fake = int(resolve.map_batches(
        lambda b: pd.DataFrame({"c": [int(((b["t"].to_numpy(np.int64)
                                            == b["s"].to_numpy(np.int64))
                                           & (b["o"].to_numpy(np.int64)
                                              != b["s"].to_numpy(np.int64))
                                           ).sum())]}),
        batch_format="pandas").sum("c") or 0)
    if fake:
        raise RuntimeError(
            "resolve_redirects: the redirect table contains a cycle")
    return resolve.map_batches(
        lambda b: pd.DataFrame({"src": b["s"].to_numpy().astype("int64"),
                                "target": b["t"].to_numpy().astype("int64"),
                                "n_hops": b["h"].to_numpy().astype("int64")}),
        batch_format="pandas")


def kcore(edges_ds, k: int, src: str = "src", dst: str = "dst",
          max_iter: int = 200, driver_edges_max: int = 2_000_000):
    """k-core decomposition membership: iteratively peel every node of
    UNDIRECTED degree < k (all at once per round) until a fixpoint;
    the surviving subgraph is the k-core (Seidman 1983). The standard
    link-graph densification filter — spam farms and isolated tendrils
    peel away, the mutually-reinforced core (what PageRank-style
    scoring should run over) remains. Target-side addition (the
    reference harvests links but has no graph analytics).

    Input is an edge list in either orientation, duplicates allowed:
    edges are canonicalized to distinct (lo, hi) pairs with self-loops
    dropped, so degree = number of DISTINCT neighbours. Dual path,
    gated by edge count like :func:`bfs_depth`:

    * **driver** (≤ ``driver_edges_max`` distinct edges): two int64
      arrays, each peel round one boolean gather + ``np.bincount`` —
      zero per-round Dataset executions.
    * **broadcast** (past the gate): the (nodes, alive) arrays are
      node-sized driver state broadcast via the object store; each
      round is ONE streaming map pass over the distinct-edge Dataset
      emitting batch-local degree partials — the edge list never lands
      on the driver.

    Peel rounds are bounded by the longest tendril, not the node
    count, for real link graphs; raises on ``max_iter`` exhaustion
    (an unconverged core is silently wrong). Returns a Dataset of
    (node:int64, core_deg:int64) — members of the k-core with their
    within-core degree."""
    import ray
    import ray.data as rd

    from .grouped import partitioned_apply

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        a = b[src].to_numpy(np.int64)
        c = b[dst].to_numpy(np.int64)
        keep = a != c
        a, c = a[keep], c[keep]
        return (pd.DataFrame({"a": np.minimum(a, c), "b": np.maximum(a, c)})
                .drop_duplicates())

    # canonicalize first (map pass), then one distinct exchange
    dedup = partitioned_apply(
        edges_ds.map_batches(canon, batch_format="pandas"), ["a", "b"],
        lambda p: p.drop_duplicates(ignore_index=True))
    dedup = dedup.materialize()
    n_edges = dedup.count()

    def _result(nodes: np.ndarray, alive: np.ndarray, deg: np.ndarray):
        keep = alive
        return rd.from_pandas(pd.DataFrame({
            "node": nodes[keep].astype("int64"),
            "core_deg": deg[keep].astype("int64")}))

    if n_edges <= driver_edges_max:
        pdf = dedup.to_pandas()
        a = pdf["a"].to_numpy(np.int64)
        b = pdf["b"].to_numpy(np.int64)
        nodes = np.unique(np.concatenate([a, b]))
        ia = np.searchsorted(nodes, a)
        ib = np.searchsorted(nodes, b)
        alive = np.ones(len(nodes), dtype=bool)
        deg = np.zeros(len(nodes), dtype=np.int64)
        for _ in range(max_iter):
            m = alive[ia] & alive[ib]
            deg = (np.bincount(ia[m], minlength=len(nodes))
                   + np.bincount(ib[m], minlength=len(nodes)))
            new_alive = alive & (deg >= k)
            if np.array_equal(new_alive, alive):
                return _result(nodes, alive, deg)
            alive = new_alive
        raise RuntimeError(f"kcore: no fixpoint after {max_iter} rounds")

    # node set: batch-local uniques → node-sized driver union
    parts = dedup.map_batches(
        lambda bt: pd.DataFrame(
            {"n": pd.unique(pd.concat([bt["a"], bt["b"]]))}),
        batch_format="pandas").to_pandas()
    nodes = np.unique(parts["n"].to_numpy(np.int64))
    alive = np.ones(len(nodes), dtype=bool)
    for _ in range(max_iter):
        ref = ray.put((nodes, alive))

        def degrees(batch: pd.DataFrame) -> pd.DataFrame:
            ns, al = ray.get(ref)
            a = np.searchsorted(ns, batch["a"].to_numpy(np.int64))
            b = np.searchsorted(ns, batch["b"].to_numpy(np.int64))
            m = al[a] & al[b]
            cnt = np.bincount(a[m], minlength=len(ns))
            cnt += np.bincount(b[m], minlength=len(ns))
            nz = np.flatnonzero(cnt)
            return pd.DataFrame({"n": ns[nz], "d": cnt[nz]})

        part = dedup.map_batches(degrees, batch_format="pandas").to_pandas()
        deg = np.zeros(len(nodes), dtype=np.int64)
        if len(part):
            idx = np.searchsorted(nodes, part["n"].to_numpy(np.int64))
            np.add.at(deg, idx, part["d"].to_numpy(np.int64))
        new_alive = alive & (deg >= k)
        if np.array_equal(new_alive, alive):
            return _result(nodes, alive, deg)
        alive = new_alive
    raise RuntimeError(f"kcore: no fixpoint after {max_iter} rounds")


def local_clustering(edges_ds, a_col: str = "id_a", b_col: str = "id_b",
                     num_partitions: int = 32,
                     broadcast_gate: int = 20_000_000):
    """Per-node local clustering coefficient over a distinct (a < b)
    edge list: lcc(v) = 2·t(v) / (deg(v)·(deg(v)−1)) for deg ≥ 2 —
    the node-resolution companion of :func:`triangle_count` ("which
    pages sit inside tight link cliques?").

    Same id-orientation wedge scheme: shuffle 1 co-locates edges by
    ``a``; wedges close map-side against the broadcast sorted packed
    edge-key array (gate-checked, 31-bit ids — past the gate use the
    wedge-join path of ``triangle_count`` and extend it per-node);
    each closed triangle (a, b, c) emits one count increment PER
    CORNER, and increments fold through one node-keyed coarse-hash
    exchange alongside the degree partials. Returns a Dataset of
    (node:int64, degree:int64, n_tri:int64, lcc:float64-rounded-6)
    for nodes with degree ≥ 2."""
    import ray

    from ..functions.rounding import sql_round
    from .grouped import partitioned_apply

    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges > broadcast_gate:
        raise ValueError(
            f"local_clustering: {n_edges} edges exceeds the broadcast "
            f"gate ({broadcast_gate}); extend triangle_count's "
            f"wedge-join path per-node for this size")
    keys_parts = []
    for b in edges_ds.iter_batches(batch_format="pandas"):
        a = b[a_col].to_numpy(np.int64)
        bb = b[b_col].to_numpy(np.int64)
        if len(a) and (a.min() < 0 or bb.min() < 0
                       or max(a.max(), bb.max()) >= (1 << 31)):
            raise ValueError("local_clustering: ids must be 31-bit "
                             "for the packed edge-key broadcast")
        keys_parts.append((a << 32) | bb)
    edge_keys = np.sort(np.concatenate(keys_parts)
                        if keys_parts else np.array([], np.int64))
    ref = ray.put(edge_keys)

    def tri_and_deg(part: pd.DataFrame) -> pd.DataFrame:
        ek = ray.get(ref)
        part = (part.drop_duplicates(subset=[a_col, b_col])
                .sort_values([a_col, b_col], kind="mergesort"))
        keys = part[a_col].to_numpy()
        nbrs = part[b_col].to_numpy(np.int64)
        deg = pd.concat([
            pd.Series(keys), pd.Series(part[b_col].to_numpy())
        ]).value_counts()
        frames = [pd.DataFrame({"node": deg.index.to_numpy(np.int64),
                                "deg": deg.to_numpy(np.int64),
                                "tri": np.int64(0)})]
        ia, ib = _grouped_triu(keys)
        if len(ia):
            wk = (nbrs[ia] << 32) | nbrs[ib]
            pos = np.searchsorted(ek, wk)
            ok = pos < len(ek)
            hit = np.zeros(len(wk), dtype=bool)
            hit[ok] = ek[pos[ok]] == wk[ok]
            corners = np.concatenate([keys[ia[hit]].astype(np.int64),
                                      nbrs[ia[hit]], nbrs[ib[hit]]])
            if len(corners):
                tc = pd.Series(corners).value_counts()
                frames.append(pd.DataFrame(
                    {"node": tc.index.to_numpy(np.int64),
                     "deg": np.int64(0),
                     "tri": tc.to_numpy(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    partials = partitioned_apply(edges_ds, [a_col], tri_and_deg,
                                 num_partitions=num_partitions)

    def fold(p: pd.DataFrame) -> pd.DataFrame:
        g = (p.groupby("node", sort=False)[["deg", "tri"]].sum()
             .reset_index())
        g = g[g["deg"] >= 2]
        d = g["deg"].to_numpy(np.float64)
        return pd.DataFrame({
            "node": g["node"].astype("int64"),
            "degree": g["deg"].astype("int64"),
            "n_tri": g["tri"].astype("int64"),
            "lcc": sql_round(2.0 * g["tri"].to_numpy(np.float64)
                             / (d * (d - 1.0)), 6)})

    return partitioned_apply(partials, ["node"], fold,
                             num_partitions=num_partitions)
