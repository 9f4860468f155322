"""Similarity search over embedding columns (training-data suite).

- brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (``ray.put`` once, read per actor) — the exact baseline;
- IVF-style bucketed variant: coarse k-means-free bucketing by argmax
  against a seeded random projection codebook, probing only the
  closest buckets — the 100 TB path (bucket assignment is one shuffle;
  queries touch ~n/probes of the corpus).
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..config import auto_concurrency
from ..functions.rounding import sql_round


def _as_matrix(column) -> np.ndarray:
    """list<float> / fixed_size_list<float> Arrow column → (n, d)
    float32 matrix without a Python-object round-trip: flatten the list
    values buffer (zero-copy for non-null fixed-width data) and
    reshape. Assumes uniform embedding dim (enforced by reshape)."""
    arr = column.combine_chunks() if hasattr(column, "combine_chunks") else column
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float32)
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
        flat = arr.values.to_numpy(zero_copy_only=False)
    else:
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // n
    return flat.astype(np.float32, copy=False).reshape(n, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """map_batches stage: per batch, cosine scores of all rows against
    the broadcast query matrix; emits (query_id, vec_id, score) for the
    per-batch top-k. A final small groupby(query_id) top-k merge gives
    the exact global answer — classic partial top-k combine."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id", vec_col: str = "embedding"):
        q = ray.get(queries_ref)  # once per actor
        self.qids = np.asarray(q["ids"])
        self.qmat = _normalize(np.asarray(q["vecs"], dtype=np.float32))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        mat = _normalize(_as_matrix(batch[self.vec_col]))
        scores = mat @ self.qmat.T  # (n, q)
        n, nq = scores.shape
        k = min(self.k, n)
        if k < n:
            top = np.argpartition(-scores, k - 1, axis=0)[:k]  # (k, q)
        else:
            top = np.broadcast_to(np.arange(n)[:, None], (n, nq))
        out_q = np.repeat(self.qids, top.shape[0])
        out_id = ids[top.T.ravel()]
        out_s = np.take_along_axis(scores, top, axis=0).T.ravel()
        return pa.table(
            {
                "query_id": pa.array(out_q.astype(np.int64), pa.int64()),
                self.id_col: pa.array(out_id.astype(np.int64), pa.int64()),
                "score": pa.array(out_s.astype(np.float64), pa.float64()),
            }
        )


def cosine_topk(ds, query_ids, query_vecs, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding", concurrency: int | None = None):
    """Exact brute-force cosine top-k for a (small) query set against the
    full embedding dataset. Two-stage: per-batch partial top-k (actor
    pool, matmul) → groupby(query_id) exact merge (tiny shuffle)."""
    concurrency = concurrency or auto_concurrency()
    ref = ray.put({"ids": list(query_ids), "vecs": [list(v) for v in query_vecs]})
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k, "id_col": id_col, "vec_col": vec_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        # round before ranking so Ray and the DuckDB oracle order ties
        # identically regardless of float summation order
        g = group.copy()
        g["score"] = sql_round(g["score"], 6)
        g = g.sort_values(["score", id_col], ascending=[False, True], kind="mergesort").head(k)
        g["rank"] = range(1, len(g) + 1)
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


class IVFBucketAssign:
    """map_batches stage: assign each vector to its nearest of B seeded
    random-projection centroids (argmax dot). At scale this becomes the
    partitioning key so each query probes only a few buckets."""

    def __init__(self, dim: int, n_buckets: int = 16, seed: int = 11, vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.centroids = _normalize(rng.standard_normal((n_buckets, dim)).astype(np.float32))
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_as_matrix(batch[self.vec_col]))
        bucket = np.argmax(mat @ self.centroids.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_bucket", pa.array(bucket, pa.int32()))


def ivf_cosine_topk(ds, query_ids, query_vecs, dim: int, k: int = 10, n_buckets: int = 16,
                    n_probe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Approximate cosine top-k: bucket the corpus once (IVF-style), then
    brute-force only the n_probe buckets nearest each query. Recall <
    1.0 by design; the exact path is ``cosine_topk``."""
    rng_assign = IVFBucketAssign(dim, n_buckets)
    qmat = _normalize(np.asarray([list(v) for v in query_vecs], dtype=np.float32))
    probe = np.argsort(-(qmat @ rng_assign.centroids.T), axis=1)[:, :n_probe]
    wanted = np.array(sorted({int(b) for row in probe for b in row}), dtype=np.int32)
    wanted_ref = ray.put(wanted)

    def bucket_filter(batch: pa.Table) -> pa.Table:
        # vectorized membership mask — never a per-row Python filter
        b = batch["ivf_bucket"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(b, ray.get(wanted_ref))))

    # At scale the bucket assignment is materialized ONCE (written
    # partitioned by ivf_bucket) and reused across query batches; here a
    # single fused assign→filter pass serves the one query set.
    bucketed = ds.map_batches(
        IVFBucketAssign,
        fn_constructor_kwargs={"dim": dim, "n_buckets": n_buckets, "vec_col": vec_col},
        batch_format="pyarrow",
        concurrency=auto_concurrency(),
    ).map_batches(bucket_filter, batch_format="pyarrow")
    return cosine_topk(bucketed, query_ids, query_vecs, k, id_col, vec_col)


def embedding_near_dup_pairs(ds, threshold: float = 0.95, dim: int = 64,
                             n_buckets: int | None = None, target_bucket_rows: int = 4096,
                             id_col: str = "vec_id", vec_col: str = "embedding"):
    """Embedding-cosine near-dup: bucket by random-projection sign bits
    (LSH for cosine), compare only within buckets. The bucket-bit count
    SCALES with corpus size (≈ corpus / target_bucket_rows buckets,
    min 32) so the within-bucket all-pairs stays bounded at ~4k rows
    per bucket instead of O(n²/const) as the corpus grows."""
    if n_buckets is None:
        n = ds.count()  # parquet metadata count — no data scan
        n_buckets = max(32, 1 << int(np.ceil(np.log2(max(1, n // target_bucket_rows + 1)))))
    n_bits = int(np.log2(n_buckets))

    class SignLSH:
        def __init__(self):
            rng = np.random.default_rng(13)
            self.planes = rng.standard_normal((n_bits, dim)).astype(np.float32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _normalize(_as_matrix(batch[vec_col]))
            bits = (mat @ self.planes.T) > 0
            key = np.zeros(len(mat), dtype=np.int64)
            for b in range(bits.shape[1]):
                key = (key << 1) | bits[:, b]
            return pa.table(
                {
                    "bucket": pa.array(key, pa.int64()),
                    id_col: batch[id_col],
                    "vec": pa.array([v.tobytes() for v in mat], pa.binary()),
                }
            )

    def verify_partition(part: pd.DataFrame) -> pd.DataFrame:
        """One numpy pass over EVERY bucket in the hash partition —
        not one Python call per bucket (bucket count grows as
        corpus/target_bucket_rows, so per-bucket `map_groups` tasks
        are ~250k at 10^9 rows; same fix as
        dedup._verify_lsh_partition)."""
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"),
             "id_b": pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype="float64")})
        part = part.drop_duplicates(subset=["bucket", id_col]).sort_values(
            ["bucket", id_col], kind="mergesort")
        if part.empty:
            return empty
        mat = np.frombuffer(b"".join(part["vec"]),
                            dtype=np.float32).reshape(-1, dim)
        keys = part["bucket"].to_numpy()
        ids = part[id_col].to_numpy()
        starts = np.concatenate(
            [[0], np.nonzero(np.diff(keys))[0] + 1, [len(keys)]])
        a_out, b_out, s_out = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            g = e - s
            if g < 2:
                continue
            sims = mat[s:e] @ mat[s:e].T
            iu, ju = np.triu_indices(g, 1)
            hit = sims[iu, ju] >= threshold
            if hit.any():
                a_out.append(ids[s + iu[hit]])
                b_out.append(ids[s + ju[hit]])
                s_out.append(sims[iu[hit], ju[hit]].astype(np.float64))
        if not a_out:
            return empty
        return pd.DataFrame(
            {"id_a": np.concatenate(a_out).astype("int64"),
             "id_b": np.concatenate(b_out).astype("int64"),
             "cosine": np.round(np.concatenate(s_out), 6)})

    from .grouped import partitioned_apply

    exploded = ds.map_batches(SignLSH, batch_format="pyarrow", concurrency=auto_concurrency())
    return partitioned_apply(exploded, ["bucket"], verify_partition,
                             num_partitions=32)


def embedding_allpairs_exact(ds, threshold: float = 0.35,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             max_corpus_rows: int = 200_000):
    """EXACT all-pairs cosine near-dup — the small-subset exact path
    (``embedding_near_dup_pairs``'s sign-LSH is the 100-TB path, same
    contract). The normalized corpus matrix is broadcast ONCE
    (``ray.put``, float64 so scores agree with a double-precision SQL
    oracle at 6 decimals); the left side then STREAMS through
    ``map_batches`` — each batch does one C matmul against the
    broadcast and keeps (id_a < id_b, round(cos,6) >= threshold). No
    shuffle; quadratic in corpus size by definition, so it refuses
    corpora above ``max_corpus_rows``."""
    corpus = pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if corpus.num_rows > max_corpus_rows:
        raise ValueError(
            f"exact all-pairs is the small-subset path (n={corpus.num_rows} > "
            f"{max_corpus_rows}); use embedding_near_dup_pairs for large corpora")
    c_ids = np.asarray(corpus[id_col].to_pylist(), dtype=np.int64)
    c_mat = _normalize(_as_matrix(corpus[vec_col]).astype(np.float64))
    ref = ray.put({"ids": c_ids, "mat": c_mat})

    class AllPairs:
        def __init__(self):
            c = ray.get(ref)  # once per actor
            self.c_ids, self.c_mat = c["ids"], c["mat"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            b_ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            b_mat = _normalize(_as_matrix(batch[vec_col]).astype(np.float64))
            sims = sql_round(b_mat @ self.c_mat.T, 6)
            keep = (sims >= threshold) & (self.c_ids[None, :] > b_ids[:, None])
            bi, ci = np.nonzero(keep)
            return pa.table(
                {
                    "id_a": pa.array(b_ids[bi], pa.int64()),
                    "id_b": pa.array(self.c_ids[ci], pa.int64()),
                    "cosine": pa.array(sims[bi, ci], pa.float64()),
                }
            )

    return ds.map_batches(AllPairs, batch_format="pyarrow", concurrency=auto_concurrency())


def ivf_build_index(ds, dim: int, path: str, n_buckets: int = 16,
                    vec_col: str = "embedding", concurrency: int | None = None,
                    input_fingerprint: str | None = None) -> str:
    """Materialize the IVF bucket assignment ONCE as hive-partitioned
    parquet (one directory per ivf_bucket). This is the corpus-scale
    complement to ``ivf_cosine_topk``'s fused assign→filter: the
    assignment pass runs once, and every subsequent query batch reads
    ONLY its probed buckets' partitions (partition pruning at the
    read), instead of re-bucketing the corpus per query set.

    ``input_fingerprint`` makes the build idempotent (the point of a
    MATERIALIZED index): when a ``_BUILT.json`` marker with the same
    fingerprint + params already exists, the build is skipped — the
    same resume-by-fingerprint rule as the lancelike image sink."""
    import json
    import os
    import shutil

    marker = os.path.join(path, "_BUILT.json")
    if input_fingerprint and os.path.exists(marker):
        meta = json.load(open(marker))
        if (meta.get("input_fingerprint") == input_fingerprint
                and meta.get("n_buckets") == n_buckets
                and meta.get("dim") == dim):
            return path
    if os.path.exists(path):
        shutil.rmtree(path)
    ds.map_batches(
        IVFBucketAssign,
        fn_constructor_kwargs={"dim": dim, "n_buckets": n_buckets, "vec_col": vec_col},
        batch_format="pyarrow",
        concurrency=concurrency or auto_concurrency(),
    ).write_parquet(path, partition_cols=["ivf_bucket"])
    if input_fingerprint:
        with open(marker, "w") as f:
            json.dump({"input_fingerprint": input_fingerprint,
                       "n_buckets": n_buckets, "dim": dim}, f)
    return path


def ivf_query_index(path: str, query_ids, query_vecs, dim: int, k: int = 10,
                    n_buckets: int = 16, n_probe: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding"):
    """Approximate cosine top-k against a prebuilt IVF index: derive the
    probed buckets from the (deterministic, seed-shared) codebook, read
    only those hive partitions, brute-force within them. Identical
    results to ``ivf_cosine_topk`` on the same corpus/params."""
    import ray.data as rd

    assign = IVFBucketAssign(dim, n_buckets)
    qmat = _normalize(np.asarray([list(v) for v in query_vecs], dtype=np.float32))
    probe = np.argsort(-(qmat @ assign.centroids.T), axis=1)[:, :n_probe]
    wanted = sorted({int(b) for row in probe for b in row})
    # partition-pruned read: only the probed buckets' files are opened
    import os

    dirs = [f"{path}/ivf_bucket={b}" for b in wanted]
    paths = [
        os.path.join(d, f)
        for d in dirs
        if os.path.isdir(d)
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not paths:
        import pandas as pd

        return rd.from_pandas(pd.DataFrame(
            {"query_id": pd.Series(dtype="int64"), id_col: pd.Series(dtype="int64"),
             "score": pd.Series(dtype="float64"), "rank": pd.Series(dtype="int64")}))
    ds = rd.read_parquet(paths, columns=[id_col, vec_col])
    return cosine_topk(ds, query_ids, query_vecs, k, id_col, vec_col)


def kmeans_assign_step(ds, k: int = 8, id_col: str = "vec_id",
                       vec_col: str = "embedding", ndigits: int = 6,
                       keep_cols: list[str] | None = None):
    """One Lloyd-iteration ASSIGNMENT over the embedding corpus with
    fixed seed centroids (the first ``k`` vectors by id, the
    deterministic k-means++ stand-in): broadcast the (k, d) centroid
    matrix once (``ray.put``), assign per batch via vectorized squared-L2
    argmin, emit (id, cluster, d2). Zero data shuffle — the canonical
    distributed k-means shape; a full Lloyd pass is this stage plus a
    tiny per-cluster mean combine, iterated with re-broadcast
    centroids.

    Ties (two centroids at the exact same double distance) break
    toward the smaller cluster id, mirroring SQL
    ``row_number() ... ORDER BY d2, cid``."""
    seeds = ds.filter(expr=f"{id_col} < {k}").take_all()
    seeds.sort(key=lambda r: r[id_col])
    cmat = np.asarray([list(r[vec_col]) for r in seeds], dtype=np.float64)
    cref = ray.put(cmat)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)  # (k, d) float64, from the object store
        m = _as_matrix(batch[vec_col]).astype(np.float64)
        # direct (x - c)^2 per element, matching the SQL replay's
        # list_transform term order (the expansion |x|^2 - 2xc + |c|^2
        # has different FP error); (B, k, d) stays small at batch size
        d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cluster = np.argmin(d2, axis=1).astype(np.int64)
        best = d2[np.arange(len(m)), cluster]
        cols = {
            id_col: batch[id_col],
            "cluster": pa.array(cluster),
            "d2": pa.array(sql_round(best, ndigits)),
        }
        for c in (keep_cols or []):
            cols[c] = batch[c]
        return pa.table(cols)

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_lloyd(ds, k: int = 8, iterations: int = 2, id_col: str = "vec_id",
                 vec_col: str = "embedding", ndigits: int = 6):
    """Full distributed Lloyd's k-means: ``iterations`` assignments with
    a centroid update between consecutive ones (so ``iterations=2`` =
    assign → update → assign). Each assignment is the zero-shuffle
    broadcast pattern of :func:`kmeans_assign_step`; each update is a
    map-side partial (per-batch per-cluster vector sum + count) whose
    combine is k×batches tiny rows on the driver — the only data that
    ever leaves the workers. Scale-independent of corpus size."""
    seeds = ds.filter(expr=f"{id_col} < {k}").take_all()
    seeds.sort(key=lambda r: r[id_col])
    cmat = np.asarray([list(r[vec_col]) for r in seeds], dtype=np.float64)

    def assign_tables(cref):
        def assign(batch: pa.Table) -> pa.Table:
            cents = ray.get(cref)
            m = _as_matrix(batch[vec_col]).astype(np.float64)
            d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            cluster = np.argmin(d2, axis=1).astype(np.int64)
            best = d2[np.arange(len(m)), cluster]
            return pa.table({
                id_col: batch[id_col],
                "cluster": pa.array(cluster),
                "d2": pa.array(sql_round(best, ndigits)),
            })
        return assign

    for _ in range(iterations - 1):
        cref = ray.put(cmat)

        def partial_update(batch: pa.Table, _cref=cref) -> pa.Table:
            cents = ray.get(_cref)
            m = _as_matrix(batch[vec_col]).astype(np.float64)
            d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            cluster = np.argmin(d2, axis=1)
            kk, d = cents.shape
            sums = np.zeros((kk, d), dtype=np.float64)
            np.add.at(sums, cluster, m)
            counts = np.bincount(cluster, minlength=kk).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(kk, dtype=np.int64)),
                "n": pa.array(counts),
                "vsum": pa.array(list(sums), pa.list_(pa.float64())),
            })

        parts = ds.map_batches(partial_update, batch_format="pyarrow").to_pandas()
        kk, d = cmat.shape
        sums = np.zeros((kk, d)); counts = np.zeros(kk, dtype=np.int64)
        for _, row in parts.iterrows():  # k×batches rows — tiny
            sums[row["cluster"]] += np.asarray(row["vsum"])
            counts[row["cluster"]] += row["n"]
        nonempty = counts > 0
        cmat = cmat.copy()
        cmat[nonempty] = sums[nonempty] / counts[nonempty, None]

    return ds.map_batches(assign_tables(ray.put(cmat)), batch_format="pyarrow")


def gram_matrix(ds, vec_col: str, ndigits: int = 4) -> pd.DataFrame:
    """Distributed Gram matrix Σ xᵀx over an embedding column — the
    linear-algebra primitive behind PCA / covariance / whitening at
    corpus scale. Each batch contributes one d×d float64 partial
    (X_bᵀ X_b, a single BLAS matmul); the driver sums the tiny
    matrices — exchanged state is O(batches × d²), row-count-
    independent. Output is tidy (i, j, v) rows, 1-based dims, rounded
    at fixed precision for SQL parity (float32 inputs are widened to
    float64 BEFORE the product on both engine and oracle sides)."""
    from ..functions.rounding import sql_round

    def partial(batch):
        m = _as_matrix(batch[vec_col]).astype(np.float64)
        g = m.T @ m
        return pd.DataFrame({"g": [g.tobytes()], "d": [g.shape[0]]})

    total: np.ndarray | None = None
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pandas"):
        for raw, d in zip(b["g"], b["d"]):
            g = np.frombuffer(raw, dtype=np.float64).reshape(int(d), int(d))
            total = g.copy() if total is None else total + g
    d = total.shape[0]
    i, j = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1), indexing="ij")
    return pd.DataFrame({
        "i": i.ravel().astype("int64"), "j": j.ravel().astype("int64"),
        "v": sql_round(pd.Series(total.ravel()), ndigits),
    })


def pca_project(ds, vec_col: str, id_col: str, k: int = 4,
                ndigits: int = 4):
    """Distributed PCA projection: one streaming pass accumulates the
    d×d Gram matrix, column sums and row count (driver-summed tiny
    partials — the :func:`gram_matrix` shape plus first moments), the
    d×d covariance eigendecomposition runs on the driver (d is small by
    definition), and the top-k components are broadcast into a map-side
    projection pass. Signs are fixed deterministically (largest-|w|
    coordinate positive) so outputs are reproducible. Output: (id,
    pc_1..pc_k) rounded at fixed precision."""

    def partial(batch):
        m = _as_matrix(batch[vec_col]).astype(np.float64)
        g = m.T @ m
        return pd.DataFrame({"g": [g.tobytes()], "s": [m.sum(axis=0).tobytes()],
                             "n": [len(m)], "d": [g.shape[0]]})

    gtot = None
    stot = None
    ntot = 0
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pandas"):
        for graw, sraw, n, d in zip(b["g"], b["s"], b["n"], b["d"]):
            g = np.frombuffer(graw, dtype=np.float64).reshape(int(d), int(d))
            s = np.frombuffer(sraw, dtype=np.float64)
            gtot = g.copy() if gtot is None else gtot + g
            stot = s.copy() if stot is None else stot + s
            ntot += int(n)

    mu = stot / ntot
    cov = (gtot - np.outer(stot, stot) / ntot) / (ntot - 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    w = vecs[:, order]
    # deterministic sign: the largest-|coefficient| coordinate positive
    for j in range(w.shape[1]):
        i = int(np.argmax(np.abs(w[:, j])))
        if w[i, j] < 0:
            w[:, j] = -w[:, j]

    import ray
    ref = ray.put((mu, w))

    def project(batch):
        m_, w_ = ray.get(ref)
        x = _as_matrix(batch[vec_col]).astype(np.float64)
        p = (x - m_) @ w_
        cols = {id_col: batch[id_col].to_numpy(zero_copy_only=False)}
        for j in range(p.shape[1]):
            cols[f"pc_{j + 1}"] = sql_round(pd.Series(p[:, j]), ndigits)
        return pd.DataFrame(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def label_centroids(ds, vec_col: str, label_col: str, ndigits: int = 6) -> pd.DataFrame:
    """Per-label mean embedding (class prototypes — the curation tool
    for label-conditioned filtering and nearest-prototype
    classification): each batch contributes per-label vector sums +
    counts (one (labels_in_batch × d) partial), driver-summed; output
    is tidy (label, i, v) rows, 1-based dims."""

    def partial(batch):
        m = _as_matrix(batch[vec_col]).astype(np.float64)
        labs = batch[label_col].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(labs, sort=True)
        sums = np.zeros((len(uniq), m.shape[1]))
        np.add.at(sums, codes, m)
        cnts = np.bincount(codes, minlength=len(uniq))
        return pd.DataFrame({"label": uniq, "s": [r.tobytes() for r in sums],
                             "n": cnts.astype("int64")})

    acc: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pandas"):
        for lab, raw, n in zip(b["label"], b["s"], b["n"]):
            s = np.frombuffer(raw, dtype=np.float64)
            if lab in acc:
                acc[lab] = (acc[lab][0] + s, acc[lab][1] + int(n))
            else:
                acc[lab] = (s.copy(), int(n))

    rows = []
    for lab in sorted(acc):
        s, n = acc[lab]
        mean = s / n
        for i, v in enumerate(mean, start=1):
            rows.append((lab, i, v))
    out = pd.DataFrame(rows, columns=["label", "i", "v"])
    out["label"] = out["label"].astype("int64")
    out["i"] = out["i"].astype("int64")
    out["v"] = sql_round(out["v"], ndigits)
    return out


def quantize_embeddings(ds, vec_col: str = "vec_col_unset",
                        id_col: str = "vec_id"):
    """Scalar int8 quantization of an embedding column — the ANN-index
    memory optimization (4× smaller vectors, recall traded for RAM):
    per-dimension global (min, max) from one streaming pass of d-sized
    batch partials (driver combine is 2·d floats, corpus-size
    independent), then a map-only pass emitting
    q = min(floor((x − mn)/(mx − mn)·255), 255) per (row, dim).
    Exploded output (id, dim, q) so the SQL oracle replays it row-level;
    constant dimensions quantize to 0. All arithmetic in float64 —
    bit-identical to the DuckDB DOUBLE expression."""
    import ray

    if vec_col == "vec_col_unset":
        vec_col = "embedding"

    src = ds.select_columns([id_col, vec_col])

    def partial(batch: pa.Table) -> pd.DataFrame:
        m = _as_matrix(batch[vec_col]).astype(np.float64)
        if not len(m):
            return pd.DataFrame({"mn": [], "mx": []})
        return pd.DataFrame({"mn": [m.min(axis=0).tobytes()],
                             "mx": [m.max(axis=0).tobytes()]})

    mn = mx = None
    for b in src.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pandas"):
        for lo_b, hi_b in zip(b["mn"], b["mx"]):
            lo = np.frombuffer(lo_b, dtype=np.float64)
            hi = np.frombuffer(hi_b, dtype=np.float64)
            mn = lo if mn is None else np.minimum(mn, lo)
            mx = hi if mx is None else np.maximum(mx, hi)
    ref = ray.put((mn, mx))

    def quant(batch: pa.Table) -> pd.DataFrame:
        lo, hi = ray.get(ref)
        m = _as_matrix(batch[vec_col]).astype(np.float64)
        n, d = m.shape if len(m) else (0, len(lo) if lo is not None else 0)
        if not n:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "dim": pd.Series([], dtype="int64"),
                                 "q": pd.Series([], dtype="int64")})
        span = hi - lo
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor((m - lo) / span * 255.0)
        q = np.where(span == 0, 0.0, np.minimum(q, 255.0))
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        return pd.DataFrame({
            id_col: np.repeat(ids, d),
            "dim": np.tile(np.arange(d, dtype=np.int64), n),
            "q": q.reshape(-1).astype("int64"),
        })

    return src.map_batches(quant, batch_format="pyarrow")


def pq_train(ds, m: int = 8, k: int = 16, iterations: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding") -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al. 2011, public
    algorithm): split the d dims into ``m`` contiguous subspaces and run
    Lloyd's k-means independently in each — all m subspaces trained in
    the SAME distributed passes (one batch pass emits the per-cluster
    partial sums for every subspace at once, so training costs exactly
    ``iterations`` corpus reads regardless of m). Returns the
    (m, k, d/m) codebook array; seeds are the first k vectors by id
    (the deterministic stand-in used by :func:`kmeans_lloyd`)."""
    seeds = ds.filter(expr=f"{id_col} < {k}").take_all()
    seeds.sort(key=lambda r: r[id_col])
    smat = np.asarray([list(r[vec_col]) for r in seeds], dtype=np.float64)
    d = smat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.ascontiguousarray(smat.reshape(k, m, dsub).transpose(1, 0, 2))

    for _ in range(iterations - 1):
        bref = ray.put(books)

        def partial(batch: pa.Table, _bref=bref) -> pa.Table:
            b = ray.get(_bref)  # (m, k, dsub)
            x = _as_matrix(batch[vec_col]).astype(np.float64).reshape(-1, m, dsub)
            sums = np.zeros((m, k, dsub), dtype=np.float64)
            counts = np.zeros((m, k), dtype=np.int64)
            for s in range(m):  # m is small; within-subspace math is vectorized
                d2 = ((x[:, s, None, :] - b[s][None, :, :]) ** 2).sum(axis=2)
                a = np.argmin(d2, axis=1)
                np.add.at(sums[s], a, x[:, s, :])
                counts[s] += np.bincount(a, minlength=k)
            return pa.table({
                "sub": pa.array(np.repeat(np.arange(m, dtype=np.int64), k)),
                "cluster": pa.array(np.tile(np.arange(k, dtype=np.int64), m)),
                "n": pa.array(counts.reshape(-1)),
                "vsum": pa.array(list(sums.reshape(m * k, dsub)),
                                 pa.list_(pa.float64())),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros((m, k, dsub))
        counts = np.zeros((m, k), dtype=np.int64)
        for _, row in parts.iterrows():  # m·k×batches rows — tiny
            sums[row["sub"], row["cluster"]] += np.asarray(row["vsum"])
            counts[row["sub"], row["cluster"]] += row["n"]
        nonempty = counts > 0
        books = books.copy()
        books[nonempty] = sums[nonempty] / counts[nonempty][:, None]
    return books


def pq_encode(ds, books: np.ndarray, id_col: str = "vec_id",
              vec_col: str = "embedding"):
    """Encode each vector to m uint8 codes (one byte per subspace,
    packed into a binary column — a 64-d float32 row compresses 32×).
    Map-only: the codebooks broadcast once, no shuffle."""
    m, k, dsub = books.shape
    bref = ray.put(books)

    def enc(batch: pa.Table) -> pa.Table:
        b = ray.get(bref)
        x = _as_matrix(batch[vec_col]).astype(np.float64).reshape(-1, m, dsub)
        codes = np.empty((len(x), m), dtype=np.uint8)
        for s in range(m):
            d2 = ((x[:, s, None, :] - b[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.table({
            id_col: batch[id_col],
            "codes": pa.array([c.tobytes() for c in codes], pa.binary()),
        })

    return ds.map_batches(enc, batch_format="pyarrow")


def pq_recon_error(ds, books: np.ndarray, id_col: str = "vec_id",
                   vec_col: str = "embedding", ndigits: int = 6):
    """Per-subspace mean squared reconstruction error of the trained
    codebooks over the corpus — the fidelity report that decides
    whether a PQ index is usable. Map-side (sub, Σerr, n) partials,
    driver combine of m·batches tiny rows."""
    m, k, dsub = books.shape
    bref = ray.put(books)

    def partial(batch: pa.Table) -> pa.Table:
        b = ray.get(bref)
        x = _as_matrix(batch[vec_col]).astype(np.float64).reshape(-1, m, dsub)
        errs = np.zeros(m, dtype=np.float64)
        for s in range(m):
            d2 = ((x[:, s, None, :] - b[s][None, :, :]) ** 2).sum(axis=2)
            errs[s] = d2.min(axis=1).sum()
        return pa.table({
            "sub": pa.array(np.arange(m, dtype=np.int64)),
            "err": pa.array(errs),
            "n": pa.array(np.full(m, len(x), dtype=np.int64)),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("sub", sort=True)[["err", "n"]].sum()
    return pd.DataFrame({
        "sub": agg.index.to_numpy(np.int64),
        "mse": sql_round(agg["err"].to_numpy() / agg["n"].to_numpy(), ndigits),
        "n": agg["n"].to_numpy(np.int64),
    })


def pq_adc_topk(codes_ds, books: np.ndarray, query_vec, k_top: int = 10,
                id_col: str = "vec_id", ndigits: int = 6):
    """Asymmetric-distance top-k over PQ codes: the query builds one
    (m, k) lookup table of subspace distances; each encoded row's
    distance is m table lookups summed — no float vectors are read at
    query time. By construction the ADC distance equals the exact
    squared L2 between the query and the row's RECONSTRUCTION
    (property-tested). Partial top-k per batch + one tiny merge, the
    same exchange shape as :func:`cosine_topk`."""
    m, k, dsub = books.shape
    q = np.asarray(query_vec, dtype=np.float64).reshape(m, dsub)
    lut = ((q[:, None, :] - books) ** 2).sum(axis=2)  # (m, k)
    lref = ray.put(lut)

    def partial(batch: pa.Table) -> pd.DataFrame:
        table = ray.get(lref)
        raw = batch["codes"].to_pylist()
        if not raw:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "dist": pd.Series(dtype="float64")})
        codes = np.frombuffer(b"".join(raw), dtype=np.uint8).reshape(-1, m)
        dist = table[np.arange(m)[None, :], codes].sum(axis=1)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        o = np.lexsort((ids, dist))[:k_top]
        return pd.DataFrame({id_col: ids[o], "dist": dist[o]})

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        o = np.lexsort((batch[id_col].to_numpy(), batch["dist"].to_numpy()))[:k_top]
        out = batch.iloc[o].reset_index(drop=True)
        out["dist"] = sql_round(out["dist"], ndigits)
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    parts = codes_ds.map_batches(partial, batch_format="pyarrow")
    return parts.repartition(1).map_batches(merge, batch_format="pandas")


def rrf_fusion(ds, query_ids, query_vecs, k: int = 10, list_k: int = 50,
               rrf_k: int = 60, id_col: str = "vec_id",
               vec_col: str = "embedding") -> pd.DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of the
    per-query cosine top-``list_k`` lists:
    ``rrf(d) = Σ_lists 1 / (rrf_k + rank_list(d))`` — the standard
    hybrid-retrieval combiner (multi-vector / multi-query search).

    Reuses ``cosine_topk`` (partial top-k per batch + tiny merge), so
    the fused exchange is bounded by queries × list_k rows no matter
    the corpus size; the fusion itself is a driver combine over that
    k-bounded frame. Ranks come from the same rounded-score,
    id-tie-broken ordering the ANN oracle uses; each document
    contributes at most one term per list, so with ≤ 2 lists the float
    sum is order-independent bit-for-bit."""
    lists = cosine_topk(ds, query_ids, query_vecs, k=list_k,
                        id_col=id_col, vec_col=vec_col).to_pandas()
    lists = lists.sort_values(["query_id", "rank"], kind="mergesort")
    contrib = 1.0 / (rrf_k + lists["rank"].to_numpy(np.float64))
    f = (pd.DataFrame({id_col: lists[id_col].to_numpy(), "c": contrib})
         .groupby(id_col, sort=True)
         .agg(n_lists=("c", "size"), rrf=("c", "sum"))
         .reset_index())
    f["n_lists"] = f["n_lists"].astype("int64")
    f["rrf"] = sql_round(f["rrf"], 6)
    return (f.sort_values(["rrf", id_col], ascending=[False, True],
                          kind="mergesort")
            .head(k).reset_index(drop=True))


def semdedup(ds, k: int = 8, tau: float = 0.95, id_col: str = "vec_id",
             vec_col: str = "embedding", ndigits: int = 6):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the embedding corpus with the deterministic seed-centroid k-means
    assignment, then WITHIN each cluster drop every row that has a
    smaller-id neighbour with cosine similarity ≥ ``tau`` — the
    min-id representative of each semantic near-dup set survives.

    Scale shape: the assignment is the zero-shuffle broadcast-centroid
    pass of :func:`kmeans_assign_step`; the prune shuffles (cluster,
    id, vec) once and runs one vectorized Gram matrix per cluster
    inside its hash partition. The within-cluster work is O((n/k)²) —
    SemDeDup's own contract is that ``k`` grows with the corpus so the
    per-cluster population stays bounded (the paper uses ~11k clusters
    for LAION-440M). Similarities are rounded at ``ndigits`` before the
    threshold compare so the engine and the SQL replay make identical
    keep/drop decisions.

    Reference capability analogue: exact dedup groups
    `pacong/data/processor.py:349-361`, generalized to semantic space.
    """
    from .grouped import partitioned_apply

    if ds.filter(expr=f"{id_col} < {k}").count() < k:
        raise ValueError(f"semdedup: seed centroids need ids 0..{k - 1} "
                         f"present (kmeans_assign_step convention)")
    assigned = kmeans_assign_step(ds, k=k, id_col=id_col, vec_col=vec_col,
                                  keep_cols=[vec_col])

    def prune(part: pd.DataFrame) -> pd.DataFrame:
        keep_ids, keep_cl = [], []
        for cl, g in part.groupby("cluster", sort=True):
            g = g.sort_values(id_col, kind="mergesort")
            m = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in g[vec_col]])
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            m = m / norms[:, None]
            sim = np.asarray(sql_round(pd.Series((m @ m.T).ravel()),
                                       ndigits)).reshape(len(m), len(m))
            # dominated(x) := ∃ y earlier in id order with sim ≥ tau
            dom = np.triu(sim >= tau, 1).any(axis=0)
            ids = g[id_col].to_numpy()
            keep_ids.append(ids[~dom])
            keep_cl.append(np.full(int((~dom).sum()), cl, dtype=np.int64))
        if not keep_ids:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "cluster": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            id_col: np.concatenate(keep_ids).astype("int64"),
            "cluster": np.concatenate(keep_cl),
        })

    return partitioned_apply(
        assigned.select_columns([id_col, "cluster", vec_col]),
        ["cluster"], prune)


def kcenter_select(ds, k: int = 4, id_col: str = "vec_id",
                   vec_col: str = "embedding", ndigits: int = 6,
                   driver_rows_max: int = 100_000):
    """Greedy k-center / farthest-first diversity selection (Gonzalez
    1985; the coreset seeding rule of k-means++ without the
    randomness): start from the min-id vector, then repeatedly pick
    the point FARTHEST from the chosen set (max over corpus of min
    squared L2 to any chosen center; ties → smallest id). The selected
    rows are the classic diversity sample / coverage skeleton of an
    embedding corpus.

    The pick rule (global max of ROUNDED min-d2, tie → smallest id) is
    batch-structure-invariant, so a corpus at ≤ ``driver_rows_max``
    rows is resolved on the driver in one pull + k−1 numpy rounds with
    identical results (the distributed rounds each cost a full Dataset
    execution of pure scheduling at this size).

    Distributed shape past the gate: chosen centers broadcast via the
    object store; each of the k−1 selection rounds is ONE map-only
    pass emitting a per-batch (best_d2, best_id, best_vec) partial —
    the exchange is batch-count-sized, never row-sized, and carrying
    the winning VECTOR in the partial means no second scan to re-fetch
    it. Distances are rounded at ``ndigits`` BEFORE the argmax so the
    engine and the SQL unroll make identical picks."""
    import ray as _ray

    if ds.count() <= driver_rows_max:
        return _driver_kcenter(ds, k, id_col, vec_col, ndigits)

    first = ds.filter(expr=f"{id_col} == 0").take_all()
    if not first:
        raise ValueError("kcenter_select: seed row id 0 must exist")
    centers = [np.asarray(list(first[0][vec_col]), dtype=np.float64)]
    sel_ids = [int(first[0][id_col])]
    sel_d2 = [0.0]

    for _ in range(k - 1):
        cref = _ray.put(np.vstack(centers))
        chosen = set(sel_ids)

        def partial(batch: pa.Table, _cref=cref, _chosen=chosen) -> pa.Table:
            cents = _ray.get(_cref)
            m = _as_matrix(batch[vec_col]).astype(np.float64)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            mind = np.asarray(sql_round(pd.Series(d2.min(axis=1)), ndigits))
            mind[np.isin(ids, list(_chosen))] = -1.0
            # per-batch best: max distance, then min id
            order = np.lexsort((ids, -mind))
            b = order[0]
            return pa.table({"best_id": pa.array([int(ids[b])], pa.int64()),
                             "best_d2": pa.array([float(mind[b])],
                                                 pa.float64()),
                             "best_vec": pa.array([m[b].tolist()],
                                                  pa.list_(pa.float64()))})

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        parts = parts.sort_values(["best_d2", "best_id"],
                                  ascending=[False, True], kind="mergesort")
        win_id = int(parts.iloc[0]["best_id"])
        win_d2 = float(parts.iloc[0]["best_d2"])
        if win_d2 == -1.0:
            # every remaining point is already chosen (the masked
            # sentinel won) — k exceeds the number of distinct rows;
            # silently re-selecting a center would duplicate it.
            raise ValueError(
                f"kcenter_select: k={k} exceeds the number of rows "
                f"({len(sel_ids)} available)")
        centers.append(np.asarray(list(parts.iloc[0]["best_vec"]),
                                  dtype=np.float64))
        sel_ids.append(win_id)
        sel_d2.append(win_d2)

    return pd.DataFrame({
        "sel_order": np.arange(1, k + 1, dtype=np.int64),
        id_col: np.array(sel_ids, dtype=np.int64),
        "d2_at_selection": np.array(sel_d2, dtype=np.float64),
    })


def _driver_kcenter(ds, k: int, id_col: str, vec_col: str, ndigits: int):
    """Driver path for gated-small corpora: one pull, then k−1 numpy
    rounds maintaining the running min-d2 incrementally. Pick rule and
    rounding are identical to the distributed rounds (both compute the
    global max of rounded min-d2 with smallest-id ties)."""
    pdf = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = pdf[id_col].to_numpy(np.int64)
    if 0 not in ids:
        raise ValueError("kcenter_select: seed row id 0 must exist")
    m = np.vstack([np.asarray(v, dtype=np.float64)
                   for v in pdf[vec_col].to_numpy()])
    order = np.argsort(ids, kind="mergesort")
    ids, m = ids[order], m[order]
    chosen_mask = np.zeros(len(ids), dtype=bool)
    seed = int(np.searchsorted(ids, 0))
    chosen_mask[seed] = True
    sel_ids, sel_d2 = [0], [0.0]
    mind = ((m - m[seed][None, :]) ** 2).sum(axis=1)  # running raw min
    for _ in range(k - 1):
        r = np.asarray(sql_round(pd.Series(mind), ndigits))
        r[chosen_mask] = -1.0
        b = np.lexsort((ids, -r))[0]
        if r[b] == -1.0:
            raise ValueError(
                f"kcenter_select: k={k} exceeds the number of rows "
                f"({len(sel_ids)} available)")
        chosen_mask[b] = True
        sel_ids.append(int(ids[b]))
        sel_d2.append(float(r[b]))
        mind = np.minimum(mind, ((m - m[b][None, :]) ** 2).sum(axis=1))
    return pd.DataFrame({
        "sel_order": np.arange(1, k + 1, dtype=np.int64),
        id_col: np.array(sel_ids, dtype=np.int64),
        "d2_at_selection": np.array(sel_d2, dtype=np.float64),
    })


def knn_graph(ds, k: int = 3, id_col: str = "vec_id",
              vec_col: str = "embedding", max_corpus_rows: int = 200_000,
              ndigits: int = 6):
    """Exact k-nearest-neighbour graph over the embedding corpus (the
    build step of graph-based ANN / semantic-dedup clustering): for
    every vector, its top-k cosine neighbours with rank. Ordering is
    by the ROUNDED cosine (desc) with the neighbour id as tiebreak, so
    the rank order is deterministic and replay-stable.

    Same shape as ``embedding_allpairs_exact``: the normalized float64
    corpus broadcasts once, the left side streams through an actor
    pool, one C matmul per batch, NO shuffle; refuses corpora past
    ``max_corpus_rows`` (the IVF index is the at-scale path — its
    bucket probe produces the same top-k against a candidate subset).
    Returns (vec_id, rank:int64, nbr_id, cosine)."""
    corpus = pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                              batch_size=None))
    if corpus.num_rows > max_corpus_rows:
        raise ValueError(
            f"knn_graph is the small-subset exact path (n="
            f"{corpus.num_rows} > {max_corpus_rows}); use the IVF index")
    order = np.argsort(np.asarray(corpus[id_col].to_pylist(),
                                  dtype=np.int64), kind="stable")
    c_ids = np.asarray(corpus[id_col].to_pylist(), dtype=np.int64)[order]
    c_mat = _normalize(_as_matrix(corpus[vec_col]).astype(np.float64))[order]
    ref = ray.put({"ids": c_ids, "mat": c_mat})
    kk = int(k)

    class TopK:
        def __init__(self):
            c = ray.get(ref)  # once per actor
            self.c_ids, self.c_mat = c["ids"], c["mat"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            b_ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            b_mat = _normalize(_as_matrix(batch[vec_col])
                               .astype(np.float64))
            sims = sql_round(b_mat @ self.c_mat.T, ndigits)
            sims[b_ids[:, None] == self.c_ids[None, :]] = -np.inf  # self
            # columns are id-ascending, so a STABLE sort on -sims
            # breaks rounded-cosine ties by neighbour id
            top = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
            rows = np.repeat(b_ids, kk)
            ranks = np.tile(np.arange(1, kk + 1, dtype=np.int64),
                            len(b_ids))
            cols = top.ravel()
            return pa.table({
                "vec_id": pa.array(rows, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "nbr_id": pa.array(self.c_ids[cols], pa.int64()),
                "cosine": pa.array(sims[np.repeat(np.arange(len(b_ids)),
                                                  kk), cols], pa.float64()),
            })

    return ds.map_batches(TopK, batch_format="pyarrow",
                          concurrency=auto_concurrency())
