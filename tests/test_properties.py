"""Property-based tests (hypothesis) for correctness-critical invariants:
scalar/batch cleaner agreement, canonicalization idempotence, cuckoo
no-false-negatives, SQL-round parity with DuckDB, codec roundtrip."""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from web_crawler_ray.codecs import decode_image, encode_image, psnr
from web_crawler_ray.functions.cleaning import (
    clean_percentage_batch,
    clean_percentage_string,
    clean_price_batch,
    clean_price_string,
)
from web_crawler_ray.functions.rounding import sql_round
from web_crawler_ray.state.cuckoo import CuckooFilter, SeenShardState
from web_crawler_ray.urls import canonicalize_url

price_text = st.text(
    alphabet="0123456789.,-$€ abcn/%", min_size=0, max_size=16
)


@settings(max_examples=300, deadline=None)
@given(st.lists(price_text, min_size=1, max_size=20))
def test_price_scalar_batch_agree(values):
    batch = clean_price_batch(pd.Series(values))
    for v, b in zip(values, batch):
        s = clean_price_string(v)
        assert (s is None and pd.isna(b)) or (
            s is not None and not pd.isna(b) and abs(s - b) < 1e-9
        ), (v, s, b)


@settings(max_examples=300, deadline=None)
@given(st.lists(price_text, min_size=1, max_size=20))
def test_percent_scalar_batch_agree(values):
    batch = clean_percentage_batch(pd.Series(values))
    for v, b in zip(values, batch):
        s = clean_percentage_string(v)
        assert (s is None and pd.isna(b)) or (
            s is not None and not pd.isna(b) and abs(s - b) < 1e-9
        ), (v, s, b)


url_bits = st.text(alphabet="abcxyz019./-_~%#?&=:", min_size=0, max_size=30)


@settings(max_examples=300, deadline=None)
@given(st.sampled_from(["http", "https", "HTTP", "ftp"]), url_bits)
def test_canonicalize_idempotent(scheme, rest):
    url = f"{scheme}://host.example{'' if rest.startswith('/') else '/'}{rest}"
    canon = canonicalize_url(url)
    assert canonicalize_url(canon) == canon  # idempotent (including "")


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=300, unique=True))
def test_cuckoo_no_false_negatives(keys):
    cf = CuckooFilter(capacity=1024, seed=3)
    for k in keys:
        cf.insert(k)  # may overflow to orphans — still must be findable
    arr = np.array(keys, dtype=np.uint64)
    assert cf.contains_batch(arr).all()
    restored = CuckooFilter.restore(cf.serialize())
    assert restored.contains_batch(arr).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=200, unique=True))
def test_seen_shard_exactness(keys):
    shard = SeenShardState(0, capacity=128)  # tiny: forces spill paths
    arr = np.array(keys, dtype=np.uint64)
    assert shard.probe_and_add(arr).all()
    assert not shard.probe_and_add(arr).any()


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False),
    st.integers(min_value=0, max_value=6),
)
def test_sql_round_matches_duckdb(x, nd):
    # Known divergence band, excluded by construction: when the scaled
    # product |x|*10^nd lands EXACTLY on a representable .5 tie, DuckDB's
    # own kernel direction is value-dependent (probed on 1.0:
    # 84870194.505 @2dp rounds UP though its exact expansion is below
    # the tie, while 900719926.1130685 @6dp and -956312565.9433249 @5dp
    # round DOWN) — no single float or exact-decimal rule reproduces all
    # three. Outside that half-ULP band both engines compute a floor of
    # a value far from the boundary and agree exactly, which is what
    # this property pins; all oracle-compared aggregates live there.
    y = abs(x) * 10.0**nd
    assume(abs(y - np.floor(y) - 0.5) > 4.0 * np.spacing(y) + 1e-9)
    con = duckdb.connect()
    expected = con.sql(f"SELECT round(CAST({x!r} AS DOUBLE), {nd})").fetchone()[0]
    got = sql_round(np.array([x]), nd)[0]
    assert got == expected or (pd.isna(got) and pd.isna(expected)), (x, nd, got, expected)


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1), st.sampled_from([8, 17, 32]))
def test_codec_roundtrip(seed, size):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
    assert (decode_image(encode_image(px, "png")) == px).all()
    assert psnr(px, decode_image(encode_image(px, "jpeg"))) >= 40.0


_texts_st = st.lists(
    st.text(
        alphabet=st.sampled_from(list("abcdefg THEqux0123.!é")), max_size=60
    ),
    max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(_texts_st)
def test_minhash_batch_matches_scalar(texts):
    from web_crawler_ray.functions import text as T

    a, b = T.minhash_params(32, 7)
    sigs = T.minhash_signatures_batch(texts, a, b, k=5)
    keys = T.lsh_band_keys_batch(sigs, 8) if len(texts) else None
    for i, t in enumerate(texts):
        ref = T.minhash_signature(T.char_shingles(t, 5), a, b)
        assert (sigs[i] == ref).all(), (i, t)
        assert keys[i].tolist() == T.lsh_band_keys(ref, 8)


@settings(max_examples=60, deadline=None)
@given(_texts_st)
def test_simhash_batch_matches_scalar(texts):
    from web_crawler_ray.functions import text as T

    got = T.simhash64_batch(texts)
    for i, t in enumerate(texts):
        assert got[i] == T.simhash64(t), (i, t)


@settings(max_examples=60, deadline=None)
@given(_texts_st)
def test_quality_batch_matches_scalar(texts):
    from web_crawler_ray.functions import text as T

    assert T.quality_scores_batch(texts) == [T.quality_score(t) for t in texts]


@settings(max_examples=60, deadline=None)
@given(_texts_st)
def test_fingerprint_matches_naive_window_join(texts):
    import zlib

    from web_crawler_ray.functions import text as T

    for t in texts:
        toks = T.TOKEN_RE.findall(t.lower())
        if not toks:
            expect = 0
        elif len(toks) <= 8:
            expect = zlib.crc32(" ".join(toks).encode())
        else:
            expect = min(
                zlib.crc32(" ".join(toks[i : i + 8]).encode())
                for i in range(len(toks) - 7)
            )
        assert T.doc_fingerprint(t) == expect


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=400),
    st.integers(min_value=2, max_value=40),
    st.integers(min_value=1, max_value=6),
)
def test_mg_merge_guarantee(keys, m, n_chunks):
    """Misra–Gries mergeable-summary property: after per-chunk
    compression and merged re-compression, every key with true count
    > total/m survives, and no surviving counter over-counts."""
    from web_crawler_ray.stages.sketch import _mg_compress

    s = pd.Series(keys)
    true = s.value_counts()
    total = len(keys)
    chunks = np.array_split(s.to_numpy(), n_chunks)
    merged = None
    for c in chunks:
        if not len(c):
            continue
        part = _mg_compress(pd.Series(c).value_counts(), m)
        merged = part if merged is None else merged.add(part, fill_value=0)
    merged = _mg_compress(merged, m)
    for k, cnt in true.items():
        if cnt * m > total:
            assert k in merged.index, (k, cnt, total, m)
    for k, v in merged.items():
        assert v <= true[k] + 1e-9  # counters only ever under-count


@settings(max_examples=300, deadline=None)
@given(
    st.floats(min_value=1e-6, max_value=1e9, allow_nan=False),
    st.sampled_from([0.001, 0.005, 0.01, 0.05]),
)
def test_ddsketch_bucket_relative_error(x, alpha):
    """DDSketch bucket-midpoint estimate is within α relative error of
    any value mapping to that bucket."""
    import math

    gamma = (1.0 + alpha) / (1.0 - alpha)
    i = math.ceil(math.log(x) / math.log(gamma))
    est = 2.0 * gamma**i / (gamma + 1.0)
    assert abs(est - x) <= alpha * x * (1 + 1e-9), (x, est, alpha)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1,
             max_size=120),
    st.sampled_from([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]),
)
def test_quantile_disc_rank_convention_matches_duckdb(values, q):
    """The rank formula ceil(q*n)-1 over the ascending sort — shared by
    quantile_gate, winsorize and time_to_convert — equals DuckDB
    quantile_disc on arbitrary int multisets."""
    import duckdb
    import numpy as np
    import pandas as pd

    df = pd.DataFrame({"v": values})
    want = duckdb.sql(
        f"SELECT quantile_disc(v, {q}) AS t FROM df").fetchone()[0]
    # the engine's formula over a value-count table (as the stages do)
    vc = df["v"].value_counts().sort_index()
    counts = vc.to_numpy(np.int64)
    vals = vc.index.to_numpy()
    n = int(counts.sum())
    rank = max(int(np.ceil(q * n)) - 1, 0)
    got = vals[np.searchsorted(np.cumsum(counts), rank + 1)]
    assert got == want, (values, q, got, want)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=50),
       st.sampled_from([10, 1000, 1 << 32]))
def test_hash_bucket_matches_sql_expression(ids, mod):
    """hash_bucket (the shared split/sample/shuffle/cap primitive) ==
    the SQL expression ((id % 2^31) * K % 2^32 % mod) for the whole
    int64 domain, including ids past the 31-bit fold boundary."""
    import duckdb
    import numpy as np
    import pandas as pd

    from web_crawler_ray.stages.sampling import hash_bucket

    got = hash_bucket(np.array(ids, dtype=np.int64), mod)
    df = pd.DataFrame({"i": pd.array(ids, dtype="int64")})
    want = duckdb.sql(
        f"SELECT (i % 2147483648) * 2654435761 % 4294967296 % {mod} AS b"
        " FROM df").df()["b"].to_numpy()
    assert (got == want).all(), (ids, mod)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**31 - 2), min_size=1,
                max_size=40),
       st.integers(min_value=0, max_value=100))
def test_epoch_shuffle_key_matches_sql(ids, seed):
    """The epoch-shuffle (key, shard) arithmetic — hash_bucket(id+seed)
    — equals its SQL replay for arbitrary ids and seeds."""
    import duckdb
    import numpy as np
    import pandas as pd

    from web_crawler_ray.stages.sampling import hash_bucket

    arr = np.array(ids, dtype=np.int64)
    k = hash_bucket(arr + seed, 1 << 32)
    df = pd.DataFrame({"i": pd.array(ids, dtype="int64")})
    want = duckdb.sql(
        f"SELECT ((i + {seed}) % 2147483648) * 2654435761"
        " % 4294967296 AS k FROM df").df()["k"].to_numpy()
    assert (k == want).all()
    assert ((k % 8) == (want % 8)).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.lists(st.sampled_from("ab cd ef aa zz b1".split()),
                         min_size=0, max_size=20),
                min_size=1, max_size=6),
       st.integers(2, 3), st.integers(2, 4))
def test_winnow_batch_matches_reference(tok_docs, k, w):
    """The flattened+masked window-min kernel equals the per-document
    sliding-min reference for every (k, w) and any doc-length mix
    (including empty and shorter-than-k docs)."""
    from web_crawler_ray.stages.text_quality import winnow_batch

    texts = [" ".join(toks) for toks in tok_docs]
    d, fp = winnow_batch(texts, k, w)
    got = set(zip(d.tolist(), fp.tolist()))

    expect = set()
    for i, toks in enumerate(tok_docs):
        grams = [" ".join(toks[j:j + k]) for j in range(len(toks) - k + 1)]
        for j in range(len(grams) - w + 1):
            expect.add((i, min(grams[j:j + w])))
    assert got == expect


name_text = st.text(
    alphabet="abcdefghij é☃", min_size=0, max_size=14
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(name_text, name_text), min_size=1, max_size=8))
def test_jaro_winkler_batch_matches_duckdb(pairs):
    """The batch JW kernel is VALUE-EXACT vs DuckDB's scalar
    jaro_winkler_similarity (byte semantics, 0.7 boost threshold,
    empty-string convention) — the q_jw_join replay depends on it."""
    from web_crawler_ray.functions.strsim import jaro_winkler_batch

    got = jaro_winkler_batch([a for a, _ in pairs], [b for _, b in pairs])
    con = duckdb.connect()
    for (a, b), g in zip(pairs, got):
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert g == want, (a, b, g, want)
