"""Unit tests for the scalar function library (SURVEY.md §5.1):
F1/F2 cleaner edge cases, F3-F5, F11, batch/scalar agreement, F12
canonicalization idempotence."""

import numpy as np
import pandas as pd
import pytest

from web_crawler_ray.functions import cleaning as C
from web_crawler_ray.functions import text as T
from web_crawler_ray.urls import canonicalize_url, host_of


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("1,234.56", 1234.56),
        ("1.234,56", 1234.56),
        ("4,09", 4.09),
        ("$70.12/bbl", 70.12),
        ("", None),
        ("n/a", None),
        ("12,345", 12345.0),   # 3 trailing digits → thousands
        ("1 234,5", 1234.5),
        ("-42.5", -42.5),
        (None, None),
    ],
)
def test_clean_price(raw, expected):
    assert C.clean_price_string(raw) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [("+1.23%", 1.23), ("-0,5%", -0.5), ("250%", 2.5), ("", None), ("abc", None), ("99.9", 99.9)],
)
def test_clean_percentage(raw, expected):
    assert C.clean_percentage_string(raw) == expected


def test_batch_scalar_agreement():
    vals = ["1,234.56", "1.234,56", "4,09", "$70.12/bbl", "", "n/a", "-", "12,345", "7.5"]
    batch = C.clean_price_batch(pd.Series(vals))
    for v, b in zip(vals, batch):
        s = C.clean_price_string(v)
        assert (s is None and pd.isna(b)) or abs(s - b) < 1e-12


def test_symbol_ladder():
    assert C.extract_commodity_symbol("see GC1:COM now") == "GC1:COM"
    assert C.extract_commodity_symbol("XAUUSD:CUR") == "XAUUSD:CUR"
    assert C.extract_commodity_symbol("GC1 plain") == "GC1"
    assert C.extract_commodity_symbol("just AB") == "AB"
    assert C.extract_commodity_symbol("nothing here") == ""


def test_standardize_and_categorize():
    assert C.standardize_commodity_name("Oil   (WTI)") == "WTI原油"
    assert C.standardize_commodity_name("  Gold ") == "Gold"
    assert C.categorize_commodity("Gold") == "贵金属"
    assert C.categorize_commodity("Oil (Brent)") == "能源"
    assert C.categorize_commodity("Copper") == "工业金属"
    assert C.categorize_commodity("Corn") == "农产品"
    assert C.categorize_commodity("zzz", "GC1:COM") == "商品"
    assert C.categorize_commodity("zzz", "XAUUSD:CUR") == "货币"
    assert C.categorize_commodity("zzz") == "其他"


def test_jsonp_parser():
    body = 'var hq_str_fx_scnytwd="人民币新台币,0.2313,0.2314,0.2313,2024-01-22,15:30:00";'
    recs = C.parse_jsonp_quote(body)
    assert len(recs) == 1
    assert recs[0]["name"] == "人民币新台币"
    assert recs[0]["bid_price"] == 0.2313
    # short field list skipped; empty numeric defaults to 0.0
    assert C.parse_jsonp_quote('var hq_str_x="a,b";') == []
    recs2 = C.parse_jsonp_quote('var hq_str_x="n,,1.0,2.0,d,t";')
    assert recs2[0]["bid_price"] == 0.0


def test_canonicalize_idempotent_and_variants():
    variants = [
        "HTTPS://H0.Example.test:443/p/1",
        "https://h0.example.test/./p/1",
        "https://h0.example.test/p/1#frag",
        "https://h0.example.test/a/../p/1",
    ]
    canon = {canonicalize_url(u) for u in variants}
    assert canon == {"https://h0.example.test/p/1"}
    for u in variants:
        assert canonicalize_url(canonicalize_url(u)) == canonicalize_url(u)
    assert canonicalize_url("not a url") == ""
    assert host_of("https://X.Y.z/p") == "x.y.z"


def test_text_functions():
    assert T.token_count("  a  b\tc\n") == 3
    assert T.lang_id("the cat and the dog is in the house") == "en"
    assert T.lang_id("") == "und"
    assert 0.0 <= T.quality_score("some reasonable text with words") <= 1.0
    a = T.char_shingles("hello world", 5)
    b = T.char_shingles("hello world!", 5)
    assert T.jaccard(a, a) == 1.0
    assert 0 < T.jaccard(a, b) < 1.0
    p1, p2 = T.minhash_params(64)
    s1 = T.minhash_signature(a, p1, p2)
    s2 = T.minhash_signature(b, p1, p2)
    est = float((s1 == s2).mean())
    assert abs(est - T.jaccard(a, b)) < 0.35  # coarse but bounded
    assert T.simhash64("x y z") == T.simhash64("x y z")


def test_exact_money_kernels():
    """revenue_e4/discount_e4/money_cents: exact int64 forms of the
    2-decimal money products — equal to the float product at 1e-4
    resolution, and (the point) ORDER-EXACT under summation: a group
    whose true sum lands exactly on a half-cent boundary rounds
    identically regardless of accumulation order (observed float flake:
    378060.515 hashing .51 or .52 by sum order)."""
    from web_crawler_ray.functions.rounding import (discount_e4,
                                                    money_cents,
                                                    revenue_e4, sql_round)

    rng = np.random.default_rng(7)
    price = np.round(rng.uniform(1, 105000, 4000), 2)
    disc = np.round(rng.uniform(0, 0.1, 4000), 2)
    e4 = revenue_e4(price, disc)
    assert e4.dtype == np.int64
    # pointwise: e4/1e4 equals the float product to within float ULP
    assert np.allclose(e4 / 1e4, price * (1 - disc), rtol=0, atol=5e-7)
    # order-exactness: any permutation sums to the same integer
    perm = rng.permutation(len(e4))
    assert int(e4.sum()) == int(e4[perm].sum())
    # a constructed half-cent boundary: two rows summing to x.xx5
    p = np.array([0.05, 0.10])   # revenue_e4 with d=0.5? keep d 2-dec:
    d = np.array([0.50, 0.50])   # 5*50=250, 10*50=500 → 750 e4 = 0.075
    b = revenue_e4(p, d)
    assert int(b.sum()) == 750
    # both orders round identically (float sums here could disagree)
    assert float(sql_round(b.sum() / 1e4, 2)) == float(
        sql_round(b[::-1].sum() / 1e4, 2))
    assert list(discount_e4([100.00], [0.05])) == [50000]  # $5.00 in e4
    # 3-decimal inputs are OUT of contract (money is 2-dec); rint is
    # ties-to-even on the raw float — documented, not relied upon
    assert list(money_cents([3.145, -2.675])) == [314, -268]
    assert list(money_cents([3.14, -2.67])) == [314, -267]
