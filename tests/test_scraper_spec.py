"""Reference-shaped YAML scraper specs (SURVEY.md §2.11): the compiler
accepts the reference's settings.yaml keys verbatim and the named UDF
hook slots mirror base_scraper's abstract surface."""

import json

import pandas as pd
import pyarrow as pa
import ray.data as rd

from web_crawler_ray.pipelines.scraper_spec import compile_scraper
from web_crawler_ray.sources.http_fetch import FakeTransport

HTML_PAGE = b"""
<table>
 <tr class="row"><td class="n">Gold</td><td class="p">$2,345.60</td><td>+1.2%</td></tr>
 <tr class="row"><td class="n">Silver</td><td class="p">$27.85</td><td>-0.4%</td></tr>
 <tr class="row"><td class="n"></td><td class="p">bogus</td><td></td></tr>
</table>
"""

JSON_PAGE = json.dumps(
    {"bitcoin": {"usd": 65000.5}, "ethereum": {"usd": 3400.25}}
).encode()


def _pages_ds(pages: dict[str, bytes]):
    return rd.from_arrow(
        pa.table({"url": list(pages), "body": list(pages.values())})
    )


def test_html_spec_reference_keys(ray_session):
    """A settings.yaml:103-135-shaped block (extraction/validation/
    cleaning) ports verbatim."""
    spec = {
        "enabled": True,
        "name": "yahoo_like",
        "type": "commodity",
        "urls": "https://x.test/commodities",
        "method": "requests",
        "parser": "html",
        "extraction": {
            "container": "tr.row",
            "fields": {
                "name": {"selector": "td.n", "transform": "uppercase"},
                "price": {"selector": "td.p"},
            },
        },
        "validation": {"required_fields": ["name", "price"],
                       "formats": {"price": "number"}},
        "cleaning": {"fields": {"price": "remove_currency"},
                     "transforms": {"price": "float"}},
    }
    out = compile_scraper(spec, pages_ds=_pages_ds({"https://x.test/commodities": HTML_PAGE}))
    df = out.to_pandas().sort_values("name").reset_index(drop=True)
    assert list(df["name"]) == ["GOLD", "SILVER"]
    assert list(df["price"]) == [2345.6, 27.85]
    assert set(df["source"]) == {"yahoo_like"}


def test_json_spec_with_transport_and_hooks(ray_session):
    """coingecko-demo-shaped JSON spec fetched through the actor-pool
    transport, with all four named hooks exercised."""
    pages = {"https://api.test/price": (200, JSON_PAGE)}
    spec = {
        "name": "coingecko_demo",
        "urls": "https://api.test/price",
        "parser": "json",
        "field_mapping": {"name": "name", "current_price": "usd"},
        "validation": {"required_fields": ["name", "current_price"]},
    }
    hooks = {
        "source_fn": lambda: [{"name": "api", "url": "https://api.test/price",
                               "type": "commodity"}],
        "validate_fn": lambda row: row["current_price"] > 5000,  # drops ethereum
        "clean_fn": lambda row: {**row, "name": row["name"].upper()},
    }
    out = compile_scraper(spec, transport_factory=lambda: FakeTransport(pages),
                          hooks=hooks, concurrency=2)
    df = out.to_pandas()
    assert list(df["name"]) == ["BITCOIN"]
    assert list(df["current_price"]) == [65000.5]


def test_parse_fn_hook_overrides_parser(ray_session):
    """parse_fn slot (scrape_single_source analogue) replaces the spec
    parser entirely."""
    spec = {"name": "custom", "parser": "json", "output_fields": ["k", "v"]}

    def parse_fn(text, source):
        return [{"k": w, "v": len(w)} for w in text.split()]

    out = compile_scraper(
        spec, pages_ds=_pages_ds({"u": b"alpha beta"}), hooks={"parse_fn": parse_fn}
    )
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert list(df["k"]) == ["alpha", "beta"]
    assert list(df["v"]) == [5, 4]


def test_regex_parser_spec(ray_session):
    spec = {
        "name": "rx",
        "parser": "regex",
        "extraction": {"pattern": r"(\w+)=(\d+)", "fields": ["key", "val"]},
        "cleaning": {"transforms": {"val": "float"}},
    }
    out = compile_scraper(spec, pages_ds=_pages_ds({"u": b"a=1 b=22 noise c=333"}))
    df = out.to_pandas().sort_values("key").reset_index(drop=True)
    assert list(df["key"]) == ["a", "b", "c"]
    assert list(df["val"]) == [1.0, 22.0, 333.0]


YAML_BLOCK = """
generic_scrapers:
  coingecko_demo:
    enabled: true
    name: "CoinGecko demo"
    type: "commodity"
    urls: "https://api.test/price"
    method: "requests"
    parser: "json"
    field_mapping:
      name: "name"
      current_price: "usd"
    headers:
      Accept: "application/json"
    validation:
      required_fields: ["name", "current_price"]
    cleaning:
      transforms:
        current_price: "float"
  disabled_one:
    enabled: false
    parser: "html"
"""


def test_yaml_block_ports_verbatim(ray_session):
    """A reference-shaped YAML document compiles directly: enabled
    blocks only, reference keys honored end to end."""
    from web_crawler_ray.pipelines.scraper_spec import compile_from_yaml, load_scraper_specs

    specs = load_scraper_specs(YAML_BLOCK)
    assert list(specs) == ["coingecko_demo"]  # disabled block skipped
    out = compile_from_yaml(
        YAML_BLOCK, pages_ds=_pages_ds({"https://api.test/price": JSON_PAGE})
    )
    df = out["coingecko_demo"].to_pandas().sort_values("name").reset_index(drop=True)
    assert list(df["name"]) == ["bitcoin", "ethereum"]
    assert list(df["current_price"]) == [65000.5, 3400.25]
    assert set(df["source"]) == {"CoinGecko demo"}
