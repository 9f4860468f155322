"""Reference-shaped zero-code scraper specs → Ray Data pipelines.

Accepts the SAME config keys a reference YAML block uses
(pacong/config/settings.yaml:81-192, consumed by
generic_scraper.py:343-447 and simple_generic.py:187-204):

    urls | method | parser ("html"|"json"|"regex") |
    extraction {container, fields{selector,index,attribute,regex,
                transform,validate}, pattern, fields[...]} |
    json_path | field_mapping |
    validation {required_fields, formats} |
    cleaning {fields: {col: remove_currency|normalize_whitespace|
              remove_html}, transforms: {col: float|uppercase|...}} |
    headers | wait_time | name | type | enabled

so a user can port a reference YAML scraper block verbatim. Each key
compiles onto the engine's existing stages (FetcherActor, CssExtract
field rules, parse_json_records, parse_regex_records, cleaners,
validators) as map_batches stages — the spec is the front-end, Ray
Data is the execution.

Named UDF hook slots mirror the reference's abstract scraper surface
(pacong/core/base_scraper.py:43-91): ``source_fn`` (get_data_sources),
``parse_fn`` (scrape_single_source's parse), ``validate_fn``
(validate_data), ``clean_fn`` (clean_data). Hooks are plain callables
shipped by value to workers; the hook path is row-wise by contract
(reference semantics), the spec path is batch-vectorized.

Two source modes:
- ``pages_ds``: a Dataset of already-fetched (url, body[, status])
  rows — the at-scale path (fetch happens upstream, e.g. the crawl
  sink); nothing is broadcast.
- ``transport_factory`` (+ spec["urls"] or source_fn): the
  reference-faithful mode for modest URL lists — FetcherActor pool
  with retries/politeness, one session per actor.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..config import auto_blocks, auto_concurrency
from ..stages.css_extract import _TRANSFORMS, extract_fields, validate_value
from ..stages.parse import parse_json_records, parse_regex_records

_CLEANERS = {
    # generic_scraper.py:404-415 semantics, regex/stdlib only.
    # remove_currency matches the reference regex exactly
    # (generic_scraper.py:408-409 strips '-' too, so "-5%" → "5").
    "remove_currency": lambda s: re.sub(r"[^\d.,]", "", str(s).strip()),
    "normalize_whitespace": lambda s: " ".join(str(s).split()),
    "remove_html": lambda s: re.sub(r"<[^>]+>", "", str(s)),
}


def _output_fields(spec: dict) -> list[str]:
    parser = spec.get("parser", "json")
    if spec.get("output_fields"):
        return list(spec["output_fields"])
    if parser == "json" and spec.get("field_mapping"):
        return list(spec["field_mapping"])
    if parser == "html":
        return list(spec.get("extraction", {}).get("fields", {}))
    if parser == "regex":
        return list(spec.get("extraction", {}).get("fields", []))
    raise ValueError("cannot derive output fields; set spec['output_fields']")


def compile_scraper(spec: dict, *, pages_ds=None, transport_factory=None,
                    hooks: dict | None = None, body_col: str = "body",
                    url_col: str = "url", concurrency: int | None = None):
    """Compile a reference-shaped scraper spec dict into a Dataset."""
    hooks = hooks or {}
    fields = _output_fields(spec)
    source_name = spec.get("name", "scraper")

    # ---- 1. source: pre-fetched Dataset, or fetch via actor pool ----
    if pages_ds is not None:
        ds = pages_ds
    else:
        from ..sources.http_fetch import FetcherActor

        if transport_factory is None:
            raise ValueError("transport_factory required when pages_ds is None "
                             "(no live network in this environment)")
        if "source_fn" in hooks:
            sources = hooks["source_fn"]()
            urls = [s["url"] for s in sources]
        else:
            u = spec.get("urls", [])
            urls = [u] if isinstance(u, str) else list(u)
        ds = rd.from_arrow(pa.table({url_col: pa.array(urls, pa.string())}))
        ds = ds.repartition(min(auto_blocks(), max(1, len(urls)))).map_batches(
            FetcherActor,
            fn_constructor_kwargs={"transport_factory": transport_factory,
                                   "sleep_fn": lambda _s: None},
            batch_format="pyarrow",
            concurrency=concurrency or auto_concurrency(),
        )
    if "status" in ds.schema().names:
        ds = ds.filter(expr="status == 200")

    # ---- 2. parse (spec parser or parse_fn hook) ----
    parser = spec.get("parser", "json")
    parse_fn = hooks.get("parse_fn")
    extraction = spec.get("extraction", {})
    json_path = spec.get("json_path", "")
    field_mapping = spec.get("field_mapping")

    def parse_batch(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {f: [] for f in fields}
        out["source_url"] = []
        for url, body in zip(batch[url_col].to_pylist(), batch[body_col].to_pylist()):
            text = body.decode("utf-8", "replace") if isinstance(body, (bytes, bytearray)) else (body or "")
            if parse_fn is not None:
                recs = parse_fn(text, {"url": url, "name": source_name})
            elif parser == "json":
                recs = parse_json_records(text, json_path, field_mapping)
            elif parser == "html":
                recs = extract_fields(text, extraction)
            elif parser == "regex":
                recs = parse_regex_records(
                    text, extraction["pattern"], list(extraction["fields"])
                )
            else:
                raise ValueError(f"unknown parser: {parser}")
            for rec in recs:
                for f in fields:
                    out[f].append(rec.get(f))
                out["source_url"].append(url)
        return pa.table({k: pa.array(v) for k, v in out.items()})

    ds = ds.map_batches(parse_batch, batch_format="pyarrow")

    # ---- 3. cleaning (spec rules vectorized per batch, then hook) ----
    cleaning = spec.get("cleaning", {})
    clean_fields = cleaning.get("fields", {})
    transforms = cleaning.get("transforms", {})
    clean_fn = hooks.get("clean_fn")

    if clean_fields or transforms or clean_fn:
        def clean_batch(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            for col, kind in clean_fields.items():
                if col in batch:
                    batch[col] = batch[col].map(
                        lambda v, _c=_CLEANERS[kind]: None if v is None else _c(v)
                    )
            for col, kind in transforms.items():
                if col in batch:
                    batch[col] = batch[col].map(
                        lambda v, _t=_TRANSFORMS[kind]: None if v is None else _t(v)
                    )
            if clean_fn is not None:
                batch = pd.DataFrame([clean_fn(r) for r in batch.to_dict("records")])
            return batch

        ds = ds.map_batches(clean_batch, batch_format="pandas")

    # ---- 4. validation (required fields + formats, then hook) ----
    validation = spec.get("validation", {})
    required = list(validation.get("required_fields", [])) or list(
        spec.get("required_fields", [])
    )
    formats = validation.get("formats", {})
    validate_fn = hooks.get("validate_fn")

    if required or formats or validate_fn:
        def validate_batch(batch: pd.DataFrame) -> pd.DataFrame:
            keep = pd.Series(True, index=batch.index)
            for col in required:
                keep &= batch[col].notna() if col in batch else False
            for col, kind in formats.items():
                if col in batch:
                    keep &= batch[col].map(lambda v: validate_value(v, kind))
            if validate_fn is not None:
                keep &= batch.apply(lambda r: bool(validate_fn(r.to_dict())), axis=1)
            return batch[keep]

        ds = ds.map_batches(validate_batch, batch_format="pandas")

    # ---- 5. source defaulting (base_scraper.clean_data analogue) ----
    def add_source(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["source"] = source_name
        return batch

    return ds.map_batches(add_source, batch_format="pandas")


def load_scraper_specs(yaml_text: str) -> dict:
    """Parse a reference-shaped YAML document (settings.yaml structure:
    top-level ``generic_scrapers`` / ``simple_scrapers`` maps, each
    entry a scraper block with an ``enabled`` flag — see
    pacong/config/settings.yaml:80-192) into {name: spec}. Only enabled
    blocks are returned, mirroring register_generic_scrapers
    (generic_scraper.py:424-447)."""
    import yaml

    doc = yaml.safe_load(yaml_text) or {}
    out: dict = {}
    for section in ("generic_scrapers", "simple_scrapers"):
        for name, block in (doc.get(section) or {}).items():
            if isinstance(block, dict) and block.get("enabled", False):
                out[name] = {**block, "name": block.get("name", name)}
    # a bare single-scraper document (no section wrapper) also works
    if not out and doc and "parser" in doc:
        out[doc.get("name", "scraper")] = doc
    return out


def compile_from_yaml(yaml_text: str, **kwargs) -> dict:
    """YAML text → {scraper_name: Dataset}; kwargs forwarded to
    :func:`compile_scraper` (pages_ds / transport_factory / hooks)."""
    return {
        name: compile_scraper(spec, **kwargs)
        for name, spec in load_scraper_specs(yaml_text).items()
    }
