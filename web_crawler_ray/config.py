"""Engine configuration with env-var overrides (SURVEY.md §2.11).

Mirrors the reference's config surface: YAML-backed nested settings with
environment overrides (pacong/core/config.py:105-133 maps
``PACONG_<SECTION>_<KEY>`` vars onto the dict; knobs like
``rate_limit_delay``/``max_retries`` live at settings.yaml:13-18).
The engine equivalent is a flat dataclass + ``WCR_<FIELD>`` overrides —
no mutable singleton (SURVEY §2.3 T3): the config object is passed
explicitly to pipelines / actor constructors.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, fields


@dataclass
class EngineConfig:
    # politeness / fetch (reference knobs: settings.yaml:13-18)
    rate_limit_delay_ms: int = 2000
    request_timeout_s: float = 30.0
    max_retries: int = 3
    retry_backoff_factor: float = 1.0
    # crawl loop
    round_budget_ms: int = 60_000
    max_rounds: int = 4
    max_depth: int = 8
    priority_decay: float = 0.85
    # partitioning / state
    num_blocks: int = 16
    n_seen_shards: int = 8
    seen_shard_capacity: int = 1 << 20
    # sinks
    output_dir: str = "/tmp/wcr_output"
    image_px: int = 32

    @classmethod
    def from_env(cls, prefix: str = "WCR_", **overrides) -> "EngineConfig":
        """Build from defaults ← env vars (``WCR_MAX_ROUNDS=6``) ←
        explicit overrides, strongest last."""
        kwargs = {}
        for f in fields(cls):
            raw = os.environ.get(prefix + f.name.upper())
            if raw is None:
                continue
            if f.type in ("int", int):
                kwargs[f.name] = int(raw)
            elif f.type in ("float", float):
                kwargs[f.name] = float(raw)
            else:
                kwargs[f.name] = raw
        kwargs.update(overrides)
        return cls(**kwargs)


def auto_concurrency(frac: float = 0.25, minimum: int = 2, reserve: int = 2) -> int:
    """Actor-pool size derived from the cluster instead of a hardcoded
    constant: ``frac`` of cluster CPUs, capped at CPUs - ``reserve`` so
    a pool never starves the upstream read/generate stage (a pool sized
    == session CPUs deadlocks the streaming executor silently), floored
    at ``minimum`` so tiny test sessions still get a pool. The 0.25
    default keeps TWO pools in one pipeline plus task stages under the
    session CPU count; single-pool pipelines pass frac=0.5."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        cpus = 4
    return max(minimum, min(cpus - reserve, int(cpus * frac)))


def auto_blocks(per_cpu: int = 2, minimum: int = 4) -> int:
    """Partition count for repartition(): a small multiple of cluster
    CPUs so every core has work without over-fragmenting blocks."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        cpus = 4
    return max(minimum, cpus * per_cpu)
