"""web_crawler_ray — a Ray-Data-native crawl / data-processing engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference crawler (``Zpoteiti/web-crawler``,
"pacong") as idiomatic Ray Data pipelines:

- ``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy
  Arrow batches for all per-record transforms (SURVEY.md §2.2, §2.8);
- actor pools for stateful stages: URL-seen cuckoo/bloom shards,
  per-host politeness priority queues, robots gates (SURVEY.md §2.3);
- ``groupby`` / ``sort`` / hash-join for the wide steps (SURVEY.md
  §2.4-§2.7);
- a driver-orchestrated BFS round loop for the crawl frontier with
  per-partition checkpoint + lineage (SURVEY.md §3.4).

Nothing here calls ``ray.init``/``ray.shutdown`` — sessions are owned
by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
