"""crawler_ai_ray — a Ray-Data-native URL-frontier + fetch-scheduler + extraction engine.

A from-scratch re-expression of the data-processing capabilities of the
reference repo ``jayceho3203/crawler-ai`` (a single-process FastAPI/Scrapy
service) as idiomatic Ray Data pipelines:

* ``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
  batches for every per-record transform (HTML→text extraction, contact
  regexes, URL classification, job extraction),
* actor pools for the stateful stages (sharded URL-seen filter, sandbox
  page store / fetch backend),
* ``groupby(host) → map_groups`` shuffles for the politeness-respecting
  fetch waves and frontier expansion,
* Parquet round checkpoints with per-partition lineage for exact resume.

Nothing in this package imports from or copies the reference; semantics
were derived from reading it (citations as ``file:line`` in docstrings)
and re-implemented Ray-Data-first.  See SURVEY.md for the full blueprint.
"""

__version__ = "0.1.0"
