"""User-extension surface (SURVEY §2.11): a named **extractor
registry** (users add UDF batch stages next to the built-ins), a small
**pipeline builder** over the pages table, and a typed crawl entry
usable from a CLI / ``ray job submit`` entrypoint (see
``crawler_ai_ray.cli``).

The reference's extension points were env flags, keyword-constant
modules and Pydantic request models (routes/schemas); here they become
explicit: keyword tables live in the operator modules, per-request
parameters are :class:`~crawler_ai_ray.state.politeness.CrawlPolicy`
fields, and ad-hoc per-deployment extraction tweaks are registered
batch functions.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow as pa

__all__ = [
    "EXTRACTORS",
    "register_extractor",
    "extractor",
    "PagesPipeline",
    "crawl",
    "curate",
]

# name → Arrow-batch transform (pa.Table -> pa.Table) over pages rows
EXTRACTORS: dict[str, Callable[[pa.Table], pa.Table]] = {}


def register_extractor(
    name: str, fn: Callable[[pa.Table], pa.Table]
) -> None:
    """Register a batch extractor; user UDFs use the same registry as
    the built-ins."""
    EXTRACTORS[name] = fn


def extractor(name: str):
    """Decorator form of :func:`register_extractor`."""

    def deco(fn):
        register_extractor(name, fn)
        return fn

    return deco


def _register_builtins() -> None:
    from .functions.career_urls import (
        career_confidence_batch,
        strict_career_all_batch,
    )
    from .functions.contact_record import (
        career_anchor_batch,
        contact_record_batch,
    )
    from .functions.container_jobs import container_jobs_batch
    from .functions.job_fallback import job_fallback_batch
    from .functions.job_urls import (
        job_url_flags_batch,
        pagination_candidates_batch,
    )
    from .functions.link_scoring import (
        element_check_batch,
        job_link_scores_batch,
    )
    from .functions.page_meta import page_meta_batch
    from .functions.page_structure import (
        nav_links_batch,
        page_structure_batch,
    )
    from .functions.footer_contacts import footer_contacts_batch
    from .functions.sitemap import sitemap_jobs_batch
    from .functions.subdomains import subdomain_candidates_batch
    from .functions.api_jobs import api_jobs_batch
    from .stages.extract import (
        extract_jobs_batch,
        extract_jobs_fuzzy_batch,
        extract_jobs_normalized_batch,
        extract_pages_batch,
    )

    for name, fn in {
        "pages": extract_pages_batch,
        "jobs": extract_jobs_batch,
        "jobs_normalized": extract_jobs_normalized_batch,
        "jobs_fuzzy": extract_jobs_fuzzy_batch,
        "career_confidence": career_confidence_batch,
        "career_strict": strict_career_all_batch,
        "job_url_flags": job_url_flags_batch,
        "pagination": pagination_candidates_batch,
        "contact_records": contact_record_batch,
        "career_anchors": career_anchor_batch,
        "page_meta": page_meta_batch,
        "page_structure": page_structure_batch,
        "nav_links": nav_links_batch,
        "sitemap_jobs": sitemap_jobs_batch,
        "api_jobs": api_jobs_batch,
        "container_jobs": container_jobs_batch,
        "link_scores": job_link_scores_batch,
        "element_check": element_check_batch,
        "job_fallback": job_fallback_batch,
        "footer_contacts": footer_contacts_batch,
        "subdomain_candidates": subdomain_candidates_batch,
    }.items():
        EXTRACTORS.setdefault(name, fn)


_register_builtins()


class PagesPipeline:
    """Fluent builder over a pages Parquet table::

        PagesPipeline("/path/to/pages.parquet").extract("page_meta")
            .filter("links > 10").write("/tmp/out")

    Each ``extract`` is a registered batch stage; the result stays a
    lazy ``ray.data.Dataset`` until consumed.
    """

    def __init__(self, pages_path: str, columns: list[str] | None = None):
        import pyarrow.parquet as pq
        import ray.data

        rows = pq.ParquetFile(pages_path).metadata.num_rows
        blocks = max(8, min(64, rows // 512 or 1))
        self._ds = ray.data.read_parquet(
            pages_path,
            columns=columns or ["url", "html"],
            override_num_blocks=blocks,
        )

    def extract(self, name: str, **map_kwargs: Any) -> "PagesPipeline":
        fn = EXTRACTORS[name]
        self._ds = self._ds.map_batches(
            fn, batch_format="pyarrow", **map_kwargs
        )
        return self

    def map_batches(self, fn, **kwargs: Any) -> "PagesPipeline":
        self._ds = self._ds.map_batches(
            fn, batch_format="pyarrow", **kwargs
        )
        return self

    def filter(self, expr: str) -> "PagesPipeline":
        self._ds = self._ds.filter(expr=expr)
        return self

    def dataset(self):
        return self._ds

    def write(self, out_dir: str) -> None:
        self._ds.write_parquet(out_dir)


def crawl(
    corpus: str,
    out_dir: str,
    *,
    resume: bool = False,
    **config_kwargs: Any,
) -> dict:
    """Typed crawl entry — keyword args map 1:1 to
    :class:`~crawler_ai_ray.pipelines.crawl.CrawlConfig` /
    :class:`~crawler_ai_ray.state.politeness.CrawlPolicy` fields."""
    from .pipelines.crawl import CrawlConfig, run_crawl
    from .state.politeness import CrawlPolicy

    policy_fields = {
        k: config_kwargs.pop(k)
        for k in list(config_kwargs)
        if hasattr(CrawlPolicy(), k)
    }
    policy = CrawlPolicy(**policy_fields) if policy_fields else None
    cfg = CrawlConfig(corpus, out_dir, policy=policy, **config_kwargs)
    return run_crawl(cfg, resume=resume)


def curate(
    docs_path: str,
    out_dir: str,
    *,
    num_buckets: int = 64,
    threshold: float = 0.8,
    resume: bool = False,
) -> dict:
    """Run the corpus-curation chain (pipelines/curate.py) over a
    documents Parquet table and write its three artifacts:

    * ``out_dir/decisions/`` — the per-doc curation manifest;
    * ``out_dir/corpus/`` — the curated, PII-scrubbed corpus,
      **partitioned by pred_lang** (one directory per language, so a
      re-run or a downstream per-language consumer addresses
      partitions independently — the resumable-output layout);
    * ``out_dir/funnel.json`` — per-stage survival counts.

    With ``resume=True`` a re-run skips finished stages via per-stage
    marker files (``decisions.done``, ``corpus.done``): a crash
    between stages restarts only the unfinished ones, and a fully
    finished run is a cheap no-op that re-reads ``funnel.json`` — the
    resumable-output contract at stage granularity (the per-language
    corpus partitioning gives the finer file-level granularity to
    downstream consumers).

    Returns the funnel dict."""
    import json
    import os

    import ray.data

    from .pipelines.curate import (
        curate_decisions,
        curate_funnel,
        curate_output,
    )
    from .sources.pqread import read_parquet_rowgroups

    dec_dir = os.path.join(out_dir, "decisions")
    dec_done = os.path.join(out_dir, "decisions.done")
    corpus_dir = os.path.join(out_dir, "corpus")
    corpus_done = os.path.join(out_dir, "corpus.done")
    funnel_path = os.path.join(out_dir, "funnel.json")

    if resume and os.path.exists(funnel_path) and os.path.exists(
        corpus_done
    ) and os.path.exists(dec_done):
        with open(funnel_path) as f:
            return json.load(f)

    if resume and os.path.exists(dec_done):
        decisions = ray.data.read_parquet(dec_dir)
    else:
        docs_full = read_parquet_rowgroups(
            docs_path, columns=["doc_id", "text", "lang"]
        )
        decisions = curate_decisions(
            docs_full, num_buckets=num_buckets, threshold=threshold
        )
        decisions = decisions.materialize()  # consumed 3× below, no text
        decisions.write_parquet(dec_dir)
        with open(dec_done, "w") as f:
            f.write("ok\n")
    if not (resume and os.path.exists(corpus_done)):
        docs_txt = read_parquet_rowgroups(
            docs_path, columns=["doc_id", "text"]
        )
        curate_output(docs_txt, decisions).write_parquet(
            corpus_dir, partition_cols=["pred_lang"]
        )
        with open(corpus_done, "w") as f:
            f.write("ok\n")
    funnel_tbl = curate_funnel(decisions)
    funnel = {
        name: funnel_tbl[name][0].as_py()
        for name in funnel_tbl.column_names
    }
    with open(funnel_path, "w") as f:
        json.dump(funnel, f)
    return funnel


def export_jsonl(
    docs_path: str,
    out_dir: str,
    *,
    columns: list[str] | None = None,
    resume: bool = False,
) -> dict:
    """Export a Parquet corpus as sharded JSONL (one ``records``-
    oriented line per doc, one file per block) — the delivery format
    LLM training stacks ingest.  Column-pruned at the read
    (``columns=``), streamed block-by-block by Ray's JSON datasink
    (never materialized), row count taken from the Parquet FOOTER so
    the export itself is the only full pass.

    ``resume=True`` + an existing ``export.done`` marker makes a
    re-run a no-op that re-reads the recorded manifest — same
    stage-granularity contract as :func:`curate`.  Partitioned
    (per-language) delivery stays Parquet (:func:`curate` writes
    ``corpus/`` partitioned by ``pred_lang``); JSONL shards are flat
    because a JSON sink routes files per BLOCK, not per key.

    Returns ``{"rows": n, "files": k, "out_dir": ...}``."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    from .sources.pqread import _file_list, read_parquet_rowgroups

    done = os.path.join(out_dir, "export.done")
    if resume and os.path.exists(done):
        with open(done) as f:
            return json.load(f)

    rows = sum(
        pq.ParquetFile(f).metadata.num_rows for f in _file_list(docs_path)
    )
    ds = read_parquet_rowgroups(docs_path, columns=columns)
    ds.write_json(out_dir)
    files = len(glob.glob(os.path.join(out_dir, "*.json")))
    manifest = {"rows": rows, "files": files, "out_dir": out_dir}
    with open(done, "w") as f:
        json.dump(manifest, f)
    return manifest


def export_parquet_partitioned(
    docs_path: str,
    out_dir: str,
    *,
    key_col: str = "doc_id",
    num_partitions: int = 32,
    columns: list[str] | None = None,
    resume: bool = False,
) -> dict:
    """Export a Parquet corpus as HASH-PARTITIONED Parquet with
    PER-PARTITION resume — the brief's "resumable output" contract at
    partition granularity (the JSONL sink's ``export.done`` is
    all-or-nothing; a 100 TB export needs to skip FINISHED partitions
    after a mid-run failure, not restart).

    Layout: ``out_dir/part-{pid:05d}.parquet`` + ``part-{pid:05d}.done``
    (row count JSON), pid = ``blake2b(key) % num_partitions`` (the
    repo's process-stable hash rule — never ``hash()``).  Each
    partition file is written to a tmp name and ``os.rename``d before
    its marker lands (atomic on one filesystem), so a crash leaves
    either nothing or a complete partition — never a torn file with a
    marker.

    ``resume=True`` lists existing markers FIRST and filters those
    partitions out BEFORE the shuffle — finished partitions cost one
    vectorized hash per row, not a write.  One pass + one
    ``num_partitions``-group bucket shuffle (the minimum for a sink
    that must co-locate each partition in one writer).

    Returns ``{"rows", "partitions", "skipped", "out_dir"}``."""
    import glob
    import hashlib
    import json
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pqt

    from .sources.pqread import read_parquet_rowgroups

    os.makedirs(out_dir, exist_ok=True)
    done_pids = set()
    if resume:
        for f in glob.glob(os.path.join(out_dir, "part-*.done")):
            done_pids.add(int(os.path.basename(f)[5:10]))

    def _pid(keys) -> np.ndarray:
        return np.array(
            [
                int.from_bytes(
                    hashlib.blake2b(
                        str(k).encode(), digest_size=8
                    ).digest(),
                    "little",
                )
                % num_partitions
                for k in keys
            ],
            dtype=np.int32,
        )

    def assign(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return batch.add_column(
                0, "pid", pa.array([], pa.int32())
            )
        pid = _pid(batch[key_col].to_pylist())
        keep = ~np.isin(pid, list(done_pids)) if done_pids else None
        out = batch.add_column(0, "pid", pa.array(pid, pa.int32()))
        return out.filter(pa.array(keep)) if keep is not None else out

    def write_partition(group: pa.Table) -> pa.Table:
        if not group.num_rows:
            return pa.table(
                {
                    "pid": pa.array([], pa.int32()),
                    "rows": pa.array([], pa.int64()),
                }
            )
        pid = int(group["pid"][0].as_py())
        body = group.drop_columns(["pid"]).sort_by(
            [(key_col, "ascending")]
        )
        final = os.path.join(out_dir, f"part-{pid:05d}.parquet")
        tmp = final + f".tmp-{os.getpid()}"
        pqt.write_table(body, tmp)
        os.rename(tmp, final)
        with open(
            os.path.join(out_dir, f"part-{pid:05d}.done"), "w"
        ) as f:
            json.dump({"pid": pid, "rows": body.num_rows}, f)
        return pa.table(
            {
                "pid": pa.array([pid], pa.int32()),
                "rows": pa.array([body.num_rows], pa.int64()),
            }
        )

    ds = read_parquet_rowgroups(docs_path, columns=columns)
    manifest = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(write_partition, batch_format="pyarrow")
    )
    import ray

    parts = [
        t for t in ray.get(manifest.to_arrow_refs()) if t.num_rows
    ]
    written = pa.concat_tables(parts) if parts else None
    rows = int(written["rows"].to_pandas().sum()) if written else 0
    n_written = written.num_rows if written else 0
    return {
        "rows": rows,
        "partitions": n_written,
        "skipped": len(done_pids),
        "out_dir": out_dir,
    }


def graph(
    pages_path: str,
    out_dir: str,
    method: str = "pagerank",
    seeds: list[str] | None = None,
) -> dict:
    """Run one host-graph kernel over a crawled pages parquet
    (url, html) and write its result as parquet under ``out_dir`` —
    the ``ray job submit`` surface of the link-graph family (the
    `queries()` entries expose the same kernels to the driver gate).

    Methods: ``pagerank``, ``ppr``*, ``trustrank``*, ``opic``,
    ``hits``, ``components``, ``degrees``, ``bfs``*, ``communities``,
    ``triangles``, ``kcore``, ``linkpred``, ``hyperball``,
    ``neighborhood``, ``reciprocity``, ``assortativity``,
    ``salsa``, ``modularity``, ``bowtie``
    (* = requires ``seeds``).  Edges are built once with the link-only
    extraction projection; every kernel is the same adaptive-tier
    implementation the driver checks.  Returns
    {method, rows, out_dir}."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from .stages import linkgraph as lg
    from .stages.extract import extract_links

    pages = ray.data.read_parquet(pages_path, columns=["url", "html"])
    edges = lg.host_edges(extract_links(pages))
    needs_seeds = {"ppr", "trustrank", "bfs"}
    if method in needs_seeds and not seeds:
        raise ValueError(f"graph method {method!r} requires --seeds")
    kernels = {
        "pagerank": lambda: lg.pagerank_hosts(edges),
        "ppr": lambda: lg.personalized_pagerank_hosts(edges, seeds),
        "trustrank": lambda: lg.trustrank_hosts(edges, seeds),
        "opic": lambda: lg.opic_hosts(edges),
        "hits": lambda: lg.hits_hosts(edges),
        "components": lambda: lg.connected_components(edges),
        "degrees": lambda: lg.host_degrees(edges),
        "bfs": lambda: lg.bfs_hosts(edges, seeds),
        "communities": lambda: lg.lpa_communities(edges),
        "triangles": lambda: lg.host_triangles(edges),
        "kcore": lambda: lg.host_kcore(edges),
        "linkpred": lambda: lg.host_link_prediction(edges),
        "hyperball": lambda: lg.harmonic_hosts(edges),
        "neighborhood": lambda: lg.neighborhood_function(edges),
        "reciprocity": lambda: lg.reciprocity_hosts(edges),
        "assortativity": lambda: lg.assortativity_hosts(edges),
        "salsa": lambda: lg.salsa_hosts(edges),
        "modularity": lambda: lg.community_modularity(edges),
        "bowtie": lambda: lg.host_bowtie(edges),
    }
    if method not in kernels:
        raise ValueError(f"unknown graph method: {method}")
    res = kernels[method]()
    os.makedirs(out_dir, exist_ok=True)
    if isinstance(res, pa.Table):
        pq.write_table(res, os.path.join(out_dir, "part-00000.parquet"))
        rows = res.num_rows
    else:
        res = res.materialize()
        rows = res.count()
        res.write_parquet(out_dir)
    return {"method": method, "rows": int(rows), "out_dir": out_dir}


def dedup(
    docs_path: str,
    out_dir: str,
    method: str = "exact",
    num_buckets: int = 64,
) -> dict:
    """Run one deduplication operator over a documents parquet and
    write its result as partitioned parquet under ``out_dir`` — the
    ``ray job submit`` surface of the dedup family (the `queries()`
    entries expose the same kernels to the driver gate).

    Methods: ``exact`` (md5 keep-first decisions), ``minhash`` /
    ``simhash`` / ``winnow`` (near-dup candidate pairs), ``segments``
    (CCNet segment-cleaned corpus), ``spans`` (Lee-et-al duplicated-
    span-removed corpus).  Returns {method, rows, out_dir}."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    ds = ray.data.read_parquet(docs_path, columns=["doc_id", "text"])
    from .stages import dedup as dd
    from .stages.textstats import winnow_fingerprints  # noqa: F401

    if method == "exact":
        res = dd.exact_dedup(ds)
    elif method == "minhash":
        res = dd.minhash_lsh_pairs(ds)
    elif method == "simhash":
        res = dd.simhash_neardup_pairs(ds)
    elif method == "winnow":
        res = dd.winnow_neardup_pairs(ds, num_buckets=num_buckets)
    elif method == "segments":
        res = dd.segment_dedup(ds, num_buckets=num_buckets)
    elif method == "spans":
        res = dd.dup_span_removal(ds, num_buckets=num_buckets)
    else:
        raise ValueError(f"unknown dedup method: {method}")

    os.makedirs(out_dir, exist_ok=True)
    if isinstance(res, pa.Table):  # adaptive driver-local finishes
        pq.write_table(res, os.path.join(out_dir, "part-00000.parquet"))
        rows = res.num_rows
    else:
        res = res.materialize()
        rows = res.count()
        res.write_parquet(out_dir)
    return {"method": method, "rows": int(rows), "out_dir": out_dir}
