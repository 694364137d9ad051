"""Sandbox fetch backend — host-sharded page-store actors standing in for
the network.

The driver's BASELINE.json pins "the ``html`` column *is* the network":
fetching a URL resolves against the synthetic ``pages`` Parquet table.
This is realized as an actor pool sharded by ``crc32(host)`` — the same
partitioning key as the URL-seen pool — so one batched actor call per
(host, wave) returns that wave's HTML.  The public fetch interface
(``fetch(urls) -> status/html``) is exactly what a real aiohttp/browser
backend would implement (reference retry/backoff taxonomy:
``crawler.py:136-455``); swapping backends does not touch the pipeline.

Scale notes: each shard holds ``corpus/num_shards`` bytes; a production
deployment replaces these actors with real HTTP clients, so shard memory
is a sandbox artifact, not a design property.  The alternative
``fetch="join"`` path (hash join of the wave against the pages Dataset
on ``url``) exercises the J3 shuffle instead.
"""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

import zlib

from .seen import shard_for_host
from ..functions.classify import host_of
from ..functions.fetch_errors import (
    DEFAULT_ATTEMPTS,
    DEFAULT_HEAD,
    MISS_ATTEMPTS,
    simulate_fetch,
)

__all__ = ["PageStoreShard", "PageStorePool", "store_shard_for_host"]


def store_shard_for_host(host: str, num_shards: int) -> int:
    """Page-store shard routing: RANGE partition over the 256-bucket
    ``hshard = crc32(host) % 256`` key (shard s owns the contiguous
    bucket run ``b * num_shards // 256 == s``), unlike the seen pool's
    modulo mapping.  Contiguity is the point — the corpus parquet is
    written sorted by hshard (sources/synth.py), so a shard's init read
    prunes to its own row groups by min/max stats; a modulo mapping
    scatters every shard across every row group and prunes nothing."""
    if num_shards > 256:
        return shard_for_host(host, num_shards)
    return (zlib.crc32(host.encode("utf-8")) % 256) * num_shards // 256


class PageStoreShard:
    """Holds url → html (plus fetch-outcome profiles) for all hosts
    mapping to this shard."""

    def __init__(self, pages_path: str, shard: int, num_shards: int) -> None:
        self.pages: dict[str, bytes] = {}
        schema = pq.read_schema(pages_path)
        if "hshard" in schema.names and num_shards <= 256:
            # v25+ corpora carry hshard = crc32(host) % 256 and are
            # written SORTED by it; store_shard_for_host range-
            # partitions that key, so this contiguous-range filter
            # prunes at row-group stats: each shard decodes
            # ~1/num_shards of the file instead of the whole corpus ×
            # num_shards.  Exact — hshard fully determines the shard.
            lo = [b for b in range(256)
                  if b * num_shards // 256 == shard]
            sub = pq.read_table(
                pages_path,
                columns=["url", "html"],
                filters=[
                    ("hshard", ">=", lo[0]),
                    ("hshard", "<=", lo[-1]),
                ],
            )
            self.pages = dict(
                zip(sub["url"].to_pylist(), sub["html"].to_pylist())
            )
        else:
            tbl = pq.read_table(pages_path, columns=["url", "html"])
            urls = tbl["url"].to_pylist()
            keep = [
                i
                for i, u in enumerate(urls)
                if store_shard_for_host(host_of(u), num_shards) == shard
            ]
            if keep:
                sub = tbl.take(keep)
                self.pages = dict(
                    zip(sub["url"].to_pylist(), sub["html"].to_pylist())
                )
        # non-default fetch profiles (retry/error fixtures) — absent for
        # corpora predating fetchcfg; everything then gets the defaults
        self.profiles: dict[str, tuple[int, list[int]]] = {}
        cfg_path = os.path.join(os.path.dirname(pages_path), "fetchcfg.parquet")
        if os.path.exists(cfg_path):
            cfg = pq.read_table(cfg_path)
            for u, h, hs, att in zip(
                cfg["url"].to_pylist(),
                cfg["host"].to_pylist(),
                cfg["head_status"].to_pylist(),
                cfg["attempts"].to_pylist(),
            ):
                if store_shard_for_host(h, num_shards) == shard:
                    self.profiles[u] = (hs, att)

    def fetch(self, urls: list[str]) -> list[bytes | None]:
        """None = 404 (URL not in the corpus)."""
        return [self.pages.get(u) for u in urls]

    def fetch_detailed(self, urls: list[str]) -> list[dict]:
        """Full fetch outcome per URL: the reference retry/backoff/
        error-taxonomy replay (``functions/fetch_errors``) + html on
        success.  A URL absent from both corpus and cfg is a straight
        GET 404 (``not_found``)."""
        out = []
        for u in urls:
            html = self.pages.get(u)
            if u in self.profiles:
                head, att = self.profiles[u]
            elif html is not None:
                head, att = DEFAULT_HEAD, DEFAULT_ATTEMPTS
            else:
                head, att = DEFAULT_HEAD, MISS_ATTEMPTS
            r = simulate_fetch(u, head, att)
            r["html"] = html if r["success"] else None
            out.append(r)
        return out

    def n_pages(self) -> int:
        return len(self.pages)


class PageStorePool:
    def __init__(self, pages_path: str, num_shards: int = 8) -> None:
        import ray

        self.num_shards = num_shards
        actor = ray.remote(num_cpus=0.25)(PageStoreShard)
        self.shards = [
            actor.remote(pages_path, i, num_shards) for i in range(num_shards)
        ]

    def handle_for_host(self, host: str):
        return self.shards[store_shard_for_host(host, self.num_shards)]

    def fetch(self, host: str, urls: list[str]) -> list[bytes | None]:
        import ray

        return ray.get(self.handle_for_host(host).fetch.remote(urls))

    def shutdown(self) -> None:
        import ray

        for s in self.shards:
            ray.kill(s)
        self.shards = []
