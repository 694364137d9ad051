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

import pyarrow.compute as pc
import pyarrow.parquet as pq

from .seen import shard_for_host
from ..functions.classify import host_of

__all__ = ["PageStoreShard", "PageStorePool"]


class PageStoreShard:
    """Holds url → html for all hosts mapping to this shard."""

    def __init__(self, pages_path: str, shard: int, num_shards: int) -> None:
        self.pages: dict[str, bytes] = {}
        tbl = pq.read_table(pages_path, columns=["url", "html"])
        urls = tbl["url"].to_pylist()
        keep = [
            i
            for i, u in enumerate(urls)
            if shard_for_host(host_of(u), num_shards) == shard
        ]
        if keep:
            sub = tbl.take(keep)
            self.pages = dict(zip(sub["url"].to_pylist(), sub["html"].to_pylist()))

    def fetch(self, urls: list[str]) -> list[bytes | None]:
        """None = 404 (URL not in the corpus)."""
        return [self.pages.get(u) for u in urls]

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
        return self.shards[shard_for_host(host, self.num_shards)]

    def fetch(self, host: str, urls: list[str]) -> list[bytes | None]:
        import ray

        return ray.get(self.handle_for_host(host).fetch.remote(urls))

    def shutdown(self) -> None:
        import ray

        for s in self.shards:
            ray.kill(s)
        self.shards = []
