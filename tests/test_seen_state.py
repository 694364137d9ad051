"""URL-seen state: cuckoo-filter properties (no false negatives,
bounded false positives, dump/restore), shard semantics, and an
approximate-seen crawl run (ST1 scale path)."""

from __future__ import annotations

import numpy as np
import pytest

from crawler_ai_ray.state.seen import (
    CuckooFilter,
    UrlSeenShard,
    _hash_urls,
    shard_for_host,
)


class TestCuckooFilter:
    def test_no_false_negatives(self):
        f = CuckooFilter(capacity=1 << 14)
        urls = [f"https://h{i % 97}.vn/page/{i}" for i in range(5000)]
        h = _hash_urls(urls)
        f.add_many(h)
        assert not f.overflowed
        assert f.contains_many(h).all()

    def test_false_positive_rate_bounded(self):
        f = CuckooFilter(capacity=1 << 14)
        f.add_many(_hash_urls([f"https://a.vn/{i}" for i in range(5000)]))
        other = _hash_urls([f"https://b.vn/{i}" for i in range(20000)])
        fp_rate = f.contains_many(other).mean()
        # 16-bit fingerprints, 8 slots probed → ~8/2^16 ≈ 0.012%
        assert fp_rate < 0.005

    def test_deterministic(self):
        a, b = CuckooFilter(1 << 12), CuckooFilter(1 << 12)
        h = _hash_urls([f"u{i}" for i in range(1000)])
        a.add_many(h)
        b.add_many(h)
        assert np.array_equal(a.table, b.table)


class TestUrlSeenShard:
    def test_exact_anti_join_and_within_batch_dedup(self):
        s = UrlSeenShard(exact=True)
        out = s.check_and_add(["u1", "u2", "u1"])
        assert out == [True, True, False]
        assert s.check_and_add(["u2", "u3"]) == [False, True]
        assert s.n_seen() == 3

    def test_approximate_within_batch_dedup(self):
        s = UrlSeenShard(exact=False)
        out = s.check_and_add(["u1", "u2", "u1"])
        assert out == [True, True, False]
        assert s.check_and_add(["u1"]) == [False]

    def test_delta_dump_restore_roundtrip(self):
        s = UrlSeenShard(exact=True)
        s.check_and_add(["a", "b"])
        d1 = s.dump_delta()
        s.check_and_add(["c"])
        d2 = s.dump_delta()
        assert d1["url"].to_pylist() == ["a", "b"]
        assert d2["url"].to_pylist() == ["c"]
        r = UrlSeenShard(exact=True)
        r.restore(d1)
        r.restore(d2)
        assert r.check_and_add(["a", "c", "new"]) == [False, False, True]

    def test_shard_routing_stable(self):
        assert shard_for_host("acme.vn", 8) == shard_for_host("acme.vn", 8)
        assert 0 <= shard_for_host("x.vn", 8) < 8


@pytest.mark.usefixtures("ray_session")
def test_crawl_with_approximate_seen_matches_exact(unit_corpus, tmp_path):
    """ST1 scale path: the cuckoo-only (approximate) URL-seen run must
    match the exact run at unit scale — the filter's false positives
    (the only error mode: a fresh URL wrongly dropped) are ~1e-4 and do
    not fire on the unit corpus."""
    import pyarrow.compute as pc
    from crawler_ai_ray.pipelines.crawl import (
        CrawlConfig,
        read_crawl_output,
        run_crawl,
    )

    logs = {}
    for name, exact in (("exact", True), ("approx", False)):
        out = str(tmp_path / name)
        run_crawl(
            CrawlConfig(
                unit_corpus, out, seen_shards=4, store_shards=2,
                exact_seen=exact,
            )
        )
        logs[name] = (
            read_crawl_output(
                out,
                columns=["host", "url", "host_seq", "success"],
                filter=pc.field("kind") == "o",
            )
            .sort_by([("host", "ascending"), ("host_seq", "ascending")])
            .to_pylist()
        )
    assert logs["approx"] == logs["exact"]


def test_check_and_add_epoch_idempotent():
    """A retried bucket task (same epoch) must replay its ORIGINAL
    answer — not see its own first attempt's marks — while a new epoch
    observes the post-attempt state; old rounds' cache entries prune."""
    from crawler_ai_ray.state.seen import UrlSeenShard

    sh = UrlSeenShard(exact=True)
    urls = [f"https://h.com/p{i}" for i in range(5)]
    first = sh.check_and_add(urls, epoch="3:7:0")
    assert first == [True] * 5
    # retry: identical answer, no state change
    assert sh.check_and_add(urls, epoch="3:7:0") == first
    assert sh.n_seen() == 5
    # a different epoch sees them as already-seen
    assert sh.check_and_add(urls, epoch="3:8:0") == [False] * 5
    # next round prunes older entries, then caches its own
    sh.check_and_add(["https://h.com/new"], epoch="4:0:0")
    assert "3:7:0" not in sh._epoch_cache
    assert "4:0:0" in sh._epoch_cache
    # epoch-less calls bypass the cache entirely (legacy behavior)
    assert sh.check_and_add(["https://h.com/x"]) == [True]
    assert sh.check_and_add(["https://h.com/x"]) == [False]
