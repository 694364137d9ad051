"""SURT canonical URL keys + CDX-style per-domain rollup.

Common Crawl publishes a CDX(J) URL index per snapshot keyed by SURT
(Sort-friendly URI Reordering Transform, IA webarchive-commons): the
host labels reversed and comma-joined, a ``)`` separator, then the
path — so one registered domain's URLs sort contiguously and a prefix
scan answers "everything under example.com".  These keys are the
lookup/partitioning artifact of a web-scale crawl store: dedup joins,
recrawl diffs and per-domain quota scans all run over SURT ranges
instead of shuffling raw URLs.

Canonicalization rule (deterministic, mirrored EXACTLY by the DuckDB
oracle — every step is a string op both sides implement):

1. drop the scheme; host = chars up to the first ``/``, ``?`` or ``#``,
   lowercased; drop a ``:80`` / ``:443`` default port; strip one
   leading ``www.``;
2. ``rev`` = host labels reversed, comma-joined
   (``sub.example.com`` → ``com,example,sub``);
3. path = chars from the first ``/`` up to ``?`` or ``#`` (``/`` when
   absent); query = chars after the first ``?`` (fragment dropped),
   its ``&``-separated params sorted bytewise;
4. ``surt = rev + ')' + path [+ '?' + sorted-params]``.

``domain_key`` is the PSL-less registered-domain prefix — the last
two host labels reversed (``com,example``) — the CDX partition key.
(A real deployment swaps in the Public Suffix List here; the sandbox
has no data files, and the rule is deterministic either way.)

Scale shape: the key pass is a stateless ``map_batches`` over the url
column only (column-pruned read); the rollup reduces per-batch
distinct (domain_key, host, pages) partials — bounded by host
cardinality, the same driver-side boundary as the host-vertex tables
— with an Arrow hash-agg finish.
"""

from __future__ import annotations

import pyarrow as pa


def surt_key(url: str) -> str:
    """one URL → its SURT key (module-docstring rule)."""
    i = url.find("://")
    rest = url[i + 3 :] if i >= 0 else url
    h_end = len(rest)
    for j, ch in enumerate(rest):
        if ch in "/?#":
            h_end = j
            break
    hostport = rest[:h_end].lower()
    tail = rest[h_end:].split("#", 1)[0]
    if hostport.endswith(":80"):
        hostport = hostport[:-3]
    elif hostport.endswith(":443"):
        hostport = hostport[:-4]
    host = hostport[4:] if hostport.startswith("www.") else hostport
    rev = ",".join(reversed(host.split(".")))
    if not tail or tail[0] == "?":
        path = "/"
        query = tail[1:] if tail else ""
    else:
        sp = tail.split("?", 1)
        path = sp[0]
        query = sp[1] if len(sp) > 1 else ""
    out = rev + ")" + path
    if query:
        out += "?" + "&".join(sorted(query.split("&")))
    return out


def canon_host(url: str) -> str:
    """the canonical host the SURT rule uses (lowercased, default port
    and one leading ``www.`` stripped)."""
    i = url.find("://")
    rest = url[i + 3 :] if i >= 0 else url
    h_end = len(rest)
    for j, ch in enumerate(rest):
        if ch in "/?#":
            h_end = j
            break
    hostport = rest[:h_end].lower()
    if hostport.endswith(":80"):
        hostport = hostport[:-3]
    elif hostport.endswith(":443"):
        hostport = hostport[:-4]
    return hostport[4:] if hostport.startswith("www.") else hostport


def domain_key(host: str) -> str:
    """canonical host → registered-domain CDX prefix (last two labels
    reversed; single-label hosts are their own key)."""
    parts = host.split(".")
    if len(parts) >= 2:
        return parts[-1] + "," + parts[-2]
    return host


def _surt_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    hosts = [canon_host(u) for u in urls]
    return pa.table(
        {
            "url": batch["url"],
            "host": pa.array(hosts, pa.string()),
            "surt": pa.array([surt_key(u) for u in urls], pa.string()),
            "domain_key": pa.array(
                [domain_key(h) for h in hosts], pa.string()
            ),
        }
    )


def surt_table(pages_ds):
    """pages (url) → (url, host, surt, domain_key) — the CDX key pass,
    stateless per batch."""
    return pages_ds.map_batches(_surt_batch, batch_format="pyarrow")


def _cdx_partial(batch: pa.Table) -> pa.Table:
    """per-batch (domain_key, host, pages) partial — distinct hosts
    survive the reduce as rows, page counts as associative sums."""
    if not batch.num_rows:
        return pa.table(
            {
                "domain_key": pa.array([], pa.string()),
                "host": pa.array([], pa.string()),
                "pages": pa.array([], pa.int64()),
            }
        )
    t = _surt_batch(batch).select(["domain_key", "host"])
    agg = t.group_by(["domain_key", "host"]).aggregate(
        [("host", "count")]
    )
    return pa.table(
        {
            "domain_key": agg["domain_key"],
            "host": agg["host"],
            "pages": agg["host_count"].cast(pa.int64()),
        }
    )


def cdx_domains(pages_ds) -> pa.Table:
    """pages (url) → (domain_key, pages, hosts): the CDX per-domain
    rollup (page volume + distinct-host fanout per registered domain)
    a crawl-store operator reads for quota and coverage decisions.
    Partials are host-cardinality-bounded; the finish is one Arrow
    hash-agg (pages sum + host row count per domain)."""
    import ray

    parts = [
        t
        for t in ray.get(
            pages_ds.map_batches(_cdx_partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return pa.table(
            {
                "domain_key": pa.array([], pa.string()),
                "pages": pa.array([], pa.int64()),
                "hosts": pa.array([], pa.int64()),
            }
        )
    cat = pa.concat_tables(parts)
    # re-distinct (domain, host) across batch partials, then roll up
    hosts_t = cat.group_by(["domain_key", "host"]).aggregate(
        [("pages", "sum")]
    )
    out = hosts_t.group_by("domain_key").aggregate(
        [("pages_sum", "sum"), ("host", "count")]
    )
    return pa.table(
        {
            "domain_key": out["domain_key"],
            "pages": out["pages_sum_sum"].cast(pa.int64()),
            "hosts": out["host_count"].cast(pa.int64()),
        }
    )
