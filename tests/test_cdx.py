"""SURT canonical URL keys + CDX domain rollup: hand-pinned
canonicalization edge cases, DuckDB string-op differential on
adversarial URLs (the oracle's exact SQL fragment semantics), and the
rollup vs a set-based brute force."""

import duckdb
import pyarrow as pa


CASES = {
    # basic: reverse labels, path kept
    "https://firm0.io/jobs/dev-1": "io,firm0)/jobs/dev-1",
    # no path -> '/'
    "https://firm0.io": "io,firm0)/",
    # query params sorted, path case preserved
    "http://a.b.com/Path?b=2&a=1": "com,b,a)/Path?a=1&b=2",
    # default ports stripped (http:80, https:443), www stripped
    "http://www.example.com:80/x": "com,example)/x",
    "https://www.example.com:443/x": "com,example)/x",
    # non-default port kept (rides its label through the reversal —
    # the rule is label-reversal of the lowered host:port string)
    "http://Example.COM:8080/x": "com:8080,example)/x",
    # fragment dropped, before and after query
    "https://h.io/p#frag": "io,h)/p",
    "https://h.io/p?z=1&y=2#frag": "io,h)/p?y=2&z=1",
    # query directly after host
    "https://h.io?b=1&a=2": "io,h)/?a=2&b=1",
    # second '?' stays inside the query string (split on FIRST ?)
    "https://h.io/p?b=x?y&a=1": "io,h)/p?a=1&b=x?y",
    # deep subdomains
    "https://a.b.c.d.net/q": "net,d,c,b,a)/q",
}


def test_surt_key_hand_cases():
    from crawler_ai_ray.stages.cdx import domain_key, surt_key

    for url, want in CASES.items():
        assert surt_key(url) == want, url
    assert domain_key("a.b.c.d.net") == "net,d"
    assert domain_key("localhost") == "localhost"


def test_surt_sql_differential(tmp_path):
    """the EXACT SQL fragment the oracle uses, run over the
    adversarial URLs, matches the python rule byte-for-byte."""
    from crawler_ai_ray.stages.cdx import canon_host, domain_key, surt_key

    import __ray_entry__ as entry

    urls = sorted(CASES)
    pq = tmp_path / "pages.parquet"
    import pyarrow.parquet as pqt

    pqt.write_table(pa.table({"url": pa.array(urls, pa.string())}), pq)
    sql = entry.oracle_sql()["crawl_url_surt"].replace(
        entry._corpus("/root/testdata/sf0.01") + "/pages.parquet",
        str(pq),
    )
    got = {
        r[0]: (r[1], r[2], r[3]) for r in duckdb.sql(sql).fetchall()
    }
    for u in urls:
        h = canon_host(u)
        assert got[u] == (h, surt_key(u), domain_key(h)), u


def test_cdx_domains_rollup(ray_session):
    import ray.data

    from crawler_ai_ray.stages.cdx import cdx_domains

    urls = [
        "https://a.x.io/1",
        "https://a.x.io/2",
        "https://b.x.io/1",
        "https://y.com/",
        "https://www.y.com/2",  # same canonical host as y.com
    ]
    out = (
        cdx_domains(
            ray.data.from_arrow(
                pa.table({"url": pa.array(urls, pa.string())})
            ).repartition(3)
        )
        .to_pandas()
        .set_index("domain_key")
        .sort_index()
    )
    assert out.loc["io,x", "pages"] == 3
    assert out.loc["io,x", "hosts"] == 2
    assert out.loc["com,y", "pages"] == 2
    assert out.loc["com,y", "hosts"] == 1
