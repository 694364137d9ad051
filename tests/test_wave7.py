"""Wave-7 operators: SALSA (closed form), community modularity,
bowtie decomposition, LIX/RIX readability, embedding covariance.

Each engine kernel is differentially tested against an independent
naive reference (pure-Python BFS/union-find/`re` counting, numpy
covariance) on randomized inputs — the repo's oracle-golden pattern.
"""
from __future__ import annotations

import random
import re
from collections import defaultdict, deque

import numpy as np
import pyarrow as pa
import pytest


def _graph_tbl(hosts, pairs):
    links = {h: [] for h in hosts}
    for s, d in pairs:
        links[s].append(f"https://{d}/p")
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "out_links": pa.array(
                [links[h] for h in hosts], pa.list_(pa.string())
            ),
        }
    )


def _rand_pairs(hosts, n, seed):
    rng = random.Random(seed)
    pairs = set()
    for _ in range(n):
        s, d = rng.sample(hosts, 2)
        pairs.add((s, d))
    return pairs


@pytest.mark.parametrize("seed", [7, 19, 43])
def test_salsa_matches_naive_closed_form(ray_session, seed):
    import ray.data

    from crawler_ai_ray.stages.linkgraph import host_edges, salsa_hosts

    hosts = [f"x{i}.com" for i in range(28)]
    pairs = _rand_pairs(hosts, 55, seed)
    got = salsa_hosts(
        host_edges(ray.data.from_arrow(_graph_tbl(hosts, pairs)))
    )

    indeg, outdeg = defaultdict(int), defaultdict(int)
    for s, d in pairs:
        outdeg[s] += 1
        indeg[d] += 1
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for s, d in pairs:
        ra, rb = find("h:" + s), find("a:" + d)
        if ra != rb:
            parent[rb] = ra
    comp = defaultdict(list)
    for n in parent:
        comp[find(n)].append(n)
    want = {}
    for side, prefix, deg in (("hub", "h:", outdeg), ("auth", "a:", indeg)):
        side_nodes = [n for n in parent if n.startswith(prefix)]
        tot = len(side_nodes)
        for cnodes in comp.values():
            cn = [n for n in cnodes if n.startswith(prefix)]
            if not cn:
                continue
            csum = sum(deg[n[2:]] for n in cn)
            for n in cn:
                h = n[2:]
                want[(h, side)] = (
                    deg[h],
                    len(cn),
                    (len(cn) * deg[h] * 1_000_000) // (tot * csum),
                )
    gd = {
        (h, s): (d, c, m)
        for h, s, d, c, m in zip(
            got["host"].to_pylist(),
            got["side"].to_pylist(),
            got["degree"].to_pylist(),
            got["comp_size"].to_pylist(),
            got["score_micros"].to_pylist(),
        )
    }
    assert gd == want
    # per-side stationary mass sums to ~1 (floor-division dust only)
    for side in ("hub", "auth"):
        tot_mass = sum(v[2] for k, v in gd.items() if k[1] == side)
        n_side = sum(1 for k in gd if k[1] == side)
        assert 1_000_000 - n_side <= tot_mass <= 1_000_000


@pytest.mark.parametrize("seed", [11, 29])
def test_modularity_matches_naive(ray_session, seed):
    import ray.data

    from crawler_ai_ray.stages.linkgraph import (
        community_modularity,
        host_edges,
        lpa_communities,
    )

    rng = random.Random(seed)
    hosts = [f"x{i}.com" for i in range(36)]
    pairs = set()
    for grp in (hosts[:16], hosts[16:]):
        for _ in range(90):
            s, d = rng.sample(grp, 2)
            pairs.add((s, d))
    for _ in range(6):
        s, d = rng.sample(hosts, 2)
        pairs.add((s, d))
    edges = host_edges(ray.data.from_arrow(_graph_tbl(hosts, pairs)))
    labels = lpa_communities(edges)
    got = community_modularity(edges)

    lab = dict(
        zip(labels["host"].to_pylist(), labels["community"].to_pylist())
    )
    und = {(min(s, d), max(s, d)) for s, d in pairs}
    m = len(und)
    m_in, dsum, nh = defaultdict(int), defaultdict(int), defaultdict(int)
    for a, b in und:
        if lab[a] == lab[b]:
            m_in[lab[a]] += 1
        dsum[lab[a]] += 1
        dsum[lab[b]] += 1
    for c in lab.values():
        nh[c] += 1
    want = {
        c: (
            nh[c],
            m_in[c],
            dsum[c],
            (m_in[c] * 1_000_000) // m
            - (dsum[c] * dsum[c] * 1_000_000) // (4 * m * m),
        )
        for c in nh
    }
    gd = {
        c: (n, mi, ds, q)
        for c, n, mi, ds, q in zip(
            got["community"].to_pylist(),
            got["n_hosts"].to_pylist(),
            got["m_in"].to_pylist(),
            got["d_sum"].to_pylist(),
            got["q_micros"].to_pylist(),
        )
    }
    assert gd == want
    # the planted two-cluster graph has real structure
    assert sum(q for *_, q in gd.values()) > 200_000


@pytest.mark.parametrize("seed", [3, 17])
def test_bowtie_matches_naive_bfs(ray_session, seed):
    import ray.data

    from crawler_ai_ray.stages.linkgraph import host_bowtie, host_edges

    rng = random.Random(seed)
    hosts = [f"x{i:02d}.com" for i in range(32)]
    core = hosts[:7]
    pairs = set()
    for i in range(7):
        pairs.add((core[i], core[(i + 1) % 7]))
    for h in hosts[7:14]:
        pairs.add((h, rng.choice(core)))
    for h in hosts[14:21]:
        pairs.add((rng.choice(core), h))
    for _ in range(6):
        s, d = rng.sample(hosts[21:], 2)
        pairs.add((s, d))
    got = host_bowtie(
        host_edges(ray.data.from_arrow(_graph_tbl(hosts, pairs)))
    )

    indeg, outdeg = defaultdict(int), defaultdict(int)
    fwd, bwd = defaultdict(list), defaultdict(list)
    verts = set()
    for s, d in pairs:
        outdeg[s] += 1
        indeg[d] += 1
        fwd[s].append(d)
        bwd[d].append(s)
        verts |= {s, d}
    pivot = min(verts, key=lambda h: (-(indeg[h] + outdeg[h]), h))

    def bfs(adj, s, cap=8):
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= cap:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return dist

    f, b = bfs(fwd, pivot), bfs(bwd, pivot)
    want = {}
    for h in verts:
        fd, bd = f.get(h, 9), b.get(h, 9)
        reg = (
            "CORE"
            if fd <= 8 and bd <= 8
            else ("IN" if bd <= 8 else ("OUT" if fd <= 8 else "OTHER"))
        )
        want[h] = (fd, bd, reg)
    gd = {
        h: (fd, bd, r)
        for h, fd, bd, r in zip(
            got["host"].to_pylist(),
            got["fw_dist"].to_pylist(),
            got["bw_dist"].to_pylist(),
            got["region"].to_pylist(),
        )
    }
    assert gd == want
    assert {r for *_, r in gd.values()} >= {"CORE", "IN", "OUT"}


def test_readability_matches_naive_re():
    from crawler_ai_ray.stages.textstats import readability_batch

    texts = [
        "The quick brown fox jumps over the lazy dog. It runs! Why?",
        "Internationalization considerations require extraordinary "
        "documentation... Seriously?!",
        "",
        "no terminators here just words and somelongwordhere",
        "a. b. c. d!",
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = readability_batch(batch)
    for i, t in enumerate(texts):
        words = len(re.findall(r"[A-Za-z0-9]+", t))
        longw = len(re.findall(r"[A-Za-z0-9]{7,}", t))
        sents = len(re.findall(r"[.!?]+", t))
        s1 = max(sents, 1)
        lix = (
            (words * 1_000_000) // s1 + (longw * 100_000_000) // words
            if words
            else 0
        )
        rix = (longw * 1_000_000) // s1
        assert got["n_words"][i].as_py() == words
        assert got["n_long_words"][i].as_py() == longw
        assert got["n_sentences"][i].as_py() == sents
        assert got["lix_micros"][i].as_py() == lix
        assert got["rix_micros"][i].as_py() == rix


def test_embedding_covariance_exact_and_partition_invariant(ray_session):
    import ray.data

    from crawler_ai_ray.stages.simsearch import embedding_covariance

    rng = np.random.default_rng(5)
    n, dim = 300, 8
    mat = rng.normal(scale=0.3, size=(n, dim)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float32()), dim
            ).cast(pa.list_(pa.float32())),
        }
    )
    got = embedding_covariance(ray.data.from_arrow(tbl))
    got2 = embedding_covariance(
        ray.data.from_arrow(tbl).repartition(7)
    )
    assert got.sort_by([("i", "ascending"), ("j", "ascending")]).equals(
        got2.sort_by([("i", "ascending"), ("j", "ascending")])
    )

    # naive exact integer recompute (the oracle's arithmetic)
    x = mat.astype(np.float64) * 1e6
    q = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
    gd = {
        (i, j): c
        for i, j, c in zip(
            got["i"].to_pylist(),
            got["j"].to_pylist(),
            got["cov_pico"].to_pylist(),
        )
    }
    assert len(gd) == dim * (dim + 1) // 2
    for i in range(dim):
        for j in range(i, dim):
            num = int(n) * int(np.dot(q[:, i], q[:, j])) - int(
                q[:, i].sum()
            ) * int(q[:, j].sum())
            c = abs(num) // (n * n)
            want = -c if num < 0 else c
            assert gd[(i, j)] == want
    # float sanity: matches numpy population covariance to micro scale
    C = np.cov(mat.astype(np.float64), rowvar=False, bias=True)
    for i in range(dim):
        assert abs(gd[(i, i)] / 1e12 - C[i, i]) < 2e-6


def test_wave7_empty_graph(ray_session):
    import ray.data

    from crawler_ai_ray.stages.linkgraph import (
        community_modularity,
        host_bowtie,
        host_edges,
        salsa_hosts,
    )

    tbl = pa.table(
        {
            "host": pa.array(["solo.com"], pa.string()),
            "out_links": pa.array([[]], pa.list_(pa.string())),
        }
    )
    edges = host_edges(ray.data.from_arrow(tbl))
    assert salsa_hosts(edges).num_rows == 0
    assert community_modularity(edges).num_rows == 0
    assert host_bowtie(edges).num_rows == 0


def test_pca_top_component_matches_numpy_and_partitioning(ray_session):
    import ray.data

    from crawler_ai_ray.stages.simsearch import pca_top_component

    rng = np.random.default_rng(9)
    n, dim = 400, 6
    # well-separated spectrum: one dominant axis + noise
    base = rng.normal(size=(n, 1)) @ np.array([[3.0, 1.5, 0.5, 0, 0, 0]])
    mat = (base + rng.normal(scale=0.1, size=(n, dim))).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float32()), dim
            ).cast(pa.list_(pa.float32())),
        }
    )
    got = pca_top_component(ray.data.from_arrow(tbl))
    got2 = pca_top_component(ray.data.from_arrow(tbl).repartition(5))
    assert got.equals(got2)  # partition-invariant integer math

    v = np.array(got["loading_micros"].to_pylist(), np.float64)
    v /= np.linalg.norm(v)
    C = np.cov(mat.astype(np.float64), rowvar=False, bias=True)
    w, V = np.linalg.eigh(C)
    top = V[:, -1]
    assert abs(abs(np.dot(v, top)) - 1.0) < 1e-4  # same direction
    eig = got["eigval_pico"][0].as_py() / 1e12
    assert abs(eig - w[-1]) / w[-1] < 1e-3  # Rayleigh quotient


def test_rake_keywords_hand_computed():
    from crawler_ai_ray.stages.textstats import rake_keywords_batch

    # classic RAKE behavior: multi-word phrases outrank single words
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                [
                    "Deep learning models and deep learning systems. "
                    "The models work!",
                    "",
                ],
                pa.string(),
            ),
        }
    )
    got = rake_keywords_batch(batch)
    rows = list(
        zip(
            got["doc_id"].to_pylist(),
            got["rank"].to_pylist(),
            got["phrase"].to_pylist(),
            got["score_micros"].to_pylist(),
        )
    )
    assert all(d == 1 for d, *_ in rows)  # empty doc 2 emits nothing
    # phrases: "deep learning models", "deep learning systems",
    # "models work".  freq: deep 2, learning 2, models 2, systems 1,
    # work 1. deg: deep 6, learning 6, models 5, systems 3, work 2.
    ws = {
        "deep": 3_000_000,
        "learning": 3_000_000,
        "models": 2_500_000,
        "systems": 3_000_000,
        "work": 2_000_000,
    }
    want = {
        "deep learning models": ws["deep"] + ws["learning"] + ws["models"],
        "deep learning systems": ws["deep"]
        + ws["learning"]
        + ws["systems"],
        "models work": ws["models"] + ws["work"],
    }
    got_scores = {p: s for _, _, p, s in rows}
    assert got_scores == want
    # rank 1 = highest score (systems: 9M beats models: 8.5M)
    assert rows[0][2] == "deep learning systems"


def test_rake_adjacent_stopword_runs():
    from crawler_ai_ray.stages.textstats import _rake_canon

    # runs of 1-4 stopwords all collapse to delimiters (two-pass rule)
    s = _rake_canon("alpha the beta the and gamma the and of delta")
    phrases = [p for p in s.split("|") if p.strip()]
    assert [p.strip() for p in phrases] == [
        "alpha",
        "beta",
        "gamma",
        "delta",
    ]


def test_robots_audit_path_parity_and_gate_agreement(ray_session):
    """The audit's shared path regex must agree with the gate's
    urlparse on corpus-shaped and adversarial URLs, and the audit's
    blocked column must equal `robots_allowed` with obey_robots on."""
    from urllib.parse import urlparse

    import ray.data

    from crawler_ai_ray.state.politeness import (
        _PATH_RX,
        CrawlPolicy,
        HostPolicy,
        robots_audit,
    )

    urls = [
        "https://a.com/products/x?page=2",
        "https://a.com/blog/post#frag",
        "https://a.com",
        "https://a.com/",
        "https://a.com/careers",
        "http://b.com/products/deep/path.html?a=1#b",
        "https://c.com/?onlyquery=1",
    ]
    for u in urls:
        m = _PATH_RX.match(u)
        assert ((m.group(1) if m else "") or "/") == (
            urlparse(u).path or "/"
        )

    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    cfg = pa.table(
        {
            "host": pa.array(["a.com", "b.com"], pa.string()),
            "crawl_delay_s": pa.array([0.0, 0.0], pa.float64()),
            "robots_disallow": pa.array(
                [["/products/", "/blog/"], ["/products/"]],
                pa.list_(pa.string()),
            ),
            "max_pages": pa.array([50, 50], pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as td:
        cfgp = os.path.join(td, "hostcfg.parquet")
        pq.write_table(cfg, cfgp)
        pages = ray.data.from_arrow(
            pa.table({"url": pa.array(urls, pa.string())})
        )
        got = robots_audit(pages, cfgp)
        blocks = [t for t in got.to_arrow_refs()]
        import ray as _ray

        tab = pa.concat_tables(
            [t for t in _ray.get(blocks) if t.num_rows]
        )
        pol = CrawlPolicy(obey_robots=True)
        pol.hosts = {
            "a.com": HostPolicy(
                robots_disallow=("/products/", "/blog/")
            ),
            "b.com": HostPolicy(robots_disallow=("/products/",)),
        }
        gd = dict(zip(tab["url"].to_pylist(), tab["blocked"].to_pylist()))
        for u in urls:
            host = urlparse(u).netloc.lower()
            assert gd[u] == (not pol.robots_allowed(host, u)), u
        assert gd["https://a.com/products/x?page=2"] is True
        assert gd["https://a.com/careers"] is False
        rules = dict(zip(tab["url"].to_pylist(), tab["rule"].to_pylist()))
        assert rules["https://a.com/blog/post#frag"] == "/blog/"
        assert rules["https://c.com/?onlyquery=1"] == ""


def test_pca_project_bins_and_exactness(ray_session):
    import ray.data

    from crawler_ai_ray.stages.simsearch import (
        pca_project,
        pca_top_component,
    )

    rng = np.random.default_rng(21)
    n, dim = 250, 5
    mat = rng.normal(scale=0.4, size=(n, dim)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float32()), dim
            ).cast(pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    got = pca_project(ds).sort_by([("vec_id", "ascending")])
    got2 = pca_project(ds.repartition(6)).sort_by(
        [("vec_id", "ascending")]
    )
    assert got.equals(got2)

    comp = pca_top_component(ds)
    v = np.array(comp["loading_micros"].to_pylist(), np.int64)
    x = mat.astype(np.float64) * 1e6
    q = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
    want_proj = q @ v
    assert got["proj_pico"].to_numpy(zero_copy_only=False).tolist() == \
        want_proj.tolist()
    # equal-split bins over (proj, id): 250 rows → 10 bins of 25
    import collections

    counts = collections.Counter(got["bin"].to_pylist())
    assert all(counts[b] == 25 for b in range(1, 11))
    # bin order follows projection order
    pj = got["proj_pico"].to_numpy(zero_copy_only=False)
    bn = got["bin"].to_numpy(zero_copy_only=False)
    order = np.lexsort((got["vec_id"].to_numpy(zero_copy_only=False), pj))
    assert (np.diff(bn[order]) >= 0).all()


def test_fluency_buckets_per_lang_terciles(ray_session):
    import ray.data

    from crawler_ai_ray.stages.textstats import (
        bigram_fluency,
        fluency_buckets,
    )

    rng = random.Random(31)
    words_en = ["the", "cat", "sat", "mat", "dog", "ran", "fast"]
    words_vi = ["xin", "chao", "ban", "toi", "la", "nguoi"]
    rows = []
    for i in range(60):
        lang = "en" if i % 2 == 0 else "vi"
        ws = words_en if lang == "en" else words_vi
        rows.append(
            (i, " ".join(rng.choice(ws) for _ in range(30)), lang)
        )
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    got = fluency_buckets(ds)

    # naive: recompute buckets from the fluency kernel's own output
    import ray as _ray

    flu = pa.concat_tables(
        [t for t in _ray.get(bigram_fluency(ds).to_arrow_refs()) if t.num_rows]
    )
    fl = dict(
        zip(flu["doc_id"].to_pylist(), flu["fluency_ppm"].to_pylist())
    )
    lang_of = {r[0]: r[2] for r in rows}
    want = {}
    for lang in ("en", "vi"):
        docs = sorted(
            (d for d in fl if lang_of[d] == lang),
            key=lambda d: (-fl[d], d),
        )
        for r0, d in enumerate(docs):
            want[d] = ["head", "middle", "tail"][(r0 * 3) // len(docs)]
    gd = dict(zip(got["doc_id"].to_pylist(), got["bucket"].to_pylist()))
    assert gd == want
    # terciles are balanced per language (30 docs → 10/10/10)
    from collections import Counter

    for lang in ("en", "vi"):
        c = Counter(
            b
            for d, b in gd.items()
            if lang_of[d] == lang
        )
        assert c == {"head": 10, "middle": 10, "tail": 10}


@pytest.mark.parametrize("seed", [13, 37])
def test_betweenness_matches_naive_brandes(ray_session, seed):
    import ray.data

    from crawler_ai_ray.stages.linkgraph import (
        betweenness_hosts,
        host_edges,
    )

    rng = random.Random(seed)
    hosts = [f"x{i:02d}.com" for i in range(36)]
    pairs = _rand_pairs(hosts, 100, seed)
    edges = host_edges(ray.data.from_arrow(_graph_tbl(hosts, pairs)))
    got = betweenness_hosts(edges)
    got_bcast = betweenness_hosts(edges, driver_max_edges=0)
    assert got.sort_by([("host", "ascending")]).equals(
        got_bcast.sort_by([("host", "ascending")])
    )

    # independent naive Brandes with the same integer quantization
    indeg, outdeg = defaultdict(int), defaultdict(int)
    adj, radj = defaultdict(list), defaultdict(list)
    verts = set()
    for s, d in pairs:
        outdeg[s] += 1
        indeg[d] += 1
        adj[s].append(d)
        radj[d].append(s)
        verts |= {s, d}
    srcs = sorted(verts, key=lambda h: (-(indeg[h] + outdeg[h]), h))[:4]
    bc = defaultdict(int)
    cap = 8
    for s in srcs:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= cap:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        bylevel = defaultdict(list)
        for v, dv in dist.items():
            bylevel[dv].append(v)
        sigma = defaultdict(int)
        sigma[s] = 1
        for t in range(1, max(bylevel) + 1):
            for v in bylevel[t]:
                sigma[v] = sum(
                    sigma[u]
                    for u in radj[v]
                    if dist.get(u, 99) == t - 1
                )
        delta = defaultdict(int)
        for t in range(max(bylevel) - 1, -1, -1):
            for v in bylevel[t]:
                delta[v] = sum(
                    (sigma[v] * (1_000_000 + delta[w])) // sigma[w]
                    for w in adj[v]
                    if dist.get(w, 99) == t + 1
                )
        delta[s] = 0
        for v, x in delta.items():
            if x:
                bc[v] += x
    gd = dict(zip(got["host"].to_pylist(), got["bc_micros"].to_pylist()))
    assert gd == dict(bc)
    assert len(gd) > 5  # random graphs have real intermediaries


@pytest.mark.parametrize("seed", [5, 23])
def test_rake_fuzz_vs_naive(seed):
    """Randomized texts (stopword runs, punctuation, digits) against an
    independent pure-Python RAKE built from string ops."""
    from crawler_ai_ray.stages.textstats import rake_keywords_batch

    stops = (
        "the a an and or but of to in on at for with is are was were"
    ).split()
    content = ["data", "engine", "rays", "crawl", "parquet", "shuffle",
               "vector", "hash", "batch", "actor"]
    rng = random.Random(seed)
    texts = []
    for _ in range(40):
        toks = []
        for _ in range(rng.randint(0, 50)):
            r = rng.random()
            if r < 0.35:
                toks.append(rng.choice(stops))
            elif r < 0.45:
                toks.append(rng.choice("!?.,;:0123456789"))
            else:
                toks.append(rng.choice(content))
        texts.append(" ".join(toks))
    batch = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = rake_keywords_batch(batch)
    gd = defaultdict(dict)
    for d, r, p, sc in zip(
        got["doc_id"].to_pylist(),
        got["rank"].to_pylist(),
        got["phrase"].to_pylist(),
        got["score_micros"].to_pylist(),
    ):
        gd[d][p] = (r, sc)

    stopset = set(stops)
    for i, t in enumerate(texts):
        # independent phrase builder: token walk, no regex
        words = re.findall(r"[a-z]+", t.lower())
        # reconstruct delimiter structure: split original on non-alpha
        # AND stopwords
        phrases, cur = [], []
        for tok in re.split(r"[^a-z]+", t.lower()):
            if not tok:
                continue
            # walk tokens; stopwords break phrases
            pass
        # simpler: mark each alnum run; walk runs in order with their
        # separators — any non-letter gap breaks a phrase
        runs = [
            (m.group(0), m.start(), m.end())
            for m in re.finditer(r"[a-z]+", t.lower())
        ]
        cur = []
        prev_end = None
        for w, st, en in runs:
            gap_break = (
                prev_end is not None
                and t.lower()[prev_end:st].strip(" ") != ""
            )
            if gap_break or w in stopset:
                if cur:
                    phrases.append(cur)
                cur = [] if w in stopset else [w]
            else:
                cur.append(w)
            prev_end = en
        if cur:
            phrases.append(cur)
        if not phrases:
            assert i not in gd
            continue
        freq, deg = defaultdict(int), defaultdict(int)
        for ph in phrases:
            for w in ph:
                freq[w] += 1
                deg[w] += len(ph)
        ws = {w: (deg[w] * 1_000_000) // freq[w] for w in freq}
        pscore = {}
        for ph in phrases:
            key = " ".join(ph)
            if key not in pscore:
                pscore[key] = sum(ws[w] for w in ph)
        top = sorted(pscore.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        want = {p: (r + 1, sc) for r, (p, sc) in enumerate(top)}
        assert gd.get(i, {}) == want, (i, t, gd.get(i), want)
