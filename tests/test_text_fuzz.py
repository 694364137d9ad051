"""Property fuzz for the byte-identical invariant (input_hint): the
engine's streaming extractor must equal the independent tree-building
oracle byte-for-byte on arbitrary messy HTML — malformed nesting,
entities, NBSP/zero-width whitespace, decomposed-tag boundaries."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from crawler_ai_ray.functions.htmltext import (
    extract_text_crawldata,
    extract_text_jobdetail,
)
from crawler_ai_ray.oracle.extract_oracle import (
    oracle_text_crawldata,
    oracle_text_jobdetail,
)

_TAGS = [
    "div", "p", "span", "h1", "h2", "li", "table", "tr", "td", "a",
    "strong", "em", "section", "article", "main", "button",
    # decomposed by the jobdetail path:
    "script", "style", "nav", "header", "footer", "aside", "noscript",
]

_TEXT_BITS = st.sampled_from(
    [
        "hello", "Việc làm", "a  b", " nbsp ", "​zw",
        "x&amp;y", "&lt;tag&gt;", "5 > 3", "tab\there", "line\nbreak",
        " lead", "trail ", "&#65;", "…", "", "Ứng tuyển ngay",
    ]
)


@st.composite
def _html(draw, depth=0):
    n = draw(st.integers(0, 4 if depth < 3 else 0))
    parts = [draw(_TEXT_BITS)]
    for _ in range(n):
        if depth < 3 and draw(st.booleans()):
            tag = draw(st.sampled_from(_TAGS))
            attrs = draw(
                st.sampled_from(
                    ["", ' class="x y"', ' style="display:none"',
                     ' href="/a"', ' id="main"']
                )
            )
            inner = draw(_html(depth=depth + 1))
            closed = draw(st.booleans())
            parts.append(
                f"<{tag}{attrs}>{inner}" + (f"</{tag}>" if closed else "")
            )
        else:
            parts.append(draw(_TEXT_BITS))
    return "".join(parts)


@settings(max_examples=300, deadline=None)
@given(_html())
def test_jobdetail_text_byte_identical(html):
    assert extract_text_jobdetail(html) == oracle_text_jobdetail(html)


@settings(max_examples=300, deadline=None)
@given(_html())
def test_crawldata_text_byte_identical(html):
    assert extract_text_crawldata(html) == oracle_text_crawldata(html)


def test_zipf_fit_exact_law_and_edges(ray_session):
    """zipf_fit recovers slope ≈ −1e6 (micros) on a synthetic corpus
    whose term frequencies follow 600/r exactly, and the degenerate
    one-term corpus returns the documented edge row."""
    import math

    import pyarrow as pa
    import ray.data

    from crawler_ai_ray.stages.textstats import zipf_fit

    # tokenization is [a-z]+ — term names must be purely alphabetic
    terms = [
        "".join(chr(ord("a") + (i // 26)) + chr(ord("a") + (i % 26)))
        for i in range(20)
    ]
    words = []
    for r, t in enumerate(terms, start=1):
        words.extend([t] * (600 // r))
    # split the stream across several docs/blocks
    docs = [" ".join(words[i::7]) for i in range(7)]
    tbl = pa.table({"text": pa.array(docs, pa.string())})
    out = zipf_fit(ray.data.from_arrow(tbl).repartition(3), k=100)
    assert out["n_terms"].to_pylist() == [20]
    slope = out["slope_micro"].to_pylist()[0]
    assert -1_050_000 < slope < -950_000  # ≈ −1 in micros
    icpt = out["intercept_micro"].to_pylist()[0]
    assert abs(icpt - math.floor(math.log(600) * 1e6 + 0.5)) < 60_000
    one = zipf_fit(
        ray.data.from_arrow(
            pa.table({"text": pa.array(["solo solo solo"], pa.string())})
        ),
        k=100,
    )
    assert one["n_terms"].to_pylist() == [1]
    assert one["slope_micro"].to_pylist() == [0]
