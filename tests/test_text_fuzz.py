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
