"""RE2 twins of the backtracking reference regexes must be count-identical.

The reference's embedded-job patterns (job_extraction_service.py:752-758)
backtrack quadratically on long alpha/space runs; the engine runs RE2 twins
via pyarrow.compute (linear time).  These tests pin the two engine gaps the
twins close:

* Python str ``\\s`` accepts 29 codepoints, RE2 ``\\s`` only ASCII — the
  twin spells out Python's whitespace set (``PYWS_RE2_CLASS``);
* Python IGNORECASE folds dotted/dotless i (U+0130/U+0131) where RE2 does
  not — those rows fall back to the Python engine (``RE2_FALLBACK_CLASS``).
"""

import random
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from crawler_ai_ray.functions.page_structure import (
    PYWS_RE2_CLASS,
    RE2_FALLBACK_CLASS,
    _EMBEDDED_JOB_RXS,
    embedded_job_count,
    embedded_job_counts_vec,
)

# every codepoint where Python-str \s and RE2 \s were found to differ in the
# full-range enumeration, plus the fold-gap pair and the fold-agree pair
_SPECIAL = (
    [0x9, 0xA, 0xB, 0xC, 0xD, 0x1C, 0x1D, 0x1E, 0x1F, 0x20, 0x85, 0xA0]
    + [0x1680]
    + list(range(0x2000, 0x200B))
    + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
    + [0x130, 0x131, 0x17F, 0x212A]
)


def test_pyws_class_matches_python_whitespace_exactly():
    """RE2 twin whitespace class ≡ Python str \\s on special + sampled
    codepoints (the full 1.1M-codepoint enumeration was run once during
    development; this pins the boundary cases and a random sample)."""
    rng = random.Random(0x5EED)
    cps = set(_SPECIAL) | set(range(0x00, 0x300))
    cps |= {rng.randrange(0x110000) for _ in range(3000)}
    cps = sorted(c for c in cps if not (0xD800 <= c <= 0xDFFF))
    chars = [chr(c) for c in cps]
    re2_hits = pc.match_substring_regex(
        pa.array(chars), f"^[{PYWS_RE2_CLASS}]$"
    ).to_pylist()
    py_rx = re.compile(r"\s")
    for c, hit in zip(chars, re2_hits):
        assert bool(py_rx.fullmatch(c)) == bool(hit), hex(ord(c))


def test_fallback_class_covers_fold_gap():
    """U+0130/U+0131 are inside Python's IGNORECASE fold of [a-zA-Z] and
    literal i but outside RE2's — and they are the gate's exact trigger."""
    for c in ("İ", "ı"):
        assert re.fullmatch(r"[a-zA-Z\s]", c, re.I | re.S)
        assert not pc.match_substring_regex(
            pa.array([c]), r"(?is)^[a-zA-Z\s]$"
        )[0].as_py()
        assert pc.match_substring_regex(
            pa.array([c]), RE2_FALLBACK_CLASS
        )[0].as_py()
    # ſ / K fold the same way in BOTH engines — no gate needed
    for c in ("ſ", "K"):
        both = (
            bool(re.fullmatch(r"[a-zA-Z]", c, re.I)),
            pc.match_substring_regex(pa.array([c]), r"(?i)^[a-zA-Z]$")[
                0
            ].as_py(),
        )
        assert both[0] == both[1], (hex(ord(c)), both)


@pytest.mark.parametrize("seed", [7, 99])
def test_vec_counts_match_python_engine_on_adversarial_fuzz(seed):
    rng = random.Random(seed)
    hazard = [chr(c) for c in _SPECIAL]
    alphabet = (
        list("AaBZz .\nxDeveloper")
        + [
            "Apply", "View", "Details", "Engineer", "Manager", "Remote",
            "See Details", "Fulltime", "Part-time", "Singapore",
            "Fully Remote", "Designer", "Only",
        ]
        + hazard
    )
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 250)))
        for _ in range(1200)
    ]
    texts += ["", None, "İ Developer Apply", "ı Engineer Remote"]
    vec = embedded_job_counts_vec(texts)
    ref = np.array([embedded_job_count(t or "") for t in texts])
    assert (vec == ref).all()
    assert ref.sum() > 0  # the grid actually exercises the patterns


def test_vec_counts_match_on_synthetic_corpus_pages(unit_corpus):
    import os

    import pyarrow.parquet as pq

    from crawler_ai_ray.functions.htmltext import parse_page

    pages = pq.read_table(
        os.path.join(unit_corpus, "pages.parquet"), columns=["html"]
    )
    texts = []
    for h in pages["html"].to_pylist()[:150]:
        html = (
            h.decode("utf-8", errors="ignore")
            if isinstance(h, (bytes, bytearray))
            else (h or "")
        )
        texts.append("".join(parse_page(html).all_pieces))
    vec = embedded_job_counts_vec(texts)
    ref = np.array([embedded_job_count(t) for t in texts])
    assert (vec == ref).all()
    assert ref.sum() > 0


@pytest.mark.parametrize("seed", [3, 41])
def test_card_p23_linear_sim_matches_finditer_fuzz(seed):
    """The linear simulation of card pattern 23 ((first letter, rightmost
    alt-start) per '-'/'\\n'-free segment) ≡ the backtracking engine —
    including overlap traps ('AnalysTest' hides a 'Test' start inside an
    'Analyst' occurrence that finditer's non-overlap scan skips but the
    greedy star can still reach) and fold-gap codepoints."""
    from crawler_ai_ray.functions.jobs import (
        _CARD_PATTERNS,
        _P23_IDX,
        _p23_matches,
    )

    rx = _CARD_PATTERNS[_P23_IDX]
    rng = random.Random(seed)
    alpha = list("Aa Zz-\n.xy") + [
        "Developer", "Engineer", "Test", "Intern", "AnalysTest",
        "analystest", "ManagerIntern", "İ", "ı", "ſ", "K", " ",
    ]
    n_matches = 0
    for _ in range(2500):
        s = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 80)))
        ref = [m.group(0) for m in rx.finditer(s)]
        n_matches += len(ref)
        assert ref == _p23_matches(s), repr(s)
    assert n_matches > 1000


def test_cards_fast_path_equals_reference_cascade(unit_corpus):
    """extract_jobs_from_cards(fast=True) ≡ fast=False on every career
    page of the unit corpus and on targeted constructions."""
    import os

    import pyarrow.parquet as pq

    from crawler_ai_ray.functions import classify
    from crawler_ai_ray.functions.htmltext import parse_page
    from crawler_ai_ray.functions.jobs import extract_jobs_from_cards

    pages = pq.read_table(
        os.path.join(unit_corpus, "pages.parquet"), columns=["url", "html"]
    )
    n_career = n_jobs = 0
    for u, h in zip(
        pages["url"].to_pylist(), pages["html"].to_pylist()
    ):
        html = (
            h.decode("utf-8", errors="ignore")
            if isinstance(h, (bytes, bytearray))
            else (h or "")
        )
        if not classify.is_career_listing_page(u, html):
            continue
        n_career += 1
        text = "".join(parse_page(html).text_pieces)
        ref = extract_jobs_from_cards(text, fast=False)
        assert extract_jobs_from_cards(text, fast=True) == ref
        n_jobs += len(ref)
    assert n_career > 5 and n_jobs > 0
    for s in (
        "Java Developer Apply now Singapore Only See Details",
        "İ Senior Engineer Remote Apply",
        "AnalysTest engineer\nBD Manager - foo",
        "",
    ):
        assert extract_jobs_from_cards(s, fast=True) == (
            extract_jobs_from_cards(s, fast=False)
        )


def test_patterns_did_not_drift():
    """The RE2 twins derive from the same pattern strings the Python
    engine compiles — a drift in one side breaks count identity."""
    from crawler_ai_ray.functions.page_structure import (
        _EMBEDDED_JOB_PATTERNS,
        _EMBEDDED_JOB_RE2,
    )

    assert [rx.pattern for rx in _EMBEDDED_JOB_RXS] == _EMBEDDED_JOB_PATTERNS
    assert len(_EMBEDDED_JOB_RE2) == len(_EMBEDDED_JOB_PATTERNS)
    for twin, src in zip(_EMBEDDED_JOB_RE2, _EMBEDDED_JOB_PATTERNS):
        assert twin == "(?is)" + src.replace(r"\s", PYWS_RE2_CLASS)
