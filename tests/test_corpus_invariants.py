"""Corpus-level invariants the oracle conventions depend on.

The SQL oracles tokenize with RE2 ``\\S+`` (whitespace = ``[\\t\\n\\f\\r ]``
only) while the Python sides use ``str.split()`` (full Unicode whitespace).
The two conventions agree exactly iff the corpus contains no character that
is Python-whitespace but not RE2-whitespace (U+00A0, U+2028, U+3000, ``\\v``,
``\\x1c``–``\\x1f``, U+0085, …).  This test pins that invariant for every
text column the oracles read — see the convention note at
``stages/dedup.py::_doc_ngrams``.  A corpus change that introduces such a
character must bump ``CORPUS_VERSION`` and normalize the tokenizers.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

# Characters where Python str.split() and RE2 \S+ disagree: Python
# whitespace minus RE2's [\t\n\f\r ].
_RE2_WS = set("\t\n\f\r ")
_DIVERGENT = {
    chr(cp)
    for cp in range(sys.maxunicode + 1)
    if chr(cp).isspace() and chr(cp) not in _RE2_WS
}
# str.split() also splits on these non-isspace() control chars? No —
# str.split() uses str.isspace(); \x1c-\x1f ARE isspace() in Python.
assert "\x1c" in _DIVERGENT and "\x0b" in _DIVERGENT


def _scan_strings(path: str, columns: list[str]) -> int:
    """Return the number of divergent-whitespace characters found."""
    tbl = pq.read_table(path, columns=columns)
    bad = 0
    for col in columns:
        for chunk in tbl[col].chunks:
            for v in chunk.to_pylist():
                if v and any(c in _DIVERGENT for c in v):
                    bad += 1
    return bad


def test_no_divergent_whitespace_testdata():
    sf_dir = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")
    docs = os.path.join(sf_dir, "documents.parquet")
    assert _scan_strings(docs, ["text"]) == 0


def test_no_divergent_whitespace_synth(unit_corpus):
    # html is the raw page source every extracted-text golden derives from
    import pyarrow as pa

    pages = os.path.join(unit_corpus, "pages.parquet")
    schema = pq.read_schema(pages)
    str_cols = [f.name for f in schema if pa.types.is_string(f.type)]
    assert _scan_strings(pages, str_cols) == 0


def test_warc_ts_whole_seconds():
    """The WARC writer serializes WARC-Date at second resolution
    (constant-length ISO) and read_warc reconstructs ts_ms as
    seconds·1000, so the archive round-trip preserves warc_ts exactly
    only while every corpus timestamp is a whole second.  Pin it like
    the whitespace convention: a synth change to sub-second warc_ts
    must bump CORPUS_VERSION and extend the WARC-Date format."""
    import pyarrow.compute as pc

    from crawler_ai_ray.sources.synth import ensure_corpus

    pages = os.path.join(ensure_corpus("unit"), "pages.parquet")
    ts = pq.read_table(pages, columns=["warc_ts"])["warc_ts"]
    import numpy as np

    ms = pc.cast(pc.cast(ts, "timestamp[ms]"), "int64").to_numpy()
    assert int(np.max(ms % 1000)) == 0
