"""User-friendly formatter pinned against the reference
(``user_friendly_formatter.py``): pinned fixtures always run; the
differential layer EXECUTES the reference's own method bodies
(AST-lifted, ``self`` replaced by a tiny analyzer stub) over input
sweeps and asserts exact agreement.
"""

from __future__ import annotations

import ast
import os
import textwrap

import pytest

from crawler_ai_ray.functions.user_friendly import (
    friendly_benefits,
    friendly_level,
    friendly_technologies,
    is_remote,
    match_percentage,
    quality_stars,
    recommendation,
    urgency_level,
)

REF = "/root/reference/app/services/user_friendly_formatter.py"

DESCS = [
    "",
    "We use Python and Django on AWS. Benefits: health insurance, bonus, "
    "flexible hours and stock options plus equity and learning budget.",
    "react node.js kubernetes docker mysql postgresql redis mongodb "
    "elasticsearch competitive salary remote work",
    "Chỉ cần biết php laravel; có relocation và professional development.",
]
LOCATIONS = ["", "Hanoi", "Remote", "Work From Home ok", "HCM / hybrid",
             "100% ONLINE", "anywhere on earth", "Da Nang"]
POSTED = ["", "today", "1 day ago", "2 days ago", "3 days ago",
          "5 days ago", "7 days ago", "10 days ago", "14 days ago",
          "30 days ago", "posted 4  days ago", "yesterday"]
SCORES = [0.0, 0.45, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95, 1.0]


class TestPinned:
    def test_stars_and_match(self):
        assert quality_stars(0.95) == "⭐⭐⭐⭐⭐"
        assert quality_stars(0.8) == "⭐⭐⭐⭐"
        assert quality_stars(0.59) == "⭐"
        assert match_percentage(0.87) == "86%" or match_percentage(0.87) == "87%"
        # int() truncates the float product — pin exact behavior
        assert match_percentage(0.87) == f"{int(0.87 * 100)}%"

    def test_technologies_display_and_cap(self):
        # sorted-match order (engine determinism deviation), then cap 5
        t = friendly_technologies(DESCS[2])
        assert t == ["Docker", "Elasticsearch", "Kubernetes", "Mongodb",
                     "Mysql"]
        assert friendly_technologies("react and node.js please") == [
            "Node.js", "React",
        ]
        # excluded short tokens never surface
        assert friendly_technologies("we use r and js and ts only") == []

    def test_urgency_buckets(self):
        assert urgency_level("1 day ago") == "🔥 Very Urgent"
        assert urgency_level("3 days ago") == "⚡ Urgent"
        assert urgency_level("7 days ago") == "📅 Recent"
        assert urgency_level("14 days ago") == "📆 Moderate"
        assert urgency_level("15 days ago") == "⏰ Old"
        assert urgency_level("yesterday") == "Unknown"
        assert urgency_level("") == "Unknown"

    def test_benefits_order_and_cap(self):
        b = friendly_benefits(DESCS[1])
        # keyword-list order, title-cased, top 3
        assert b == ["Health Insurance", "Flexible Hours", "Stock Options"]


@pytest.mark.skipif(not os.path.exists(REF), reason="reference absent")
class TestReferenceDifferential:
    @classmethod
    def setup_class(cls):
        with open(REF) as f:
            cls.src = f.read()
        cls.tree = ast.parse(cls.src)
        cls.methods = {
            n.name: n
            for n in ast.walk(cls.tree)
            if isinstance(n, ast.FunctionDef)
        }

    def _lift(self, name: str, self_obj=None):
        node = self.methods[name]
        src = textwrap.dedent(ast.get_source_segment(self.src, node))
        ns: dict = {"List": list, "Dict": dict, "Optional": None}
        exec(compile(src, REF, "exec"), ns)  # noqa: S102
        fn = ns[name]
        return (lambda *a: fn(self_obj, *a))

    def test_level_mapping(self):
        ref = self._lift("_get_user_friendly_level")
        for lvl in ["JUNIOR", "MIDDLE", "SENIOR", "LEAD", "PRINCIPAL",
                    "MANAGER", "EXECUTIVE", "UNKNOWN", "WEIRD"]:
            assert friendly_level(lvl) == ref(lvl), lvl

    def test_is_remote(self):
        ref = self._lift("_is_remote")
        for loc in LOCATIONS:
            assert is_remote(loc) == ref(loc), loc

    def test_quality_stars(self):
        ref = self._lift("_get_quality_stars")
        for s in SCORES:
            assert quality_stars(s) == ref(s), s

    def test_urgency(self):
        ref = self._lift("_get_urgency_level")
        for p in POSTED:
            assert urgency_level(p) == ref(p), p

    def test_benefits(self):
        ref = self._lift("_extract_benefits")
        for d in DESCS:
            assert friendly_benefits(d) == ref(d), d

    def test_technologies(self):
        """Lift _extract_user_friendly_technologies with an analyzer
        stub whose extract_technologies is the engine's SORTED variant
        (the reference's own set-order is process-dependent — the
        documented determinism deviation)."""
        from crawler_ai_ray.functions.job_quality import (
            extract_technologies,
        )

        class _Stub:
            analyzer = type(
                "A", (), {"extract_technologies": staticmethod(
                    extract_technologies)},
            )()

        ref = self._lift(
            "_extract_user_friendly_technologies", self_obj=_Stub()
        )
        for d in DESCS:
            assert friendly_technologies(d) == ref(d), d

    def test_recommendation(self):
        ref_node = self.methods["_generate_recommendation"]
        src = textwrap.dedent(
            ast.get_source_segment(self.src, ref_node)
        )
        ns: dict = {"Dict": dict}
        exec(compile(src, REF, "exec"), ns)  # noqa: S102
        fn = ns["_generate_recommendation"]
        for o in SCORES:
            for c in [0.3, 0.5, 0.9]:
                for f in [0.5, 0.8, 1.0]:
                    analysis = {
                        "quality_scores": {
                            "overall": o, "completeness": c, "freshness": f,
                        }
                    }
                    assert recommendation(o, c, f) == fn(None, analysis), (
                        o, c, f,
                    )
