"""Page metadata (M35, routes.py:210-257) and the title/description
fallback cascade (M4, crawler.py:329-384) over parsed
:class:`~crawler_ai_ray.functions.htmltext.PageFacts` — no re-parse.

M35 map semantics follow the reference exactly: ``meta_tags`` is
last-wins per resolved name (``name`` → ``property`` → ``http-equiv``),
``og_tags`` collects ``property^="og:"``, ``twitter_tags`` collects
``name^="twitter:"``; ``structured_data`` counts only
``<script type="application/ld+json">`` bodies that parse as JSON.

M4 cascade: <title> → meta description → class-keyword selectors
(first match per selector in document order, longest text wins) →
longest >100-char <p> → concatenation of the first 5 >50-char <p>s
until >300 chars.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .htmltext import PageFacts, parse_page

__all__ = [
    "page_metadata",
    "extract_title_description",
    "page_meta_batch",
]

# crawler.py:347-352 — selector order matters (longest-text-wins scan)
_P_CLASS_KEYWORDS = ("description", "about", "intro")
_ANCESTOR_CLASSES = ("hero", "banner", "intro", "about")


def page_metadata(facts: PageFacts) -> dict:
    """M35 (routes.py:210-257)."""
    meta_tags: dict[str, str] = {}
    og_tags: dict[str, str] = {}
    twitter_tags: dict[str, str] = {}
    for name, prop, http_equiv, content in facts.meta_all:
        resolved = name or prop or http_equiv
        if resolved and content:
            meta_tags[resolved] = content  # last-wins (routes.py:221)
        if prop.startswith("og:") and content:
            og_tags[prop] = content
        if name.startswith("twitter:") and content:
            twitter_tags[name] = content
    n_structured = 0
    for typ, body in zip(facts.script_types, facts.script_bodies):
        if typ == "application/ld+json":
            try:
                json.loads(body)
                n_structured += 1
            except (ValueError, TypeError):
                pass
    return {
        "meta_tags": meta_tags,
        "og_tags": og_tags,
        "twitter_tags": twitter_tags,
        "n_structured_data": n_structured,
        "title_tag": facts.title or "",
        "head_scripts": facts.n_scripts,
        "head_styles": facts.n_styles,
        "images": facts.n_images,
        "links": facts.n_links,
    }


def _first_p_with_class_kw(facts: PageFacts, kw: str) -> str | None:
    for text, cls in zip(facts.paragraphs, facts.p_classes):
        if kw in cls:
            return text
    return None


def _first_p_under_class(facts: PageFacts, anc: str) -> str | None:
    for text, ancs in zip(facts.paragraphs, facts.p_anc_classes):
        if anc in ancs.split():
            return text
    return None


def extract_title_description(facts: PageFacts) -> tuple[str, str]:
    """M4 (crawler.py:329-384): title + meta-description with the
    selector/paragraph fallback cascade."""
    title = (facts.title or "").strip()
    description = facts.meta_description.strip()

    if not description or len(description) < 50:
        # selector scan: p[class*=kw], div[class*=kw], .anc p — first
        # element per selector, keep the longest text (crawler.py:346-358)
        candidates: list[str | None] = []
        for kw in _P_CLASS_KEYWORDS:
            candidates.append(_first_p_with_class_kw(facts, kw))
        for kw in _P_CLASS_KEYWORDS:
            candidates.append(facts.div_first.get(kw))
        for anc in _ANCESTOR_CLASSES:
            candidates.append(_first_p_under_class(facts, anc))
        for cand in candidates:
            if cand is not None:
                text = cand.strip()
                if len(text) > len(description):
                    description = text

        if not description or len(description) < 50:
            # longest paragraph > 100 chars (crawler.py:361-366)
            for p in facts.paragraphs:
                text = p.strip()
                if len(text) > 100 and len(text) > len(description):
                    description = text
            if len(description) < 200:
                # concat first 5 paragraphs > 50 chars until > 300
                # (crawler.py:369-383)
                combined = ""
                for p in facts.paragraphs[:5]:
                    text = p.strip()
                    if len(text) > 50:
                        combined = f"{combined} {text}" if combined else text
                        if len(combined) > 300:
                            break
                if len(combined) > len(description):
                    description = combined
    return title, description


def page_meta_batch(batch: pa.Table) -> pa.Table:
    """pages → flattened M35 + M4 columns.  Input: url, html."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    cols: dict[str, list] = {
        k: []
        for k in (
            "n_meta_tags", "n_og_tags", "n_twitter_tags",
            "n_structured_data", "title_tag", "head_scripts", "head_styles",
            "images", "links", "og_title", "og_description", "twitter_card",
            "m4_title", "m4_description",
        )
    }
    for u, h in zip(urls, htmls):
        html = h.decode("utf-8", errors="ignore") if isinstance(
            h, (bytes, bytearray)
        ) else (h or "")
        facts = parse_page(html)
        md = page_metadata(facts)
        title, desc = extract_title_description(facts)
        cols["n_meta_tags"].append(len(md["meta_tags"]))
        cols["n_og_tags"].append(len(md["og_tags"]))
        cols["n_twitter_tags"].append(len(md["twitter_tags"]))
        cols["n_structured_data"].append(md["n_structured_data"])
        cols["title_tag"].append(md["title_tag"])
        cols["head_scripts"].append(md["head_scripts"])
        cols["head_styles"].append(md["head_styles"])
        cols["images"].append(md["images"])
        cols["links"].append(md["links"])
        cols["og_title"].append(md["og_tags"].get("og:title", ""))
        cols["og_description"].append(md["og_tags"].get("og:description", ""))
        cols["twitter_card"].append(
            md["twitter_tags"].get("twitter:card", "")
        )
        cols["m4_title"].append(title)
        cols["m4_description"].append(desc)
    out = pa.table({"url": pa.array(urls, pa.string())})
    for name, vals in cols.items():
        typ = (
            pa.int32()
            if name.startswith(("n_", "head_")) or name in ("images", "links")
            else pa.string()
        )
        out = out.append_column(name, pa.array(vals, typ))
    return out
