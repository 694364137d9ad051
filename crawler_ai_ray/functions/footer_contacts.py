"""Footer-priority contact extraction — the reference's
`_extract_footer_contact_info` path (contact_extractor_service.py:
174-235, 237-257) + the priority merge (:259-266) + the footer utility
semantics (utils/contact_footer.py:9-44).

Footer phones take precedence over page-wide ones: tel: anchors inside
the footer first, then VN-pattern matches over the footer's visible
text, then footer emails; the merge puts footer values at the FRONT of
the page-wide lists.

Engine determinism deviation: footer emails are returned sorted (the
reference's ``list(set(...))`` order is process-dependent,
contact_extractor_service.py:235).
"""

from __future__ import annotations

import re

import pyarrow as pa

from .contacts import clean_phone, normalize_text, _VN_PHONE_RX
from .minidom import Node, build_tree

__all__ = [
    "pick_footer_node",
    "phones_from_text",
    "footer_contact_info",
    "merge_contact_priority",
    "footer_contacts_batch",
]

_EMAIL_RX = re.compile(
    r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", re.IGNORECASE
)

# contact_extractor_service.py:247 selector union, first match in
# document order
_FOOTER_CLASSES = ("footer", "site-footer", "main-footer", "bottom-footer")


def pick_footer_node(root: Node) -> Node:
    """:246-257 — semantic footer, else id/class containing 'footer',
    else the last footer/section/div block, else the document."""
    for el in root.iter_elements():
        if el.tag == "footer" or el.attrs.get("role") == "contentinfo":
            return el
        if el.attrs.get("id") == "footer":
            return el
        if any(c in el.class_tokens() for c in _FOOTER_CLASSES):
            return el
    for el in root.iter_elements():
        ident = (el.attrs.get("id") or "") + " " + (
            el.attrs.get("class") or ""
        )
        if "footer" in ident.lower():
            return el
    blocks = [
        el
        for el in root.iter_elements()
        if el.tag in ("footer", "section", "div")
    ]
    return blocks[-1] if blocks else root


def phones_from_text(text: str) -> list[str]:
    """_extract_phones_from_text (:237-244): VN pattern over normalized
    text, cleaned, order-preserving dedup (NO final length sort — that
    belongs to the page-wide M3 variant)."""
    norm = normalize_text(text or "")
    out: list[str] = []
    for m in _VN_PHONE_RX.finditer(norm):
        n = clean_phone(m.group(0))
        if n and n not in out:
            out.append(n)
    return out


def footer_contact_info(html: str) -> dict:
    """_extract_footer_contact_info (:174-235): tel: anchors first, then
    footer-text phones (order-preserving union), plus footer emails."""
    root = build_tree(html or "")
    footer = pick_footer_node(root)
    tel_phones: list[str] = []
    for el in footer.iter_elements():
        if el.tag == "a":
            href = el.attrs.get("href") or ""
            if href.startswith("tel:"):
                n = clean_phone(href[4:])
                if n and n not in tel_phones:
                    tel_phones.append(n)
    # reference reads the footer as get_text(" ", strip=True)
    # (contact_extractor_service.py:216) — the space separator keeps
    # digits in adjacent elements from concatenating into false phones
    text_phones = phones_from_text(footer.get_text(" ", strip=True))
    phones = list(dict.fromkeys(tel_phones + text_phones))
    # NOTE: the reference's `_extract_emails_from_footer` is passed the
    # FULL page html despite its name (:200, :226-235) — reproduced;
    # sorted for determinism (reference: list(set(...)))
    emails = sorted(set(_EMAIL_RX.findall(html or "")))
    return {"phones": phones, "emails": emails}


def merge_contact_priority(priority: dict, fallback: dict) -> dict:
    """_merge_contact_data_with_priority (:259-266): fallback lists
    deduped, then priority values pushed to the FRONT."""
    keys = ("emails", "phones", "social_links", "contact_forms")
    out = {k: list(dict.fromkeys(fallback.get(k, []))) for k in keys}
    for k in keys:
        for v in priority.get(k, []):
            if v not in out[k]:
                out[k].insert(0, v)
    return out


def footer_contacts_batch(batch: pa.Table) -> pa.Table:
    """pages → footer-priority contact rows.  Input: url, html."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    cols = {"phones": [], "emails": []}
    for h in htmls:
        html = h.decode("utf-8", errors="ignore") if isinstance(
            h, (bytes, bytearray)
        ) else (h or "")
        info = footer_contact_info(html)
        cols["phones"].append("|".join(info["phones"]))
        cols["emails"].append("|".join(info["emails"]))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "footer_phones": pa.array(cols["phones"], pa.string()),
            "footer_emails": pa.array(cols["emails"], pa.string()),
        }
    )
