"""Boilerplate-strip kernel for the text branch (jusText/Readability-style).

Generalizes the reference's DOM-pruning heuristic
(experiments/postprocessing_singular_word_treatment.py:5-46 — merge/delete
blocks with too few words) into a link-density + word-count block filter over
pseudo-HTML. Runs batch-at-a-time inside the text-branch pandas UDF.
"""

from __future__ import annotations

import re

from ..config import STRIP_MAX_LINK_DENSITY, STRIP_MIN_WORDS

_A_RE = re.compile(r"<a\b[^>]*>(.*?)</a>", re.S)
_TAG_RE = re.compile(r"<[^>]+>")


def strip_blocks(text: str) -> str | None:
    """Keep content blocks (>= STRIP_MIN_WORDS words, link-density <=
    STRIP_MAX_LINK_DENSITY); return tag-stripped plain text or None (drop)."""
    if text is None:
        return None
    kept = []
    for block in text.split("\n\n"):
        link_chars = sum(len(" ".join(m.split())) for m in _A_RE.findall(block))
        plain = " ".join(_TAG_RE.sub(" ", block).split())
        total = len(plain)
        if total == 0:
            continue
        if len(plain.split()) >= STRIP_MIN_WORDS and link_chars / total <= STRIP_MAX_LINK_DENSITY:
            kept.append(plain)
    return "\n\n".join(kept) if kept else None
