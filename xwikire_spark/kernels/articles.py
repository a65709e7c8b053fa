"""Leading-definite-article extraction (pure regex rules).

Reference: src/utils/article_extractors.py. Two-step lookup: (1) the entity
label itself starts with an article; (2) otherwise search the article text
for "<article> <first-entity-word>" (case-insensitive). German restricts the
text search to the first line (src:55-57); en and others return ''.
"""

from __future__ import annotations

import re

_ARTICLES = {
    "it": (["Il", "Lo", "La", "I", "Gli", "Le", "L"], r"(\s?|'){}"),
    "fr": (["Le", "La", "L", "Les"], r"(\s?|'){}"),
    "de": (["Der", "Die", "Das", "Ein", "Eine"], r"(\s){}"),
    "es": (["El", "La", "Los", "Las"], r"(\s){}"),
}


def extract_article(text: str, entity: str, lang: str = "en") -> str:
    """Return the definite article for ``entity``, or ''
    (src/utils/article_extractors.py:10-24)."""
    if lang not in _ARTICLES or not entity:
        return ""
    articles, tail = _ARTICLES[lang]
    if lang == "de":
        text = text.split("\n")[0]
    alternation = "(?P<article>" + "|".join(
        r"\b" + a + r"\b" for a in articles) + ")"

    m = re.search("^" + alternation + tail.format(""), entity, re.IGNORECASE)
    if m:
        return m.group("article")

    first_word = entity.split()[0] if entity.split() else entity
    m = re.search(alternation + tail.format(re.escape(first_word)), text,
                  re.IGNORECASE)
    if m:
        return m.group("article")
    return ""
