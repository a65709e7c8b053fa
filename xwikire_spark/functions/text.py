"""JVM-side text-cleaning column expressions.

Reference: MergedWikisBuilder._clean_text (src/builders/MergedWikis.py:182-189)
performed per-document in Python; here each step is a Catalyst expression so
the whole chain stays inside WholeStageCodegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Per-language stop sections (src/builders/MergedWikis.py:11-19).
STOP_SECTIONS = {
    "en": ["See also", "Notes", "Further reading", "External links"],
    "fr": ["Notes et références", "Bibliographie", "Voir aussi", "Annexes",
           "Références"],
    "it": ["Note", "Bibliografia", "Voci correlate", "Altri progetti",
           "Collegamenti esterni"],
    "de": ["Literatur", "Siehe auch", "Weblinks", "Anmerkungen",
           "Einzelnachweise und Anmerkungen", "Referenzen"],
    "es": ["Véase también", "Notas", "Referencias", "Bibliografía",
           "Enlaces externos", "Notas y referencias"],
}


def truncate_at_stop_section(text: Column, lang: str = "en") -> Column:
    """Cut the article at the first '== See also =='-style heading
    (src/builders/MergedWikis.py:31,182-185). Implemented as an anchored
    DOTALL regexp_replace so the scan stays codegen'd."""
    sections = STOP_SECTIONS.get(lang, [])
    if not sections:
        return text
    alternation = "|".join(sections)
    # (?s) lets .* span newlines; trailing whitespace before the heading is
    # stripped like the reference's .strip() on the truncated prefix.
    pattern = r"(?s)\s*===?\s(" + alternation + r")\s===?.*$"
    return F.regexp_replace(text, pattern, "")


def strip_headings(text: Column) -> Column:
    """Remove '== Heading ==' lines (src/builders/MergedWikis.py:186)."""
    return F.regexp_replace(text, r"===?\s[^=]+\s===?\n?", "")


def strip_citations(text: Column) -> Column:
    """Remove '[12]' citation markers (src/builders/MergedWikis.py:187)."""
    return F.regexp_replace(text, r"\[\d+\]", "")


def collapse_blank_lines(text: Column) -> Column:
    """Collapse 3+ newlines to a blank line (src/builders/MergedWikis.py:188)."""
    return F.regexp_replace(text, r"\n{3,}", "\n\n")


def clean_text(text: Column, lang: str = "en") -> Column:
    """Full cleaning chain (src/builders/MergedWikis.py:182-189)."""
    return collapse_blank_lines(
        strip_citations(strip_headings(truncate_at_stop_section(text, lang)))
    )


def render_quantity(amount: Column, unit_label: Column) -> Column:
    """'+123' + unit label -> '123 <unit>' (src/builders/MergedWikis.py:168-175)."""
    return F.trim(
        F.concat_ws(" ", F.regexp_replace(amount, r"^\+", ""), unit_label)
    )


def unit_id_from_uri(unit_uri: Column) -> Column:
    """Last path segment of the unit URI (src/builders/MergedWikis.py:66,136)."""
    return F.element_at(F.split(unit_uri, "/"), -1)


def answer_char_span(
    context_col: str, answer_col: str
) -> tuple[Column, Column]:
    """(start_index, end_index) char span of answer inside context — the
    ``context.index(answer)`` computation at src/builders/QA.py:149-153.
    start is -1 when the answer is absent (the reference skips those rows;
    callers filter ``start != -1``). Takes column *names* because Spark's
    ``locate`` wants the needle first and both sides are columns here."""
    start = F.expr(f"locate({answer_col}, {context_col}) - 1")
    end = start + F.length(F.col(answer_col))
    return start, F.when(start >= 0, end).otherwise(F.lit(-1))
