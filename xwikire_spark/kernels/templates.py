"""Question-template filling (pure string rules, vectorizable).

Reference: src/utils/template_fillers.py. Templates contain the placeholders
``XXX`` (entity), ``YYY`` (definite article) and ``GGG`` (gender vowel); each
language applies morphology rules before substitution:

- it: preposition+article contraction ("di"+"il" -> "del", "digli" ->
  "degli", ...), gender from article, apostrophe squeeze
  (src/utils/template_fillers.py:10-61);
- fr: elision "de XXX" -> "d'XXX" before vowel-initial entities (src:64-74);
- de: article dropped when already leading the entity; sentence-case
  (src:77-89);
- es: "deYYY" with "el" contracts to "del"; gender suffix (src:92-116);
- en/default: plain XXX substitution (src:5-7).

Golden values from src/test/test_template_fillers.py are enforced in
tests/test_templates.py.
"""

from __future__ import annotations

import re

_IT_CONTRACTIONS = {
    "diil": "del", "dilo": "dello", "dila": "della", "dii": "dei",
    "digli": "degli", "dile": "delle", "dil": "dell'",
    "ail": "al", "alo": "allo", "ala": "alla", "ai": "ai", "agli": "agli",
    "ale": "alle",
    "dail": "dal", "dalo": "dallo", "dala": "dalla", "dai": "dai",
    "dagli": "dagli", "dale": "dalle",
    "inil": "nel", "inlo": "nello", "inla": "nella", "ini": "nei",
    "ingli": "negli", "inle": "nelle",
    "conil": "col", "conlo": "cóllo", "conla": "cólla", "coni": "coi",
    "congli": "cogli", "conle": "cólle",
    "suil": "sul", "sulo": "sullo", "sula": "sulla", "sui": "sui",
    "sugli": "sugli", "sule": "sulle",
    "peril": "pel", "perlo": "pello", "perla": "pella", "peri": "pei",
    "pergli": "pegli", "perle": "pelle",
}
_IT_FINDER = re.compile(
    "(?P<p>" + "|".join(r"\b" + p + r"\b" for p in _IT_CONTRACTIONS) + ")",
    re.IGNORECASE,
)
_IT_GENDER = {"il": "o", "lo": "o", "i": "i", "gli": "i", "la": "a", "le": "e"}
_ES_GENDER = {"el": "o", "la": "a", "los": "es", "las": "as"}
_FR_VOWELS = set("aeiouâêîôûëïüyÿàèùé")


def _squeeze(s: str) -> str:
    return re.sub(r"\s{2,}", " ", s)


def _fill_en(template: str, entity: str, article: str) -> str:
    return template.replace("XXX", entity)


def _fill_it(template: str, entity: str, article: str) -> str:
    article = article.lower()
    article_in_entity = entity.lower().startswith(article) if article else False
    if article:
        if article_in_entity and re.search("(di|a|da|in|con|su|per)YYY", template):
            entity = re.sub(r"\b" + article + r"\b", "", entity, 1, re.IGNORECASE)
            template = template.replace("YYY", article)
        elif article_in_entity:
            template = template.replace("YYY", "")
        else:
            template = template.replace("YYY", article)
        m = _IT_FINDER.search(template)
        if m:
            p = m.group("p").lower().strip()
            template = template.replace(p, _IT_CONTRACTIONS[p])
    else:
        template = template.replace("YYY", "")
    template = template.replace("GGG", _IT_GENDER.get(article, "o"))
    template = template.replace("XXX", entity)
    if "' " + entity in template:
        template = template.replace("' ", "'")
    return _squeeze(template)


def _fill_fr(template: str, entity: str, article: str) -> str:
    if entity and re.search(r"de\sXXX", template) and entity[0].lower() in _FR_VOWELS:
        template = re.sub(r"de\sXXX", "d'XXX", template)
    return _squeeze(template.replace("XXX", entity)).strip()


def _fill_de(template: str, entity: str, article: str) -> str:
    article = article.lower()
    if entity.lower().startswith(article) if article else False:
        article = ""
    template = re.sub("YYY", article, template)
    template = template.replace("XXX", entity)
    template = _squeeze(template).strip()
    return (template[0].upper() + template[1:]).strip() if template else template


def _fill_es(template: str, entity: str, article: str) -> str:
    article = article.lower()
    article_in_entity = entity.lower().startswith(article) if article else False
    skip = article_in_entity and not re.search("(de)YYY", template)
    if article and not skip:
        if article == "el" and re.search("(de)YYY", template):
            template = template.replace("deYYY", "del")
        else:
            template = template.replace("YYY", " " + article)
    else:
        template = template.replace("YYY", "")
    template = template.replace("GGG", _ES_GENDER.get(article, "o"))
    template = template.replace("XXX", entity)
    return _squeeze(template)


_FILLERS = {"it": _fill_it, "fr": _fill_fr, "de": _fill_de, "es": _fill_es}


def fill_template(template: str, entity: str, lang: str = "en",
                  article: str = "") -> str:
    """Fill a question template for ``lang``
    (factory at src/utils/template_fillers.py:119-133)."""
    return _FILLERS.get(lang, _fill_en)(template, entity, article)
