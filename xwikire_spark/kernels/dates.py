"""Wikidata time rendering as a pure lookup-table kernel.

Reference: src/utils/date_formatter.py:85-225. The reference calls
``locale.setlocale(locale.LC_TIME, ...)`` (src/utils/date_formatter.py:96-97),
which is process-global and unusable inside executor threads; month names are
therefore inlined as tables here. Semantics preserved:

- input is Wikidata time ``±Y+-MM-DDThh:mm:ssZ`` (years may exceed 9999 — out
  of range for TimestampType, hence string in/string out) + precision int;
- precision 6=millennium, 7=century, 9=year, 10=month, 11=day, other=year
  fallback (src/utils/date_formatter.py:88-94,114-116);
- millennium/century index = ``int(year/1000|100) + 1`` with *truncating*
  int() (src/utils/date_formatter.py:119,124);
- era suffix when the raw time starts with ``-`` (src:106-112);
- numeral style per language: en=ordinal, de=plain, kn=Kannada digits,
  fr/it/es/ca=Roman (factory at src/utils/date_formatter.py:215-225).

Golden values from the reference's own tests
(src/test/test_date_formatter.py) are enforced in tests/test_dates.py.
"""

from __future__ import annotations

MILLENNIUM_TEMPLATE = {
    "en": "{n} millennium {era}",
    "fr": "{n}e millénaire {era}",
    "it": "{n} millennio {era}",
    "es": "{n} milenio {era}",
    "ca": "Mil·lenni {n} {era}",
    "de": "{n}. Jahrtausend {era}",
}

CENTURY_TEMPLATE = {
    "en": "{n} century {era}",
    "fr": "{n}e siècle {era}",
    "it": "{n} secolo {era}",
    "es": "siglo {n} {era}",
    "ca": "segle {n} {era}",
    "de": "{n}. Jahrhundert {era}",
    "kn": "{era} {n}ನೇ ಶತಮಾನ",
}

BC_TOKEN = {
    "en": "BC",
    "fr": "J.-C",
    "it": "a.C.",
    "ca": "aC",
    "es": "a. C.",
    "de": "v. Chr.",
    "kn": "ಕ್ರಿ.ಪೂ",
}

MONTHS = {
    "en": ["January", "February", "March", "April", "May", "June", "July",
           "August", "September", "October", "November", "December"],
    "fr": ["janvier", "février", "mars", "avril", "mai", "juin", "juillet",
           "août", "septembre", "octobre", "novembre", "décembre"],
    "it": ["gennaio", "febbraio", "marzo", "aprile", "maggio", "giugno",
           "luglio", "agosto", "settembre", "ottobre", "novembre",
           "dicembre"],
    "es": ["enero", "febrero", "marzo", "abril", "mayo", "junio", "julio",
           "agosto", "septiembre", "octubre", "noviembre", "diciembre"],
    "ca": ["gener", "febrer", "març", "abril", "maig", "juny", "juliol",
           "agost", "setembre", "octubre", "novembre", "desembre"],
    "de": ["Januar", "Februar", "März", "April", "Mai", "Juni", "Juli",
           "August", "September", "Oktober", "November", "Dezember"],
}

# "{day}{suffix} {month} {year}" variants (src/utils/date_formatter.py:43-54)
DAY_SUFFIX = {"it": {1: "°"}, "fr": {1: "er"}}

KN_DIGITS = "೦೧೨೩೪೫೬೭೮೯"
KN_MONTHS = ["ಜನವರಿ", "ಫ಼ೆಬ್ರವರಿ", "ಮಾರ್ಚ್", "ಏಪ್ರಿಲ್", "ಮೇ", "ಜೂನ್", "ಜುಲೈ",
             "ಆಗಸ್ಟ್", "ಸೆಪ್ಟಂಬರ್", "ಅಕ್ಟೋಬರ್", "ನವೆಂಬರ್", "ಡಿಸೆಂಬರ್"]

_ROMAN = [
    (1000, "M"), (900, "CM"), (500, "D"), (400, "CD"), (100, "C"),
    (90, "XC"), (50, "L"), (40, "XL"), (10, "X"), (9, "IX"), (5, "V"),
    (4, "IV"), (1, "I"),
]


def ordinal(n: int) -> str:
    """English ordinal: 1st, 2nd, 3rd, 4th, 11th-13th -> th, 21st..."""
    if 10 <= n % 100 <= 13:
        return f"{n}th"
    return str(n) + {1: "st", 2: "nd", 3: "rd"}.get(n % 10, "th")


def int2roman(n: int) -> str:
    out = []
    for value, sym in _ROMAN:
        while n >= value:
            out.append(sym)
            n -= value
    return "".join(out)


def _kn_num(n: int) -> str:
    return "".join(KN_DIGITS[int(d)] for d in str(n))


def _to_human(n: int, lang: str) -> str:
    if lang == "en":
        return ordinal(n)
    if lang in ("de", "kn"):
        return str(n)
    return int2roman(n)  # fr / it / es / ca


def _ymd(date: str) -> tuple[int, int, int]:
    parts = date.split("T")[0].split("-")
    year = int(parts[0])
    month = int(parts[1]) if len(parts) > 1 and parts[1] else 1
    day = int(parts[2]) if len(parts) > 2 and parts[2] else 1
    return year, max(month, 1), max(day, 1)


def format_date(raw_time: str, precision: int, lang: str = "en") -> str:
    """Render a Wikidata time string at the given precision for ``lang``.

    Mirrors DateFormatter.format (src/utils/date_formatter.py:106-150):
    the sign character is stripped, era token appended for BC dates.
    """
    if not raw_time:
        return ""
    era = BC_TOKEN.get(lang, "BC") if raw_time.startswith("-") else ""
    date = raw_time[1:] if raw_time[:1] in "+-" else raw_time
    year, month, day = _ymd(date)

    if lang == "kn":
        return _format_kn(date, precision, year, month, day, era)

    if precision == 6:
        n = _to_human(int(year / 1000) + 1, lang)
        return MILLENNIUM_TEMPLATE.get(lang, "{n} millennium {era}").format(
            n=n, era=era).strip()
    if precision == 7:
        n = _to_human(int(year / 100) + 1, lang)
        return CENTURY_TEMPLATE.get(lang, "{n} century {era}").format(
            n=n, era=era).strip()
    if precision == 10:
        m = MONTHS.get(lang, MONTHS["en"])[month - 1]
        if lang in ("es", "ca"):
            body = f"{m} de {year}"
        else:
            body = f"{m} {year}"
        return (body + " " + era).strip()
    if precision == 11:
        m = MONTHS.get(lang, MONTHS["en"])[month - 1]
        suffix = DAY_SUFFIX.get(lang, {}).get(day, "")
        if lang in ("es", "ca"):
            body = f"{day} de {m} de {year}"
        elif lang == "de":
            body = f"{day}. {m} {year}"
        else:
            body = f"{day}{suffix} {m} {year}"
        return (body + " " + era).strip()
    if precision == 9:
        return f"{year} {era}".strip()
    # default fallback keeps the zero-padded year string
    # (src/utils/date_formatter.py:114-116)
    return f"{date.split('-')[0]} {era}".strip()


def _format_kn(date: str, precision: int, year: int, month: int, day: int,
               era: str) -> str:
    """Kannada formatter (src/utils/date_formatter.py:166-212); precisions
    6 and 7 both render centuries (src:168-175)."""
    if precision in (6, 7):
        n = _kn_num(int(year / 100) + 1)
        return CENTURY_TEMPLATE["kn"].format(n=n, era=era).strip()
    if precision == 10:
        return f"{KN_MONTHS[month - 1]} {_kn_num(year)}"
    if precision == 11:
        return " ".join(
            (KN_MONTHS[month - 1], _kn_num(day) + ",", _kn_num(year), era)
        ).strip()
    return f"{_kn_num(year)} {era}".strip()
