"""Pinned language-id corpus + trained char-trigram profiles (VERDICT r3
next-round #3: replace the 6-marker toy lists with trained profiles).

No network and no downloadable corpus exist in this container, so — same
pattern as ``pos_corpus.py`` — the corpus is GENERATED deterministically
from pinned per-language vocabularies: function words + content words for
the Latin-script languages (en/fr/de/es), pinned common-character pools for
zh, and a syllable grammar over the Kannada block for kn (for script-disjoint
languages the script itself is the discriminative signal, which is exactly
how real char-n-gram identifiers separate them).

Held-out discipline (pos_corpus precedent): content vocabularies are split
disjointly between train and heldout (every 5th item heldout-only), so
held-out accuracy measures generalization through function-word and
morphology trigrams, never memorized content words. Function words are
shared — that mirrors reality: char-n-gram language id IS mostly a
function-word/morphology detector (Cavnar & Trenkle 1994's top-N n-gram
profiles are dominated by exactly these).

Profiles: per language, the top ``top_m`` trigrams by frequency over the
training snippets; a trigram is kept only if it is DISTINCTIVE (absent from
every other language's top-``top_m`` list), and the ``k`` most frequent
distinctive trigrams form the profile. Scoring stays integer
(count * len, see textstats.langid_score) so the DuckDB oracle reproduces
it exactly; trigrams containing quotes/backslashes are excluded so the
generated SQL literals stay trivially safe.
"""

from __future__ import annotations

import random
from collections import Counter
from functools import lru_cache

LANGS = ("de", "en", "es", "fr", "kn", "zh")

_FUNCTION_WORDS = {
    "en": ["the", "and", "of", "to", "in", "that", "with", "for", "was",
           "his", "her", "they", "this", "which", "from", "have", "not",
           "were", "would", "there", "their", "what", "about", "when"],
    "fr": ["le", "la", "les", "de", "des", "et", "que", "qui", "dans",
           "pour", "avec", "sur", "pas", "une", "est", "sont", "mais",
           "plus", "leur", "elle", "nous", "vous", "cette", "comme"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "auf", "sich",
           "nicht", "eine", "auch", "nach", "wird", "bei", "aus", "dem",
           "einen", "werden", "durch", "noch", "wenn", "aber", "oder"],
    "es": ["el", "la", "los", "las", "de", "que", "en", "por", "con",
           "para", "una", "del", "se", "su", "como", "más", "pero",
           "sus", "este", "cuando", "hay", "sobre", "entre", "también"],
}

# Content words: regular vocabulary with language-typical orthography and
# endings. Split train/heldout by index % 5 (every 5th heldout-only).
_CONTENT_WORDS = {
    "en": ["house", "garden", "village", "market", "mountain", "forest",
           "river", "window", "teacher", "student", "morning", "evening",
           "journey", "harvest", "library", "kitchen", "weather", "island",
           "bridge", "castle", "flower", "shadow", "silver", "winter",
           "summer", "spring", "stone", "light", "night", "world",
           "people", "children", "brother", "sister", "father", "mother",
           "friend", "letter", "story", "music", "water", "earth",
           "history", "science", "nature", "valley", "meadow", "harbor",
           "anchor", "lantern", "thought", "strength", "knowledge",
           "through", "enough", "laughter", "daughter", "neighbor",
           "weight", "height"],
    "fr": ["maison", "jardin", "village", "marché", "montagne", "forêt",
           "rivière", "fenêtre", "professeur", "étudiant", "matin", "soir",
           "voyage", "récolte", "bibliothèque", "cuisine", "temps", "île",
           "pont", "château", "fleur", "ombre", "argent", "hiver",
           "été", "printemps", "pierre", "lumière", "nuit", "monde",
           "gens", "enfants", "frère", "soeur", "père", "mère",
           "ami", "lettre", "histoire", "musique", "eau", "terre",
           "connaissance", "science", "nature", "vallée", "prairie",
           "port", "ancre", "lanterne", "pensée", "force", "travail",
           "toujours", "beaucoup", "aujourd", "chanson", "oiseau",
           "cheveux", "chapeau"],
    "de": ["haus", "garten", "dorf", "markt", "berg", "wald",
           "fluss", "fenster", "lehrer", "schüler", "morgen", "abend",
           "reise", "ernte", "bibliothek", "küche", "wetter", "insel",
           "brücke", "schloss", "blume", "schatten", "silber", "winter",
           "sommer", "frühling", "stein", "licht", "nacht", "welt",
           "leute", "kinder", "bruder", "schwester", "vater", "mutter",
           "freund", "brief", "geschichte", "musik", "wasser", "erde",
           "wissenschaft", "forschung", "natur", "tal", "wiese", "hafen",
           "anker", "laterne", "gedanke", "kraft", "arbeit",
           "immer", "vielleicht", "heute", "lied", "vogel",
           "haare", "hut"],
    "es": ["casa", "jardín", "pueblo", "mercado", "montaña", "bosque",
           "río", "ventana", "profesor", "estudiante", "mañana", "tarde",
           "viaje", "cosecha", "biblioteca", "cocina", "tiempo", "isla",
           "puente", "castillo", "flor", "sombra", "plata", "invierno",
           "verano", "primavera", "piedra", "luz", "noche", "mundo",
           "gente", "niños", "hermano", "hermana", "padre", "madre",
           "amigo", "carta", "historia", "música", "agua", "tierra",
           "conocimiento", "ciencia", "naturaleza", "valle", "pradera",
           "puerto", "ancla", "linterna", "pensamiento", "fuerza",
           "trabajo", "siempre", "quizás", "ahora", "canción", "pájaro",
           "cabello", "sombrero"],
}

# zh: multi-character function expressions (shared — the repeating trigram
# signal, like function words in the Latin languages) + content character
# pairs split train/heldout. Snippets are space-free runs, the way the
# script actually appears.
_ZH_FUNCTION_EXPRS = [
    "的时候", "我们的", "他们的", "这就是", "是一个", "不知道", "有没有",
    "为什么", "也就是", "可以说", "就是说", "但是", "因为", "所以",
    "如果", "没有", "还是", "已经", "现在", "什么", "知道", "觉得",
    "的", "了", "是", "在", "和", "不", "都", "很",
]
_ZH_CONTENT = ("山水天地人家国年月日时分风雨雪花树林河海城市学生老师朋友"
               "书信历史音乐自然科学工作思想力量知识道路光明黑夜世界孩子"
               "兄弟姐妹父母春夏秋冬石头灯火桥梁城堡花园市场村庄高原森林")

# kn: syllable grammar over the Kannada block — consonants x vowel signs,
# split train/heldout by consonant index % 5.
_KN_CONSONANTS = list("ಕಗಚಜಟಡತದನಪಬಮಯರಲವಶಸಹಳ")
_KN_VOWEL_SIGNS = ["", "ಾ", "ಿ", "ೀ", "ು", "ೂ", "ೆ", "ೇ", "ೊ", "ೋ"]
# common real suffix-ish endings to give kn text morphology-like tails
_KN_ENDINGS = ["ದಲ್ಲಿ", "ಗಳು", "ವನ್ನು", "ದಿಂದ", "ಕ್ಕೆ", "ಯಿಂದ"]


def _split(items: list[str], split: str) -> list[str]:
    if split == "train":
        return [w for i, w in enumerate(items) if i % 5 != 0]
    return [w for i, w in enumerate(items) if i % 5 == 0]


def _latin_snippet(rng: random.Random, lang: str, split: str) -> str:
    fn = _FUNCTION_WORDS[lang]
    content = _split(_CONTENT_WORDS[lang], split)
    n = rng.randint(8, 16)
    words = []
    for i in range(n):
        # alternate function/content like real prose (~45% function words)
        src = fn if rng.random() < 0.45 else content
        words.append(rng.choice(src))
    return " ".join(words)


def _zh_snippet(rng: random.Random, split: str) -> str:
    content = _split(list(_ZH_CONTENT), split)
    multi = [e for e in _ZH_FUNCTION_EXPRS if len(e) >= 2]
    # real zh prose is saturated with function patterns — every snippet
    # carries at least two multi-char ones, the rest a 55/45 mix
    out = [rng.choice(multi), rng.choice(multi)]
    for _ in range(rng.randint(8, 16)):
        if rng.random() < 0.55:
            out.append(rng.choice(_ZH_FUNCTION_EXPRS))
        else:
            out.append(rng.choice(content) + rng.choice(content))
    rng.shuffle(out)
    return "".join(out)


def _kn_snippet(rng: random.Random, split: str) -> str:
    consonants = _split(_KN_CONSONANTS, split)
    words = []
    for _ in range(rng.randint(5, 10)):
        syl = "".join(
            rng.choice(consonants) + rng.choice(_KN_VOWEL_SIGNS)
            for _ in range(rng.randint(1, 3))
        )
        if rng.random() < 0.5:
            syl += rng.choice(_KN_ENDINGS)
        words.append(syl)
    return " ".join(words)


def snippets(split: str, n_per_lang: int = 100) -> list[tuple[str, str]]:
    """Deterministic (lang, text) snippets; train/heldout use disjoint
    content vocabularies AND disjoint seeds."""
    assert split in ("train", "heldout")
    out = []
    for lang in LANGS:
        rng = random.Random(f"langid-{split}-{lang}")
        for _ in range(n_per_lang):
            if lang == "zh":
                out.append((lang, _zh_snippet(rng, split)))
            elif lang == "kn":
                out.append((lang, _kn_snippet(rng, split)))
            else:
                out.append((lang, _latin_snippet(rng, lang, split)))
    return out


def _trigram_counts(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        t = t.lower()
        for i in range(len(t) - 2):
            tri = t[i : i + 3]
            if "'" in tri or "\\" in tri:
                continue  # keep generated SQL literals trivially safe
            c[tri] += 1
    return c


@lru_cache(maxsize=1)
def train_profiles(top_m: int = 200, k: int = 64) -> dict[str, list[str]]:
    """lang -> its k most frequent DISTINCTIVE training trigrams (in no
    other language's top-m list). Deterministic: ties broken by trigram."""
    by_lang = {}
    for lang in LANGS:
        texts = [t for lg, t in snippets("train") if lg == lang]
        by_lang[lang] = _trigram_counts(texts)
    top = {
        lang: [t for t, _ in sorted(
            c.items(), key=lambda kv: (-kv[1], kv[0])
        )[:top_m]]
        for lang, c in by_lang.items()
    }
    profiles = {}
    for lang in LANGS:
        others = set().union(
            *(set(top[o]) for o in LANGS if o != lang)
        )
        distinct = [t for t in top[lang] if t not in others]
        profiles[lang] = distinct[:k]
    return profiles
