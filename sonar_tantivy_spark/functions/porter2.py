"""Porter2 (Snowball "english") stemmer, pure Python.

The reference engine's ``en_stem`` tokenizer chain ends in tantivy's
``Stemmer(Language::English)`` (rust-stemmers), which is the Snowball
English ("Porter2") algorithm — bound by the reference schema at
/root/reference/test/lib/fixtures.js:23-24 and README.md:33.

This is a from-scratch implementation of the published algorithm
(https://snowballstem.org/algorithms/english/stemmer.html) — public
knowledge, no code copied.  It is deliberately dependency-free because
``snowballstemmer`` is not available in this environment.

Vowels are ``aeiouy``; a ``y`` that follows a vowel (or starts the word)
is marked as consonant ``Y`` during processing and restored at the end.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# Exceptional forms (checked after apostrophe stripping, before step 1a).
_EXCEPTIONS = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariant forms
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# Words that stop after step 1a.
_EXCEPTIONS_POST_1A = frozenset(
    {"inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed"}
)


def _is_vowel(ch: str) -> bool:
    return ch in _VOWELS  # marked 'Y' is uppercase → consonant


def _mark_ys(word: str) -> str:
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and _is_vowel(chars[i - 1]):
            chars[i] = "Y"
    return "".join(chars)


def _region_after(word: str, begin: int) -> int:
    """Index of the region after the first non-vowel following a vowel,
    searching from ``begin``; end of word if no such pattern."""
    for i in range(begin + 1, len(word)):
        if not _is_vowel(word[i]) and _is_vowel(word[i - 1]):
            return i + 1
    return len(word)


def _compute_r1(word: str) -> int:
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            return len(prefix)
    return _region_after(word, 0)


def _ends_short_syllable(word: str) -> bool:
    """True if the word ends in a short syllable:
    (a) vowel + non-vowel(≠ w,x,Y) preceded by a non-vowel, or
    (b) vowel at word start + non-vowel."""
    n = len(word)
    if n == 2:
        return _is_vowel(word[0]) and not _is_vowel(word[1])
    if n >= 3:
        c1, c2, c3 = word[-3], word[-2], word[-1]
        return (
            not _is_vowel(c1)
            and _is_vowel(c2)
            and not _is_vowel(c3)
            and c3 not in "wxY"
        )
    return False


def _contains_vowel(word: str) -> bool:
    return any(_is_vowel(c) for c in word)


def _step0(w: str) -> str:
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            return w[: -len(suf)]
    return w


def _step1a(w: str) -> str:
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith("ied") or w.endswith("ies"):
        return w[:-2] if len(w) > 4 else w[:-1]
    if w.endswith("us") or w.endswith("ss"):
        return w
    if w.endswith("s"):
        # delete if the preceding word part contains a vowel not
        # immediately before the s
        if _contains_vowel(w[:-2]):
            return w[:-1]
    return w


def _step1b(w: str, r1: int) -> str:
    for suf, repl in (("eedly", "ee"), ("eed", "ee")):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                return w[: -len(suf)] + repl
            return w
    for suf in ("ingly", "edly", "ing", "ed"):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if not _contains_vowel(stem):
                return w
            if stem.endswith(("at", "bl", "iz")):
                return stem + "e"
            if stem.endswith(_DOUBLES):
                return stem[:-1]
            if _compute_r1(stem) >= len(stem) and _ends_short_syllable(stem):
                return stem + "e"
            return stem
    return w


def _step1c(w: str) -> str:
    if len(w) > 2 and w[-1] in "yY" and not _is_vowel(w[-2]):
        return w[:-1] + "i"
    return w


_STEP2 = (
    ("ization", "ize"),
    ("ational", "ate"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("lessli", "less"),
    ("entli", "ent"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("ousli", "ous"),
    ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("abli", "able"),
    ("izer", "ize"),
    ("ator", "ate"),
    ("alli", "al"),
    ("bli", "ble"),
)


def _step2(w: str, r1: int) -> str:
    for suf, repl in _STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                return w[: -len(suf)] + repl
            return w
    if w.endswith("ogi"):
        if len(w) - 3 >= r1 and len(w) >= 4 and w[-4] == "l":
            return w[:-1]
        return w
    if w.endswith("li"):
        if len(w) - 2 >= r1 and len(w) >= 3 and w[-3] in _LI_ENDING:
            return w[:-2]
        return w
    return w


_STEP3 = (
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ical", "ic"),
    ("ness", ""),
    ("ful", ""),
)


def _step3(w: str, r1: int, r2: int) -> str:
    if w.endswith("ative"):
        # 'ational'/'tional' are longer but cannot co-occur with 'ative'
        if len(w) - 5 >= r2:
            return w[:-5]
        return w
    for suf, repl in _STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                return w[: -len(suf)] + repl
            return w
    return w


_STEP4 = (
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "al",
    "er",
    "ic",
)


def _step4(w: str, r2: int) -> str:
    for suf in _STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                return w[: -len(suf)]
            return w
    if w.endswith("ion"):
        if len(w) - 3 >= r2 and len(w) >= 4 and w[-4] in "st":
            return w[:-3]
        return w
    return w


def _step5(w: str, r1: int, r2: int) -> str:
    if w.endswith("e"):
        if len(w) - 1 >= r2:
            return w[:-1]
        if len(w) - 1 >= r1 and not _ends_short_syllable(w[:-1]):
            return w[:-1]
        return w
    if w.endswith("l"):
        if len(w) - 1 >= r2 and len(w) >= 2 and w[-2] == "l":
            return w[:-1]
    return w


@lru_cache(maxsize=1 << 18)
def stem(word: str) -> str:
    """Stem one lowercase word with the Snowball English algorithm."""
    if len(word) <= 2:
        return word
    w = word
    if w.startswith("'"):
        w = w[1:]
    if w in _EXCEPTIONS:
        return _EXCEPTIONS[w]
    w = _mark_ys(w)
    # Regions are fixed cursor positions computed once on the marked word
    # (Snowball's mark_regions); later steps only rewrite the tail, and
    # region-membership checks simply fail when the word shrinks below them.
    r1 = _compute_r1(w)
    r2 = _region_after(w, r1)
    w = _step0(w)
    w = _step1a(w)
    if w in _EXCEPTIONS_POST_1A:
        return w
    w = _step1b(w, r1)
    w = _step1c(w)
    w = _step2(w, r1)
    w = _step3(w, r1, r2)
    w = _step4(w, r2)
    w = _step5(w, r1, r2)
    return w.replace("Y", "y")
