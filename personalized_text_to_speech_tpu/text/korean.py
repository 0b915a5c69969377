"""Korean text → jamo → IPA.

The reference ships only compiled bytecode for this module (see
``text/__pycache__/korean.cpython-38.pyc``; its source is absent from the repo,
which makes the reference frontend un-importable on Python ≠3.8).  The
bytecode's string table shows a g2pK-style pipeline: ``latin_to_hangul`` /
``number_to_hangul`` / ``divide_hangul`` / ``korean_to_ipa`` built on ``jamo``
and ``ko_pron``.

This is a self-contained rebuild: hangul syllable decomposition is pure
codepoint arithmetic (no ``jamo`` dependency needed), numbers use sino-Korean
readings, and the jamo→IPA tables implement standard Korean romanization-level
G2P.  ``ko_pron`` is used when installed for dictionary-grade pronunciations.
"""

from __future__ import annotations

import re

try:  # pragma: no cover - depends on environment
    import ko_pron as _ko_pron  # type: ignore
except Exception:  # pragma: no cover
    _ko_pron = None


# Hangul syllable block arithmetic: U+AC00 + (initial*21 + medial)*28 + final
_CHO = [
    "ㄱ", "ㄲ", "ㄴ", "ㄷ", "ㄸ", "ㄹ", "ㅁ", "ㅂ", "ㅃ", "ㅅ", "ㅆ",
    "ㅇ", "ㅈ", "ㅉ", "ㅊ", "ㅋ", "ㅌ", "ㅍ", "ㅎ",
]
_JUNG = [
    "ㅏ", "ㅐ", "ㅑ", "ㅒ", "ㅓ", "ㅔ", "ㅕ", "ㅖ", "ㅗ", "ㅘ", "ㅙ",
    "ㅚ", "ㅛ", "ㅜ", "ㅝ", "ㅞ", "ㅟ", "ㅠ", "ㅡ", "ㅢ", "ㅣ",
]
_JONG = [
    "", "ㄱ", "ㄲ", "ㄳ", "ㄴ", "ㄵ", "ㄶ", "ㄷ", "ㄹ", "ㄺ", "ㄻ", "ㄼ",
    "ㄽ", "ㄾ", "ㄿ", "ㅀ", "ㅁ", "ㅂ", "ㅄ", "ㅅ", "ㅆ", "ㅇ", "ㅈ",
    "ㅊ", "ㅋ", "ㅌ", "ㅍ", "ㅎ",
]


def divide_hangul(text: str) -> str:
    """Decompose hangul syllable blocks into compatibility jamo."""
    out = []
    for ch in text:
        code = ord(ch)
        if 0xAC00 <= code <= 0xD7A3:
            idx = code - 0xAC00
            cho, rest = divmod(idx, 21 * 28)
            jung, jong = divmod(rest, 28)
            out.append(_CHO[cho])
            out.append(_JUNG[jung])
            if jong:
                out.append(_JONG[jong])
        else:
            out.append(ch)
    return "".join(out)


# Latin letter names spelled in hangul (for acronyms in Korean text)
_LATIN_TO_HANGUL = [
    (re.compile(p, re.IGNORECASE), r)
    for p, r in [
        ("a", "에이"), ("b", "비"), ("c", "시"), ("d", "디"), ("e", "이"),
        ("f", "에프"), ("g", "지"), ("h", "에이치"), ("i", "아이"),
        ("j", "제이"), ("k", "케이"), ("l", "엘"), ("m", "엠"), ("n", "엔"),
        ("o", "오"), ("p", "피"), ("q", "큐"), ("r", "아르"), ("s", "에스"),
        ("t", "티"), ("u", "유"), ("v", "브이"), ("w", "더블유"),
        ("x", "엑스"), ("y", "와이"), ("z", "제트"),
    ]
]


def latin_to_hangul(text: str) -> str:
    for regex, replacement in _LATIN_TO_HANGUL:
        text = re.sub(regex, replacement, text)
    return text


_SINO_DIGITS = ["영", "일", "이", "삼", "사", "오", "육", "칠", "팔", "구"]
_SINO_UNITS = ["", "십", "백", "천"]
_SINO_GROUPS = ["", "만", "억", "조"]


def _four_to_hangul(n: int) -> str:
    out = []
    for pos in range(3, -1, -1):
        d = (n // 10 ** pos) % 10
        if d == 0:
            continue
        if d == 1 and pos > 0:
            out.append(_SINO_UNITS[pos])
        else:
            out.append(_SINO_DIGITS[d] + _SINO_UNITS[pos])
    return "".join(out)


def number_to_hangul(text: str) -> str:
    """Replace arabic numbers with sino-Korean readings."""

    def convert(m: re.Match) -> str:
        n = int(m.group(0))
        if n == 0:
            return _SINO_DIGITS[0]
        groups = []
        while n:
            groups.append(n % 10000)
            n //= 10000
        parts = []
        for i in range(len(groups) - 1, -1, -1):
            if groups[i]:
                parts.append(_four_to_hangul(groups[i]) + _SINO_GROUPS[i])
        return "".join(parts)

    return re.sub(r"\d+", convert, text)


# jamo → IPA-ish (lazy) mapping; onset/coda context handled coarsely.
_JAMO_TO_IPA = {
    "ㄱ": "k", "ㄲ": "k͈", "ㄴ": "n", "ㄷ": "t", "ㄸ": "t͈", "ㄹ": "ɾ",
    "ㅁ": "m", "ㅂ": "p", "ㅃ": "p͈", "ㅅ": "s", "ㅆ": "s͈", "ㅇ": "ŋ",
    "ㅈ": "tɕ", "ㅉ": "tɕ͈", "ㅊ": "tɕʰ", "ㅋ": "kʰ", "ㅌ": "tʰ",
    "ㅍ": "pʰ", "ㅎ": "h",
    "ㅏ": "a", "ㅐ": "ɛ", "ㅑ": "ja", "ㅒ": "jɛ", "ㅓ": "ʌ", "ㅔ": "e",
    "ㅕ": "jʌ", "ㅖ": "je", "ㅗ": "o", "ㅘ": "wa", "ㅙ": "wɛ", "ㅚ": "we",
    "ㅛ": "jo", "ㅜ": "u", "ㅝ": "wʌ", "ㅞ": "we", "ㅟ": "wi", "ㅠ": "ju",
    "ㅡ": "ɯ", "ㅢ": "ɰi", "ㅣ": "i",
}


def _hangul_to_ipa_builtin(text: str) -> str:
    out = []
    for ch in text:
        code = ord(ch)
        if 0xAC00 <= code <= 0xD7A3:
            idx = code - 0xAC00
            cho, rest = divmod(idx, 21 * 28)
            jung, jong = divmod(rest, 28)
            onset = _CHO[cho]
            # silent ㅇ onset
            if onset != "ㅇ":
                out.append(_JAMO_TO_IPA.get(onset, ""))
            out.append(_JAMO_TO_IPA.get(_JUNG[jung], ""))
            if jong:
                coda = _JONG[jong][-1]
                out.append(_JAMO_TO_IPA.get(coda, ""))
        else:
            out.append(ch)
    return "".join(out)


def korean_to_lazy_ipa(text: str) -> str:
    text = latin_to_hangul(text)
    text = number_to_hangul(text)
    if _ko_pron is not None:
        try:
            words = text.split(" ")
            ipa_words = [
                _ko_pron.romanise(w, "ipa") if re.search(r"[가-힣]", w) else w
                for w in words
            ]
            return " ".join(ipa_words)
        except Exception:
            pass
    return _hangul_to_ipa_builtin(text)


# narrow-IPA → cjke_cleaners2 vocabulary substitutions, so Korean output maps
# fully into the shared 68-symbol table (otherwise ʌ/ɕ/tense marks etc. are
# silently dropped at ID-mapping time and synthesis is garbled)
_IPA_TO_VOCAB = [
    ("t͡ɕ", "tʃ"), ("d͡ʑ", "dʑ"), ("tɕ", "tʃ"), ("dʑ", "dʑ"),
    ("͈", ""), ("͉", ""), ("̚", "#"), ("͡", ""),
    ("ɕ", "ʃ"), ("ʌ", "ə"), ("ɰ", "ɯ"), ("ɲ", "n^"), ("ɭ", "l"),
    ("ʎ", "l"), ("ʰ", "ʰ"), ("r", "ɾ"), ("ː", ""),
]


def korean_to_ipa(text: str) -> str:
    """The cjke_cleaners2 Korean hook: lazy IPA folded into the shared
    symbol vocabulary."""
    text = korean_to_lazy_ipa(text)
    for pat, rep in _IPA_TO_VOCAB:
        text = text.replace(pat, rep)
    return text
