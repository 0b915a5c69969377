"""Japanese text → romaji-with-accent → IPA.

Pipeline parity with the reference (reference ``text/japanese.py:74-153``):
full-context-label G2P with pitch-accent arrows ``↑``/``↓`` and accent-phrase
spaces, sokuon (っ) / hatsuon (ん) assimilation rewrites, then romaji→IPA
substitution tables.

The reference requires ``pyopenjtalk``; here it is optional:

* with ``pyopenjtalk`` installed, the accent-aware path matches the reference,
* without it, a built-in kana→phoneme converter handles hiragana/katakana text
  (no pitch-accent marks, kanji passed through untranscribed) so the pipeline
  stays functional standalone.
"""

from __future__ import annotations

import re

from personalized_text_to_speech_tpu.text.english import ascii_fold

try:  # pragma: no cover - depends on environment
    import pyopenjtalk as _pyopenjtalk  # type: ignore
except Exception:  # pragma: no cover
    _pyopenjtalk = None


_JAPANESE_CHARACTERS = re.compile(
    r"[A-Za-z\d々぀-ヿ一-鿿１-９Ａ-Ｚａ-ｚｦ-ﾝ]"
)
_JAPANESE_MARKS = re.compile(
    r"[^A-Za-z\d々぀-ヿ一-鿿１-９Ａ-Ｚａ-ｚｦ-ﾝ]"
)

_SYMBOLS_TO_JAPANESE = [(re.compile("％"), "パーセント")]


# --------------------------------------------------------------------------
# Built-in kana → openjtalk-style phoneme fallback
# --------------------------------------------------------------------------

_KANA_BASE = {
    "あ": "a", "い": "i", "う": "u", "え": "e", "お": "o",
    "か": "ka", "き": "ki", "く": "ku", "け": "ke", "こ": "ko",
    "さ": "sa", "し": "ʃi", "す": "su", "せ": "se", "そ": "so",
    "た": "ta", "ち": "ʧi", "つ": "ʦu", "て": "te", "と": "to",
    "な": "na", "に": "ni", "ぬ": "nu", "ね": "ne", "の": "no",
    "は": "ha", "ひ": "hi", "ふ": "fu", "へ": "he", "ほ": "ho",
    "ま": "ma", "み": "mi", "む": "mu", "め": "me", "も": "mo",
    "や": "ya", "ゆ": "yu", "よ": "yo",
    "ら": "ra", "り": "ri", "る": "ru", "れ": "re", "ろ": "ro",
    "わ": "wa", "ゐ": "i", "ゑ": "e", "を": "o", "ん": "N",
    "が": "ga", "ぎ": "gi", "ぐ": "gu", "げ": "ge", "ご": "go",
    "ざ": "za", "じ": "ji", "ず": "zu", "ぜ": "ze", "ぞ": "zo",
    "だ": "da", "ぢ": "ji", "づ": "zu", "で": "de", "ど": "do",
    "ば": "ba", "び": "bi", "ぶ": "bu", "べ": "be", "ぼ": "bo",
    "ぱ": "pa", "ぴ": "pi", "ぷ": "pu", "ぺ": "pe", "ぽ": "po",
    "ぁ": "a", "ぃ": "i", "ぅ": "u", "ぇ": "e", "ぉ": "o",
    "ゔ": "bu",
}
_KANA_YOON = {
    "きゃ": "kya", "きゅ": "kyu", "きょ": "kyo",
    "しゃ": "ʃa", "しゅ": "ʃu", "しょ": "ʃo",
    "ちゃ": "ʧa", "ちゅ": "ʧu", "ちょ": "ʧo",
    "にゃ": "nya", "にゅ": "nyu", "にょ": "nyo",
    "ひゃ": "hya", "ひゅ": "hyu", "ひょ": "hyo",
    "みゃ": "mya", "みゅ": "myu", "みょ": "myo",
    "りゃ": "rya", "りゅ": "ryu", "りょ": "ryo",
    "ぎゃ": "gya", "ぎゅ": "gyu", "ぎょ": "gyo",
    "じゃ": "ja", "じゅ": "ju", "じょ": "jo",
    "ぢゃ": "ja", "ぢゅ": "ju", "ぢょ": "jo",
    "びゃ": "bya", "びゅ": "byu", "びょ": "byo",
    "ぴゃ": "pya", "ぴゅ": "pyu", "ぴょ": "pyo",
}
_VOWELS = "aiueo"


def _kata_to_hira(text: str) -> str:
    out = []
    for ch in text:
        code = ord(ch)
        if 0x30A1 <= code <= 0x30F6:  # katakana → hiragana
            out.append(chr(code - 0x60))
        else:
            out.append(ch)
    return "".join(out)


def _kana_to_phonemes(text: str) -> str:
    """Hiragana/katakana → openjtalk-style phoneme string (no accent info)."""
    text = _kata_to_hira(text)
    out = []
    i = 0
    while i < len(text):
        two = text[i : i + 2]
        ch = text[i]
        if two in _KANA_YOON:
            out.append(_KANA_YOON[two])
            i += 2
            continue
        if ch == "っ":
            out.append("Q")
            i += 1
            continue
        if ch == "ー":
            # long-vowel mark: repeat previous vowel
            if out and out[-1] and out[-1][-1] in _VOWELS:
                out.append(out[-1][-1])
            i += 1
            continue
        if ch in _KANA_BASE:
            out.append(_KANA_BASE[ch])
            i += 1
            continue
        out.append(ascii_fold(ch))
        i += 1
    return "".join(out)


# --------------------------------------------------------------------------
# Accent-aware G2P via pyopenjtalk full-context labels
# (reference japanese.py:74-112)
# --------------------------------------------------------------------------

def _openjtalk_romaji_with_accent(sentence: str) -> str:
    text = ""
    labels = _pyopenjtalk.extract_fullcontext(sentence)
    for n, label in enumerate(labels):
        phoneme = re.search(r"\-([^\+]*)\+", label).group(1)
        if phoneme in ("sil", "pau"):
            continue
        text += (
            phoneme.replace("ch", "ʧ").replace("sh", "ʃ").replace("cl", "Q")
        )
        a1 = int(re.search(r"/A:(\-?[0-9]+)\+", label).group(1))
        a2 = int(re.search(r"\+(\d+)\+", label).group(1))
        a3 = int(re.search(r"\+(\d+)/", label).group(1))
        if re.search(r"\-([^\+]*)\+", labels[n + 1]).group(1) in ("sil", "pau"):
            a2_next = -1
        else:
            a2_next = int(re.search(r"\+(\d+)\+", labels[n + 1]).group(1))
        if a3 == 1 and a2_next == 1:
            text += " "  # accent phrase boundary
        elif a1 == 0 and a2_next == a2 + 1:
            text += "↓"  # pitch fall
        elif a2 == 1 and a2_next == 2:
            text += "↑"  # pitch rise
    return text


def japanese_to_romaji_with_accent(text: str) -> str:
    for regex, replacement in _SYMBOLS_TO_JAPANESE:
        text = re.sub(regex, replacement, text)
    sentences = re.split(_JAPANESE_MARKS, text)
    marks = re.findall(_JAPANESE_MARKS, text)
    out = ""
    for i, sentence in enumerate(sentences):
        if re.match(_JAPANESE_CHARACTERS, sentence):
            if out != "":
                out += " "
            if _pyopenjtalk is not None:
                out += _openjtalk_romaji_with_accent(sentence)
            else:
                out += _kana_to_phonemes(sentence)
        if i < len(marks):
            out += ascii_fold(marks[i]).replace(" ", "")
    return out


# --------------------------------------------------------------------------
# Assimilation + romaji→IPA tables (reference japanese.py:20-65,115-144)
# --------------------------------------------------------------------------

_REAL_SOKUON = [(re.compile(p), r) for p, r in [
    (r"Q([↑↓]*[kg])", r"k#\1"),
    (r"Q([↑↓]*[tdjʧ])", r"t#\1"),
    (r"Q([↑↓]*[sʃ])", r"s\1"),
    (r"Q([↑↓]*[pb])", r"p#\1"),
]]

_REAL_HATSUON = [(re.compile(p), r) for p, r in [
    (r"N([↑↓]*[pbm])", r"m\1"),
    (r"N([↑↓]*[ʧʥj])", r"n^\1"),
    (r"N([↑↓]*[tdn])", r"n\1"),
    (r"N([↑↓]*[kg])", r"ŋ\1"),
]]

_ROMAJI_TO_IPA = [(re.compile(p), r) for p, r in [
    ("ts", "ʦ"), ("u", "ɯ"), ("j", "ʥ"), ("y", "j"), ("ni", "n^i"),
    ("nj", "n^"), ("hi", "çi"), ("hj", "ç"), ("f", "ɸ"), ("I", "i*"),
    ("U", "ɯ*"), ("r", "ɾ"),
]]

_ROMAJI_TO_IPA2 = [(re.compile(p), r) for p, r in [
    ("u", "ɯ"), ("ʧ", "tʃ"), ("j", "dʑ"), ("y", "j"), ("ni", "n^i"),
    ("nj", "n^"), ("hi", "çi"), ("hj", "ç"), ("f", "ɸ"), ("I", "i*"),
    ("U", "ɯ*"), ("r", "ɾ"),
]]


def get_real_sokuon(text: str) -> str:
    for regex, replacement in _REAL_SOKUON:
        text = re.sub(regex, replacement, text)
    return text


def get_real_hatsuon(text: str) -> str:
    for regex, replacement in _REAL_HATSUON:
        text = re.sub(regex, replacement, text)
    return text


def japanese_to_ipa(text: str) -> str:
    text = japanese_to_romaji_with_accent(text).replace("...", "…")
    text = re.sub(
        r"([aiueo])\1+",
        lambda m: m.group(0)[0] + "ː" * (len(m.group(0)) - 1),
        text,
    )
    text = get_real_sokuon(text)
    text = get_real_hatsuon(text)
    for regex, replacement in _ROMAJI_TO_IPA:
        text = re.sub(regex, replacement, text)
    return text


def japanese_to_ipa2(text: str) -> str:
    """The cjke_cleaners2 Japanese path (reference ``japanese.py:138-144``)."""
    text = japanese_to_romaji_with_accent(text).replace("...", "…")
    text = get_real_sokuon(text)
    text = get_real_hatsuon(text)
    for regex, replacement in _ROMAJI_TO_IPA2:
        text = re.sub(regex, replacement, text)
    return text


def japanese_to_ipa3(text: str) -> str:
    text = (
        japanese_to_ipa2(text)
        .replace("n^", "ȵ")
        .replace("ʃ", "ɕ")
        .replace("*", "̥")
        .replace("#", "̚")
    )
    text = re.sub(
        r"([aiɯeo])\1+",
        lambda m: m.group(0)[0] + "ː" * (len(m.group(0)) - 1),
        text,
    )
    text = re.sub(r"((?:^|\s)(?:ts|tɕ|[kpt]))", r"\1ʰ", text)
    return text
