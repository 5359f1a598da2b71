"""Diacritic folding, behavior-parity with
/root/reference/lib/text-processing/remove-diacritics.js.

Independent implementation: Unicode NFD decomposition + combining-mark
strip covers the bulk of the Latin table; non-decomposing characters
(ø, đ, ł, æ, œ, ß …), enclosed/fullwidth digits, and the hand-curated
Cyrillic / Greek / Arabic folds are explicit maps. The reference also
strips bare combining marks following any non-space char — NFD handles
that uniformly here.
"""

from __future__ import annotations

import unicodedata

# Characters whose NFD form does not decompose to base+combining but which
# the reference folds anyway (both cases; output matches the JS table).
_EXTRA = {
    "Ø": "O", "ø": "o",          # Ø ø
    "Đ": "D", "đ": "d",          # Đ đ
    "Ł": "L", "ł": "l",          # Ł ł
    "Æ": "AE", "æ": "ae",
    "Œ": "OE", "œ": "oe",
    "ß": "ss", "ẞ": "SS",
    "Ħ": "H", "ħ": "h",          # Ħ ħ
    "Ŧ": "T", "ŧ": "t",          # Ŧ ŧ
    "ı": "i",                          # dotless i
    "ŉ": "n",                          # ŉ
    "ſ": "s",                          # long s
    "Ð": "D", "ð": "d",          # Eth folds like the JS D entries
    "Ɖ": "D", "ɖ": "d",
    "Ⱥ": "A", "ⱥ": "a",
    "Ƀ": "B", "ƀ": "b",
    "Ȼ": "C", "ȼ": "c",
    "Ǝ": "E", "ǝ": "e",
    "Ɛ": "E", "ɛ": "e",
    "Ɨ": "I", "ɨ": "i",
    "Ɵ": "O", "ɵ": "o",
    "Ɔ": "O", "ɔ": "o",
    "Ƚ": "L", "ƚ": "l",
    "Ƞ": "N", "ƞ": "n",
    "Ɍ": "R", "ɍ": "r",
    "Ⱦ": "T", "ʈ": "t",
    "Ʉ": "U", "ʉ": "u",
    "Ʌ": "V", "ʌ": "v",
    "Ɏ": "Y", "ɏ": "y",
    "Ƶ": "Z", "ƶ": "z",
    # Cyrillic folds (remove-diacritics.js cyrillicDiacritics)
    "ў": "у", "Ў": "У",
    "ё": "е", "Ё": "Е",
    "ѐ": "е", "Ѐ": "Е",
    "ґ": "г", "Ґ": "Г",
    "й": "и", "Й": "И",
    "ї": "і", "Ї": "І",
    "ќ": "к", "Ќ": "К",
    "ѓ": "г", "Ѓ": "Г",
    "ѝ": "и", "Ѝ": "И",
    # Greek folds
    "ά": "α", "Ά": "Α",
    "έ": "ε", "Έ": "Ε",
    "ή": "η", "Ή": "Η",
    "ί": "ι", "Ί": "Ι",
    "ό": "ο", "Ό": "Ο",
    "ύ": "υ", "Ύ": "Υ",
    "ώ": "ω", "Ώ": "Ω",
    "ΐ": "ι", "ΰ": "υ",
    "ϊ": "ι", "Ϊ": "Ι",
    "ϋ": "υ", "Ϋ": "Υ",
    # Arabic YEH variants → ALEF MAKSURA
    "ي": "ى", "ی": "ى",
}

_EXTRA_TRANS = str.maketrans(_EXTRA)


def remove_diacritics(s: str) -> str:
    if s.isascii():
        return s
    s = s.translate(_EXTRA_TRANS)
    decomposed = unicodedata.normalize("NFD", s)
    out = []
    for ch in decomposed:
        cat = unicodedata.category(ch)
        # strip only the U+0300–036F combining range, like the reference
        # (remove-diacritics.js final regex `(\S)([̀-ͯ]+)`) —
        # Japanese dakuten (U+3099), Hebrew niqqud etc. are preserved,
        # and BARE marks (no preceding non-space char) are left alone
        if cat == "Mn" and "̀" <= ch <= "ͯ":
            if out and not out[-1].isspace():
                continue
        # fullwidth/enclosed digits & letters → ascii via NFKC compat value
        if cat in ("Nd", "No") and not ch.isascii():
            digit = unicodedata.digit(ch, None)
            if digit is not None:
                out.append(str(digit))
                continue
        if cat in ("Lu", "Ll") and not ch.isascii():
            comp = unicodedata.normalize("NFKC", ch)
            if comp.isascii():
                out.append(comp)
                continue
        out.append(ch)
    return unicodedata.normalize("NFC", "".join(out))
