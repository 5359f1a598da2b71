"""Language fallback — re-derivation of carmen's closest-lang
(/root/reference/lib/text-processing/closest-lang.js:44-345).

Resolution order for `closest_lang_label(target, candidates)` follows
closestLangLabel (closest-lang.js:181-245):
  1. exact match
  2. case-insensitive exact match
  3. fallback table of the full code (fallback-display.json, reproduced
     below as data with the reference's values)
  4. language-only match (en_US → en); digraphic languages (sr) are
     skipped in strict languageMode
  5. language-only fallback (skipped for digraphic in strict mode)
  6. 'universal'
  7. scored heuristics (closest-lang.js:131-178): language match 100,
     script match 50 (25 for Latn), familiarity bonuses, shorter-code
     tie-break; a winner needs ≥50.

Script inference replaces model-un's suppress-script data with a
distilled map for the scripts carmen's fixtures exercise; explicit
4-letter script subtags in the code always win.
"""

from __future__ import annotations

# fallback-display.json verbatim (data, not code — cited above)
FALLBACK_DISPLAY: dict[str, list[str] | None] = {
    "ar": ["en"], "az": ["tr", "en"], "ba": ["sr"],
    "bg": ["mk", "sr", "ru", "en"], "bn": ["en"], "bs": ["hr", "sr", "ru"],
    "ca": ["es", "pt", "en"], "cs": ["sk", "it", "pt", "en"],
    "da": ["no", "nb", "sv", "nl", "en"], "de": ["sk", "ro", "nl", "en"],
    "el": ["en", "de", "fr", "it"], "en": ["es", "fr", "de"],
    "es": ["pt", "fr", "nl", "en"], "et": ["fi", "en"], "fa": ["az"],
    "fi": ["sv", "nb", "nl", "en"], "fr": ["nl", "ro", "it", "sk", "pt", "en"],
    "gu": ["hi", "kn", "en"], "he": ["en"], "hi": ["gu", "kn", "en"],
    "hr": ["bs", "sr_Latn", "it", "es", "en"], "hu": ["ro", "en", "de"],
    "id": ["ms", "vi", "sk", "ro", "en"], "in": ["en"], "is": ["en"],
    "it": ["ro", "fr", "en"], "ja": None, "ka": ["ru", "en"], "kk": ["ru"],
    "kn": ["en"], "ko": None, "lt": ["lv", "en"], "lv": ["lt", "en"],
    "mk": ["bg", "ru"], "mn": ["ru"], "ms": ["en", "id", "vi"],
    "nb": ["no", "da", "sv", "nl"], "nl": ["fr", "en"], "no": ["nb", "da"],
    "pl": ["sk", "nl", "ro", "en", "hu"], "pt": ["es", "it"], "ro": ["en"],
    "ru": ["kk"], "si": ["en"], "sk": ["cs", "en"], "sl": ["en"],
    "sq": ["en"], "sr": ["bs", "hr", "ru"],
    "sr_Cyrl": ["sr", "ru", "sr_Latn", "bs", "hr"], "sr_Latn": ["hr", "bs"],
    "sr_BA": ["sr_Latn", "hr", "bs"], "sr_CS": ["sr_Latn", "hr", "bs"],
    "sr_ME": ["sr_Latn", "hr", "bs"], "sr_RS": ["sr_Latn", "hr", "bs"],
    "sv": ["en"], "ta": ["en"], "te": ["en"], "tg": ["ru"], "th": ["en"],
    "tl": ["en"], "tr": ["pt", "de", "fr", "en"], "uk": ["ru"], "ur": ["en"],
    "uz": ["ru"], "vi": ["ms", "fr", "en"],
    "zh": ["zh_Hans", "zh_Hant"], "zh_CN": ["zh_Hans", "zh", "zh_Hant"],
    "zh_Hans": ["zh", "zh_Hant"], "zh_Hant": ["zh", "zh_Hans"],
    "zh_HK": ["zh_TW", "zh_Hant", "zh", "zh_Hans"],
    "zh_TW": ["zh_Hant", "zh", "zh_Hans"],
}
# case-insensitive lookups like the reference (closest-lang.js:30-32)
for _k in list(FALLBACK_DISPLAY):
    FALLBACK_DISPLAY.setdefault(_k.lower(), FALLBACK_DISPLAY[_k])

# suppress-script defaults (model-un data distilled): the script a bare
# language code implies
SUPPRESS_SCRIPT = {
    "en": "Latn", "fr": "Latn", "de": "Latn", "es": "Latn", "pt": "Latn",
    "it": "Latn", "nl": "Latn", "sv": "Latn", "no": "Latn", "nb": "Latn",
    "nn": "Latn", "da": "Latn", "fi": "Latn", "is": "Latn", "pl": "Latn",
    "cs": "Latn", "sk": "Latn", "hu": "Latn", "ro": "Latn", "tr": "Latn",
    "az": "Latn", "id": "Latn", "ms": "Latn", "vi": "Latn", "tl": "Latn",
    "hr": "Latn", "bs": "Latn", "sq": "Latn", "et": "Latn", "lt": "Latn",
    "lv": "Latn", "sl": "Latn", "ca": "Latn", "iu": "Cans",
    "ru": "Cyrl", "uk": "Cyrl", "bg": "Cyrl", "mk": "Cyrl", "kk": "Cyrl",
    "ba": "Cyrl", "mn": "Cyrl", "tg": "Cyrl", "ka": "Geor", "uz": "Cyrl",
    "ar": "Arab", "fa": "Arab", "ur": "Arab", "he": "Hebr",
    "hi": "Deva", "gu": "Gujr", "kn": "Knda", "ta": "Taml", "te": "Telu",
    "bn": "Beng", "si": "Sinh", "th": "Thai", "el": "Grek",
    "ja": "Jpan", "ko": "Kore", "zh": "Hans",
}
LANGUAGE_BONUSES = {"ru": 2, "en": 2, "ar": 2, "hi": 2}
SCRIPT_BONUSES = {"Hans": 1, "Latn": 1}
DIGRAPHIC = ("sr",)

# equivalent-languages.json verbatim (data): languages close enough to
# pass the languageMode=strict filter for each other
# (filter-sources.js:137-139 equivalentLanguages)
EQUIVALENT = {
    "hr": ["bs", "sr"],
    "bs": ["hr", "sr"],
    "sr_Latn": ["bs", "hr"],
}


def normalize_code(code: str) -> str:
    parts = code.replace("-", "_").split("_")
    out = parts[0].lower()
    for p in parts[1:]:
        if len(p) == 4:
            out += "_" + p.title()
        else:
            out += "_" + p.upper()
    return out


def has_language(code: str) -> bool:
    """Loose validity: 2-3 letter base; extra subtags just need to be
    non-empty alnum — the reference's hasLanguage only requires the
    LANGUAGE component to parse ('bg-nonexistent' is valid and falls
    back, closest-lang.js:72-81; the language-flag acceptance)."""
    if code == "universal":
        return True
    parts = code.replace("-", "_").split("_")
    if not (2 <= len(parts[0]) <= 3 and parts[0].isalpha()):
        return False
    return all(p.isalnum() for p in parts[1:])


def _script_of(code: str) -> str | None:
    """Explicit 4-letter script subtag, else the suppress-script default."""
    parts = code.replace("-", "_").split("_")
    for p in parts[1:]:
        if len(p) == 4 and p.isalpha():
            return p.title()
    return SUPPRESS_SCRIPT.get(parts[0].lower())


def _score_candidates(target: str, cands: list[str]) -> list[tuple[float, str]]:
    """closest-lang.js:131-178 getScoredCandidates."""
    t_lang = target.replace("-", "_").split("_")[0].lower()
    t_script = _script_of(target)
    scored = []
    for c in cands:
        parts = c.replace("-", "_").split("_")
        c_lang = parts[0].lower()
        c_script = _script_of(c)
        score = 0.0
        if c_lang and c_lang == t_lang:
            score += 100
        if c_script and c_script == t_script:
            score += 25 if c_script == "Latn" else 50
        score += LANGUAGE_BONUSES.get(c_lang, 0)
        score += SCRIPT_BONUSES.get(c_script, 0) if c_script else 0
        if len(parts) > 1:
            score -= 0.5 * (len(parts) - 1)
        scored.append((score, c))
    scored.sort(key=lambda t: -t[0])
    return scored


def closest_lang_label(target: str, candidates: list[str],
                       language_mode: str | None = None) -> str | None:
    """closestLangLabel (closest-lang.js:181-245) over candidate codes."""
    target = target.replace("-", "_")
    primary = target.split("_")[0].lower()
    cand_set = set(candidates)

    if target in cand_set:
        return target
    for c in candidates:
        if c.lower() == target.lower():
            return c
    fb = FALLBACK_DISPLAY.get(target.lower())
    if fb:
        for f in fb:
            if f in cand_set:
                return f
    for c in candidates:
        if c.lower() == primary:
            if language_mode == "strict" and primary in DIGRAPHIC:
                continue
            return c
    fb = None
    if not (language_mode == "strict" or primary in DIGRAPHIC):
        fb = FALLBACK_DISPLAY.get(primary)
    if fb:
        for f in fb:
            if f in cand_set:
                return f
    if "universal" in cand_set:
        return "universal"
    scored = _score_candidates(target, candidates)
    if not scored:
        return None
    score, winner = scored[0]
    # the strict-mode digraphic rejection matches on the FULL code
    # (closest-lang.js:242: digraphic.indexOf(winner.code))
    if score < 50 or (language_mode == "strict" and winner in DIGRAPHIC):
        return None
    return winner


def get_language_code(code: str | None) -> str | None:
    """Language component of a code; 'universal' passes through
    (closest-lang.js:306-310 getLanguageCode)."""
    if code is None:
        return None
    if code == "universal":
        return "universal"
    if not has_language(code):
        return None
    return code.replace("-", "_").split("_")[0].lower()


def equivalent_languages(a: str, b: str) -> bool:
    """filter-sources.js:137-139."""
    return b in EQUIVALENT.get(a, ())


def feature_matches_language(available: dict[str, str], language: str | None,
                             language_mode: str | None,
                             default_key: str = "default") -> bool:
    """languageMode=strict feature filter
    (filter-sources.js:119-128 featureMatchesLanguage): resolve the
    closest language label among the feature's translations, then
    require its language code to equal the requested one, be
    'universal', or be listed as equivalent."""
    if not language:
        return True
    if language_mode != "strict":
        return True
    cands = [k for k in available if k != default_key and available[k]]
    label = closest_lang_label(language.replace("-", "_"), cands,
                               language_mode)
    a = get_language_code(label)
    b = get_language_code(language)
    return bool(a and b and (a == "universal" or a == b
                             or (label is not None
                                 and equivalent_languages(label, b))))


def closest_lang(requested: str, available: dict[str, str],
                 default_key: str = "default",
                 language_mode: str | None = None):
    """→ (key, text) of the best match in `available` for `requested`,
    or (default_key, available[default_key])."""
    if not requested:
        return default_key, available.get(default_key, "")
    # null/empty translations are invisible (closest-lang.js:198)
    cands = [k for k in available if k != default_key and available[k]]
    label = closest_lang_label(requested, cands, language_mode)
    if label is not None and label in available:
        return label, available[label]
    return default_key, available.get(default_key, "")
