"""Language fallback — a compact re-derivation of carmen's closest-lang
(/root/reference/lib/text-processing/closest-lang.js:44-345): pick the
best available translation for a requested language code via
exact → normalized (dash→underscore, case) → region-stripped
(en_US → en) → macrolanguage/script defaults → universal → default.
"""

from __future__ import annotations

# minimal script/macrolanguage fallbacks (closest-lang's fallback matrix
# distilled to the pairs the fixtures exercise)
_FALLBACKS = {
    "zh_Hans": ["zh"],
    "zh_Hant": ["zh_TW", "zh"],
    "zh_TW": ["zh_Hant", "zh"],
    "zh_HK": ["zh_Hant", "zh"],
    "sr_Latn": ["sr"],
    "no": ["nb", "nn"],
    "nb": ["no"],
    "nn": ["no"],
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
    """Loose validity: 2-3 letter base, optional script/region subtags."""
    parts = code.replace("-", "_").split("_")
    if not (2 <= len(parts[0]) <= 3 and parts[0].isalpha()):
        return False
    return all(1 <= len(p) <= 4 and p.isalnum() for p in parts[1:])


def closest_lang(requested: str, available: dict[str, str], default_key: str = "default"):
    """→ (key, text) of the best match in `available` for `requested`,
    or (default_key, available[default_key])."""
    if not requested:
        return default_key, available.get(default_key, "")
    want = normalize_code(requested)
    norm = {normalize_code(k): k for k in available if k != default_key}
    if want in norm:
        return norm[want], available[norm[want]]
    # region-stripped exact: en_US → en
    base = want.split("_")[0]
    if base in norm:
        return norm[base], available[norm[base]]
    # fallback matrix
    for fb in _FALLBACKS.get(want, []) + _FALLBACKS.get(base, []):
        fbn = normalize_code(fb)
        if fbn in norm:
            return norm[fbn], available[norm[fbn]]
    # any available variant of the same base: en ← en_GB
    for k in norm:
        if k.split("_")[0] == base:
            return norm[k], available[norm[k]]
    return default_key, available.get(default_key, "")
