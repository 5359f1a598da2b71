"""Tokenization + query normalization.

Behavior-parity with /root/reference/lib/text-processing/termops.js:
- tokenize    (termops.js:194-268): lowercase, collapse apostrophes /
  periods / caret, split on Unicode separator classes, merge `1-2` / `1/2`
  house-number forms, split CJK Unified Ideographs per character, keep
  the separator and owner arrays.
- normalize_query (termops.js:72-125): emoji/diacritic strip, drop empty
  tokens, expand multi-word replacement tokens, cap at 20 tokens.

Pure functions over Python strings; the Ray stage wraps them in a
vectorized map_batches (see carmen_ray.index.build / geocode pipelines).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace

from ..constants import MAX_QUERY_TOKENS
from .diacritics import remove_diacritics

# termops.js:158-185 WORD_SEPARATOR
WORD_SEPARATOR = (
    r"\s"
    " -⁯"
    "⸀-⹿"
    "!-/"
    ":-@"
    "[-`"
    "{-~"
    "！-／"
    "：-＠"
    "［-｀"
    "｛-･"
)

_APOSTROPHES = re.compile("[‘’ʼʻ＇'.^]")
_LEADING_SEP = re.compile(f"^[{WORD_SEPARATOR}]+")
_SPLIT = re.compile(f"([^{WORD_SEPARATOR}]+)([{WORD_SEPARATOR}]+|$)")
_CJK = re.compile("([一-鿿])")
_NUM_COMBINED = re.compile(r"^(\d+)(-|/)(\d+)((-|/)(\d+))?[a-z]?$")
_EMOJI = re.compile(
    "([#0-9]⃣)|[©®‼⁇-⁉™ℹ〰〽㊗㊙][︀-﻿]?"
    "|[←-⇿][︀-﻿]?|[⌀-⏿][︀-﻿]?|[①-⓿][︀-﻿]?"
    "|[■-◿][︀-﻿]?|[☀-➿][︀-﻿]?|[⤀-⥿][︀-﻿]?"
    "|[⬀-⯰][︀-﻿]?|[\U0001f000-\U0001ffff][︀-﻿]?"
)
_WS = re.compile(r"\s+")
_ID_PATTERN = re.compile(r"^(\S+)\.([0-9]+)$")


@dataclass
class TokenizedQuery:
    tokens: list[str] = field(default_factory=list)
    separators: list[str] = field(default_factory=list)
    owner: list[int] = field(default_factory=list)
    last_word: bool = False

    def clone(self) -> "TokenizedQuery":
        return replace(self, tokens=list(self.tokens), separators=list(self.separators), owner=list(self.owner))


def remove_emoji(s: str) -> str:
    return _EMOJI.sub("", s)


def normalize_text(s: str) -> str:
    """termops.js:123-125 — emoji+diacritics strip, whitespace collapse."""
    return _WS.sub(" ", remove_emoji(remove_diacritics(s)).strip())


def tokenize(query: str) -> TokenizedQuery:
    tokens: list[str] = []
    separators: list[str] = []

    normalized = _APOSTROPHES.sub("", query.lower())
    normalized = _LEADING_SEP.sub("", normalized)

    tail: tuple[str, str] | None = None
    for part in _SPLIT.finditer(normalized):
        t, s = part.group(1), part.group(2)

        if tail is not None:
            if tail[1] in ("-", "/"):
                combined = f"{tail[0]}{tail[1]}{t}"
                if _NUM_COMBINED.match(combined):
                    t = combined
                else:
                    tokens.append(tail[0])
                    separators.append(tail[1])
            else:
                tokens.append(tail[0])
                separators.append(tail[1])
        tail = None

        if len(t) == 0 or len(remove_emoji(t)) == 0:
            continue

        subtokens = _CJK.split(t)
        if len(subtokens) > 1:
            for sub in subtokens:
                if sub:
                    tokens.append(sub)
                    separators.append("")
            continue

        if s in ("-", "/"):
            tail = (t, s)
        else:
            tokens.append(t)
            separators.append(s)

    if tail is not None:
        tokens.append(tail[0])
        separators.append(tail[1])

    return TokenizedQuery(tokens=tokens, separators=separators, owner=list(range(len(tokens))))


def normalize_query(query: TokenizedQuery) -> TokenizedQuery:
    """termops.js:72-115."""
    out = TokenizedQuery(last_word=query.last_word)
    for i, tok in enumerate(query.tokens):
        if len(tok) == 0:
            continue
        if len(out.tokens) == MAX_QUERY_TOKENS:
            break
        if " " in tok:
            words = tok.split(" ")
            if len(out.tokens) + len(words) <= MAX_QUERY_TOKENS:
                for w in words:
                    norm = normalize_text(w)
                    if not norm:
                        continue  # emoji-only word (termops drops empties)
                    out.tokens.append(norm)
                    out.owner.append(query.owner[i])
                    out.separators.append(" ")
                continue
        words = _CJK.split(tok)
        if len(words) > 1 and len(out.tokens) + len(words) <= MAX_QUERY_TOKENS:
            for w in words:
                norm = normalize_text(w) if w else ""
                if norm:
                    out.tokens.append(norm)
                    out.owner.append(query.owner[i])
                    out.separators.append("")
            continue
        norm = normalize_text(tok)
        if not norm:
            # a mixed CJK+emoji token can normalize to nothing — carmen
            # filters empty terms after normalization (termops.js:72-115;
            # the emoji acceptance's 'Anarres 南🗾' stack)
            continue
        out.tokens.append(norm)
        out.separators.append(query.separators[i])
        out.owner.append(query.owner[i])
    return out


def parse_id_query(query: str) -> tuple[str, str] | None:
    """`place.1234` → (type, id) — termops.js:42-53."""
    m = _ID_PATTERN.match(query)
    if not m:
        return None
    return m.group(1), m.group(2)


def as_reverse(query: str) -> tuple[float, float] | None:
    """`lon,lat` detection — termops.js:145-155."""
    parts = query.split(",", 2)
    if len(parts) == 2:
        try:
            lon = float(parts[0].strip())
            lat = float(parts[1].strip())
            return lon, lat
        except ValueError:
            return None
    return None
