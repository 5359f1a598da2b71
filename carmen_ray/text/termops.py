"""Indexing-side term operations.

Behavior-parity with /root/reference/lib/text-processing/termops.js:
house-number "waffling" (numTokenV3, :950-958), semi-number parsing
(:613-622), address detection (:276-291), housenum ranges (:300-363),
permutations (:639-704), indexable phrases (:743-780), IDF-ish weights
(:798-837), 3-bit log-scale score encode/decode (:966-987), query-side
numTokenize / numTokenizePrefix (:847-862, :917-943).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from ..util.hashing import phrase_hash
from ..util.jsmath import fround, js_round
from ..util.permute import all_masks, continuous_masks
from .tokenize import TokenizedQuery, normalize_text

_ADDRESS_PATTERNS = [
    re.compile(r"^\d+[a-z]?$"),                      # 10 or 10a
    re.compile(r"^(\d+)-(\d+)[a-z]?$"),              # 10-19
    re.compile(r"^(\d+)([nsew])(\d+)[a-z]?$"),       # 6N23 (Kane County, IL)
    re.compile(r"^([nesw])(\d+)([nesw]\d+)?$"),      # W350N5337 (Waukesha, WI)
    re.compile(r"^\d+(к\d+)?(с\d+)?$"),              # Russian korpus/stroenie
]
_CYRILLIC_KC = re.compile(r"[ск]")
_NON_DIGIT = re.compile(r"[^\d]")
_HASH = re.compile("#")


def address(token: str) -> str | None:
    """termops.js:276-291 — return the token if it looks like a housenumber."""
    if not isinstance(token, str):
        return None
    for pat in _ADDRESS_PATTERNS:
        if pat.match(token):
            return token
    return None


def parse_semi_number(token: str) -> int | None:
    """termops.js:613-622 — pull the number out of '9th', '10a', '4к2'."""
    if token is None:
        return None
    if _CYRILLIC_KC.search(token):
        m = re.match(r"^\s*(\d+)", token)
        return int(m.group(1)) if m else None
    digits = _NON_DIGIT.sub("", token)
    return int(digits) if digits else None


def num_token_v3(s: str) -> str:
    """termops.js:950-958 — waffle: '1'→'#', '12'→'##', '123'→'1##', '1234'→'12##'."""
    n = len(s)
    if n == 0:
        return ""
    if n == 1:
        return "#"
    if n == 2:
        return "##"
    lead = 1 if n == 3 else 2
    return s[:lead] + "#" * (n - lead)


def get_housenum_range(addressnumbers=None, range_props=None) -> list[str] | None:
    """termops.js:300-363 — unique waffled tokens for a doc's housenumbers.

    addressnumbers: list[list[str|int]|None] (carmen:addressnumber form)
    range_props: iterable of (lfrom, lto) / (rfrom, rto) parallel string
    lists per geometry member (carmen:lfromhn etc.), flattened by caller
    to [(a_list, b_list), ...].
    """
    used: dict[str, bool] = {}
    ranges: list[str] = []

    def add(tok: str) -> None:
        if tok not in used:
            used[tok] = True
            ranges.append(tok)

    if addressnumbers:
        for member in addressnumbers:
            if not member:
                continue
            for num in member:
                val = parse_semi_number(str(num))
                if val is None:
                    continue
                add(num_token_v3(str(val)))

    if range_props:
        for a_list, b_list in range_props:
            if not a_list or not b_list:
                continue
            for a, b in zip(a_list, b_list):
                va = parse_semi_number(str(a))
                vb = parse_semi_number(str(b))
                if va is None or vb is None:
                    continue
                lo, hi = min(va, vb), max(va, vb)
                add(num_token_v3(str(hi)))
                val = lo
                while val < hi:
                    add(num_token_v3(str(val)))
                    val += 10 if val < 10 else 100

    ranges.sort()
    return ranges if ranges else None


@dataclass
class Permutation:
    tokens: list[str]
    mask: int
    ender: bool
    relev: float = 0.0
    address: dict | None = None

    def joined(self) -> str:
        return " ".join(self.tokens)


def permutations(
    terms: list[str],
    weights: list[float] | None = None,
    all_perms: bool = False,
    frequent_words: set[str] | None = None,
    reduce_relevance: bool = False,
    address_position: int | None = None,
    address_number: str | None = None,
) -> list[Permutation]:
    """termops.js:639-704."""
    min_relevance = 0.8
    length = len(terms)
    masks = all_masks(length) if (all_perms and length <= 8) else continuous_masks(length)

    out: list[Permutation] = []
    for mask in masks:
        word_dropped = False
        perm_tokens: list[str] = []
        addr = None
        relev = 0.0
        for j in range(length):
            if not (mask & (1 << j)):
                if frequent_words and terms[j] in frequent_words:
                    word_dropped = True
                continue
            perm_tokens.append(terms[j])
            if address_position is not None and j == address_position:
                addr = {"position": address_position, "number": address_number, "numberOrder": "first"}
            if weights:
                relev += weights[j] if j < len(weights) else 0.0

        perm = Permutation(
            tokens=perm_tokens,
            mask=mask,
            ender=bool(mask & (1 << (length - 1))),
            address=addr,
        )
        if weights:
            if reduce_relevance and len(perm_tokens) == length:
                perm.relev = min_relevance
            elif word_dropped and len(perm_tokens) == length - 1:
                perm.relev = max(min_relevance, js_round(relev * 5) / 5)
            else:
                perm.relev = js_round(relev * 5) / 5

        # Trailing numToken swaps to the front (index only leading-numtoken form)
        if perm.address is not None:
            if len(perm.tokens) > 1:
                if "#" in perm.tokens[-1]:
                    perm.tokens.insert(0, perm.tokens.pop())
                    perm.ender = False
                    perm.address["numberOrder"] = "last"
            else:
                perm.address["numberOrder"] = None

        out.append(perm)
    return out


def get_weights(tokens: list[str], freq: dict[str, int], total: int | None = None) -> list[float]:
    """termops.js:798-837 — log-IDF weights normalized to sum 1 (or 0.8 with
    a pinned 0.2 numToken)."""
    total_freq = total if total is not None else freq.get("__COUNT__", 1)
    if not total_freq:
        total_freq = 1
    weights: list[float] = [0.0] * len(tokens)
    weight_sum = 0.0
    has_num = False
    for i in range(len(tokens) - 1, -1, -1):
        if _HASH.search(tokens[i]):
            has_num = True
            weights[i] = -1.0
        else:
            term_freq = freq.get(tokens[i], 1) or 1
            weights[i] = math.log(1 + total_freq / term_freq)
            weight_sum += weights[i]
    if has_num:
        for i in range(len(weights)):
            weights[i] = 0.2 if weights[i] == -1.0 else (weights[i] / weight_sum) * 0.8
    else:
        for i in range(len(weights)):
            weights[i] = weights[i] / weight_sum
    return weights


@dataclass
class IndexablePhrase:
    relev: float
    phrase: str
    hash: int


def get_indexable_phrases(
    tokens: list[str],
    freq: dict[str, int],
    frequent_words: set[str] | None = None,
    text_hash: int | None = None,
    reduce_relevance: bool = False,
) -> list[IndexablePhrase]:
    """termops.js:743-780 — all ≥0.8-relev permutations, best-relev dedupe."""
    if text_hash is None:
        text_hash = phrase_hash(" ".join(tokens))
    if tokens and tokens[0] == "+intersection":
        return [IndexablePhrase(1.0, normalize_text(" ".join(tokens)), text_hash)]

    perms = permutations(tokens, get_weights(tokens, freq), all_perms=True,
                         frequent_words=frequent_words, reduce_relevance=reduce_relevance)
    perms.sort(key=lambda p: -p.relev)

    uniq: set[str] = set()
    phrases: list[IndexablePhrase] = []
    for perm in perms:
        if perm.relev < 0.8:
            break
        etext = normalize_text(perm.joined())
        if etext in uniq:
            continue
        uniq.add(etext)
        phrases.append(IndexablePhrase(perm.relev, etext, text_hash))
    return phrases


def num_tokenize(tokens: list[str]) -> list[tuple[list[str], dict]]:
    """termops.js:847-862 — query variants with each numeric token waffled."""
    out = []
    for i, tok in enumerate(tokens):
        num = parse_semi_number(address(tok)) if address(tok) else None
        if num is not None:
            replaced = list(tokens)
            replaced[i] = num_token_v3(str(num))
            out.append((replaced, {"number": tok, "position": i}))
    return out


def num_tokenize_prefix(tokens: list[str]) -> list[list[str]]:
    """termops.js:917-943 — single-number prefix waffle variants."""
    out: list[list[str]] = []
    if len(tokens) != 1:
        return out
    tok = tokens[0]
    if address(tok) is None:
        return out
    num = parse_semi_number(tok)
    if num is None:
        return out
    str_num = str(num)
    variants: list[str] = []
    seen = set()
    for suffix in ("", "0", "00"):
        waffled = num_token_v3(str_num + suffix)[: len(str_num)]
        if waffled not in seen:
            seen.add(waffled)
            variants.append(waffled)
    for v in variants:
        if v != tok:
            out.append([v])
    return out


def encode_3bit_log(num: float, maxval: float) -> int:
    """termops.js:966-970 — JS float32 semantics preserved via fround."""
    if not num or num <= 0 or not maxval:
        return 0
    if num == 1:
        return 1
    return math.ceil(7 * fround(math.log(num)) / fround(math.log(maxval)))


def decode_3bit_log(num: int, maxval: float, do_round: bool = False) -> float:
    if not num or not maxval:
        return 0.0
    v = maxval ** (num / 7)
    return js_round(v) if do_round else v


def get_intersection_text(intersections: list[list[str] | None] | None) -> list[str]:
    """termops.js:994-1009."""
    out: list[str] = []
    if intersections:
        for member in intersections:
            if not member:
                continue
            for key in member:
                out.append("+intersection " + key + " , ")
    return out
