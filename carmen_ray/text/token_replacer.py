"""Token replacement — simple / complex / global replacers.

Behavior-parity with /root/reference/lib/text-processing/token.js:
- createSimpleReplacer (:159-175): whole-word dict swap.
- createComplexReplacer (:41-146): regex rules with span/skip boundaries,
  diacritic-stripped variants, optional unambiguous inverses; sorted so
  larger transformations apply first.
- replaceToken (:185-233): anchored ('sticky') window replacement over a
  tokenized query, tracking owners and lastWord.
- enumerateTokenReplacements (:247-347): ≤8 variants, most-replaced first.
- createGlobalReplacer / replaceGlobalTokens (:386-415): raw-text regex
  pass applied before tokenization at both index and query time.
- categorizeTokenReplacements (:439-487): split geocoder_tokens config
  into the simple vs complex classes.

Rule objects are plain picklable dataclasses so a layer's replacers build
once on the driver and ship to map_batches actors via constructor args.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .diacritics import remove_diacritics
from .tokenize import TokenizedQuery

_APOSTROPHES = re.compile("[‘’ʼʻ＇'.^]")
_JS_GROUP_REF = re.compile(r"\$(\d+)")


def _escape_regex(s: str) -> str:
    return re.escape(s)


def _js_template_to_py(to: str) -> str:
    r"""JS '$1' group refs → Python '\1'."""
    return _JS_GROUP_REF.sub(r"\\\1", to)


@dataclass
class ReplaceRule:
    pattern: str               # source pattern (already escaped if literal)
    to: str                    # python-style replacement
    anchored: bool             # True → match must end at end of window ('$' sticky)
    span_boundaries: int = 0   # how many extra tokens the window spans
    reduce_relevance: bool = False
    inverse: bool = False
    from_text: str = ""        # normalized 'from' (for inverse-filtering)
    _compiled: re.Pattern | None = field(default=None, repr=False, compare=False)

    def compiled(self) -> re.Pattern:
        if self._compiled is None:
            pat = self.pattern + "$" if self.anchored else self.pattern
            self._compiled = re.compile(pat, re.IGNORECASE | re.UNICODE)
        return self._compiled


@dataclass
class SimpleReplacer:
    tokens: dict[str, str]

    def replace(self, words: list[str]) -> list[str]:
        return [self.tokens.get(w, w) for w in words]

    def replace_query(self, words: list[str]) -> tuple[list[str], bool]:
        """Query-side variant: also reports whether the FINAL word was
        replaced — a token-replaced last term only autocompletes at
        word boundaries (phrasematch.js:84-93 lastWord)."""
        out = [self.tokens.get(w, w) for w in words]
        changed_last = bool(words) and out[-1] != words[-1]
        return out, changed_last


def create_simple_replacer(tokens) -> SimpleReplacer:
    mapping: dict[str, str] = {}
    if isinstance(tokens, list):
        for t in tokens:
            mapping[t["from"].lower()] = t["to"].lower()
    else:
        for k, v in tokens.items():
            mapping[k.lower()] = v.lower()
    return SimpleReplacer(mapping)


def create_complex_replacer(tokens, include_unambiguous: bool = False,
                            include_relevance_reduction: bool = False) -> list[ReplaceRule]:
    if not isinstance(tokens, list):
        tokens = [{"from": k, "to": v} for k, v in tokens.items()]
    else:
        tokens = [dict(t) for t in tokens]

    is_inverse: set[str] = set()
    if include_unambiguous:
        tos: dict[str, list] = {}
        froms = {t["from"] for t in tokens}
        for pair in tokens:
            to = pair["to"]
            if isinstance(to, dict):
                to_text = to["text"]
                frm = dict(to)
                frm["text"] = pair["from"]
            else:
                frm = pair["from"]
                to_text = to
            tos.setdefault(to_text, []).append(frm)
        for to_text, sources in tos.items():
            if len(sources) == 1 and to_text not in froms and not re.search(r"[()$]", to_text):
                tokens.append({"from": to_text, "to": sources[0]})
                is_inverse.add(to_text)

    replacers: list[ReplaceRule] = []
    for pair in tokens:
        frm = pair["from"]
        orig_to = pair["to"]
        opts: dict = {}
        if isinstance(orig_to, dict):
            if "text" not in orig_to:
                continue
            if orig_to.get("reduceRelevance") and not include_relevance_reduction:
                continue
            opts = orig_to
            orig_to = orig_to["text"].lower()
        else:
            orig_to = orig_to.lower()

        if not opts.get("regex"):
            frm = _APOSTROPHES.sub("", frm)

        inverse = frm in is_inverse

        for u in range(2):
            if u:
                stripped = remove_diacritics(frm)
                if frm == stripped or opts.get("skipDiacriticStripping"):
                    continue
                frm = stripped.lower()

            pattern = frm if opts.get("regex") else _escape_regex(frm)
            if opts.get("skipBoundaries"):
                rule = ReplaceRule(pattern=pattern, to=_js_template_to_py(orig_to),
                                   anchored=False, span_boundaries=0)
            else:
                span = opts.get("spanBoundaries")
                if span is None:
                    span = len(frm.split()) - 1 if frm.strip() else 0
                rule = ReplaceRule(pattern=pattern, to=_js_template_to_py(orig_to),
                                   anchored=True, span_boundaries=span)
            if isinstance(pair["to"], dict) and pair["to"].get("reduceRelevance") and include_relevance_reduction:
                rule.reduce_relevance = True
            rule.inverse = inverse
            rule.from_text = frm
            replacers.append(rule)

    # big transformations first; token.js:139-143 (global/skipBoundaries
    # rules sort after anchored ones, then by replacement length)
    replacers.sort(key=lambda r: (0 if r.anchored else 1, len(r.to)))
    return replacers


def replace_token(replacements: list[ReplaceRule], query: TokenizedQuery) -> TokenizedQuery:
    """token.js:185-233."""
    ret = query.clone()
    l = len(ret.tokens)
    for i in range(l):
        for rule in replacements:
            cnt = 1 + (rule.span_boundaries if rule.anchored else 0)
            rx = rule.compiled()
            if cnt > 1 and i + cnt <= l:
                lim = i + cnt - 1
                part = ""
                for j in range(i, lim):
                    part += f"{ret.tokens[j]}{ret.separators[j]}"
                part += ret.tokens[lim]
                if rule.anchored:
                    m = rx.search(part)
                    if m:
                        replaced = part[: m.start()] + m.expand(rule.to)
                        ret.tokens[i] = replaced
                        for j in range(i + 1, i + cnt):
                            ret.tokens[j] = ""
                            ret.owner[j] = i
                        if i + cnt == l:
                            ret.last_word = True
            else:
                if rule.anchored:
                    m = rx.search(ret.tokens[i])
                    if m:
                        ret.tokens[i] = ret.tokens[i][: m.start()] + m.expand(rule.to)
                        if i + 1 == l:
                            ret.last_word = True
                else:
                    replaced = rx.sub(rule.to, ret.tokens[i])
                    if replaced != ret.tokens[i]:
                        ret.tokens[i] = replaced
    return ret


def enumerate_token_replacements(replacers: list[ReplaceRule], text: TokenizedQuery) -> list[dict]:
    """token.js:247-347 — ≤8 phrase variants, most-replaced first."""
    if len(text.tokens) == 0:
        return []
    out_limit = 8
    depth_limit = 8

    terms: list[list[dict]] = [
        [{"t": t, "l": 1, "d": 0, "reduceRelevance": False}] for t in text.tokens
    ]

    def recurse(rules: list[ReplaceRule], txt: TokenizedQuery, offset: int, changes: int | None) -> None:
        if not rules:
            return
        for k, rule in enumerate(rules):
            cnt = 1 + (rule.span_boundaries if rule.anchored else 0)
            for i in range(len(txt.tokens)):
                segment = TokenizedQuery(
                    tokens=txt.tokens[i : i + cnt],
                    separators=txt.separators[i : i + cnt],
                    owner=list(range(len(txt.tokens[i : i + cnt]))),
                )
                altered = replace_token([rule], segment)
                if altered.tokens and altered.tokens[0] != txt.tokens[i]:
                    if rule.inverse:
                        new_changes = -1 if changes is None else changes - 1
                    else:
                        new_changes = 1 if changes is None else changes + 1
                    terms[i + offset].append({
                        "t": altered.tokens[0],
                        "l": cnt,
                        "d": new_changes,
                        "reduceRelevance": rule.reduce_relevance,
                    })
                    if len(terms[i + offset]) < depth_limit:
                        remaining = [v for v in rules[k + 1 :] if rule.to != v.from_text]
                        recurse(remaining, altered, i, new_changes)

    recurse(replacers, text, 0, None)

    for lst in terms:
        lst.sort(key=lambda v: (-v["d"], len(v["t"])))

    out: list[dict] = []

    def assemble(i: int, prefix: str | None, reduce_rel: bool) -> None:
        for entry in terms[i]:
            if len(out) >= out_limit:
                break
            r = True if entry["reduceRelevance"] else reduce_rel
            s = f"{prefix} {entry['t']}" if prefix else entry["t"]
            nxt = i + entry["l"]
            if nxt < len(terms):
                assemble(nxt, s, r)
            else:
                out.append({"phrase": s, "reduceRelevance": r})

    assemble(0, None, False)
    return out


@dataclass
class GlobalRule:
    pattern: str
    to: str
    _compiled: re.Pattern | None = field(default=None, repr=False, compare=False)

    def compiled(self) -> re.Pattern:
        if self._compiled is None:
            self._compiled = re.compile(self.pattern, re.IGNORECASE | re.UNICODE)
        return self._compiled


def create_global_replacer(tokens: dict[str, str]) -> list[GlobalRule]:
    return [GlobalRule(pattern=frm, to=_js_template_to_py(to)) for frm, to in tokens.items()]


def replace_global_tokens(replacers: list[GlobalRule], text: str) -> str:
    for r in replacers:
        text = r.compiled().sub(r.to, text)
    return text


def _simplify(s: str) -> str:
    return remove_diacritics(_APOSTROPHES.sub("", s.lower()))


def categorize_token_replacements(geocoder_tokens) -> dict[str, list]:
    """token.js:439-487."""
    word_replacements: dict[str, list] = {"simple": [], "complex": []}
    if geocoder_tokens is None:
        return word_replacements
    inner_word_boundary = re.compile(r"[^-\s][-\s][^-\s]", re.IGNORECASE | re.UNICODE)
    for frm, orig_to in geocoder_tokens.items():
        opts: dict = {}
        to = orig_to
        if isinstance(orig_to, dict) and isinstance(orig_to.get("text"), str):
            opts = orig_to
            to = orig_to["text"]
        complex_rule = bool(
            opts.get("spanBoundaries")
            or opts.get("skipBoundaries")
            or opts.get("skipDiacriticStripping")
            or opts.get("regex")
            or (isinstance(orig_to, str) and (
                re.search(r"\$(\d+|{\w+})", to)
                or inner_word_boundary.search(frm)
                or inner_word_boundary.search(to)
            ))
        )
        if complex_rule:
            word_replacements["complex"].append({"from": frm, "to": orig_to})
        else:
            simple_to = _simplify(to)
            simple_from = _simplify(frm)
            if simple_to != simple_from:
                word_replacements["simple"].append({"from": simple_from, "to": simple_to})
    return word_replacements
