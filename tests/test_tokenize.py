"""Tokenize/normalize parity with
/root/reference/test/unit/text-processing/termops.tokenize.test.js and
termops.normalizeQuery.test.js."""

from carmen_ray.text.tokenize import (
    as_reverse,
    normalize_query,
    parse_id_query,
    tokenize,
)


def toks(q):
    return tokenize(q).tokens


def test_basic_strings():
    assert toks("foo") == ["foo"]
    assert toks("foo bar") == ["foo", "bar"]
    assert toks("foo-bar") == ["foo", "bar"]
    assert toks("foo+bar") == ["foo", "bar"]
    assert toks("foo_bar") == ["foo", "bar"]
    assert toks("foo:bar") == ["foo", "bar"]
    assert toks("foo;bar") == ["foo", "bar"]
    assert toks("foo|bar") == ["foo", "bar"]
    assert toks("foo}bar") == ["foo", "bar"]
    assert toks("foo{bar") == ["foo", "bar"]
    assert toks("foo[bar") == ["foo", "bar"]
    assert toks("foo]bar") == ["foo", "bar"]
    assert toks("foo(bar") == ["foo", "bar"]
    assert toks("foo)bar") == ["foo", "bar"]
    assert toks("foo b.a.r") == ["foo", "bar"]
    assert toks("foo's bar") == ["foos", "bar"]


def test_numeric_combination():
    assert toks("69-150") == ["69-150"]
    assert toks("4-10") == ["4-10"]
    assert toks("5-02A") == ["5-02a"]
    assert toks("23-") == ["23"]
    assert toks("## 23") == ["23"]
    assert toks("Unit 21/2-4") == ["unit", "21/2-4"]
    assert toks("7/11+Gwynne+Street") == ["7/11", "gwynne", "street"]
    assert toks("12/3a+Gordon+close") == ["12/3a", "gordon", "close"]
    assert toks("34+1/2+s+vermont+avenue+#1") == ["34", "1/2", "s", "vermont", "avenue", "1"]


def test_diacritics_preserved_at_tokenize():
    assert toks("San José") == ["san", "josé"]
    assert toks("Chamonix-Mont-Blanc") == ["chamonix", "mont", "blanc"]
    assert toks("123, route de N^") == ["123", "route", "de", "n"]
    assert toks("123, route de Nîmes") == ["123", "route", "de", "nîmes"]


def test_unicode_scripts():
    assert toks("Москва") == ["москва"]
    assert toks("Москва Русский") == ["москва", "русский"]
    assert toks("京都市") == ["京", "都", "市"]
    assert toks("++new+york++city++") == ["new", "york", "city"]
    assert toks('"new" "york" "city"') == ["new", "york", "city"]
    assert toks("new:)york:)city") == ["new", "york", "city"]


def test_empty():
    assert toks("") == []


def test_japanese_numeric():
    assert toks("中津川市馬籠4571-1") == ["中", "津", "川", "市", "馬", "籠", "4571", "1"]
    assert toks("中津川市4571-1馬籠") == ["中", "津", "川", "市", "4571", "1", "馬", "籠"]
    assert toks("中津川市4571馬籠") == ["中", "津", "川", "市", "4571", "馬", "籠"]
    assert toks("中津川市4571馬籠123") == ["中", "津", "川", "市", "4571", "馬", "籠", "123"]
    assert toks("123中津川市4571馬籠") == ["123", "中", "津", "川", "市", "4571", "馬", "籠"]


def test_emoji_excluded():
    sob = "\U0001f602"
    assert toks(" ".join([sob] * 20)) == []
    assert toks("new " + " ".join([sob] * 20) + " york") == ["new", "york"]


def test_normalize_query_strips_diacritics():
    q = normalize_query(tokenize("San José"))
    assert q.tokens == ["san", "jose"]


def test_normalize_query_caps_tokens():
    q = normalize_query(tokenize(" ".join(str(i) for i in range(30))))
    assert len(q.tokens) == 20


def test_id_query():
    assert parse_id_query("place.1234") == ("place", "1234")
    assert parse_id_query("place.id") is None
    assert parse_id_query("1234") is None


def test_as_reverse():
    assert as_reverse("-77.03,38.90") == (-77.03, 38.90)
    assert as_reverse("foo,bar") is None
    assert as_reverse("washington dc") is None


def test_normalize_query_parity():
    """termops.normalizeQuery.test.js:5-43."""
    from carmen_ray.text.tokenize import TokenizedQuery

    assert normalize_query(tokenize("New York")).tokens == ["new", "york"]
    assert normalize_query(tokenize("Ciudad Juárez")).tokens == ["ciudad", "juarez"]
    assert normalize_query(tokenize("京都市")).tokens == ["京", "都", "市"]
    assert normalize_query(tokenize("☺")).tokens == []
    assert normalize_query(tokenize("a☺b")).tokens == ["ab"]
    assert normalize_query(tokenize("a ☺ b")).tokens == ["a", "b"]
    assert normalize_query(tokenize("☺ ☺")).tokens == []

    # multi-char CJK replacement token expands with preserved owners
    q = TokenizedQuery(
        tokens=["鳥", "栖", "市", "弥", "生", "が", "丘", "八丁目", "", "", "1"],
        owner=[0, 1, 2, 3, 4, 5, 6, 7, 7, 7, 10],
        separators=[""] * 11,
    )
    r = normalize_query(q)
    assert r.tokens == ["鳥", "栖", "市", "弥", "生", "が", "丘", "八", "丁", "目", "1"]
    assert r.owner == [0, 1, 2, 3, 4, 5, 6, 7, 7, 7, 10]


def test_normalize_query_limits_parity():
    """termops.normalizeQuery.test.js:45-66 — 20-token cap and multi-word
    expansion at the cap."""
    from carmen_ray.text.tokenize import TokenizedQuery

    r = normalize_query(tokenize("a b c d e f g h i j k l m n o p q r s t"))
    assert r.tokens == list("abcdefghijklmnopqrst")
    assert r.owner == list(range(20))

    q = TokenizedQuery(
        tokens=list("abcdefghijklmnopqr") + ["s t"],
        owner=list(range(19)),
        separators=[" "] * 18 + [""],
    )
    r = normalize_query(q)
    assert r.tokens == list("abcdefghijklmnopqrst")
    assert len(r.tokens) == 20


def test_as_reverse_reference_parity():
    """termops.asReverse.test.js — exact accept/reject set."""
    assert as_reverse("40,0") == (40, 0)
    assert as_reverse("40.00000,-40.31200") == (40, -40.312)
    assert as_reverse("-120.9129102983109, 45.312312") == (-120.9129102983109, 45.312312)
    assert as_reverse("1400 15") is None
    assert as_reverse("14th 15th") is None
    assert as_reverse("9 rue Alphonse Penaud Paris, 75020 France") is None
    assert as_reverse("9 a, 10 b") is None
    assert as_reverse("9 a, 10") is None
    assert as_reverse("9,10 b") is None
    assert as_reverse("") is None
    assert as_reverse("0,0") == (0, 0)
    assert as_reverse("010,020") == (10, 20)
    assert as_reverse("1,2,3") is None


def test_id_query_reference_parity():
    """termops.id.test.js — greedy dbname match incl. dotted names."""
    assert parse_id_query("country.5432") == ("country", "5432")
    assert parse_id_query("multi.part.455233") == ("multi.part", "455233")
    assert parse_id_query("near country.5432") is None
    assert parse_id_query("country.5432 street") is None
    assert parse_id_query("country.a445") is None
    assert parse_id_query("place.32f424") is None
    assert parse_id_query("country.424k") is None


def test_remove_diacritics_reference_parity():
    """diacritics.test.js — the full pin set (Latin, Greek, Cyrillic,
    Arabic folds; Japanese/Hindi untouched; combining-mark handling)."""
    from carmen_ray.text.diacritics import remove_diacritics as rd

    assert rd("Hérê àrë søme wöřdš, including diacritics and puncatuation!") == \
        "Here are some words, including diacritics and puncatuation!"
    assert rd("Cranberries are low, creeping shrubs or vines up to 2 metres (7 ft)") == \
        "Cranberries are low, creeping shrubs or vines up to 2 metres (7 ft)"
    assert rd("堪《たま》らん！」と片息《かたいき》になつて、喚《わめ》") == \
        "堪《たま》らん！」と片息《かたいき》になつて、喚《わめ》"
    assert rd("किसी वर्ण के मूल चिह्न के ऊपर, नीचे, अलग-बगल लगने") == \
        "किसी वर्ण के मूल चिह्न के ऊपर, नीचे, अलग-बगल लगने"
    assert rd("άΆέΈήΉίΊόΌύΎ αΑεΕηΗιΙοΟυΥ") == "αΑεΕηΗιΙοΟυΥ αΑεΕηΗιΙοΟυΥ"
    assert rd("ўЎёЁѐЀґҐйЙ уУеЕеЕгГиИ") == "уУеЕеЕгГиИ уУеЕеЕгГиИ"
    assert rd("ي,ی ى") == "ى,ى ى"
    assert rd("à") == "a"
    assert rd("Москва́") == "Москва"
    assert rd("à́") == "a"
    assert rd("é̑") == "e"
    assert len(rd("̀")) > 0
