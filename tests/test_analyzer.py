"""Analyzer + stemmer + fieldnorm unit tests (SURVEY.md §2.3, §2.9)."""

from sonar_tantivy_spark.analyzer import analyze_terms, tokenize
from sonar_tantivy_spark.functions import bm25
from sonar_tantivy_spark.functions.porter2 import stem

# Golden Porter2 vectors (publicly documented Snowball English behavior).
GOLDEN = {
    "caresses": "caress", "flies": "fli", "dies": "die", "mules": "mule",
    "denied": "deni", "died": "die", "agreed": "agre", "owned": "own",
    "humbled": "humbl", "sized": "size", "meeting": "meet", "stating": "state",
    "itemization": "item", "sensational": "sensat", "traditional": "tradit",
    "reference": "refer", "colonizer": "colon", "plotted": "plot",
    "running": "run", "generously": "generous", "hopefully": "hope",
    "rational": "ration", "agreement": "agreement", "conspicuous": "conspicu",
    "skies": "sky", "sky": "sky", "dying": "die", "news": "news",
    "proceed": "proceed", "exceeding": "exceed", "knotted": "knot",
    "early": "earli", "only": "onli", "cry": "cri", "by": "by", "say": "say",
    "the": "the", "a": "a", "happy": "happi", "happiness": "happi",
    "relational": "relat", "conditional": "condit", "valency": "valenc",
    "hesitancy": "hesit", "digitizer": "digit", "conformably": "conform",
    "radically": "radic", "differently": "differ", "vileness": "vile",
    "analogously": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formality": "formal", "sensibility": "sensibl", "triplicate": "triplic",
    "formalize": "formal", "electricity": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "communism",
    "activate": "activ", "angularity": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controller": "control",
    "rolling": "roll", "stemming": "stem", "stemmed": "stem", "stems": "stem",
    "mundo": "mundo", "world": "world", "hello": "hello", "needle": "needl",
}


def test_porter2_golden():
    bad = {w: (stem(w), want) for w, want in GOLDEN.items() if stem(w) != want}
    assert not bad, bad


def test_tokenize_en_stem():
    assert tokenize("Hello world!") == [("hello", 0), ("world", 1)]
    assert tokenize("hi first tell me more") == [
        ("hi", 0), ("first", 1), ("tell", 2), ("me", 3), ("more", 4)]


def test_tokenize_unicode_and_underscore():
    # underscore is NOT alphanumeric in Rust char::is_alphanumeric
    assert analyze_terms("foo_bar", "default") == ["foo", "bar"]
    assert analyze_terms("Ünïcödé x", "default") == ["ünïcödé", "x"]


def test_long_token_dropped_with_position_gap():
    long_tok = "x" * 40
    # the dropped token leaves a position gap (tantivy RemoveLongFilter)
    assert tokenize(f"a {long_tok} b", "default") == [("a", 0), ("b", 2)]
    # 39 bytes is kept
    assert analyze_terms("y" * 39, "default") == ["y" * 39]
    # byte length, not char length: 20 two-byte chars = 40 bytes → dropped
    assert analyze_terms("é" * 20, "default") == []


def test_raw_tokenizer():
    assert tokenize("Hello World", "raw") == [("Hello World", 0)]
    assert tokenize("", "raw") == []


def test_fieldnorm_roundtrip():
    # exact below 40
    for n in range(40):
        assert bm25.decode_fieldnorm(bm25.fieldnorm_id(n)) == n
    # monotone, ~10% relative beyond
    prev = -1
    for nid in range(256):
        v = bm25.decode_fieldnorm(nid)
        assert v > prev or v == 0xFFFFFFFF  # tail clamps at u32::MAX
        prev = v
    for n in (40, 41, 67, 68, 100, 1000, 65536):
        nid = bm25.fieldnorm_id(n)
        dec = bm25.decode_fieldnorm(nid)
        assert dec <= n < bm25.decode_fieldnorm(min(nid + 1, 255)) or nid == 255
        assert (n - dec) / n < 0.15


def test_fieldnorm_expr_matches_python(spark):
    from pyspark.sql import functions as F

    df = spark.range(0, 100_000).select(
        F.col("id").alias("len"), bm25.fieldnorm_id_col(F.col("id")).alias("nid"))
    rows = df.collect()
    for r in rows:
        assert r["nid"] == bm25.fieldnorm_id(r["len"]), r


def test_snippet_html_escapes_raw_markup():
    """tantivy Snippet::to_html escapes fragments (htmlescape
    encode_minimal): raw '<b>' in stored text must never collide with
    the highlight markup, and <b> tags always balance."""
    from sonar_tantivy_spark.operators.snippet import generate_snippet

    out = generate_snippet("x <b>evil</b> & more stuff", {"more"})
    assert out == "x &lt;b&gt;evil&lt;/b&gt; &amp; <b>more</b> stuff"
    assert out.count("<b>") == out.count("</b>") == 1
