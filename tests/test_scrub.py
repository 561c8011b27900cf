"""PII scrubbing: category coverage, the pinned precedence rules, and
the map-only plan shape."""

from sonar_tantivy_spark.functions.scrub import scrub_documents


def _scrub_one(spark, text: str):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return scrub_documents(df).collect()[0]


def test_each_category_redacts(spark):
    cases = {
        "write me at jane.doe+x@example.co.uk please": ("<EMAIL>", "email"),
        "visit https://ex.com/a?b=1 now": ("<URL>", "url"),
        "or www.ex.com/path today": ("<URL>", "url"),
        "card 4111 1111 1111 1111 on file": ("<CARD>", "card"),
        "ssn 078-05-1120 leaked": ("<SSN>", "ssn"),
        "call (555) 867-5309 anytime": ("<PHONE>", "phone"),
        "call +1 555-867-5309 anytime": ("<PHONE>", "phone"),
        "host at 192.168.10.254 down": ("<IP>", "ipv4"),
    }
    for text, (token, cat) in cases.items():
        r = _scrub_one(spark, text)
        assert token in r["text"], (text, r["text"])
        assert r[f"n_pii_{cat}"] == 1, (text, r)
        assert r["n_pii_total"] == 1


def test_precedence_url_swallows_email_and_ip(spark):
    r = _scrub_one(spark, "see https://me@ex.com/x and http://10.0.0.1/y")
    assert r["n_pii_url"] == 2
    assert r["n_pii_email"] == 0 and r["n_pii_ipv4"] == 0
    assert "<URL>" in r["text"] and "@" not in r["text"]


def test_precedence_card_not_phone(spark):
    r = _scrub_one(spark, "pay 4111-1111-1111-1111 thanks")
    assert r["n_pii_card"] == 1 and r["n_pii_phone"] == 0
    assert "<CARD>" in r["text"]


def test_clean_text_untouched(spark):
    r = _scrub_one(spark, "the quick brown fox jumps at 5 pm")
    assert r["text"] == "the quick brown fox jumps at 5 pm"
    assert r["n_pii_total"] == 0


def test_plan_is_map_only(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = scrub_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
