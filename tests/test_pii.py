"""PII scrubbing: detection counts, redaction order (email before IP
before phone so the loose pattern can't eat structured matches), byte
preservation outside matches."""

from minhashsketch_spark.operators.pii import pii_counts, scrub_pii


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_counts_and_redaction(spark):
    rows = [
        (1, "mail a.b+c@sub.example.org now"),
        (2, "server at 192.168.1.254 and 10.0.0.1"),
        (3, "call +44-20-7946-0958 or 1-555-123-4567"),
        (4, "no pii here, year 2026, version 1.2"),
        (5, "mixed u@x.io on 8.8.8.8 tel 1-555-000-1111"),
    ]
    got = {r["doc_id"]: r for r in pii_counts(_df(spark, rows)).collect()}
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (1, 0, 0)
    assert (got[2]["n_emails"], got[2]["n_ips"]) == (0, 2)
    assert got[3]["n_phones"] == 2
    assert not got[4]["has_pii"]
    assert (got[5]["n_emails"], got[5]["n_ips"], got[5]["n_phones"]) == (1, 1, 1)

    s = {r["doc_id"]: r["text"] for r in scrub_pii(_df(spark, rows)).collect()}
    assert s[1] == "mail <EMAIL> now"
    assert s[2] == "server at <IP> and <IP>"
    assert s[4] == rows[3][1]                     # untouched bytes
    assert s[5] == "mixed <EMAIL> on <IP> tel <PHONE>"


def test_order_prevents_cross_pattern_bites(spark):
    # the IP-like dotted quad inside an email domain must NOT count as an
    # IP, and a redacted IP must not later count as a phone
    rows = [(1, "x@1.2.3.4.example.com and 1.2.3.4")]
    got = pii_counts(_df(spark, rows)).collect()[0]
    assert got["n_emails"] == 1
    assert got["n_ips"] == 1                      # only the bare quad
    assert got["n_phones"] == 0
    s = scrub_pii(_df(spark, rows)).collect()[0]["text"]
    assert s == "<EMAIL> and <IP>"


def test_scrub_into_separate_column(spark):
    rows = [(1, "u@v.wx")]
    out = scrub_pii(_df(spark, rows), out_col="clean").collect()[0]
    assert out["text"] == "u@v.wx" and out["clean"] == "<EMAIL>"


def test_pii_report_matches_counts_plus_scrub(spark):
    """pii_report (the r6 single-pass form) must equal the composition of
    pii_counts + scrub_pii row for row — counts, flags and scrubbed text."""
    from minhashsketch_spark.operators.pii import pii_report

    rows = [
        (1, "mail a.b+c@sub.example.org now"),
        (2, "server at 192.168.1.254 and 10.0.0.1"),
        (3, "call +44-20-7946-0958 or 1-555-123-4567"),
        (4, "no pii here, year 2026, version 1.2"),
        (5, "mixed u@x.io on 8.8.8.8 tel 1-555-000-1111"),
        (6, "x@1.2.3.4.example.com and 1.2.3.4"),
    ]
    rep = {r["doc_id"]: r for r in pii_report(_df(spark, rows)).collect()}
    cnt = {r["doc_id"]: r for r in pii_counts(_df(spark, rows)).collect()}
    scr = {r["doc_id"]: r["text"] for r in scrub_pii(_df(spark, rows)).collect()}
    for i, _ in rows:
        for c in ("n_emails", "n_ips", "n_phones", "has_pii"):
            assert rep[i][c] == cnt[i][c], (i, c)
        assert rep[i]["scrubbed"] == scr[i], i
