"""PII scrub unit cases: overlap ordering (email domains that are IPs),
sequential-count no-double-counting, and Python-re cross-checks of the
shared regex subset."""

from __future__ import annotations

import re

from distributed_crawler_spark.functions import pii


def _scrub_py(text: str):
    """Independent Python-re replay of the documented 3-stage contract."""
    t1, n_e = re.subn(pii.EMAIL_RE, pii.EMAIL_TOKEN, text)
    t2, n_i = re.subn(pii.IPV4_RE, pii.IP_TOKEN, t1)
    t3, n_p = re.subn(pii.PHONE_RE, pii.PHONE_TOKEN, t2)
    return {"n_emails": n_e, "n_ips": n_i, "n_phones": n_p, "scrubbed": t3}


CASES = [
    "plain text with no pii at all",
    "reach me at alice.smith+tag@example.co or bob@x.io thanks",
    "server 10.0.0.1 and 192.168.255.12 pinged",
    "call +1 (555) 123-4567 now",
    "weird email user@10.0.0.1 has an ip domain",  # email wins (stage order)
    "ip 1.2.3.4 then email c@d.com then phone 555-123-4567",
    "trailing dot 8.8.8.8. end",
    "a@b.cd",
]


def test_spark_matches_python_re(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r.asDict() for r in pii.pii_scrub(df).collect()}
    for i, t in enumerate(CASES):
        exp = _scrub_py(t)
        got = rows[i]
        for k in ("n_emails", "n_ips", "n_phones", "scrubbed"):
            assert got[k] == exp[k], (t, k, got[k], exp[k])


def test_email_with_ip_domain_counts_once(spark):
    df = spark.createDataFrame(
        [(0, "user@10.0.0.1 plus bare 10.0.0.2")], "doc_id long, text string"
    )
    r = pii.pii_scrub(df).collect()[0]
    # the whole email (including its IP-shaped domain) is ONE email;
    # only the bare address is an IP hit
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 1, 0)
    assert r["scrubbed"] == f"{pii.EMAIL_TOKEN} plus bare {pii.IP_TOKEN}"


def test_duckdb_sql_matches_python_re():
    import duckdb

    exprs = pii.pii_scrub_sql("t.text")
    con = duckdb.connect()
    for t in CASES:
        row = con.execute(
            f"SELECT {exprs['n_emails']}, {exprs['n_ips']}, "
            f"{exprs['n_phones']}, {exprs['scrubbed']} "
            "FROM (SELECT ? AS text) t",
            [t],
        ).fetchone()
        exp = _scrub_py(t)
        assert row == (
            exp["n_emails"], exp["n_ips"], exp["n_phones"], exp["scrubbed"]
        ), (t, row, exp)
