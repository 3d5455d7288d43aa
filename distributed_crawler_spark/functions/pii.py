"""PII scrubbing — email / phone / IPv4 redaction.

The reference never redacts content (it stores raw page text,
crawler_node.py extract path); any released training corpus must (the
C4 / Dolma / FineWeb curation step).  Pure native ``regexp_replace`` /
``regexp_extract_all`` expressions — JVM-side, whole-stage-codegen, no
UDFs — over patterns deliberately restricted to the regex subset that
Java's engine and RE2 (DuckDB) interpret identically: character
classes, bounded/unbounded counted repeats, ``\\b`` word boundaries; no
lookaround, no backreferences, no ``\\d``/``\\s`` shorthands inside
classes.

Scrub order is part of the contract: emails first (an email domain may
BE an IPv4: ``user@10.0.0.1``), then IPv4, then phones — each count is
taken on the text as already scrubbed by the earlier stages, so nothing
is double-counted.  The oracle replays the same three-stage sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z0-9]+"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+?[0-9][0-9()\- ]{5,}[0-9]"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def pii_scrub(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: list[str] | None = None,
) -> DataFrame:
    """(id, [keep...,] n_emails, n_ips, n_phones, scrubbed): redaction
    counts per type plus the scrubbed text.  One projection — no
    shuffle at all; at 100 TB this is a map-only pass that AQE never
    has to touch.  ``keep`` carries extra passthrough columns so a
    caller never needs a self-join to re-attach metadata it already
    had (the join form evaluated the input twice and paid a join for a
    pure map)."""
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, EMAIL_RE, EMAIL_TOKEN)
    t2 = F.regexp_replace(t1, IPV4_RE, IP_TOKEN)
    t3 = F.regexp_replace(t2, PHONE_RE, PHONE_TOKEN)
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in (keep or [])],
        F.size(F.regexp_extract_all(t0, F.lit(EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(t1, F.lit(IPV4_RE), F.lit(0))).alias("n_ips"),
        F.size(F.regexp_extract_all(t2, F.lit(PHONE_RE), F.lit(0))).alias("n_phones"),
        t3.alias("scrubbed"),
    )


def pii_scrub_sql(text_expr: str) -> dict[str, str]:
    """The same three-stage scrub as DuckDB SQL expression strings
    (RE2): {'n_emails','n_ips','n_phones','scrubbed'}."""
    t1 = f"regexp_replace({text_expr}, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g')"
    t2 = f"regexp_replace({t1}, '{IPV4_RE}', '{IP_TOKEN}', 'g')"
    t3 = f"regexp_replace({t2}, '{PHONE_RE}', '{PHONE_TOKEN}', 'g')"
    return {
        "n_emails": f"len(regexp_extract_all({text_expr}, '{EMAIL_RE}'))",
        "n_ips": f"len(regexp_extract_all({t1}, '{IPV4_RE}'))",
        "n_phones": f"len(regexp_extract_all({t2}, '{PHONE_RE}'))",
        "scrubbed": t3,
    }
