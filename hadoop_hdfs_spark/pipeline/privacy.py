"""PII detection and redaction for LLM training-data pipelines.

The fixture corpus is synthetic word-salad with no real PII, so both engines
first overlay a DETERMINISTIC fake-PII prefix derived from ``doc_id`` (email
for every 3rd doc, phone for 2-in-5, IPv4 for every 7th — plenty of docs get
none, several get all three).  The detector and redactor then run over the
overlaid text, so the regex machinery is exercised on real matches, misses,
and multi-hit documents alike.

Everything is built-in expression work (``regexp_extract_all`` /
``regexp_replace`` / ``md5``) — zero shuffles, zero Python UDFs; at 100 TB
this is a pure map over the corpus that whole-stage codegen pipelines with
the parquet scan.  Regexes stick to ``[...]`` classes and ``{n}`` counts —
the subset Java regex (Spark) and RE2 (DuckDB) treat identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..registry import register

# -- deterministic fake-PII overlay (one source of truth per engine, same
#    arithmetic): email when doc_id%3=0, phone when doc_id%5<2, ip when
#    doc_id%7=0.

_OVERLAY_SQL = """
SELECT doc_id, lang, source,
       CASE WHEN doc_id % 3 = 0
            THEN 'mail user' || CAST(doc_id AS STRING)
                 || '@host' || CAST(doc_id % 100 AS STRING) || '.example '
            ELSE '' END
    || CASE WHEN doc_id % 5 < 2
            THEN 'call 555-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') || ' '
            ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN 'from 10.0.' || CAST(doc_id % 256 AS STRING) || '.9 '
            ELSE '' END
    || text AS text
FROM documents
"""

_RE_EMAIL = "[a-z0-9]+@[a-z0-9]+[.][a-z]+"
_RE_PHONE = "555-[0-9]{4}"
_RE_IP = "[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+"


def _overlaid(e) -> DataFrame:
    d = e["documents"]
    i = F.col("doc_id")
    email = F.when(
        i % 3 == 0,
        F.concat(
            F.lit("mail user"),
            i.cast("string"),
            F.lit("@host"),
            (i % 100).cast("string"),
            F.lit(".example "),
        ),
    ).otherwise("")
    phone = F.when(
        i % 5 < 2,
        F.concat(
            F.lit("call 555-"),
            F.lpad((i % 10000).cast("string"), 4, "0"),
            F.lit(" "),
        ),
    ).otherwise("")
    ip = F.when(
        i % 7 == 0,
        F.concat(F.lit("from 10.0."), (i % 256).cast("string"), F.lit(".9 ")),
    ).otherwise("")
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.concat(email, phone, ip, F.col("text")).alias("text"),
    )


@register(
    "p_pii_signals",
    oracle=f"""
WITH o AS ({_OVERLAY_SQL})
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_RE_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_RE_PHONE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(text, '{_RE_IP}')) AS BIGINT)    AS n_ips,
       len(regexp_extract_all(text, '{_RE_EMAIL}'))
         + len(regexp_extract_all(text, '{_RE_PHONE}'))
         + len(regexp_extract_all(text, '{_RE_IP}')) > 0            AS has_pii
FROM o
""",
    doc="PII detection signals (beyond reference — training-data curation): "
    "per-document counts of email-, phone-, and IPv4-shaped matches plus a "
    "has_pii flag, the routing signal a curation pipeline uses to divert "
    "documents to redaction. Pure regexp_extract_all expression work — no "
    "shuffle; codegen fuses it with the scan.",
)
def p_pii_signals(e) -> DataFrame:
    o = _overlaid(e)
    # staged select (r9): each PII regex scans the text ONCE — inline, the
    # has_pii sum re-ran all three extracts (6 regex passes/row)
    t1 = o.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_RE_EMAIL), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_RE_PHONE), 0))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all("text", F.lit(_RE_IP), 0))
        .cast("long")
        .alias("n_ips"),
    )
    return t1.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ips",
        ((F.col("n_emails") + F.col("n_phones") + F.col("n_ips")) > 0).alias(
            "has_pii"
        ),
    )


@register(
    "p_pii_redact",
    oracle=f"""
WITH o AS ({_OVERLAY_SQL})
SELECT doc_id,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             '{_RE_EMAIL}', '<EMAIL>', 'g'),
             '{_RE_PHONE}', '<PHONE>', 'g'),
             '{_RE_IP}', '<IP>', 'g'))                               AS redacted_md5,
       CAST(length(text)
          - length(regexp_replace(regexp_replace(regexp_replace(text,
              '{_RE_EMAIL}', '', 'g'), '{_RE_PHONE}', '', 'g'),
              '{_RE_IP}', '', 'g')) AS BIGINT)                       AS chars_redacted
FROM o
""",
    doc="PII redaction: replace email/phone/IP matches with typed "
    "placeholders (<EMAIL>/<PHONE>/<IP>), emit the digest of the redacted "
    "text plus how many characters were removed. Same fixed replace order "
    "in both engines so digests agree. Map-only; the 100 TB plan is "
    "scan -> redact -> write with no exchange.",
)
def p_pii_redact(e) -> DataFrame:
    o = _overlaid(e)

    def redact(col, repl_email, repl_phone, repl_ip):
        col = F.regexp_replace(col, _RE_EMAIL, repl_email)
        col = F.regexp_replace(col, _RE_PHONE, repl_phone)
        return F.regexp_replace(col, _RE_IP, repl_ip)

    text = F.col("text")
    return o.select(
        "doc_id",
        F.md5(redact(text, "<EMAIL>", "<PHONE>", "<IP>")).alias("redacted_md5"),
        (F.length(text) - F.length(redact(text, "", "", "")))
        .cast("long")
        .alias("chars_redacted"),
    )
