"""Privacy / PII handling operators for training-data pipelines.

Beyond-reference surface (driver contract): corpora destined for
model training routinely pass through a pseudonymization +
k-anonymity generalization step before leaving the trust boundary.
The reference has no privacy handling; this module provides the
standard shape over the TPC-H-ish fixtures:

- direct identifiers are replaced by a keyed one-way digest
  (``md5`` here — any hex digest built-in slots in),
- quasi-identifiers are GENERALIZED up a hierarchy (nation → region,
  exact balance → fixed-width bucket),
- every row is annotated with its quasi-identifier group size so
  downstream can suppress groups smaller than k (Sweeney 2002,
  "k-anonymity: a model for protecting privacy").

Everything is built-in column expressions + two broadcast dim joins +
one window count, so the operator is a single hash-partitioned pass
at any scale: the shuffle keys are the (already generalized, low
cardinality) quasi-identifiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pseudonymize_customers(
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    k: int = 5,
    bucket_width: int = 1000,
    salt: str | None = None,
) -> DataFrame:
    """Pseudonymize + generalize the customer table and audit
    k-anonymity over the generalized quasi-identifiers
    (region, market segment, balance bucket).

    Threat-model honesty (self-review r12): ``c_custkey`` is retained
    IN THE CLEAR by design — it is the linkage key internal analytics
    joins on, so this output must stay INSIDE the trust boundary. The
    name digest is unkeyed md5; for data leaving the boundary pass
    ``salt`` (a secret) so the digest is not enumerable from the key
    space, and drop ``c_custkey`` downstream."""
    gen = (
        customer.join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            customer["c_nationkey"] == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            F.col("c_custkey"),
            F.md5(
                F.concat(F.lit(salt), F.col("c_name"))
                if salt is not None
                else F.col("c_name")
            ).alias("name_pseudo"),
            F.col("r_name").alias("region"),
            F.col("c_mktsegment").alias("segment"),
            (
                F.floor(F.col("c_acctbal") / F.lit(bucket_width)).cast("bigint")
                * F.lit(bucket_width)
            ).alias("bal_bucket"),
        )
    )
    w = Window.partitionBy("region", "segment", "bal_bucket")
    return gen.select(
        "*",
        F.count(F.lit(1)).over(w).cast("bigint").alias("group_n"),
        (F.count(F.lit(1)).over(w) >= F.lit(k)).alias("k_ok"),
    )


def scrub_terms(
    df,
    terms: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
    placeholder: str = "[REDACTED]",
):
    """Span-level deny-list scrubbing: replace every word-boundary
    occurrence of the given terms inside the text with ``placeholder``
    and report the per-document redaction count — the unstructured
    twin of :func:`pseudonymize_customers` (dictionary-based PII /
    sensitive-term removal over a corpus; regex classes for emails,
    phone numbers, ids slot into the same pattern argument).

    Pure column expressions (``regexp_replace`` + ``regexp_count``):
    stateless, shuffle-free, whole-stage-codegen'd — a single scan at
    any scale. The pattern uses ``\\b`` boundaries and alternation,
    supported identically by Java regex and RE2, so the DuckDB twin
    runs the same pattern verbatim. Terms are regex-ESCAPED
    (self-review r12: 'example.com' used to redact 'exampleXcom' and
    'c++' threw PatternSyntaxException mid-job); an empty deny-list is
    refused — the unescaped empty alternation matched zero-width at
    every word boundary.
    """
    import re as _re

    if not terms:
        raise ValueError("scrub_terms: empty deny-list")

    def _wrap(t: str) -> str:
        # \b only borders WORD characters: a term ending in '+' (or
        # starting with '.') would never match with an unconditional
        # boundary glued to it — apply each \b only where the term
        # edge is a word char (RE2-safe; lookarounds are not)
        pre = r"\b" if _re.match(r"\w", t) else ""
        suf = r"\b" if _re.search(r"\w$", t) else ""
        return pre + _re.escape(t) + suf

    pattern = "(" + "|".join(_wrap(t) for t in terms) + ")"
    return df.select(
        F.col(id_col),
        F.regexp_replace(F.col(text_col), pattern, placeholder).alias("text_scrubbed"),
        F.regexp_count(F.col(text_col), F.lit(pattern)).cast("bigint").alias(
            "n_redactions"
        ),
    )


# Classes of PII the span detector ships with — DEMO / oracle-
# replicable DEFAULTS, not a compliance gate (ADVICE r4). They are
# deliberately restricted to regex shapes whose semantics agree
# between Java regex (Spark) and RE2 (DuckDB / most scanners): no
# lookarounds, ASCII \b only. Known narrowness a production deployment
# must widen via the ``patterns=`` parameter: ``phone`` matches only
# the +N-NNN-NNNN shape (parenthesized/space/dot formats pass
# undetected), and none of these classes cover names, addresses, or
# national id formats. ``ipv4`` carries word-boundary guards and
# octet-range alternation so version strings ("v1.2.3.4" — no word
# boundary between 'v' and '1') and out-of-range octets ("999.1.1.1")
# don't count; a dotted-quad PREFIX of a longer chain ("1.2.3.4.5")
# still matches, since excluding it needs lookahead RE2 lacks.
_IPV4_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}",
    "ipv4": rf"\b{_IPV4_OCTET}(\.{_IPV4_OCTET}){{3}}\b",
}


def detect_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-document PII span counts by class — the AUDIT step that
    decides whether a document goes to ``scrub_terms``-style redaction,
    to ``pseudonymize``-style replacement, or is dropped outright
    before a training corpus leaves the trust boundary.

    One ``regexp_count`` column expression per class: codegen'd,
    shuffle-free, a single scan at any scale (the 100 TB shape is a
    full-corpus map with zero exchanges). Span EXTRACTION is the same
    expression with ``regexp_extract_all`` when the downstream redactor
    needs offsets; counts are what audit dashboards aggregate."""
    # None -> defaults; an EXPLICIT empty dict is refused rather than
    # silently swapped for the defaults (self-review r12: a caller
    # whose dynamic class filter ends empty must not get a compliance
    # audit reporting classes it never asked for)
    if patterns is not None and not patterns:
        raise ValueError("detect_pii: empty patterns dict")
    pats = PII_PATTERNS if patterns is None else patterns
    counts = [
        F.regexp_count(F.col(text_col), F.lit(p)).cast("bigint").alias(f"n_{k}")
        for k, p in pats.items()
    ]
    out = df.select(F.col(id_col), *counts)
    total = None
    for k in pats:
        c = F.col(f"n_{k}")
        total = c if total is None else total + c
    return out.withColumn("n_pii_total", total.cast("bigint")).withColumn(
        "has_pii", total > F.lit(0)
    )
