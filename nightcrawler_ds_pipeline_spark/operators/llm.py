"""S9 — LLM delivery-policy classification, as a deterministic stub.

The reference's only ML-shaped stage: it sends a shipping-policy page's text
to Mistral/OpenAI with the prompt at settings.py:59-115 and expects
``{"is_shipping_{country}_answer": yes|no|not_clear, ..._justification}``
JSON back, memoized by a sha256 request hash with a 30-day TTL
(helpers/api/llm_apis.py:30-70, api_caller.py:48-80). It is UNUSED in the
reference's main pipeline path (SURVEY §2.1) and this sandbox has no model
endpoint, so the engine ships the stage with:

- the real Spark plumbing: JVM-side codegen'd classification column +
  justification + the request-memo cache key (sha256, mirroring
  APICaller._generate_hash) — swap `classify_delivery_policy` for a
  Pandas-UDF endpoint call and nothing else changes;
- a DETERMINISTIC STUB decision rule distilled from the prompt's own
  instructions (settings.py:64-67): worldwide/global/Europe/{country} ⇒
  "yes", an explicit does-not-ship marker ⇒ "no", else "not_clear" — the
  prompt literally states these rules; the stub just applies them without
  the LLM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nightcrawler_ds_pipeline_spark.operators.sqlfrags import read_table
from nightcrawler_ds_pipeline_spark.registry import register

PROMPT_VERSION = "delivery-policy-v1"

# markers in priority order; "no" wins over "yes" (an explicit refusal is
# strictly more specific than a generic region mention)
NO_MARKERS = [
    "does not ship to switzerland",
    "not deliver to switzerland",
    "no shipping to switzerland",
]
YES_MARKERS = ["worldwide", "global", "europe", "switzerland"]


def _first_match(lowered: Column, markers: list[str]) -> Column:
    out = F.lit(None).cast("string")
    for m in reversed(markers):
        out = F.when(lowered.contains(m), F.lit(m)).otherwise(out)
    return out


def classify_delivery_policy(
    df: DataFrame, text_col: str = "text", country: str = "ch"
) -> DataFrame:
    """Adds is_shipping_<c>_answer / _justification / llm_cache_key columns
    (the exact response-JSON fields the reference prompt demands)."""
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    no_m = _first_match(t, NO_MARKERS)
    yes_m = _first_match(t, YES_MARKERS)
    answer = (
        F.when(no_m.isNotNull(), F.lit("no"))
        .when(yes_m.isNotNull(), F.lit("yes"))
        .otherwise(F.lit("not_clear"))
    )
    justification = (
        F.when(no_m.isNotNull(), F.concat(F.lit("matched:"), no_m))
        .when(yes_m.isNotNull(), F.concat(F.lit("matched:"), yes_m))
        .otherwise(F.lit("no shipping marker found"))
    )
    cache_key = F.sha2(
        F.concat(F.lit(PROMPT_VERSION + "_"), F.col(text_col)), 256
    )
    return (
        df.withColumn(f"is_shipping_{country}_answer", answer)
        .withColumn(f"is_shipping_{country}_justification", justification)
        .withColumn("llm_cache_key", cache_key)
    )


# deterministic shipping-policy corpus both engines synthesize identically
# (5 archetypes drawn from the prompt's own examples, settings.py:80-109)
_POLICY_TEXTS = [
    "We deliver worldwide. Orders from abroad welcome.",
    "Der Versand innerhalb Deutschlands erfolgt als DHL-Paket. Does not ship to Switzerland.",
    "We ship to Switzerland and Liechtenstein within 5 days.",
    "Shipping across Europe with tracked delivery.",
    "Die Abgabe unserer Artikel erfolgt nur in haushaltsueblichen Mengen.",
]

_POLICY_SQL_CASE = (
    "CASE CAST(o_orderkey % 5 AS INTEGER) "
    + " ".join(f"WHEN {i} THEN '{t}'" for i, t in enumerate(_POLICY_TEXTS))
    + " END"
)


def _policy_case_col() -> Column:
    c = F.when(F.col("o_orderkey") % 5 == 0, F.lit(_POLICY_TEXTS[0]))
    for i, t in enumerate(_POLICY_TEXTS[1:], start=1):
        c = c.when(F.col("o_orderkey") % 5 == i, F.lit(t))
    return c


def _answer_sql(col: str) -> str:
    no_ = " OR ".join(f"contains(lower({col}), '{m}')" for m in NO_MARKERS)
    yes_ = " OR ".join(f"contains(lower({col}), '{m}')" for m in YES_MARKERS)
    return f"CASE WHEN {no_} THEN 'no' WHEN {yes_} THEN 'yes' ELSE 'not_clear' END"


def _just_sql(col: str) -> str:
    branches = []
    for m in NO_MARKERS + YES_MARKERS:
        branches.append(
            f"WHEN contains(lower({col}), '{m}') THEN concat('matched:', '{m}')"
        )
    # same priority order as the Spark side: NO markers first, then YES
    return "CASE " + " ".join(branches) + " ELSE 'no shipping marker found' END"


@register(
    "llm_delivery_policy",
    oracle=f"""
    WITH policies AS (
      SELECT o_orderkey, {_POLICY_SQL_CASE} AS policy_text FROM orders
    )
    SELECT o_orderkey,
           {_answer_sql("policy_text")} AS is_shipping_ch_answer,
           {_just_sql("policy_text")} AS is_shipping_ch_justification,
           sha256(concat('{PROMPT_VERSION}_', policy_text)) AS llm_cache_key
    FROM policies ORDER BY o_orderkey
    """,
)
def llm_delivery_policy(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    policies = orders.select(
        "o_orderkey", _policy_case_col().alias("policy_text")
    )
    return (
        classify_delivery_policy(policies, text_col="policy_text")
        .select(
            "o_orderkey",
            "is_shipping_ch_answer",
            "is_shipping_ch_justification",
            "llm_cache_key",
        )
        .orderBy("o_orderkey")
    )
