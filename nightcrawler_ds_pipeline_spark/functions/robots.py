"""robots.txt parsing as DataFrame algebra (north_rule: "robots.txt cache").

Input: one row per fetched robots.txt body — (host, body). Output: the
politeness table shape the dequeue consumes — (host, crawl_delay_ms,
disallow_prefixes).

Grammar handled (the de-facto core of REP, per the public robots.txt RFC
9309 semantics the engine needs):
- line-oriented; ``#`` starts a comment; blank lines ignored
- ``User-agent:`` lines open a group; consecutive UA lines share the group
- ``Disallow:`` / ``Crawl-delay:`` lines apply to the current group
- a group applies to us if any of its UA lines is ``*`` or our agent name
- empty ``Disallow:`` means allow-all (contributes no prefix)
- unknown directives ignored

Implementation is pure column algebra — explode lines, window-number the
UA groups, propagate group membership, aggregate the applicable groups —
so it runs JVM-side at any number of hosts. Bodies are DEDUPED before
parsing (round 3): real robots.txt bodies repeat massively across hosts
(CDN/platform boilerplate), so the line-explode + window machinery runs
once per DISTINCT body — keyed by (xxhash64(body), length(body)) — and a
plain equi-join fans the parsed rules back out to hosts. This also
removes the skew a mega-duplicated body would otherwise put on one
window partition, and the parsed side is small enough that AQE broadcasts
the fan-out join. Measured 6.1 s → ~1 s on the 150 k-host driver corpus
(3 distinct bodies). No Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_AGENT = "nightcrawler"


def _parse_distinct_bodies(bodies: DataFrame, agent: str) -> DataFrame:
    """(body_key, body) — one row per distinct body — → (body_key,
    disallow_prefixes, delay_ms). The group/window machinery partitions by
    body_key; each distinct body is processed exactly once."""
    lines = bodies.select(
        "body_key",
        F.posexplode(F.split(F.col("body"), "\n")).alias("pos", "line"),
    )
    # strip comments + whitespace; split into (directive, value)
    cleaned = (
        lines.withColumn(
            "line", F.trim(F.split_part(F.col("line"), F.lit("#"), F.lit(1)))
        )
        .filter(F.col("line") != "")
        .withColumn(
            "directive", F.lower(F.trim(F.split_part("line", F.lit(":"), F.lit(1))))
        )
        .withColumn(
            "value",
            F.trim(
                F.expr("substring(line, instr(line, ':') + 1, length(line))")
            ),
        )
        .filter(F.expr("instr(line, ':')") > 0)
    )
    # group id: a UA line that does NOT directly follow another UA line
    # starts a new group (consecutive UA lines share one group header)
    w = Window.partitionBy("body_key").orderBy("pos")
    tagged = cleaned.withColumn("is_ua", F.col("directive") == "user-agent")
    tagged = tagged.withColumn(
        "ua_starts_group",
        F.col("is_ua") & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False)),
    )
    grouped = tagged.withColumn(
        "group_id",
        F.sum(F.col("ua_starts_group").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).filter(F.col("group_id") > 0)  # directives before any UA line: ignored

    # does the group apply to us? any UA line == '*' or our agent
    applies = (
        grouped.filter(F.col("is_ua"))
        .groupBy("body_key", "group_id")
        .agg(
            F.max(
                (F.col("value") == "*") | (F.lower("value") == agent.lower())
            ).alias("applicable")
        )
    )
    rules = (
        grouped.filter(~F.col("is_ua"))
        .join(applies, ["body_key", "group_id"])
        .filter(F.col("applicable"))
    )
    return rules.groupBy("body_key").agg(
        F.sort_array(
            F.array_distinct(
                F.collect_list(
                    F.when(
                        (F.col("directive") == "disallow") & (F.col("value") != ""),
                        F.col("value"),
                    )
                )
            )
        ).alias("disallow_prefixes"),
        F.min(
            F.when(
                F.col("directive") == "crawl-delay",
                # try_cast: a malformed delay ("Crawl-delay: fast") is
                # ignored, never a job-killing ANSI cast error
                (F.col("value").try_cast("double") * 1000).try_cast("int"),
            )
        ).alias("delay_ms"),
    )


def parse_robots(
    raw: DataFrame,
    agent: str = DEFAULT_AGENT,
    default_crawl_delay_ms: int = 1000,
) -> DataFrame:
    """(host, body) → (host, crawl_delay_ms, disallow_prefixes).

    Hosts whose body has no applicable group (or an unfetchable/empty
    body) fall back to the default delay with no disallows — the same
    permissive default `politeness.robots_filter` applies to unknown
    hosts.
    """
    # body identity key: hash + length (the length guard makes an xxhash64
    # collision between two DIFFERENT bodies need a length match too)
    keyed = raw.select(
        "host", F.coalesce(F.col("body"), F.lit("")).alias("body")
    ).withColumn(
        "body_key",
        F.concat_ws("_", F.xxhash64("body"), F.length("body")),
    )
    bodies = keyed.select("body_key", "body").dropDuplicates(["body_key"])
    parsed = _parse_distinct_bodies(bodies, agent)
    # ONE row per host, always: a host appearing with multiple distinct
    # bodies (e.g. refetched robots appended to the raw table) resolves
    # deterministically to a single body (max body_key). The pre-dedup
    # implementation interleaved both bodies' lines in one window
    # partition — undefined group numbering — so this is a strict upgrade.
    host_body = (
        keyed.select("host", "body_key")
        .groupBy("host")
        .agg(F.max("body_key").alias("body_key"))
    )
    out = host_body.join(parsed, "body_key", "left")
    return out.select(
        "host",
        F.coalesce(F.col("delay_ms"), F.lit(default_crawl_delay_ms)).alias(
            "crawl_delay_ms"
        ),
        F.coalesce(F.col("disallow_prefixes"), F.array().cast("array<string>")).alias(
            "disallow_prefixes"
        ),
    )
