"""Pure-Python crawl-loop oracle — the BASELINE.json correctness gate.

Replays the crawl with plain dicts/lists under the SAME seed list and
politeness budget, computing the exact crawl ordering (iter, seq, url_hash)
and the final URL-seen set. The Spark loop must match both exactly
(BASELINE.json metric: "crawl-order + URL-seen-set equality ... vs reference
under identical seed list and politeness budget").

Semantics mirrored 1:1 from the Spark engine's spec (crawl/loop.py +
politeness.py), which in turn encodes the reference's observable behavior:

- seed: canonicalize → CTR-share(position) × max(volume, 1) priority; one
  row per url_hash, max priority wins, ties by url asc
- robots gate: disallow-prefix drop (permanent), crawl-delay attach
- token buckets: available = min(2·window, tokens + window); budget =
  floor(available / delay) clamped to [0, max_per_host]; delay ≤ 0 →
  max_per_host; spent = n_dequeued × delay; absent hosts keep their level
- dequeue: per-host top-budget, then global seq by (priority desc,
  url_hash asc) — the engine's two-phase salted form is exact top-K, so
  the oracle computes plain top-K
- seen: every dequeued url_hash, regardless of fetch outcome
- edges: outlinks of non-error fetches, priority × decay, canonicalized,
  deduped (max priority, tie url asc), minus seen ∪ dequeued ∪ remaining
- xxhash64: the oracle does NOT reimplement it — hashes are injected via a
  hash lookup computed once with Spark's own xxhash64, so the oracle stays
  framework-independent in logic while sharing the key function.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlparse

from nightcrawler_ds_pipeline_spark.functions.urls import canonicalize

from nightcrawler_ds_pipeline_spark.constants import RANK_CLICK_SHARES  # noqa: E402


@dataclass
class OracleState:
    crawl_order: list[tuple[int, int, int]] = field(default_factory=list)
    seen: set[int] = field(default_factory=set)
    tokens: dict[str, int] = field(default_factory=dict)
    # latest iteration each url_hash was crawled (TTL re-crawl semantics)
    seen_iters: dict[int, int] = field(default_factory=dict)


def _host(url: str) -> str:
    return (urlparse(url).hostname or "").lower()


def run_crawl_oracle(
    serp_rows: list[dict],
    responses_by_url: dict[str, dict],
    robots_rows: list[dict],
    url_hash: dict[str, int],
    iterations: int = 3,
    window_ms: int = 60_000,
    max_per_host: int = 100,
    outlink_priority_decay: float = 0.5,
    ttl_iters: int | None = None,
) -> OracleState:
    """Replay the crawl; returns crawl order + seen set + bucket levels.

    ``ttl_iters`` mirrors CrawlConfig.ttl_iters: a seen entry only
    suppresses re-adding while ``seen_iter > it - ttl_iters`` — an expired
    URL rediscovered via outlinks re-enters the frontier and is re-crawled.
    """
    robots = {r["host"]: r for r in robots_rows}

    def is_active_seen(uh: int, it: int) -> bool:
        si = st.seen_iters.get(uh)
        if si is None:
            return False
        if ttl_iters is None:
            return True
        return si > it - ttl_iters

    # seed frontier (loop.seed_frontier semantics)
    frontier: dict[int, dict] = {}  # url_hash -> row

    def add_frontier(url: str, priority: float, seen: set[int]):
        cu = canonicalize(url)
        uh = url_hash[cu]
        if uh in seen:
            return
        row = frontier.get(uh)
        # max priority wins; ties broken by url asc (loop.seed_frontier)
        if row is None or priority > row["priority"] or (
            priority == row["priority"] and url < row["url"]
        ):
            frontier[uh] = {
                "url": url,
                "canonical_url": cu,
                "url_hash": uh,
                "host": _host(cu),
                "priority": priority,
            }

    st = OracleState()
    for r in serp_rows:
        share = RANK_CLICK_SHARES[min(int(r["position"]), 20) - 1]
        vol = r.get("keyword_volume")
        vol = 1.0 if vol is None else max(float(vol), 1.0)
        add_frontier(r["url"], share * vol, st.seen)

    for it in range(iterations):
        # robots gate (permanent drop) + budgets from token buckets
        gated: dict[str, list[dict]] = {}
        for row in frontier.values():
            rb = robots.get(row["host"])
            delay = rb["crawl_delay_ms"] if rb else 1000
            path = urlparse(row["canonical_url"]).path or "/"
            if rb and any(path.startswith(p) for p in (rb.get("disallow_prefixes") or [])):
                continue
            gated.setdefault(row["host"], []).append({**row, "delay": delay})

        # dequeue: per-host top-budget by (priority desc, url_hash asc)
        batch: list[dict] = []
        spent: dict[str, int] = {}
        for host, rows in gated.items():
            delay = rows[0]["delay"]
            available = min(2 * window_ms, st.tokens.get(host, 0) + window_ms)
            if delay <= 0:
                budget = max_per_host
            else:
                budget = max(0, min(max_per_host, available // delay))
            rows.sort(key=lambda r: (-r["priority"], r["url_hash"]))
            take = rows[: int(budget)]
            batch.extend(take)
            spent[host] = len(take) * max(delay, 0)
            st.tokens[host] = int(available - spent[host])
        if not gated:
            break  # frontier exhausted (post-robots) — the crawl is done
        if not batch:
            continue  # accrual-only iteration: out-of-token hosts refill

        # global deterministic crawl order
        batch.sort(key=lambda r: (-r["priority"], r["url_hash"]))
        for seq, row in enumerate(batch, start=1):
            st.crawl_order.append((it, seq, row["url_hash"]))
            st.seen.add(row["url_hash"])
            st.seen_iters[row["url_hash"]] = it
            del frontier[row["url_hash"]]

        # remaining frontier keeps only robots-allowed rows (permanent drop)
        allowed = {r["url_hash"] for rows in gated.values() for r in rows}
        frontier = {uh: r for uh, r in frontier.items() if uh in allowed}

        # new edges from non-error fetches
        for row in batch:
            resp = responses_by_url.get(row["url"])
            if resp is None or resp.get("error"):
                continue
            for link in resp.get("outlinks") or []:
                cu = canonicalize(link)
                uh = url_hash.get(cu)
                if uh is None or is_active_seen(uh, it) or uh in frontier:
                    continue
                prio = row["priority"] * outlink_priority_decay
                cur = frontier.get(uh)
                if cur is None or prio > cur["priority"] or (
                    prio == cur["priority"] and link < cur["url"]
                ):
                    frontier[uh] = {
                        "url": link,
                        "canonical_url": cu,
                        "url_hash": uh,
                        "host": _host(cu),
                        "priority": prio,
                    }
    return st
