"""Shared model constants.

RANK_CLICK_SHARES: CTR click share by search-result position 1..20 — the
reference's rank-based traffic model (helpers/analytics/
keywords_selection.py:113-134, citing the public advancedwebranking CTR
study). Single definition — seed priorities, the enrichment traffic model,
and the windows operator must never drift apart.
"""

RANK_CLICK_SHARES = [
    0.33, 0.17, 0.11, 0.08, 0.06, 0.05, 0.04, 0.035, 0.03, 0.025,
    0.01, 0.01, 0.01, 0.01, 0.01, 0.005, 0.005, 0.0034, 0.0033, 0.0033,
]
