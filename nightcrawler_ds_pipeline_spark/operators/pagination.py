"""S4 — bounded paginated scan with early exit.

The reference's reverse-image search pulls up to 4 pages and stops on the
first empty page (s03_reverse_image_search.py:23,143-159). The Spark form is
a driver-side loop over page indices (the ONLY sanctioned driver loop in the
engine — bounded by max_pages, constant per page), unioning per-page
DataFrames and stopping when a page returns no rows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def paginate_scan(
    fetch_page: Callable[[int], DataFrame],
    max_pages: int = 4,
) -> DataFrame | None:
    """Union pages 0..max_pages-1, early-exiting on the first empty page.

    ``fetch_page(i)`` returns that page's DataFrame (in production a
    mapInPandas HTTP stage; in tests a fixture slice). Returns None when
    page 0 is already empty."""
    out: DataFrame | None = None
    for page in range(max_pages):
        df = fetch_page(page)
        # bounded number of cheap emptiness probes (≤ max_pages)
        if df.limit(1).count() == 0:
            break
        out = df if out is None else out.unionByName(df)
    return out
