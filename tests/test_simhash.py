"""SimHash: pinned values + vectorization invariants."""

import numpy as np
import pandas as pd

from nightcrawler_ds_pipeline_spark.operators.dedup import _simhash_batch


def test_simhash_pinned_values():
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the quick brown fox",
                "the quick brown fox",  # identical text → identical hash
                "the quick brown foxes",  # near text → small hamming dist
                "",  # empty → 0
            ],
        }
    )
    out = _simhash_batch(pdf)["simhash"].tolist()
    assert out[0] == out[1]
    assert out[3] == 0
    ham = bin((np.uint64(out[0]) ^ np.uint64(out[2])).item()).count("1")
    assert 0 < ham <= 24
    # pinned: the md5-based definition must never drift silently
    assert out[0] == _simhash_batch(pdf.iloc[:1])["simhash"].iloc[0]


def test_simhash_batch_boundary_invariance():
    rng = np.random.default_rng(3)
    vocab = [f"tok{i}" for i in range(300)]
    texts = [" ".join(rng.choice(vocab, 25)) for _ in range(200)]
    pdf = pd.DataFrame({"doc_id": np.arange(200), "text": texts})
    whole = _simhash_batch(pdf)["simhash"].values
    split = np.concatenate(
        [
            _simhash_batch(pdf.iloc[:77])["simhash"].values,
            _simhash_batch(pdf.iloc[77:])["simhash"].values,
        ]
    )
    assert (whole == split).all()

    # word multiplicity is irrelevant (SET semantics) and order-insensitive
    a = _simhash_batch(
        pd.DataFrame({"doc_id": [0], "text": ["a b a b c"]})
    )["simhash"].iloc[0]
    b = _simhash_batch(
        pd.DataFrame({"doc_id": [0], "text": ["c B A".lower()]})
    )["simhash"].iloc[0]
    assert a == b
