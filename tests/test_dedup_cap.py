"""LSH bucket-size cap (operators/dedup.py max_bucket — the 100TB guard)."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extractor_spark.operators.dedup import minhash_lsh_pairs


@pytest.fixture(scope="module")
def corpus(spark):
    # 30 identical boilerplate docs (one mega-bucket per band) + 3 near-dup
    # pairs + 20 distinct docs
    rows = []
    for i in range(30):
        rows.append((i, "identical boilerplate footer text repeated everywhere"))
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for j, i in enumerate(range(100, 106, 2)):
        rows.append((i, base + f" tail{j}"))
        rows.append((i + 1, base + f" tail{j}"))
    for i in range(200, 220):
        rows.append((i, f"unique document number {i} with words " + " ".join(f"w{i}{k}" for k in range(8))))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_uncapped_finds_mega_bucket_pairs(corpus):
    pairs = minhash_lsh_pairs(corpus, threshold=0.9).collect()
    mega = [p for p in pairs if p.d1 < 30 and p.d2 < 30]
    assert len(mega) == 30 * 29 // 2  # quadratic blowup the cap exists to stop


def test_cap_drops_mega_bucket_keeps_small_pairs(corpus):
    pairs = minhash_lsh_pairs(corpus, threshold=0.9, max_bucket=5).collect()
    assert not [p for p in pairs if p.d1 < 30 and p.d2 < 30]  # mega gone
    small = {(p.d1, p.d2) for p in pairs}
    assert {(100, 101), (102, 103), (104, 105)} <= small  # real near-dups kept
