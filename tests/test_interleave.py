"""Q8/Q9/Q12 window operators — mirrors bulk_crawl.py:131-148 semantics."""

from __future__ import annotations

from itertools import zip_longest

import pytest

from my_crawler_spark.operators.interleave import (
    group_by_domain,
    interleave_by_domain,
    topk_per_group,
)


@pytest.fixture(scope="module")
def seeds(spark):
    rows = []
    seq = 0
    for host, n in [("a.com", 4), ("b.com", 2), ("c.com", 3)]:
        for i in range(n):
            rows.append((seq, host, f"https://{host}/{i}"))
            seq += 1
    return spark.createDataFrame(rows, ["seq", "host", "url"])


def test_interleave_matches_zip_longest(spark, seeds):
    """Reference interleave = transpose of per-domain lists (bulk_crawl.py:140-148)."""
    rows = seeds.orderBy("seq").collect()
    groups: dict[str, list[str]] = {}
    for r in rows:
        groups.setdefault(r.host, []).append(r.url)
    want = [
        u
        for batch in zip_longest(*[groups[h] for h in sorted(groups)])
        for u in batch
        if u is not None
    ]
    got = [
        r.url
        for r in interleave_by_domain(seeds).orderBy("emit_order").collect()
    ]
    assert got == want


def test_group_by_domain(spark, seeds):
    got = {r.host: r.n_urls for r in group_by_domain(seeds).collect()}
    assert got == {"a.com": 4, "b.com": 2, "c.com": 3}


def test_topk_per_group(spark, seeds):
    got = topk_per_group(seeds, "host", "seq", k=2, descending=False).collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r.host, []).append(r.seq)
    assert all(len(v) == 2 or r.host == "b.com" for r in got for v in [by_host[r.host]])
    assert sorted(by_host["a.com"]) == [0, 1]
