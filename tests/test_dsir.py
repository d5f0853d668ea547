import hashlib
import math

import pytest

from my_crawler_spark.operators.dsir import (
    dsir_log_weights,
    dsir_select,
    gumbel_key,
)

import pyspark.sql.functions as F


RAW = [
    (1, "the solar system has eight planets orbiting the sun"),
    (2, "planets orbit the sun and moons orbit planets"),
    (3, "buy cheap pills now click here buy now cheap"),
    (4, "click click buy buy cheap cheap now now here"),
    (5, "the sun is a star at the center of the solar system"),
]
TARGET = [
    (101, "planets and moons of the solar system orbit the sun"),
    (102, "the sun is the star at the center"),
]


@pytest.fixture()
def frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, target


def _py_gumbel(doc_id: int) -> float:
    h = hashlib.sha256(str(doc_id).encode()).hexdigest()[:12]
    u = (int(h, 16) + 0.5) / 16**12
    return round(-math.log(-math.log(u)), 9)


def _py_weights():
    """Independent pure-Python DSIR recompute (same smoothing/rounding)."""
    import re

    def terms(text):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(term):
        return hashlib.sha256(term.encode()).hexdigest()[:2]

    tc, rc = {}, {}
    for _, text in TARGET:
        for t in terms(text):
            tc[bucket(t)] = tc.get(bucket(t), 0) + 1
    for _, text in RAW:
        for t in terms(text):
            rc[bucket(t)] = rc.get(bucket(t), 0) + 1
    T, R, B = sum(tc.values()), sum(rc.values()), 256.0
    lam = {
        b: round(
            math.log(tc.get(b, 0) + 1.0)
            - math.log(T + B)
            - math.log(rc[b] + 1.0)
            + math.log(R + B),
            9,
        )
        for b in rc
    }
    out = {}
    for did, text in RAW:
        ts = terms(text)
        out[did] = (len(ts), round(math.fsum(lam[bucket(t)] for t in ts), 6))
    return out


def test_dsir_weights_match_python_twin_and_rank_target_like_docs(frames):
    raw, target = frames
    got = {
        r["doc_id"]: (r["n_terms"], r["log_w"])
        for r in dsir_log_weights(raw, target).collect()
    }
    want = _py_weights()
    assert got.keys() == want.keys()
    for did in want:
        assert got[did][0] == want[did][0]
        assert got[did][1] == pytest.approx(want[did][1], abs=2e-6)
    # astronomy docs (target-like) outrank spam docs on mean per-term weight
    mean = {d: got[d][1] / got[d][0] for d in got}
    assert min(mean[1], mean[2], mean[5]) > max(mean[3], mean[4])


def test_dsir_gumbel_key_matches_python(spark):
    df = spark.createDataFrame([(i,) for i in (1, 42, 499)], "doc_id long")
    got = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", gumbel_key(F.col("doc_id")).alias("g")).collect()
    }
    for did, g in got.items():
        assert g == _py_gumbel(did)


def test_dsir_select_topk_shape_and_plan(frames):
    raw, target = frames
    sel = dsir_select(raw, target, k=3)
    rows = sel.collect()
    assert len(rows) == 3
    # selection key is exactly log_w + gumbel (rounded), order is by key desc
    keys = [r["sel_key"] for r in rows]
    assert keys == sorted(keys, reverse=True)
    for r in rows:
        assert r["sel_key"] == pytest.approx(
            round(r["log_w"] + _py_gumbel(r["doc_id"]), 6), abs=2e-6
        )
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
