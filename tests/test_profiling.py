from my_crawler_spark.operators.profiling import profile_table


def test_profile_table_stats_and_topk(spark):
    df = spark.createDataFrame(
        [
            (1, "en", 10),
            (2, "en", 20),
            (3, "de", None),
            (4, None, 5),
            (5, "en", 5),
            (6, "fr", 30),
        ],
        "id long, lang string, n int",
    )
    got = {r["column"]: r.asDict() for r in profile_table(df, ["lang", "n"], top_k=2).collect()}
    lang = got["lang"]
    assert lang["n_rows"] == 6 and lang["n_null"] == 1 and lang["n_distinct"] == 3
    assert lang["min_val"] == "de" and lang["max_val"] == "fr"
    assert lang["top_values"] == "en:3,de:1"  # count desc, value asc tie-break
    n = got["n"]
    # native-type min/max (numeric), not string compare ("10" < "5" as strings)
    assert n["min_val"] == "5" and n["max_val"] == "30"
    assert n["n_null"] == 1 and n["n_distinct"] == 4
    assert n["top_values"] == "5:2,10:1"


def test_profile_table_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, x string")
    row = {r["column"]: r.asDict() for r in profile_table(df, ["x"]).collect()}["x"]
    assert row["n_null"] == 2 and row["n_distinct"] == 0
    assert row["min_val"] is None and row["max_val"] is None
    assert row["top_values"] == ""


def test_psi_drift_detects_shift_and_matches_python(spark):
    import math

    old = spark.createDataFrame([(float(i % 10),) for i in range(100)], "x double")
    new = spark.createDataFrame([(float(i % 10) + 3.0,) for i in range(80)], "x double")
    from my_crawler_spark.operators.profiling import psi_drift

    rows = {r["bin"]: r.asDict() for r in psi_drift(old, new, "x", 0.0, 10.0, 10).collect()}
    assert set(rows) == set(range(10))

    def counts(vals, n=10):
        c = [0] * n
        for v in vals:
            c[min(n - 1, max(0, math.floor(v)))] += 1
        return c

    co = counts([i % 10 for i in range(100)])
    cn = counts([min(i % 10 + 3.0, 9.999) for i in range(80)])
    psi = 0.0
    for b in range(10):
        p = (co[b] + 1.0) / 110.0
        q = (cn[b] + 1.0) / 90.0
        term = round((q - p) * math.log(q / p), 9)
        assert rows[b]["psi_term"] == term, b
        psi += term
    # shifted distribution reads as actionable drift
    assert psi > 0.25
    # identical snapshots read ~0
    same = psi_drift(old, old, "x", 0.0, 10.0, 10).agg(
        __import__("pyspark.sql.functions", fromlist=["sum"]).sum("psi_term")
    ).collect()[0][0]
    assert abs(same) < 1e-9
