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
