"""Corpus-cleaning operators (operators/clean.py): cross-engine
lockstep vs the DuckDB oracle twins, plus hand-computed semantic checks
on crafted micro-corpora (the values below are worked out by hand in the
comments, not copied from the implementation)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from linear_quadtree_spark.functions.textexpr import DUCK, SPARK
from linear_quadtree_spark.operators import clean as C


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    yield con
    con.close()


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _assert_match(sdf, con, sql):
    got = _norm(sdf.toPandas())
    exp = _norm(con.execute(sql).fetch_df())
    assert list(got.columns) == list(exp.columns)
    assert got.shape == exp.shape
    assert (got.values == exp.values).all()
    return got


def _mini(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


# ------------------------------------------------------------- lockstep
def test_repetition_lockstep(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _assert_match(C.repetition_stats(docs), duck, C.repetition_stats_sql_duck())
    assert (got["dup_token_ppm"] <= 1_000_000).all()
    assert (got["top_bigram_ppm"] > 0).any()


def test_pii_lockstep(spark, sf_dir, duck):
    demo = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "text", F.expr(C.pii_demo_text_expr(SPARK))
    )
    sql = (
        f"WITH demo AS (SELECT doc_id, {C.pii_demo_text_expr(DUCK)} AS text FROM documents)"
        + C.pii_scrub_sql_duck("demo")
    )
    got = _assert_match(C.pii_scrub(demo), duck, sql)
    # two of every three docs carry exactly one of each planted class
    assert got["n_email"].sum() == got["n_ipv4"].sum() == got["n_phone"].sum()
    assert got["n_email"].sum() == (got["n_email"] == 1).sum() > 0


def test_boilerplate_lockstep(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _assert_match(C.boilerplate_ngrams(docs), duck, C.boilerplate_ngrams_sql_duck())
    assert (got["n_boiler"] <= got["n_shingles"]).all()
    assert (got["n_boiler"] > 0).any()


def test_decontaminate_lockstep(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _assert_match(C.decontaminate(docs), duck, C.decontaminate_sql_duck())
    # benchmark docs themselves are excluded from the output
    assert (got["doc_id"] % 97 != 0).all()
    assert ((got["contaminated"] == 1) == (got["n_hits"] > 0)).all()


# ------------------------------------------------------- semantic checks
def test_repetition_hand_values(spark):
    # "a a a b": 4 tokens, 2 distinct -> dup (4-2)*1e6 // 4 = 500000.
    # bigrams (a,a) (a,a) (a,b): mode 2 of 3 -> 666666.
    # trigrams (a,a,a) (a,a,b): mode 1 of 2 -> 500000.
    # "x y": no trigram -> 0; distinct bigram -> mode 1 of 1 -> 1e6.
    rows = [(1, "a a a b"), (2, "x y"), (3, "")]
    out = {
        r["doc_id"]: r
        for r in C.repetition_stats(_mini(spark, rows)).collect()
    }
    assert out[1]["n_tokens"] == 4
    assert out[1]["dup_token_ppm"] == 500_000
    assert out[1]["top_bigram_ppm"] == 666_666
    assert out[1]["top_trigram_ppm"] == 500_000
    assert out[2]["top_bigram_ppm"] == 1_000_000
    assert out[2]["top_trigram_ppm"] == 0
    assert out[3]["n_tokens"] == 0 and out[3]["dup_token_ppm"] == 0


def test_max_run_is_mode_count(spark):
    # mode of [3,1,2,1,3,3,1] is 3 (both 1 and 3 appear 3x)
    r = spark.sql(
        f"SELECT {C.max_run_expr(SPARK, 'CAST(array(3,1,2,1,3,3,1) AS ARRAY<BIGINT>)')} AS m, "
        f"{C.max_run_expr(SPARK, 'CAST(array() AS ARRAY<BIGINT>)')} AS z"
    ).collect()[0]
    assert r["m"] == 3 and r["z"] == 0


def test_pii_hand_values(spark):
    rows = [
        (1, "mail a.b@x.co or c@y.org ip 10.0.3.7 tel 555-0123 end"),
        (2, "clean text only"),
        (3, None),
    ]
    out = {r["doc_id"]: r for r in C.pii_scrub(_mini(spark, rows)).collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (2, 1, 1)
    # 'mail <pii> or <pii> ip <pii> tel <pii> end' = 42 chars
    assert out[1]["clean_len"] == len("mail <pii> or <pii> ip <pii> tel <pii> end")
    assert (out[2]["n_email"], out[2]["clean_len"]) == (0, 15)
    assert out[3]["clean_len"] == 0


def test_boilerplate_hand_values(spark):
    # docs 1 and 2 share the 5-gram "the quick brown fox jumps";
    # doc 3 shares nothing. Doc 1 has 2 shingle positions, one boiler.
    rows = [
        (1, "the quick brown fox jumps high"),
        (2, "see the quick brown fox jumps"),
        (3, "entirely different words here now"),
    ]
    out = {
        r["doc_id"]: r
        for r in C.boilerplate_ngrams(_mini(spark, rows), min_docs=2).collect()
    }
    assert out[1]["n_shingles"] == 2 and out[1]["n_boiler"] == 1
    assert out[1]["boiler_ppm"] == 500_000
    assert out[2]["n_boiler"] == 1
    assert out[3]["n_boiler"] == 0 and out[3]["boiler_ppm"] == 0


def test_decontaminate_hand_values(spark):
    # doc 0 is the benchmark (0 % 97 == 0); doc 1 shares the trigram
    # "alpha beta gamma" with it, doc 2 shares nothing.
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "x alpha beta gamma y"),
        (2, "nothing in common at all"),
    ]
    out = {r["doc_id"]: r for r in C.decontaminate(_mini(spark, rows)).collect()}
    assert set(out) == {1, 2}
    assert out[1]["contaminated"] == 1 and out[1]["n_hits"] == 1
    assert out[2]["contaminated"] == 0 and out[2]["n_hits"] == 0
