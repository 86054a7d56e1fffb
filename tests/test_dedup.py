

def test_pair_recall_semantics(spark):
    from linear_quadtree_spark.operators.dedup import pair_recall

    truth = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (7, 8)], "id_a long, id_b long"
    )
    approx = spark.createDataFrame(
        [(1, 2), (3, 4), (9, 10)], "id_a long, id_b long"
    )
    r = pair_recall(truth, approx).first()
    assert (r["n_truth"], r["n_approx"], r["n_hit"]) == (4, 3, 2)
    assert r["recall_ppm"] == 500_000
    assert r["precision_ppm"] == 666_666

    empty = spark.createDataFrame([], "id_a long, id_b long")
    r0 = pair_recall(empty, approx).first()
    assert r0["recall_ppm"] is None and r0["n_truth"] == 0


def test_minhash_precision_is_one_on_corpus(spark, sf_dir):
    """The verify step makes every emitted LSH pair a true pair at the
    same tau — precision_ppm must be exactly 10^6 on the real corpus."""
    import __spark_entry__ as entrymod

    r = entrymod.queries()["minhash_pair_recall"](spark, sf_dir).first()
    assert r["precision_ppm"] == 1_000_000
    assert 0 < r["recall_ppm"] <= 1_000_000


def test_simhash_pigeonhole_measured_exact(spark, sf_dir):
    """Banded simhash vs all-pairs ground truth: recall AND precision
    must be exactly 10^6 at hamming <= bands-1 — the pigeonhole theorem
    as a measurement."""
    import __spark_entry__ as entrymod

    r = entrymod.queries()["simhash_pair_recall"](spark, sf_dir).first()
    assert r["recall_ppm"] == 1_000_000
    assert r["precision_ppm"] == 1_000_000
    assert r["n_truth"] == r["n_approx"] == r["n_hit"]
