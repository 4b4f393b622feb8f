

def test_int_gram_matches_numpy_and_partitioning(spark):
    import numpy as np

    from gfw_pixetl_spark.functions.similarity import int_gram

    rng = np.random.RandomState(7)
    X = rng.randint(-127, 128, size=(40, 5)).astype("int64")
    rows = [(i, [int(v) for v in X[i]]) for i in range(40)]
    for parts in (1, 8):
        df = spark.createDataFrame(
            rows, "vec_id long, sq8_code array<long>").repartition(parts)
        got = {(r.i, r.j): r.g
               for r in int_gram(df).collect()}
        G = X.T @ X
        assert got[(0, 0)] == 40
        for i in range(5):
            for j in range(5):
                assert got[(i + 1, j + 1)] == G[i, j]
