"""Distributed cardinality sketches, engine-portable.

``approx_count_distinct`` exists in both Spark and DuckDB but their HLL
implementations differ (hash function, register layout, bias tables), so
an oracle can never hash-match it. This module implements HyperLogLog
(Flajolet et al. 2007) *as a relational plan* over the engine-portable
md5 hash ([[hashing]]), so Spark and any ANSI-SQL oracle compute the
bit-identical estimate:

1. ``h`` = 60-bit md5-derived hash of the value;
2. bucket = top ``p`` bits, ``w`` = remaining ``60 - p`` bits;
3. rho = leading-zero count of ``w`` + 1 (a compile-time CASE chain —
   both engines lack a portable ``clz``; 48 comparisons fold into one
   codegen'd expression);
4. registers: ``MAX(rho)`` per (group, bucket) — map-side combinable,
   the shuffle carries at most m=2^p rows per group;
5. estimate: alpha_m * m^2 / sum(2^-rho_max), with the standard
   linear-counting small-range correction.

Scale shape: two partial-aggregating shuffles, register state is
m * 8 bytes per group (32 KiB at p=12) regardless of input size — the
whole point of the sketch. Per-register 2^-M terms are exact powers of
two in a double, so the only FP nondeterminism is sum order; the final
``round()`` to integer absorbs it (noise is ~1e-15 relative, the
estimate is rounded to 1).

Accuracy: ~1.04/sqrt(m) relative standard error (1.6% at p=12),
unit-tested against exact counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import md5_int64, md5_int64_sql

HASH_BITS = 60


def _alpha(m: int) -> float:
    # Flajolet et al. 2007, for m >= 128.
    return 0.7213 / (1 + 1.079 / m)


def rho_col(w: Column, w_bits: int) -> Column:
    """Leading-zero-count(+1) of a ``w_bits``-wide non-negative value."""
    expr = F.lit(w_bits + 1)  # w == 0: all zeros
    # Build the CASE from the ELSE up: w >= 2^(w_bits-1) -> 1, etc.
    for rho in range(w_bits, 0, -1):
        threshold = 1 << (w_bits - rho)
        expr = F.when(w >= threshold, F.lit(rho)).otherwise(expr)
    return expr


def rho_sql(w_expr: str, w_bits: int) -> str:
    whens = "\n".join(
        f"WHEN ({w_expr}) >= {1 << (w_bits - rho)} THEN {rho}"
        for rho in range(1, w_bits + 1)
    )
    return f"(CASE {whens} ELSE {w_bits + 1} END)"


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 12,
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate of ``value_col`` as
    ``approx_distinct`` (BIGINT). Deterministic across engines,
    partitionings, and retries.
    """
    m = 1 << p
    w_bits = HASH_BITS - p
    h = md5_int64(F.col(value_col).cast("string"))
    # shiftright/% stay in exact int64 — float division would misplace
    # hashes near bucket boundaries (60-bit ints round in a double).
    hashed = df.select(
        *group_cols,
        F.shiftright(h, w_bits).alias("bucket"),
        rho_col(h % (1 << w_bits), w_bits).alias("rho"),
    )
    regs = hashed.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("mx"))
    per_group = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("s"),
        F.count("*").alias("nonzero"),
    )
    raw = F.lit(_alpha(m) * m * m) / (F.col("s") + (m - F.col("nonzero")))
    zeros = F.lit(m) - F.col("nonzero")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw)
    return per_group.select(
        *group_cols, F.round(est).cast("bigint").alias("approx_distinct")
    )


def count_min_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 5,
    width: int = 2048,
    seed: int = 7,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a relational
    plan: one row per (depth, column) with the collision count. The
    explode-by-depth inflates input rows ×depth *before* aggregation,
    but partial (map-side) aggregation collapses each task's output to
    at most depth*width rows, so the shuffle is bounded by
    numPartitions * depth * width regardless of input size — the sketch
    property, expressed in Spark's execution model.

    Hashes are the engine-portable md5 + LCG pairs ([[hashing]]), so an
    ANSI-SQL oracle rebuilds the identical sketch.
    """
    from .hashing import P31, md5_int64, minhash_coeffs

    coeffs = minhash_coeffs(depth, seed=seed)
    h = (md5_int64(F.col(value_col).cast("string")) % P31).alias("h")
    depths = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("d"),
                    F.lit(a).alias("a"),
                    F.lit(b).alias("b"),
                )
                for i, (a, b) in enumerate(coeffs)
            ]
        )
    ).alias("dep")
    return (
        df.select(h)
        .select("h", depths)
        .groupBy(
            F.col("dep.d").alias("d"),
            ((F.col("h") * F.col("dep.a") + F.col("dep.b")) % P31 % width)
            .alias("col"),
        )
        .agg(F.count("*").alias("cnt"))
    )


def cms_probe(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = 5,
    width: int = 2048,
    seed: int = 7,
) -> DataFrame:
    """Estimate each probe value's frequency from a sketch built by
    :func:`count_min_sketch` with the same parameters: min over depths
    of the hashed cell's count. The probe side is small by construction
    (heavy-hitter candidates), so it broadcasts — the sketch (depth *
    width rows) never moves through a shuffle keyed on data values.
    Estimates are exact-or-over, never under (CMS guarantee).
    """
    from .hashing import P31, md5_int64, minhash_coeffs

    coeffs = minhash_coeffs(depth, seed=seed)
    h = md5_int64(F.col(value_col).cast("string")) % P31
    hashed = probes.withColumn("h", h)
    cells = hashed.select(
        *probes.columns,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        ((F.col("h") * a + b) % P31 % width).alias("col"),
                    )
                    for i, (a, b) in enumerate(coeffs)
                ]
            )
        ).alias("cell"),
    )
    sk = sketch.select(
        F.col("d").alias("sk_d"), F.col("col").alias("sk_col"), "cnt"
    )
    joined = sk.join(
        F.broadcast(cells),
        (F.col("sk_d") == F.col("cell.d"))
        & (F.col("sk_col") == F.col("cell.col")),
    )
    return joined.groupBy(*probes.columns).agg(
        F.min("cnt").alias("est_n")
    )


def cms_heavy_hitters_sql(
    table_expr: str,
    value_expr: str,
    k: int = 20,
    depth: int = 5,
    width: int = 2048,
    seed: int = 7,
) -> str:
    """DuckDB twin of count_min_sketch + top-k exact probe + cms_probe
    (same hashes, same cells, same min-over-depths estimate)."""
    from .hashing import P31, md5_int64_sql, minhash_coeffs

    coeffs = minhash_coeffs(depth, seed=seed)
    dvals = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(coeffs)
    )
    h = f"({md5_int64_sql(f'CAST({value_expr} AS VARCHAR)')} % {P31})"
    return f"""
    WITH dd(d, a, b) AS (VALUES {dvals}),
    base AS (SELECT {h} AS h FROM {table_expr}),
    sketch AS (
      SELECT dd.d AS d, ((h * dd.a + dd.b) % {P31}) % {width} AS col,
             COUNT(*) AS cnt
      FROM base CROSS JOIN dd GROUP BY 1, 2
    ),
    exact AS (
      SELECT {value_expr} AS v, COUNT(*) AS exact_n
      FROM {table_expr} GROUP BY 1
      ORDER BY exact_n DESC, v LIMIT {k}
    ),
    probe AS (
      SELECT e.v, e.exact_n, dd.d,
             ((({md5_int64_sql('CAST(e.v AS VARCHAR)')} % {P31}) * dd.a
               + dd.b) % {P31}) % {width} AS col
      FROM exact e CROSS JOIN dd
    )
    SELECT p.v AS {value_expr}, p.exact_n, MIN(s.cnt) AS est_n
    FROM probe p JOIN sketch s ON p.d = s.d AND p.col = s.col
    GROUP BY 1, 2
    """


def hll_distinct_sql(
    table_expr: str,
    group_cols: list[str],
    value_expr: str,
    p: int = 12,
) -> str:
    """DuckDB twin of :func:`hll_distinct` (same registers, same math)."""
    m = 1 << p
    w_bits = HASH_BITS - p
    g = ", ".join(group_cols)
    h = md5_int64_sql(f"CAST({value_expr} AS VARCHAR)")
    rho = rho_sql(f"h % {1 << w_bits}", w_bits)
    # Inline alpha*m^2 as one double literal — a bare 0.72... literal is
    # DECIMAL in DuckDB and overflows when multiplied by m^2.
    amm = f"CAST({_alpha(m) * m * m!r} AS DOUBLE)"
    return f"""
    WITH hashed AS (
      SELECT {g}, {h} AS h FROM {table_expr}
    ),
    regs AS (
      SELECT {g}, h // {1 << w_bits} AS bucket, MAX({rho}) AS mx
      FROM hashed GROUP BY {g}, bucket
    ),
    per_group AS (
      SELECT {g}, SUM(pow(2.0, -mx)) AS s, COUNT(*) AS nonzero
      FROM regs GROUP BY {g}
    )
    SELECT {g},
           CAST(round(
             CASE WHEN ({amm}) / (s + ({m} - nonzero))
                       <= 2.5 * {m}
                   AND ({m} - nonzero) > 0
                  THEN {float(m)} * ln({float(m)} / ({m} - nonzero))
                  ELSE ({amm}) / (s + ({m} - nonzero))
             END) AS BIGINT) AS approx_distinct
    FROM per_group
    """


def hll_sliding_distinct(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    hours: int = 3,
    p: int = 12,
) -> DataFrame:
    """Distinct estimate per SLIDING window by sketch merge: one hourly
    HLL register table, each hourly sketch exploded into the ``hours``
    windows it covers, merged by register MAX — the mergeability that
    makes sketches the scale answer for overlapping windows (exact
    distinct would re-scan every row once per overlapping window;
    here each row is hashed once and merging touches only registers).
    Output: (win, approx_distinct) where ``win`` is the window END hour.
    """
    m = 1 << p
    w_bits = HASH_BITS - p
    h = md5_int64(F.col(value_col).cast("string"))
    hashed = df.select(
        F.date_trunc("hour", F.col(ts_col)).alias("h0"),
        F.shiftright(h, w_bits).alias("bucket"),
        rho_col(h % (1 << w_bits), w_bits).alias("rho"),
    )
    regs = hashed.groupBy("h0", "bucket").agg(F.max("rho").alias("mx"))
    win = regs.select(
        F.explode(F.array(*[
            F.col("h0") + F.expr(f"INTERVAL {k} HOURS")
            for k in range(hours)
        ])).alias("win"),
        "bucket", "mx",
    )
    merged = win.groupBy("win", "bucket").agg(F.max("mx").alias("mx"))
    per = merged.groupBy("win").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("s"),
        F.count("*").alias("nonzero"),
    )
    raw = F.lit(_alpha(m) * m * m) / (F.col("s") + (m - F.col("nonzero")))
    zeros = F.lit(m) - F.col("nonzero")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw)
    return per.select(
        "win", F.round(est).cast("bigint").alias("approx_distinct"))


def hll_sliding_distinct_sql(
    table_expr: str,
    ts_expr: str,
    value_expr: str,
    hours: int = 3,
    p: int = 12,
) -> str:
    """DuckDB twin of :func:`hll_sliding_distinct`."""
    m = 1 << p
    w_bits = HASH_BITS - p
    h = md5_int64_sql(f"CAST({value_expr} AS VARCHAR)")
    rho = rho_sql(f"h % {1 << w_bits}", w_bits)
    offsets = ", ".join(f"({k})" for k in range(hours))
    amm = f"CAST({_alpha(m) * m * m!r} AS DOUBLE)"
    return f"""
    WITH hashed AS (
      SELECT date_trunc('hour', {ts_expr}) AS h0, {h} AS h
      FROM {table_expr}
    ), regs AS (
      SELECT h0, h // {1 << w_bits} AS bucket, MAX({rho}) AS mx
      FROM hashed GROUP BY h0, bucket
    ), winreg AS (
      SELECT h0 + k.k * INTERVAL 1 HOUR AS win, bucket, mx
      FROM regs, (VALUES {offsets}) k(k)
    ), merged AS (
      SELECT win, bucket, MAX(mx) AS mx FROM winreg GROUP BY win, bucket
    ), per AS (
      SELECT win, SUM(pow(2.0, -mx)) AS s, COUNT(*) AS nonzero
      FROM merged GROUP BY win
    )
    SELECT win,
           CAST(round(
             CASE WHEN ({amm}) / (s + ({m} - nonzero)) <= 2.5 * {m}
                   AND ({m} - nonzero) > 0
                  THEN {float(m)} * ln({float(m)} / ({m} - nonzero))
                  ELSE ({amm}) / (s + ({m} - nonzero))
             END) AS BIGINT) AS approx_distinct
    FROM per
    """


# --------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) distinct sketch — Bar-Yossef et al.
# 2002. Keep the k smallest distinct hash values; with hashes uniform on
# [0, 2^60), E[distinct] ~ (k-1) * 2^60 / h_(k). Unlike HLL the sketch
# IS a deterministic function of the value set (the k smallest hashes),
# so an oracle replays the estimate bit-for-bit — and set operations
# (union = merge-and-retrim) come free.
# --------------------------------------------------------------------------
KMV_SALT_BUCKETS = 64


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV distinct estimate of ``value_col``.

    Scale shape: one distinct-reducing shuffle on (group, hash) with
    map-side combine, then TWO-LEVEL selection of the k smallest hashes
    (the exact-quantile discipline): level 1 ranks within (group,
    hash % 64) salt buckets — each window task sees ~1/64 of a group's
    distinct hashes and keeps at most k; level 2 ranks the surviving
    <= 64k rows per group. No group ever funnels its full distinct set
    through one task. Groups with fewer than k distinct values report
    exactly (the standard KMV small-set rule: the sketch holds the
    whole set).
    """
    from pyspark.sql.window import Window

    h = md5_int64(F.col(value_col).cast("string"))
    distinct_h = (
        df.select(*group_cols, h.alias("h"))
        .groupBy(*group_cols, "h").agg(F.lit(1).alias("one"))
    )
    lvl1 = Window.partitionBy(
        *group_cols, F.pmod(F.col("h"), F.lit(KMV_SALT_BUCKETS))
    ).orderBy("h")
    lvl2 = Window.partitionBy(*group_cols).orderBy("h")
    bottom = (
        distinct_h
        .withColumn("r1", F.row_number().over(lvl1))
        .filter(F.col("r1") <= k)
        .withColumn("r2", F.row_number().over(lvl2))
        .filter(F.col("r2") <= k)
    )
    per = bottom.groupBy(*group_cols).agg(
        F.count("*").alias("n_k"), F.max("h").alias("h_k"))
    est = F.when(
        F.col("n_k") < k, F.col("n_k").cast("double")
    ).otherwise(
        # (k-1)*2^60 is an exact double (k-1 < 2^11); h_k rounds to
        # nearest double identically in any IEEE engine; one division.
        F.lit(float((k - 1) * (1 << HASH_BITS))) / F.col("h_k").cast("double")
    )
    return per.select(
        *group_cols, F.round(est).cast("bigint").alias("approx_distinct"))


def kmv_distinct_sql(
    table_expr: str,
    group_exprs: list[str],
    value_expr: str,
    k: int = 256,
) -> str:
    """DuckDB twin of :func:`kmv_distinct` (same hash, same estimator)."""
    g = ", ".join(group_exprs)
    h = md5_int64_sql(f"CAST({value_expr} AS VARCHAR)")
    return f"""
    WITH dh AS (
      SELECT DISTINCT {g}, {h} AS h FROM {table_expr}
    ), bottom AS (
      SELECT {g}, h,
             row_number() OVER (PARTITION BY {g} ORDER BY h) AS r
      FROM dh
    ), per AS (
      SELECT {g}, COUNT(*) AS n_k, MAX(h) AS h_k
      FROM bottom WHERE r <= {k} GROUP BY {g}
    )
    SELECT {g},
           CAST(round(CASE WHEN n_k < {k} THEN CAST(n_k AS DOUBLE)
                ELSE CAST({float((k - 1) * (1 << HASH_BITS))!r} AS DOUBLE)
                     / CAST(h_k AS DOUBLE) END) AS BIGINT)
             AS approx_distinct
    FROM per
    """


def kmv_set_ops(
    df: DataFrame,
    set_col: str,
    value_col: str,
    set_a: str,
    set_b: str,
    k: int = 256,
) -> DataFrame:
    """One-row KMV SET-OPERATION readout for two sets: per-set distinct
    estimates, union estimate (merge-and-retrim), intersection estimate
    (the Jaccard-over-K rule: rho = |K n A n B| / |K| scaled by the
    union estimate), plus the exact intersection for error accounting.

    Everything after the two bottom-k selections is <= 2k rows, so the
    set algebra itself is constant-sized no matter the input: at 100 TB
    the sketches are what moves, never the value sets. Deterministic
    (the sketch is the k smallest md5 hashes), so oracles replay it
    bit-for-bit — the property HLL set ops lack.
    """
    from pyspark.sql.window import Window

    k1 = float((k - 1) * (1 << HASH_BITS))
    h = md5_int64(F.col(value_col).cast("string"))
    tagged = df.filter(F.col(set_col).isin([set_a, set_b])).select(
        F.when(F.col(set_col) == set_a, "a").otherwise("b").alias("s"),
        F.col(value_col).alias("v"), h.alias("h"))
    dh = tagged.select("s", "h").distinct()
    lvl1 = Window.partitionBy(
        "s", F.pmod(F.col("h"), F.lit(KMV_SALT_BUCKETS))).orderBy("h")
    lvl2 = Window.partitionBy("s").orderBy("h")
    bottom = (
        dh.withColumn("r1", F.row_number().over(lvl1))
        .filter(F.col("r1") <= k)
        .withColumn("r2", F.row_number().over(lvl2))
        .filter(F.col("r2") <= k)
        .select("s", "h")
    ).localCheckpoint()  # <= 2k rows, reused by four tiny legs

    est = F.when(F.col("n_k") < k, F.col("n_k").cast("double")).otherwise(
        F.lit(k1) / F.col("h_k").cast("double"))
    per = (bottom.groupBy("s")
           .agg(F.count("*").alias("n_k"), F.max("h").alias("h_k"))
           .select("s", est.alias("est")))
    ests = per.groupBy().agg(
        F.max(F.when(F.col("s") == "a", F.col("est"))).alias("est_a"),
        F.max(F.when(F.col("s") == "b", F.col("est"))).alias("est_b"))

    ku = (bottom.select("h").distinct().orderBy("h").limit(k)
          .localCheckpoint())  # bottom-k of the union (TakeOrdered)
    usum = ku.agg(F.count("*").alias("m_u"), F.max("h").alias("t"))
    both = (bottom.filter(F.col("s") == "a").select("h")
            .join(bottom.filter(F.col("s") == "b").select("h"), "h")
            .join(ku, "h"))
    isum = both.agg(F.count("*").alias("m_i"))

    exact = (tagged.groupBy("v")
             .agg(F.max(F.when(F.col("s") == "a", 1).otherwise(0))
                  .alias("ina"),
                  F.max(F.when(F.col("s") == "b", 1).otherwise(0))
                  .alias("inb"))
             .filter((F.col("ina") == 1) & (F.col("inb") == 1))
             .agg(F.count("*").alias("exact_inter")))

    union_est = F.when(F.col("m_u") < k, F.col("m_u").cast("double")) \
        .otherwise(F.lit(k1) / F.col("t").cast("double"))
    row = (ests.crossJoin(usum).crossJoin(isum).crossJoin(exact))
    jac = F.col("m_i").cast("double") / F.col("m_u").cast("double")
    return row.select(
        F.lit(k).cast("int").alias("k"),
        F.round("est_a").cast("bigint").alias("est_a"),
        F.round("est_b").cast("bigint").alias("est_b"),
        F.round(union_est).cast("bigint").alias("est_union"),
        F.round(jac * union_est).cast("bigint").alias("est_inter"),
        F.round(jac, 6).alias("jaccard_est"),
        F.col("exact_inter").cast("bigint").alias("exact_inter"),
    )


def kmv_set_ops_sql(
    table_expr: str,
    set_expr_a: str,
    set_expr_b: str,
    value_expr: str,
    k: int = 256,
) -> str:
    """DuckDB twin of :func:`kmv_set_ops` (same hashes, same rules).
    ``set_expr_a``/``set_expr_b`` are boolean SQL predicates."""
    k1 = float((k - 1) * (1 << HASH_BITS))
    h = md5_int64_sql(f"CAST({value_expr} AS VARCHAR)")
    return f"""
    WITH tagged AS (
      SELECT CASE WHEN {set_expr_a} THEN 'a' ELSE 'b' END AS s,
             {value_expr} AS v, {h} AS h
      FROM {table_expr} WHERE ({set_expr_a}) OR ({set_expr_b})
    ), dh AS (
      SELECT DISTINCT s, h FROM tagged
    ), bottom AS (
      SELECT s, h FROM (
        SELECT s, h, row_number() OVER (PARTITION BY s ORDER BY h) AS r
        FROM dh) WHERE r <= {k}
    ), per AS (
      SELECT s, COUNT(*) AS n_k, MAX(h) AS h_k FROM bottom GROUP BY s
    ), ests AS (
      SELECT
        MAX(CASE WHEN s = 'a' THEN est END) AS est_a,
        MAX(CASE WHEN s = 'b' THEN est END) AS est_b
      FROM (SELECT s, CASE WHEN n_k < {k} THEN CAST(n_k AS DOUBLE)
                 ELSE CAST({k1!r} AS DOUBLE) / CAST(h_k AS DOUBLE) END
                 AS est FROM per)
    ), ku AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS r
        FROM (SELECT DISTINCT h FROM bottom)) WHERE r <= {k}
    ), usum AS (
      SELECT COUNT(*) AS m_u, MAX(h) AS t FROM ku
    ), isum AS (
      SELECT COUNT(*) AS m_i FROM ku
      WHERE h IN (SELECT h FROM bottom WHERE s = 'a')
        AND h IN (SELECT h FROM bottom WHERE s = 'b')
    ), exact AS (
      SELECT COUNT(*) AS exact_inter FROM (
        SELECT v FROM tagged GROUP BY v
        HAVING MAX(CASE WHEN s = 'a' THEN 1 ELSE 0 END) = 1
           AND MAX(CASE WHEN s = 'b' THEN 1 ELSE 0 END) = 1)
    )
    SELECT CAST({k} AS INT) AS k,
           CAST(round(est_a) AS BIGINT) AS est_a,
           CAST(round(est_b) AS BIGINT) AS est_b,
           CAST(round(u_est) AS BIGINT) AS est_union,
           CAST(round((CAST(m_i AS DOUBLE) / CAST(m_u AS DOUBLE)) * u_est)
                AS BIGINT) AS est_inter,
           round(CAST(m_i AS DOUBLE) / CAST(m_u AS DOUBLE), 6)
               AS jaccard_est,
           CAST(exact_inter AS BIGINT) AS exact_inter
    FROM ests, isum, exact,
         (SELECT m_u, CASE WHEN m_u < {k} THEN CAST(m_u AS DOUBLE)
                 ELSE CAST({k1!r} AS DOUBLE) / CAST(t AS DOUBLE) END
                 AS u_est FROM usum)
    """
