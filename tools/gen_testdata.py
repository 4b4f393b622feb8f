"""Distribution-faithful testdata generator for scale factors the driver
did not ship (the driver generates /root/testdata/sf{0.001,0.01,0.1};
round-8 judge item #1 asks for a measured sf1 decade on top).

The driver's generator is not available, so this one was reverse-fitted
to the shipped parquet (schemas, row counts, value ranges, category
shares, per-order line-count shape, text vocab/word-count law, embedding
norm/labels — audited side-by-side in SCALING.md §sf1). It is NOT
byte-identical to the driver data; it is distribution-identical where the
engine's work is determined (row counts, key cardinalities, join fan-outs,
text lengths, duplicate structure), which is what a timing ratio needs.

Row-count laws observed from the shipped SFs:
  customer 150k*sf, supplier 10k*sf, part 200k*sf, orders 1.5M*sf,
  lineitem 6M*sf, events 1M*sf (users 15k*sf),
  documents max(500, 50k*sf), embeddings max(500, 20k*sf).

Usage: python tools/gen_testdata.py <sf> <out_dir>   # e.g. 1 testdata/sf1
Deterministic: numpy PCG64 seeded per (table, sf).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "P", "F"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
P_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]
P_ADJ = ["large", "hot", "blue", "red", "green", "small", "dim", "shiny"]
P_NOUN = ["ring", "bolt", "washer", "gear", "plate", "rod", "cap", "nut"]
# the 31-word vocab observed verbatim in the shipped documents table
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]

EPOCH_1995 = np.datetime64("1995-01-01")
EPOCH_2024 = np.datetime64("2024-01-01")
DAY_US = 86_400_000_000


def _rng(table: str, sf: float) -> np.random.Generator:
    # zlib.crc32, not hash(): str hash is salted per process (PYTHONHASHSEED)
    import zlib

    return np.random.default_rng(
        np.random.SeedSequence(
            [42, zlib.crc32(table.encode()), int(sf * 1e6)]
        )
    )


def _ts_us(base: np.datetime64, micros: np.ndarray) -> pa.Array:
    return pa.array(
        base.astype("datetime64[us]") + micros.astype("timedelta64[us]"),
        type=pa.timestamp("us"),
    )


def _write(out: Path, name: str, table: pa.Table, row_group_rows: int) -> None:
    pq.write_table(
        table, out / f"{name}.parquet",
        row_group_size=row_group_rows, compression="snappy",
    )
    print(f"{name}: {table.num_rows} rows", file=sys.stderr)


def gen(sf: float, out_dir: str) -> dict:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }), 5)
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }), 25)

    r = _rng("customer", sf)
    _write(out, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": r.integers(0, 25, n_cust, dtype=np.int32),
        "c_acctbal": np.round(r.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[r.integers(0, 5, n_cust)],
    }), 1 << 19)

    r = _rng("supplier", sf)
    _write(out, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": r.integers(0, 25, n_supp, dtype=np.int32),
        "s_acctbal": np.round(r.uniform(-1000, 10_000, n_supp), 2),
    }), 1 << 19)

    r = _rng("part", sf)
    adj = np.array(P_ADJ)[r.integers(0, len(P_ADJ), n_part)]
    noun = np.array(P_NOUN)[r.integers(0, len(P_NOUN), n_part)]
    _write(out, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": np.array([f"Brand#{b}" for b in range(25)])[
            r.integers(0, 25, n_part)],
        "p_type": np.array(P_TYPES)[r.integers(0, len(P_TYPES), n_part)],
        "p_size": r.integers(1, 51, n_part, dtype=np.int32),
        "p_retailprice": 900.0 + (np.arange(n_part) % 1000) / 10.0,
    }), 1 << 19)

    r = _rng("orders", sf)
    o_days = r.integers(0, (np.datetime64("2001-08-02") - EPOCH_1995)
                        .astype(int), n_ord)
    _write(out, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": r.integers(0, n_cust, n_ord, dtype=np.int64),
        "o_orderstatus": np.array(STATUSES)[r.integers(0, 3, n_ord)],
        "o_totalprice": np.round(r.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_us(EPOCH_1995, o_days * DAY_US),
        "o_orderpriority": np.array(PRIORITIES)[r.integers(0, 5, n_ord)],
    }), 1 << 19)

    r = _rng("lineitem", sf)
    # each line picks its order uniformly -> per-order line counts are
    # Binomial(n_li, 1/n_ord) ~ Poisson(4), matching the shipped shape
    lo = np.sort(r.integers(0, n_ord, n_li, dtype=np.int64))
    # l_linenumber = 1..k within each order (lo is sorted)
    first = np.r_[True, lo[1:] != lo[:-1]]
    idx = np.arange(n_li, dtype=np.int64)
    linenum = (idx - np.maximum.accumulate(np.where(first, idx, 0)) + 1)
    ship_lag = r.integers(1, 96, n_li)
    _write(out, "lineitem", pa.table({
        "l_orderkey": lo,
        "l_partkey": r.integers(0, n_part, n_li, dtype=np.int64),
        "l_suppkey": r.integers(0, n_supp, n_li, dtype=np.int64),
        "l_linenumber": linenum.astype(np.int32),
        "l_quantity": r.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(r.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(r.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(r.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(RETURNFLAGS)[r.integers(0, 3, n_li)],
        "l_linestatus": np.array(LINESTATUSES)[r.integers(0, 2, n_li)],
        "l_shipdate": _ts_us(EPOCH_1995, (o_days[lo] + ship_lag) * DAY_US),
    }), 1 << 19)

    r = _rng("events", sf)
    span_us = 30 * DAY_US
    _write(out, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": _ts_us(EPOCH_2024, np.sort(r.integers(0, span_us, n_ev))),
        "user_id": r.integers(0, n_users, n_ev, dtype=np.int64),
        "event_type": np.array(EVENT_TYPES)[r.integers(0, 5, n_ev)],
        "value": np.round(r.exponential(50.0, n_ev), 2),
        "props": np.array([f'{{"k": {k}}}' for k in range(100)])[
            r.integers(0, 100, n_ev)],
    }), 1 << 19)

    r = _rng("documents", sf)
    n_words = r.integers(10, 101, n_doc)
    flat = np.array(VOCAB)[r.integers(0, len(VOCAB), int(n_words.sum()))]
    bounds = np.r_[0, np.cumsum(n_words)]
    texts = [" ".join(flat[bounds[i]:bounds[i + 1]]) for i in range(n_doc)]
    _write(out, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS)[r.choice(5, n_doc, p=LANG_P)],
        "source": np.array([f"src{i % 20}" for i in range(n_doc)]),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }), 1 << 16)

    r = _rng("embeddings", sf)
    labels = r.integers(0, 10, n_emb, dtype=np.int32)
    centers = r.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = centers[labels] * 0.8 + r.normal(scale=0.25, size=(n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": labels,
    }), 1 << 16)

    return {"sf": sf, "dir": str(out), "lineitem_rows": n_li,
            "documents_rows": n_doc, "embeddings_rows": n_emb}


if __name__ == "__main__":
    sf = float(sys.argv[1])
    out_dir = sys.argv[2]
    print(json.dumps(gen(sf, out_dir)))
