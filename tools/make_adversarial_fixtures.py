#!/usr/bin/env python
"""Generate the ADVERSARIAL fixture set: sf0.001 with NULLs seeded into
every nullable analytics column and a non-64 embedding dimension.

Why this exists: rounds 5-6 fixed at least seven cross-engine
divergences one at a time (KS, Theil-Sen, CUSUM, Markov, autocorr,
drawdown NULL guards; Hampel NULL FILTER; centroid-drift 64-dim cap)
that all share one cause — the stock fixtures are null-free and
exactly-64-dim, so Spark-vs-DuckDB NULL-ordering (Spark sorts NULLS
FIRST asc, DuckDB NULLS LAST) and hardcoded-dimension divergences never
fail locally. Running the full oracle gate on THIS set turns that whole
latent class into a local test failure.

What it produces (deterministic, no RNG — NULL positions are a pure
function of the row key, so reruns are byte-stable):

- ``events``:    ts 2% NULL, value 5%, props 5%, event_type 1%,
                 user_id 1% (each from an independent hash stream)
- ``documents``: text 5% NULL (n_chars NULLed with it — they describe
                 the same content), an extra 1% empty-string text
                 (empty != NULL in both engines — catches guards that
                 test only one), lang 3%
- ``embeddings``: dimension changed 64 -> $ADV_DIM (default 48;
                 truncation for <64, mirror-extend for >64),
                 embedding 2% NULL, label 2% NULL
- TPC-H tables:  byte-identical copies (the NULL-divergence class lives
                 in the analytics tables; TPC-H data is NULL-free by
                 spec in every deployment this engine would read)

Usage:  python tools/make_adversarial_fixtures.py [out_dir]
        ADV_DIM=96 python tools/make_adversarial_fixtures.py
Default out_dir: tools/advdata/sf0.001adv-d{ADV_DIM} (gitignored;
``make gate-adv`` regenerates + runs the full oracle gate on it).
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
ADV_DIM = int(os.environ.get("ADV_DIM", "48"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TPCH = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
]


def _mask(keys: np.ndarray, permille: int, salt: int) -> np.ndarray:
    """Deterministic per-row boolean mask: True for ~permille/1000 rows.

    Knuth multiplicative hash over (key + salt) in uint64 wraparound —
    independent streams per salt, stable across runs and platforms.
    """
    h = (keys.astype(np.uint64) + np.uint64(salt)) * np.uint64(2654435761)
    h ^= h >> np.uint64(16)
    return (h % np.uint64(1000)) < np.uint64(permille)


def _null_out(table: pa.Table, col: str, mask: np.ndarray) -> pa.Table:
    i = table.schema.get_field_index(col)
    arr = table.column(col).combine_chunks()
    nulled = pc.if_else(pa.array(mask), pa.nulls(len(table), arr.type), arr)
    return table.set_column(i, table.field(i), nulled)


def make_events(out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, "events.parquet"))
    keys = t.column("event_id").to_numpy()
    t = _null_out(t, "ts", _mask(keys, 20, 101))
    t = _null_out(t, "value", _mask(keys, 50, 202))
    t = _null_out(t, "props", _mask(keys, 50, 303))
    t = _null_out(t, "event_type", _mask(keys, 10, 404))
    t = _null_out(t, "user_id", _mask(keys, 10, 505))
    pq.write_table(t, os.path.join(out_dir, "events.parquet"))


def make_documents(out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    keys = t.column("doc_id").to_numpy()
    text_null = _mask(keys, 50, 606)
    t = _null_out(t, "text", text_null)
    t = _null_out(t, "n_chars", text_null)  # metadata follows its content
    t = _null_out(t, "lang", _mask(keys, 30, 707))
    # empty-string text (distinct from NULL in both engines); n_chars -> 0
    empty = _mask(keys, 10, 808) & ~text_null
    ti = t.schema.get_field_index("text")
    text = pc.if_else(
        pa.array(empty), pa.array([""] * len(t)), t.column("text").combine_chunks()
    )
    t = t.set_column(ti, t.field(ti), text)
    ni = t.schema.get_field_index("n_chars")
    n_chars = pc.if_else(
        pa.array(empty),
        pa.array(np.zeros(len(t), dtype=np.int64)),
        t.column("n_chars").combine_chunks(),
    )
    t = t.set_column(ni, t.field(ni), n_chars)
    pq.write_table(t, os.path.join(out_dir, "documents.parquet"))


def _reshape(vec: np.ndarray, dim: int) -> np.ndarray:
    if dim <= len(vec):
        return vec[:dim]
    # mirror-extend: deterministic, keeps the value distribution
    reps = [vec]
    while sum(len(r) for r in reps) < dim:
        reps.append(-vec[::-1])
    return np.concatenate(reps)[:dim]


def make_embeddings(out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    keys = t.column("vec_id").to_numpy()
    vecs = t.column("embedding").to_pylist()
    emb_null = _mask(keys, 20, 909)
    out_vecs = [
        None
        if emb_null[i]
        else _reshape(np.asarray(v, dtype=np.float32), ADV_DIM).tolist()
        for i, v in enumerate(vecs)
    ]
    emb = pa.array(out_vecs, type=pa.list_(pa.float32()))
    ei = t.schema.get_field_index("embedding")
    t = t.set_column(ei, pa.field("embedding", pa.list_(pa.float32())), emb)
    t = _null_out(t, "label", _mask(keys, 20, 111))
    pq.write_table(t, os.path.join(out_dir, "embeddings.parquet"))


def main() -> None:
    out_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "tools", "advdata", f"sf0.001adv-d{ADV_DIM}")
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in TPCH:
        shutil.copyfile(
            os.path.join(SRC, f"{name}.parquet"),
            os.path.join(out_dir, f"{name}.parquet"),
        )
    make_events(out_dir)
    make_documents(out_dir)
    make_embeddings(out_dir)
    for name in ["events", "documents", "embeddings"]:
        t = pq.read_table(os.path.join(out_dir, f"{name}.parquet"))
        nulls = {
            c: t.column(c).null_count
            for c in t.column_names
            if t.column(c).null_count
        }
        print(f"{name}: {t.num_rows} rows, nulls={nulls}")
    print(f"adversarial fixtures (dim={ADV_DIM}) -> {out_dir}")


if __name__ == "__main__":
    main()
