#!/usr/bin/env python
"""Derive a SEED-SHIFTED sf0.01 corpus (VERDICT r6 task #1).

Every correctness claim so far rests on one fixed fixture (seed=42,
``/root/testdata``). A query+oracle pair could in principle be tuned to
that fixture's idiosyncrasies — hash-bucket boundary luck, value
distributions, which keys land in which LSH band — and still go green.
This tool derives a second corpus with the SAME schemas and FK graph
but different values everywhere that matters, so
``tools/check_correctness.py`` can re-gate the full registry on data
nobody tuned against.

Transform design (all pure key/text arithmetic — deterministic for a
given ``--seed``, no RNG state):

* **Keys are permuted within their dense [0, N) domains** by affine
  bijections ``k -> (a*k + b) mod N`` with ``gcd(a, N) = 1``, applied
  CONSISTENTLY across FK pairs (orders/lineitem share the orderkey
  permutation; customer/orders the custkey one; part, supplier,
  events.user_id, documents/embeddings likewise). Range-preserving on
  purpose: bounded slices like ``doc_id < 200`` keep their row counts
  but select a DIFFERENT subset, and every md5/xxhash-derived bucket
  (sampling, splits, LSH bands) reshuffles.
* **Numerics jitter** by key-derived deltas (prices, balances,
  quantities, event values); ``l_discount``/``l_tax`` move within
  their semantic [0, 0.1] domains so BETWEEN-style filters select a
  different row population.
* **Timestamps shift** by a seed-constant plus per-row jitter —
  session gaps, as-of pairings, week/cohort boundaries, and funnel
  orderings all land differently.
* **Categories rotate** for a keyed fraction of rows
  (``event_type``) so funnel/session paths change shape.
* **Document text** gains a prefix/suffix token derived from the TEXT
  hash (not the key), so exact-duplicate groups stay exact duplicates
  and near-dup distances are preserved while every shingle set,
  minhash signature, and simhash moves. ``n_chars`` is recomputed.
* **Embeddings** get per-component multiplicative+additive jitter
  keyed on (vec_id, i); labels rotate mod 10.
* ``region``/``nation`` copy verbatim (5/25-row dims; every join
  through them still exercises the shifted fact side).

Output schemas are cast to the source footer schemas field-for-field,
so ``load_table`` and the DuckDB views see exactly the shapes the
fixed corpus has.

Usage: python tools/seedshift_dataset.py [out_dir] [--seed N]
       (defaults: /tmp/pypeman_seedshift_sf0.01, seed=1337)
Then:  python tools/check_correctness.py <out_dir> --json \
           CORRECTNESS_seedshift_rNN.json
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SEEDSHIFT_SRC", "/root/testdata/sf0.01")

EVENT_TYPES = ["signup", "view", "click", "purchase", "error"]


def _affine(N: int, seed: int, salt: int) -> tuple[int, int]:
    """(a, b) for a range-preserving bijection k -> (a*k+b) % N."""
    a = 2 * ((seed * 2654435761 + salt * 40503) % max(N // 2, 1)) + 1
    while math.gcd(a, N) != 1:
        a += 2
    b = (seed * 97 + salt * 131071) % N
    return a % N or 1, b


def perm(keys: np.ndarray, N: int, seed: int, salt: int) -> np.ndarray:
    a, b = _affine(N, seed, salt)
    return (keys.astype(np.int64) * a + b) % N


def kj(keys: np.ndarray, seed: int, salt: int, mod: int) -> np.ndarray:
    """Key-derived jitter in [-mod//2, mod - mod//2): deterministic
    pseudo-noise from pure integer arithmetic."""
    h = (keys.astype(np.int64) * 1103515245 + seed * 12345 + salt * 2971)
    return (h % mod) - mod // 2


def read(name: str) -> tuple[pa.Table, pa.Schema]:
    t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    return t, t.schema


def write(out_dir: str, name: str, cols: dict, schema: pa.Schema) -> None:
    t = pa.table({f.name: cols[f.name] for f in schema})
    t = t.cast(schema)
    pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
    print(f"wrote {name}: {t.num_rows} rows")


def text_hash(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?",
                    default="/tmp/pypeman_seedshift_sf0.01")
    ap.add_argument("--seed", type=int, default=1337)
    args = ap.parse_args()
    seed = args.seed
    os.makedirs(args.out_dir, exist_ok=True)

    # dims copied verbatim
    for name in ("region", "nation"):
        t, sch = read(name)
        pq.write_table(t, os.path.join(args.out_dir, f"{name}.parquet"))
        print(f"copied {name}: {t.num_rows} rows")

    # customer: permute custkey (shared with orders), jitter balance
    t, sch = read("customer")
    c = {n: t[n].to_numpy(zero_copy_only=False) for n in t.column_names}
    # domains derived from the data (dense [0, N) keys at every SF),
    # never hardcoded: the r7 constants were sf0.01-only and collapsed
    # keys into a 10x-smaller range at sf0.1 (caught by the r8 sf0.1 gate)
    n_cust = int(c["c_custkey"].max()) + 1
    c["c_custkey"] = perm(c["c_custkey"], n_cust, seed, 1)
    c["c_acctbal"] = (
        c["c_acctbal"] + kj(c["c_custkey"], seed, 2, 997) / 100.0
    )
    write(args.out_dir, "customer", c, sch)

    # supplier / part: permute their keys (shared with lineitem)
    t, sch = read("supplier")
    s = {n: t[n].to_numpy(zero_copy_only=False) for n in t.column_names}
    n_supp = int(s["s_suppkey"].max()) + 1
    s["s_suppkey"] = perm(s["s_suppkey"], n_supp, seed, 3)
    s["s_acctbal"] = s["s_acctbal"] + kj(s["s_suppkey"], seed, 4, 797) / 100.0
    write(args.out_dir, "supplier", s, sch)

    t, sch = read("part")
    p = {n: t[n].to_numpy(zero_copy_only=False) for n in t.column_names}
    n_part = int(p["p_partkey"].max()) + 1
    p["p_partkey"] = perm(p["p_partkey"], n_part, seed, 5)
    p["p_retailprice"] = (
        p["p_retailprice"] * (1 + kj(p["p_partkey"], seed, 6, 19) / 1000.0)
    )
    p["p_size"] = np.clip(
        p["p_size"] + kj(p["p_partkey"], seed, 7, 3), 1, None
    )
    write(args.out_dir, "part", p, sch)

    # orders: orderkey perm shared with lineitem; custkey perm from
    # customer; date shift (constant + per-row days); price jitter
    t, sch = read("orders")
    o = {n: t[n].to_numpy(zero_copy_only=False) for n in t.column_names}
    n_ord = int(o["o_orderkey"].max()) + 1
    okey = perm(o["o_orderkey"], n_ord, seed, 8)
    o["o_orderkey"] = okey
    o["o_custkey"] = perm(o["o_custkey"], n_cust, seed, 1)
    o["o_totalprice"] = (
        o["o_totalprice"] * (1 + kj(okey, seed, 9, 19) / 1000.0)
    )
    day = np.timedelta64(86400, "s")
    o["o_orderdate"] = (
        o["o_orderdate"].astype("datetime64[us]")
        + (seed % 37 - 18) * day + kj(okey, seed, 10, 7) * day
    )
    write(args.out_dir, "orders", o, sch)

    # lineitem: FK-consistent key perms; jitter qty/price; move
    # discount/tax INSIDE their semantic domains; shipdate jitter
    t, sch = read("lineitem")
    li = {n: t[n].to_numpy(zero_copy_only=False) for n in t.column_names}
    lkey = perm(li["l_orderkey"], n_ord, seed, 8)
    rowk = lkey * 8 + li["l_linenumber"].astype(np.int64)
    li["l_orderkey"] = lkey
    li["l_partkey"] = perm(li["l_partkey"], n_part, seed, 5)
    li["l_suppkey"] = perm(li["l_suppkey"], n_supp, seed, 3)
    li["l_quantity"] = np.clip(li["l_quantity"] + kj(rowk, seed, 11, 5), 1, None)
    li["l_extendedprice"] = (
        li["l_extendedprice"] * (1 + kj(rowk, seed, 12, 19) / 1000.0)
    )
    li["l_discount"] = np.round(
        np.clip(li["l_discount"] + kj(rowk, seed, 13, 5) * 0.01, 0.0, 0.10), 2
    )
    li["l_tax"] = np.round(
        np.clip(li["l_tax"] + kj(rowk, seed, 14, 5) * 0.01, 0.0, 0.08), 2
    )
    li["l_shipdate"] = (
        li["l_shipdate"].astype("datetime64[us]")
        + (seed % 37 - 18) * day + kj(rowk, seed, 15, 11) * day
    )
    write(args.out_dir, "lineitem", li, sch)

    # events: id/user perms; ts constant+jitter shift; value jitter;
    # rotate event_type for a keyed ~20% of rows
    t, sch = read("events")
    e = {n: t[n].to_numpy(zero_copy_only=False) for n in t.column_names}
    ekey = perm(e["event_id"], int(e["event_id"].max()) + 1, seed, 16)
    e["event_id"] = ekey
    e["user_id"] = perm(e["user_id"], int(e["user_id"].max()) + 1, seed, 17)
    sec = np.timedelta64(1, "s")
    e["ts"] = (
        e["ts"].astype("datetime64[us]")
        + (seed % 13) * day + kj(ekey, seed, 18, 601) * sec
    )
    e["value"] = e["value"] + kj(ekey, seed, 19, 997) / 1000.0
    rotate = (ekey * 7 + seed) % 5 == 0
    idx = {et: i for i, et in enumerate(EVENT_TYPES)}
    types = e["event_type"].astype(object)
    rot = np.array(
        [EVENT_TYPES[(idx[et] + 1) % 5] for et in types], dtype=object
    )
    e["event_type"] = np.where(rotate, rot, types)
    write(args.out_dir, "events", e, sch)

    # documents: doc_id perm (shared with embeddings); text perturbed
    # via TEXT-hash tokens so duplicate groups transform identically
    t, sch = read("documents")
    d = {n: t[n].to_numpy(zero_copy_only=False) for n in t.column_names}
    d["doc_id"] = perm(d["doc_id"], int(d["doc_id"].max()) + 1, seed, 20)
    new_text = []
    for txt in d["text"].astype(object):
        h = text_hash(txt) ^ seed
        new_text.append(f"d{h % 977} {txt} w{h % 101}")
    d["text"] = np.array(new_text, dtype=object)
    d["n_chars"] = np.array([len(s) for s in new_text], dtype=np.int64)
    write(args.out_dir, "documents", d, sch)

    # embeddings: vec_id perm consistent with documents; per-component
    # jitter; label rotation
    t, sch = read("embeddings")
    # own dense domain (vec count < doc count at sf>=0.1); same salt
    # so at sf0.01 (equal domains) the permutation matches r7 exactly
    vid = perm(t["vec_id"].to_numpy(), int(t["vec_id"].to_numpy().max()) + 1, seed, 20)
    emb = t["embedding"].to_pylist()
    new_emb = []
    for v, k in zip(emb, vid):
        k = int(k)
        new_emb.append([
            np.float32(
                x * (1 + ((k * 31 + i * 7 + seed) % 11 - 5) / 1000.0)
                + ((k * 17 + i * 3 + seed) % 7 - 3) / 1000.0
            )
            for i, x in enumerate(v)
        ])
    lab = t["label"].to_numpy()
    cols = {
        "vec_id": vid,
        "embedding": new_emb,
        "label": (lab.astype(np.int64) + vid * 3 + seed) % 10,
    }
    write(args.out_dir, "embeddings", cols, sch)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
