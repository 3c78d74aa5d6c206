#!/usr/bin/env python
"""Generate a scale-decade fixture (sf1 = 10x sf0.1) for the scaling
rehearsal (judge r4 item 1): /root/testdata is read-only and the
driver only ships sf<=0.1, so the decade fixture is derived here, into
the repo-local (gitignored) scale/ dir.

Upsampling must preserve workload SELF-SIMILARITY, or the rehearsal
measures data artifacts instead of plan scaling:

- relational tables: 10 key-shifted copies (every foreign key shifted
  by the same per-domain stride), so join fan-outs, group
  cardinalities per key, and selectivities are exactly those of sf0.1
  with 10x the keys. Tiny dims (region/nation) stay fixed — they are
  broadcast dims at every scale.
- documents: copy i prefixes every whitespace token with the copy tag
  (`7the 7quick ...`). In-copy shingle/Jaccard structure is EXACTLY
  preserved (a common per-token bijection), cross-copy shingle overlap
  is zero — so near-dup pair counts scale ~10x, not the ~45x/doc an
  exact duplication would inject. Vocabulary grows ~10x with the
  corpus, which is the intended stress for the no-broadcast count
  tables (SURVEY: "bigram vocab is corpus-scale at 100 TB").
- embeddings: copy i cyclically rolls the 64 dims by 7*i. Cosine is
  invariant under a common permutation (in-copy ANN structure exactly
  preserved); a vector vs its rolled copy is decorrelated, so
  cross-copy cosines sit near 0 and pair counts scale ~10x.
- dims-expansion (r11 verdict item 1): `dims` > the source width
  lifts every vector to the target width BEFORE the per-copy
  transform, via block-isometry: the 768-dim vector is 12 blocks,
  block b = (md5 sign-diagonal ∘ roll(b*17)) applied to the 64-dim
  source (block 0 = identity, so the original vector is the prefix).
  Every block transform is orthogonal, so
  cosine(expand(x), expand(y)) == cosine(x, y) EXACTLY in real
  arithmetic — the in-copy ANN/near-dup structure of the d=64 fixture
  carries over unchanged — while the random-cosine spread tightens
  from std 1/√64 = 0.125 (a 0.4 threshold at ~3.2σ — the named
  ceiling #2 cross-copy tail) to 1/√768 = 0.036 (0.4 at ~11σ: the
  tail vanishes, as it does for real d≥512 corpora).

Deterministic (pure arithmetic on the sf0.1 rows, no RNG).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(t):
    return pq.read_table(f"{SRC}/{t}.parquet").to_pandas()


def _stride(df, col):
    return int(df[col].max()) + 1


def expand_dims(mat: "np.ndarray", target: int) -> "np.ndarray":
    """Lift (n, d) vectors to (n, target) via block-isometries (see
    module docstring). target must be a multiple of d. Block 0 is the
    identity; block b applies roll(b*17) then an md5-derived ±1
    diagonal — each orthogonal, so pairwise cosines are preserved
    exactly (the whole map is sqrt(n_blocks) × an isometry)."""
    import hashlib

    d = mat.shape[1]
    if target % d:
        raise ValueError(f"target {target} not a multiple of source dims {d}")
    blocks = []
    for b in range(target // d):
        if b == 0:
            blocks.append(mat)
            continue
        rolled = np.roll(mat, b * 17, axis=1)
        sign = np.ones(d)
        for dd in range(d):
            h = hashlib.md5(f"expand:{b}:{dd}".encode()).digest()
            if h[0] & 1:
                sign[dd] = -1.0
        blocks.append(rolled * sign)
    return np.concatenate(blocks, axis=1)


def generate(
    out_dir: str,
    copies: int = 10,
    tables: set | None = None,
    dims: int = 0,
) -> None:
    """tables=None writes everything; pass e.g. {"documents",
    "embeddings"} for a family-scoped decade fixture (the sf10 dedup/
    ANN rehearsal doesn't need 100 copies of lineitem). dims > 0
    expands embeddings to that width before the per-copy transform
    (the realistic-dimension ANN tier)."""
    os.makedirs(out_dir, exist_ok=True)

    def want(t):
        return tables is None or t in tables

    for t in ("region", "nation"):  # broadcast dims: fixed at every scale
        if want(t):
            pq.write_table(pa.Table.from_pandas(_read(t), preserve_index=False),
                           f"{out_dir}/{t}.parquet")

    import pandas as pd

    if any(want(t) for t in ("customer", "supplier", "part", "orders",
                             "lineitem", "events")):
        cust = _read("customer")
        supp = _read("supplier")
        part = _read("part")
        orders = _read("orders")
        li = _read("lineitem")
        ev = _read("events")
        kc, ks, kp = _stride(cust, "c_custkey"), _stride(supp, "s_suppkey"), _stride(part, "p_partkey")
        ko, ke, ku = _stride(orders, "o_orderkey"), _stride(ev, "event_id"), _stride(ev, "user_id")
        plans = {
            "customer": (cust, {"c_custkey": kc}),
            "supplier": (supp, {"s_suppkey": ks}),
            "part": (part, {"p_partkey": kp}),
            "orders": (orders, {"o_orderkey": ko, "o_custkey": kc}),
            "lineitem": (li, {"l_orderkey": ko, "l_partkey": kp, "l_suppkey": ks}),
            "events": (ev, {"event_id": ke, "user_id": ku}),
        }
        for name, (df, shifts) in plans.items():
            if not want(name):
                continue
            if copies <= 100:
                out = []
                for i in range(copies):
                    c = df.copy()
                    for col, stride in shifts.items():
                        c[col] = c[col] + i * stride
                    out.append(c)
                pq.write_table(
                    pa.Table.from_pandas(pd.concat(out, ignore_index=True), preserve_index=False),
                    f"{out_dir}/{name}.parquet",
                )
            else:
                # two-decade tiers (sf100: copies=1000): a single pandas
                # concat would hold 100M-600M rows in memory — stream
                # one row group per copy through a ParquetWriter
                # instead (identical row content, bounded memory).
                writer = None
                try:
                    for i in range(copies):
                        c = df.copy()
                        for col, stride in shifts.items():
                            c[col] = c[col] + i * stride
                        t = pa.Table.from_pandas(c, preserve_index=False)
                        if writer is None:
                            writer = pq.ParquetWriter(
                                f"{out_dir}/{name}.parquet", t.schema
                            )
                        writer.write_table(t)
                finally:
                    if writer is not None:
                        writer.close()
            print(f"{name}: {len(df)} -> {len(df) * copies}", file=sys.stderr)

    if want("documents"):
        docs = _read("documents")
        kd = _stride(docs, "doc_id")
        doc_copies = []
        for i in range(copies):
            c = docs.copy()
            c["doc_id"] = c["doc_id"] + i * kd
            if i > 0:
                tag = str(i)
                c["text"] = c["text"].map(
                    lambda s: " ".join(tag + w for w in s.split(" "))
                )
            c["n_chars"] = c["text"].str.len().astype("int64")
            doc_copies.append(c)
        pq.write_table(
            pa.Table.from_pandas(pd.concat(doc_copies, ignore_index=True), preserve_index=False),
            f"{out_dir}/documents.parquet",
        )
        print(f"documents: {len(docs)} -> {len(docs) * copies}", file=sys.stderr)

    if want("embeddings"):
        emb = _read("embeddings")
        kv = _stride(emb, "vec_id")
        mat = np.array(list(emb["embedding"]), dtype=np.float64)
        if dims and dims != mat.shape[1]:
            mat = expand_dims(mat, dims)
            print(
                f"embeddings: expanded to d={dims} (block-isometry)",
                file=sys.stderr,
            )
        dims = mat.shape[1]
        emb_copies = []
        for i in range(copies):
            c = emb.copy()
            c["vec_id"] = c["vec_id"] + i * kv
            rolled = np.roll(mat, 7 * i, axis=1)
            # roll is mod dims, so copies i and i+dims would be exact
            # duplicates (spurious cross-copy near-dups past 64
            # copies). Compose a per-copy diagonal ±1 (orthogonal —
            # in-copy cosines untouched) that changes with i // dims.
            # Block 0 is the identity and block 1 flips even dims
            # (byte-identical regeneration of the committed sf1/sf10
            # fixtures); blocks >= 2 use md5-derived signs per (block,
            # dim) — the r9 review caught the original parity scheme
            # being the identity on every EVEN block, making copies i
            # and i+2*dims exact duplicates again past 128 copies.
            if i >= dims:
                block = i // dims
                sign = np.ones(dims)
                if block == 1:
                    sign[::2] = -1.0
                else:
                    import hashlib

                    for d in range(dims):
                        h = hashlib.md5(f"sign:{block}:{d}".encode()).digest()
                        if h[0] & 1:
                            sign[d] = -1.0
                rolled = rolled * sign
            c["embedding"] = [row.tolist() for row in rolled]
            emb_copies.append(c)
        # row_group_size: parquet splits only at row-group boundaries,
        # so a single-group file caps the scan at ONE task no matter
        # what maxPartitionBytes says (r12: the d=768 sf10 tier
        # serialized the whole assignment pass — 4.7 GB of Arrow
        # traffic — through one core this way).
        pq.write_table(
            pa.Table.from_pandas(pd.concat(emb_copies, ignore_index=True), preserve_index=False),
            f"{out_dir}/embeddings.parquet",
            row_group_size=10_000,
        )
        print(f"embeddings: {len(emb)} -> {len(emb) * copies}", file=sys.stderr)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "scale", "sf1")
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    tables = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    dims = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    generate(out, copies, tables, dims)
    print(f"wrote {out}")
