#!/usr/bin/env python3
"""Generate a scaled-up copy of a testdata scale factor for benchmarking.

Replicates each table FACTOR times with deterministic key offsets so the
result behaves like a genuinely larger corpus rather than a pile of exact
duplicates:

- fact keys (event_id, doc_id, vec_id, o_orderkey/l_orderkey, c_custkey,
  p_partkey, s_suppkey) get per-copy offsets, preserving FK integrity
  (order copy i joins customer copy i, lineitem copy i joins order/part/
  supplier copy i);
- document text is re-tokenized per copy (every token gets a copy tag,
  so cross-copy shingle/SimHash/MinHash similarity is ~0): near-dup
  structure WITHIN each copy is preserved exactly, so candidate pairs
  scale linearly with the factor — a single suffix token would instead
  leave copies >0.95 Jaccard-similar and turn every document into a
  FACTOR-clique (quadratic pair blowup that no real corpus has);
- embeddings are decorrelated per copy (cyclic dimension roll + an
  i-dependent sign-flip pattern, norm-preserving), so cross-copy cosine
  is ~0 and ANN/near-dup candidate structure also scales linearly;
- user_id / event_type / ts are left alone, so the number of live
  distributions stays constant while rows-per-distribution grow with
  the factor - how a real event log scales.

Usage: python scripts/make_scaled_sf.py [--src /root/testdata/sf0.1]
                                        [--dst .scratch/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _offset(col: pa.ChunkedArray, off: int) -> pa.ChunkedArray:
    return pc.add(col, pa.scalar(off, type=col.type))


def scale_table(
    name: str, table: pa.Table, i: int, key_max: dict[str, int]
) -> pa.Table:
    """Copy ``i`` (0 = identity) of one table, keys offset deterministically.

    ``key_max`` maps each primary key (e.g. ``c_custkey``) to ITS OWN
    table's max — FK columns must be offset by the REFERENCED table's
    stride, not their own max: on data where the largest key value is
    unreferenced (standard TPC-H leaves ~1/3 of custkeys orderless) the
    two maxima differ and every copy's FK would silently point at the
    wrong (or no) parent row, corrupting every scaled-up join benchmark.
    """
    if i == 0 or name in ("region", "nation"):
        return table
    cols = {c: table.column(c) for c in table.column_names}

    def key_off(col_name: str, ref_key: str | None = None) -> int:
        stride = key_max[ref_key] if ref_key else (
            pc.max(table.column(col_name)).as_py() + 1
        )
        return i * stride

    if name == "events":
        cols["event_id"] = _offset(cols["event_id"], key_off("event_id"))
    elif name == "documents":
        off = key_off("doc_id")
        cols["doc_id"] = _offset(cols["doc_id"], off)
        # Tag EVERY token with the copy index: within-copy similarity is
        # bit-identical to the source corpus, cross-copy shingle overlap
        # is zero — near-dup pairs scale linearly with the factor.
        cols["text"] = pc.replace_substring_regex(
            cols["text"], pattern=r"(\w+)", replacement=rf"\1q{i}"
        )
        cols["n_chars"] = pc.cast(pc.utf8_length(cols["text"]), pa.int64())
    elif name == "embeddings":
        off = key_off("vec_id")
        emb = np.stack(cols["embedding"].to_numpy(zero_copy_only=False))
        dim = emb.shape[1]
        # Norm-preserving decorrelation: cyclic roll by a copy-dependent
        # stride plus an i-dependent sign-flip pattern. Cross-copy cosine
        # collapses to ~0 while within-copy geometry (all pairwise dots)
        # is exactly preserved.
        emb = np.roll(emb, shift=(i * 7) % dim, axis=1)
        signs = np.where((np.arange(dim) * i) % 3 == 0, 1.0, -1.0).astype(emb.dtype)
        emb = emb * signs
        cols["vec_id"] = _offset(cols["vec_id"], off)
        cols["embedding"] = pa.chunked_array(
            [pa.array(list(emb), type=pa.list_(pa.float32()))]
        )
    elif name == "orders":
        cols["o_orderkey"] = _offset(cols["o_orderkey"], key_off("o_orderkey", "o_orderkey"))
        cols["o_custkey"] = _offset(cols["o_custkey"], key_off("o_custkey", "c_custkey"))
    elif name == "lineitem":
        cols["l_orderkey"] = _offset(cols["l_orderkey"], key_off("l_orderkey", "o_orderkey"))
        cols["l_partkey"] = _offset(cols["l_partkey"], key_off("l_partkey", "p_partkey"))
        cols["l_suppkey"] = _offset(cols["l_suppkey"], key_off("l_suppkey", "s_suppkey"))
    elif name == "customer":
        cols["c_custkey"] = _offset(cols["c_custkey"], key_off("c_custkey", "c_custkey"))
    elif name == "part":
        cols["p_partkey"] = _offset(cols["p_partkey"], key_off("p_partkey", "p_partkey"))
    elif name == "supplier":
        cols["s_suppkey"] = _offset(cols["s_suppkey"], key_off("s_suppkey", "s_suppkey"))
    return pa.table(cols, schema=None)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=".scratch/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    # Primary-key strides from the REFERENCED tables (see scale_table):
    # every FK offset must use its parent's max+1, not its own.
    key_max: dict[str, int] = {}
    for tbl, key in [
        ("customer", "c_custkey"),
        ("orders", "o_orderkey"),
        ("part", "p_partkey"),
        ("supplier", "s_suppkey"),
    ]:
        t = pq.read_table(os.path.join(args.src, f"{tbl}.parquet"), columns=[key])
        key_max[key] = pc.max(t.column(key)).as_py() + 1
    for fn in sorted(os.listdir(args.src)):
        if not fn.endswith(".parquet"):
            continue
        name = fn.removesuffix(".parquet")
        src = pq.read_table(os.path.join(args.src, fn))
        if name in ("region", "nation"):
            out = src
        else:
            out = pa.concat_tables(
                [scale_table(name, src, i, key_max) for i in range(args.factor)]
            )
        # Bounded row groups: pyarrow's default (up to ~1M rows per
        # group) wrote the whole scaled documents table as ONE row
        # group — and a parquet row group is indivisible, so Spark's
        # byte-range file splitting handed ALL rows to one task and
        # every corpus-text pipeline ran single-threaded (caught in r7:
        # the sf10 spine build sat at (14+1)/15 tasks for minutes).
        # Production corpora are many splittable files; ~32 groups per
        # table (floored so tiny dims stay one group, capped so huge
        # fact tables keep scan-efficient group sizes) make the scaled
        # single file behave the same way.
        rg = max(8192, min(65536, len(out) // 32))
        pq.write_table(out, os.path.join(args.dst, fn), row_group_size=rg)
        print(f"{name}: {len(src)} -> {len(out)} rows")


if __name__ == "__main__":
    main()
