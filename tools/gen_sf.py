#!/usr/bin/env python3
"""Dev tool: extrapolate /root/testdata/sf0.1 to a larger scale factor for
scaling rehearsals (SCALE.md). NOT driver testdata — the driver's generator
is not available here, so this builds a corpus with the same schemas and
the same *relational* structure at N x the size:

- Fact/dim tables (lineitem, orders, customer, supplier, part, events):
  N key-offset copies; every foreign key is offset by the same copy stride
  so join fan-outs per key stay IDENTICAL to sf0.1 (10x data, same
  per-key selectivity — the property that makes per-query scaling ratios
  meaningful). nation/region stay fixed (true dimensions).
- documents: N copies with a copy-specific marker token interleaved every
  5 tokens. Within a copy, planted near-dup pairs keep their mutual
  similarity (same marker positions); across copies, every shingle
  contains a different marker, so copies are NOT near-dups of each other
  and dedup pair density scales ~linearly like a real bigger crawl
  (plain duplication would multiply pair counts ~quadratically).
- embeddings: copy 0 verbatim; further copies are fresh seeded Gaussian
  unit vectors (the corpus is isotropic by design — see AnnIndex
  scaladoc), so cosine-pair density also scales ~linearly.

Usage: python3 tools/gen_sf.py <out_dir> [factor]
"""
import sys, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def read(name):
    return pq.read_table(f"{SRC}/{name}.parquet")


def copy_with_offsets(table, n, offset_cols):
    """n copies; for each col in offset_cols, copy i adds i * stride where
    stride = max(col) + 1 of the original."""
    strides = {c: int(pa.compute.max(table[c]).as_py()) + 1 for c in offset_cols}
    chunks = []
    for i in range(n):
        cols = {}
        for name in table.schema.names:
            col = table[name]
            if name in offset_cols and i > 0:
                col = pa.compute.add(col, i * strides[name])
            cols[name] = col
        chunks.append(pa.table(cols, schema=None).cast(table.schema)
                      if False else pa.Table.from_pydict(cols))
    out = pa.concat_tables(chunks)
    return out.cast(table.schema)


def gen_documents(n):
    t = read("documents").to_pydict()
    ids, texts, langs, sources = t["doc_id"], t["text"], t["lang"], t["source"]
    stride = max(ids) + 1
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for i in range(n):
        marker = f"zz{i}q"  # copy-specific token, interleaved every 5 tokens
        for d, tx, lg, so in zip(ids, texts, langs, sources):
            if i == 0:
                nt = tx
            else:
                toks = tx.split(" ")
                woven = []
                for j, tok in enumerate(toks):
                    woven.append(tok)
                    if j % 5 == 4:
                        woven.append(marker)
                nt = " ".join(woven)
            out["doc_id"].append(d + i * stride)
            out["text"].append(nt)
            out["lang"].append(lg)
            out["source"].append(so)
            out["n_chars"].append(len(nt))
    schema = read("documents").schema
    return pa.Table.from_pydict(out).cast(schema)


def gen_embeddings(n):
    t = read("embeddings")
    dim = len(t["embedding"][0].as_py())
    stride = int(pa.compute.max(t["vec_id"]).as_py()) + 1
    base_n = t.num_rows
    labels = t["label"].to_pylist()
    chunks = [t]
    rng = np.random.default_rng(4242)
    for i in range(1, n):
        vecs = rng.standard_normal((base_n, dim)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        chunk = pa.Table.from_pydict({
            "vec_id": pa.array([v + i * stride for v in t["vec_id"].to_pylist()],
                               type=pa.int64()),
            "embedding": pa.array([list(map(float, row)) for row in vecs],
                                  type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }).cast(t.schema)
        chunks.append(chunk)
    return pa.concat_tables(chunks)


def main(out_dir, factor):
    os.makedirs(out_dir, exist_ok=True)

    def write(name, table):
        pq.write_table(table, f"{out_dir}/{name}.parquet")
        print(f"{name}: {table.num_rows} rows")

    write("region", read("region"))
    write("nation", read("nation"))
    write("customer", copy_with_offsets(read("customer"), factor, ["c_custkey"]))
    write("supplier", copy_with_offsets(read("supplier"), factor, ["s_suppkey"]))
    write("part", copy_with_offsets(read("part"), factor, ["p_partkey"]))
    write("orders", copy_with_offsets(read("orders"), factor, ["o_orderkey", "o_custkey"]))
    write("lineitem", copy_with_offsets(read("lineitem"), factor,
                                        ["l_orderkey", "l_partkey", "l_suppkey"]))
    write("events", copy_with_offsets(read("events"), factor, ["event_id", "user_id"]))
    write("documents", gen_documents(factor))
    write("embeddings", gen_embeddings(factor))


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 10)
