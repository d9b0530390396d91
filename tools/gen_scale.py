#!/usr/bin/env python3
"""Scale the driver's synthetic testdata by an integer factor.

Usage: python3 tools/gen_scale.py <src_sf_dir> <out_dir> <factor>

Produces a dataset `factor` times the source with the same schemas,
physical parquet types (events.ts preserved as whatever the source
generation used — TIMESTAMP(NANOS) or timestamp[us]), key
relationships, and join fan-outs:

- region/nation: copied unchanged (fixed dimensions).
- customer/supplier/part/orders/lineitem/events: tiled `factor` times;
  copy 0 is the source verbatim, copy i shifts every key column by
  i * 10_000_000 so foreign keys keep referencing the same copy —
  per-key join fan-out and group sizes are preserved exactly, the key
  space just widens.
- documents: copy 0 verbatim; the rest freshly sampled (seeded) from
  the source's word-frequency, document-length, and (lang, source)
  distributions, so text operators see new strings with the same
  statistical shape instead of 10x exact duplicates (which would turn
  every dedup benchmark into a pathological all-dups corpus).
- embeddings: copy 0 verbatim; the rest fresh seeded unit-normalized
  gaussian vectors at the source dimension with uniform labels —
  matching the source's observed distribution (mean 0, component std
  1/sqrt(dim), unit norm).

Driver-side tool (pyarrow/numpy/duckdb) — not part of the Scala
library. Deterministic for a fixed (src, factor): seeds are constants.
"""
import os
import random
import sys
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT = 10_000_000


def tile(src, out, name, keycols, factor):
    t = pq.read_table(f"{src}/{name}.parquet")
    # Key shifting is only collision-free while every source key fits
    # below SHIFT. Re-tiling an already-scaled dataset (keys >= SHIFT)
    # would alias copy i's shifted keys onto copy i+k's originals and
    # silently corrupt every join fan-out — fail loudly instead.
    for c in keycols:
        mx = pc.max(t.column(c)).as_py()
        assert mx is not None and mx < SHIFT, (
            f"{name}.{c}: max key {mx} >= SHIFT {SHIFT}; source already "
            f"scaled — always tile from the base sf dir (see CLAUDE.md)")
    parts = [t]
    for i in range(1, factor):
        ti = t
        for c in keycols:
            idx = ti.schema.get_field_index(c)
            shifted = pc.cast(pc.add(ti.column(c), i * SHIFT),
                              ti.schema.field(c).type)
            ti = ti.set_column(idx, ti.schema.field(c), shifted)
        parts.append(ti)
    merged = pa.concat_tables(parts)
    pq.write_table(merged, f"{out}/{name}.parquet")
    print(f"{name}: {t.num_rows} -> {merged.num_rows}")


def gen_documents(src, out, factor):
    t = pq.read_table(f"{src}/documents.parquet")
    # Fresh rows are appended with ids n..factor*n-1, which is only a
    # valid (collision-free, gap-free) id space if the source is the
    # contiguous base corpus 0..n-1.
    ids = t.column("doc_id")
    assert pc.min(ids).as_py() == 0 and \
        pc.max(ids).as_py() == t.num_rows - 1, (
        f"documents.doc_id not contiguous 0..{t.num_rows - 1}; source "
        f"already scaled — always generate from the base sf dir")
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    vocab_counts = Counter()
    lengths = []
    for txt in texts:
        toks = txt.split()
        lengths.append(len(toks))
        vocab_counts.update(toks)
    vocab = sorted(vocab_counts)
    weights = [vocab_counts[w] for w in vocab]
    pairs = list(zip(langs, sources))
    rng = random.Random(42)
    n = t.num_rows
    new_ids, new_texts, new_langs, new_srcs, new_chars = [], [], [], [], []
    for i in range(n, factor * n):
        ln = rng.choice(lengths)
        words = rng.choices(vocab, weights=weights, k=ln)
        txt = " ".join(words)
        lang, srcname = rng.choice(pairs)
        new_ids.append(i)
        new_texts.append(txt)
        new_langs.append(lang)
        new_srcs.append(srcname)
        new_chars.append(len(txt))
    fresh = pa.table({
        "doc_id": pa.array(new_ids, pa.int64()),
        "text": pa.array(new_texts, pa.string()),
        "lang": pa.array(new_langs, pa.string()),
        "source": pa.array(new_srcs, pa.string()),
        "n_chars": pa.array(new_chars, pa.int64()),
    }).cast(t.schema.remove_metadata())
    merged = pa.concat_tables([t.replace_schema_metadata(None), fresh])
    # same splittability concern as embeddings (docs are ~1 KB rows)
    pq.write_table(merged, f"{out}/documents.parquet",
                   row_group_size=65536)
    print(f"documents: {n} -> {merged.num_rows}")


def gen_embeddings(src, out, factor):
    t = pq.read_table(f"{src}/embeddings.parquet")
    n = t.num_rows
    dim = len(t.column("embedding")[0])
    rng = np.random.RandomState(42)
    m = (factor - 1) * n
    vecs = rng.normal(0.0, 1.0 / np.sqrt(dim), (m, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    labels = rng.randint(0, int(pc.max(t.column("label")).as_py()) + 1,
                         m).astype(np.int32)
    fresh = pa.table({
        "vec_id": pa.array(range(n, factor * n), pa.int64()),
        "embedding": pa.array([v for v in vecs], pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }).cast(t.schema.remove_metadata())
    merged = pa.concat_tables([t.replace_schema_metadata(None), fresh])
    # Bounded row groups: a 1024-dim float row is ~4 KB, so arrow's
    # default 1M-row group would be one unsplittable multi-GB block —
    # Spark schedules at most one task per row group start, and a
    # single-row-group embeddings file pins every corpus-wide vector
    # pass to ONE core (observed live at sf10: the IVF build sat on a
    # single task for 30+ minutes). 8192 rows ≈ 33 MB per group.
    pq.write_table(merged, f"{out}/embeddings.parquet",
                   row_group_size=8192)
    print(f"embeddings: {n} -> {merged.num_rows}")


def main():
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(out, exist_ok=True)
    tile(src, out, "region", [], factor=1)
    tile(src, out, "nation", [], factor=1)
    tile(src, out, "customer", ["c_custkey"], factor)
    tile(src, out, "supplier", ["s_suppkey"], factor)
    tile(src, out, "part", ["p_partkey"], factor)
    tile(src, out, "orders", ["o_orderkey", "o_custkey"], factor)
    tile(src, out, "lineitem",
         ["l_orderkey", "l_partkey", "l_suppkey"], factor)
    tile(src, out, "events", ["event_id", "user_id"], factor)
    gen_documents(src, out, factor)
    gen_embeddings(src, out, factor)
    # the physical-type contract the engine's schema-adaptive reader
    # handles (EventStream.tsSecCol): the driver's datasets have
    # shipped both TIMESTAMP(NANOS) and tz-less timestamp[us]; the
    # scaled copy must preserve whichever the source used
    src_ts = pq.read_schema(f"{src}/events.parquet").field("ts").type
    ts_type = pq.read_schema(f"{out}/events.parquet").field("ts").type
    assert str(ts_type) == str(src_ts), (ts_type, src_ts)
    assert str(ts_type) in ("timestamp[ns]", "timestamp[us]"), ts_type
    print("events.ts physical type preserved:", ts_type)


if __name__ == "__main__":
    main()
