"""On-disk index format (SURVEY.md §7.0 storage layout).

Replaces the reference's four PostgreSQL tables (site/page/lemma/index,
``db/changelog/liquibase-outputChangeLog_init.xml``) with columnar
parquet:

- ``stage1_postings/bucket=<b>/`` — flat postings ``(term, doc_id, tf,
  dl)``; intermediate + checkpoint unit + oracle-comparable relation
  (role of the ``index`` table rows, ``model/Index.java:12-23``).
- ``postings/bucket=<b>/``        — encoded posting *runs*: one row per
  (term, salt) holding delta+varint doc-id blocks with skip/block-max
  metadata.
- ``term_stats/``  — (term, df, cf)           (role of ``lemma`` table)
- ``term_repo_stats/`` — (term, repo, df)     (per-site df semantics,
  ``Repositories/LemmaRepository.java:25-30``)
- ``doc_stats/``   — (doc_id, repo, path, commit, lang, doclen,
  content_sha256)                             (role of ``page`` metadata)
- ``meta.json``    — corpus N, avgdl, IndexConfig, source path
- ``_checkpoints/``— per-stage manifests + per-partition metrics

Block layout inside a run: postings sorted by doc_id, cut into blocks of
``block_size``.  Each block's doc ids are delta-encoded *independently*
(first id verbatim) so a block can be decoded without touching its
predecessors — that is what makes skip pointers real: block-max WAND
jumps straight to byte offset ``doc_offsets[i]``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from searchengine_spark.functions.codec import (
    varint_byte_lengths,
    varint_decode,
    varint_encode,
)

POSTINGS_FLAT_SCHEMA = (
    "term string, doc_id long, tf int, dl int, bucket int"
)

POSTING_RUN_SCHEMA = (
    "term string, salt int, df_run long, cf_run long, n_blocks int, block_len int, "
    "block_first array<long>, block_last array<long>, "
    "block_max_tf array<int>, block_min_dl array<int>, "
    "doc_offsets array<int>, tf_offsets array<int>, dl_offsets array<int>, "
    "doc_bytes binary, tf_bytes binary, dl_bytes binary, bucket int"
)

DOC_STATS_SCHEMA = (
    "doc_id long, repo string, path string, commit string, lang string, "
    "doclen int, content_sha256 string"
)


def encode_blocks(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, block_size: int
) -> dict:
    """Encode one sorted posting run into blocks.  Pure NumPy.

    Returns the columns of one POSTING_RUN row (minus term/salt/bucket).
    """
    n = doc_ids.size
    starts = np.arange(0, n, block_size)
    ends = np.minimum(starts + block_size, n)

    block_first = doc_ids[starts].astype(np.int64)
    block_last = doc_ids[ends - 1].astype(np.int64)
    block_max_tf = np.maximum.reduceat(tfs, starts).astype(np.int32)
    block_min_dl = np.minimum.reduceat(dls, starts).astype(np.int32)

    # whole-run delta with a restart at every block start (first doc of a
    # block stored verbatim) — one vectorized pass, no per-block loop
    ids = doc_ids.astype(np.uint64)
    deltas = np.empty_like(ids)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    deltas[starts] = ids[starts]

    def _enc(vals: np.ndarray) -> tuple[bytes, list[int]]:
        lens = varint_byte_lengths(vals)
        cum = np.concatenate(([0], np.cumsum(lens)))
        offs = cum[np.concatenate((starts, [n]))]
        return varint_encode(vals), [int(x) for x in offs]

    doc_bytes, doc_offs = _enc(deltas)
    tf_bytes, tf_offs = _enc(tfs.astype(np.uint64))
    dl_bytes, dl_offs = _enc(dls.astype(np.uint64))

    return {
        "df_run": int(n),
        "cf_run": int(tfs.sum()),
        "n_blocks": len(starts),
        "block_len": int(block_size),
        "block_first": block_first.tolist(),
        "block_last": block_last.tolist(),
        "block_max_tf": block_max_tf.tolist(),
        "block_min_dl": block_min_dl.tolist(),
        "doc_offsets": doc_offs,
        "tf_offsets": tf_offs,
        "dl_offsets": dl_offs,
        "doc_bytes": doc_bytes,
        "tf_bytes": tf_bytes,
        "dl_bytes": dl_bytes,
    }


def decode_run(row, block_ids: np.ndarray | None = None):
    """Decode (selected blocks of) one posting run row.

    ``row`` is any mapping with the POSTING_RUN fields.  ``block_ids``
    None -> all blocks.  Returns (doc_ids, tfs, dls) uint64/int arrays.
    This is the skip-pointer read path: only the chosen blocks' byte
    ranges are parsed.
    """
    doc_offs = np.asarray(row["doc_offsets"], dtype=np.int64)
    tf_offs = np.asarray(row["tf_offsets"], dtype=np.int64)
    dl_offs = np.asarray(row["dl_offsets"], dtype=np.int64)
    db, tb, lb = row["doc_bytes"], row["tf_bytes"], row["dl_bytes"]
    if block_ids is None:
        # full-run fast path: decode everything in one vectorized pass,
        # then undo the per-block delta restarts without a block loop
        deltas = varint_decode(db)
        tfs = varint_decode(tb)
        dls = varint_decode(lb)
        n = deltas.size
        cum = np.cumsum(deltas, dtype=np.uint64)
        nb = int(row["n_blocks"])
        bs = int(row["block_len"])
        if nb > 1:
            starts = np.arange(0, n, bs)
            # a restart at block b means cum carries the spurious prefix
            # cum[start_b - 1]; build that per-row base via a cumsummed
            # difference array (base must equal prev[b-1] inside block b)
            prev = cum[starts[1:] - 1]
            base = np.zeros(n, dtype=np.uint64)
            base[starts[1:]] = np.diff(prev, prepend=np.uint64(0))
            base = np.cumsum(base, dtype=np.uint64)
            docs = cum - base
        else:
            docs = cum
        return docs, tfs, dls
    docs_out, tfs_out, dls_out = [], [], []
    for i in block_ids:
        i = int(i)
        deltas = varint_decode(db[doc_offs[i]: doc_offs[i + 1]])
        docs_out.append(np.cumsum(deltas, dtype=np.uint64))
        tfs_out.append(varint_decode(tb[tf_offs[i]: tf_offs[i + 1]]))
        dls_out.append(varint_decode(lb[dl_offs[i]: dl_offs[i + 1]]))
    if not docs_out:
        z = np.empty(0, dtype=np.uint64)
        return z, z.copy(), z.copy()
    return (
        np.concatenate(docs_out),
        np.concatenate(tfs_out),
        np.concatenate(dls_out),
    )


def encode_run_pdf(pdf: pd.DataFrame, block_size: int) -> pd.DataFrame:
    """applyInPandas kernel: one (term, salt) group -> one encoded row.

    Sorts by doc_id (the shuffle delivers the group unsorted), encodes
    blocks, returns a single-row frame matching POSTING_RUN_SCHEMA.
    """
    pdf = pdf.sort_values("doc_id", kind="mergesort")
    doc_ids = pdf["doc_id"].to_numpy(dtype=np.uint64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["dl"].to_numpy(dtype=np.int64)
    enc = encode_blocks(doc_ids, tfs, dls, block_size)
    enc["term"] = pdf["term"].iloc[0]
    enc["salt"] = int(pdf["salt"].iloc[0])
    enc["bucket"] = int(pdf["bucket"].iloc[0])
    return pd.DataFrame([enc])
