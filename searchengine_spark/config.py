"""Index configuration — every knob that affects index bytes or scores.

Pinned in ``index/meta.json`` at build time; the query engine refuses to
open an index whose analyzer/codec version it does not understand
(reference analog: Liquibase-migrated fixed schema,
``db/changelog/db.changelog-master.xml``).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass


@dataclass(frozen=True)
class IndexConfig:
    # --- layout -----------------------------------------------------------
    #: term-hash bucket count P: postings are partitioned by
    #: pmod(xxhash64(term), P).  At 10^12 docs this is the unit of
    #: parallelism for the block-encode stage and of partition pruning at
    #: query time; at test scale a handful suffices.
    n_buckets: int = 8
    #: doc-space salt count S: every posting list is split into S runs by
    #: pmod(doc_id, S).  This (a) bounds the size of any single posting
    #: row (head-term skew: a df=10^10 term becomes S rows of 10^10/S),
    #: and (b) gives S-way *query* parallelism, because runs with equal
    #: salt cover the same doc subspace across all terms, so top-k can be
    #: computed independently per salt and merged.
    n_salts: int = 4
    #: postings per block inside a run (skip-pointer granularity).
    block_size: int = 128
    #: doc_stats hive-partition count: doc_stats is written partitioned
    #: by ``ds_part = pmod(doc_id, doc_stats_parts)`` so a single-doc
    #: re-index (S9) rewrites ONE partition's files instead of the whole
    #: relation (the reference's one-row UPDATE,
    #: PageProcessorService.java:34-46).  At 10^12 docs raise this so a
    #: partition stays executor-sized.
    doc_stats_parts: int = 16

    # --- scoring ----------------------------------------------------------
    bm25_k1: float = 1.2
    bm25_b: float = 0.75
    #: high-document-frequency pruning threshold, percent.  Reference:
    #: `100 * lemma.frequency / totalPages <= searchFilter` with *integer*
    #: division (SearchServiceImpl.java:108, application.yaml:97 default
    #: 100 = keep everything).
    search_filter_pct: int = 100

    # --- versions ---------------------------------------------------------
    analyzer_version: str = "code-1"
    codec_version: str = "dvarint-1"

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "IndexConfig":
        return IndexConfig(**json.loads(s))
