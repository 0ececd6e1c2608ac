"""Micro-batch-split invariance for the streaming keys whose contracts
are batch-count-invariant.

The fixture replays as ONE data batch (streams.stream_events leaves
maxFilesPerTrigger unset on directory sources — deliberate, because
append-mode watermark drops depend on file listing order). But a real
deployment delivers the same rows across MANY micro-batches, so every
key whose semantics do not depend on batching must produce identical
results either way:

- complete-mode aggregations (tumbling/sliding windows, windowed top-k):
  the final complete emission is the full aggregate by definition;
- key-only dedup: the final state set is the distinct key set however
  arrivals are grouped;
- stateless stream-static joins: row-wise, no state at all.

Deliberately NOT here: stream_watermark / stream_stream_join (watermark
advancement between batches legitimately drops late rows — that IS the
contract, covered rows-only), stream_stateful / the bounded top-k
(applyInPandasWithState emits per batch by design), checkpoint/foreach
(batch bookkeeping is the point).

Mechanism: rewrite the events fixture as a 3-part directory, run each
key once with the directory consumed as a single batch and once with
LUXOR_STREAM_MAX_FILES_PER_TRIGGER=1 (3 micro-batches), and compare
canonical rows — also against the original single-file fixture run, so
the rewritten fixture itself is anchored.
"""

from __future__ import annotations

import os
import shutil

import pytest

from luxor_db_spark.registry import load_all_queries
from tests.conftest import SF_DIR, canonical_rows

QUERIES = load_all_queries()

INVARIANT_KEYS = [
    "stream_tumbling",
    "stream_sliding",
    "stream_dedup",
    "stream_static_join",
    "stream_windowed_topk",
]

_ENV = "LUXOR_STREAM_MAX_FILES_PER_TRIGGER"


@pytest.fixture(scope="module")
def split_sf_dir(spark, tmp_path_factory):
    """A sibling fixture dir whose events table is a 3-part directory;
    every other table is the original file (streaming keys only read
    events as a stream — dimensions load through the batch catalog)."""
    root = tmp_path_factory.mktemp("split_sf")
    dest = str(root / "fixtures")
    os.makedirs(dest)
    for name in os.listdir(SF_DIR):
        if name == "events.parquet":
            continue
        src = os.path.join(SF_DIR, name)
        if os.path.isfile(src):
            shutil.copy(src, os.path.join(dest, name))
    (
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .repartition(3)
        .write.parquet(os.path.join(dest, "events.parquet"))
    )
    return dest


def _run(spark, sf_dir: str, key: str) -> list[tuple]:
    df = QUERIES[key](spark, sf_dir)
    return canonical_rows(list(df.columns), [tuple(r) for r in df.collect()])


@pytest.mark.parametrize("key", INVARIANT_KEYS)
def test_stream_result_invariant_to_batch_split(spark, key, split_sf_dir):
    original = _run(spark, SF_DIR, key)

    assert os.environ.get(_ENV) is None
    one_batch = _run(spark, split_sf_dir, key)
    os.environ[_ENV] = "1"
    try:
        per_file = _run(spark, split_sf_dir, key)
    finally:
        del os.environ[_ENV]

    assert one_batch == original, (
        f"[{key}] directory fixture (single batch) diverged from the "
        f"single-file fixture — layout bug, not batching"
    )
    if per_file != one_batch:
        p, o = set(per_file), set(one_batch)
        raise AssertionError(
            f"[{key}] result changed when the same rows arrived in 3 "
            f"micro-batches instead of 1\n"
            f"  multi-batch-only: {[r for r in per_file if r not in o][:5]}\n"
            f"  one-batch-only:   {[r for r in one_batch if r not in p][:5]}"
        )
