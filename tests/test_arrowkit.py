"""functions/arrowkit.py — bounded-chunk kernel wrapper.

The wrapper must be output-IDENTICAL to the unchunked kernel (same rows,
same order — only Arrow batch boundaries move), must bound chunk sizes,
must skip empty outputs, and must leave the cyclic GC in the state it
found it (including when the per-chunk function raises).
"""

import gc

import pandas as pd
import pytest

from ta2_minmod_kg_spark.functions.arrowkit import chunked_kernel


def _mk(n):
    return pd.DataFrame({"a": range(n), "b": [f"s{i}" for i in range(n)]})


def test_rows_and_order_identical():
    pdf = _mk(10_000)
    seen_sizes = []

    def per_chunk(chunk):
        seen_sizes.append(len(chunk))
        return pd.DataFrame({"a2": [x * 2 for x in chunk["a"]]})

    outs = list(chunked_kernel(per_chunk, max_rows=1024)(iter([pdf])))
    got = pd.concat(outs, ignore_index=True)["a2"].tolist()
    assert got == [x * 2 for x in range(10_000)]
    assert max(seen_sizes) <= 1024
    assert sum(seen_sizes) == 10_000


def test_small_batch_passes_through_whole():
    pdf = _mk(100)
    sizes = []

    def per_chunk(chunk):
        sizes.append(len(chunk))
        return chunk

    list(chunked_kernel(per_chunk, max_rows=1024)(iter([pdf])))
    assert sizes == [100]


def test_empty_and_none_outputs_skipped():
    pdf = _mk(10)

    def per_chunk(chunk):
        return None if chunk["a"].iloc[0] < 5 else pd.DataFrame({"a": []})

    outs = list(chunked_kernel(per_chunk, max_rows=5)(iter([pdf])))
    assert outs == []


def test_gc_state_restored_on_success_and_error():
    assert gc.isenabled()
    pdf = _mk(10)

    seen_gc = []

    def per_chunk(chunk):
        seen_gc.append(gc.isenabled())
        return chunk

    list(chunked_kernel(per_chunk, max_rows=4)(iter([pdf])))
    assert seen_gc == [False, False, False]  # paused during construction
    assert gc.isenabled()  # restored between/after chunks

    def boom(chunk):
        raise ValueError("x")

    with pytest.raises(ValueError):
        list(chunked_kernel(boom, max_rows=4)(iter([pdf])))
    assert gc.isenabled()  # restored even on error


def test_multiple_input_batches():
    def per_chunk(chunk):
        return chunk

    outs = list(chunked_kernel(per_chunk, max_rows=3)(iter([_mk(7), _mk(2)])))
    assert [len(o) for o in outs] == [3, 3, 1, 2]
