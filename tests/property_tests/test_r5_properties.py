"""Property-based tests for the round-5 fast paths: each one asserts
the optimized path equals its reference implementation on arbitrary
inputs (native parse/gather vs numpy plans, 32-bit packed fetch
round-trip, lazy filter-view vs eager materialization)."""
import numpy as np
import pytest
from hypothesis import given, settings
import hypothesis.strategies as st


@given(vals=st.lists(st.integers(-10**17, 10**17), min_size=1,
                     max_size=300))
def test_parse_ints_matches_python(vals):
    from bionumpy_tpu import native
    text = "|".join(str(v) for v in vals).encode()
    buf = np.frombuffer(text, np.uint8)
    starts, ends, pos = [], [], 0
    for v in vals:
        t = str(v)
        starts.append(pos)
        ends.append(pos + len(t))
        pos += len(t) + 1
    out = native.parse_ints(buf, np.array(starts, np.int64),
                            np.array(ends, np.int64))
    if out is None:  # no native lib here
        return
    assert out.tolist() == vals


@given(data=st.data())
def test_gather_rows_matches_numpy(data):
    from bionumpy_tpu import native
    n = data.draw(st.integers(1, 2000))
    src = np.frombuffer(bytes(range(256)) * 8, np.uint8)
    n_rows = data.draw(st.integers(0, 50))
    starts = np.array(
        [data.draw(st.integers(0, len(src) - 1))
         for _ in range(n_rows)], np.int64)
    lens = np.array(
        [data.draw(st.integers(0, 40)) for _ in range(n_rows)],
        np.int64)
    lens = np.minimum(lens, len(src) - starts)
    out = native.gather_rows(src, starts, lens)
    if out is None:
        return
    exp = np.concatenate(
        [src[s: s + l] for s, l in zip(starts, lens)]) \
        if lens.sum() else np.empty(0, np.uint8)
    assert np.array_equal(out, exp)


@settings(deadline=None, max_examples=25)
@given(data=st.data())
def test_pack32_roundtrip_random_tables(data):
    import jax.numpy as jnp

    from bionumpy_tpu.ops.fetch_pack import (HEAD32, pack_sorted_table32,
                                             unpack_sorted_table32)
    n = data.draw(st.integers(1, 400))
    # hashes drawn from a range wide enough to produce both small and
    # >= 2^24 deltas (and occasional d_hi != 0)
    raw = data.draw(st.lists(st.integers(0, (1 << 42) - 1), min_size=n,
                             max_size=n, unique=True))
    h = np.sort(np.array(raw, np.uint64))
    c = np.array(data.draw(st.lists(st.integers(1, 70000), min_size=n,
                                    max_size=n)), np.uint32)
    acc = np.zeros((3, n + data.draw(st.integers(0, 65))), np.uint32)
    acc[0, :n] = (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    acc[1, :n] = (h >> np.uint64(32)).astype(np.uint32)
    acc[2, :n] = c
    slab = np.asarray(pack_sorted_table32(jnp.asarray(acc),
                                          jnp.int32(n)))
    got_h, got_c = unpack_sorted_table32(slab[: HEAD32 + n])
    assert np.array_equal(got_h, h)
    assert np.array_equal(got_c, c.astype(np.int64))


@settings(deadline=None, max_examples=20)
@given(data=st.data())
def test_lazy_filter_view_matches_eager(data):
    """Chained boolean/fancy filters on a lazy dataclass equal eager
    materialize-then-index, for every field."""
    import bionumpy_tpu as bnp
    reader = bnp.open("/root/reference/example_data/big.fq.gz",
                      lazy=True)
    chunk = reader.read_chunk()
    n = len(chunk)
    eager = chunk.get_data_object()
    mask = np.array(data.draw(st.lists(st.booleans(), min_size=n,
                                       max_size=n)))
    sub = chunk[mask]
    sub_e = eager[mask]
    assert sub.name.tolist() == sub_e.name.tolist()
    assert sub.sequence.tolist() == sub_e.sequence.tolist()
    m = int(mask.sum())
    if m:
        idx = np.array(data.draw(st.lists(
            st.integers(0, m - 1), min_size=0, max_size=10)), np.int64)
        sub2 = sub[idx]
        sub2_e = sub_e[idx]
        assert sub2.sequence.tolist() == sub2_e.sequence.tolist()
        assert np.array_equal(np.asarray(sub2.quality.ravel()),
                              np.asarray(sub2_e.quality.ravel()))
