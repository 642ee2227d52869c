"""Native host-runtime tests: C++ WER counts vs the pure-Python DP, npy
writer vs np.load round-trip. Skipped when no compiler/library is available
(every consumer has a Python fallback)."""

import os
import tempfile

import numpy as np
import pytest

from asr_shap import native
from asr_shap.metrics.wer import _words, word_edit_counts, wer


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_wer_counts_match_python(rng):
    vocab = [f"w{i}" for i in range(20)]
    for _ in range(50):
        ref = [vocab[i] for i in rng.integers(0, 20, rng.integers(1, 30))]
        hyp = [vocab[i] for i in rng.integers(0, 20, rng.integers(0, 30))]
        ids = {}
        enc = lambda ws: [ids.setdefault(w, len(ids)) for w in ws]
        r, h = enc(ref), enc(hyp)
        got = native.wer_counts_native(r, h)
        want = word_edit_counts(ref, hyp)
        assert got == want, (ref, hyp, got, want)


def test_batch_wer(rng):
    refs = [[1, 2, 3], [4, 5], [1]]
    hyps = [[1, 2, 3], [4, 6], []]
    out = native.batch_wer_native(refs, hyps)
    assert out.shape == (3, 4)
    # identical -> 3 hits, no edits
    assert tuple(out[0]) == (0, 0, 0, 3)
    # one substitution
    assert tuple(out[1]) == (1, 0, 0, 1)
    # one deletion
    assert tuple(out[2]) == (0, 1, 0, 0)


def test_wer_end_to_end_uses_native():
    assert wer("the cat sat", "the dog sat") == pytest.approx(1 / 3)
    assert wer("a b c d", "a b d") == pytest.approx(1 / 4)


def test_npy_writer_roundtrip(rng):
    with tempfile.TemporaryDirectory() as d:
        for shape in [(100,), (64, 49)]:
            a = rng.standard_normal(shape).astype(np.float32)
            p = os.path.join(d, "x.npy")
            assert native.write_npy_f32_native(p, a)
            back = np.load(p)
            np.testing.assert_array_equal(back, a)
            assert back.dtype == np.float32


def test_npy_writer_matches_store(rng):
    from asr_shap.core.store import AttributionStore, key_for

    with tempfile.TemporaryDirectory() as d:
        store = AttributionStore(d)
        k = key_for(0, "clean", float("inf"))
        phi = rng.standard_normal((200, 7)).astype(np.float32)
        audio = rng.standard_normal(200).astype(np.float32)
        store.save(k, audio, np.zeros_like(audio), phi, "HELLO")
        back = store.load(k)
        np.testing.assert_array_equal(back["shap_values"], phi)
        np.testing.assert_array_equal(back["audio"], audio)
        assert back["text"] == "HELLO"


def test_npy_writer_pool_roundtrip(tmp_path, rng):
    """The async C++ write executor: submit returns immediately, flush
    blocks until on-disk, contents identical to np.save."""
    from asr_shap.native import NpyWriterPool, available

    pool = NpyWriterPool(2)
    arrs = [rng.standard_normal((200, 30)).astype(np.float32) for _ in range(5)]
    arrs.append(rng.standard_normal(77).astype(np.float32))  # 1-D path
    for i, a in enumerate(arrs):
        pool.submit(str(tmp_path / f"x{i}.npy"), a)
    assert pool.flush() == 0
    for i, a in enumerate(arrs):
        np.testing.assert_array_equal(np.load(tmp_path / f"x{i}.npy"), a)
    if available():
        assert pool.native
    pool.close()


def test_store_async_writes(tmp_path, rng):
    """AttributionStore(async_writes=True): save is async, write_manifest
    flushes, loads match."""
    from asr_shap.core.store import AttributionStore, key_for

    st = AttributionStore(str(tmp_path), async_writes=True)
    key = key_for(0, "clean", float("inf"))
    audio = rng.standard_normal(400).astype(np.float32)
    noise = np.zeros(400, np.float32)
    phi = rng.standard_normal((400, 9)).astype(np.float32)
    st.save(key, audio, noise, phi, "HELLO")
    st.write_manifest()
    assert st.completed(key)
    got = st.load(key)
    np.testing.assert_array_equal(got["audio"], audio)
    np.testing.assert_array_equal(got["shap_values"], phi)
    assert got["text"] == "HELLO"
    # atomic writes: no temp files survive a completed flush
    assert not [p for p in tmp_path.iterdir() if ".tmp" in p.name]


def test_npy_writer_pool_fallback_is_atomic(tmp_path, rng, monkeypatch):
    """The non-native / >2-D fallback must keep the tmp+rename atomicity
    contract (ADVICE r2): no partially-written target, no stray tmp files."""
    import os

    import numpy as np

    from asr_shap.native import NpyWriterPool

    pool = NpyWriterPool()
    a = rng.standard_normal((2, 3, 4)).astype(np.float32)  # 3-D -> fallback
    path = str(tmp_path / "arr.npy")
    pool.submit(path, a)
    np.testing.assert_array_equal(np.load(path), a)
    leftovers = [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]
    assert leftovers == []
    pool.close()
