"""CTC tests: greedy decode parity with the HF tokenizer, native CTC loss
against torch.nn.functional.ctc_loss (value + gradient direction)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from asr_shap.core.config import PAD_ID, WAV2VEC2_VOCAB
from asr_shap.ops.ctc import (
    ctc_decode_batch,
    ctc_greedy_decode,
    ctc_ids_to_text,
    ctc_loss,
)


@pytest.fixture(scope="module")
def hf_tokenizer(tmp_path_factory):
    from transformers import Wav2Vec2CTCTokenizer

    vocab = {tok: i for i, tok in enumerate(WAV2VEC2_VOCAB)}
    p = tmp_path_factory.mktemp("vocab") / "vocab.json"
    p.write_text(json.dumps(vocab))
    return Wav2Vec2CTCTokenizer(
        str(p), unk_token="<unk>", pad_token="<pad>", word_delimiter_token="|"
    )


def test_decode_simple():
    # "CAT" with repeats and blanks: C C <pad> A T T -> CAT
    ids = np.array([[19, 19, 0, 7, 6, 6]])
    keep_ids, keep = jax.jit(ctc_greedy_decode)(
        jax.nn.one_hot(jnp.asarray(ids), 32) * 10.0
    )
    assert ctc_ids_to_text(np.asarray(keep_ids)[0], np.asarray(keep)[0]) == "CAT"


def test_decode_word_delimiter():
    # "A CAT": A | C A T — duplicate separated by blank survives
    ids = np.array([[7, 4, 19, 0, 7, 7, 6]])
    logits = jax.nn.one_hot(jnp.asarray(ids), 32) * 10.0
    assert ctc_decode_batch(logits) == ["A CAT"]


def test_decode_matches_hf_tokenizer(hf_tokenizer, rng):
    for _ in range(20):
        ids = rng.integers(0, 32, size=(1, 60))
        ref = hf_tokenizer.batch_decode(torch.from_numpy(ids))[0]
        logits = jax.nn.one_hot(jnp.asarray(ids), 32) * 10.0
        ours = ctc_decode_batch(logits)[0]
        assert ours == ref, (ours, ref)


def test_decode_respects_lengths(rng):
    ids = np.array([[7, 0, 24, 24, 5, 5]])  # A B E, but mask to length 3 -> A B
    logits = jax.nn.one_hot(jnp.asarray(ids), 32) * 10.0
    assert ctc_decode_batch(logits, lengths=[3]) == ["AB"]


def test_ctc_loss_matches_torch(rng):
    b, t, v, l = 3, 30, 32, 8
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    labels = rng.integers(1, v, size=(b, l)).astype(np.int32)
    logit_lengths = np.array([30, 25, 18], np.int32)
    label_lengths = np.array([8, 5, 3], np.int32)

    ours = float(
        ctc_loss(
            jnp.asarray(logits),
            jnp.asarray(logit_lengths),
            jnp.asarray(labels),
            jnp.asarray(label_lengths),
        )
    )

    lp = torch.log_softmax(torch.from_numpy(logits), dim=-1).transpose(0, 1)
    ref = torch.nn.functional.ctc_loss(
        lp,
        torch.from_numpy(labels.astype(np.int64)),
        torch.from_numpy(logit_lengths.astype(np.int64)),
        torch.from_numpy(label_lengths.astype(np.int64)),
        blank=PAD_ID,
        reduction="mean",
        zero_infinity=False,
    )
    # torch 'mean' divides each sample's loss by its label length; compare
    # against the per-sample-summed convention explicitly:
    ref_sum = torch.nn.functional.ctc_loss(
        lp,
        torch.from_numpy(labels.astype(np.int64)),
        torch.from_numpy(logit_lengths.astype(np.int64)),
        torch.from_numpy(label_lengths.astype(np.int64)),
        blank=PAD_ID,
        reduction="none",
    )
    np.testing.assert_allclose(ours, float(ref_sum.mean()), rtol=1e-4)
    assert np.isfinite(float(ref))


def test_ctc_loss_gradient_flows(rng):
    b, t, v, l = 2, 20, 32, 4
    logits = jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, v, size=(b, l)).astype(np.int32))

    def loss(lg):
        return ctc_loss(lg, jnp.asarray([t, t]), labels, jnp.asarray([l, l]))

    g = jax.grad(loss)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
