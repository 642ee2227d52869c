"""CTC operations: device-side greedy decode and a native CTC loss.

Decode contract (reference delegates to ``processor.batch_decode``,
nraw_vs_wer.py:77-79 / D2 in SURVEY.md): argmax per frame, collapse
consecutive repeats, drop the pad/blank token, map "|" to space, strip.
The argmax+collapse runs on device as one jittable function; only the final
id->string mapping happens on host.

The loss is the standard CTC forward algorithm in log space, implemented
with ``lax.scan`` over frames — static shapes, no data-dependent Python
control flow, so it jits and shards cleanly (capability of train_asr.py:322
``outputs.loss``, which the reference never actually wires up).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from asr_shap.core.config import PAD_ID, WAV2VEC2_VOCAB


def ctc_greedy_decode(logits: jnp.ndarray, blank_id: int = PAD_ID):
    """logits: [B, T, V] -> (ids [B, T], keep_mask [B, T]).

    keep_mask marks the first frame of each non-blank group (collapse
    repeats, drop blanks) — the surviving ids, in order, are the decoded
    token sequence. Fully vectorized; runs on device.
    """
    ids = jnp.argmax(logits, axis=-1)
    prev = jnp.concatenate([jnp.full_like(ids[:, :1], -1), ids[:, :-1]], axis=1)
    keep = (ids != prev) & (ids != blank_id)
    return ids, keep


def ctc_ids_to_text(
    ids: np.ndarray,
    keep: np.ndarray,
    vocab: Sequence[str] = WAV2VEC2_VOCAB,
    word_delimiter: str = "|",
) -> str:
    """Host-side string assembly for one sequence (HF tokenizer semantics)."""
    toks = [vocab[i] for i, k in zip(np.asarray(ids), np.asarray(keep)) if k]
    return "".join(toks).replace(word_delimiter, " ").strip()


def text_to_ids(
    text: str,
    vocab: Sequence[str] = WAV2VEC2_VOCAB,
    word_delimiter: str = "|",
    unk_id: int = 3,
) -> List[int]:
    """Inverse of :func:`ctc_ids_to_text` for training labels: uppercase
    characters to vocab ids, spaces to the word delimiter (HF tokenizer
    semantics; the reference's vocab contract, shap_calculation.py:221-254).
    Characters outside the vocab map to <unk>."""
    lut = {c: i for i, c in enumerate(vocab)}
    return [
        lut.get(word_delimiter if c == " " else c, unk_id)
        for c in text.upper().strip()
    ]


def ctc_decode_batch(
    logits, lengths=None, vocab: Sequence[str] = WAV2VEC2_VOCAB
) -> List[str]:
    """Greedy-decode a logits batch to strings. ``lengths`` masks padded
    frames of shorter utterances."""
    ids, keep = jax.jit(ctc_greedy_decode)(logits)
    ids = np.asarray(ids)
    keep = np.asarray(keep)
    if lengths is not None:
        t = ids.shape[1]
        keep = keep & (np.arange(t)[None, :] < np.asarray(lengths)[:, None])
    return [ctc_ids_to_text(i, k, vocab) for i, k in zip(ids, keep)]


def ctc_loss(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = PAD_ID,
) -> jnp.ndarray:
    """Mean negative log-likelihood over the batch.

    logits: [B, T, V]; labels: [B, L] (padded with anything; masked by
    label_lengths). Forward algorithm over the extended label sequence
    (blanks interleaved), log-space, scan over time.
    """
    b, t, v = logits.shape
    l = labels.shape[1]
    s = 2 * l + 1
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # extended labels: [blank, l1, blank, l2, ..., blank]
    ext = jnp.full((b, s), blank_id, dtype=labels.dtype)
    ext = ext.at[:, 1::2].set(labels)

    # allow skip from s-2 only when ext[s] != blank and ext[s] != ext[s-2]
    ext_prev2 = jnp.pad(ext[:, :-2], ((0, 0), (2, 0)), constant_values=blank_id)
    can_skip = (ext != blank_id) & (ext != ext_prev2)
    can_skip = can_skip.at[:, :2].set(False)

    neg_inf = jnp.float32(-1e30)
    alpha0 = jnp.full((b, s), neg_inf)
    alpha0 = alpha0.at[:, 0].set(log_probs[:, 0, blank_id])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(l > 0, log_probs[jnp.arange(b), 0, ext[:, 1]], neg_inf)
    )

    def logaddexp3(a, b_, c):
        m = jnp.maximum(jnp.maximum(a, b_), c)
        return m + jnp.log(
            jnp.exp(a - m) + jnp.exp(b_ - m) + jnp.exp(c - m)
        )

    def step(alpha, lp_t):
        # lp_t: [B, V]
        stay = alpha
        move = jnp.pad(alpha[:, :-1], ((0, 0), (1, 0)), constant_values=neg_inf)
        skip = jnp.pad(alpha[:, :-2], ((0, 0), (2, 0)), constant_values=neg_inf)
        skip = jnp.where(can_skip, skip, neg_inf)
        merged = logaddexp3(stay, move, skip)
        emit = jnp.take_along_axis(lp_t, ext, axis=1)  # [B, S]
        return merged + emit, None

    # scan over frames 1..T-1, keeping per-frame alphas so each sequence can
    # read out at its own true final frame (padded batches)
    def step_keep(a, lp):
        a2, _ = step(a, lp)
        return a2, a2

    _, history = lax.scan(
        lambda a, lp: step_keep(a, lp), alpha0, jnp.swapaxes(log_probs[:, 1:], 0, 1)
    )
    alphas = jnp.concatenate([alpha0[None], history], axis=0)  # [T, B, S]
    final = alphas[logit_lengths - 1, jnp.arange(b)]  # [B, S]

    send = 2 * label_lengths  # index of final blank
    last_blank = jnp.take_along_axis(final, send[:, None], axis=1)[:, 0]
    last_label = jnp.take_along_axis(
        final, jnp.maximum(send - 1, 0)[:, None], axis=1
    )[:, 0]
    last_label = jnp.where(label_lengths > 0, last_label, neg_inf)
    ll = jnp.logaddexp(last_blank, last_label)
    return -jnp.mean(ll)
