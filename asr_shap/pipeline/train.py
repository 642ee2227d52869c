"""Noise-robust CTC fine-tuning — the capability of the reference's
train_asr.py (SURVEY.md R6), actually wired end-to-end (the reference's loop
has placeholder data paths and yields no labels, SURVEY.md section 3.4 note).

TPU-first design:
  * one jitted ``train_step`` (CTC loss + AdamW + global-norm clip) over
    static padded shapes [B, max_audio_len] / [B, max_label_len];
  * data parallelism via sharding annotations: batch arrays shard over the
    mesh "data" axis, params/opt-state replicate — XLA inserts the gradient
    all-reduce over ICI;
  * early stopping + orbax checkpointing on host (the reference's
    EarlyStopping/ModelCheckpoint, train_asr.py:181-286, with an actual
    resume path this time).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from asr_shap.audio.noise import mix_at_snr
from asr_shap.audio.normalize import zero_mean_unit_var
from asr_shap.core.config import TrainConfig, Wav2Vec2Config
from asr_shap.models.wav2vec2 import feature_lengths, wav2vec2_logits
from asr_shap.ops.ctc import ctc_loss

logger = logging.getLogger(__name__)


# Family dispatch on the config type, shared with the explainer heads —
# training serves both families from one loop (reference R6 trains D1;
# R12's conformer gets the same loop).
from asr_shap.models.heads import model_logits_fn  # noqa: E402,F401


# ---------------------------------------------------------------- optimizer

def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay),
    )


def make_train_step(
    model_cfg: Wav2Vec2Config,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
):
    """Build the jittable (params, opt_state, batch) -> (params, opt_state,
    loss) step. batch: dict of audio [B, N] (raw), audio_lengths [B],
    labels [B, L], label_lengths [B]."""

    logits_fn = model_logits_fn(model_cfg)

    def loss_fn(params, batch):
        x = zero_mean_unit_var(batch["audio"], batch["audio_lengths"])
        logits = logits_fn(
            params, model_cfg, x, lengths=batch["audio_lengths"], remat=True
        )
        logit_lengths = feature_lengths(model_cfg, batch["audio_lengths"])
        return ctc_loss(logits, logit_lengths, batch["labels"], batch["label_lengths"])

    def _zero_frozen(tree):
        # standard wav2vec2 fine-tuning: the pretrained conv stack stays fixed
        return {
            k: (jax.tree.map(jnp.zeros_like, v) if k == "feature_encoder" else v)
            for k, v in tree.items()
        }

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        if train_cfg.freeze_feature_encoder:
            grads = _zero_frozen(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        if train_cfg.freeze_feature_encoder:
            # adamw's decoupled weight decay would still move frozen params
            updates = _zero_frozen(updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_eval_step(model_cfg: Wav2Vec2Config):
    """Loss-only validation step: forward + CTC loss, no gradients and no
    optimizer state — the val loop must not pay for (or risk reusing) a
    training update."""

    logits_fn = model_logits_fn(model_cfg)

    def eval_step(params, batch):
        x = zero_mean_unit_var(batch["audio"], batch["audio_lengths"])
        logits = logits_fn(params, model_cfg, x, lengths=batch["audio_lengths"])
        logit_lengths = feature_lengths(model_cfg, batch["audio_lengths"])
        return ctc_loss(logits, logit_lengths, batch["labels"], batch["label_lengths"])

    return eval_step


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a host batch with its leading axis sharded over the data axis."""
    sh1 = NamedSharding(mesh, P(mesh.axis_names[0]))
    sh2 = NamedSharding(mesh, P(mesh.axis_names[0], None))
    out = {}
    for k, v in batch.items():
        v = jnp.asarray(v)
        out[k] = jax.device_put(v, sh2 if v.ndim == 2 else sh1)
    return out


def replicate_params(tree, mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return jax.device_put(tree, rep)


# ------------------------------------------------------- host-side utilities

class EarlyStopping:
    """Patience-based early stopping on validation loss
    (train_asr.py:181-221 capability)."""

    def __init__(self, patience: int = 3, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best = float("inf")
        self.count = 0
        self.should_stop = False

    def update(self, value: float) -> bool:
        if value < self.best - self.min_delta:
            self.best = value
            self.count = 0
        else:
            self.count += 1
            if self.count >= self.patience:
                self.should_stop = True
        return self.should_stop


class Checkpointer:
    """Orbax-backed params+opt_state checkpointing with best-model tracking
    and an actual resume path (train_asr.py:223-286 saves but never loads)."""

    def __init__(self, directory: str, keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, best_fn=lambda m: m["val_loss"], best_mode="min"
            ),
        )

    def save(self, step: int, params, opt_state, val_loss: float):
        import orbax.checkpoint as ocp

        self.mngr.save(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(params),
                opt_state=ocp.args.StandardSave(opt_state),
            ),
            metrics={"val_loss": float(val_loss)},
        )
        self.mngr.wait_until_finished()

    def restore(self, step: Optional[int], params_like, opt_state_like):
        import orbax.checkpoint as ocp

        step = self.mngr.latest_step() if step is None else step
        if step is None:
            return None
        restored = self.mngr.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(params_like),
                opt_state=ocp.args.StandardRestore(opt_state_like),
            ),
        )
        return step, restored["params"], restored["opt_state"]

    @property
    def best_step(self):
        return self.mngr.best_step()


# ------------------------------------------------------------- data mixing

def make_noisy_batch(
    key: jax.Array,
    speech: np.ndarray,          # [B, N] clean speech (padded)
    speech_lengths: np.ndarray,  # [B]
    labels: np.ndarray,          # [B, L]
    label_lengths: np.ndarray,   # [B]
    noises: np.ndarray,          # [K, M] noise bank
    snrs_db: Tuple[float, ...],
) -> Dict:
    """Training-time augmentation: each utterance gets a random noise clip
    mixed at a random SNR from ``snrs_db`` (train_asr.py:135-179 capability,
    seeded and vectorized)."""
    b = speech.shape[0]
    noises = jnp.asarray(noises)
    k1, k2, k3 = jax.random.split(key, 3)
    noise_idx = jax.random.randint(k1, (b,), 0, noises.shape[0])
    snr_idx = jax.random.randint(k2, (b,), 0, len(snrs_db))
    snr_arr = jnp.asarray(snrs_db)[snr_idx]
    starts = jax.random.randint(
        k3, (b,), 0, max(1, noises.shape[1] - speech.shape[1] + 1)
    )

    def mix_one(s, nidx, start, snr):
        n = jax.lax.dynamic_slice(
            noises[nidx], (start,), (min(speech.shape[1], noises.shape[1]),)
        )
        return mix_at_snr(s, n, snr)

    mixed = jax.vmap(mix_one)(jnp.asarray(speech), noise_idx, starts, snr_arr)
    return {
        "audio": mixed,
        "audio_lengths": jnp.asarray(speech_lengths),
        "labels": jnp.asarray(labels),
        "label_lengths": jnp.asarray(label_lengths),
    }


# ---------------------------------------------------------------- main loop

def train(
    params,
    model_cfg: Wav2Vec2Config,
    train_cfg: TrainConfig,
    train_batches: Iterable[Dict],
    val_batches: Optional[Iterable[Dict]] = None,
    mesh: Optional[Mesh] = None,
    checkpointer: Optional[Checkpointer] = None,
):
    """Epoch loop with validation, early stopping, checkpointing
    (train_asr.py:288-364 capability). ``train_batches``/``val_batches`` are
    callables returning fresh iterables per epoch, or plain lists."""
    optimizer = make_optimizer(train_cfg)
    opt_state = optimizer.init(params)
    step_fn = jax.jit(make_train_step(model_cfg, train_cfg, optimizer))
    eval_fn = jax.jit(make_eval_step(model_cfg))

    if mesh is not None:
        params = replicate_params(params, mesh)
        opt_state = replicate_params(opt_state, mesh)

    stopper = EarlyStopping(
        train_cfg.early_stopping_patience, train_cfg.early_stopping_min_delta
    )
    from asr_shap.pipeline.prefetch import background_iterator

    history = []
    for epoch in range(train_cfg.num_epochs):
        ep_losses = []
        batches = train_batches() if callable(train_batches) else train_batches
        # host batch construction (noise mixing, padding, np IO) overlaps the
        # device step through the background producer
        for batch in background_iterator(iter(batches), maxsize=2):
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            params, opt_state, loss = step_fn(params, opt_state, batch)
            ep_losses.append(float(loss))

        val_loss = float("nan")
        if val_batches is not None:
            vb = val_batches() if callable(val_batches) else val_batches
            vl = []
            for batch in background_iterator(iter(vb), maxsize=2):
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                vl.append(float(eval_fn(params, batch)))
            val_loss = float(np.mean(vl)) if vl else float("nan")

        train_loss = float(np.mean(ep_losses)) if ep_losses else float("nan")
        history.append({"epoch": epoch, "train_loss": train_loss, "val_loss": val_loss})
        logger.info("epoch %d: train=%.4f val=%.4f", epoch, train_loss, val_loss)

        metric = val_loss if np.isfinite(val_loss) else train_loss
        if checkpointer is not None:
            checkpointer.save(epoch, params, opt_state, metric)
        if stopper.update(metric):
            logger.info("early stopping at epoch %d (best=%.4f)", epoch, stopper.best)
            break

    return params, opt_state, history
