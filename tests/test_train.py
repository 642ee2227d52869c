"""Training-loop tests: the loss goes down on a learnable toy task, early
stopping triggers, orbax checkpoints round-trip, and the data-parallel
step runs on the 8-device mesh (the capability train_asr.py sketches but
never wires — SURVEY.md section 3.4 note)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asr_shap.core.config import TrainConfig, Wav2Vec2Config
from asr_shap.models import init_wav2vec2_params
from asr_shap.parallel import make_mesh
from asr_shap.pipeline.train import (
    Checkpointer,
    EarlyStopping,
    make_noisy_batch,
    make_optimizer,
    make_train_step,
    replicate_params,
    shard_batch,
    train,
)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16, 16), conv_stride=(5, 2),
        conv_kernel=(10, 3), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, feat_proj_dim=16,
    )
    params = init_wav2vec2_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    b, n, l = 8, 800, 4
    batch = {
        "audio": rng.standard_normal((b, n)).astype(np.float32),
        "audio_lengths": np.full((b,), n, np.int32),
        "labels": rng.integers(1, 32, (b, l)).astype(np.int32),
        "label_lengths": np.full((b,), l, np.int32),
    }
    return cfg, params, batch


def test_loss_decreases(tiny_setup):
    cfg, params, batch = tiny_setup
    tcfg = TrainConfig(learning_rate=3e-4, freeze_feature_encoder=False)
    opt = make_optimizer(tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, opt))
    state = opt.init(params)
    p = params
    losses = []
    for _ in range(8):
        p, state, loss = step(p, state, {k: jnp.asarray(v) for k, v in batch.items()})
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_frozen_feature_encoder(tiny_setup):
    cfg, params, batch = tiny_setup
    tcfg = TrainConfig(freeze_feature_encoder=True)
    opt = make_optimizer(tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, opt))
    p, _, _ = step(params, opt.init(params),
                   {k: jnp.asarray(v) for k, v in batch.items()})
    for a, b in zip(jax.tree.leaves(params["feature_encoder"]),
                    jax.tree.leaves(p["feature_encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # encoder params did change
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params["encoder"]),
                        jax.tree.leaves(p["encoder"]))
    )
    assert changed


def test_dp_sharded_step_matches_single(tiny_setup):
    cfg, params, batch = tiny_setup
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh")
    tcfg = TrainConfig(freeze_feature_encoder=False)
    opt = make_optimizer(tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, opt))

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    _, _, loss_single = step(params, opt.init(params), jb)

    mesh = make_mesh()
    p_rep = replicate_params(params, mesh)
    s_rep = replicate_params(opt.init(params), mesh)
    sb = shard_batch(batch, mesh)
    _, _, loss_dp = step(p_rep, s_rep, sb)
    np.testing.assert_allclose(float(loss_single), float(loss_dp), rtol=1e-4)


def test_early_stopping():
    es = EarlyStopping(patience=2)
    assert not es.update(1.0)
    assert not es.update(0.9)
    assert not es.update(0.95)   # 1st bad
    assert es.update(0.92)       # 2nd bad -> stop
    assert es.should_stop


def test_noisy_batch_mixing(rng):
    b, n = 4, 1000
    speech = rng.standard_normal((b, n)).astype(np.float32)
    noises = rng.standard_normal((3, 2000)).astype(np.float32)
    batch = make_noisy_batch(
        jax.random.key(0), speech, np.full(b, n),
        rng.integers(1, 32, (b, 5)).astype(np.int32), np.full(b, 5),
        noises, (0.0, 10.0),
    )
    mixed = np.asarray(batch["audio"])
    assert mixed.shape == (b, n)
    # realized SNR of each row is one of the requested values
    for i in range(b):
        nz = mixed[i] - speech[i]
        snr = 10 * np.log10(np.mean(speech[i] ** 2) / np.mean(nz**2))
        assert min(abs(snr - 0.0), abs(snr - 10.0)) < 0.5, snr


def test_train_loop_with_checkpointing(tiny_setup, tmp_path):
    cfg, params, batch = tiny_setup
    tcfg = TrainConfig(num_epochs=3, early_stopping_patience=10,
                       freeze_feature_encoder=False)
    ck = Checkpointer(str(tmp_path / "ckpt"), keep=2)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    p, opt_state, history = train(
        params, cfg, tcfg,
        train_batches=lambda: [jb],
        val_batches=lambda: [jb],
        checkpointer=ck,
    )
    assert len(history) == 3
    assert all(np.isfinite(h["train_loss"]) for h in history)

    # restore resumes from the latest step
    opt = make_optimizer(tcfg)
    restored = ck.restore(None, params, opt.init(params))
    assert restored is not None
    step_idx, rp, _ = restored
    assert step_idx == 2
    # restored params equal final params
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(rp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ck.best_step is not None


def test_background_iterator_order_and_errors():
    from asr_shap.pipeline.prefetch import background_iterator

    assert list(background_iterator(range(10), maxsize=3)) == list(range(10))

    def boom():
        yield 1
        raise ValueError("producer failed")

    it = background_iterator(boom())
    assert next(it) == 1
    with pytest.raises(ValueError, match="producer failed"):
        next(it)


def test_prefetch_to_device_yields_device_batches(rng):
    import jax.numpy as jnp

    from asr_shap.pipeline.prefetch import prefetch_to_device

    batches = [{"audio": rng.standard_normal((2, 100)).astype(np.float32),
                "audio_lengths": np.array([100, 80], np.int32)}
               for _ in range(4)]
    out = list(prefetch_to_device(iter(batches), depth=2))
    assert len(out) == 4
    for src, got in zip(batches, out):
        assert isinstance(got["audio"], jnp.ndarray)
        np.testing.assert_array_equal(np.asarray(got["audio"]), src["audio"])


def test_prefetch_to_device_with_mesh(rng):
    from jax.sharding import Mesh

    from asr_shap.pipeline.prefetch import prefetch_to_device

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = Mesh(np.array(jax.devices()), ("data",))
    n = len(jax.devices())
    batches = [{"audio": rng.standard_normal((n, 50)).astype(np.float32),
                "audio_lengths": np.full((n,), 50, np.int32)}]
    (got,) = prefetch_to_device(iter(batches), mesh=mesh)
    assert not got["audio"].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(got["audio"]), batches[0]["audio"])


def test_background_iterator_releases_producer_on_break():
    """Abandoning the consumer must unblock and stop the producer thread
    (no leaked thread pinning queued batches)."""
    import threading
    import time as _time

    from asr_shap.pipeline.prefetch import background_iterator

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = background_iterator(gen(), maxsize=2)
    assert next(it) == 0
    it.close()  # consumer walks away
    _time.sleep(0.5)
    n_after_close = len(produced)
    _time.sleep(0.3)
    # producer stopped: no further production after the close settled
    assert len(produced) == n_after_close
    assert n_after_close < 1000


def test_train_step_bf16_compute(tiny_config, rng):
    """Training with dtype="bfloat16" model compute: f32 master params get
    finite gradients through the cast and the loss decreases over steps."""
    import dataclasses

    cfg16 = dataclasses.replace(tiny_config, dtype="bfloat16",
                                matmul_precision="default")
    params = init_wav2vec2_params(jax.random.key(0), cfg16)
    tc = TrainConfig(batch_size=2, learning_rate=3e-4,
                     freeze_feature_encoder=False)
    opt = make_optimizer(tc)
    state = opt.init(params)
    step = jax.jit(make_train_step(cfg16, tc, opt))
    batch = {
        "audio": rng.standard_normal((2, 1600)).astype(np.float32),
        "audio_lengths": np.full((2,), 1600, np.int32),
        "labels": rng.integers(1, 32, (2, 5)).astype(np.int32),
        "label_lengths": np.full((2,), 5, np.int32),
    }
    losses = []
    for _ in range(4):
        params, state, loss = step(params, state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # master params remain float32
    assert params["lm_head"]["kernel"].dtype == jnp.float32


def test_background_iterator_starts_eagerly():
    """Production begins at construction, not at the first next() — the
    'depth steps ahead' prefetch contract (ADVICE r2)."""
    import threading
    import time

    from asr_shap.pipeline.prefetch import background_iterator

    produced = threading.Event()

    def gen():
        produced.set()
        yield 1

    it = background_iterator(gen(), maxsize=2)
    assert produced.wait(timeout=5.0), "producer did not start before next()"
    assert list(it) == [1]


def test_background_iterator_abandoned_before_start_releases_producer():
    """An abandoned (never-started) background iterator must not leak its
    eagerly-started producer thread blocked on a full queue."""
    import gc
    import threading
    import time as _time

    from asr_shap.pipeline.prefetch import background_iterator

    before = threading.active_count()
    gen = background_iterator(iter(range(1000)), maxsize=2)
    _time.sleep(0.2)  # producer fills the queue and blocks on put
    del gen
    gc.collect()
    deadline = _time.time() + 3.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() == before


def test_load_config_ignores_unknown_fields(tmp_path):
    """Archives outlive code: an embedded config field the current schema
    no longer knows must be dropped with a warning, not crash the load."""
    import json

    import numpy as np

    from asr_shap.core.config import Wav2Vec2Config
    from asr_shap.core import params_io

    path = str(tmp_path / "p.npz")
    params_io.save_params(
        path, {"w": np.zeros(2, np.float32)},
        config=Wav2Vec2Config(hidden_size=32),
    )
    data = dict(np.load(path))
    payload = json.loads(bytes(data[params_io._CONFIG_KEY]).decode())
    payload["fields"]["field_renamed_in_a_future_version"] = 7
    data[params_io._CONFIG_KEY] = np.frombuffer(
        json.dumps(payload).encode(), dtype=np.uint8
    )
    np.savez(path, **data)

    cfg = params_io.load_config(path)
    assert cfg is not None and cfg.hidden_size == 32
    assert not hasattr(cfg, "field_renamed_in_a_future_version")


def test_conformer_family_training_step(tiny_setup):
    """The training loop serves the conformer family through the same
    config-type dispatch as the explainer pipeline (reference R6 + R12):
    loss finite and decreasing on the toy batch."""
    from asr_shap.core.config import Wav2Vec2ConformerConfig
    from asr_shap.models.w2v2_conformer import init_w2v2_conformer_params

    _, _, batch = tiny_setup
    ccfg = Wav2Vec2ConformerConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16, 16), conv_stride=(5, 2),
        conv_kernel=(10, 3), feat_proj_dim=16, conv_depthwise_kernel_size=7,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    )
    params = init_w2v2_conformer_params(jax.random.key(0), ccfg)
    tcfg = TrainConfig(learning_rate=3e-4, freeze_feature_encoder=False)
    opt = make_optimizer(tcfg)
    step = jax.jit(make_train_step(ccfg, tcfg, opt))
    state = opt.init(params)
    p = params
    losses = []
    for _ in range(8):
        p, state, loss = step(p, state,
                              {k: jnp.asarray(v) for k, v in batch.items()})
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_train_synthetic_conformer_family():
    """train_synthetic initializes and evaluates the conformer family
    end-to-end (one tiny epoch; exercises init dispatch + greedy_wer)."""
    from asr_shap.core.config import Wav2Vec2ConformerConfig
    from asr_shap.pipeline.train_synthetic import train_synthetic

    ccfg = Wav2Vec2ConformerConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16, 16), conv_stride=(5, 2),
        conv_kernel=(10, 3), feat_proj_dim=16, conv_depthwise_kernel_size=7,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    )
    tcfg = TrainConfig(learning_rate=3e-4, num_epochs=1, batch_size=2,
                       early_stopping_patience=2,
                       freeze_feature_encoder=False, snrs_db=())
    params, summary = train_synthetic(
        ccfg, tcfg, clip_seconds=0.2, batches_per_epoch=2,
        val_batches_count=1, target_wer=10.0, seed=0,
    )
    assert np.isfinite(summary["final_train_loss"])
    assert "heldout_greedy_wer" in summary
    assert "conformer" in type(params).__name__.lower() or isinstance(params, dict)
