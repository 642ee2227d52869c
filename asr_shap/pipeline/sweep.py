"""eta_raw-vs-WER evaluation sweep over the attribution store — the
equivalent of ``python nraw_vs_wer.py`` (call stack SURVEY.md section 3.3),
with the model forward, greedy decode prep, and eta_raw all device-side.

The reference loops samples serially on the host, one model call each
(nraw_vs_wer.py:118-154). Here stored samples are grouped into exact-length
buckets (like run_shap's hot loop): one jitted executable per distinct audio
length runs the batched decode + batched eta_raw for up to ``batch`` samples
per call, and WER for the whole sweep is one native C++ batch call over the
transcript pairs.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from asr_shap.audio.normalize import zero_mean_unit_var
from asr_shap.core.config import MetricConfig, WAV2VEC2_VOCAB, Wav2Vec2Config
from asr_shap.core.store import AttributionStore
from asr_shap.metrics.eta_raw import eta_raw
from asr_shap.metrics.wer import batch_wer
from asr_shap.models.wav2vec2 import wav2vec2_logits
from asr_shap.ops.ctc import ctc_greedy_decode, ctc_ids_to_text

logger = logging.getLogger(__name__)


def eta_wer_sweep(
    params,
    model_cfg: Wav2Vec2Config,
    store: AttributionStore,
    metric_cfg: MetricConfig = MetricConfig(),
    logits_fn=None,
    vocab=WAV2VEC2_VOCAB,
    batch: int = 8,
) -> List[Dict]:
    """For every stored (audio, noise, shap, text) quadruple: transcribe the
    mixed audio, compute WER against the reference text and eta_raw against
    the ITM; returns one record per sample (the scatter data of
    nraw_vs_wer.py:160-182), in store iteration order.

    ``logits_fn(params, cfg, x[B, N]) -> [B, T, V]`` swaps the decoding
    model (e.g. ``w2v2_conformer_logits``); default is the reference's
    Wav2Vec2. ``vocab`` swaps the id->symbol table alongside it. ``batch``
    bounds samples per jitted call (the [B, N_audio, T] phi stack is the
    memory driver at ~110 MB/sample for 6 s clips).
    """
    logits_fn = logits_fn or wav2vec2_logits

    # params as a jit ARGUMENT: closing over large weight trees bakes them
    # into the HLO as constants (same rationale as run_shap._sample_step)
    @jax.jit
    def bucket_step(p, mixed, clean, noise, phi):
        logits = logits_fn(p, model_cfg, zero_mean_unit_var(mixed))
        ids, keep = ctc_greedy_decode(logits)
        etas = jax.vmap(lambda c, u, f: eta_raw(c, u, f, metric_cfg))(
            clean, noise, phi
        )
        return ids, keep, etas

    # exact-length buckets (order preserved within a bucket); phi shape is
    # part of the bucket key so stores mixing explainer output shapes still
    # group into consistent executables. Bucketing reads only npy HEADERS
    # (store.array_shape) — at ~110 MB of phi per 6 s clip, materializing an
    # 80-sample store up front would cost ~10-20 GB of host RAM; full arrays
    # load per batch group just-in-time below.
    keys = [k for k in store.keys() if store.completed(k)]
    buckets: Dict[tuple, List[int]] = {}
    for i, k in enumerate(keys):
        buckets.setdefault(
            (store.array_shape(k, "audio")[0], store.array_shape(k, "shap_values")),
            [],
        ).append(i)

    records: List[Optional[Dict]] = [None] * len(keys)
    for (length, phi_shape), idxs in sorted(buckets.items()):
        for start in range(0, len(idxs), batch):
            group = idxs[start : start + batch]
            samples = [store.load(keys[i]) for i in group]
            mixed = np.stack(
                [np.asarray(s["audio"], np.float32) for s in samples]
            )
            noise = np.stack(
                [np.asarray(s["noise"], np.float32) for s in samples]
            )
            phi = np.stack(
                [np.asarray(s["shap_values"], np.float32) for s in samples]
            )
            clean = mixed - noise  # nraw_vs_wer.py:141-142

            ids, keep, etas = bucket_step(
                params, jnp.asarray(mixed), jnp.asarray(clean),
                jnp.asarray(noise), jnp.asarray(phi),
            )
            ids, keep, etas = np.asarray(ids), np.asarray(keep), np.asarray(etas)

            for j, i in enumerate(group):
                key = keys[i]
                hyp = ctc_ids_to_text(ids[j], keep[j], vocab)
                records[i] = {
                    "index": key.index,
                    "type": key.type,
                    "snr": key.snr,
                    "wer": float("nan"),  # filled by the batch WER pass
                    "eta_raw": float(etas[j]),
                    "reference": samples[j]["text"],
                    "hypothesis": hyp,
                }
        logger.info(
            "bucket len=%d phi=%s: %d samples in %d jitted call(s)",
            length, phi_shape, len(idxs), -(-len(idxs) // batch),
        )

    done: List[Dict] = [r for r in records if r is not None]
    wers = batch_wer([r["reference"] for r in done], [r["hypothesis"] for r in done])
    for r, w in zip(done, wers):
        r["wer"] = w
        logger.info(
            "sample %d %s snr=%s: wer=%.3f eta_raw=%.3f",
            r["index"], r["type"], r["snr"], r["wer"], r["eta_raw"],
        )
    return done


def _is_clean(record: Dict) -> bool:
    """Clean rows carry snr=inf (as float) or "inf" (store-key string)."""
    snr = record.get("snr")
    if isinstance(snr, str):
        return snr == "inf"
    return snr is None or not np.isfinite(snr)


def correlation(records: List[Dict], include_clean: bool = False) -> Optional[float]:
    """Pearson correlation of (wer, eta_raw) across the sweep.

    Clean rows (snr=inf) are EXCLUDED by default: with noise == 0 every
    segment is speech-dominated, the ITM is all-true, and eta_raw == 1.0 by
    construction (nraw_vs_wer.py:141-148 semantics: clean = mixed - noise).
    Including those degenerate points manufactures correlation that says
    nothing about attribution quality; report them separately instead
    (see :func:`sweep_summary`).
    """
    pts = [
        (r["wer"], r["eta_raw"])
        for r in records
        if np.isfinite(r["wer"]) and (include_clean or not _is_clean(r))
    ]
    if len(pts) < 2:
        return None
    w, e = np.asarray(pts).T
    if w.std() == 0 or e.std() == 0:
        return None
    return float(np.corrcoef(w, e)[0, 1])


def _avg_ranks(a: np.ndarray) -> np.ndarray:
    """Average ranks (1-based) with ties sharing their mean rank — the
    tie treatment Spearman's rho requires. scipy.stats.rankdata(method=
    "average") semantics, implemented here so scipy stays optional."""
    sorter = np.argsort(a, kind="mergesort")
    inv = np.empty_like(sorter)
    inv[sorter] = np.arange(len(a))
    sa = a[sorter]
    run_start = np.r_[True, sa[1:] != sa[:-1]]
    dense = run_start.cumsum()[inv]  # 1-based dense rank per element
    bounds = np.r_[np.nonzero(run_start)[0], len(a)]
    # run occupying sorted positions [bounds[d-1], bounds[d]) has average
    # 1-based rank (bounds[d-1]+1 + bounds[d]) / 2
    return 0.5 * (bounds[dense - 1] + 1 + bounds[dense])


def _avg_ranks_rows(x: np.ndarray) -> np.ndarray:
    """Row-wise `_avg_ranks` for a [m, n] batch of bootstrap resamples —
    same average-of-(first+last)-positions tie rule, vectorized so the CI
    computation is two argsorts instead of an m-iteration Python loop."""
    m, n = x.shape
    order = np.argsort(x, axis=1, kind="mergesort")
    xs = np.take_along_axis(x, order, axis=1)
    run_start = np.concatenate(
        [np.ones((m, 1), bool), xs[:, 1:] != xs[:, :-1]], axis=1
    )
    pos = np.arange(n)
    start = np.maximum.accumulate(np.where(run_start, pos, 0), axis=1)
    run_last = np.concatenate(
        [run_start[:, 1:], np.ones((m, 1), bool)], axis=1
    )
    end = np.where(run_last, pos, n - 1)
    end = np.minimum.accumulate(end[:, ::-1], axis=1)[:, ::-1]
    sorted_ranks = 0.5 * (start + 1 + end + 1)
    ranks = np.empty((m, n), np.float64)
    np.put_along_axis(ranks, order, sorted_ranks, axis=1)
    return ranks


def _pearson(w: np.ndarray, e: np.ndarray) -> float:
    return float(np.corrcoef(w, e)[0, 1])


def correlation_stats(
    w: np.ndarray,
    e: np.ndarray,
    n_boot: int = 5_000,
    n_perm: int = 10_000,
    seed: int = 0,
) -> Dict:
    """Defensible correlation statistics for the eta_raw-vs-WER sweep:
    Pearson r AND Spearman rho (the WER axis is heavily tied at 0, which
    makes Pearson alone misleading — VERDICT r3 weak #1), each with a
    seeded two-sided permutation p-value and a seeded bootstrap 95%
    percentile CI. Pure numpy, fully vectorized over resamples (~0.2 s at
    n=120 with the default 5k bootstrap / 10k permutations)."""
    w = np.asarray(w, np.float64)
    e = np.asarray(e, np.float64)
    n = len(w)
    out: Dict = {"n": n}
    if n < 3 or w.std() == 0 or e.std() == 0:
        out.update({"pearson_r": None, "spearman_rho": None})
        return out

    rw, re_ = _avg_ranks(w), _avg_ranks(e)
    out["pearson_r"] = _pearson(w, e)
    out["spearman_rho"] = _pearson(rw, re_)

    rng = np.random.default_rng(seed)

    def _perm_p(a: np.ndarray, b: np.ndarray, observed: float) -> float:
        za = (a - a.mean()) / a.std()
        zb = (b - b.mean()) / b.std()
        # permuting b relative to a; r = mean(za * zb_perm) per permutation
        idx = np.argsort(rng.random((n_perm, n)), axis=1)
        r_perm = (zb[idx] @ za) / n
        return float((1 + np.sum(np.abs(r_perm) >= abs(observed) - 1e-12))
                     / (1 + n_perm))

    def _boot_ci(a: np.ndarray, b: np.ndarray, rank: bool) -> list:
        idx = rng.integers(0, n, size=(n_boot, n))
        A, B = a[idx], b[idx]
        if rank:
            A, B = _avg_ranks_rows(A), _avg_ranks_rows(B)
        ac = A - A.mean(axis=1, keepdims=True)
        bc = B - B.mean(axis=1, keepdims=True)
        denom = np.sqrt((ac * ac).sum(axis=1) * (bc * bc).sum(axis=1))
        with np.errstate(invalid="ignore", divide="ignore"):
            rs = np.where(denom == 0, np.nan,  # degenerate resample
                          (ac * bc).sum(axis=1) / denom)
        lo, hi = np.nanpercentile(rs, [2.5, 97.5])
        return [float(lo), float(hi)]

    out["pearson_p"] = _perm_p(w, e, out["pearson_r"])
    # ranks are permutation-invariant: Spearman's permutation test is the
    # Pearson test on the rank vectors
    out["spearman_p"] = _perm_p(rw, re_, out["spearman_rho"])
    out["pearson_ci95"] = _boot_ci(w, e, rank=False)
    out["spearman_ci95"] = _boot_ci(w, e, rank=True)
    out["n_boot"] = n_boot
    out["n_perm"] = n_perm
    out["stats_seed"] = seed
    return out


def sweep_summary(
    records: List[Dict],
    n_boot: int = 5_000,
    n_perm: int = 10_000,
    seed: int = 0,
) -> Dict:
    """Aggregate view of a sweep: the noisy-row correlation (the defensible
    statistic) with Spearman/permutation-p/bootstrap-CI companions, the
    all-row correlation (the reference's, kept for comparability), and
    per-SNR means of WER and eta_raw."""
    noisy = [r for r in records if not _is_clean(r)]
    by_snr: Dict[str, List[Dict]] = {}
    for r in records:
        by_snr.setdefault(str(r.get("snr")), []).append(r)
    per_snr = {
        snr: {
            "n": len(rs),
            "mean_wer": float(np.nanmean([x["wer"] for x in rs])),
            "mean_eta_raw": float(np.mean([x["eta_raw"] for x in rs])),
        }
        for snr, rs in sorted(by_snr.items())
    }
    pts = [
        (r["wer"], r["eta_raw"]) for r in noisy if np.isfinite(r["wer"])
    ]
    stats: Dict = {}
    if len(pts) >= 3:
        w, e = np.asarray(pts).T
        cs = correlation_stats(w, e, n_boot=n_boot, n_perm=n_perm, seed=seed)
        # "pearson_r" is excluded: the headline pearson_r_noisy below is the
        # same statistic computed by correlation() (identical point set)
        stats = {f"{k}_noisy": v for k, v in cs.items()
                 if k not in ("n", "pearson_r")}
        stats["n_noisy_wer_gt0"] = int(np.sum(w > 0))
    return {
        "pearson_r_noisy": correlation(records),
        "pearson_r_all": correlation(records, include_clean=True),
        "n_noisy": len(noisy),
        "n_clean": len(records) - len(noisy),
        "per_snr": per_snr,
        **stats,
    }
