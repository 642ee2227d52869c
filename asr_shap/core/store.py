"""The ``data/`` npy persistence contract.

The reference persists one (audio, noise, shap_values, text) quadruple per
test sample as four .npy files named
``{kind}_sample_{i}_{type}_{snr}.npy`` (shap_calculation.py:199-210), and
every downstream tool — the eta_raw/WER sweep (nraw_vs_wer.py:107-138), the
interactive visualizer (visualization.py:299-300) and the standalone metric
(calculate_metric.py:161-165) — restarts from those files. We keep the exact
naming contract for interoperability and add what the reference lacks:
resumability (``completed()``) and an explicit manifest.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional

import numpy as np

KINDS = ("audio", "noise", "shap_values", "text")
_FNAME_RE = re.compile(
    r"^(audio|noise|shap_values|text)_sample_(\d+)_([a-z]+)_(inf|[-0-9.]+)\.npy$"
)


@dataclass(frozen=True)
class SampleKey:
    index: int
    type: str       # "clean" | "noisy"
    snr: str        # "inf" or the dB value as formatted by the pipeline

    def filename(self, kind: str) -> str:
        # Naming contract: shap_calculation.py:199-210
        # f"{kind}_sample_{i}_{sample['type']}_{sample['snr']}.npy"
        return f"{kind}_sample_{self.index}_{self.type}_{self.snr}.npy"


def key_for(index: int, type_: str, snr_db: float) -> SampleKey:
    # The reference formats float("inf") as "inf" and integer SNRs as "5"
    # via f-string interpolation of the original python value.
    if np.isinf(snr_db):
        snr = "inf"
    elif float(snr_db) == int(snr_db):
        snr = str(int(snr_db))
    else:
        snr = str(snr_db)
    return SampleKey(index=index, type=type_, snr=snr)


class AttributionStore:
    """Filesystem store for attribution quadruples under ``data_dir``.

    ``async_writes=True`` routes float32 arrays through the native C++
    write-executor pool (asr_shap.native.NpyWriterPool): ``save`` returns
    after a memcpy and the disk IO overlaps the next group's device compute;
    ``flush()`` (called by ``write_manifest``) blocks until everything is on
    disk and raises if any write failed. Falls back to synchronous writes
    without the native library.
    """

    def __init__(self, data_dir: str = "data", async_writes: bool = False,
                 writer_threads: int = 2):
        self.data_dir = data_dir
        os.makedirs(data_dir, exist_ok=True)
        self._pool = None
        if async_writes:
            from asr_shap.native import NpyWriterPool

            pool = NpyWriterPool(writer_threads)
            self._pool = pool if pool.native else None

    def _path(self, key: SampleKey, kind: str) -> str:
        return os.path.join(self.data_dir, key.filename(kind))

    def save(
        self,
        key: SampleKey,
        audio: np.ndarray,
        noise: np.ndarray,
        shap_values: np.ndarray,
        text: str,
    ) -> None:
        self._save_array(self._path(key, "audio"), np.asarray(audio))
        self._save_array(self._path(key, "noise"), np.asarray(noise))
        self._save_array(self._path(key, "shap_values"), np.asarray(shap_values))
        text_path = self._path(key, "text")
        np.save(text_path + ".tmp.npy", np.asarray(text))
        os.replace(text_path + ".tmp.npy", text_path)  # atomic, like the arrays

    def flush(self) -> None:
        """Wait for queued async writes; raise on any failed write."""
        if self._pool is not None:
            errors = self._pool.flush()
            if errors:
                raise IOError(f"{errors} async npy write(s) failed in "
                              f"{self.data_dir}")

    def _save_array(self, path: str, arr: np.ndarray) -> None:
        """float32 arrays go through the native GIL-free npy writer when
        built (the shap matrix is ~110 MB/sample, SURVEY.md section 3.1) —
        asynchronously when the store has a writer pool; anything else
        through np.save."""
        if arr.dtype == np.float32 and arr.ndim in (1, 2):
            if self._pool is not None:
                self._pool.submit(path, arr)
                return
            try:
                from asr_shap.native import write_npy_f32_native

                if write_npy_f32_native(path, arr):
                    return
            except Exception:
                pass
        # atomic fallback: tmp + rename, so resume never sees partial files
        tmp = path + ".tmp.npy"
        np.save(tmp, arr)
        os.replace(tmp, path)

    def load(self, key: SampleKey) -> Dict[str, object]:
        out: Dict[str, object] = {}
        out["audio"] = np.load(self._path(key, "audio"))
        out["noise"] = np.load(self._path(key, "noise"))
        out["shap_values"] = np.load(self._path(key, "shap_values"))
        out["text"] = str(np.load(self._path(key, "text")))
        return out

    def array_shape(self, key: SampleKey, kind: str) -> tuple:
        """Shape of a stored array WITHOUT loading its data (npy header via
        mmap) — lets consumers length-bucket a large store lazily instead of
        materializing every ~100 MB phi matrix up front."""
        return tuple(np.load(self._path(key, kind), mmap_mode="r").shape)

    def completed(self, key: SampleKey) -> bool:
        """True if all four files exist — enables resume (absent upstream,
        SURVEY.md section 5 checkpoint/resume)."""
        return all(os.path.exists(self._path(key, k)) for k in KINDS)

    def keys(self) -> List[SampleKey]:
        """Discover stored samples by globbing audio files, like
        nraw_vs_wer.py:107-112."""
        found = []
        for name in sorted(os.listdir(self.data_dir)):
            m = _FNAME_RE.match(name)
            if m and m.group(1) == "audio":
                found.append(
                    SampleKey(index=int(m.group(2)), type=m.group(3), snr=m.group(4))
                )
        return found

    def iter_samples(self) -> Iterator[Dict[str, object]]:
        for key in self.keys():
            if self.completed(key):
                d = self.load(key)
                d["key"] = key
                yield d

    def write_manifest(self, extra: Optional[dict] = None) -> None:
        self.flush()  # manifest must describe fully-landed files
        manifest = {
            "samples": [
                {"index": k.index, "type": k.type, "snr": k.snr}
                for k in self.keys()
            ]
        }
        if extra:
            manifest.update(extra)
        with open(os.path.join(self.data_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
