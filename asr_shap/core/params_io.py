"""Flat .npz params persistence — a light-weight alternative to orbax for
shipping converted checkpoints (the HF->JAX conversion runs once; the npz is
what TPU boxes load). The archive optionally carries its architecture config
(like an HF config.json riding with the weights), so ``load_params`` can
reconstruct the matching model without the caller guessing flags."""

from __future__ import annotations

import dataclasses
import json
import logging
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

_SEP = "::"
_CONFIG_KEY = "__asr_shap_config__"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}{_SEP}"))
    else:
        out[prefix[: -len(_SEP)]] = np.asarray(tree)
    return out


def save_params(path: str, params: Any, config: Any = None) -> None:
    """``config``: an asr_shap config dataclass to embed (class name +
    fields as JSON), or None for a weights-only archive."""
    flat = _flatten(params)
    if config is not None:
        payload = {
            "class": type(config).__name__,
            "fields": dataclasses.asdict(config),
        }
        flat[_CONFIG_KEY] = np.frombuffer(
            json.dumps(payload).encode(), dtype=np.uint8
        )
    np.savez(path, **flat)


def load_config(path: str) -> Optional[Any]:
    """The embedded config dataclass, or None for weights-only archives."""
    data = np.load(path)
    if _CONFIG_KEY not in data.files:
        return None
    payload = json.loads(bytes(data[_CONFIG_KEY]).decode())
    from asr_shap.core import config as config_mod

    cls = getattr(config_mod, payload["class"])
    # filter to the CURRENT dataclass schema: archives outlive code, and a
    # renamed/removed field must not make every previously saved .npz
    # unloadable (cls(**unknown) would TypeError). Dropped fields warn;
    # fields added since the save keep their defaults.
    known = {f.name for f in dataclasses.fields(cls)}
    fields = {}
    dropped = []
    for k, v in payload["fields"].items():
        if k in known:
            fields[k] = tuple(v) if isinstance(v, list) else v
        else:
            dropped.append(k)
    if dropped:
        logger.warning(
            "%s: embedded config carries fields unknown to current %s "
            "(%s) — ignoring them", path, cls.__name__, ", ".join(dropped),
        )
    return cls(**fields)


def load_params(path: str) -> Any:
    data = np.load(path)
    tree: Dict[str, Any] = {}
    for key in data.files:
        if key == _CONFIG_KEY:
            continue
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])

    def listify(node):
        if isinstance(node, dict):
            if node and all(k.startswith("#") for k in node):
                return [listify(node[f"#{i}"]) for i in range(len(node))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(tree)
