"""PRNG plumbing.

The reference fixes seed 42 in every script via global ``np.random.seed``/
``torch.manual_seed`` (e.g. 04_lstm_model.py:41-44). Here randomness is explicit:
one root `jax.random.key` per run, split into named streams, so results are
reproducible under jit/vmap/shard_map and independent of execution order.
"""

from __future__ import annotations

from typing import Dict, Iterator

import jax
import numpy as np


def seed_everything(seed: int = 42) -> jax.Array:
    """Seed host-side numpy (for data shuffling / sklearn) and return a JAX root key."""
    np.random.seed(seed)
    return jax.random.key(seed)


def key_chain(root: jax.Array) -> Iterator[jax.Array]:
    """Infinite stream of fresh keys derived from ``root``."""
    while True:
        root, sub = jax.random.split(root)
        yield sub


class KeyRing:
    """Named PRNG streams: ``ring('dropout')`` always yields a fresh key for that stream."""

    def __init__(self, root: jax.Array):
        self._root = root
        self._counters: Dict[str, int] = {}

    def __call__(self, name: str) -> jax.Array:
        idx = self._counters.get(name, 0)
        self._counters[name] = idx + 1
        return jax.random.fold_in(jax.random.fold_in(self._root, hash(name) % (2**31)), idx)
