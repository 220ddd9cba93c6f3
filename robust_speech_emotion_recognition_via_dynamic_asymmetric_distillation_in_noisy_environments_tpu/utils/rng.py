"""PRNG helpers: seeds are threaded as explicit jax.random keys everywhere.

The reference relies on global torch/numpy seeding (DAD config.py:197-218);
here each stochastic component receives its own fold of a root key, which is
what makes the jitted train step deterministic and replayable.
"""

from __future__ import annotations

import jax


def key_from_seed(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def split_key(key: jax.Array, n: int = 2):
    return jax.random.split(key, n)
