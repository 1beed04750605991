#!/usr/bin/env python
"""Forward-pass smoke of the LEAF frontend — the reference's test_leaf.py
(reference: test_leaf.py:1-12) ported to the JAX API: build `Leaf`, run a
random 1 s waveform, print shapes and value ranges."""

import jax
import jax.numpy as jnp

from leaf_tpu.frontend import Leaf


def main():
    fe = Leaf()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16000))
    params = fe.init(jax.random.PRNGKey(1), x)
    out = fe.apply(params, x)
    print("input:", x.shape)
    print("output:", out.shape)  # (1, 100, 40)
    print("min/max/mean:", float(out.min()), float(out.max()),
          float(out.mean()))


if __name__ == "__main__":
    main()
