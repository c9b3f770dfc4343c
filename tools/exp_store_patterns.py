#!/usr/bin/env python
"""Which (read, store) patterns for time-sliced span blocks does Mosaic
accept at bf16?  Probes candidate layouts for the training-scan kernels:

  a) 4D ref (G, 1, S, d):  ref[:, 0, sub, :]        (current layout)
  b) 3D ref (G, S, d):     ref[:, sub, :]
  c) 3D ref (G, S, d):     ref[:, sub:sub+1, :] = x[:, None, :]
  d) 4D ref (G, 1, S, d):  ref[:, 0:1, sub:sub+1, :] = x[:, None, None, :]
  e) time-leading 3D ref (S, G, d): ref[sub] = x
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys as _s
G, S, D = 32, 4, (208 if "--d208" in _s.argv else 512)
DT = jnp.float32 if "--f32" in _s.argv else jnp.bfloat16


def run(pattern):
    def kernel(x_ref, o_ref):
        for sub in range(S):
            if pattern == "a":
                v = x_ref[:, 0, sub, :]
                o_ref[:, 0, sub, :] = v * 2
            elif pattern == "b":
                v = x_ref[:, sub, :]
                o_ref[:, sub, :] = v * 2
            elif pattern == "c":
                v = x_ref[:, sub:sub + 1, :][:, 0, :]
                o_ref[:, sub:sub + 1, :] = (v * 2)[:, None, :]
            elif pattern == "d":
                v = x_ref[:, 0:1, sub:sub + 1, :][:, 0, 0, :]
                o_ref[:, 0:1, sub:sub + 1, :] = (v * 2)[:, None, None, :]
            elif pattern == "e":
                v = x_ref[sub]
                o_ref[sub] = v * 2

    if pattern in ("a", "d"):
        shape = (G, 1, S, D)
        spec = pl.BlockSpec(shape, lambda: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    elif pattern in ("b", "c"):
        shape = (G, S, D)
        spec = pl.BlockSpec(shape, lambda: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    else:
        shape = (S, G, D)
        spec = pl.BlockSpec(shape, lambda: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    x = jnp.arange(G * S * D, dtype=jnp.float32).reshape(shape).astype(DT)
    out = pl.pallas_call(
        kernel, in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(shape, DT))(x)
    ok = bool(jnp.all(out == x * 2))
    return ok


for pat in "abcde":
    try:
        print(pat, "OK" if run(pat) else "WRONG-VALUES", flush=True)
    except Exception as ex:  # noqa: BLE001
        msg = str(ex).split("\n")[0][:120]
        print(pat, "FAIL:", msg, flush=True)
