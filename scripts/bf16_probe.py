"""Micro-probe: VPU elementwise throughput f32 vs bf16 (TPU).

If bf16 elementwise ops run ~2x (two elements per lane slot), the render
kernel's object-intersection math is worth casting down.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, L, OPS, GRID, N = 32, 128, 256, 4096, 50


def make_kernel(dtype):
    def kernel(x_ref, o_ref):
        v = x_ref[:].astype(dtype)
        a = v
        for i in range(OPS):
            a = a * v + jnp.asarray(1e-3, dtype)
        o_ref[:] = a.astype(jnp.float32)

    return kernel


def run(dtype):
    x = jnp.ones((GRID, S, L), jnp.float32) * 0.99

    @functools.partial(jax.jit, donate_argnums=(0,))
    def go(x):
        def body(x, _):
            y = pl.pallas_call(
                make_kernel(dtype),
                out_shape=jax.ShapeDtypeStruct((GRID, S, L), jnp.float32),
                grid=(GRID,),
                in_specs=[pl.BlockSpec((1, S, L), lambda g: (g, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, S, L), lambda g: (g, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(x)
            return y * (1.0 - 1e-7), ()
        x, _ = jax.lax.scan(body, x, None, length=N)
        return x

    x = go(x)
    ts = []
    for _ in range(3):
        t0 = time.time()
        x = jax.block_until_ready(go(x))
        ts.append(time.time() - t0)
    t = sorted(ts)[1] / N
    print(f"{dtype.__name__:9s}: {t*1e3:7.3f} ms/iter "
          f"({GRID*S*L*OPS*2/t/1e12:.2f} Tflop/s)", flush=True)
    return t


if __name__ == "__main__":
    tf = run(jnp.float32)
    tb = run(jnp.bfloat16)
    print(f"bf16 speedup: {tf/tb:.2f}x")
