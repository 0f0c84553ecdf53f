"""Measured-ceiling roofline probes (reproduces BENCH.md "Measured chip
ceilings").

The per-component utilization claims in BENCH.md are graded against the
*measured* practical matmul peak of the attached chip, not the
datasheet number.  This CLI re-derives that peak so the claim chain is
reproducible:

- bf16 ``dot`` at 4096^3 and 8192^3, chained inside one jit
  (``lax.fori_loop`` with a data dependency, single scalar readback —
  the same harness as ``bench.py``; per-call async timing through the
  TPU relay measures dispatch, not execution).
- Fit ``t = flops / R + o`` to the two dot points: R = practical
  matmul rate, o = fixed per-iteration loop cost (inflates isolated
  small-op probes; negligible for >=25 ms whole-model iterations).
- The two production conv shapes the profile leans on: the DepthNet
  block conv (3x3, 256ch @ 6x136x240) and the FPNC reduce conv
  (3x3, 768->256 @ 6x136x240).
- An s8xs8->s32 dot at 4096^3 (the int8-tier ceiling; BENCH.md round 2
  "int8 is ~1.15x, not 2x").

Usage: ``python -m omnihd_scenes_tpu.tools.roofline [--iters N]``.
Prints one JSON line per probe plus the fitted peak.  Run it on the
bench chip to regenerate the table in BENCH.md "Measured chip
ceilings"; on CPU it still runs (small shapes via ``--small``) so the
harness itself is testable.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def chained_time(fn, args, iters):
    """Seconds per iteration of ``fn`` chained ``iters`` times in one jit.

    ``fn(carry, *args) -> scalar-ish array`` must return something whose
    mean feeds the next iteration's carry, forcing sequential execution.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*a):
        def body(_, c):
            return fn(c, *a).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(*args))  # compile + warm
    # Min of a few timed runs: a single run inherits full run-to-run
    # noise, which skews the two-point fit (ADVICE r3).
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def probe_dot(n, iters, dtype='bfloat16'):
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    if dtype == 'int8':
        a = rng.randint(-127, 128, size=(n, n)).astype(np.int8)
        b = rng.randint(-127, 128, size=(n, n)).astype(np.int8)

        def fn(c, a, b):
            out = jnp.dot((a + c.astype(jnp.int8)), b,
                          preferred_element_type=jnp.int32)
            return jnp.mean(out.astype(jnp.float32)) * 1e-30
    else:
        a = rng.randn(n, n).astype(dtype)
        b = rng.randn(n, n).astype(dtype)

        def fn(c, a, b):
            out = jnp.dot(a + c.astype(a.dtype), b)
            return jnp.mean(out.astype(jnp.float32)) * 1e-30

    t = chained_time(fn, (a, b), iters)
    flops = 2.0 * n * n * n
    return {'probe': f'dot_{n}_{dtype}', 'ms': round(t * 1e3, 3),
            'tflops': round(flops / t / 1e12, 3)}


def probe_conv(cin, cout, hw, iters, batch=6, dtype='bfloat16'):
    import jax.numpy as jnp
    from flax import linen as nn

    h, w = hw
    rng = np.random.RandomState(0)
    x = rng.randn(batch, h, w, cin).astype(dtype)
    conv = nn.Conv(cout, (3, 3), padding='SAME', use_bias=False,
                   dtype=dtype)
    params = conv.init({'params': np.zeros(2, np.uint32)},
                       jnp.zeros((1, 8, 8, cin), dtype))

    def fn(c, x):
        out = conv.apply(params, x + c.astype(x.dtype))
        return jnp.mean(out.astype(jnp.float32)) * 1e-30

    t = chained_time(fn, (x,), iters)
    flops = 2.0 * batch * h * w * 9 * cin * cout
    return {'probe': f'conv3x3_{cin}to{cout}_{h}x{w}_{dtype}',
            'ms': round(t * 1e3, 3), 'tflops': round(flops / t / 1e12, 3)}


def fit_peak(r1, r2, n1, n2):
    """Fit t = flops/R + o from two dot measurements (ms keys)."""
    f1, f2 = 2.0 * n1 ** 3, 2.0 * n2 ** 3
    t1, t2 = r1['ms'] * 1e-3, r2['ms'] * 1e-3
    # t = f/R + o  =>  R = (f2 - f1) / (t2 - t1),  o = t1 - f1/R
    # The fit is only meaningful if the larger dot measurably takes
    # longer; otherwise (timing noise, tiny --small shapes on a fast
    # CPU) flag the measurement instead of printing a clamped,
    # astronomically large peak (ADVICE r3).
    if t2 - t1 <= 0.05 * t1:
        return {'probe': 'fitted', 'practical_peak_tflops': None,
                'per_iter_overhead_ms': None,
                'error': 'non-monotonic timings: '
                         f't({n1})={t1 * 1e3:.3f}ms '
                         f't({n2})={t2 * 1e3:.3f}ms'}
    R = (f2 - f1) / (t2 - t1)
    o = t1 - f1 / R
    return {'probe': 'fitted', 'practical_peak_tflops': round(R / 1e12, 1),
            'per_iter_overhead_ms': round(o * 1e3, 3)}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument('--iters', type=int, default=16)
    p.add_argument('--small', action='store_true',
                   help='tiny shapes (CPU smoke / harness test)')
    args = p.parse_args(argv)

    if args.small:
        n1, n2, conv_hw, conv_b = 256, 512, (16, 24), 2
    else:
        n1, n2, conv_hw, conv_b = 4096, 8192, (136, 240), 6

    r1 = probe_dot(n1, args.iters)
    print(json.dumps(r1))
    r2 = probe_dot(n2, max(args.iters // 2, 2))
    print(json.dumps(r2))
    print(json.dumps(fit_peak(r1, r2, n1, n2)))
    print(json.dumps(probe_conv(256, 256, conv_hw, args.iters,
                                batch=conv_b)))
    print(json.dumps(probe_conv(768, 256, conv_hw, args.iters,
                                batch=conv_b)))
    print(json.dumps(probe_dot(n1, args.iters, dtype='int8')))


if __name__ == '__main__':
    main()
