"""Harness test for the roofline probe CLI (tools/roofline.py).

Checks the chained-in-jit probe harness itself — shapes, JSON output,
and the t = flops/R + o fit — on tiny CPU shapes.  The actual ceiling
numbers are only meaningful on the bench chip (BENCH.md "Measured chip
ceilings"); this test pins the machinery that produces them.
"""

import json

import pytest

from omnihd_scenes_tpu.tools import roofline


@pytest.mark.slow
def test_small_probes_run(capsys):
    roofline.main(['--small', '--iters', '2'])
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 6
    names = [l['probe'] for l in lines]
    assert names[0] == 'dot_256_bfloat16'
    assert names[2] == 'fitted'
    assert 'practical_peak_tflops' in lines[2]
    for l in lines:
        if 'tflops' in l:
            assert l['tflops'] > 0 and l['ms'] > 0


def test_fit_peak_recovers_known_rate():
    # Synthesize two dot timings from R = 100 TF/s, o = 0.5 ms and
    # check the fit returns them.
    R, o = 100e12, 5e-4
    n1, n2 = 4096, 8192
    r1 = {'ms': (2 * n1 ** 3 / R + o) * 1e3}
    r2 = {'ms': (2 * n2 ** 3 / R + o) * 1e3}
    fit = roofline.fit_peak(r1, r2, n1, n2)
    assert abs(fit['practical_peak_tflops'] - 100.0) < 0.2
    assert abs(fit['per_iter_overhead_ms'] - 0.5) < 0.01
