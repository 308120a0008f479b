"""On-hardware exactness gate for the fused_aligned default.

Runs scripts/fused_parity_gate.py in a subprocess on the REAL platform
(the pytest suite itself is pinned to the virtual CPU mesh by conftest.py;
the subprocess restores the stashed JAX_PLATFORMS).  Skips when no TPU is
reachable.  This is the gate required by VERDICT r2 next #1(a) before
``grouped_impl='auto'`` may resolve to the fused kernel on TPU.
"""

import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_fused_hardware_parity_gate():
    env = dict(os.environ)
    hw = env.pop('NBASR_HW_JAX_PLATFORMS', '')
    if hw:
        env['JAX_PLATFORMS'] = hw
    else:
        env.pop('JAX_PLATFORMS', None)
    # drop the virtual 8-CPU-device forcing; the gate wants the real chip
    flags = env.get('XLA_FLAGS', '')
    flags = ' '.join(f for f in flags.split()
                     if not f.startswith('--xla_force_host_platform'))
    if flags:
        env['XLA_FLAGS'] = flags
    else:
        env.pop('XLA_FLAGS', None)

    try:
        proc = subprocess.run(
            [sys.executable, str(REPO / 'scripts' / 'fused_parity_gate.py')],
            env=env, cwd=str(REPO), capture_output=True, text=True,
            timeout=1740)
    except subprocess.TimeoutExpired:
        pytest.skip('hardware gate timed out (TPU tunnel unavailable/slow)')
    assert proc.returncode == 0, \
        f'gate failed:\nstdout: {proc.stdout}\nstderr: {proc.stderr[-2000:]}'
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    if result.get('skipped'):
        pytest.skip(f"no TPU: {result['skipped']}")
    assert result['ok'] is True
    assert result['auto_resolves_fused'] is True
