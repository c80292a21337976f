"""Test session setup.

Runs everything on a virtual 8-device CPU mesh
(`--xla_force_host_platform_device_count=8`) — the substitute for multi-chip
hardware per SURVEY.md §4(c); sharding/SPMD tests rely on it.  Must run
before the first `import jax` anywhere in the test session.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    flags += ' --xla_force_host_platform_device_count=8'
# 8 virtual devices share one core here; a straggler can take >40 s to
# reach a collective rendezvous and XLA's default terminate-timeout would
# abort pytest mid-collective on a loaded box.
if 'terminate_timeout' not in flags:
    flags += (' --xla_cpu_collective_call_warn_stuck_timeout_seconds=120'
              ' --xla_cpu_collective_call_terminate_timeout_seconds=600')
os.environ['XLA_FLAGS'] = flags.strip()

import jax  # noqa: E402

# The hosted TPU plugin prepends its own platform to jax_platforms, silently
# overriding the env var — force CPU explicitly so tests never touch the chip.
jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
