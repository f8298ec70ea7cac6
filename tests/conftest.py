"""Test config: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated by spoofing host devices
(`--xla_force_host_platform_device_count=8`), the TPU-native substitute for a
fake distributed backend.

The execution environment pre-imports jax and presets JAX_PLATFORMS=axon
(remote TPU tunnel) via sitecustomize, so env vars alone don't stick —
backend selection is lazy, so overriding through jax.config before first
device use forces local CPU.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
