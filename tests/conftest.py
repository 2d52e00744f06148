"""Test harness configuration.

Tests run on the CPU backend with an 8-device virtual host platform so
multi-chip sharding paths can be validated without TPU pod hardware
(the driver's dryrun_multichip uses the same mechanism).
"""

import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
