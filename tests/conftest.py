"""Test harness config (SURVEY.md §4.2).

Forces the CPU platform with 8 virtual devices BEFORE any test imports jax,
so distributed tests (shard_map over a Mesh) run without TPU hardware.

Note: the environment's axon TPU plugin force-prepends itself to
``jax_platforms`` (plain ``JAX_PLATFORMS=cpu`` is overridden), so we must
set the config value after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The environment's TPU plugin (pre-imported at interpreter startup)
# registers atexit teardown that intermittently hangs or aborts the
# process ("Fatal Python error") AFTER the test session has finished —
# losing the block-buffered pytest summary when stdout is a pipe and
# turning a green run into an apparent crash. Our handler is registered
# later, so it runs first (atexit is LIFO): flush and leave with
# pytest's real exit status before the plugin teardown can run.
import atexit  # noqa: E402
import sys  # noqa: E402

_exit_status = {"code": 0}


def pytest_sessionfinish(session, exitstatus):
    _exit_status["code"] = int(exitstatus)


@atexit.register
def _skip_plugin_teardown():
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(_exit_status["code"])
