"""Fork-per-test isolation for multi-device (mesh) tests.

The XLA:CPU runtime on this 1-core host can SIGABRT when several 8-virtual-
device shard_map executables accumulate in one process (see
tests/test_parallel_trainers.py history); per-test jax.clear_caches() did
not fully cure it. Mesh tests therefore run in their own fresh interpreter:
the wrapper re-invokes pytest for the single test node in a subprocess (the
same scrubbed-env respawn pattern __graft_entry__ uses) and treats a
signal-death (negative returncode) as retryable once — a genuine test
failure (positive returncode) is reported immediately with the child's
output.

Usage:
    @isolated(__file__)
    def test_something(tmp_path):
        ...

Inside the child process AVLEN_TEST_ISOLATED=1 short-circuits the wrapper so
the test body runs inline.
"""

from __future__ import annotations

import functools
import os
import subprocess
import sys

TIMEOUT_S = 1500

# suite-wide signal-death retry ledger; conftest points this at a per-session
# file and reports/fails from it in the terminal summary
RETRY_LOG_ENV = "AVLEN_ISOLATION_RETRY_LOG"


def _record_retry(nodeid: str, returncode: int) -> None:
    path = os.environ.get(RETRY_LOG_ENV)
    if not path:
        return
    with open(path, "a") as f:
        f.write(f"{nodeid} rc={returncode}\n")


def isolated(test_file: str):
    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            if os.environ.get("AVLEN_TEST_ISOLATED") == "1":
                return fn(*args, **kwargs)
            nodeid = f"{test_file}::{fn.__name__}"
            env = dict(os.environ)
            env.update({
                "AVLEN_TEST_ISOLATED": "1",
                # keep the child on the clean CPU path without another respawn
                "AVLEN_TESTS_REEXEC": "1",
                "JAX_PLATFORMS": "cpu",
                "PALLAS_AXON_POOL_IPS": "",
                "PALLAS_AXON_REMOTE_COMPILE": "",
            })
            from tests.conftest import mesh_cpu_flags

            # raised stuck-collective watchdog: 8 device threads on 1 core
            # legitimately park in collectives for minutes (conftest docstring)
            env["XLA_FLAGS"] = mesh_cpu_flags(env.get("XLA_FLAGS", ""))
            r = None
            for attempt in range(2):
                r = subprocess.run(
                    [sys.executable, "-m", "pytest", nodeid, "-x", "-q", "-p", "no:cacheprovider"],
                    env=env, capture_output=True, text=True, timeout=TIMEOUT_S,
                )
                if r.returncode == 0:
                    return
                if r.returncode > 0:
                    raise AssertionError(
                        f"isolated test failed (rc={r.returncode}):\n"
                        f"{r.stdout[-6000:]}\n{r.stderr[-3000:]}"
                    )
                # negative rc: child killed by a signal (XLA:CPU abort) —
                # retry LOUDLY: every retry event is printed and appended to
                # the suite retry log; conftest's terminal summary surfaces
                # them and fails the suite when retries exceed the budget
                # (silent signal-death retries must not become load-bearing)
                _record_retry(nodeid, r.returncode)
                print(
                    f"\n[isolation] {nodeid} died by signal (rc={r.returncode}); "
                    "retrying in a fresh interpreter\n",
                    file=sys.stderr, flush=True,
                )
            raise AssertionError(
                f"isolated test died by signal twice (rc={r.returncode}):\n"
                f"{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
            )

        return wrapper

    return deco
