"""Test configuration: force an 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding/collective tests run on
virtual CPU devices (the TPU-era analogue of the reference's 2-rank
localhost GLOO test, habitat-lab-dialog/test/test_ddppo_reduce.py:119-126).

The environment's sitecustomize registers the axon TPU backend at
*interpreter start* and that registration pins the JAX platform — setting
JAX_PLATFORMS=cpu afterwards is ignored, and every test compile would route
through the TPU tunnel (minutes instead of seconds). So on the first
pytest_configure we stop pytest's fd capture (to keep the terminal) and
re-exec the whole test process with a scrubbed environment.
"""

import os
import sys

_ALREADY_CLEAN = (
    os.environ.get("AVLEN_TESTS_REEXEC") == "1"
    or not os.environ.get("PALLAS_AXON_POOL_IPS")
)


def mesh_cpu_flags(flags: str, n_devices: int = 8) -> str:
    """XLA_FLAGS for a virtual n-device CPU mesh on this 1-core host.

    Besides forcing the device count, the XLA:CPU stuck-collective watchdog
    (--xla_cpu_collective_call_terminate_timeout_seconds, default ~30s) must
    be raised: with N virtual device threads time-slicing ONE core through a
    heavy shard_map superstep, a device can legitimately sit in a collective
    for minutes, and the watchdog SIGABRTs the process (the round-2/3 mesh
    test aborts). Real multi-chip TPU runs are unaffected — these flags are
    test/dryrun plumbing only."""
    if "xla_force_host_platform_device_count" not in flags:
        flags += f" --xla_force_host_platform_device_count={n_devices}"
    if "collective_call_terminate_timeout" not in flags:
        flags += (
            " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
            " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
            " --xla_cpu_collective_timeout_seconds=3600"
        )
    return flags.strip()


if _ALREADY_CLEAN:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ["XLA_FLAGS"] = mesh_cpu_flags(os.environ.get("XLA_FLAGS", ""))
    os.environ.setdefault("JAX_ENABLE_X64", "0")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "smoke: fast one-per-subsystem subset (pytest -m smoke, <10 min; README §testing)",
    )
    if _ALREADY_CLEAN:
        # fresh per-session ledger of isolation.py signal-death retries
        import tempfile

        from tests.isolation import RETRY_LOG_ENV

        if not os.environ.get(RETRY_LOG_ENV):
            fd, path = tempfile.mkstemp(prefix="avlen_isolation_retries_")
            os.close(fd)
            os.environ[RETRY_LOG_ENV] = path
            config._avlen_retry_log_owned = path
        return
    env = dict(os.environ)
    env.update(
        {
            "JAX_PLATFORMS": "cpu",
            "PALLAS_AXON_POOL_IPS": "",
            "PALLAS_AXON_REMOTE_COMPILE": "",
            "AVLEN_TESTS_REEXEC": "1",
        }
    )
    env["XLA_FLAGS"] = mesh_cpu_flags(env.get("XLA_FLAGS", ""))
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


import gc

import pytest


# fast one-per-subsystem smoke tier (`pytest -m smoke`): iterate without the
# multi-hour full suite. Curated here (not per-file marks) so the whole tier
# is auditable at a glance; each entry is the cheapest test that still
# exercises its subsystem end-to-end. No fork-isolated mesh tests.
SMOKE_TESTS = frozenset({
    "test_config.py::test_yaml_merge",                              # config/CLI
    "test_graph.py::test_hops_match_networkx",                      # graph tables
    "test_native.py::test_engine_step_semantics",                   # C engine
    "test_audio_ops.py::test_spectrogram_full_pipeline",            # audio ops
    "test_env.py::test_oracle_rollout_reaches_goal_in_num_action_steps",  # env
    "test_rl.py::test_ppo_update_runs_and_changes_params",          # PPO core
    "test_models.py::test_policy_act_and_evaluate_consistent",      # policies
    "test_smt.py::test_memory_ring_insert_and_reset",               # SMT memory
    "test_dialog.py::test_dialog_policy_act",                       # dialog nets
    "test_clip_exact.py::test_byte_fallback_ids_are_openai_exact",  # CLIP BPE
    "test_interactive.py::test_query_windows_and_masks",            # AVLEN rollout
    "test_mapping.py::test_depth_to_egomap_wall_ahead",             # mapping ops
    "test_mp3d_utils.py::test_house_reader",                        # mp3d utils
    "test_reference_data.py::test_host_rir_store_matches_dense",    # data pipeline
    "test_episode_stream_r3.py::test_streamer_reshuffles_between_cycles",  # streams
    "test_heard_unheard_r3.py::test_eval_consts_remap_heard_and_unheard",  # protocol
    "test_challenge.py::test_package_codec_roundtrip",               # challenge RPC
    "test_vln_alignment.py::test_heading_adjustment_tracks_the_turn",  # VLN data
    "test_aux.py::test_preemption_state_roundtrip",                  # aux subsystems
})


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("/")[-1]
        if rel in SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)


MAX_ISOLATION_RETRIES = 1  # >1 load-bearing signal-death retries fail the suite


def _read_retry_events():
    path = os.environ.get("AVLEN_ISOLATION_RETRY_LOG", "")
    if not path or not os.path.exists(path):
        return []
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Surface every isolation.py signal-death retry in the suite summary
    (VERDICT r3 #10: silent retries must not become load-bearing)."""
    events = _read_retry_events()
    if not events:
        return
    terminalreporter.section("isolation signal-death retries")
    for e in events:
        terminalreporter.write_line(e)
    if len(events) > MAX_ISOLATION_RETRIES:
        terminalreporter.write_line(
            f"FAILED: {len(events)} signal-death retries exceed the budget of "
            f"{MAX_ISOLATION_RETRIES} — the XLA:CPU abort is recurring, not a "
            "one-off; investigate before trusting the mesh tests",
        )


def pytest_sessionfinish(session, exitstatus):
    if len(_read_retry_events()) > MAX_ISOLATION_RETRIES and session.exitstatus == 0:
        session.exitstatus = 1
    owned = getattr(session.config, "_avlen_retry_log_owned", None)
    if owned and os.path.exists(owned) and not _read_retry_events():
        os.unlink(owned)


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_state_between_modules():
    """Release compiled executables + live buffers after each test module.

    ~150 jit-heavy tests in one process accumulate XLA executables (and
    their thread pools / buffers); on small hosts the CPU client eventually
    aborts. Each module recompiles what it needs anyway, so dropping the
    caches trades a little compile time for a bounded footprint."""
    yield
    import jax

    jax.clear_caches()
    gc.collect()
