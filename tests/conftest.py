"""Test configuration: force an 8-device virtual CPU platform so sharding and
collective paths are exercised without TPU hardware (SURVEY.md §4).

Note: the axon TPU plugin ignores the JAX_PLATFORMS *env var*, so the platform
must be forced through jax.config before any computation runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA:CPU kills the process when a collective rendezvous waits > 40 s
    # (rendezvous.cc "Termination timeout ... Exiting to ensure a consistent
    # program state").  On a 1-core box the 8 virtual devices' programs are
    # time-sliced on one core, so a heavy SPMD step can easily keep one
    # participant away from the rendezvous for minutes — a liveness artifact
    # of the test topology, not a hang.  Raise the limit far above any real
    # per-program runtime.
    flags = (flags + " --xla_cpu_collective_call_terminate_timeout_seconds=1800").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


@pytest.fixture(scope="module", autouse=True)
def _drop_compiled_executables_between_modules():
    """Jitted functions are not reused across test modules, so dropping the
    compilation caches at module boundaries bounds the runtime's live
    executable/memory footprint over the session at no recompile cost.
    (The hard `Fatal Python error: Aborted` once seen deep into the suite was
    the XLA:CPU collective rendezvous termination timeout — see the
    XLA_FLAGS block above — not executable accumulation, but keeping the
    footprint bounded is still cheap hygiene.)"""
    yield
    jax.clear_caches()


@pytest.fixture(scope="module")
def reference_torch_env():
    """CPU-shimmed access to the read-only reference: prepends /root/reference
    to sys.path and no-ops `.cuda()` on Tensor/Module, unwound when the module
    finishes (ADVICE.md round 3: the previous in-place patches leaked into
    every later test in the process)."""
    import os

    import sys

    torch = pytest.importorskip("torch")
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference not mounted")
    with pytest.MonkeyPatch.context() as mp:
        mp.syspath_prepend("/root/reference")
        mp.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
        mp.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)
        yield mp
    # Drop the reference's imported modules so a LATER gate module's
    # `import models.networks_*` re-imports against its own sys.path patch —
    # the cached `models`/`tools` packages otherwise resolve submodule
    # imports after the path prepend is unwound and fail (seen as
    # ImportErrors when several trajectory gates run in one process).
    for name in [n for n, m in list(sys.modules.items())
                 if (getattr(m, "__file__", "") or "").startswith("/root/reference")]:
        del sys.modules[name]
    # ...and the per-module cv2/skimage/torchvision STUBS (none of these
    # packages is actually installed here): each gate installs the stub
    # surface ITS reference files need, so a leftover stub from one module
    # (e.g. BE_font's torchvision without resnet50) breaks the next gate's
    # imports.
    for name in [n for n in list(sys.modules)
                 if n.split(".")[0] in ("cv2", "rdp", "skimage", "torchvision")]:
        del sys.modules[name]
