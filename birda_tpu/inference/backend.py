"""Accelerator backend selection.

The TPU analogue of the reference's 12-provider execution-provider ladder
(``src/inference/classifier.rs:662-921``): probe the jax platforms actually
present, honor an explicit request with explicit failure, and fall back
``auto -> tpu -> cpu`` with the reason recorded in a
``requested/actual/fallback_reason`` status surfaced through the JSON
protocol (reference ``ExecutionProviderStatus``, ``classifier.rs:23``).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional

from ..constants import backend as backend_consts
from ..errors import RuntimeInitialization

logger = logging.getLogger(__name__)

#: True once an explicit CPU request confined jax to the CPU platform in
#: this process (see select_backend); later accelerator requests use it to
#: explain why no TPU is visible.
_cpu_confined = False


@dataclass
class BackendStatus:
    """Requested vs actual backend, with fallback reason when they differ."""

    requested: str
    actual: str
    fallback_reason: Optional[str] = None

    def to_json_dict(self) -> dict:
        d = {"requested": self.requested, "actual": self.actual}
        if self.fallback_reason is not None:
            d["fallback_reason"] = self.fallback_reason
        return d


def available_backends() -> list[str]:
    """Platforms jax can actually initialize, in preference order."""
    import jax

    found = []
    for platform in ("tpu", "cpu"):
        try:
            if jax.devices(platform):
                found.append(platform)
        except RuntimeError:
            continue
    return found


def probe_accelerator_bounded(timeout_s: float = 60.0
                              ) -> tuple[bool, Optional[str]]:
    """Bounded out-of-process accelerator probe for listing commands.

    In-process backend init retries for a very long time when the device
    attachment is unreachable (a dead tunnel stalls ``jax.devices`` for
    ~28 minutes — and ``jax.devices("cpu")`` initializes ALL platforms,
    so even a CPU query dials the accelerator plugin). A throwaway
    subprocess with a hard timeout answers "is the accelerator reachable"
    in bounded time and then exits, freeing a single-tenant device for
    the real run. Returns ``(ok, note)``; ``note`` explains a False.
    """
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices('tpu'); print('TPU_OK')"],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {timeout_s:.0f}s"
    except OSError as e:
        return False, str(e)[:200]
    if r.returncode != 0 or "TPU_OK" not in r.stdout:
        tail = (r.stderr.strip().splitlines() or ["no TPU devices"])[-1]
        return False, tail[:200]
    return True, None


def available_backends_bounded(timeout_s: float = 60.0
                               ) -> tuple[list[str], Optional[str]]:
    """Like :func:`available_backends` but safe for listing commands:
    never initializes jax in this process. CPU is always available (the
    reference lists its CPU provider unconditionally,
    ``src/inference/provider.rs:17``); the accelerator is answered by the
    bounded subprocess probe. Returns ``(backends, note)``."""
    ok, note = probe_accelerator_bounded(timeout_s)
    return (["tpu", "cpu"] if ok else ["cpu"]), note


#: Display metadata per backend, the analogue of the reference's
#: ``provider_metadata`` table (``src/inference/provider.rs:17-70``):
#: ``id`` is the CLI flag identifier, ``description`` the human line.
_PROVIDER_METADATA = {
    "cpu": {"id": "cpu", "name": "CPU",
            "description": "CPU (always available)"},
    "tpu": {"id": "tpu", "name": "TPU",
            "description": "TPU (Google TPU via XLA)"},
}


def provider_metadata(platform: str) -> dict:
    """id/name/description for a backend platform; unknown platforms get
    identity metadata rather than a KeyError (a new jax plugin should list,
    not crash, the providers command)."""
    return _PROVIDER_METADATA.get(
        platform,
        {"id": platform, "name": platform, "description": platform},
    )


def ensure_runtime_available() -> None:
    """Fail fast if jax cannot initialize any backend at all
    (reference ``ensure_runtime_available``, ``src/inference/runtime.rs:14``)."""
    try:
        import jax

        jax.devices()
    except Exception as e:  # noqa: BLE001 — any backend-init failure is fatal
        raise RuntimeInitialization(str(e)) from e


def select_backend(requested: str = backend_consts.AUTO):
    """Resolve the requested backend to concrete jax devices.

    Returns ``(devices, BackendStatus)``. Semantics match the reference:
    an explicit request fails loudly when unavailable; ``auto`` falls back
    with the reason recorded.
    """
    import jax

    requested = (requested or backend_consts.AUTO).lower()
    if requested not in (backend_consts.AUTO, *backend_consts.ALL):
        raise RuntimeInitialization(f"unknown device '{requested}'")

    global _cpu_confined
    if requested == backend_consts.CPU:
        # An explicit CPU request must not touch the accelerator plugin at
        # all: probing it dials the device attachment (a tunnel handshake
        # can stall for minutes), and --cpu exists precisely to stay off
        # the chip. Before any backend is initialized this confines jax to
        # the CPU platform; afterwards it is a silent no-op and the CPU
        # devices below still resolve.
        jax.config.update("jax_platforms", "cpu")
        _cpu_confined = True
        return jax.devices("cpu"), BackendStatus("cpu", "cpu")

    if _cpu_confined:
        # A long-lived process asked for CPU earlier; try to lift the
        # confinement (effective only before jax froze the platform set).
        # The flag clears only if an accelerator actually became visible —
        # a silently-ignored config update must keep the explanation below.
        try:
            jax.config.update("jax_platforms", None)
        except Exception:  # noqa: BLE001 — best effort
            pass

    avail = available_backends()
    if _cpu_confined and "tpu" in avail:
        _cpu_confined = False
    if _cpu_confined and "tpu" not in avail:
        if requested == backend_consts.TPU:
            raise RuntimeInitialization(
                "TPU was requested, but this process was confined to the "
                "CPU platform by an earlier explicit CPU run and jax "
                "cannot re-enable platforms after initialization; restart "
                "the process to use the TPU"
            )
        logger.warning(
            "auto device resolved to CPU: this process was confined by an "
            "earlier explicit CPU run (restart to reach the accelerator)"
        )
    if not avail:
        raise RuntimeInitialization("no jax backends available")

    if requested == backend_consts.AUTO:
        actual = "tpu" if "tpu" in avail else "cpu"
        reason = None if actual == "tpu" else "no TPU devices detected"
        status = BackendStatus("auto", actual, reason)
        return jax.devices(actual), status

    if requested in avail:
        return jax.devices(requested), BackendStatus(requested, requested)

    if requested == backend_consts.TPU:
        # Explicit request, explicit failure — mirroring --cuda with no CUDA.
        raise RuntimeInitialization(
            "TPU was requested but no TPU devices are available"
        )
    return jax.devices("cpu"), BackendStatus(requested, "cpu")
