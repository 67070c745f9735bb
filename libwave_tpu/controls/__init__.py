"""Controllers (parity: wave_controls)."""

from libwave_tpu.controls.pid import PIDGains, PIDState, pid_init, pid_update  # noqa: F401
