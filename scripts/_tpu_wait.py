"""Shared axon-tunnel resilience for measurement scripts.

The tunnel has two failure modes (observed rounds 4-5): jax backend
init HANGS for tens of minutes, or raises UNAVAILABLE.  Every scale
script arms a watchdog (emits an error JSON line and exits, so a chain
never hangs a step forever) and retries init with backoff.
"""
import json
import os
import sys
import time


def arm_watchdog(payload=None, seconds=None):
    import threading
    limit = float(seconds or os.environ.get("MCTX_WATCHDOG", 2700))

    def fire():
        out = dict(payload or {})
        out["error"] = "watchdog: no completion within %.0fs" % limit
        print(json.dumps(out), flush=True)
        os._exit(1)

    t = threading.Timer(limit, fire)
    t.daemon = True
    t.start()
    return t


def wait_backend(max_wait_s=600.0):
    """Retry jax backend init with backoff; returns the device list or
    raises the last error after max_wait_s."""
    import jax

    t0 = time.monotonic()
    delay = 5.0
    attempts = 0
    while True:
        try:
            devs = jax.devices()
            print("backend up: %s" % devs[0].platform, file=sys.stderr)
            return devs
        except RuntimeError as e:
            attempts += 1
            waited = time.monotonic() - t0
            if waited > max_wait_s and attempts >= 3:
                raise
            print("backend init failed (%.0fs in), retrying in %.0fs: %s"
                  % (waited, delay, str(e)[:160]), file=sys.stderr)
            from jax._src import xla_bridge as xb
            try:
                xb._clear_backends()
            except Exception:
                pass
            try:
                xb._backend_errors.clear()
            except Exception:
                pass
            time.sleep(delay)
            delay = min(delay * 1.7, 60.0)
