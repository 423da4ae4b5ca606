"""mctx — command dispatcher (role of ref src/main/mccortex.c:23-172).

Subcommands are registered here as they are implemented; `mctx` with no
args prints the table.
"""

import sys

COMMANDS = {}


def register(name, fn, summary):
    COMMANDS[name] = (fn, summary)


def _report_memory(cmd):
    """Peak host RSS + device allocation after each command (role of
    ref cmd_mem.h:20-30 memory reporting; every ctx_* command prints
    its memory plan/usage).  Silence with MCTX_NO_MEMSTATS=1."""
    import os
    if os.environ.get("MCTX_NO_MEMSTATS"):
        return
    from .common import is_quiet
    if is_quiet():
        return
    try:
        import resource
        peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        parts = [f"host peak RSS {peak_kb / 1024:.0f} MB"]
        if "jax" in sys.modules:
            import jax
            try:
                ms = jax.devices()[0].memory_stats() or {}
                if "bytes_in_use" in ms:
                    parts.append(
                        f"device in use "
                        f"{ms['bytes_in_use'] / (1 << 20):.0f} MB"
                        + (f" (peak {ms['peak_bytes_in_use'] / (1 << 20):.0f} MB)"
                           if "peak_bytes_in_use" in ms else ""))
            except Exception:
                pass
        print(f"[mctx] memory ({cmd}): " + ", ".join(parts),
              file=sys.stderr)
    except Exception:
        pass


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    from . import commands  # noqa: F401  populates COMMANDS
    from . import commands2  # noqa: F401
    from . import commands3  # noqa: F401
    from . import pipeline  # noqa: F401
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: mctx <command> [args]\n\ncommands:")
        for name, (_, summary) in sorted(COMMANDS.items()):
            print(f"  {name:12s} {summary}")
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"mctx: unknown command '{cmd}'", file=sys.stderr)
        return 1
    try:
        rc = COMMANDS[cmd][0](argv[1:]) or 0
        _report_memory(cmd)
        return rc
    except BrokenPipeError:
        # stdout consumer (e.g. `| head`) went away — not an error
        import os
        try:
            sys.stdout.close()
        except Exception:
            pass
        os._exit(0)
    except (ValueError, OSError) as e:
        print(f"mctx {cmd}: error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
