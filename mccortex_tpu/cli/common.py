"""Shared command-line options (role of ref src/commands/cmd.c: the
general options -q/--quiet -f/--force -m/--memory -n/--nkmers
-t/--threads -o/--out appear on every ctx_* command, e.g.
ctx_thread.c:9-18 usage block).

Each mctx command calls add_common(parser) then apply_common(args,
out_paths...) straight after parsing:

- --quiet silences [mctx] status lines (stderr);
- --force is required to overwrite an existing output file (ref
  basic/file_util.c:88 futil_check_outfile dies without -f);
- --memory is a hard host budget checked by utils/membudget where a
  command sizes device buffers from input cardinality;
- --nkmers seeds the initial store capacity (the store grows exactly,
  so this is a preallocation hint, not a hard cap like the ref's
  fixed-size hash table);
- --threads bounds host-side worker threads (native ingest prefetch,
  spill merges).  Device compute is data-parallel regardless, so this
  never limits TPU throughput.
"""

from __future__ import annotations

import os
import sys

_QUIET = False


def set_quiet(q: bool) -> None:
    global _QUIET
    _QUIET = bool(q)


def is_quiet() -> bool:
    return _QUIET


def status(msg: str) -> None:
    if not _QUIET:
        print(f"[mctx] {msg}", file=sys.stderr)


def parse_size(s: str | None) -> int | None:
    """'20M'/'8G'/'1T'/'4096' -> int (ref cmd_mem.h mem_to_integer)."""
    if s is None:
        return None
    s = str(s).strip()
    mult = 1
    suffixes = {"K": 1 << 10, "M": 1 << 20, "G": 1 << 30, "T": 1 << 40}
    if s and s[-1].upper() in suffixes:
        mult = suffixes[s[-1].upper()]
        s = s[:-1]
    try:
        return int(float(s) * mult)
    except ValueError:
        raise ValueError(f"bad size value: {s!r} (expected e.g. 20M, 8G)")


def add_common(p, memory: bool = True, nkmers: bool = True,
               threads: bool = True):
    """Register the ref's general options on a command parser."""
    g = p.add_argument_group("general options (ref cmd.c)")
    g.add_argument("-q", "--quiet", action="store_true",
                   help="silence status output normally printed to stderr")
    g.add_argument("-f", "--force", action="store_true",
                   help="overwrite existing output files")
    if memory:
        g.add_argument("-m", "--memory", default=None,
                       help="host memory budget, e.g. 8G (fails fast if "
                            "the working set cannot fit)")
    if nkmers:
        g.add_argument("-n", "--nkmers", default=None,
                       help="initial kmer-store capacity hint, e.g. 20M "
                            "(the store grows exactly as needed)")
    if threads:
        g.add_argument("-t", "--threads", type=int, default=None,
                       help="host worker threads for ingest/spill "
                            "(device compute is parallel regardless)")
    g.add_argument("--devices", default=None,
                   help="devices to run on: a count, or 'auto' for all "
                        "visible devices (the kmer space is hash-"
                        "sharded over a 1-D mesh; replaces the ref's "
                        "-t shared-memory hash table parallelism for "
                        "device-side work)")
    return p


def devices_arg(args) -> int:
    """Resolve -D/--devices to a device count (1 = single-device)."""
    v = getattr(args, "devices", None)
    if v is None:
        return 1
    if str(v).lower() == "auto":
        import jax
        return len(jax.devices())
    n = int(v)
    if n < 1:
        raise ValueError("--devices must be >= 1")
    import jax
    avail = len(jax.devices())
    if n > avail:
        raise ValueError(f"--devices {n} > {avail} visible devices")
    return n


def check_outfile(path, force: bool) -> None:
    """Refuse to overwrite without --force (ref futil_check_outfile)."""
    if path and path != "-" and not force and os.path.exists(str(path)):
        raise ValueError(
            f"output file already exists: {path} (use -f/--force)")


def apply_common(args, *out_paths) -> None:
    """Call immediately after parse_args: applies --quiet and checks
    every named output path against --force."""
    set_quiet(getattr(args, "quiet", False))
    force = getattr(args, "force", False)
    for o in out_paths:
        check_outfile(o, force)


def nkmers_hint(args) -> int | None:
    return parse_size(getattr(args, "nkmers", None))


def check_kmer(k: int, p=None) -> int:
    """Kmer size must be odd and 3..63 (ref cmd.c cmd_check_kmer:
    palindromic even-k kmers are their own reverse complement, which
    breaks canonical orientation).  Raises/parser-errors otherwise."""
    msg = None
    if not (3 <= int(k) <= 63):
        msg = f"kmer size must be 3..63, got {k}"
    elif int(k) % 2 == 0:
        msg = f"kmer size must be odd, got {k}"
    if msg:
        if p is not None:
            p.error(msg)
        raise ValueError(msg)
    return int(k)
