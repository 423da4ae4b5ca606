"""Probe: which C=10 program killed the axon remote compiler?

The round-5 10-colour joint build died at its first LSM fold with
`tpu_compile_helper subprocess exit code 1` (HTTP 500) inside
merge_sorted_fused.  That jit spans a 22-plane lax.sort AND the Pallas
segreduce_compact_multi (10 sums + 10 ors); this probe compiles each
piece separately at a tiny size to find the culprit, then verifies the
rank-scatter fallback produces the right answer at C=10.

Run on TPU: python scripts/probe_c10.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import numpy as np


def main():
    import _tpu_wait
    _tpu_wait.arm_watchdog({"phase": "probe_c10"}, seconds=1200)
    import jax
    _tpu_wait.wait_backend()
    import jax.numpy as jnp
    import mccortex_tpu  # noqa: F401
    from mccortex_tpu.graph import build as gb
    from mccortex_tpu.ops import sorted as sops

    out = {}
    rng = np.random.default_rng(0)
    n, W, C = 1 << 16, 1, 10

    def mk(seed):
        r = np.random.default_rng(seed)
        k = np.sort(np.unique(r.integers(0, 1 << 60, size=n,
                                         dtype=np.uint64)))
        k = np.concatenate([k, np.full(n - len(k), sops.SENTINEL64,
                                       np.uint64)])
        cv = r.integers(0, 50, size=(n, C), dtype=np.uint32)
        eb = r.integers(0, 256, size=(n, C)).astype(np.uint8)
        return (jnp.asarray(k[:, None]), jnp.asarray(cv),
                jnp.asarray(eb))

    ak, ac, ae = mk(1)
    bk, bc, be = mk(2)

    # 1. the full fused merge (sort + segreduce) at C=10
    try:
        mkk, mc, me, nn = gb.merge_sorted_fused(ak, ac, ae, bk, bc, be,
                                                sort_impl="lax")
        out["merge_fused_c10"] = {"ok": True, "n": int(nn)}
    except Exception as e:
        out["merge_fused_c10"] = {"ok": False, "err": str(e)[:300]}
    print(json.dumps(out), flush=True)

    # 2. the 22-plane lax.sort alone
    try:
        @jax.jit
        def just_sort(ak, ac, ae, bk, bc, be):
            ops = gb._record_planes(jnp.concatenate([ak, bk]),
                                    jnp.concatenate([ac, bc]),
                                    jnp.concatenate([ae, be]))
            s = jax.lax.sort(ops, num_keys=2, is_stable=False)
            return s[0][0]

        v = just_sort(ak, ac, ae, bk, bc, be)
        np.asarray(v)
        out["sort22_c10"] = {"ok": True}
    except Exception as e:
        out["sort22_c10"] = {"ok": False, "err": str(e)[:300]}
    print(json.dumps(out), flush=True)

    # 3. the Pallas segreduce alone over pre-sorted planes
    try:
        from mccortex_tpu.ops.pallas import segreduce as _sr

        @jax.jit
        def just_sr(ak, ac, ae, bk, bc, be):
            ops = gb._record_planes(jnp.concatenate([ak, bk]),
                                    jnp.concatenate([ac, bc]),
                                    jnp.concatenate([ae, be]))
            s = jax.lax.sort(ops, num_keys=2, is_stable=False)
            return gb._aggregate_sorted(s, 1, C, 2 * n)[3]

        v = just_sr(ak, ac, ae, bk, bc, be)
        out["segreduce_c10"] = {"ok": True, "n": int(v)}
    except Exception as e:
        out["segreduce_c10"] = {"ok": False, "err": str(e)[:300]}
    print(json.dumps(out), flush=True)

    # 4. rank-scatter fallback correctness at C=10 vs host merge
    try:
        mk2, mc2, me2 = gb._merge2(ak, ac, ae, bk, bc, be)
        hn = gb._merge2_np(*(np.asarray(x) for x in
                             (ak, ac, ae, bk, bc, be)))
        live = ~(np.asarray(mk2) == sops.SENTINEL64).all(axis=1)
        hlive = ~(hn[0] == sops.SENTINEL64).all(axis=1)
        same = (live.sum() == hlive.sum()
                and np.array_equal(np.asarray(mk2)[live],
                                   hn[0][hlive])
                and np.array_equal(np.asarray(mc2)[live],
                                   hn[1][hlive])
                and np.array_equal(np.asarray(me2)[live],
                                   hn[2][hlive]))
        out["rank_scatter_c10"] = {"ok": bool(same)}
    except Exception as e:
        out["rank_scatter_c10"] = {"ok": False, "err": str(e)[:300]}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
