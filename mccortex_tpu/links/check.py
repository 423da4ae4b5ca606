"""Link health checks: every stored link must be walkable.

Role of ref src/graph_paths/gpath_checks.c (gpath_checks_all_paths,
used by ctx_health_check.c): for each link and each colour it is set
in, walk from the link's kmer in its orientation following colour-
restricted edges; at every in-colour fork the link must supply a
junction base that matches an existing branch; the walk must not fall
off the graph before all junctions are consumed.

TPU mapping: one walker per (link, colour), all stepped in lockstep
with batched lookups; the host loop bounds steps.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import kmer as kops
from ..ops import sorted as sops
from ..graph import edges as E
from ..graph import store as gstore
from . import store as lstore


def check_links(g: gstore.DBGraph, links: lstore.LinkStore,
                max_steps: int = 4096):
    """Returns (n_checked, n_failed, fail_link_ids)."""
    L = links.nlinks
    if L == 0:
        return 0, 0, np.zeros(0, np.int64)
    k = g.k
    nseen = np.asarray(links.nseen)[:L]
    C = nseen.shape[1]
    lids, cols = np.nonzero(nseen > 0)
    if len(lids) == 0:
        return 0, 0, np.zeros(0, np.int64)
    B = len(lids)

    from .walk import link_vertices
    lv = link_vertices(links, g.capacity)
    verts = np.asarray(lv)[lids]
    rows = verts >> 1
    orients = (verts & 1).astype(np.uint8)
    nj = np.asarray(links.nj)[lids]
    seq = links.seq
    keys_np = np.asarray(g.keys)
    covg_np = np.asarray(g.covg)
    edges_np = np.asarray(g.edges)

    okm = np.asarray(kops.oriented(jnp.asarray(keys_np[rows]),
                                   jnp.asarray(orients), k))
    idx = rows.astype(np.int64)
    orient = orients.copy()
    pos = np.zeros(B, np.int32)
    alive = np.ones(B, bool)          # still walking
    failed = np.zeros(B, bool)

    for _step in range(max_steps):
        live = alive & (pos < nj)
        if not live.any():
            break
        # in-colour candidate successors
        enib = np.zeros(B, np.uint8)
        ecol = edges_np[idx, cols]
        enib = np.asarray(E.with_orientation(
            jnp.asarray(ecol), jnp.asarray(orient)))
        cand_ok = np.zeros((B, 4), bool)
        nxt_idx = np.zeros((B, 4), np.int64)
        nxt_or = np.zeros((B, 4), np.uint8)
        nxt_okm = []
        okm_j = jnp.asarray(okm)
        for n in range(4):
            has_edge = ((enib >> n) & 1).astype(bool)
            pk = kops.shift_append(okm_j, jnp.full((B,), n, jnp.uint8), k)
            qkey, qo = kops.canonical(pk, k)
            qrow, qfound = sops.lookup(g.keys, qkey)
            qrow_np = np.asarray(qrow)
            in_col = covg_np[qrow_np, cols] > 0
            cand_ok[:, n] = has_edge & np.asarray(qfound) & in_col & live
            nxt_idx[:, n] = qrow_np
            nxt_or[:, n] = np.asarray(qo)
            nxt_okm.append(np.asarray(pk))
        cnt = cand_ok.sum(axis=1)
        # dead end before the link is consumed -> fail
        fail_now = live & (cnt == 0)
        # fork: the link's junction base must be a candidate
        at_fork = live & (cnt > 1)
        jb = np.zeros(B, np.uint8)
        if at_fork.any():
            fsel = np.nonzero(at_fork)[0]
            jb_f = np.asarray(lstore.unpack_junc(
                seq[jnp.asarray(lids[fsel])],
                jnp.asarray(pos[fsel])))
            jb[fsel] = jb_f
            bad_jb = ~cand_ok[fsel, jb_f]
            fail_now[fsel[bad_jb]] = True
        failed |= fail_now
        alive &= ~fail_now
        # choose the next base: fork -> junction base; else the single
        # candidate
        single = np.argmax(cand_ok, axis=1)
        takeb = np.where(at_fork, jb, single).astype(np.int64)
        adv = alive & live & (cnt > 0)
        rowsel = np.nonzero(adv)[0]
        okm = np.stack(nxt_okm, axis=1)[
            np.arange(B), takeb] if B else okm
        okm = np.where(adv[:, None], okm, np.asarray(okm_j))
        idx = np.where(adv, nxt_idx[np.arange(B), takeb], idx)
        orient = np.where(adv, nxt_or[np.arange(B), takeb],
                          orient).astype(np.uint8)
        pos = np.where(adv & at_fork, pos + 1, pos)
    else:
        # ran out of steps with live walkers: count them failed
        failed |= alive & (pos < nj)

    ok = pos >= nj
    bad = failed | ~ok
    return B, int(bad.sum()), np.unique(lids[bad])
