"""A/B: K2 sections at (512,128) vs (128,128) — the round-4 route diet.

On a 128x128 grid the Clos middle stage is a SINGLE lane
take_along_axis after a transpose (per intermediate column the inner
route is a permutation of 128 rows = one taa on the transposed layout).
The (512,128) form needs the full B/C/D middle — including the C stage
(the +-3 in-group roll dance, ~31 VREG ops) — in BOTH Benes routes.
Shrinking SEC to 16384 (keeping the SEC == MID invariant) should cut
~half of K2's VREG work; this script measures exactly that on synthetic
sections with realistic (geometric, mean-16) segment lengths, at equal
total slot count, full scan depth both sides.

Usage: python scripts/perf_k2_sec128.py [nsec512]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graph_tpu import enable_compile_cache

enable_compile_cache()

from graph_tpu.engine import route as _route  # noqa: E402
from graph_tpu.engine.kernels import (  # noqa: E402
    FIXED_BITS, k2_reduce, _segmented_scan, LANE_SHIFTS)
from graph_tpu.engine.plan import _section_python  # noqa: E402

SEC_R2 = 128
SEC2 = SEC_R2 * 128   # 16384
MID2 = 16384


def gen_keys(rng, sec, mid):
    """Random segment-structured sorted keys + a shuffled input order."""
    lens = rng.geometric(1.0 / 16.0, size=sec // 4)
    lens = np.minimum(lens, 2048)
    cum = np.cumsum(lens)
    k = int(np.searchsorted(cum, sec - 64))
    lens = lens[:k]
    used = int(cum[k - 1]) if k else 0
    dsts = np.sort(rng.choice(mid, size=k, replace=False))
    keys_sorted = np.concatenate(
        [[-1], np.repeat(dsts, lens),
         np.full(sec - 1 - used, mid, np.int64)])
    perm = rng.permutation(sec)
    return keys_sorted[perm]  # input-order keys


def section128_python(keys):
    """Route one (128,128) section: single-taa middle form.

    Returns (wa u16, mid1 u8, ss u16, wa2 u16, mid2 u8)."""
    sec = SEC2
    sort_order = np.argsort(keys, kind="stable")
    target = np.empty(sec, np.int64)
    target[sort_order] = np.arange(sec)
    idx = _route.clos_route(target, SEC_R2)
    # composite middle: M[k, j] = B[k,0,D[k,0,j]]  (C is trivially 0)
    assert (idx["C"] == 0).all()
    B, D = idx["B"][:, 0, :], idx["D"][:, 0, :]
    M1 = np.take_along_axis(B, D, axis=1).astype(np.uint8)
    # pad bit at INPUT layout (same as pack_routing route 1)
    pad = ((keys == -1) | (keys == MID2)).reshape(SEC_R2, 128)
    wa = (idx["A"].astype(np.uint16) | (idx["E"].astype(np.uint16) << 7)
          | (pad.astype(np.uint16) << 15))
    s_key = keys[sort_order]
    ss = np.searchsorted(s_key, s_key, side="left").astype(np.uint16)
    target2, present = _route.ends_to_dst_perm(s_key, MID2)
    idx2 = _route.clos_route(target2, SEC_R2)
    assert (idx2["C"] == 0).all()
    B2, D2 = idx2["B"][:, 0, :], idx2["D"][:, 0, :]
    M2 = np.take_along_axis(B2, D2, axis=1).astype(np.uint8)
    wa2 = (idx2["A"].astype(np.uint16)
           | (idx2["E"].astype(np.uint16) << 7)
           | (present.reshape(SEC_R2, 128).astype(np.uint16) << 15))
    return (wa, M1.reshape(SEC_R2, 128), ss.reshape(SEC_R2, 128),
            wa2, M2.reshape(SEC_R2, 128))


def _benes128(v, wa, m):
    v = jnp.take_along_axis(v, wa & 127, axis=1)
    y = jnp.swapaxes(v, 0, 1)
    y = jnp.take_along_axis(y, m, axis=1)
    v = jnp.swapaxes(y, 0, 1)
    return jnp.take_along_axis(v, (wa >> 7) & 127, axis=1)


ROW_SHIFTS2 = (1, 2, 4, 8, 16, 32, 64)


def _segscan128(q, ss, lane_steps=7, row_steps=3):
    lane = jax.lax.broadcasted_iota(jnp.int32, (SEC_R2, 128), 1)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (SEC_R2, 128), 0)
    local_start = ss - rowid * 128
    lane_d = lane - jnp.maximum(local_start, 0)
    for sh in LANE_SHIFTS[:lane_steps]:
        q = q + jnp.where(lane_d >= sh, pltpu.roll(q, sh, 1), 0)
    if row_steps == 0:
        return q
    idx127 = jnp.full((SEC_R2, 128), 127, jnp.int32)
    run = jnp.take_along_axis(q, idx127, axis=1)
    rs_row = jnp.take_along_axis(ss, idx127, axis=1) // 128
    row_d = rowid - rs_row
    for sh in ROW_SHIFTS2[:row_steps]:
        run = run + jnp.where(row_d >= sh, pltpu.roll(run, sh, 0), 0)
    carry = pltpu.roll(run, 1, 0)
    return q + jnp.where(local_start < 0, carry, 0)


def k2_128(contrib, wa, m1, ss, wa2, m2, sec_mid, nmid, row_steps=7,
           stages=4, lane_steps=7):
    nsec = contrib.shape[0] // SEC_R2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsec,),
        in_specs=[pl.BlockSpec((SEC_R2, 128), lambda k, sm: (k, 0))] * 6,
        out_specs=pl.BlockSpec((SEC_R2, 128), lambda k, sm: (sm[k], 0)),
    )

    def kernel(sm_ref, v_ref, wa_ref, m1_ref, ss_ref, wa2_ref, m2_ref,
               out_ref):
        k = pl.program_id(0)
        wa = wa_ref[:].astype(jnp.int32)
        wa2 = wa2_ref[:].astype(jnp.int32)
        ss = ss_ref[:].astype(jnp.int32)
        v = v_ref[:]
        if stages >= 2:
            v = _benes128(v, wa, m1_ref[:].astype(jnp.int32))
        else:  # touch the streams so the io is comparable
            v = v + m1_ref[:].astype(jnp.int32)
        if stages >= 3:
            v = _segscan128(v, ss, lane_steps=lane_steps,
                            row_steps=row_steps)
        else:
            v = v + ss
        if stages >= 4:
            y = _benes128(v, wa2, m2_ref[:].astype(jnp.int32))
            ok = (wa2 >> 15) == 1
            y = jnp.where(ok, y, 0)
        else:
            y = v + wa2 + m2_ref[:].astype(jnp.int32)
        first = (k == 0) | (sm_ref[k] != sm_ref[jnp.maximum(k - 1, 0)])

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:] += y

    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nmid * SEC_R2, 128), jnp.int32),
    )(sec_mid, contrib, wa, m1, ss, wa2, m2)


def k2_quad(contrib, wa, m1, ss, wa2, m2, sec_mid, nmid, row_steps=7,
            lane_steps=7):
    """Quad-stream K2: 4 independent (128,128) sub-sections per grid
    step (chunked at static offsets), 4 outputs combined by the caller.
    Independent per-quarter dataflows interleave in the VLIW schedule,
    hiding the VPU latency that serial (128,128) chains expose."""
    nsec = contrib.shape[0] // SEC_R2
    assert nsec % 4 == 0
    steps = nsec // 4
    offs = [i * steps for i in range(4)]

    def in_map(off):
        return lambda k, sm: (k + off, 0)

    def out_map(off):
        return lambda k, sm: (sm[k + off], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[pl.BlockSpec((SEC_R2, 128), in_map(off))
                  for off in offs for _ in range(6)],
        out_specs=[pl.BlockSpec((SEC_R2, 128), out_map(off))
                   for off in offs],
    )

    def kernel(sm_ref, *refs):
        k = pl.program_id(0)
        ins, outs = refs[:24], refs[24:]
        for i, off in enumerate(offs):
            v_ref, wa_ref, m1_ref, ss_ref, wa2_ref, m2_ref = ins[
                i * 6:(i + 1) * 6]
            wa = wa_ref[:].astype(jnp.int32)
            v = _benes128(v_ref[:], wa, m1_ref[:].astype(jnp.int32))
            ss = ss_ref[:].astype(jnp.int32)
            S = _segscan128(v, ss, lane_steps=lane_steps,
                            row_steps=row_steps)
            wa2 = wa2_ref[:].astype(jnp.int32)
            y = _benes128(S, wa2, m2_ref[:].astype(jnp.int32))
            ok = (wa2 >> 15) == 1
            y = jnp.where(ok, y, 0)
            first = (k == 0) | (sm_ref[k + off]
                                != sm_ref[jnp.maximum(k + off - 1, 0)])
            out_ref = outs[i]

            @pl.when(first)
            def _(out_ref=out_ref, y=y):
                out_ref[:] = jnp.zeros_like(out_ref)
            out_ref[:] += y

    args = []
    for off in offs:
        args += [contrib, wa, m1, ss, wa2, m2]
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nmid * SEC_R2, 128), jnp.int32)
                   for _ in range(4)],
    )(sec_mid, *args)
    return outs[0] + outs[1] + outs[2] + outs[3]


def timed(fn, args, reps_small, reps_big, nslots, label):
    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def loop(r_static, c, *a):
        def body(i, c):
            y = fn(c, *a)
            return c.at[0, 0].add(y[0, 0] & 1)
        return jax.lax.fori_loop(0, r_static, body, c)

    def t(r):
        def f(c, *a):
            return loop(r, c, *a)
        c = args[0]
        y = f(c, *args[1:])
        np.asarray(y.reshape(-1)[0:1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = f(c, *args[1:])
            np.asarray(y.reshape(-1)[0:1])
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = t(reps_small), t(reps_big)
    per = (t2 - t1) / (reps_big - reps_small) / nslots * 1e9
    print(f"{label:10s}: {per:.4f} ns/slot "
          f"({t1*1e3:.0f}/{t2*1e3:.0f} ms at x{reps_small}/x{reps_big})",
          flush=True)
    return per


def main():
    nsec512 = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(7)
    nslots = nsec512 * 65536
    cache = f"/tmp/k2sec128_{nsec512}.npz"
    nsec128 = nsec512 * 4
    if os.path.exists(cache):
        z = np.load(cache)
        keys512 = list(z["keys512"])
        keys128 = list(z["keys128"])
        wa, wb, ss, wa2, wb2 = (z[k] for k in
                                ("wa", "wb", "ss", "wa2", "wb2"))
        wa_2, m1_2, ss_2, wa2_2, m2_2 = (z[k] for k in
                                         ("wa_2", "m1_2", "ss_2",
                                          "wa2_2", "m2_2"))
        contrib = z["contrib"]
    else:
        # ---- 512-row sections via the production (native) router
        print("building 512-row sections...", flush=True)
        keys512 = [gen_keys(rng, 65536, 65536) for _ in range(nsec512)]
        from graph_tpu.engine.native_route import build_sections_native

        nat = build_sections_native(
            np.concatenate(keys512).astype(np.int32))
        if nat is not None:
            wa, wb, ss, wa2, wb2 = (a.reshape(-1, 128) for a in nat)
        else:
            parts = [_section_python(k) for k in keys512]
            wa = np.concatenate([p[0] for p in parts])
            wb = np.concatenate([p[1] for p in parts])
            ss = np.concatenate([p[2] for p in parts])
            wa2 = np.concatenate([p[3] for p in parts])
            wb2 = np.concatenate([p[4] for p in parts])

        # ---- 128-row sections, same total slots
        print("building 128-row sections...", flush=True)
        keys128 = [gen_keys(rng, SEC2, MID2) for _ in range(nsec128)]
        parts2 = [section128_python(k) for k in keys128]
        wa_2 = np.concatenate([p[0] for p in parts2])
        m1_2 = np.concatenate([p[1] for p in parts2])
        ss_2 = np.concatenate([p[2] for p in parts2])
        wa2_2 = np.concatenate([p[3] for p in parts2])
        m2_2 = np.concatenate([p[4] for p in parts2])
        contrib = rng.integers(-1000, 1000, size=(nslots // 128, 128),
                               dtype=np.int64).astype(np.int32)
        np.savez(cache, keys512=np.asarray(keys512),
                 keys128=np.asarray(keys128), wa=wa, wb=wb, ss=ss, wa2=wa2,
                 wb2=wb2, wa_2=wa_2, m1_2=m1_2, ss_2=ss_2, wa2_2=wa2_2,
                 m2_2=m2_2, contrib=contrib)
    sec_mid = np.arange(nsec512, dtype=np.int32)
    sec_mid2 = np.arange(nsec128, dtype=np.int32)

    # ---- correctness (first section of each form, vs numpy)
    dev = [jnp.asarray(a) for a in (contrib, wa, wb, ss, wa2, wb2)]
    y512 = np.asarray(k2_reduce(dev[0], dev[1], dev[2], dev[3], dev[4],
                                dev[5], jnp.asarray(sec_mid), nsec512,
                                op="sum"))
    dev2 = [jnp.asarray(a) for a in (contrib, wa_2, m1_2, ss_2, wa2_2, m2_2)]
    y128 = np.asarray(k2_128(dev2[0], dev2[1], dev2[2], dev2[3], dev2[4],
                             dev2[5], jnp.asarray(sec_mid2), nsec128))
    for s in range(2):
        k = keys512[s]
        exp = np.zeros(65536, np.int64)
        np.add.at(exp, np.clip(k, 0, 65535),
                  np.where((k >= 0) & (k < 65536),
                           contrib.reshape(-1)[s * 65536:(s + 1) * 65536]
                           .astype(np.int64), 0))
        got = y512[s * 512:(s + 1) * 512].reshape(-1).astype(np.int64)
        ref = exp.astype(np.int32).astype(np.int64)
        assert (got == ref).all(), f"512 mismatch sec {s}"
        k = keys128[s]
        exp = np.zeros(MID2, np.int64)
        np.add.at(exp, np.clip(k, 0, MID2 - 1),
                  np.where((k >= 0) & (k < MID2),
                           contrib.reshape(-1)[s * SEC2:(s + 1) * SEC2]
                           .astype(np.int64), 0))
        got = y128[s * SEC_R2:(s + 1) * SEC_R2].reshape(-1).astype(np.int64)
        ref = exp.astype(np.int32).astype(np.int64)
        assert (got == ref).all(), f"128 mismatch sec {s}"
    print("correctness ok (both forms match numpy per-dst int32 sums)",
          flush=True)

    reps = max(6, int(1.0e9 // nslots))

    def f512(c, *a):
        return k2_reduce(c, *a[:5], jnp.asarray(sec_mid), nsec512, op="sum")

    def f128(c, *a):
        return k2_128(c, *a[:5], jnp.asarray(sec_mid2), nsec128)

    p512 = timed(f512, dev, reps, 4 * reps, nslots, "sec512")
    p128 = timed(f128, dev2, reps, 4 * reps, nslots, "sec128")
    print(f"speedup: {p512 / p128:.2f}x", flush=True)

    # ---- stage ablation of the 128 form
    for stages, label in ((1, "128 io"), (2, "128 +r1"), (3, "128 +scan"),
                          (4, "128 +r2")):
        def fs(c, *a, stages=stages):
            return k2_128(c, *a[:5], jnp.asarray(sec_mid2), nsec128,
                          stages=stages)
        timed(fs, dev2, reps, 4 * reps, nslots, label)
    for ls, rs in ((5, 1), (7, 3)):
        def fs(c, *a, ls=ls, rs=rs):
            return k2_128(c, *a[:5], jnp.asarray(sec_mid2), nsec128,
                          lane_steps=ls, row_steps=rs)
        timed(fs, dev2, reps, 4 * reps, nslots, f"128 ({ls},{rs})")

    # ---- quad-stream form (correctness path == k2_128; timing only)
    for ls, rs in ((7, 7), (7, 3), (5, 1)):
        def fq(c, *a, ls=ls, rs=rs):
            return k2_quad(c, *a[:5], jnp.asarray(sec_mid2), nsec128,
                           lane_steps=ls, row_steps=rs)
        timed(fq, dev2, reps, 4 * reps, nslots, f"quad({ls},{rs})")


if __name__ == "__main__":
    main()
