"""K2 IO-floor experiments (round 2, VERDICT weak #1 / PERF_NOTES #2).

Why do multi-stream kernels with a revisited output block run at ~80 GB/s
effective while a plain streaming copy runs at ~490 GB/s?  This script
measures synthetic kernels with K2's exact stream shapes but trivial
compute, isolating the pipeline behavior from the math.

Measurement discipline (see PERF_NOTES.md): the axon tunnel has a ~30 ms
dispatch floor, so every variant runs R grid repetitions inside ONE
pallas_call (grid=(R, nsec)) and total device time is kept >= 300 ms.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEC_R, LANES = 512, 128
NSEC = 512          # sections per pass
MID_EVERY = 16      # sections per mid (out block revisited this often)


def timeit(fn, *args, reps=3):
    fn(*args)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(r.reshape(-1)[0:1])  # force (1-elem transfer)
        best = min(best, time.perf_counter() - t0)
    return best


def gbps(nbytes, secs):
    return nbytes / secs / 1e9


def make_streams(nsec=NSEC):
    v = jnp.asarray(np.random.rand(nsec * SEC_R, LANES).astype(np.float32))
    wa = jnp.asarray(np.random.randint(0, 1 << 14, (nsec * SEC_R, LANES), np.uint16))
    wb = jnp.asarray(np.random.randint(0, 1 << 14, (nsec * SEC_R, LANES), np.uint16))
    ci = jnp.asarray(np.random.randint(0, 1 << 14, (nsec * SEC_R, LANES), np.uint16))
    sec_mid = jnp.asarray(np.arange(nsec, dtype=np.int32) // MID_EVERY)
    return v, wa, wb, ci, sec_mid


# ---- variant kernels -------------------------------------------------------

def _copy_kernel(v_ref, out_ref):
    out_ref[:] = v_ref[:].astype(jnp.int32)


def _sink4_kernel(sm_ref, v_ref, wa_ref, wb_ref, ci_ref, out_ref):
    # touch all four streams minimally; accumulate into revisited out
    acc = (v_ref[:].astype(jnp.int32) + wa_ref[:].astype(jnp.int32)
           + wb_ref[:].astype(jnp.int32) + ci_ref[:].astype(jnp.int32))

    @pl.when(sm_ref[pl.program_id(1)] % MID_EVERY == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += acc


def _sink4_nout_kernel(sm_ref, v_ref, wa_ref, wb_ref, ci_ref, out_ref):
    out_ref[:] = (v_ref[:].astype(jnp.int32) + wa_ref[:].astype(jnp.int32)
                  + wb_ref[:].astype(jnp.int32) + ci_ref[:].astype(jnp.int32))


def _sink1_kernel(sm_ref, v_ref, out_ref):
    @pl.when(sm_ref[pl.program_id(1)] % MID_EVERY == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += v_ref[:].astype(jnp.int32)


def run_variant(name, kernel, streams, r, *, n_in, out_mode, nsec=NSEC,
                block_secs=1, vmem_mb=None):
    v, wa, wb, ci, sec_mid = streams
    br = SEC_R * block_secs
    grid = (r, nsec // block_secs)
    ins = [pl.BlockSpec((br, LANES), lambda rr, k, sm: (k, 0))] * n_in
    if out_mode == "revisit":
        out_spec = pl.BlockSpec((br, LANES), lambda rr, k, sm: (sm[k], 0))
        out_shape = jax.ShapeDtypeStruct(
            (nsec // MID_EVERY * br, LANES), jnp.int32)
    else:
        out_spec = pl.BlockSpec((br, LANES), lambda rr, k, sm: (k, 0))
        out_shape = jax.ShapeDtypeStruct((nsec // block_secs * br, LANES),
                                         jnp.int32)
    params = {}
    if vmem_mb is not None:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid, in_specs=ins, out_specs=out_spec)
    call = pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shape,
                          **params)
    args = (sec_mid, v, wa, wb, ci)[: n_in + 1]
    f = jax.jit(lambda *a: call(*a))
    t = timeit(f, *args)
    in_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a in args[1:]) * r
    print(f"{name:34s} {t*1e3:8.1f} ms  in={gbps(in_bytes, t):6.1f} GB/s  "
          f"({in_bytes/1e9:.1f} GB in)")
    return t


def main():
    streams = make_streams()
    r = 200

    # A. plain streaming copy (no prefetch, out per step)
    v = streams[0]
    call = pl.pallas_call(
        _copy_kernel,
        grid=(r, NSEC),
        in_specs=[pl.BlockSpec((SEC_R, LANES), lambda rr, k: (k, 0))],
        out_specs=pl.BlockSpec((SEC_R, LANES), lambda rr, k: (k, 0)),
        out_shape=jax.ShapeDtypeStruct((NSEC * SEC_R, LANES), jnp.int32),
    )
    f = jax.jit(lambda a: call(a))
    t = timeit(f, v)
    nb = v.size * 4 * r
    print(f"{'A copy f32->int32':34s} {t*1e3:8.1f} ms  in={gbps(nb, t):6.1f} GB/s")

    run_variant("B 4-stream, out revisited", _sink4_kernel, streams, r,
                n_in=4, out_mode="revisit")
    run_variant("C 4-stream, out per-step", _sink4_nout_kernel, streams, r,
                n_in=4, out_mode="fresh")
    run_variant("D 1-stream, out revisited", _sink1_kernel, streams, r,
                n_in=1, out_mode="revisit")
    run_variant("E B + vmem 100MB", _sink4_kernel, streams, r,
                n_in=4, out_mode="revisit", vmem_mb=100)
    run_variant("F B + 2-section blocks", _sink4_kernel, streams, r,
                n_in=4, out_mode="revisit", block_secs=2)


if __name__ == "__main__":
    main()
